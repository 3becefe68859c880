"""Fused NMF (Hamburger) Pallas kernel: all multiplicative updates in VMEM.

The XLA lowering of NMF2D (models/hamburger.py, reference
geocalib/modules.py:120-199) re-reads the (B, N, D) token matrix from HBM
on every one of the ~8 multiplicative-update steps — at (16+16, 6400, 512)
bf16 that is ~4 GB of HBM traffic for ~0.2 TFLOP of matmuls: purely
bandwidth-bound. This kernel grids over the batch and keeps one sample's
token matrix resident in VMEM for the whole factorization, so x is read
from HBM exactly once.

The math mirrors NMF2D step for step (bases column-normalize, softmax coef
init, `steps` coef+bases updates, final coef refresh); bases are carried
transposed (R, D) so every MXU contraction is a plain (M, K) x (K, N) with
at most a tiny (N_tokens, R) transpose. Dots accumulate in f32 and round
back to the input dtype per op, matching XLA's bf16 dot semantics. The
kernel outputs (coef, bases) — small — and the final rank-R reconstruction
is one efficient batched XLA matmul outside, which keeps the kernel's
scoped-VMEM footprint to the resident x block plus ~4 MB of intermediates.

Inference-only (the fused eval head path); training differentiates through
the XLA NMF2D module.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray


def _make_kernel(steps: int, inv_t: float, eps: float):
    def kernel(x_ref, bases_ref, coef_ref, bt_ref):
        x = x_ref[0]  # (N, D)
        dt = x.dtype

        def dot(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32).astype(dt)

        bt = bases_ref[0].astype(dt)  # (R, D): bases transposed
        # column-normalize the bases (NMF2D: norm over D per rank)
        norm = jnp.sqrt(jnp.sum(bt.astype(jnp.float32) ** 2, axis=-1, keepdims=True))
        bt = bt / (norm.astype(dt) + eps)

        coef = jax.nn.softmax(inv_t * dot(x, bt.T), axis=-1)  # (N, R)

        def update_coef(coef, bt):
            numer = dot(x, bt.T)
            denom = dot(coef, dot(bt, bt.T))
            return coef * numer / (denom + eps)

        for _ in range(steps):
            coef = update_coef(coef, bt)
            numer = dot(coef.T, x)  # (R, D)
            denom = dot(dot(coef.T, coef), bt)
            bt = bt * numer / (denom + eps)

        coef_ref[0] = update_coef(coef, bt)
        bt_ref[0] = bt

    return kernel


@functools.partial(jax.jit, static_argnames=("steps", "inv_t", "eps", "interpret"))
def nmf_pallas(
    x: Array,
    bases: Array,
    steps: int = 7,
    inv_t: float = 1.0,
    eps: float = 1e-6,
    interpret: bool = False,
) -> Array:
    """NMF reconstruction of x (B, N, D) with raw uniform bases (B, D, R).

    Matches NMF2D().apply({}, x, bases=bases) (eval step count = `steps`).
    """
    B, N, D = x.shape
    R = bases.shape[-1]
    bases_t = jnp.swapaxes(bases, 1, 2)  # (B, R, D)

    block = lambda *s: pl.BlockSpec(
        (1,) + s, lambda b: (b,) + (0,) * len(s), memory_space=pltpu.VMEM
    )
    coef, bt = pl.pallas_call(
        _make_kernel(steps, inv_t, eps),
        grid=(B,),
        in_specs=[block(N, D), block(R, D)],
        out_specs=(block(N, R), block(R, D)),
        out_shape=(
            jax.ShapeDtypeStruct((B, N, R), x.dtype),
            jax.ShapeDtypeStruct((B, R, D), x.dtype),
        ),
        # the resident (6400, 512) bf16 x block (double-buffered across the
        # batch grid) plus f32 intermediates exceed the 16 MB default
        # scoped-vmem budget; current Mosaic accounts ~30 MB for the eval
        # shapes (stacked B=16), so give it generous headroom — v5e has
        # 128 MB of VMEM per core
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, bases_t)
    return jnp.einsum("bnr,brd->bnd", coef, bt)
