"""Winograd F(2x2, 3x3) convolution for the serving-tail 3x3 convs.

The fused serving tail (models/fused_heads.py) runs its per-head 3x3 convs
as dense 128-wide block-diagonal kernels because the MXU wants 128-lane
tiles — at the cost of 2x the useful FLOPs (measured r4:
blockdiag 69.4 GFLOP/ms executed vs per-head 32.0, tools/
profile_tail_grouped.py). Winograd F(2x2,3x3) attacks the same tail from
the FLOP side: each 2x2 output tile costs 16 multiplies instead of 36
(2.25x fewer), turning every 3x3 conv into 16 batched (tiles x C) @ (C x F)
matmuls plus cheap 4x4 linear transforms on the VPU.

Executed-FLOP arithmetic for the dual-head tail (C = F = 64 per head):
  blockdiag direct:   2.00x useful FLOPs at 128-wide MXU rates
  winograd blockdiag: 2.00x / 2.25 = 0.89x useful at 128-wide rates
  winograd per-head:  1.00x / 2.25 = 0.44x useful at 64-wide rates
Whether the matmul-phase rate survives the batched-by-16 layout is an
empirical question — tools/profile_tail_winograd.py measures all of these
on the real chip.

Transforms (Lavin & Gray, "Fast Algorithms for Convolutional Neural
Networks", 2015):
  Y = A^T [ (G g G^T) .* (B^T d B) ] A
No reference counterpart: the reference runs its tail as cuDNN torch convs
(geocalib/modules.py:227-288).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# F(2x2, 3x3) transform matrices
_BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
_G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def transform_kernel(k: Array) -> Array:
    """g (3,3,C,F) -> U (4,4,C,F) = G g G^T (f32 exactness, cast by caller)."""
    g = k.astype(jnp.float32)
    return jnp.einsum("ij,jkcf,lk->ilcf", _G, g, _G)


def winograd_conv3x3(
    x: Array,
    k: Array,
    b: Optional[Array] = None,
    u: Optional[Array] = None,
    matmul_dtype=None,
) -> Array:
    """3x3 same-padding stride-1 conv via Winograd F(2x2,3x3), NHWC.

    x: (B, H, W, C) with H, W even. k: (3, 3, C, F). u: optionally the
    pre-transformed kernel (transform_kernel(k)) so serving can hoist the
    weight transform out of the step. matmul_dtype: dtype for the bulk
    batched matmuls (default: x.dtype); the 4x4 data/inverse transforms are
    exact +/- adds and run in x.dtype.
    """
    B, H, W, C = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    F = k.shape[-1] if k is not None else u.shape[-1]
    if u is None:
        u = transform_kernel(k)
    md = matmul_dtype or x.dtype

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # overlapping 4x4 patches at stride 2 via strided slices: rows r, r+2, ..
    # (4 slices/dim instead of a gather; stays a reshape-free strided view
    # until XLA materializes the stack)
    TH, TW = H // 2, W // 2
    # patch row r over tile starts 0,2,..,H-2: rows r, r+2, .., H-2+r
    rows = jnp.stack(
        [xp[:, r : H - 1 + r : 2, :, :] for r in range(4)], axis=1
    )  # (B, 4, TH, W+2, C)
    patches = jnp.stack(
        [rows[:, :, :, c : W - 1 + c : 2, :] for c in range(4)], axis=3
    )  # (B, 4, TH, 4, TW, C)
    d = jnp.transpose(patches, (0, 2, 4, 1, 3, 5))  # (B, TH, TW, 4, 4, C)

    # V = B^T d B  (adds/subs only — exact in any dtype)
    bt = _BT.astype(x.dtype)
    v = jnp.einsum("ij,bhwjkc->bhwikc", bt, d)
    v = jnp.einsum("bhwikc,lk->bhwilc", v, bt)

    # bulk compute: 16 batched (P, C) @ (C, F) matmuls on the MXU
    P = B * TH * TW
    v = v.reshape(P, 16, C).transpose(1, 0, 2).astype(md)
    m = jnp.einsum(
        "tpc,tcf->tpf", v, u.reshape(16, C, F).astype(md),
        preferred_element_type=jnp.float32,
    )

    # inverse transform Y = A^T m A
    at = _AT.astype(jnp.float32)
    m = m.transpose(1, 0, 2).reshape(B, TH, TW, 4, 4, F)
    y = jnp.einsum("ij,bhwjkf->bhwikf", at, m)
    y = jnp.einsum("bhwikf,lk->bhwilf", y, at)  # (B, TH, TW, 2, 2, F)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(B, H, W, F).astype(x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y
