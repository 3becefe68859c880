"""Winograd vs direct conv for the serving-tail 3x3 convs (r4 verdict #5).

The r4 three-way measurement (tools/profile_tail_grouped.py) ended with
"halving the tail's cost further would need a Winograd kernel". This is
that measurement: the dual-head 3x3x64 tail conv at serving conditions
(batch 16 @ 320x320) as
  direct-blockdiag : one dense 128-wide conv (current fused_heads default)
  direct-perhead   : two 64-wide convs (exact useful FLOPs)
  wino-blockdiag   : Winograd F(2x2,3x3) on the 128-wide block-diag kernel
  wino-headstack   : Winograd per head, both heads batched into one
                     32-way batched matmul (exact useful FLOPs / 2.25)
Writes PROFILE_tail_winograd.json at the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

from geocalib_tpu.models.fused_heads import _block_diag
from geocalib_tpu.ops.winograd import transform_kernel, winograd_conv3x3

B, H, W, C = 16, 320, 320, 64
N = 10
USEFUL_GFLOP = 2 * B * H * W * (2 * C) * 9 * C / 1e9  # two 64->64 3x3 convs


def _sync(out):
    np.asarray(jax.tree.leaves(out)[0]).ravel()[:1]


def timeit(fn, *args):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(N):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / N * 1e3


def _conv(x, k, pad=1):
    return jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def main():
    key = jax.random.PRNGKey(0)
    dtype = jnp.bfloat16
    xu = jax.random.normal(key, (B, H, W, C), dtype)
    xl = jax.random.normal(jax.random.fold_in(key, 1), (B, H, W, C), dtype)
    x2 = jnp.concatenate([xu, xl], axis=-1)
    ku = jax.random.normal(jax.random.fold_in(key, 2), (3, 3, C, C), jnp.float32) / 9
    kl = jax.random.normal(jax.random.fold_in(key, 3), (3, 3, C, C), jnp.float32) / 9
    kbd = _block_diag(ku, kl)
    u_bd = transform_kernel(kbd)
    uu, ul = transform_kernel(ku), transform_kernel(kl)

    results = {"device": str(jax.devices()[0]), "B": B, "HW": H,
               "useful_gflop": round(USEFUL_GFLOP, 1)}

    # reference correctness anchor (f32 on a small slice)
    ref = _conv(x2[:1].astype(jnp.float32), kbd)
    got = winograd_conv3x3(x2[:1].astype(jnp.float32), kbd)
    results["wino_vs_direct_maxdev_f32"] = float(jnp.abs(ref - got).max())

    fns = {
        "direct_blockdiag": jax.jit(lambda x: _conv(x, kbd.astype(jnp.bfloat16))),
        "direct_perhead": jax.jit(
            lambda a, b: (_conv(a, ku.astype(jnp.bfloat16)),
                          _conv(b, kl.astype(jnp.bfloat16)))
        ),
        "wino_blockdiag": jax.jit(
            lambda x: winograd_conv3x3(x, None, u=u_bd, matmul_dtype=jnp.bfloat16)
        ),
        "wino_headstack": jax.jit(
            lambda a, b: (
                winograd_conv3x3(a, None, u=uu, matmul_dtype=jnp.bfloat16),
                winograd_conv3x3(b, None, u=ul, matmul_dtype=jnp.bfloat16),
            )
        ),
    }
    args = {
        "direct_blockdiag": (x2,),
        "direct_perhead": (xu, xl),
        "wino_blockdiag": (x2,),
        "wino_headstack": (xu, xl),
    }
    for name, fn in fns.items():
        try:
            ms = timeit(fn, *args[name])
            results[name] = {
                "ms": round(ms, 3),
                "useful_gflop_per_ms": round(USEFUL_GFLOP / ms, 1),
            }
            print(f"{name}: {ms:.2f} ms ({USEFUL_GFLOP / ms:.1f} useful GFLOP/ms)",
                  flush=True)
        except Exception as e:
            results[name] = f"failed: {type(e).__name__}: {e}"
            print(f"{name}: FAILED {e}", flush=True)

    # --- full serving tail, direct vs winograd 3x3 lowering ---------------
    import geocalib_tpu.models.fused_heads as fh
    from geocalib_tpu.models.geocalib_net import GeoCalibNet

    net = GeoCalibNet(variant="b")
    variables = jax.jit(net.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64, 64, 3), jnp.float32)
    )
    p = jax.tree.map(lambda v: v.astype(jnp.bfloat16), variables["params"])
    feats = jax.random.normal(key, (B, H, W, 2 * C), dtype)
    ll = jax.random.normal(key, (B, H, W, C), dtype)

    for mode in ("direct", "winograd"):
        fh._CONV3_MODE = mode
        try:
            f = jax.jit(
                lambda pu, pl, fe, l: fh.fused_tail(pu, pl, fe, l)
            )
            ms = timeit(f, p["UpDecoder_0"], p["LatitudeDecoder_0"], feats, ll)
            results[f"full_tail_{mode}"] = {"ms": round(ms, 3)}
            print(f"full_tail_{mode}: {ms:.2f} ms", flush=True)
        except Exception as e:
            results[f"full_tail_{mode}"] = f"failed: {type(e).__name__}: {e}"
            print(f"full_tail_{mode}: FAILED {e}", flush=True)
        finally:
            fh._CONV3_MODE = "direct"

    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "PROFILE_tail_winograd.json"
    )
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
