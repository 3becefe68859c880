"""A/B the serving tail implementations on the real chip:

- block-diag: fused 128-wide dense convs (2x the useful FLOPs, MXU
  sweet-spot shapes)
- grouped: feature_group_count=2 (exact useful FLOPs)
- per-head: two sequential 64-wide towers (exact useful FLOPs, narrow)

Measured r4 on v5e @ batch 16, 320² (standalone jitted tail):
  blockdiag 31.3 ms @ 69.4 GFLOP/ms | perhead 37.7 ms @ 32.0 GFLOP/ms |
  grouped 57.2 ms @ 21.1 GFLOP/ms.
Conclusion: the 128-wide block-diagonal fusion wins even though half its
FLOPs are zeros — in situ the 64-wide towers only reach 32 GFLOP/ms (below
their 42 GFLOP/ms isolated-conv number), and XLA's grouped-conv lowering is
worse still. The hypothetical that motivated the perhead mode (useful-FLOP
rate 1085/42 ≈ 26 ms < 31.3) does not survive measurement.

    python tools/profile_tail_grouped.py
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from geocalib_tpu.models import GeoCalibNet
import geocalib_tpu.models.fused_heads as fh

B, H, W = 16, 320, 320
N = 20


def main():
    net = GeoCalibNet(variant="b")
    params = jax.jit(net.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, H, W, 3), jnp.float32)
    )
    key = jax.random.PRNGKey(1)
    feats = jax.random.normal(key, (B, H, W, 128), jnp.bfloat16)
    ll = jax.random.normal(jax.random.fold_in(key, 1), (B, H, W, 64), jnp.bfloat16)

    prev = None
    for mode, grouped in (("blockdiag", False), ("grouped", True), ("perhead", False)):
        fh._TAIL_MODE = "perhead" if mode == "perhead" else "blockdiag"
        fh._GROUPED = grouped

        @jax.jit
        def tail(p, feats, ll):
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), p)
            return fh.fused_tail_from_variables(p, feats, ll)

        out = tail(params, feats, ll)
        ref = np.asarray(out["latitude_field"], np.float32)
        np.asarray(out["up_field"])  # sync
        t0 = time.time()
        outs = [tail(params, feats, ll) for _ in range(N)]
        np.asarray(outs[-1]["up_field"])
        dt = (time.time() - t0) / N * 1000
        try:
            c = tail.lower(params, feats, ll).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            fl = float(c["flops"])
        except Exception:
            fl = float("nan")
        print(
            f"mode={mode}: {dt:.2f} ms/batch, "
            f"{fl / 1e9:.1f} GFLOP, {fl / dt / 1e9:.1f} GFLOP/ms"
        )
        if prev is not None:
            dev = np.abs(ref - prev).max()
            print(f"  max |lat diff| vs block-diag: {dev:.2e}")
        else:
            prev = ref


if __name__ == "__main__":
    main()
