"""A/B the serving tail: grouped (feature_group_count=2) vs block-diagonal
dense convs for the per-head 128-wide tensor (see fused_heads._conv2).

Grouped does exactly the useful FLOPs (two 64→64 convs); block-diag does 2×
the FLOPs at the MXU's 128-wide sweet spot. Run on the real chip:

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

    for mode in (False, True):
        fh._GROUPED = mode

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
            f"mode={'grouped' if mode else 'block-diag'}: {dt:.2f} ms/batch, "
            f"{fl / 1e9:.1f} GFLOP, {fl / dt / 1e9:.1f} GFLOP/ms"
        )
        if mode:
            dev = np.abs(np.asarray(out["latitude_field"], np.float32) - prev).max()
            print(f"  max |lat diff| grouped vs block-diag: {dev:.2e}")
        prev = ref


if __name__ == "__main__":
    main()
