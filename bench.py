"""Headline benchmark: end-to-end calibration throughput on one chip.

Prints ONE JSON line: images/s through the full flagship pipeline
(MSCAN-B + LightHam heads in bf16 + 30-step f32 LM solver, batch 16 @
320x320).

vs_baseline compares against the reference PyTorch implementation
(cvg/GeoCalib) running the same pipeline on this host's CPU — the only
hardware both frameworks share in this environment (no CUDA here; the
reference cannot run on TPU, which is the point of this project).
Measured with tools/bench_reference.py: 95.3 s/batch-16 → 0.168 images/s
(the reference does a host Cholesky round-trip per LM iteration). See
README.md for the honest GPU-baseline discussion (BASELINE.md north star
is ≥5× PyTorch-GPU images/s/chip).

Robustness: the Pallas LM kernel is the default TPU path; if it fails to
compile/run for any reason the bench falls back to the pure-XLA LM path and
reports which path produced the number (round-1 lesson: a kernel bug must
degrade the number, not zero the round's perf evidence).

Implementation notes for the remote-TPU relay (axon): host->device
transfers through the tunnel are ~KB/s — all benchmark inputs are
generated ON DEVICE inside jit, and only (B,2) results are fetched.
block_until_ready can return before execution finishes — a host fetch
(np.asarray) is the only true sync, so that is what gets timed.
"""

import json
import os
import time
import traceback

import numpy as np

REFERENCE_CPU_IMG_PER_S = 0.168

B, H, W = 16, 320, 320
N_ITERS = 10


def build_forward(net, cfg, fused=True):
    import jax
    import jax.numpy as jnp

    from geocalib_tpu.models.fused_heads import fused_front, fused_tail_from_variables
    from geocalib_tpu.optim.lm import run_lm

    if fused:
        # TWO executables (front CNN / full-res tail + LM): XLA schedules
        # the full-res tail ~2x faster as its own program (52 vs 72.5
        # ms/batch measured); the intermediate stays on device and the
        # pipelined dispatch hides the extra call.
        @jax.jit
        def front(params, key):
            # generate the batch on device: the tunnel makes host transfers
            # of (B,320,320,3) prohibitively slow, and a real deployment
            # feeds device-resident batches anyway
            image = jax.random.uniform(key, (B, H, W, 3), jnp.bfloat16)
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            return fused_front(p, image)

        @jax.jit
        def tail(params, feats, ll):
            p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
            fields = fused_tail_from_variables(p, feats, ll)
            fields = {k: v.astype(jnp.float32) for k, v in fields.items()}
            res = run_lm(dict(fields), cfg)
            return res.gravity.rp, res.camera.vfov

        def fwd(params, key):
            feats, ll = front(params, key)
            return tail(params, feats, ll)

        return fwd

    @jax.jit
    def fwd(params, key):
        image = jax.random.uniform(key, (B, H, W, 3), jnp.float32)
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        fields = net.apply(p, image.astype(jnp.bfloat16))
        fields = {k: v.astype(jnp.float32) for k, v in fields.items()}
        res = run_lm(dict(fields), cfg)
        return res.gravity.rp, res.camera.vfov

    return fwd


def time_path(fwd, params, key):
    """Pipelined throughput: enqueue all batches, sync once at the end.

    The remote relay adds ~24 ms of round-trip latency per host sync;
    serial per-batch timing would measure the tunnel, not the chip. Async
    dispatch keeps the device queue full — the production serving pattern —
    and a single final fetch bounds the total (fetching every output would
    re-serialize on the tunnel).
    """
    import jax

    np.asarray(fwd(params, key)[0])  # compile + first exec
    keys = [jax.random.fold_in(key, i) for i in range(N_ITERS)]
    np.asarray(keys[-1])  # materialize inputs before the clock starts
    t0 = time.time()
    outs = [fwd(params, k) for k in keys]
    np.asarray(outs[-1][0])  # device queue is in-order: last done => all done
    return (time.time() - t0) / N_ITERS


def main():
    import jax

    # persistent compile cache: the remote-compile path takes minutes cold
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    import jax.numpy as jnp

    from geocalib_tpu.models import GeoCalibNet
    from geocalib_tpu.optim.lm import LMConfig

    net = GeoCalibNet(variant="b")
    params = jax.jit(net.init)(
        {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, H, W, 3), jnp.float32)
    )
    key = jax.random.PRNGKey(42)

    on_tpu = jax.default_backend() != "cpu"
    path = "pallas+fused" if on_tpu else "xla+fused"
    try:
        fwd = build_forward(net, LMConfig(use_pallas=on_tpu), fused=True)
        dt = time_path(fwd, params, key)
    except Exception:
        traceback.print_exc()
        path = "xla-fallback"
        fwd = build_forward(net, LMConfig(use_pallas=False), fused=False)
        dt = time_path(fwd, params, key)

    img_per_s = B / dt
    print(
        json.dumps(
            {
                "metric": "calibrate_images_per_s",
                "value": round(img_per_s, 2),
                "unit": "images/s",
                "vs_baseline": round(img_per_s / REFERENCE_CPU_IMG_PER_S, 2),
                "lm_path": path,
                "batch": B,
            }
        )
    )


if __name__ == "__main__":
    main()
