"""Headline benchmark: end-to-end calibration throughput on one chip.

Prints ONE JSON line: images/s through the full flagship pipeline
(MSCAN-B + LightHam heads in bf16 + 30-step f32 LM solver, batch 16 @
320x320).

vs_baseline compares against the reference PyTorch implementation
(cvg/GeoCalib) running the same pipeline on this host's CPU — the only
hardware both frameworks share in this environment (no CUDA here; the
reference cannot run on TPU, which is the point of this project).
Measured with tools/bench_reference.py: 95.3 s/batch-16 → 0.168 images/s
(the reference does a host Cholesky round-trip per LM iteration).

Timing note: through the remote-TPU relay, block_until_ready returns
before execution finishes — only a host fetch (np.asarray) is a true
sync, so that is what gets timed.
"""

import json
import os
import time

import numpy as np

REFERENCE_CPU_IMG_PER_S = 0.168

B, H, W = 16, 320, 320
N_ITERS = 10


def main():
    import jax

    # persistent compile cache: the remote-compile path takes minutes cold
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )
    import jax.numpy as jnp

    from geocalib_tpu.models import GeoCalibNet
    from geocalib_tpu.optim.lm import LMConfig, run_lm

    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (B, H, W, 3)), jnp.float32)
    net = GeoCalibNet(variant="b")
    params = jax.jit(net.init)({"params": jax.random.PRNGKey(0)}, img[:1])
    cfg = LMConfig()

    @jax.jit
    def fwd(params, image):
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        fields = net.apply(p, image.astype(jnp.bfloat16))
        fields = {k: v.astype(jnp.float32) for k, v in fields.items()}
        res = run_lm(dict(fields), cfg)
        return res.gravity.rp, res.camera.vfov

    np.asarray(fwd(params, img)[0])  # compile + first exec

    t0 = time.time()
    for _ in range(N_ITERS):
        out = fwd(params, img)
        np.asarray(out[0])
    dt = (time.time() - t0) / N_ITERS
    img_per_s = B / dt

    print(
        json.dumps(
            {
                "metric": "calibrate_images_per_s",
                "value": round(img_per_s, 2),
                "unit": "images/s",
                "vs_baseline": round(img_per_s / REFERENCE_CPU_IMG_PER_S, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
