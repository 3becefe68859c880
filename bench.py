"""Headline benchmark: end-to-end calibration throughput on one chip.

Prints ONE JSON line: images/s through the full flagship pipeline
(MSCAN-B + LightHam heads + 30-step LM solver, batch 16 @ 320x320).

vs_baseline compares against the reference PyTorch implementation
(cvg/GeoCalib) running the same pipeline on this host's CPU — the only
hardware both frameworks can run on in this environment (no CUDA here;
the reference cannot run on TPU, which is the point of this project).
Measured once with tools/bench_reference.py and recorded below.
"""

import json
import time

import numpy as np

# images/s of the reference torch pipeline (batch 16, 320x320, 30 LM steps)
# on this host CPU — see tools/bench_reference.py.
REFERENCE_CPU_IMG_PER_S = 1.175

B, H, W = 16, 320, 320
N_ITERS = 5


def main():
    import jax
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
        fields = net.apply(params, image)
        res = run_lm(dict(fields), cfg)
        return res.gravity.rp, res.camera.vfov

    # warmup/compile; np.asarray forces real execution (block_until_ready is
    # unreliable through the remote-TPU relay)
    np.asarray(fwd(params, img)[0])

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
