"""Per-stage time budget of the full serving pipeline on the TPU.

Measures, at the bench configuration (batch 16 @ 320x320, bf16 CNN, f32 LM),
each top-level stage as its own jitted executable:
  - mscan:      MSCAN-B backbone
  - ll_encoder: full-res LowLevelEncoder
  - head_front: fused dual-head tower through the 2nd upsample
  - tail:       full-res FeatureFusionBlock + uncertainty + projections
  - lm:         30-step LM solver (Pallas path)
  - front:      mscan + ll + head_front as one executable (the serving front)
  - end2end:    two-executable serving path, pipelined (what bench.py times)

Each stage consumes device-resident inputs and reduces its output to a
scalar on device (the axon relay makes host fetches of activations
prohibitively slow; see bench.py notes). Writes PROFILE_budget_r05.json at
the repo root — the committed artifact directing the perf work.
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

import geocalib_tpu.models.fused_heads as fh
from geocalib_tpu.models.geocalib_net import GeoCalibNet
from geocalib_tpu.models.mscan import MSCAN, MSCAN_VARIANTS
from geocalib_tpu.optim.lm import LMConfig, run_lm

B = int(os.environ.get("PROFILE_BATCH", 16))
N = 10
H = W = 320


def timeit(fn, *args):
    """Mean ms/call over N pipelined calls (single final host sync)."""
    red = jax.jit(
        lambda *a: sum(
            jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a))
        )
    )
    np.asarray(red(*args))  # compile + warm
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def main():
    key = jax.random.PRNGKey(0)
    net = GeoCalibNet(variant="b")
    pn = jax.jit(net.init)({"params": key}, jnp.zeros((1, H, W, 3), jnp.float32))
    p16 = jax.tree.map(lambda v: v.astype(jnp.bfloat16), pn)
    params, bstats = p16["params"], p16.get("batch_stats", {})

    image = jax.device_put(
        np.random.default_rng(0).uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    ).astype(jnp.bfloat16)
    dims, ratios, depths = MSCAN_VARIANTS["b"]
    mscan = MSCAN(embed_dims=dims, mlp_ratios=ratios, depths=depths)

    budget = {"batch": B, "resolution": [H, W], "unit": "ms/batch"}

    # --- backbone
    mscan_fn = jax.jit(
        lambda img: mscan.apply(
            {"params": params["MSCAN_0"], "batch_stats": bstats["MSCAN_0"]}, img
        )
    )
    budget["mscan"] = timeit(mscan_fn, image)
    hl = jax.block_until_ready(mscan_fn(image))

    # --- low-level encoder
    def ll_fn(img):
        pll = params["LowLevelEncoder_0"]
        k0, b0 = fh._ck(pll["ConvModule_0"])
        k1, b1 = fh._ck(pll["ConvModule_1"])
        x = jax.nn.relu(fh._conv(img, k0, b0, pad=1))
        return jax.nn.relu(fh._conv(x, k1, b1, pad=1))

    budget["ll_encoder"] = timeit(jax.jit(ll_fn), image)
    ll = jax.block_until_ready(jax.jit(ll_fn)(image))

    # --- head front (through 2nd upsample)
    head_front = jax.jit(
        lambda h: fh._head_front(params["UpDecoder_0"], params["LatitudeDecoder_0"], h)
    )
    budget["head_front"] = timeit(head_front, hl)
    feats = jax.block_until_ready(head_front(hl))

    # --- full-res tail
    tail = jax.jit(
        lambda f, l: fh.fused_tail(
            params["UpDecoder_0"], params["LatitudeDecoder_0"], f, l
        )
    )
    budget["tail"] = timeit(tail, feats, ll)
    fields = jax.block_until_ready(tail(feats, ll))
    fields32 = {k: v.astype(jnp.float32) for k, v in fields.items()}

    # --- LM solver (Pallas path, 30 steps)
    cfg = LMConfig(use_pallas=jax.default_backend() == "tpu")
    lm = jax.jit(lambda f: (lambda r: (r.gravity.rp, r.camera.vfov))(run_lm(dict(f), cfg)))
    budget["lm"] = timeit(lm, fields32)

    # --- serving front (one executable)
    front = jax.jit(lambda img: fh.fused_front(p16, img))
    budget["front"] = timeit(front, image)

    # --- end-to-end two-executable path (bench.py configuration)
    tail_lm = jax.jit(
        lambda f, l: (
            lambda r: (r.gravity.rp, r.camera.vfov)
        )(run_lm({k: v.astype(jnp.float32) for k, v in fh.fused_tail_from_variables(p16, f, l).items()}, cfg))
    )

    def end2end(img):
        f, l = front(img)
        return tail_lm(f, l)

    np.asarray(end2end(image)[0])
    t0 = time.time()
    outs = [end2end(image) for _ in range(N)]
    np.asarray(outs[-1][0])
    budget["end2end"] = (time.time() - t0) / N * 1e3
    budget["images_per_s"] = round(B / budget["end2end"] * 1e3, 1)
    budget["sum_of_stages"] = round(
        budget["mscan"] + budget["ll_encoder"] + budget["head_front"]
        + budget["tail"] + budget["lm"], 2
    )
    budget["front_minus_parts"] = round(
        budget["front"] - (budget["mscan"] + budget["ll_encoder"] + budget["head_front"]), 2
    )

    for k, v in budget.items():
        if isinstance(v, float):
            budget[k] = round(v, 2)
    print(json.dumps(budget, indent=2))
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "PROFILE_budget_r05.json"
    )
    if B == 16:
        with open(out_path, "w") as fp:
            json.dump(budget, fp, indent=2)
        print(f"written {out_path}")


if __name__ == "__main__":
    main()
