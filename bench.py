"""Headline benchmark: end-to-end calibration throughput on one chip.

Prints ONE JSON line with the headline metric (images/s through the full
flagship pipeline: MSCAN-B + LightHam heads in bf16 + the inference-preset
f32 LM solver — LMConfig() defaults: 30 steps with early stop, huber loss —
batch 16 @ 320x320) plus training/loader throughput and an honest
utilization section (measured FLOPs from XLA cost analysis, achieved
TFLOP/s, MFU vs the chip's bf16 peak).

Process isolation (r3 lesson): each sub-benchmark runs in its OWN
subprocess. Round 3's single-process bench crashed RESOURCE_EXHAUSTED
because the serving executables + params were still resident when the train
step compiled; a perf harness must not be able to OOM itself out of
recording its most important number. The orchestrator (main) never imports
jax.

vs_baseline compares against the reference PyTorch implementation
(cvg/GeoCalib) running the same pipeline on this host's CPU — the only
hardware both frameworks share in this environment (no CUDA here; the
reference cannot run on TPU, which is the point of this project).
Measured with tools/bench_reference.py: 95.3 s/batch-16 → 0.168 images/s.
That multiple is a sanity floor, not the headline — the utilization fields
(tflops_achieved, mfu) are the honest standing. BASELINE.md north star is
≥5× PyTorch-GPU images/s/chip.

Implementation notes for the remote-TPU relay (axon): host->device
transfers through the tunnel are high-latency — all benchmark inputs are
generated ON DEVICE inside jit, and only tiny results are fetched.
block_until_ready can return before execution finishes — a host fetch
(np.asarray) is the only true sync, so that is what gets timed.
"""

import json
import os
import subprocess
import sys
import time
import traceback

REFERENCE_CPU_IMG_PER_S = 0.168
# TPU v5e (one chip): 197 TFLOP/s dense bf16 peak (public spec).
PEAK_BF16_TFLOPS = 197.0

B, H, W = 16, 320, 320
N_ITERS = 10


# ---------------------------------------------------------------------------
# stage: calibrate (serving pipeline + kernel parity + FLOPs/MFU)
# ---------------------------------------------------------------------------


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

        fwd.parts = (front, tail)  # for cost analysis
        return fwd

    @jax.jit
    def fwd(params, key):
        image = jax.random.uniform(key, (B, H, W, 3), jnp.float32)
        p = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
        fields = net.apply(p, image.astype(jnp.bfloat16))
        fields = {k: v.astype(jnp.float32) for k, v in fields.items()}
        res = run_lm(dict(fields), cfg)
        return res.gravity.rp, res.camera.vfov

    fwd.parts = (fwd,)
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
    import numpy as np

    np.asarray(fwd(params, key)[0])  # compile + first exec
    keys = [jax.random.fold_in(key, i) for i in range(N_ITERS)]
    np.asarray(keys[-1])  # materialize inputs before the clock starts
    t0 = time.time()
    outs = [fwd(params, k) for k in keys]
    np.asarray(outs[-1][0])  # device queue is in-order: last done => all done
    return (time.time() - t0) / N_ITERS


def measured_flops(fns, *args_lists):
    """Total FLOPs of the jitted executables via XLA cost analysis.

    Counted on the compiled HLO (fusion included), so this is what the chip
    actually runs, not a hand count. Returns (flops, None) on success or
    (None, "<error>") — the caller MUST surface the error string in the
    emitted JSON (r4 verdict: these fields silently vanished from
    BENCH_r04.json because the failure only went to a discarded stderr).
    """
    try:
        total = 0.0
        for fn, args in zip(fns, args_lists):
            c = fn.lower(*args).compile().cost_analysis()
            if isinstance(c, (list, tuple)):
                c = c[0]
            total += float(c["flops"])
        return total, None
    except Exception as e:
        traceback.print_exc()
        return None, f"{type(e).__name__}: {e}"


def check_kernel_parity(cfg_kernel, cfg_xla):
    """On-chip Pallas-vs-XLA LM parity: a silent kernel fallback (or a
    kernel bug) must never masquerade as a kernel number (VERDICT r2 #7).

    Returns the max |roll/pitch/vfov| deviation between the Pallas-kernel LM
    and the pure-XLA LM on one synthetic batch, computed on the device the
    bench runs on. Raises if they disagree beyond float tolerance.
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from geocalib_tpu.optim.lm import run_lm

    @jax.jit
    def both(key):
        up = jax.random.uniform(key, (4, 64, 64, 2), jnp.float32) - 0.5
        lat = jax.random.uniform(jax.random.fold_in(key, 1), (4, 64, 64, 1), jnp.float32) - 0.5
        data = {"up_field": up, "latitude_field": lat}
        a = run_lm(dict(data), cfg_kernel)
        b = run_lm(dict(data), cfg_xla)
        return (
            jnp.max(jnp.abs(a.gravity.rp - b.gravity.rp)),
            jnp.max(jnp.abs(a.camera.vfov - b.camera.vfov)),
        )

    rp_diff, vfov_diff = (float(np.asarray(x)) for x in both(jax.random.PRNGKey(7)))
    assert rp_diff < 5e-4 and vfov_diff < 5e-4, (
        f"Pallas LM kernel diverges from XLA path on-chip: "
        f"rp {rp_diff:.2e}, vfov {vfov_diff:.2e}"
    )
    return max(rp_diff, vfov_diff)


def check_kernel_parity_radial() -> float:
    """Same Pallas-vs-XLA parity check through the simple_radial model
    (r3 verdict #9: parity was only ever pinned at 64x64/pinhole)."""
    import dataclasses

    from geocalib_tpu.optim.lm import LMConfig

    cfg = LMConfig(camera_model="simple_radial")
    return check_kernel_parity(
        dataclasses.replace(cfg, use_pallas=True),
        dataclasses.replace(cfg, use_pallas=False),
    )


def stage_calibrate() -> dict:
    import jax

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
    out: dict = {}
    try:
        if on_tpu:
            out["kernel_parity_max_dev"] = float(
                f"{check_kernel_parity(LMConfig(use_pallas=True), LMConfig(use_pallas=False)):.2e}"
            )
            try:
                out["kernel_parity_radial_max_dev"] = float(
                    f"{check_kernel_parity_radial():.2e}"
                )
            except Exception:
                traceback.print_exc()
                out["kernel_parity_radial_max_dev"] = "failed"
        fwd = build_forward(net, LMConfig(use_pallas=on_tpu), fused=True)
        dt = time_path(fwd, params, key)
    except Exception:
        traceback.print_exc()
        path = "xla-fallback"
        fwd = build_forward(net, LMConfig(use_pallas=False), fused=False)
        dt = time_path(fwd, params, key)

    out["calibrate_images_per_s"] = round(B / dt, 2)
    out["lm_path"] = path

    # utilization: measured FLOPs of the executables actually timed
    if len(fwd.parts) == 2:
        front, tail = fwd.parts
        feats, ll = front(params, key)
        flops, err = measured_flops([front, tail], [(params, key), (params, feats, ll)])
    else:
        flops, err = measured_flops(list(fwd.parts), [(params, key)])
    if flops is not None:
        tflops_achieved = flops / dt / 1e12
        out["serve_gflops_per_image"] = round(flops / B / 1e9, 1)
        out["serve_tflops_achieved"] = round(tflops_achieved, 2)
        out["serve_mfu"] = round(tflops_achieved / PEAK_BF16_TFLOPS, 4)
    else:
        out["serve_flops_error"] = err
    return out


# ---------------------------------------------------------------------------
# stage: train step throughput (+ FLOPs/MFU)
# ---------------------------------------------------------------------------


def stage_train() -> dict:
    """images/s of the jitted bf16 sharded train step at batch 24 @ 320^2
    (forward + backward through 10 LM steps + AdamW), on-device batch."""
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
    )

    from geocalib_tpu.parallel.mesh import make_mesh, shard_batch
    from geocalib_tpu.training.train_step import (
        TrainConfig,
        create_train_state,
        make_sharded_train_step,
    )
    import __graft_entry__ as ge

    Bt = 24
    cfg = TrainConfig()
    net, state = create_train_state(jax.random.PRNGKey(0), cfg, (1, H, W, 3))
    mesh = make_mesh()
    batch = shard_batch(ge._synthetic_batch(Bt, H, W), mesh)
    step_fn = make_sharded_train_step(net, cfg, mesh)

    flops, flops_err = None, None
    try:
        c = step_fn.lower(state, batch, jax.random.PRNGKey(1)).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        flops = float(c["flops"])
    except Exception as e:
        traceback.print_exc()
        flops_err = f"{type(e).__name__}: {e}"

    # compile + TWO warm steps: through the remote relay the first post-
    # compile dispatch drains a multi-second queue (measured 20 s once) and
    # must not land in the timed window
    for i in range(3):
        state, out = step_fn(state, batch, jax.random.fold_in(jax.random.PRNGKey(1), i))
        float(out["loss/total"])  # host fetch = true sync
    n = 5
    t0 = time.time()
    for i in range(n):
        state, out = step_fn(state, batch, jax.random.fold_in(jax.random.PRNGKey(2), i))
    float(out["loss/total"])
    dt = (time.time() - t0) / n
    rec = {"train_images_per_s": round(Bt / dt, 2)}
    if flops is not None:
        tflops_achieved = flops / dt / 1e12
        rec["train_gflops_per_image"] = round(flops / Bt / 1e9, 1)
        rec["train_tflops_achieved"] = round(tflops_achieved, 2)
        rec["train_mfu"] = round(tflops_achieved / PEAK_BF16_TFLOPS, 4)
    else:
        rec["train_flops_error"] = flops_err
    return rec


# ---------------------------------------------------------------------------
# stage: host input pipeline
# ---------------------------------------------------------------------------


def stage_loader() -> dict:
    """Host-side loader rate (images/s) on the generated dataset —
    proves the input pipeline out-runs the train step (VERDICT r2 #2)."""
    root = os.path.dirname(os.path.abspath(__file__))
    ds_dir = None
    for cand in ("openpano_synth_v2", "openpano_synth"):
        if os.path.exists(os.path.join(root, "data", cand, "train.csv")):
            ds_dir = os.path.join(root, "data", cand)
            break
    if ds_dir is None:
        return {}
    from geocalib_tpu.data.dataset import DatasetConf, PrefetchLoader, SimpleDataset

    def rate(augmentation: str, n_batches: int = 12) -> float:
        ds = SimpleDataset(
            DatasetConf(dataset_dir=ds_dir, csv_name="train.csv", batch_size=24,
                        augmentation=augmentation)
        )
        loader = PrefetchLoader(ds)
        seen = 0
        it = loader.epoch(epoch=0)
        next(it)  # warm the workers before the clock starts
        t0 = time.time()
        for i, batch in enumerate(it):
            if i >= n_batches:
                break
            seen += len(batch["image"])
        return seen / (time.time() - t0)

    # "identity" is what training actually runs with augmentation="device"
    # (decode-only host, photometric augmentation on-chip inside the step);
    # the host-zoo rate is kept for comparison.
    return {
        "loader_images_per_s": round(rate("identity"), 2),
        "loader_host_aug_images_per_s": round(rate("geocalib", 6), 2),
    }


# ---------------------------------------------------------------------------
# orchestrator: one subprocess per stage, merged into ONE JSON line
# ---------------------------------------------------------------------------

STAGES = ("calibrate", "train", "loader")


def run_stage(name: str, timeout_s: int = 1500) -> dict:
    env = dict(os.environ)
    if name == "loader":
        # pure host work: never let the loader stage grab (or wait on) the chip
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env["JAX_PLATFORMS"] = "cpu"
    for attempt in range(2):
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--stage", name],
                capture_output=True, text=True, timeout=timeout_s, env=env,
            )
            for line in reversed(proc.stdout.strip().splitlines()):
                line = line.strip()
                if line.startswith("{"):
                    return json.loads(line)
            sys.stderr.write(
                f"stage {name} produced no JSON (rc={proc.returncode}):\n"
                + proc.stderr[-2000:] + "\n"
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(f"stage {name} timed out\n")
        if attempt == 0:
            time.sleep(10)  # give the relay time to release the chip
    return {}


def main():
    if len(sys.argv) >= 3 and sys.argv[1] == "--stage":
        stage = sys.argv[2]
        rec = {"calibrate": stage_calibrate, "train": stage_train,
               "loader": stage_loader}[stage]()
        print(json.dumps(rec))
        return

    merged: dict = {}
    for name in STAGES:
        merged.update(run_stage(name))

    img_per_s = merged.get("calibrate_images_per_s")
    record = {
        "metric": "calibrate_images_per_s",
        "value": img_per_s,
        "unit": "images/s",
        "vs_baseline": (
            round(img_per_s / REFERENCE_CPU_IMG_PER_S, 2) if img_per_s else None
        ),
        "batch": B,
    }
    for k, v in merged.items():
        if k != "calibrate_images_per_s":
            record[k] = v
    print(json.dumps(record))


if __name__ == "__main__":
    main()
