"""Training-step budget: forward / LM / backward / optimizer decomposition.

VERDICT r4 missing #3: all 17 profile studies target the serving path while
train MFU sits at 13.2%. This tool dissects the real train step (variant b,
bf16, batch 24 @ 320², 10-step LM, ift backward — the exact
outputs/training/geocalib_synth_r04/config.yaml recipe) by timing nested
prefixes of the computation and differencing:

  net_fwd        backbone+heads forward (train mode, BN mutation)
  +lm_fwd        ... + 10-step LM solve
  +loss          ... + geocalib losses (full forward value)
  grad_net       backward through net only (field losses, no LM)
  grad_full      backward through net+LM (the real loss)
  step           full train_step incl. optimizer + (single-dev) collectives

Also sweeps batch size and the fused-head training forward when present.
Writes PROFILE_train_budget.json next to the repo root.

Reference op baseline: the reference trains on 2×4090 (README.md:574).
"""

import argparse
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

from geocalib_tpu.data.dataset import synthesize_gt_fields
from geocalib_tpu.optim.lm import run_lm
from geocalib_tpu.training.losses import geocalib_losses
from geocalib_tpu.training.train_step import (
    TrainConfig,
    create_train_state,
    make_optimizer,
)

N_ITERS = 8


def make_batch(rng, b, size=320):
    """Synthetic batch matching the staged-loader layout (image + gt_params)."""
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    image = jax.random.uniform(k1, (b, size, size, 3), jnp.float32)
    gt_params = jnp.stack(
        [
            jnp.full((b,), float(size)),
            jnp.full((b,), float(size)),
            jax.random.uniform(k2, (b,), jnp.float32, 0.6, 1.5),  # vfov (rad)
            jax.random.uniform(k3, (b,), jnp.float32, -0.3, 0.3),  # roll
            jax.random.uniform(k4, (b,), jnp.float32, -0.3, 0.3),  # pitch
            jnp.zeros((b,)),
            jnp.zeros((b,)),
        ],
        axis=-1,
    )
    return synthesize_gt_fields({"image": image, "gt_params": gt_params}, "pinhole")


def _sync(out):
    """On the axon relay block_until_ready can return before execution
    finishes (bench.py:28-30); a host fetch is the only true sync."""
    np.asarray(jax.tree.leaves(out)[0])


def timeit(fn, *args, n=N_ITERS):
    _sync(fn(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    _sync(out)  # in-order device queue: last done => all done
    return (time.perf_counter() - t0) / n * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="24")
    ap.add_argument("--variant", type=str, default="b")
    ap.add_argument("--fused", action="store_true", help="also profile the fused-head training forward")
    ap.add_argument("--fused-only", action="store_true", help="skip the baseline sections (clean-process fused measurement)")
    ap.add_argument("--out", type=str, default="PROFILE_train_budget.json")
    args = ap.parse_args()

    cfg = TrainConfig(variant=args.variant)
    rng = jax.random.PRNGKey(0)
    # single-device profile: no mesh, so build the net without a BN axis name
    # (create_train_state wires bn_axis_name=DATA_AXIS for shard_map)
    from geocalib_tpu.models import GeoCalibNet
    from geocalib_tpu.training.train_step import TrainState

    net = GeoCalibNet(variant=cfg.variant, drop_path_rate=cfg.drop_path_rate)
    variables = jax.jit(net.init)(
        {"params": rng}, jnp.zeros((1, 320, 320, 3), jnp.float32)
    )
    opt = make_optimizer(cfg)
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]),
    )
    results = {"device": str(jax.devices()[0]), "variant": args.variant}

    dtype = jnp.dtype(cfg.compute_dtype)
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t
    )

    def net_fwd(params, stats, batch, rng):
        d_rng, n_rng = jax.random.split(rng)
        fields, mut = net.apply(
            {"params": cast(params), "batch_stats": stats},
            batch["image"].astype(dtype),
            train=True,
            rngs={"dropout": d_rng, "nmf": n_rng},
            mutable=["batch_stats"],
        )
        return {k: v.astype(jnp.float32) for k, v in fields.items()}, mut

    def fwd_value(params, stats, batch, rng, with_lm, with_loss):
        fields, mut = net_fwd(params, stats, batch, rng)
        if not with_lm:
            # field losses only (keeps the backward comparable)
            l = sum(jnp.mean(jnp.abs(v)) for v in fields.values())
            return l, mut
        res = run_lm(dict(fields), cfg.lm_config())
        if not with_loss:
            l = jnp.mean(res.camera.f) + jnp.mean(res.gravity.vec3d[..., 0])
            return l, mut
        losses = geocalib_losses(
            fields, res.camera, res.gravity, batch, batch["camera"], batch["gravity"]
        )
        return losses["total"].mean(), mut

    for b in [int(x) for x in args.batches.split(",")] if not args.fused_only else []:
        batch = make_batch(jax.random.PRNGKey(1), b)
        jax.block_until_ready(batch)
        row = {}

        f_net = jax.jit(lambda p, s, bt, r: fwd_value(p, s, bt, r, False, False)[0])
        f_lm = jax.jit(lambda p, s, bt, r: fwd_value(p, s, bt, r, True, False)[0])
        f_loss = jax.jit(lambda p, s, bt, r: fwd_value(p, s, bt, r, True, True)[0])
        row["fwd_net_ms"] = timeit(f_net, state.params, state.batch_stats, batch, rng)
        row["fwd_net_lm_ms"] = timeit(f_lm, state.params, state.batch_stats, batch, rng)
        row["fwd_full_ms"] = timeit(f_loss, state.params, state.batch_stats, batch, rng)

        g_net = jax.jit(jax.grad(lambda p, s, bt, r: fwd_value(p, s, bt, r, False, False)[0]))
        g_full = jax.jit(jax.grad(lambda p, s, bt, r: fwd_value(p, s, bt, r, True, True)[0]))
        row["grad_net_ms"] = timeit(g_net, state.params, state.batch_stats, batch, rng)
        row["grad_full_ms"] = timeit(g_full, state.params, state.batch_stats, batch, rng)

        def full_step(st, bt, r):
            (loss, mut), grads = jax.value_and_grad(
                lambda p: fwd_value(p, st.batch_stats, bt, r, True, True), has_aux=True
            )(st.params)
            updates, new_opt = opt.update(grads, st.opt_state, st.params)
            import optax

            new_params = optax.apply_updates(st.params, updates)
            return st.replace(
                step=st.step + 1,
                params=new_params,
                opt_state=new_opt,
                batch_stats=mut["batch_stats"],
            )

        f_step = jax.jit(full_step, donate_argnums=(0,))
        # donate a COPY: `state` is reused by later sections
        st = f_step(jax.tree.map(jnp.copy, state), batch, rng)  # compile
        _sync(st.step)
        t0 = time.perf_counter()
        for _ in range(N_ITERS):
            st = f_step(st, batch, rng)
        _sync(st.step)
        row["step_ms"] = (time.perf_counter() - t0) / N_ITERS * 1e3

        row["img_per_s"] = b / row["step_ms"] * 1e3
        row["derived"] = {
            "lm_fwd_ms": row["fwd_net_lm_ms"] - row["fwd_net_ms"],
            "loss_ms": row["fwd_full_ms"] - row["fwd_net_lm_ms"],
            "net_bwd_ms": row["grad_net_ms"] - row["fwd_net_ms"],
            "lm_bwd_extra_ms": row["grad_full_ms"] - row["grad_net_ms"],
            "opt_ms": row["step_ms"] - row["grad_full_ms"],
        }
        results[f"batch_{b}"] = row
        print(f"batch {b}: " + json.dumps(row), flush=True)

    if args.fused or args.fused_only:
        try:
            from geocalib_tpu.models.fused_heads import fused_forward_train

            for b in [int(x) for x in args.batches.split(",")]:
                batch = make_batch(jax.random.PRNGKey(1), b)

                def fused_loss(params, stats, bt, r):
                    d_rng, n_rng = jax.random.split(r)
                    fields, mut = fused_forward_train(
                        {"params": cast(params), "batch_stats": stats},
                        bt["image"].astype(dtype),
                        variant=args.variant,
                        drop_path_rate=cfg.drop_path_rate,
                        rngs={"dropout": d_rng, "nmf": n_rng},
                    )
                    fields = {k: v.astype(jnp.float32) for k, v in fields.items()}
                    res = run_lm(dict(fields), cfg.lm_config())
                    losses = geocalib_losses(
                        fields, res.camera, res.gravity, bt, bt["camera"], bt["gravity"]
                    )
                    return losses["total"].mean(), mut

                def fused_step(st, bt, r):
                    (loss, mut), grads = jax.value_and_grad(fused_loss, has_aux=True)(
                        st.params, st.batch_stats, bt, r
                    )
                    updates, new_opt = opt.update(grads, st.opt_state, st.params)
                    import optax

                    return st.replace(
                        step=st.step + 1,
                        params=optax.apply_updates(st.params, updates),
                        opt_state=new_opt,
                        batch_stats=mut["batch_stats"],
                    )

                f_step = jax.jit(fused_step, donate_argnums=(0,))
                st = f_step(jax.tree.map(jnp.copy, state), batch, rng)
                _sync(st.step)
                t0 = time.perf_counter()
                for _ in range(N_ITERS):
                    st = f_step(st, batch, rng)
                _sync(st.step)
                ms = (time.perf_counter() - t0) / N_ITERS * 1e3
                results.setdefault(f"batch_{b}", {})["fused_step_ms"] = ms
                results[f"batch_{b}"]["fused_img_per_s"] = b / ms * 1e3
                print(f"batch {b} fused: {ms:.1f} ms ({b / ms * 1e3:.1f} img/s)", flush=True)
        except ImportError as e:
            results["fused_error"] = str(e)
            print(f"fused forward unavailable: {e}", flush=True)

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", args.out)
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps({k: v for k, v in results.items() if k.startswith("batch")}, indent=1))


if __name__ == "__main__":
    main()
