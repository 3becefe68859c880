"""DeepCalib baseline trainer: staged on-device loop for the bin-classifier.

The reference trains DeepCalib with the same train.py harness as GeoCalib
(/root/reference/siclib/models/networks/deepcalib.py used via
siclib/configs/deepcalib.yaml); here the baseline gets its own compact
staged loop — the full GeoCalib trainer's LM/field machinery does not apply
to a classification-head model, and the staged DeviceStore path is the only
input pipeline that outruns the chip on this host.

Usage:
    python -m geocalib_tpu.training.train_deepcalib deepcalib_r04 \
        data.dataset_dir=data/openpano_synth_v2 train.total_steps=4000

Writes orbax checkpoints + JSONL logs under outputs/training/<exp>, and a
final msgpack export (weights/deepcalib_<exp>.msgpack) for the eval
pipeline.
"""

import argparse
import time
from functools import partial
from pathlib import Path
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from geocalib_tpu.data.dataset import DatasetConf, SimpleDataset
from geocalib_tpu.models.deepcalib import BOUNDS, HEADS, DeepCalib
from geocalib_tpu.parallel.mesh import make_mesh, replicated
from geocalib_tpu.training.checkpoint import ExperimentManager
from geocalib_tpu.training.device_store import DeviceStore, sample_batch
from geocalib_tpu.utils.config import apply_dotlist, merge, save_yaml
from geocalib_tpu.utils.conversions import fov2focal, pitch2rho
from geocalib_tpu.utils.summary_writer import SummaryWriter

default_conf: Dict[str, Any] = {
    "seed": 0,
    "train": {
        "lr": 1e-4,
        "weight_decay": 1e-2,
        "clip_grad": 1.0,
        "warmup_steps": 200,
        "total_steps": 4000,
        "num_bins": 256,
        "log_every": 50,
        "eval_every": 500,
        "save_every": 1000,
        "input_size": 320,
        # tiny-ish DenseNet trunk: the full 161 recipe needs ImageNet
        # pretraining the sandbox cannot download; this trunk trains from
        # scratch in minutes and gives the accuracy table its learned
        # baseline row
        "block_config": [4, 8, 12, 8],
        "growth_rate": 32,
        "staged_subset": 8192,
        # device augmentation preset (reference deepcalib.yaml trains with
        # its "deepcalib" zoo; see data/device_augment.DEVICE_AUGMENTATIONS)
        "augmentation": "deepcalib",
        # warm-start from an exported msgpack (empty = train from scratch)
        "init_weights": "",
    },
    "data": {"dataset_dir": "", "batch_size": 32},
}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any


def gt_heads(gt_params: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """gt_params rows (w, h, vfov, roll, pitch, k1, k2) → per-head targets."""
    w, h, vfov, roll, pitch, k1 = (gt_params[:, i] for i in range(6))
    f = fov2focal(vfov, h)
    rho = pitch2rho(pitch, f, h)
    k1_hat = k1 / (f / h) ** 2
    return {"roll": roll, "rho": rho, "vfov": vfov, "k1_hat": k1_hat}


def make_train_step(net: DeepCalib, opt, num_bins: int, batch_size: int, augment="deepcalib"):
    @partial(jax.jit, donate_argnums=(0,))
    def step(state: TrainState, images, gt_params, rng):
        k_batch, k_drop = jax.random.split(rng)
        batch = sample_batch(images, gt_params, k_batch, batch_size, augment=augment)
        gt = gt_heads(batch["gt_params"])

        def loss_fn(p):
            out, mut = net.apply(
                {"params": p, "batch_stats": state.batch_stats},
                batch["image"].astype(jnp.bfloat16),
                train=True,
                mutable=["batch_stats"],
            )
            out = {k: v.astype(jnp.float32) for k, v in out.items()}
            loss = DeepCalib.loss(out, gt, num_bins).mean()
            return loss, (mut["batch_stats"], out)

        (loss, (new_stats, out)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)
        updates, new_opt = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        scalars = {"loss/total": loss}
        for head in HEADS:
            scalars[f"metric/{head}_err"] = jnp.abs(out[head] - gt[head]).mean()
        return (
            TrainState(
                step=state.step + 1, params=params,
                batch_stats=new_stats, opt_state=new_opt,
            ),
            scalars,
        )

    return step


def make_eval_step(net: DeepCalib, num_bins: int, batch_size: int):
    @jax.jit
    def eval_window(state: TrainState, images, gt_params, start):
        idx = (start + jnp.arange(batch_size)) % images.shape[0]
        img = jnp.take(images, idx, axis=0).astype(jnp.float32) / 255.0
        gt = gt_heads(jnp.take(gt_params, idx, axis=0))
        out = net.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            img.astype(jnp.bfloat16),
            train=False,
        )
        out = {k: v.astype(jnp.float32) for k, v in out.items()}
        scalars = {"loss/total": DeepCalib.loss(out, gt, num_bins).mean()}
        for head in HEADS:
            scalars[f"metric/{head}_err"] = jnp.abs(out[head] - gt[head]).mean()
        return scalars

    return eval_window


def training(conf: Dict[str, Any], output_dir: str, restore: bool = False):
    out_dir = Path(output_dir)
    writer = SummaryWriter(out_dir / "logs")
    save_yaml(conf, out_dir / "config.yaml")
    t_conf, dconf = conf["train"], conf["data"]
    size = int(t_conf["input_size"])
    batch = int(dconf["batch_size"])
    num_bins = int(t_conf["num_bins"])

    net = DeepCalib(
        num_bins=num_bins,
        block_config=tuple(t_conf["block_config"]),
        growth_rate=int(t_conf["growth_rate"]),
    )
    rng = jax.random.PRNGKey(int(conf["seed"]))
    variables = jax.jit(net.init)(
        {"params": rng}, jnp.zeros((1, size, size, 3), jnp.float32)
    )
    schedule = optax.join_schedules(
        [
            optax.linear_schedule(0.0, float(t_conf["lr"]), int(t_conf["warmup_steps"])),
            optax.cosine_decay_schedule(
                float(t_conf["lr"]),
                max(1, int(t_conf["total_steps"]) - int(t_conf["warmup_steps"])),
            ),
        ],
        [int(t_conf["warmup_steps"])],
    )
    opt = optax.chain(
        optax.clip_by_global_norm(float(t_conf["clip_grad"])),
        optax.adamw(schedule, weight_decay=float(t_conf["weight_decay"])),
    )
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt.init(variables["params"]),
    )
    manager = ExperimentManager(out_dir)
    start_step = 0
    if restore and manager.latest_step() is not None:
        state, start_step = manager.restore(state)
        print(f"restored checkpoint at step {start_step}")
    elif str(t_conf.get("init_weights", "") or ""):
        # warm-start from an exported msgpack (same bridge as the flagship's
        # train.init_weights; lets a later round continue a baseline run
        # whose orbax dir is gone)
        from flax import serialization

        raw = Path(str(t_conf["init_weights"])).read_bytes()
        payload = serialization.from_bytes(None, raw)
        state = state.replace(
            params=serialization.from_state_dict(variables["params"], payload["params"]),
            batch_stats=serialization.from_state_dict(
                variables.get("batch_stats", {}), payload.get("batch_stats", {})
            ),
        )
        print(f"initialized weights from {t_conf['init_weights']}")

    mesh = make_mesh()
    repl = replicated(mesh)
    mk = lambda csv: SimpleDataset(
        DatasetConf(
            dataset_dir=dconf["dataset_dir"], csv_name=csv, batch_size=batch,
            augmentation="identity",
        )
    )
    # stage a bounded random subset (the full 32k-crop v2 split would not
    # share HBM with the DenseNet's activations)
    train_rows = mk("train.csv")
    cap = int(t_conf.get("staged_subset", 8192) or 0)
    if cap and cap < len(train_rows.rows):
        idx = np.random.default_rng(int(conf["seed"]) + 3).choice(
            len(train_rows.rows), size=cap, replace=False
        )
        store = DeviceStore.stage(train_rows, sharding=repl, row_indices=idx)
    else:
        store = DeviceStore.stage(train_rows, sharding=repl)
    val_ds = mk("val.csv")
    val_store = DeviceStore.stage(
        val_ds, sharding=repl, row_indices=range(min(1024, len(val_ds.rows)))
    )

    step_fn = make_train_step(net, opt, num_bins, batch, t_conf.get("augmentation", "deepcalib"))
    eval_fn = make_eval_step(net, num_bins, batch)

    total = int(t_conf["total_steps"])
    loop_rng = jax.random.PRNGKey(int(conf["seed"]) + 1)
    t0 = time.time()
    scalars: Dict[str, float] = {}
    for step in range(start_step, total):
        loop_rng, step_rng = jax.random.split(loop_rng)
        state, out = step_fn(state, store.images, store.gt_params, step_rng)
        if step % int(t_conf["log_every"]) == 0:
            scalars = {k: float(v) for k, v in jax.device_get(out).items()}
            rate = (
                batch * int(t_conf["log_every"]) / (time.time() - t0)
                if step > start_step else 0.0
            )
            t0 = time.time()
            writer.add_scalars(scalars | {"images_per_s": rate}, step)
            print(
                f"[{step}/{total}] loss {scalars['loss/total']:.3f} "
                f"roll_err {scalars['metric/roll_err']:.4f} "
                f"vfov_err {scalars['metric/vfov_err']:.4f} ({rate:.1f} img/s)",
                flush=True,
            )
        if step > start_step and step % int(t_conf["eval_every"]) == 0:
            vals = []
            for i in range(8):
                vals.append(
                    jax.device_get(
                        eval_fn(state, val_store.images, val_store.gt_params,
                                jnp.asarray(i * batch, jnp.int32))
                    )
                )
            val = {k: float(np.mean([v[k] for v in vals])) for k in vals[0]}
            writer.add_scalars(val, step, prefix="val/")
            print(f"[{step}] val loss {val['loss/total']:.3f} "
                  f"roll_err {val['metric/roll_err']:.4f}", flush=True)
        if step > start_step and step % int(t_conf["save_every"]) == 0:
            manager.save(state, step, conf)
    manager.save(state, total, conf, scalars)
    writer.close()

    # msgpack export for the eval pipeline / accuracy table
    from flax import serialization

    weights_dir = Path("weights")
    weights_dir.mkdir(exist_ok=True)
    payload = {"params": jax.device_get(state.params),
               "batch_stats": jax.device_get(state.batch_stats),
               "conf": {"num_bins": num_bins,
                        "block_config": list(t_conf["block_config"]),
                        "growth_rate": int(t_conf["growth_rate"])}}
    path = weights_dir / f"deepcalib_{out_dir.name}.msgpack"
    path.write_bytes(serialization.to_bytes(payload))
    print(f"exported {path}")
    return scalars


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("experiment")
    ap.add_argument("--restore", action="store_true")
    ap.add_argument("--output_root", default="outputs/training")
    ap.add_argument("dotlist", nargs="*")
    args = ap.parse_args()
    conf = apply_dotlist(merge(default_conf, None), args.dotlist)
    training(conf, Path(args.output_root) / args.experiment, restore=args.restore)


if __name__ == "__main__":
    main()
