"""Device-resident dataset: stage once, sample every batch on-chip.

The reference feeds its GPUs from multi-worker host DataLoaders
(/root/reference/siclib/datasets/base_dataset.py:167-193). On the remote-TPU
relay used here the host<->device link is slow and occasionally stalls for
minutes, so any per-step host transfer makes the chip input-bound. The
staged path uploads the *entire* dataset (uint8 images + the 7-float GT
parameter rows) to HBM once — ~1.4 GB for the 4.6k-image synthetic train
split, a one-time cost — and then every batch is assembled inside the jitted
train step: on-device index sampling, uint8->f32 decode, photometric
augmentation (`data/device_augment.py`), and GT perspective-field synthesis.
After staging, a training run needs zero host->device image traffic.

This is the TPU-native answer to the loader problem, not an emulation of
the reference's sampler: sampling is i.i.d. uniform with replacement
(per-step `jax.random.randint`) instead of epoch permutations — for SGD on
a synthetic, continuously regenerable dataset the distinction is
statistical noise, and it keeps the step free of host-side epoch state.
"""

import dataclasses
import time
from functools import partial
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geocalib_tpu.data.device_augment import device_augment
from geocalib_tpu.parallel.mesh import DATA_AXIS

Array = jnp.ndarray


@dataclasses.dataclass
class DeviceStore:
    """Raw dataset resident on device: images uint8 (N,H,W,3), params (N,7).

    gt_params rows are (w, h, vfov, roll, pitch, k1, k2) — the same layout
    `SimpleDataset.epoch` emits (data/dataset.py).
    """

    images: Array
    gt_params: Array

    def __len__(self) -> int:
        return int(self.images.shape[0])

    @classmethod
    def stage(
        cls,
        dataset,
        chunk_images: int = 256,
        progress: Optional[Callable[[str], None]] = print,
        sharding=None,
        row_indices=None,
    ) -> "DeviceStore":
        """Decode every image on host and upload in chunks.

        Chunked uploads (~20 MB each) keep the relay's transfer queue
        shallow so a single stall cannot wedge the whole staging step.
        row_indices selects a subset of the dataset (the shard-refresh
        path for datasets bigger than their HBM budget).
        """
        rows = (
            dataset.rows
            if row_indices is None
            else [dataset.rows[int(i)] for i in row_indices]
        )
        img_dir = dataset.image_dir
        from geocalib_tpu.utils.image import load_image

        n = len(rows)
        first = load_image(img_dir / rows[0]["fname"])
        h, w = first.shape[:2]
        params = np.zeros((n, 7), np.float32)
        for i, row in enumerate(rows):
            params[i] = (
                float(row["width"]),
                float(row["height"]),
                float(row["vfov"]),
                float(row["roll"]),
                float(row["pitch"]),
                float(row.get("k1", 0.0) or 0.0),
                float(row.get("k2", 0.0) or 0.0),
            )

        device_chunks = []
        t0 = time.time()
        for start in range(0, n, chunk_images):
            idx = range(start, min(start + chunk_images, n))
            host = np.stack(
                [
                    np.clip(
                        load_image(img_dir / rows[i]["fname"]) * 255.0, 0, 255
                    ).astype(np.uint8)
                    for i in idx
                ]
            )
            assert host.shape[1:3] == (h, w), (
                f"staged datasets must be fixed-size; {rows[start]['fname']} is "
                f"{host.shape[1:3]} vs {(h, w)}"
            )
            chunk = (
                jax.device_put(host, sharding) if sharding is not None else jax.device_put(host)
            )
            chunk.block_until_ready()
            device_chunks.append(chunk)
            if progress:
                done = min(start + chunk_images, n)
                mb = done * h * w * 3 / 1e6
                progress(
                    f"staging {done}/{n} images ({mb:.0f} MB, "
                    f"{mb / max(time.time() - t0, 1e-9):.1f} MB/s)"
                )
        images = jnp.concatenate(device_chunks, axis=0)
        images.block_until_ready()
        gt = (
            jax.device_put(params, sharding)
            if sharding is not None
            else jax.device_put(params)
        )
        if progress:
            progress(f"staged {n} images in {time.time() - t0:.0f}s")
        return cls(images=images, gt_params=gt)


def sample_batch(
    store_images: Array,
    store_params: Array,
    rng: Array,
    batch_size: int,
    augment: bool = True,
) -> Dict[str, Array]:
    """On-device batch assembly: sample, decode, augment."""
    k_idx, k_aug = jax.random.split(rng)
    idx = jax.random.randint(k_idx, (batch_size,), 0, store_images.shape[0])
    img = jnp.take(store_images, idx, axis=0).astype(jnp.float32) / 255.0
    if augment:
        img = device_augment(img, k_aug)
    return {"image": img, "gt_params": jnp.take(store_params, idx, axis=0)}


def make_staged_train_step(
    net, cfg, mesh: Mesh, batch_size: int, augment: bool = True
):
    """jit((state, images, params, rng) -> (state, scalars)) — everything,
    including batch assembly, in one on-device executable."""
    from geocalib_tpu.training.train_step import train_step

    sharded = jax.shard_map(
        lambda s, b, r: train_step(net, cfg, s, b, r),
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    batch_sh = NamedSharding(mesh, P(DATA_AXIS))

    @partial(jax.jit, donate_argnums=(0,))
    def step(state, images, gt_params, rng):
        k_batch, k_step = jax.random.split(rng)
        batch = sample_batch(images, gt_params, k_batch, batch_size, augment)
        batch = jax.lax.with_sharding_constraint(batch, batch_sh)
        return sharded(state, batch, k_step)

    return step


def make_staged_eval_step(net, cfg, batch_size: int):
    """Deterministic on-device validation over a window of staged rows."""
    from geocalib_tpu.training.train_step import loss_and_updates

    @jax.jit
    def eval_window(state, images, gt_params, start, rng):
        idx = (start + jnp.arange(batch_size)) % images.shape[0]
        batch = {
            "image": jnp.take(images, idx, axis=0).astype(jnp.float32) / 255.0,
            "gt_params": jnp.take(gt_params, idx, axis=0),
        }
        _, (_, losses, metrics) = loss_and_updates(
            net, cfg, state.params, state.batch_stats, batch, rng, train=False
        )
        out = {f"loss/{k}": v.mean() for k, v in losses.items()}
        out |= {f"metric/{k}": v.mean() for k, v in metrics.items()}
        return out

    return eval_window


def staged_evaluate(
    eval_window, state, store: DeviceStore, rng, batch_size: int, max_batches: int = 10,
    eval_idx: int = 0,
) -> Dict[str, float]:
    """Rotating-window validation (mirrors training.train.evaluate)."""
    n = len(store)
    n_batches = max(1, n // batch_size)
    start0 = (eval_idx * max_batches) % n_batches if n_batches > max_batches else 0
    agg: Dict[str, list] = {}
    for i in range(min(max_batches, n_batches)):
        start = ((start0 + i) * batch_size) % max(n - batch_size + 1, 1)
        out = eval_window(
            state, store.images, store.gt_params, jnp.asarray(start, jnp.int32), rng
        )
        for key, v in out.items():
            agg.setdefault(key, []).append(float(v))
    return {k: float(np.mean(v)) for k, v in agg.items()}
