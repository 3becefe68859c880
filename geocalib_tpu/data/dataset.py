"""CSV-driven calibration dataset with on-device GT-field synthesis.

Re-design of /root/reference/siclib/datasets/simple_dataset.py +
base_dataset.py for TPU input pipelines:

- The host loader only decodes/augments images and assembles camera
  parameter rows; the per-pixel GT perspective fields are synthesized
  *on device inside the jitted train/eval step* (planar field code is
  ~free there) instead of per-sample in dataloader workers
  (simple_dataset.py:171-186).
- Batches have static shapes; the trailing partial batch is dropped
  (train) or padded with a validity mask (eval).
- Sharding: `epoch(shard=k, num_shards=n)` deals rows round-robin, the
  TPU-native stand-in for torch's DistributedSampler
  (base_dataset.py:167-193).
"""

import csv
import dataclasses
from pathlib import Path
from typing import Dict, Iterator, Optional

import numpy as np

from geocalib_tpu.data.augmentations import get_augmentation

Array = np.ndarray

CSV_FIELDS = ("fname", "height", "width", "vfov", "roll", "pitch", "k1", "k2")


@dataclasses.dataclass
class DatasetConf:
    dataset_dir: str = ""
    csv_name: str = "train.csv"  # under {dataset_dir}/
    image_dir: str = "images"
    batch_size: int = 24
    shuffle: bool = True
    augmentation: str = "identity"
    seed: int = 0
    camera_model: str = "pinhole"
    # include per-image file names in each batch (host-only metadata; the
    # eval pipeline uses them to key cached predictions — keep False for
    # training batches that feed straight into jit)
    return_names: bool = False


class SimpleDataset:
    """Rows of (fname, h, w, vfov, roll, pitch[, k1, k2]) + image files."""

    def __init__(self, conf: Optional[DatasetConf] = None, **kw):
        self.conf = conf or DatasetConf(**kw)
        root = Path(self.conf.dataset_dir)
        self.image_dir = root / self.conf.image_dir
        with open(root / self.conf.csv_name) as fh:
            self.rows = list(csv.DictReader(fh))
        assert self.rows, f"empty dataset {root / self.conf.csv_name}"
        self.aug = get_augmentation(self.conf.augmentation, self.conf.seed)
        self._epoch = 0

    def __len__(self) -> int:
        return len(self.rows)

    def _load_row(self, row: Dict[str, str], aug_seed: int) -> Dict[str, Array]:
        from geocalib_tpu.utils.image import load_image

        img = load_image(self.image_dir / row["fname"])
        # a fresh augmentation per call keeps _load_row thread-safe for the
        # PrefetchLoader workers (the instance only wraps a seeded rng)
        aug = get_augmentation(self.conf.augmentation, aug_seed)
        img = aug(img)
        h, w = img.shape[:2]
        params = np.array(
            [
                float(w),
                float(h),
                float(row["vfov"]),
                float(row["roll"]),
                float(row["pitch"]),
                float(row.get("k1", 0.0) or 0.0),
                float(row.get("k2", 0.0) or 0.0),
            ],
            np.float32,
        )
        return {"image": img.astype(np.float32), "gt_params": params}

    def epoch(
        self, epoch: int = 0, shard: int = 0, num_shards: int = 1,
        start_batch: int = 0,
    ) -> Iterator[Dict[str, Array]]:
        """Yield static-shape batches for one epoch (drops the partial tail).

        gt_params rows are (w, h, vfov, roll, pitch, k1, k2); use
        `batch_to_device_fields` in the step to build cameras + GT fields.
        start_batch skips ahead WITHOUT decoding the skipped batches (the
        rotating val window seeks instead of re-decoding from index 0).
        """
        conf = self.conf
        order = np.arange(len(self.rows))
        if conf.shuffle:
            np.random.default_rng(conf.seed + epoch).shuffle(order)
        order = order[shard::num_shards]

        B = conf.batch_size
        for start in range(start_batch * B, len(order) - B + 1, B):
            idx = order[start : start + B]
            samples = [
                self._load_row(self.rows[i], aug_seed=conf.seed + epoch * 1_000_003 + i)
                for i in idx
            ]
            batch = {
                "image": np.stack([s["image"] for s in samples]),
                "gt_params": np.stack([s["gt_params"] for s in samples]),
            }
            if conf.return_names:
                batch["names"] = [self.rows[i]["fname"] for i in idx]
            yield batch


class PrefetchLoader:
    """Threaded, double-buffered host input pipeline.

    The reference feeds its GPUs from multi-worker torch DataLoaders with
    prefetch (base_dataset.py:167-193, num_workers=8/prefetch_factor=2);
    the round-1 loader was a sequential single-thread loop that would starve
    a v5e chip at batch 24 @ 320². This wrapper decodes/augments rows in a
    thread pool (PIL decode and the numpy/PIL augment ops release the GIL)
    and keeps up to ``prefetch`` assembled batches ready in a queue.

    ``stall_s`` accumulates the time the consumer spent blocked waiting for
    a batch — if it stays ~0 the chip is compute-bound, not input-bound.
    """

    def __init__(self, dataset: SimpleDataset, num_workers: int = 8, prefetch: int = 2):
        self.dataset = dataset
        self.num_workers = num_workers
        self.prefetch = prefetch
        self.stall_s = 0.0

    def epoch(
        self, epoch: int = 0, shard: int = 0, num_shards: int = 1
    ) -> Iterator[Dict[str, Array]]:
        import queue
        import threading
        import time
        from concurrent.futures import ThreadPoolExecutor

        ds, conf = self.dataset, self.dataset.conf
        order = np.arange(len(ds.rows))
        if conf.shuffle:
            np.random.default_rng(conf.seed + epoch).shuffle(order)
        order = order[shard::num_shards]
        B = conf.batch_size
        starts = list(range(0, len(order) - B + 1, B))
        if not starts:
            return

        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        SENTINEL = object()
        stop = threading.Event()

        def put(item) -> bool:
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer(pool):
            try:
                for start in starts:
                    if stop.is_set():
                        return
                    idx = order[start : start + B]
                    futures = [
                        pool.submit(
                            ds._load_row,
                            ds.rows[i],
                            conf.seed + epoch * 1_000_003 + i,
                        )
                        for i in idx
                    ]
                    samples = [f.result() for f in futures]
                    batch = {
                        "image": np.stack([s["image"] for s in samples]),
                        "gt_params": np.stack([s["gt_params"] for s in samples]),
                    }
                    if conf.return_names:
                        batch["names"] = [ds.rows[i]["fname"] for i in idx]
                    if not put(batch):
                        return
            finally:
                put(SENTINEL)

        with ThreadPoolExecutor(self.num_workers) as pool:
            thread = threading.Thread(target=producer, args=(pool,), daemon=True)
            thread.start()
            try:
                while True:
                    t0 = time.time()
                    batch = out_q.get()
                    self.stall_s += time.time() - t0
                    if batch is SENTINEL:
                        break
                    yield batch
            finally:
                stop.set()
                while not out_q.empty():  # unblock a waiting producer
                    out_q.get_nowait()
                thread.join()


def batch_gt(batch: Dict, camera_model: str = "pinhole"):
    """Build GT Camera/Gravity pytrees from a gt_params batch (device-side)."""
    import jax.numpy as jnp

    from geocalib_tpu.geometry.camera import Camera
    from geocalib_tpu.geometry.gravity import Gravity

    p = jnp.asarray(batch["gt_params"], jnp.float32)
    cam = Camera.from_dict(
        {
            "width": p[:, 0],
            "height": p[:, 1],
            "vfov": p[:, 2],
            "k1": p[:, 5],
            "k2": p[:, 6],
        },
        model=camera_model,
    )
    grav = Gravity.from_rp(p[:, 3], p[:, 4])
    return cam, grav


def synthesize_gt_fields(batch: Dict, camera_model: str = "pinhole") -> Dict:
    """Device-side GT field synthesis; returns a full training batch."""
    from geocalib_tpu.geometry.perspective_fields import get_perspective_field

    cam, grav = batch_gt(batch, camera_model)
    h, w = batch["image"].shape[1:3]
    up, lat = get_perspective_field(cam, grav, h, w)
    return {
        "image": batch["image"],
        "up_field": up,
        "latitude_field": lat,
        "camera": cam,
        "gravity": grav,
    }
