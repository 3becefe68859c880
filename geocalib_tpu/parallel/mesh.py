"""Device mesh and sharding helpers.

The reference's entire distributed stack is NCCL DDP (torch spawn, 1
process/GPU — /root/reference/siclib/train.py:275-337). The TPU-native
equivalent is declarative: one jax.sharding.Mesh, PartitionSpecs on the
batch axis, and XLA-emitted ICI/DCN collectives. These helpers centralize
that layer (SURVEY.md §2.6).
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None, axis: str = DATA_AXIS) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def batch_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = DATA_AXIS):
    """Place every leaf of a batch pytree with its leading dim sharded.

    Single-process: a plain device_put split over local devices. Multi-host:
    each process holds only its own rows (the loader deals rows per process,
    SimpleDataset.epoch(shard=...)), so the global array is assembled from
    process-local shards — the jax equivalent of DistributedSampler feeding
    DDP ranks (reference base_dataset.py:167-193).
    """
    sh = batch_sharding(mesh, axis)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

    def put(x):
        import numpy as np_

        x = np_.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        return jax.make_array_from_process_local_data(sh, x, global_shape)

    return jax.tree.map(put, batch)


def maybe_initialize_distributed() -> None:
    """Call jax.distributed.initialize() when launched multi-process.

    The reference's equivalent is init_process_group(nccl)
    (siclib/train.py:275-280). Harmless no-op for single-process runs;
    trigger env vars cover TPU pods (auto-detected) and explicit
    coordinator setups.
    """
    import os

    triggers = (
        "COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
        "JAX_NUM_PROCESSES",
    )
    if any(os.environ.get(k) for k in triggers):
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError) as e:  # already initialized / no cluster
            import logging

            logging.getLogger(__name__).warning(
                "jax.distributed.initialize() skipped: %s", e
            )
