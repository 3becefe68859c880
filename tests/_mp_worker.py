"""Worker process for the multi-process distributed test.

Launched by tests/test_multiprocess.py: each of 2 processes owns 4 virtual
CPU devices, joins a jax.distributed cluster (8 global devices), runs ONE
sharded train step + one sharded shared-intrinsics LM solve on its local
rows of a deterministic global batch, and prints scalars for the parent to
compare against the single-process result. The reference's analog is an
actually-launched 2-rank DDP run (siclib/train.py:275-280).
"""

import os
import sys


def main():
    coordinator, pid, nproc = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

    import jax

    # match conftest.py: random draws must use the same PRNG implementation
    # as the single-process reference (the partitionable flag changes
    # generated values for large draws, e.g. the fused forward's NMF bases)
    jax.config.update("jax_threefry_partitionable", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        ),
    )
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert len(jax.devices()) == nproc * 4, len(jax.devices())

    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __graft_entry__ as ge
    from geocalib_tpu.optim.lm import LMConfig, run_lm
    from geocalib_tpu.parallel.mesh import DATA_AXIS, make_mesh, shard_batch
    from geocalib_tpu.training.train_step import (
        TrainConfig,
        create_train_state,
        make_sharded_train_step,
    )

    n_dev = len(jax.devices())
    mesh = make_mesh()  # all 8 global devices

    # Every XLA:CPU executable creates its own Gloo context whose key
    # exchange times out after 30s — far less than the worker-to-worker
    # compile skew of the big fused train step. So: AOT-compile each
    # collective-bearing program, rendezvous at a coordination-service RPC
    # barrier (no device collective involved), THEN execute — both workers
    # enter the Gloo key exchange within milliseconds of each other.
    from jax._src import distributed

    _barrier_n = [0]

    def run_synced(jitted, *args):
        compiled = jitted.lower(*args).compile()
        _barrier_n[0] += 1
        distributed.global_state.client.wait_at_barrier(
            f"compiled_{_barrier_n[0]}", 900_000
        )
        return compiled(*args)

    # deterministic GLOBAL batch; this process keeps only its own rows
    B, H, W = n_dev * 2, 64, 64
    batch = ge._synthetic_batch(B, H, W)
    rows = slice(pid * (B // nproc), (pid + 1) * (B // nproc))
    local = jax.tree.map(lambda x: np.asarray(x)[rows], batch)
    gbatch = shard_batch(local, mesh)

    cfg = TrainConfig(variant="tiny", lm_steps=3, drop_path_rate=0.1)
    net, state = create_train_state(jax.random.PRNGKey(0), cfg, (1, H, W, 3))
    step_fn = make_sharded_train_step(net, cfg, mesh)
    state, scalars = run_synced(step_fn, state, gbatch, jax.random.PRNGKey(1))
    loss = float(jax.device_get(scalars["loss/total"]))
    checksum = float(
        sum(
            jax.device_get(jnp.sum(jnp.abs(x.astype(jnp.float32))))
            for x in jax.tree.leaves(state.params)
        )
    )

    # sharded shared-intrinsics LM (cross-process psum of intrinsic blocks)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    data = {
        "up_field": np.asarray(batch["up_field"])[rows],
        "latitude_field": np.asarray(batch["latitude_field"])[rows],
    }
    lm_cfg = LMConfig(shared_intrinsics=True, num_steps=5, axis_name=DATA_AXIS)
    sharded_lm = jax.jit(
        shard_map(
            lambda d: run_lm(d, lm_cfg),
            mesh=mesh,
            in_specs=(P(DATA_AXIS),),
            out_specs=P(DATA_AXIS),
            check_vma=False,
        )
    )
    out = run_synced(sharded_lm, shard_batch(data, mesh))
    # every lane shares one focal; local lanes suffice for the value
    vfov = float(jax.device_get(out.camera.vfov.addressable_shards[0].data.ravel()[0]))

    # staged path: store sharded over the global mesh, each process decodes
    # + uploads only its own devices' rows, one fully-on-chip train step
    staged_loss = float("nan")
    if len(sys.argv) > 4:
        from geocalib_tpu.data.dataset import DatasetConf, SimpleDataset
        from geocalib_tpu.training.device_store import (
            DeviceStore,
            make_staged_train_step,
        )

        ds = SimpleDataset(
            DatasetConf(dataset_dir=sys.argv[4], csv_name="train.csv",
                        batch_size=8, augmentation="identity")
        )
        store = DeviceStore.stage_sharded(ds, mesh, progress=None)
        net2, state2 = create_train_state(
            jax.random.PRNGKey(0), cfg, (1, 64, 64, 3)
        )
        staged_fn = make_staged_train_step(net2, cfg, mesh, 8, augment=True)
        state2, sc = run_synced(
            staged_fn, state2, store.images, store.gt_params, jax.random.PRNGKey(5)
        )
        staged_loss = float(jax.device_get(sc["loss/total"]))

    print(
        f"MP_RESULT pid={pid} loss={loss:.8f} checksum={checksum:.4f} "
        f"vfov={vfov:.8f} staged={staged_loss:.8f}"
    )


if __name__ == "__main__":
    main()
