"""Multi-process execution: 2 real processes x 4 virtual devices each.

VERDICT r2 item 5: the jax.distributed wiring existed but had never been
executed with >1 process. This launches two actual worker processes with a
localhost coordinator (tests/_mp_worker.py), runs one sharded train step
and one shared-intrinsics LM on the same deterministic global batch, and
asserts both processes agree with each other AND with the single-process
8-device result computed in this test process. Reference analog: a real
2-rank DDP launch (siclib/train.py:275-280, torch.multiprocessing.spawn).
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same computation as the workers, on this process's 8 devices."""
    import __graft_entry__ as ge
    from geocalib_tpu.optim.lm import LMConfig, run_lm
    from geocalib_tpu.parallel.mesh import make_mesh, shard_batch
    from geocalib_tpu.training.train_step import (
        TrainConfig,
        create_train_state,
        make_sharded_train_step,
    )

    mesh = make_mesh(jax.devices()[:8])
    B, H, W = 16, 64, 64
    batch = ge._synthetic_batch(B, H, W)
    gbatch = shard_batch(batch, mesh)

    cfg = TrainConfig(variant="tiny", lm_steps=3, drop_path_rate=0.1)
    net, state = create_train_state(jax.random.PRNGKey(0), cfg, (1, H, W, 3))
    step_fn = make_sharded_train_step(net, cfg, mesh)
    state, scalars = step_fn(state, gbatch, jax.random.PRNGKey(1))
    loss = float(scalars["loss/total"])

    # staged-store step on the same 8-device mesh (single-process layout)
    from geocalib_tpu.data.dataset import DatasetConf, SimpleDataset
    from geocalib_tpu.training.device_store import (
        DeviceStore,
        make_staged_train_step,
    )

    ds = SimpleDataset(
        DatasetConf(dataset_dir=_single_process_reference.ds_dir,
                    csv_name="train.csv", batch_size=8, augmentation="identity")
    )
    store = DeviceStore.stage_sharded(ds, mesh, progress=None)
    net2, state2 = create_train_state(jax.random.PRNGKey(0), cfg, (1, 64, 64, 3))
    staged_fn = make_staged_train_step(net2, cfg, mesh, 8, augment=True)
    _, sc = staged_fn(state2, store.images, store.gt_params, jax.random.PRNGKey(5))
    staged_loss = float(sc["loss/total"])
    checksum = float(
        sum(
            jnp.sum(jnp.abs(x.astype(jnp.float32)))
            for x in jax.tree.leaves(state.params)
        )
    )

    ref_cfg = LMConfig(shared_intrinsics=True, num_steps=5)
    data = {
        "up_field": batch["up_field"],
        "latitude_field": batch["latitude_field"],
    }
    res = jax.jit(lambda d: run_lm(d, ref_cfg))(data)
    vfov = float(np.asarray(res.camera.vfov)[0])
    return loss, checksum, vfov, staged_loss


@pytest.mark.slow
def test_two_process_training_matches_single_process(tmp_path):
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh (see conftest)")

    # shared tiny dataset for the staged-store comparison (workers stage
    # only their own devices' rows of the SAME global row order)
    from geocalib_tpu.data import generate_dataset

    ds_dir = str(tmp_path / "ds")
    generate_dataset(ds_dir, n_panos=4, height=64, width=64, crops_per_pano=4)
    _single_process_reference.ds_dir = ds_dir

    port = _free_port()
    env = dict(os.environ)
    env.update(
        {
            # force LOCAL cpu backend in the workers even under the axon
            # sandbox (sitecustomize triggers on PALLAS_AXON_POOL_IPS)
            "PALLAS_AXON_POOL_IPS": "",
            "JAX_PLATFORMS": "cpu",
            "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
            "PYTHONPATH": str(REPO),
        }
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(REPO / "tests" / "_mp_worker.py"),
             f"localhost:{port}", str(pid), "2", ds_dir],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        m = re.search(
            r"MP_RESULT pid=(\d+) loss=([\d.eE+-]+) checksum=([\d.eE+-]+) "
            r"vfov=([\d.eE+-]+) staged=([\d.eE+-]+)",
            out,
        )
        assert m, f"no MP_RESULT in worker output:\n{out[-4000:]}"
        results[int(m.group(1))] = tuple(float(m.group(i)) for i in (2, 3, 4, 5))

    assert set(results) == {0, 1}
    # both processes see identical replicated state and pmean'd loss
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)

    loss_ref, checksum_ref, vfov_ref, staged_ref = _single_process_reference()
    loss_mp, checksum_mp, vfov_mp, staged_mp = results[0]
    # bf16 conv results on CPU vary with the process/thread layout (oneDNN
    # splits reductions by thread count — observed 2.4e-4 relative on the
    # fused forward's loss), so the loss comparisons are bf16-reassociation
    # level; the f32 LM solve stays at 1e-5.
    assert abs(loss_mp - loss_ref) / max(abs(loss_ref), 1.0) < 1e-3, (loss_mp, loss_ref)
    assert abs(checksum_mp - checksum_ref) / max(checksum_ref, 1.0) < 1e-6
    assert abs(vfov_mp - vfov_ref) < 1e-5, (vfov_mp, vfov_ref)
    # staged store: 2-process sharded staging + per-device sampling must
    # reproduce the single-process result on the same mesh shape (r4 #6)
    assert np.isfinite(staged_mp) and np.isfinite(staged_ref)
    assert abs(staged_mp - staged_ref) / max(abs(staged_ref), 1.0) < 1e-3, (
        staged_mp, staged_ref,
    )
