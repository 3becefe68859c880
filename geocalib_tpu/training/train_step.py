"""SPMD training step: data-parallel over a device mesh.

TPU-native re-design of the reference's DDP loop internals
(/root/reference/siclib/train.py:464-530): one jitted shard_map step owns the
forward (net + differentiable LM), loss, backward, cross-chip gradient
pmean, synced BatchNorm stats, NaN-skip vote, gradient clipping, and the
optimizer update. The reference needs NCCL allreduces, a GradScaler, and a
host-side NaN vote (train.py:482-492, 672-680); here all collectives are
XLA-emitted over the mesh and the NaN guard is one psum inside the step.
"""

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from geocalib_tpu.models import GeoCalibNet
from geocalib_tpu.optim.lm import LMConfig, run_lm
from geocalib_tpu.parallel.mesh import DATA_AXIS
from geocalib_tpu.training.losses import geocalib_losses, geocalib_metrics

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Static training configuration (defaults = reference recipe,
    siclib/configs/train/geocalib.yaml)."""

    lr: float = 1e-4
    weight_decay: float = 1e-2
    clip_grad: float = 1.0
    warmup_steps: int = 4_000
    decay_milestones: Tuple[int, ...] = (80_000, 130_000)
    decay_gamma: float = 0.1
    total_steps: int = 150_000
    camera_model: str = "pinhole"
    lm_steps: int = 10
    # "unroll" = reference training semantics (backprop through all LM
    # iterations, siclib trains this way); "ift" = implicit-function theorem
    # at the fixed point — one adjoint solve instead of 10 unrolled Cholesky
    # backwards. The unrolled backward is numerically fragile in early
    # training (ill-conditioned normal equations produced grad norms up to
    # 1e9 and then permanent NaN on the TPU run this round); ift is the
    # stable default.
    lm_grad_mode: str = "ift"
    variant: str = "b"
    drop_path_rate: float = 0.1
    # Run the two decoder heads as the fused 128-wide block-diagonal tower
    # in the TRAINING forward too (models/fused_heads.fused_forward_train).
    # The block-diagonal form is mathematically identical to the per-head
    # towers (off-blocks are exactly 0), so gradients match; the 64-wide
    # tail convs only reach ~32 GFLOP/ms on the MXU vs ~69 fused
    # (tools/profile_tail_grouped.py). Measured: tools/profile_train_budget.py.
    fused_forward: bool = True
    # mixed precision: CNN forward/backward in this dtype, LM solver, losses,
    # master params and optimizer state in f32 (the TPU equivalent of the
    # reference's AMP autocast, siclib/train.py:360-367 — bf16 needs no
    # GradScaler; flax BatchNorm keeps f32 running stats)
    compute_dtype: str = "bfloat16"

    def lm_config(self) -> LMConfig:
        """Train-time solver preset (siclib lm_optimizer.py:43-47)."""
        return LMConfig(
            camera_model=self.camera_model,
            num_steps=self.lm_steps,
            loss_fn="squared",
            early_stop=False,
            with_uncertainty=False,
            grad_mode=self.lm_grad_mode,
        )


class TrainState(struct.PyTreeNode):
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_schedule(cfg: TrainConfig) -> optax.Schedule:
    """Linear warmup (start factor 1e-3) then step decays ×0.1."""
    warmup = optax.linear_schedule(cfg.lr * 1e-3, cfg.lr, cfg.warmup_steps)
    decays = optax.piecewise_constant_schedule(
        cfg.lr, {m: cfg.decay_gamma for m in cfg.decay_milestones}
    )
    return optax.join_schedules(
        [warmup, lambda ct: decays(ct + cfg.warmup_steps)], [cfg.warmup_steps]
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    # zero_nans BEFORE the global-norm clip: one non-finite leaf otherwise
    # poisons the global norm and with it every parameter's update. The
    # cross-chip NaN-skip vote in train_step remains the backstop for a
    # fully non-finite loss.
    return optax.chain(
        optax.zero_nans(),
        optax.clip_by_global_norm(cfg.clip_grad),
        optax.adamw(make_schedule(cfg), weight_decay=cfg.weight_decay),
    )


def create_train_state(
    rng: Array, cfg: TrainConfig, input_shape=(1, 320, 320, 3)
) -> Tuple[GeoCalibNet, TrainState]:
    """Initialize network + optimizer state (host-side, replicated)."""
    net = GeoCalibNet(
        variant=cfg.variant,
        drop_path_rate=cfg.drop_path_rate,
        bn_axis_name=DATA_AXIS,
    )
    # jit the init: unjitted flax init dispatches each op eagerly, which is
    # minutes of round-trips through the remote-TPU relay
    variables = jax.jit(net.init)(
        {"params": rng}, jnp.zeros(input_shape, jnp.float32)
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = make_optimizer(cfg).init(params)
    return net, TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
    )


def loss_and_updates(
    net: GeoCalibNet, cfg: TrainConfig, params, batch_stats, batch, rng,
    train: bool = True,
):
    """Forward (net + differentiable LM) and training losses.

    train=False evaluates in inference mode (BN running stats, no dropout,
    deterministic NMF — the reference's model.eval() during validation,
    siclib/train.py:568-618) and leaves batch_stats untouched; it is safe
    outside shard_map because no cross-device BN sync is traced.

    batch: image (B,H,W,3), up_field (B,H,W,2), latitude_field (B,H,W,1),
    camera (Camera GT), gravity (Gravity GT). A raw loader batch with only
    (image, gt_params) is accepted too — GT fields are synthesized on
    device (cheap planar math; the reference renders them in host loader
    workers, simple_dataset.py:171-186).
    """
    if "up_field" not in batch:
        from geocalib_tpu.data.dataset import synthesize_gt_fields

        batch = synthesize_gt_fields(batch, cfg.camera_model)
    d_rng, n_rng = jax.random.split(rng)
    dtype = jnp.dtype(cfg.compute_dtype)
    cast = lambda t: jax.tree.map(
        lambda x: x.astype(dtype) if x.dtype == jnp.float32 else x, t
    )
    if train and cfg.fused_forward:
        from geocalib_tpu.models.fused_heads import fused_forward_train

        fields, mutated = fused_forward_train(
            {"params": cast(params), "batch_stats": batch_stats},
            batch["image"].astype(dtype),
            variant=cfg.variant,
            drop_path_rate=cfg.drop_path_rate,
            rngs={"dropout": d_rng, "nmf": n_rng},
            bn_axis_name=net.bn_axis_name,
        )
        new_stats = mutated["batch_stats"]
    elif train:
        fields, mutated = net.apply(
            {"params": cast(params), "batch_stats": batch_stats},
            batch["image"].astype(dtype),
            train=True,
            rngs={"dropout": d_rng, "nmf": n_rng},
            mutable=["batch_stats"],
        )
        new_stats = mutated["batch_stats"]
    else:
        fields = net.apply(
            {"params": cast(params), "batch_stats": batch_stats},
            batch["image"].astype(dtype),
            train=False,
        )
        new_stats = batch_stats
    # solver + losses stay f32 (SURVEY §7: keep solver math in f32)
    fields = {k: v.astype(jnp.float32) for k, v in fields.items()}
    res = run_lm(dict(fields), cfg.lm_config())
    losses = geocalib_losses(
        fields, res.camera, res.gravity, batch, batch["camera"], batch["gravity"]
    )
    metrics = geocalib_metrics(
        fields, res.camera, res.gravity, batch, batch["camera"], batch["gravity"]
    )
    return losses["total"].mean(), (new_stats, losses, metrics)


def train_step(net: GeoCalibNet, cfg: TrainConfig, state: TrainState, batch, rng):
    """One SPMD step; call inside shard_map over the data axis.

    Collectives: gradient pmean, BN-stat pmean (inside flax BN via
    axis_name), NaN-vote pmin — the TPU equivalents of DDP allreduce,
    SyncBN, and the reference's all_reduce NaN skip (train.py:672-680).
    """
    # decorrelate dropout/NMF across chips, keep it deterministic per step
    rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
    grad_fn = jax.value_and_grad(
        lambda p: loss_and_updates(net, cfg, p, state.batch_stats, batch, rng),
        has_aux=True,
    )
    (loss, (new_stats, losses, metrics)), grads = grad_fn(state.params)
    grads = jax.lax.pmean(grads, DATA_AXIS)
    loss = jax.lax.pmean(loss, DATA_AXIS)

    # cross-chip NaN vote on the LOSS: a non-finite loss means corrupted
    # activations/stats, so the whole update is skipped everywhere
    # (reference all_reduce NaN skip, train.py:672-680). Non-finite gradient
    # LEAVES alone do not skip: optax.zero_nans() drops them so the finite
    # leaves keep training (the unrolled-LM backward can spike or NaN on
    # ill-conditioned batches without stalling the run).
    grad_finite = jnp.all(
        jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
    )
    finite = jax.lax.pmin(jnp.isfinite(loss).astype(jnp.float32), DATA_AXIS) > 0.5

    # sanitize ALL non-finite gradient values (optax.zero_nans only zeroes
    # NaN; a ±inf leaf would make clip_by_global_norm's global norm inf and
    # the inf leaf inf/inf = NaN, permanently poisoning Adam moments —
    # r3 advisor finding). zero_nans stays in the chain so the opt_state
    # pytree structure (and with it checkpoint compatibility) is unchanged.
    grads = jax.tree.map(lambda g: jnp.where(jnp.isfinite(g), g, 0.0), grads)

    updates, new_opt = make_optimizer(cfg).update(grads, state.opt_state, state.params)
    new_params = optax.apply_updates(state.params, updates)

    keep = lambda new, old: jax.tree.map(
        lambda n, o: jnp.where(finite, n, o), new, old
    )
    state = TrainState(
        step=state.step + 1,
        params=keep(new_params, state.params),
        opt_state=keep(new_opt, state.opt_state),
        batch_stats=keep(new_stats, state.batch_stats),
    )
    scalars = {f"loss/{k}": jax.lax.pmean(v.mean(), DATA_AXIS) for k, v in losses.items()}
    scalars |= {
        f"metric/{k}": jax.lax.pmean(v.mean(), DATA_AXIS) for k, v in metrics.items()
    }
    scalars["skipped_nonfinite"] = 1.0 - finite.astype(jnp.float32)
    scalars["grad_nonfinite"] = 1.0 - grad_finite.astype(jnp.float32)
    scalars["grad_norm"] = optax.global_norm(grads)  # post-pmean, pre-clip
    return state, scalars


def make_sharded_train_step(
    net: GeoCalibNet, cfg: TrainConfig, mesh: Mesh, augment_on_device: bool = False
):
    """jit(shard_map(train_step)): batch sharded over 'data', state replicated.

    augment_on_device=True applies the photometric augmentation pipeline
    (data/device_augment.py) inside the step — the host loader then only
    decodes JPEGs (hundreds of img/s on one core) instead of running the
    GIL-bound augmentation zoo (8.5 img/s measured r3). This is the
    data.augmentation="device" loader mode.
    """

    def step(state, batch, rng):
        if augment_on_device:
            from geocalib_tpu.data.device_augment import device_augment

            k_aug = jax.random.fold_in(
                jax.random.fold_in(rng, 1), jax.lax.axis_index(DATA_AXIS)
            )
            batch = dict(batch, image=device_augment(batch["image"], k_aug))
        return train_step(net, cfg, state, batch, rng)

    sharded = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))
