"""Fused MSCANBlock Pallas kernel vs the flax modules (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geocalib_tpu.models.modules import MSCANBlock
from geocalib_tpu.models.mscan import MSCAN, MSCAN_VARIANTS
from geocalib_tpu.ops.mscan_block_kernel import (
    fold_block_params,
    mscan_block_pallas,
    mscan_forward_pallas,
)


def _rel_err(a, b):
    a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
    return np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)


@pytest.mark.parametrize(
    "hw,dim,ratio",
    [(16, 64, 8), (8, 128, 8), (8, 320, 4)],
    ids=["s1-like", "s2-like", "s3-like"],
)
def test_block_kernel_matches_flax(hw, dim, ratio):
    block = MSCANBlock(dim=dim, mlp_ratio=ratio)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, hw, hw, dim), jnp.float32)
    variables = block.init(jax.random.PRNGKey(1), x[:1])
    # perturb batch_stats so BN folding is actually exercised
    stats = jax.tree.map(
        lambda a: a + 0.1 * jax.random.normal(jax.random.PRNGKey(2), a.shape),
        variables.get("batch_stats", {}),
    )
    stats = jax.tree.map(lambda a: jnp.abs(a) + 0.05, stats)  # keep var positive
    ref = block.apply(
        {"params": variables["params"], "batch_stats": stats}, x, train=False
    )
    folded = fold_block_params(variables["params"], stats, dtype=jnp.float32)
    out = mscan_block_pallas(x, folded, interpret=True)
    assert out.shape == ref.shape and out.dtype == ref.dtype
    assert _rel_err(out, ref) < 2e-4, _rel_err(out, ref)


def test_block_kernel_bf16_close():
    block = MSCANBlock(dim=64, mlp_ratio=8)
    x32 = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 64), jnp.float32)
    variables = block.init(jax.random.PRNGKey(1), x32[:1])
    ref = block.apply(variables, x32, train=False)
    p16 = jax.tree.map(lambda a: a.astype(jnp.bfloat16), variables)
    folded = fold_block_params(
        p16["params"], p16.get("batch_stats", {}), dtype=jnp.bfloat16
    )
    out = mscan_block_pallas(x32.astype(jnp.bfloat16), folded, interpret=True)
    assert _rel_err(out, ref) < 5e-2, _rel_err(out, ref)


def test_full_backbone_matches_flax():
    dims, ratios, depths = MSCAN_VARIANTS["tiny"]
    net = MSCAN(embed_dims=dims, mlp_ratios=ratios, depths=depths)
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3), jnp.float32)
    variables = net.init(jax.random.PRNGKey(1), img)
    ref = net.apply(variables, img, train=False)
    out = mscan_forward_pallas(
        variables["params"],
        variables.get("batch_stats", {}),
        img,
        MSCAN_VARIANTS["tiny"],
        interpret=True,
    )
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        assert o.shape == r.shape
        assert _rel_err(o, r) < 2e-4, [_rel_err(a, b) for a, b in zip(out, ref)]
