"""Standalone timing of the fused head tail (stages 5-7) fed by literal inputs.

Compares against the in-context prefix differences (profile_fused_stages):
if standalone is much cheaper, the extra in-context cost is XLA scheduling/
layout interaction, not intrinsic op cost.
"""

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

import geocalib_tpu.models.fused_heads as fh
from geocalib_tpu.models.geocalib_net import GeoCalibNet

B = 16
N = 10


def timeit(fn, *args):
    red = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a))))
    np.asarray(red(*args))
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def tail(up_params, lat_params, feats, ll):
    pu, pl_ = up_params["LightHamHead_0"], lat_params["LightHamHead_0"]
    fu, fl = pu["FeatureFusionBlock_0"], pl_["FeatureFusionBlock_0"]
    r = jax.nn.relu(ll)
    ka, ba = fh._ck(fu["ResidualConvUnit_0"]["Conv2d_0"])
    kb, bb = fh._ck(fl["ResidualConvUnit_0"]["Conv2d_0"])
    h = jax.nn.relu(fh._conv(r, fh._cat_out(ka, kb), fh._cat_b(ba, bb), pad=1))
    ka, ba = fh._ck(fu["ResidualConvUnit_0"]["Conv2d_1"])
    kb, bb = fh._ck(fl["ResidualConvUnit_0"]["Conv2d_1"])
    h = fh._conv(h, fh._block_diag(ka, kb), fh._cat_b(ba, bb), pad=1)
    feats = feats + h + jnp.concatenate([r, r], axis=-1)
    r = jax.nn.relu(feats)
    ka, ba = fh._ck(fu["ResidualConvUnit_1"]["Conv2d_0"])
    kb, bb = fh._ck(fl["ResidualConvUnit_1"]["Conv2d_0"])
    h = jax.nn.relu(fh._conv(r, fh._block_diag(ka, kb), fh._cat_b(ba, bb), pad=1))
    ka, ba = fh._ck(fu["ResidualConvUnit_1"]["Conv2d_1"])
    kb, bb = fh._ck(fl["ResidualConvUnit_1"]["Conv2d_1"])
    feats = fh._conv(h, fh._block_diag(ka, kb), fh._cat_b(ba, bb), pad=1) + r
    k3u, _ = fh._ck(pu["ConvModule_3"])
    k3l, _ = fh._ck(pl_["ConvModule_3"])
    unc = jax.nn.relu(fh._conv(feats, fh._block_diag(k3u, k3l), pad=1))
    kcu, bcu = fh._ck(pu["Conv2d_0"])
    kcl, bcl = fh._ck(pl_["Conv2d_0"])
    log_conf = fh._conv(unc, fh._block_diag(kcu, kcl), fh._cat_b(bcu, bcl))
    kpu, bpu = up_params["Conv_0"]["kernel"], up_params["Conv_0"]["bias"]
    kpl, bpl = lat_params["Conv_0"]["kernel"], lat_params["Conv_0"]["bias"]
    proj = fh._conv(feats, fh._block_diag(kpu, kpl), fh._cat_b(bpu, bpl))
    return log_conf, proj


def main():
    key = jax.random.PRNGKey(0)
    net = GeoCalibNet(variant="b")
    pn = jax.jit(net.init)({"params": key}, jnp.zeros((1, 320, 320, 3), jnp.float32))
    p = jax.tree.map(lambda v: v.astype(jnp.bfloat16), pn["params"])
    feats = jax.random.normal(key, (B, 320, 320, 128), jnp.bfloat16)
    ll = jax.random.normal(key, (B, 320, 320, 64), jnp.bfloat16)
    f = jax.jit(lambda u, l, x, y: tail(u, l, x, y))
    print(f"tail standalone (rcu0+rcu1+unc+proj): {timeit(f, p['UpDecoder_0'], p['LatitudeDecoder_0'], feats, ll):.2f} ms")

    from geocalib_tpu.models.modules import MSCANBlock
    for hw, dim, ratio, nblocks in [(80, 64, 8, 3), (40, 128, 8, 3), (20, 320, 4, 12), (10, 512, 4, 3)]:
        block = MSCANBlock(dim=dim, mlp_ratio=ratio)
        x = jax.random.normal(key, (B, hw, hw, dim), jnp.bfloat16)
        pb = jax.jit(block.init)(jax.random.PRNGKey(1), x[:1])
        pb = jax.tree.map(lambda v: v.astype(jnp.bfloat16) if v.dtype == jnp.float32 else v, pb)

        def chain(reps):
            @jax.jit
            def fn(pb, x):
                def body(c, _):
                    return block.apply(pb, c), None
                out, _ = jax.lax.scan(body, x, None, length=reps)
                return out
            return fn

        t1 = timeit(chain(1), pb, x)
        t11 = timeit(chain(11), pb, x)
        dt = (t11 - t1) / 10
        print(f"mscan block @({hw},{hw},{dim}) r{ratio}: {dt:.3f} ms x{nblocks} = {dt*nblocks:.2f} ms")


if __name__ == "__main__":
    main()
