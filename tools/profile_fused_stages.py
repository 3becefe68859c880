"""Stage-differenced timing of the fused head tower (fused_heads_apply)."""

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
from geocalib_tpu.models.modules import resize_bilinear

B = 16
N = 10
DIMS = (64, 128, 320, 512)


def timeit(fn, *args):
    red = jax.jit(lambda *a: sum(jnp.sum(x.astype(jnp.float32)) for x in jax.tree.leaves(fn(*a))))
    np.asarray(red(*args))
    t0 = time.time()
    outs = [red(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def prefix(up_params, lat_params, hl, ll, stages):
    pu, pl_ = up_params["LightHamHead_0"], lat_params["LightHamHead_0"]
    dtype = ll.dtype
    target = hl[0].shape[1:3]
    ups = [resize_bilinear(f, target) for f in hl]
    xcat = jnp.concatenate(ups, axis=-1)
    ku, bu = fh._ck(pu["ConvModule_0"])
    kl, bl = fh._ck(pl_["ConvModule_0"])
    ham_ch = ku.shape[3]
    x = jax.nn.relu(fh._conv(xcat, fh._cat_out(ku, kl), fh._cat_b(bu, bl)))
    if stages == 1:
        return x
    xu, xl = x[..., :ham_ch], x[..., ham_ch:]
    Bb = x.shape[0]
    from geocalib_tpu.models.hamburger import NMF2D
    rank = NMF2D().rank
    bases = jax.random.uniform(jax.random.PRNGKey(0), (Bb, ham_ch, rank), dtype=dtype)
    bases2 = jnp.tile(bases, (2, 1, 1))
    k0u, b0u = fh._ck(pu["Hamburger_0"]["ConvModule_0"])
    k0l, b0l = fh._ck(pl_["Hamburger_0"]["ConvModule_0"])
    hu = jax.nn.relu(fh._conv(xu, k0u, b0u))
    hl2 = jax.nn.relu(fh._conv(xl, k0l, b0l))
    Hh, Wh = hu.shape[1:3]
    stacked = jnp.concatenate([hu, hl2], axis=0).reshape(2 * Bb, Hh * Wh, ham_ch)
    from geocalib_tpu.ops.nmf_kernel import nmf_pallas
    recon = nmf_pallas(stacked, bases2, steps=NMF2D().eval_steps).reshape(2 * Bb, Hh, Wh, ham_ch)
    hu, hl2 = recon[:Bb], recon[Bb:]
    k1u, b1u = fh._ck(pu["Hamburger_0"]["ConvModule_1"])
    k1l, b1l = fh._ck(pl_["Hamburger_0"]["ConvModule_1"])
    xu = jax.nn.relu(xu + jax.nn.relu(fh._conv(hu, k1u, b1u)))
    xl = jax.nn.relu(xl + jax.nn.relu(fh._conv(hl2, k1l, b1l)))
    if stages == 2:
        return xu, xl
    kau, bau = fh._ck(pu["ConvModule_1"])
    kal, bal = fh._ck(pl_["ConvModule_1"])
    feats = jnp.concatenate(
        [jax.nn.relu(fh._conv(xu, kau, bau)), jax.nn.relu(fh._conv(xl, kal, bal))], axis=-1
    )
    if stages == 3:
        return feats
    feats = resize_bilinear(feats, (feats.shape[1] * 2, feats.shape[2] * 2))
    k2u, _ = fh._ck(pu["ConvModule_2"])
    k2l, _ = fh._ck(pl_["ConvModule_2"])
    feats = jax.nn.relu(fh._conv(feats, fh._block_diag(k2u, k2l), pad=1))
    feats = resize_bilinear(feats, (feats.shape[1] * 2, feats.shape[2] * 2))
    if stages == 4:
        return feats
    fu, fl = pu["FeatureFusionBlock_0"], pl_["FeatureFusionBlock_0"]
    r = jax.nn.relu(ll)
    ka, ba = fh._ck(fu["ResidualConvUnit_0"]["Conv2d_0"])
    kb, bb = fh._ck(fl["ResidualConvUnit_0"]["Conv2d_0"])
    h = jax.nn.relu(fh._conv(r, fh._cat_out(ka, kb), fh._cat_b(ba, bb), pad=1))
    ka, ba = fh._ck(fu["ResidualConvUnit_0"]["Conv2d_1"])
    kb, bb = fh._ck(fl["ResidualConvUnit_0"]["Conv2d_1"])
    h = fh._conv(h, fh._block_diag(ka, kb), fh._cat_b(ba, bb), pad=1)
    feats = feats + h + jnp.concatenate([r, r], axis=-1)
    if stages == 5:
        return feats
    r = jax.nn.relu(feats)
    ka, ba = fh._ck(fu["ResidualConvUnit_1"]["Conv2d_0"])
    kb, bb = fh._ck(fl["ResidualConvUnit_1"]["Conv2d_0"])
    h = jax.nn.relu(fh._conv(r, fh._block_diag(ka, kb), fh._cat_b(ba, bb), pad=1))
    ka, ba = fh._ck(fu["ResidualConvUnit_1"]["Conv2d_1"])
    kb, bb = fh._ck(fl["ResidualConvUnit_1"]["Conv2d_1"])
    feats = fh._conv(h, fh._block_diag(ka, kb), fh._cat_b(ba, bb), pad=1) + r
    if stages == 6:
        return feats
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


NAMES = {1: "ups+squeeze", 2: "hamburger(kernel)", 3: "align+concat",
         4: "resize+conv160+resize", 5: "ffb_rcu0", 6: "ffb_rcu1", 7: "unc+proj"}


def main():
    key = jax.random.PRNGKey(0)
    hl = [jax.random.normal(key, (B, 320 // s, 320 // s, d), jnp.bfloat16)
          for s, d in zip((4, 8, 16, 32), DIMS)]
    ll = jax.random.normal(key, (B, 320, 320, 64), jnp.bfloat16)

    net = GeoCalibNet(variant="b")
    pn = jax.jit(net.init)({"params": key}, jnp.zeros((1, 320, 320, 3), jnp.float32))
    p = jax.tree.map(lambda v: v.astype(jnp.bfloat16), pn["params"])
    up_p, lat_p = p["UpDecoder_0"], p["LatitudeDecoder_0"]

    prev = 0.0
    for s in range(1, 8):
        f = jax.jit(lambda u, l, h, ll_, s=s: prefix(u, l, h, ll_, s))
        t = timeit(f, up_p, lat_p, hl, ll)
        print(f"prefix {s} ({NAMES[s]}): {t:.2f} ms  (+{t - prev:.2f})")
        prev = t


if __name__ == "__main__":
    main()
