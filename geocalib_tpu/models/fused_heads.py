"""Fused dual-head forward: both perspective heads in one 128-channel pass.

TPU performance redesign of the inference path through the two
LightHamHead decoders (reference /root/reference/geocalib/modules.py:227-288
runs them as two independent 64-channel towers; geocalib/geocalib.py:87-89).
Measured on v5e, a 3x3 conv at 64 channels reaches ~42 GFLOP/ms while the
same conv at 128 channels reaches ~123 GFLOP/ms — the MXU wants 128-wide
channel tiles. Since the up and latitude heads are architecturally
identical, run on the same inputs, and differ only in weights, this module
executes them as ONE tower:

- scale-aggregation resizes: computed once (shared inputs, no weights);
- squeeze 1x1: one conv with the two heads' kernels concatenated along the
  output axis (shared input ⇒ no extra FLOPs);
- Hamburger 1x1s: per-head at 512 channels (already MXU-efficient);
- NMF: the two heads' token matrices batch-stacked into a single
  factorization (weightless, per-sample independent; bases tiled from the
  same deterministic draw the unfused eval path uses);
- the full-resolution 64-channel tail (align→resize→conv→resize→
  FeatureFusionBlock→uncertainty convs): block-diagonal 128-channel kernels.
  The off-diagonal zero blocks contribute exactly 0 in bf16/f32, so the
  math is bit-comparable to running the heads separately.

Numerics are exact up to float re-association inside the wider convs; a
parity test pins fused vs unfused outputs.

Only the eval/inference path uses this (extractor, bench, eval pipeline);
training differentiates through the plain per-head modules.
"""

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from geocalib_tpu.models.hamburger import NMF2D
from geocalib_tpu.models.modules import resize_bilinear
from geocalib_tpu.models.mscan import MSCAN, MSCAN_VARIANTS

Array = jnp.ndarray
Params = Dict[str, Any]


def _ck(p: Params) -> Tuple[Array, Optional[Array]]:
    """kernel, bias of a ConvModule/Conv2d param subtree."""
    if "Conv2d_0" in p:
        p = p["Conv2d_0"]
    q = p["Conv_0"]
    return q["kernel"], q.get("bias")


# 3x3 conv lowering inside the serving tail: "direct" = dense XLA conv
# (the measured r4 default); "winograd" = F(2x2,3x3) via ops/winograd.py —
# 2.25x fewer multiplies per output tile. Flip only on a measured win
# (tools/profile_tail_winograd.py); differentiable either way.
_CONV3_MODE = "direct"


def _conv(x: Array, k: Array, b: Optional[Array] = None, pad: int = 0) -> Array:
    if (
        _CONV3_MODE == "winograd"
        and k.shape[0] == 3
        and k.shape[1] == 3
        and pad == 1
        and x.shape[1] % 2 == 0
        and x.shape[2] % 2 == 0
    ):
        from geocalib_tpu.ops.winograd import winograd_conv3x3

        return winograd_conv3x3(x, k, b)
    out = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    if b is not None:
        out = out + b.astype(x.dtype)
    return out


def _cat_out(ka: Array, kb: Array) -> Array:
    """Shared-input fusion: concatenate kernels along the output axis."""
    return jnp.concatenate([ka, kb], axis=3)


def _block_diag(ka: Array, kb: Array) -> Array:
    """Distinct-input fusion: block-diagonal kernel (off-blocks exactly 0)."""
    kh, kw, ci_a, co_a = ka.shape
    _, _, ci_b, co_b = kb.shape
    top = jnp.concatenate([ka, jnp.zeros((kh, kw, ci_a, co_b), ka.dtype)], axis=3)
    bot = jnp.concatenate([jnp.zeros((kh, kw, ci_b, co_a), kb.dtype), kb], axis=3)
    return jnp.concatenate([top, bot], axis=2)


def _cat_b(ba: Optional[Array], bb: Optional[Array]) -> Optional[Array]:
    if ba is None and bb is None:
        return None
    return jnp.concatenate([ba, bb])


# Per-head convs on the two halves of the fused 128-wide tensor: grouped
# (feature_group_count=2) does exactly the two 64→64 convs' FLOPs, while the
# dense block-diagonal form does 2× the useful FLOPs but runs at the MXU's
# 128-wide sweet spot. Measured on v5e (tools/profile_tail_grouped.py,
# serving tail at batch 16 @ 320²): block-diag 32.2 ms @ 67.4 GFLOP/ms vs
# grouped 60.7 ms @ 19.9 GFLOP/ms — XLA's TPU lowering of grouped convs is
# 3.4× worse per useful FLOP than eating the zero blocks, so block-diag
# stays the default. (The tail is compute-bound at ~34 useful GFLOP/ms;
# halving its cost further would need a Winograd Pallas kernel.)
_GROUPED = False


def _conv2(x: Array, ka: Array, kb: Array, ba=None, bb=None, pad: int = 0) -> Array:
    """Apply head-a's conv to channels [:C] and head-b's to [C:] of x."""
    if _GROUPED:
        k = jnp.concatenate([ka, kb], axis=3)  # (kh, kw, ci_per_group, 2*co)
        out = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), ((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=2,
        )
    else:
        out = _conv(x, _block_diag(ka, kb), pad=pad)
    b = _cat_b(ba, bb)
    return out if b is None else out + b.astype(x.dtype)


def fused_heads_apply(up_params: Params, lat_params: Params, hl: Sequence[Array],
                      ll: Array, nmf_kernel: Optional[bool] = None) -> Dict[str, Array]:
    """Run UpDecoder + LatitudeDecoder as one fused tower (single graph).

    up_params / lat_params: the ``UpDecoder_0`` / ``LatitudeDecoder_0``
    subtrees of the net's params. hl: 4 backbone scales; ll: full-res
    low-level features. nmf_kernel: run the NMF with the Pallas
    VMEM-resident kernel (ops/nmf_kernel.py); default: on TPU backends when
    the token shapes tile. Returns the same dict GeoCalibNet produces.

    For serving, prefer the two-executable split (`fused_front` +
    `fused_tail` jitted separately): XLA schedules the full-resolution tail
    ~2x faster as its own program (measured 41 ms in-graph vs 17.5 ms
    standalone at batch 16; the split nets 72.5 -> 52 ms end-to-end).
    """
    feats = _head_front(up_params, lat_params, hl, nmf_kernel)
    return fused_tail(up_params, lat_params, feats, ll)


def _head_front(up_params: Params, lat_params: Params, hl: Sequence[Array],
                nmf_kernel: Optional[bool] = None,
                nmf_rng: Optional[Array] = None,
                nmf_train: bool = False) -> Array:
    """Head stages through the second upsample: returns fused feats
    (B, H, W, 2*out_ch) at full resolution.

    nmf_rng/nmf_train: training mode — draw independent NMF bases per
    stacked half from nmf_rng (mirroring the per-head module path, where
    each head's NMF2D folds its own "nmf" stream) and run the train-step
    count; forces the differentiable XLA NMF (the Pallas kernel has no VJP).
    """
    pu, pl = up_params["LightHamHead_0"], lat_params["LightHamHead_0"]
    dtype = hl[0].dtype

    # --- stride-4 aggregation (shared; computed once for both heads)
    target = hl[0].shape[1:3]
    ups = [resize_bilinear(f, target) for f in hl]
    xcat = jnp.concatenate(ups, axis=-1)

    # --- squeeze: shared input → output-concat fusion (no extra FLOPs)
    ku, bu = _ck(pu["ConvModule_0"])
    kl, bl = _ck(pl["ConvModule_0"])
    ham_ch = ku.shape[3]
    x = jax.nn.relu(_conv(xcat, _cat_out(ku, kl), _cat_b(bu, bl)))
    xu, xl = x[..., :ham_ch], x[..., ham_ch:]

    # --- Hamburger per head, NMF batch-stacked across heads
    B = x.shape[0]
    rank = NMF2D().rank
    if nmf_rng is not None:
        # independent draw per stacked half (per-head training semantics)
        bases2 = jax.random.uniform(nmf_rng, (2 * B, ham_ch, rank), dtype=dtype)
    else:
        # identical draw to the unfused eval path (hamburger.py: PRNGKey(0),
        # (B, D, R)); tiled so each stacked half sees the same bases
        bases = jax.random.uniform(jax.random.PRNGKey(0), (B, ham_ch, rank), dtype=dtype)
        bases2 = jnp.tile(bases, (2, 1, 1))

    # run the two halves' first 1x1s, stack for one NMF, then unstack
    k0u, b0u = _ck(pu["Hamburger_0"]["ConvModule_0"])
    k0l, b0l = _ck(pl["Hamburger_0"]["ConvModule_0"])
    hu = jax.nn.relu(_conv(xu, k0u, b0u))
    hl_ = jax.nn.relu(_conv(xl, k0l, b0l))
    Hh, Wh = hu.shape[1:3]
    stacked = jnp.concatenate([hu, hl_], axis=0).reshape(2 * B, Hh * Wh, ham_ch)
    if nmf_train:
        nmf_kernel = False
    if nmf_kernel is None:
        # the Pallas NMF kernel uses TPU-only pltpu primitives (CompilerParams,
        # VMEM scoping) — never auto-enable on GPU/METAL backends
        nmf_kernel = (
            jax.default_backend() == "tpu"
            and Hh * Wh % 8 == 0
            and ham_ch % 128 == 0
            # an f32 token block would double the kernel's VMEM residency
            # past the scoped budget; the kernel targets the bf16 fast path
            and stacked.dtype == jnp.bfloat16
        )
        if jax.default_backend() == "tpu" and not nmf_kernel:
            import logging

            logging.getLogger(__name__).info(
                "NMF Pallas kernel auto-disabled (tokens %dx%d ch %d dtype %s "
                "outside the bf16/128-multiple fast path); using XLA NMF2D",
                Hh, Wh, ham_ch, stacked.dtype,
            )
    if nmf_kernel:
        from geocalib_tpu.ops.nmf_kernel import nmf_pallas

        recon = nmf_pallas(stacked, bases2, steps=NMF2D().eval_steps)
    else:
        recon = NMF2D().apply({}, stacked, train=nmf_train, bases=bases2)
    recon = recon.reshape(2 * B, Hh, Wh, ham_ch)
    hu, hl_ = recon[:B], recon[B:]

    k1u, b1u = _ck(pu["Hamburger_0"]["ConvModule_1"])
    k1l, b1l = _ck(pl["Hamburger_0"]["ConvModule_1"])
    xu = jax.nn.relu(xu + jax.nn.relu(_conv(hu, k1u, b1u)))
    xl = jax.nn.relu(xl + jax.nn.relu(_conv(hl_, k1l, b1l)))

    # --- align to out_channels per head, then fuse into one 2x-wide tensor
    kau, bau = _ck(pu["ConvModule_1"])
    kal, bal = _ck(pl["ConvModule_1"])
    feats = jnp.concatenate(
        [jax.nn.relu(_conv(xu, kau, bau)), jax.nn.relu(_conv(xl, kal, bal))], axis=-1
    )

    # --- full-resolution tail: block-diagonal 2x-wide convs
    feats = resize_bilinear(feats, (feats.shape[1] * 2, feats.shape[2] * 2))
    k2u, _ = _ck(pu["ConvModule_2"])
    k2l, _ = _ck(pl["ConvModule_2"])
    feats = jax.nn.relu(_conv2(feats, k2u, k2l, pad=1))
    return resize_bilinear(feats, (feats.shape[1] * 2, feats.shape[2] * 2))


def _tail_one_head(p: Params, feats_h: Array, r: Array) -> Tuple[Array, Array]:
    """One head's full-resolution tail at its native 64-channel width:
    FeatureFusionBlock RCUs + uncertainty branch. Returns (feats, log_conf)."""
    f = p["FeatureFusionBlock_0"]
    ka, ba = _ck(f["ResidualConvUnit_0"]["Conv2d_0"])
    h = jax.nn.relu(_conv(r, ka, ba, pad=1))
    ka, ba = _ck(f["ResidualConvUnit_0"]["Conv2d_1"])
    h = _conv(h, ka, ba, pad=1)
    x = feats_h + h + r

    r1 = jax.nn.relu(x)
    ka, ba = _ck(f["ResidualConvUnit_1"]["Conv2d_0"])
    h = jax.nn.relu(_conv(r1, ka, ba, pad=1))
    ka, ba = _ck(f["ResidualConvUnit_1"]["Conv2d_1"])
    x = _conv(h, ka, ba, pad=1) + r1

    k3, _ = _ck(p["ConvModule_3"])
    unc = jax.nn.relu(_conv(x, k3, pad=1))
    kc, bc = _ck(p["Conv2d_0"])
    return x, _conv(unc, kc, bc)


# Tail execution strategy, measured on v5e at batch 16 @ 320² as standalone
# jitted executables (tools/profile_tail_grouped.py, r4):
#   blockdiag 31.3 ms @ 69.4 GFLOP/ms executed (34.7 useful)
#   perhead   37.7 ms @ 32.0 GFLOP/ms (exact useful FLOPs, 64-wide convs)
#   grouped   57.2 ms @ 21.1 GFLOP/ms (feature_group_count=2 lowering)
# The fused 128-wide block-diagonal form wins despite doing 2× the useful
# FLOPs: in situ the 64-wide towers only reach 32 GFLOP/ms (below even
# their 42 GFLOP/ms isolated number), so eating the zero blocks at the
# MXU's 128-lane width is the practical roofline for this tail. Kept as a
# measured three-way decision; "perhead" remains for exact-parity checks.
_TAIL_MODE = "blockdiag"  # "perhead" | "blockdiag"


def fused_tail(up_params: Params, lat_params: Params, feats: Array,
               ll: Array) -> Dict[str, Array]:
    """Full-resolution tail: FeatureFusionBlock, uncertainty branch, and the
    per-head projections, on the fused 2x-wide tensor. Jit this separately
    from `fused_front` for serving (see fused_heads_apply docstring)."""
    pu, pl = up_params["LightHamHead_0"], lat_params["LightHamHead_0"]
    r = jax.nn.relu(ll)

    if _TAIL_MODE == "perhead":
        C = feats.shape[-1] // 2
        xu, lcu = _tail_one_head(pu, feats[..., :C], r)
        xl, lcl = _tail_one_head(pl, feats[..., C:], r)
        log_conf = jnp.concatenate([lcu, lcl], axis=-1)
        proj = jnp.concatenate(
            [
                _conv(xu, up_params["Conv_0"]["kernel"], up_params["Conv_0"]["bias"]),
                _conv(xl, lat_params["Conv_0"]["kernel"], lat_params["Conv_0"]["bias"]),
            ],
            axis=-1,
        )
        return _tail_activations(proj, log_conf)

    # FeatureFusionBlock(x=feats, skip=ll), upsample=False (modules.py:122-135)
    # RCU0 on the shared skip: first conv fuses by output-concat
    fu, fl = pu["FeatureFusionBlock_0"], pl["FeatureFusionBlock_0"]
    ka, ba = _ck(fu["ResidualConvUnit_0"]["Conv2d_0"])
    kb, bb = _ck(fl["ResidualConvUnit_0"]["Conv2d_0"])
    h = jax.nn.relu(_conv(r, _cat_out(ka, kb), _cat_b(ba, bb), pad=1))
    ka, ba = _ck(fu["ResidualConvUnit_0"]["Conv2d_1"])
    kb, bb = _ck(fl["ResidualConvUnit_0"]["Conv2d_1"])
    h = _conv2(h, ka, kb, ba, bb, pad=1)
    feats = feats + h + jnp.concatenate([r, r], axis=-1)

    # RCU1 on the fused tensor: per-head convs on the two halves
    r = jax.nn.relu(feats)
    ka, ba = _ck(fu["ResidualConvUnit_1"]["Conv2d_0"])
    kb, bb = _ck(fl["ResidualConvUnit_1"]["Conv2d_0"])
    h = jax.nn.relu(_conv2(r, ka, kb, ba, bb, pad=1))
    ka, ba = _ck(fu["ResidualConvUnit_1"]["Conv2d_1"])
    kb, bb = _ck(fl["ResidualConvUnit_1"]["Conv2d_1"])
    feats = _conv2(h, ka, kb, ba, bb, pad=1) + r

    # --- uncertainty branch (per-head 3x3, then both 1x1s in one conv)
    k3u, _ = _ck(pu["ConvModule_3"])
    k3l, _ = _ck(pl["ConvModule_3"])
    unc = jax.nn.relu(_conv2(feats, k3u, k3l, pad=1))
    kcu, bcu = _ck(pu["Conv2d_0"])
    kcl, bcl = _ck(pl["Conv2d_0"])
    log_conf = _conv2(unc, kcu, kcl, bcu, bcl)

    # --- final per-head 1x1 projections as one block conv (128 -> 2+1)
    kpu, bpu = up_params["Conv_0"]["kernel"], up_params["Conv_0"]["bias"]
    kpl, bpl = lat_params["Conv_0"]["kernel"], lat_params["Conv_0"]["bias"]
    proj = _conv(feats, _block_diag(kpu, kpl), _cat_b(bpu, bpl))
    return _tail_activations(proj, log_conf)


def _tail_activations(proj: Array, log_conf: Array) -> Dict[str, Array]:
    up = proj[..., :2]
    # safe normalize (matches geocalib_net.UpDecoder): clamp inside the sqrt
    up = up / jnp.sqrt(jnp.maximum(jnp.sum(up * up, axis=-1, keepdims=True), 1e-24))
    eps = 1e-5  # matches geocalib_net.LatitudeDecoder (f32: bf16 rounds
    # 1 - 1e-5 to 1.0, making the clip a no-op)
    lat32 = jnp.tanh(proj[..., 2:3].astype(jnp.float32))
    lat = jnp.arcsin(jnp.clip(lat32, -1 + eps, 1 - eps)).astype(proj.dtype)
    return {
        "up_field": up,
        "up_confidence": jax.nn.sigmoid(log_conf[..., 0]),
        "latitude_field": lat,
        "latitude_confidence": jax.nn.sigmoid(log_conf[..., 1]),
    }


def fused_front(
    variables: Dict[str, Any],
    image: Array,
    variant: str = "b",
) -> Tuple[Array, Array]:
    """Backbone + low-level encoder + head stages through the second
    upsample. Returns (feats, ll) for `fused_tail`.

    Jit `fused_front` and `fused_tail` as SEPARATE executables for serving:
    compiled monolithically, XLA's schedule for the full-resolution tail is
    ~2x slower than when the tail is its own program (measured at batch
    16 @ 320x320: 72.5 ms one-jit vs 52 ms split; the intermediate
    (feats, ll) stays on device, and pipelined dispatch hides the extra
    call). The driver/dryrun and CPU paths can keep the one-jit
    `fused_forward` below.
    """
    dims, ratios, depths = MSCAN_VARIANTS[variant]
    p = variables["params"]
    bs = variables.get("batch_stats", {})

    # The backbone stays on XLA deliberately. A 345-line fused-MSCANBlock
    # Pallas kernel was built and measured in earlier rounds: it never beat
    # the XLA backbone (the MSCAN stages are depthwise-conv/VPU-bound —
    # 17.3 ms of the 56 ms batch at ~42 GFLOP/ms, far from the 123 GFLOP/ms
    # the MXU reaches on 128-wide dense convs, and XLA already fuses the
    # BN/GELU/attention elementwise chains), and current Mosaic rejects its
    # (1,80,80,64)→(80,5120) reshape ("infer-vector-layout: unsupported
    # shape cast"). Removed in round 4 rather than shipped as a parked flag.
    mscan = MSCAN(embed_dims=dims, mlp_ratios=ratios, depths=depths)
    hl = mscan.apply(
        {"params": p["MSCAN_0"], "batch_stats": bs["MSCAN_0"]}, image
    )

    # LowLevelEncoder = two ConvModules at full res (geocalib_net.py:22-33)
    pll = p["LowLevelEncoder_0"]
    k0, b0 = _ck(pll["ConvModule_0"])
    k1, b1 = _ck(pll["ConvModule_1"])
    ll = jax.nn.relu(_conv(image, k0, b0, pad=1))
    ll = jax.nn.relu(_conv(ll, k1, b1, pad=1))

    feats = _head_front(p["UpDecoder_0"], p["LatitudeDecoder_0"], hl)
    return feats, ll


def fused_tail_from_variables(variables: Dict[str, Any], feats: Array, ll: Array) -> Dict[str, Array]:
    """`fused_tail` addressed by the full variables dict (serving helper)."""
    p = variables["params"]
    return fused_tail(p["UpDecoder_0"], p["LatitudeDecoder_0"], feats, ll)


def fused_forward_train(
    variables: Dict[str, Any],
    image: Array,
    variant: str = "b",
    drop_path_rate: float = 0.0,
    rngs: Optional[Dict[str, Array]] = None,
    bn_axis_name: Optional[str] = None,
) -> Tuple[Dict[str, Array], Dict[str, Any]]:
    """TRAINING forward with the decoder heads fused into one 128-wide tower.

    The backbone runs as the regular Flax MSCAN (train mode: BN batch stats
    mutation + optional cross-chip sync, drop-path rng); the decoder heads
    run as the fused block-diagonal tower — the exact same math as the
    per-head modules (off-diagonal blocks are exactly 0) at the MXU's
    128-lane width, so gradients match the per-head path bit-for-float-
    reassociation. Train-mode NMF: 6 multiplicative updates, independent
    bases per head drawn from rngs["nmf"].

    Returns (fields, new_batch_stats) — a drop-in for
    GeoCalibNet.apply(..., train=True, mutable=["batch_stats"]).
    """
    rngs = rngs or {}
    dims, ratios, depths = MSCAN_VARIANTS[variant]
    p = variables["params"]
    bs = variables.get("batch_stats", {})

    mscan = MSCAN(
        embed_dims=dims,
        mlp_ratios=ratios,
        depths=depths,
        drop_path_rate=drop_path_rate,
        bn_axis_name=bn_axis_name,
    )
    hl, mut = mscan.apply(
        {"params": p["MSCAN_0"], "batch_stats": bs.get("MSCAN_0", {})},
        image,
        train=True,
        rngs={k: v for k, v in rngs.items() if k == "dropout"},
        mutable=["batch_stats"],
    )

    # LowLevelEncoder: two norm-free ConvModules (no BN/rng to thread)
    pll = p["LowLevelEncoder_0"]
    k0, b0 = _ck(pll["ConvModule_0"])
    k1, b1 = _ck(pll["ConvModule_1"])
    ll = jax.nn.relu(_conv(image, k0, b0, pad=1))
    ll = jax.nn.relu(_conv(ll, k1, b1, pad=1))

    feats = _head_front(
        p["UpDecoder_0"], p["LatitudeDecoder_0"], hl,
        nmf_rng=rngs.get("nmf"), nmf_train=True,
    )
    fields = fused_tail(p["UpDecoder_0"], p["LatitudeDecoder_0"], feats, ll)
    return fields, {"batch_stats": {"MSCAN_0": mut["batch_stats"]}}


def fused_forward(variables: Dict[str, Any], image: Array, variant: str = "b") -> Dict[str, Array]:
    """Full GeoCalibNet eval forward with the heads fused, as ONE graph.

    Matches GeoCalibNet(variant).apply(variables, image) (eval mode) while
    running both decoder heads as one 128-channel tower. For peak serving
    throughput jit `fused_front` / `fused_tail_from_variables` separately
    instead (see fused_front).
    """
    feats, ll = fused_front(variables, image, variant)
    return fused_tail_from_variables(variables, feats, ll)
