"""Fused MSCANBlock Pallas kernel: one HBM round-trip per backbone block.

The XLA path executes each MSCANBlock (models/modules.py:223-245, re-design
of the reference SegNeXt block /root/reference/geocalib/modules.py:440-478)
as ~25 separate ops — BN, two 1x1 projections, seven depthwise stencils,
GELUs, layer-scale residuals, and an MLP whose ratio-8 hidden tensor makes
stage 1 HBM-bound: measured 1.92 ms/block at (16,80,80,64) where the MXU
work alone is ~0.13 ms.

This kernel runs the WHOLE block per batch element out of VMEM:

- eval-mode BatchNorm is folded into the adjacent 1x1 weights (exact);
- all depthwise stencils (5x5 and the 1x7/7x1, 1x11/11x1, 1x21/21x1
  strips) run on activations flattened to (H, W*C): the channel axis alone
  (64 in stage 1) fills only half the VPU's 128 lanes, while W*C rows use
  every lane; a horizontal tap becomes a static C*dj lane shift of a
  single zero-padded copy, and tap weights are pre-tiled to (W*C,);
- 1x1 convs are MXU matmuls with f32 accumulation;
- the ratio-R MLP hidden tensor never touches HBM: it is computed in row
  chunks (chunk + 1-row halo for its 3x3 depthwise) and immediately
  contracted back to C channels.

Inference-path only (extractor / bench / eval); training keeps the flax
modules and their autodiff. Parity is pinned by tests/test_mscan_kernel.py
against MSCANBlock.apply / MSCAN.apply in eval mode.
"""

import functools
from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jnp.ndarray

_STRIPS = (7, 11, 21)


# --------------------------------------------------------------------------- #
# parameter folding (traced once per jit; exact eval-mode BN algebra)
# --------------------------------------------------------------------------- #


def _bn_fold(bp: Dict, bs: Dict, eps: float = 1e-5) -> Tuple[Array, Array]:
    scale = bp["scale"] / jnp.sqrt(bs["var"] + eps)
    shift = bp["bias"] - bs["mean"] * scale
    return scale, shift


def _conv_wb(p: Dict) -> Tuple[Array, Array]:
    q = p["Conv_0"]
    return q["kernel"], q["bias"]


def fold_block_params(p: Dict, s: Dict, dtype=jnp.bfloat16) -> Tuple[Array, ...]:
    """MSCANBlock params+batch_stats -> flat weight tuple with BN folded.

    Folding: BN_eval(x) = x*sc + sh, so BN followed by a 1x1 conv W,b is
    the 1x1 conv (sc[:,None]*W, b + sh@W). sc1/sh1 also travel unfolded:
    SpatialAttention adds its BN'd input as a shortcut (modules.py:210-219),
    so the kernel needs BN1(x) itself.
    """
    sc1, sh1 = _bn_fold(p["BatchNorm_0"]["BatchNorm_0"], s["BatchNorm_0"]["BatchNorm_0"])
    sc2, sh2 = _bn_fold(p["BatchNorm_1"]["BatchNorm_0"], s["BatchNorm_1"]["BatchNorm_0"])

    sa = p["SpatialAttention_0"]
    W1, b1 = _conv_wb(sa["Conv2d_0"])  # (1,1,C,C)
    W1, b1 = W1[0, 0], b1
    W1f = sc1[:, None] * W1
    b1f = b1 + sh1 @ W1

    am = sa["AttentionModule_0"]
    dw5, dw5b = _conv_wb(am["Conv2d_0"])  # (5,5,1,C)
    dw5 = dw5[:, :, 0, :]

    strips = []
    for i in range(3):
        rw, rb = _conv_wb(am[f"Conv2d_{2 * i + 1}"])  # (1,k,1,C)
        cw, cb = _conv_wb(am[f"Conv2d_{2 * i + 2}"])  # (k,1,1,C)
        strips += [rw[0, :, 0, :], rb, cw[:, 0, 0, :], cb]

    Wmix, bmix = _conv_wb(am["Conv2d_7"])
    Wmix = Wmix[0, 0]
    W2, b2 = _conv_wb(sa["Conv2d_1"])
    W2 = W2[0, 0]

    mlp = p["Mlp_0"]
    W3, b3 = _conv_wb(mlp["Conv2d_0"])  # (1,1,C,R)
    W3, b3 = W3[0, 0], b3
    W3f = sc2[:, None] * W3
    b3f = b3 + sh2 @ W3
    dw3, dw3b = _conv_wb(mlp["DWConv_0"]["Conv2d_0"])  # (3,3,1,R)
    dw3 = dw3[:, :, 0, :]
    W4, b4 = _conv_wb(mlp["Conv2d_1"])
    W4 = W4[0, 0]

    ws = (
        sc1, sh1, W1f, b1f, dw5, dw5b, *strips, Wmix, bmix, W2, b2,
        p["layer_scale_1"], W3f, b3f, dw3, dw3b, W4, b4, p["layer_scale_2"],
    )
    return tuple(w.astype(dtype) for w in ws)


def _tile_w(v: Array, w: int) -> Array:
    """(C,) per-channel vector -> (w*C,) lane-tiled vector."""
    return jnp.broadcast_to(v[None, :], (w, v.shape[0])).reshape(-1)


def _flat_pack(folded: Sequence[Array], width: int) -> Tuple[Array, ...]:
    """Pre-tile stencil taps / per-channel vectors for the (H, W*C) layout."""
    (sc1, sh1, W1f, b1f, dw5, dw5b,
     r7w, r7b, c7w, c7b, r11w, r11b, c11w, c11b, r21w, r21b, c21w, c21b,
     Wmix, bmix, W2, b2, ls1, W3f, b3f, dw3, dw3b, W4, b4, ls2) = folded

    t = lambda v: _tile_w(v, width)
    dw5t = jnp.stack([t(dw5[i, j]) for i in range(5) for j in range(5)])
    strip_flat = []
    for rw, rb, cw, cb in ((r7w, r7b, c7w, c7b), (r11w, r11b, c11w, c11b),
                           (r21w, r21b, c21w, c21b)):
        k = rw.shape[0]
        strip_flat += [
            jnp.stack([t(rw[j]) for j in range(k)]), t(rb),
            jnp.stack([t(cw[i]) for i in range(k)]), t(cb),
        ]
    dw3t = jnp.stack([t(dw3[i, j]) for i in range(3) for j in range(3)])
    return (
        t(sc1), t(sh1), W1f, b1f, dw5t, t(dw5b), *strip_flat,
        Wmix, bmix, W2, b2, t(ls1), W3f, b3f, dw3t, t(dw3b), W4, b4, t(ls2),
    )


_N_WEIGHTS = 30  # length of the _flat_pack tuple


# --------------------------------------------------------------------------- #
# kernel
# --------------------------------------------------------------------------- #


def _erf(x: Array) -> Array:
    """Polynomial erf (Abramowitz-Stegun 7.1.26, |err| < 1.5e-7): Pallas TPU
    has no erf lowering, and 1.5e-7 is far below bf16 resolution."""
    s = jnp.sign(x)
    x = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * x)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return s * (1.0 - poly * jnp.exp(-x * x))


def _gelu(x: Array) -> Array:
    # erf GELU in f32 (models/modules.py:21-23; torch nn.GELU default)
    x = x.astype(jnp.float32)
    return x * 0.5 * (1.0 + _erf(x * 0.7071067811865476))


def _stencil_flat(src, taps, offs_h, offs_w, h, wc, cstep, bias):
    """Depthwise stencil on the flattened (H, W*C) layout.

    src: (H, W*C); taps: (n_taps, W*C) enumerated row-major over
    (offs_h, offs_w); horizontal tap dj = static cstep*dj lane shift of one
    zero-padded copy (zero-pad conv semantics). Returns f32 (H, W*C).
    """
    ph = max(abs(d) for d in offs_h)
    pw = max(abs(d) for d in offs_w)
    pad = jnp.pad(src.astype(jnp.float32), ((ph, ph), (cstep * pw, cstep * pw)))
    acc = jnp.zeros((h, wc), jnp.float32) + bias.astype(jnp.float32)
    idx = 0
    for di in offs_h:
        for dj in offs_w:
            acc = acc + taps[idx].astype(jnp.float32) * pad[
                ph + di : ph + di + h, cstep * (pw + dj) : cstep * (pw + dj) + wc
            ]
            idx += 1
    return acc


def _matmul(x2d: Array, w: Array, b: Array) -> Array:
    """(N,Ci)@(Ci,Co)+b with f32 accumulation; returns f32."""
    out = jax.lax.dot_general(
        x2d, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    return out + b.astype(jnp.float32)


def _block_kernel(x_ref, *refs, mlp_chunk: int):
    ws, out_ref = refs[:_N_WEIGHTS], refs[_N_WEIGHTS]
    (sc1f, sh1f, W1f, b1f, dw5t, dw5bf,
     r7t, r7bf, c7t, c7bf, r11t, r11bf, c11t, c11bf, r21t, r21bf, c21t, c21bf,
     Wmix, bmix, W2, b2, ls1f, W3f, b3f, dw3t, dw3bf, W4, b4, ls2f) = [
        r[...] for r in ws
    ]

    x = x_ref[0]  # (H,W,C)
    H, W, C = x.shape
    WC = W * C
    dt = x.dtype
    xf = x.reshape(H, WC)

    # ---- attention branch (flattened lanes) ---- #
    # bnx = BN1(x) is both the tower input (folded into W1f) and the
    # SpatialAttention shortcut (modules.py:210-219)
    bnx = xf.astype(jnp.float32) * sc1f.astype(jnp.float32) + sh1f.astype(jnp.float32)
    a = _gelu(_matmul(xf.reshape(H * W, C), W1f, b1f)).astype(dt).reshape(H, WC)

    t = _stencil_flat(a, dw5t, range(-2, 3), range(-2, 3), H, WC, C, dw5bf).astype(dt)

    s = t.astype(jnp.float32)
    for k, rt, rbf, ct, cbf in (
        (7, r7t, r7bf, c7t, c7bf),
        (11, r11t, r11bf, c11t, c11bf),
        (21, r21t, r21bf, c21t, c21bf),
    ):
        half = k // 2
        r = _stencil_flat(t, rt, (0,), range(-half, half + 1), H, WC, C, rbf).astype(dt)
        s = s + _stencil_flat(r, ct, range(-half, half + 1), (0,), H, WC, C, cbf)
    s = s.astype(dt)

    g = _matmul(s.reshape(H * W, C), Wmix, bmix).astype(dt).reshape(H, WC)
    a2 = g * a
    h2 = _matmul(a2.reshape(H * W, C), W2, b2).reshape(H, WC)
    x1 = (xf.astype(jnp.float32) + ls1f.astype(jnp.float32) * (h2 + bnx)).astype(dt)

    # ---- MLP branch, chunked over rows so the R-wide hidden stays small --- #
    R = W3f.shape[1]
    WR = W * R
    chunks = []
    for r0 in range(0, H, mlp_chunk):
        r1 = min(H, r0 + mlp_chunk)
        e0, e1 = max(0, r0 - 1), min(H, r1 + 1)  # +1-row halo for the 3x3 dw
        m = _matmul(x1[e0:e1].reshape((e1 - e0) * W, C), W3f, b3f).astype(dt)
        m = m.reshape(e1 - e0, WR)
        # pad so padded row (1+d) is absolute row r0+d; zero rows stand in
        # for the image border where the halo row does not exist
        mp = jnp.pad(
            m.astype(jnp.float32),
            ((1 - (r0 - e0), 1 - (e1 - r1)), (R, R)),
        )
        mc = jnp.zeros((r1 - r0, WR), jnp.float32) + dw3bf.astype(jnp.float32)
        idx = 0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                mc = mc + dw3t[idx].astype(jnp.float32) * mp[
                    1 + di : 1 + di + (r1 - r0), R * (1 + dj) : R * (1 + dj) + WR
                ]
                idx += 1
        mc = _gelu(mc).astype(dt)
        y = _matmul(mc.reshape((r1 - r0) * W, R), W4, b4).reshape(r1 - r0, WC)
        chunks.append(x1[r0:r1].astype(jnp.float32) + ls2f.astype(jnp.float32) * y)
    out = chunks[0] if len(chunks) == 1 else jnp.concatenate(chunks, axis=0)
    out_ref[0] = out.astype(dt).reshape(H, W, C)


def mscan_block_pallas(
    x: Array, folded: Sequence[Array], mlp_chunk: int = 16, interpret: bool = False
) -> Array:
    """Apply one fused MSCANBlock; x (B,H,W,C), folded from fold_block_params."""
    B, H, W, C = x.shape
    chunk = min(mlp_chunk, H)
    flat = _flat_pack(folded, W)
    kernel = functools.partial(_block_kernel, mlp_chunk=chunk)
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0))]
        + [full(wv) for wv in flat],
        out_specs=pl.BlockSpec((1, H, W, C), lambda i: (i, 0, 0, 0)),
        interpret=interpret,
    )(x, *flat)


# --------------------------------------------------------------------------- #
# full-backbone eval forward with fused blocks
# --------------------------------------------------------------------------- #


def _conv2d(x, k, b, stride=1, pad=0):
    out = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b.astype(x.dtype)


def _bn_eval(x, bp, bs, eps=1e-5):
    sc, sh = _bn_fold(bp, bs, eps)
    return x * sc.astype(x.dtype) + sh.astype(x.dtype)


def mscan_forward_pallas(
    params: Dict[str, Any],
    batch_stats: Dict[str, Any],
    image: Array,
    variants: Tuple[Sequence[int], Sequence[int], Sequence[int]],
    interpret: bool = False,
) -> Tuple[Array, ...]:
    """Eval-mode MSCAN forward (models/mscan.py:49-86) with every MSCANBlock
    fused into one Pallas kernel; stem/patch-embeds/LayerNorms stay XLA
    (they are a few well-shaped strided convs).

    params/batch_stats: the ``MSCAN_0`` subtrees. variants: (dims, ratios,
    depths). Returns the 4 stage feature maps.
    """
    dims, _, depths = variants
    x = image[..., ::-1] * 255.0  # rgb->bgr, [0,1]->[0,255] (mscan.py:52)

    outs = []
    cur = 0
    for i in range(len(dims)):
        if i == 0:
            p = params["StemConv_0"]
            s = batch_stats["StemConv_0"]
            k0, b0 = _conv_wb(p["Conv2d_0"])
            x = _conv2d(x, k0, b0, stride=2, pad=1)
            x = _bn_eval(x, p["BatchNorm_0"]["BatchNorm_0"], s["BatchNorm_0"]["BatchNorm_0"])
            x = _gelu(x).astype(x.dtype)
            k1, b1 = _conv_wb(p["Conv2d_1"])
            x = _conv2d(x, k1, b1, stride=2, pad=1)
            x = _bn_eval(x, p["BatchNorm_1"]["BatchNorm_0"], s["BatchNorm_1"]["BatchNorm_0"])
        else:
            p = params[f"OverlapPatchEmbed_{i - 1}"]
            s = batch_stats[f"OverlapPatchEmbed_{i - 1}"]
            k0, b0 = _conv_wb(p["Conv2d_0"])
            x = _conv2d(x, k0, b0, stride=2, pad=1)
            x = _bn_eval(x, p["BatchNorm_0"]["BatchNorm_0"], s["BatchNorm_0"]["BatchNorm_0"])
        for j in range(depths[i]):
            bp = params[f"MSCANBlock_{cur + j}"]
            bs = batch_stats[f"MSCANBlock_{cur + j}"]
            folded = fold_block_params(bp, bs, dtype=x.dtype)
            x = mscan_block_pallas(x, folded, interpret=interpret)
        cur += depths[i]
        ln = params[f"LayerNorm_{i}"]
        xf = x.astype(jnp.float32)
        mu = xf.mean(-1, keepdims=True)
        var = ((xf - mu) ** 2).mean(-1, keepdims=True)
        xf = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        x = (xf * ln["scale"] + ln["bias"]).astype(x.dtype)
        outs.append(x)
    return tuple(outs)
