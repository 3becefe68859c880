"""RANSAC roll/pitch/focal solver from perspective fields ("UVP" baseline).

Re-design of /root/reference/siclib/models/optimization/ransac.py: the
closed-form minimal solver (vertical vanishing point from two up-vector
line crossings, focal from a latitude sample quadratic, roll/pitch from the
normalized abc vector) and batched hypothesis scoring.

TPU-first changes vs the reference:
- All N hypotheses are solved in one vectorized call (no host loops).
- Inlier voting renders candidate fields on a *strided* pixel grid and
  scans over hypothesis chunks, keeping peak memory B·chunk·(H/s)·(W/s)
  instead of the reference's B·N·H·W blowup (ransac.py:197-225) — same
  argmax, bounded VMEM/HBM footprint.
"""

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from geocalib_tpu.geometry import planar_fields as pf
from geocalib_tpu.geometry.camera import Camera
from geocalib_tpu.geometry.gravity import Gravity

Array = jnp.ndarray
_EPS = 1e-9


@dataclasses.dataclass(frozen=True)
class RansacConfig:
    n_iter: int = 1000
    chunk: int = 100  # hypotheses scored per scan step
    scoring_stride: int = 4  # score on every s-th pixel
    up_inlier_th: float = 1.0  # degrees
    latitude_inlier_th: float = 1.0  # degrees
    up_weight: float = 1.0
    latitude_weight: float = 1.0
    use_latitude: bool = True


# ------------------------- minimal solver ------------------------- #


def _up_line(xy: Array, up: Array) -> Array:
    """Homogeneous line through pixel xy along up direction: (xy,1) × (xy+up,1)."""
    x, y = xy[..., 0], xy[..., 1]
    ux, uy = up[..., 0], up[..., 1]
    # cross([x, y, 1], [x+ux, y+uy, 1]) = [y - (y+uy), (x+ux) - x, x(y+uy) - y(x+ux)]
    return jnp.stack([-uy, ux, x * uy - y * ux], axis=-1)


def vertical_vanishing_point(xy1, up1, xy2, up2) -> Array:
    """VVP = line1 × line2, normalized to z=1 (reference :24-44)."""
    l1 = _up_line(xy1, up1)
    l2 = _up_line(xy2, up2)
    v = jnp.cross(l1, l2)
    z = v[..., 2:3]
    return v / jnp.where(jnp.abs(z) < _EPS, jnp.sign(z) * _EPS + _EPS, z)


def solve_focal(L: Array, xy: Array, vvp: Array, c: Array) -> Tuple[Array, Array]:
    """Focal from one sin-latitude sample + the VVP (reference :74-112).

    Solves the quadratic a0 f⁴ + a1 f² + a2 = 0 in f².
    """
    u = xy[..., 0] - c[..., 0:1]
    v = xy[..., 1] - c[..., 1:2]
    vx = vvp[..., 0] - c[..., 0:1] * vvp[..., 2]
    vy = vvp[..., 1] - c[..., 1:2] * vvp[..., 2]
    vz = vvp[..., 2]

    a0 = (L**2 - 1) * vz**2
    a1 = L**2 * (vz**2 * (u**2 + v**2) + vx**2 + vy**2) - 2 * vz * (vx * u + vy * v)
    a2 = L**2 * (v**2 + u**2) * (vx**2 + vy**2) - (u * vx + v * vy) ** 2

    a0 = jnp.where(a0 == 0, 1e-6, a0)
    disc = jnp.sqrt(jnp.maximum(a1**2 - 4 * a0 * a2, 0.0))
    f2_pos = (-a1 + disc) / (2 * a0)
    f2_neg = (-a1 - disc) / (2 * a0)
    return jnp.sqrt(jnp.maximum(f2_pos, _EPS)), jnp.sqrt(jnp.maximum(f2_neg, _EPS))


def solve_rp(vvp: Array, c: Array, f: Array) -> Tuple[Array, Array]:
    """Roll/pitch from the normalized abc vector (reference :137-177)."""
    vx = vvp[..., 0] - c[..., 0:1] * vvp[..., 2]
    vy = vvp[..., 1] - c[..., 1:2] * vvp[..., 2]
    vz = vvp[..., 2]
    abc = jnp.stack([vx / f, vy / f, vz], axis=-1)
    abc = abc / jnp.maximum(jnp.linalg.norm(abc, axis=-1, keepdims=True), _EPS)
    a, _, cz = abc[..., 0], abc[..., 1], abc[..., 2]
    # gravity must point "down" in camera frame (b < 0): flip sign ambiguity
    flip = jnp.where(abc[..., 1] > 0, -1.0, 1.0)
    a, cz = a * flip, cz * flip
    denom = jnp.sqrt(jnp.clip(1 - cz**2, _EPS, None))
    roll = jnp.arcsin(jnp.clip(-a / denom, -1 + 1e-6, 1 - 1e-6))
    pitch = jnp.arcsin(jnp.clip(cz, -1 + 1e-6, 1 - 1e-6))
    return roll, pitch


# --------------------------- RANSAC loop --------------------------- #


class RansacResult(NamedTuple):
    camera: Camera
    gravity: Gravity
    score: Array  # (B,) inlier score of the winner
    rpf: Array  # (B, 3) roll, pitch, focal


def _score_chunk(
    rpf: Array,  # (B, C, 3)
    obs_upx, obs_upy, obs_lat, w_up, w_lat,  # planes (B, Ns)
    h: int, w: int, stride: int, cfg: RansacConfig,
) -> Array:
    """Inlier score for a chunk of hypotheses; returns (B, C)."""
    B, C = rpf.shape[:2]
    roll = rpf[..., 0].reshape(B * C)
    pitch = rpf[..., 1].reshape(B * C)
    focal = rpf[..., 2].reshape(B * C)

    cam = Camera.from_dict(
        {
            "height": jnp.full((B * C,), float(h)),
            "width": jnp.full((B * C,), float(w)),
            "f": focal,
        }
    )
    grav = Gravity.from_rp(roll, pitch)

    u, v = pf.strided_grid(cam, h, w, stride)
    upx, upy = pf.up_planes(cam, grav, u, v)
    Ns = u.shape[-1]
    upx = upx.reshape(B, C, Ns)
    upy = upy.reshape(B, C, Ns)

    cosang = jnp.clip(upx * obs_upx[:, None] + upy * obs_upy[:, None], -1.0, 1.0)
    up_err = jnp.degrees(jnp.arccos(cosang))
    score = cfg.up_weight * jnp.sum(
        (up_err < cfg.up_inlier_th) * w_up[:, None], axis=-1
    )

    if obs_lat is not None:
        sinlat = pf.sinlat_planes(cam, grav, u, v).reshape(B, C, Ns)
        lat_err = jnp.degrees(
            jnp.abs(jnp.arcsin(jnp.clip(sinlat, -1, 1)) - obs_lat[:, None])
        )
        score = score + cfg.latitude_weight * jnp.sum(
            (lat_err < cfg.latitude_inlier_th) * w_lat[:, None], axis=-1
        )
    return score


def run_ransac(
    data: Dict[str, Array],
    cfg: RansacConfig = RansacConfig(),
    rng: Optional[Array] = None,
) -> RansacResult:
    """Estimate (roll, pitch, focal) per image by RANSAC over field samples.

    data: up_field (B, h, w, 2) [+ latitude_field, confidences, prior_focal].
    """
    up_field = data["up_field"]
    B, h, w = up_field.shape[:3]
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    n = cfg.n_iter

    kx, ky = jax.random.split(rng)
    xs = jax.random.randint(kx, (B, n, 3), 0, w)
    ys = jax.random.randint(ky, (B, n, 3), 0, h)

    # gather samples
    bidx = jnp.arange(B)[:, None, None]
    up = up_field[bidx, ys, xs]  # (B, n, 3, 2)
    xy = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)  # (B, n, 3, 2)
    c = jnp.stack(
        [jnp.full((B,), w / 2.0), jnp.full((B,), h / 2.0)], axis=-1
    )  # (B, 2)

    vvp = vertical_vanishing_point(
        xy[..., 0, :], up[..., 0, :], xy[..., 1, :], up[..., 1, :]
    )  # (B, n, 3)

    if "prior_focal" in data:
        f_pos = f_neg = jnp.broadcast_to(
            jnp.asarray(data["prior_focal"], jnp.float32)[:, None], (B, n)
        )
    else:
        lat = data["latitude_field"][bidx, ys, xs][..., 2, 0]  # (B, n)
        L = jnp.sin(lat)
        f_pos, f_neg = solve_focal(L, xy[..., 2, :], vvp, c)

    hyps = []
    for f in (f_pos, f_neg):
        f = jnp.clip(f, 0.1 * max(h, w), 10.0 * max(h, w))
        roll, pitch = solve_rp(vvp, c, f)
        hyps.append(jnp.stack([roll, pitch, f], axis=-1))
    rpf_all = jnp.concatenate(hyps, axis=1)  # (B, 2n, 3)
    rpf_all = jnp.nan_to_num(rpf_all, nan=0.0, posinf=1e6, neginf=-1e6)

    # observation planes on the scoring grid
    s = cfg.scoring_stride
    obs_up = up_field[:, ::s, ::s].reshape(B, -1, 2)
    obs_upx, obs_upy = obs_up[..., 0], obs_up[..., 1]
    w_up = (
        data["up_confidence"][:, ::s, ::s].reshape(B, -1)
        if "up_confidence" in data
        else jnp.ones_like(obs_upx)
    )
    if cfg.use_latitude and "latitude_field" in data:
        obs_lat = data["latitude_field"][:, ::s, ::s].reshape(B, -1)
        w_lat = (
            data["latitude_confidence"][:, ::s, ::s].reshape(B, -1)
            if "latitude_confidence" in data
            else jnp.ones_like(obs_lat)
        )
    else:
        obs_lat = w_lat = None

    # chunked scoring scan
    n_total = rpf_all.shape[1]
    C = cfg.chunk
    n_chunks = -(-n_total // C)
    pad = n_chunks * C - n_total
    rpf_pad = jnp.pad(rpf_all, ((0, 0), (0, pad), (0, 0)))
    chunks = rpf_pad.reshape(B, n_chunks, C, 3).swapaxes(0, 1)  # (nc, B, C, 3)

    def body(best, chunk_rpf):
        best_score, best_rpf = best
        score = _score_chunk(
            chunk_rpf, obs_upx, obs_upy, obs_lat, w_up, w_lat, h, w, s, cfg
        )  # (B, C)
        idx = jnp.argmax(score, axis=-1)
        sc = jnp.take_along_axis(score, idx[:, None], 1)[:, 0]
        cand = jnp.take_along_axis(chunk_rpf, idx[:, None, None], 1)[:, 0]
        better = sc > best_score
        return (
            jnp.where(better, sc, best_score),
            jnp.where(better[:, None], cand, best_rpf),
        ), None

    init = (jnp.full((B,), -jnp.inf), jnp.zeros((B, 3)))
    (best_score, best_rpf), _ = jax.lax.scan(body, init, chunks)

    camera = Camera.from_dict(
        {
            "height": jnp.full((B,), float(h)),
            "width": jnp.full((B,), float(w)),
            "f": best_rpf[:, 2],
        }
    )
    gravity = Gravity.from_rp(best_rpf[:, 0], best_rpf[:, 1])
    return RansacResult(camera, gravity, best_score, best_rpf)
