"""Planar (pixel-last) perspective-field math: the TPU hot path.

The vector API (perspective_fields.py) carries per-pixel 2/3-vectors and
2×P Jacobian matrices in trailing dims — on TPU those land in the 128-wide
lane dimension and waste ~40× of every tile. Here every per-pixel quantity
is a scalar *plane* of shape (B, N) (N = h·w in the lanes, batch in
sublanes), and all matrix products are expanded to plane arithmetic using
the radial-distortion scalar characterization from camera.py. The VPU sees
fully-packed (8,128) tiles and XLA fuses the whole chain.

Math parity: /root/reference/geocalib/perspective_fields.py:47-365 (same
blocks, same chain rule); validated against the vector implementation and
jax.jacfwd in tests/test_planar.py.

Returned Jacobians are nested lists of planes J[c][p] so the LM solver can
assemble normal equations as (B, P, N) gram matmuls on the MXU.
"""

from typing import List, Tuple

import jax.numpy as jnp

from geocalib_tpu.geometry.camera import Camera, _spec
from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.geometry.manifolds import SphericalManifold

Array = jnp.ndarray
_EPS = 1e-12


def make_grid(camera: Camera, h: int, w: int) -> Tuple[Array, Array]:
    """Normalized pixel-center coordinates as planes u, v of shape (B, N)."""
    x = jnp.arange(w, dtype=jnp.float32)
    y = jnp.arange(h, dtype=jnp.float32)
    xx = jnp.tile(x, h)  # x fastest, matches pixel_coordinates
    yy = jnp.repeat(y, w)
    fx, fy = camera.f[..., 0:1], camera.f[..., 1:2]  # (B, 1)
    cx, cy = camera.c[..., 0:1], camera.c[..., 1:2]
    u = (xx - cx) / fx  # (B, N)
    v = (yy - cy) / fy
    return u, v


def strided_grid(
    camera: Camera, h: int, w: int, stride: int
) -> Tuple[Array, Array]:
    """Normalized coords for every stride-th pixel (matches grid[::s, ::s])."""
    x = jnp.arange(0, w, stride, dtype=jnp.float32)
    y = jnp.arange(0, h, stride, dtype=jnp.float32)
    xx = jnp.tile(x, y.shape[0])
    yy = jnp.repeat(y, x.shape[0])
    fx, fy = camera.f[..., 0:1], camera.f[..., 1:2]
    cx, cy = camera.c[..., 0:1], camera.c[..., 1:2]
    return (xx - cx) / fx, (yy - cy) / fy


def _k_planes(camera: Camera) -> Tuple[Array, Array]:
    return camera.k[..., 0:1], camera.k[..., 1:2]  # (B, 1)


def _gravity_planes(gravity: Gravity) -> Tuple[Array, Array, Array]:
    vec = gravity.vec3d
    return vec[..., 0:1], vec[..., 1:2], vec[..., 2:3]  # (B, 1) each


def up_planes(
    camera: Camera, gravity: Gravity, u: Array, v: Array, normalize: bool = True
) -> Tuple[Array, Array]:
    """Up field as planes (tx, ty), optionally L2-normalized."""
    a, b, cg = _gravity_planes(gravity)
    px = a - cg * u
    py = b - cg * v
    if camera.has_distortion:
        spec = _spec(camera.model)
        k1, k2 = _k_planes(camera)
        r2 = u * u + v * v
        s = spec.scale(k1, k2, r2)
        phi = spec.phi(k1, k2, r2)
        inner = u * px + v * py
        tx = s * px + phi * u * inner
        ty = s * py + phi * v * inner
    else:
        tx, ty = px, py
    if not normalize:
        return tx, ty
    inv = 1.0 / jnp.maximum(jnp.sqrt(tx * tx + ty * ty), _EPS)
    return tx * inv, ty * inv


def sinlat_planes(
    camera: Camera, gravity: Gravity, u: Array, v: Array
) -> Array:
    """sin(latitude) plane: bearing(u, v) · gravity."""
    a, b, cg = _gravity_planes(gravity)
    spec = _spec(camera.model)
    k1, k2 = _k_planes(camera)
    r2 = u * u + v * v
    su = spec.undistort_scale(k1, k2, r2)
    ud, vd = su * u, su * v
    inv = 1.0 / jnp.sqrt(ud * ud + vd * vd + 1.0)
    return (a * ud + b * vd + cg) * inv


def manifold_matrix(gravity: Gravity, spherical: bool) -> Array:
    """J_abc2delta (B, 3, 2): gravity-tangent basis for the J planes."""
    return (
        SphericalManifold.J_plus(gravity.vec3d) if spherical else gravity.J_rp()
    )


def _manifold_planes(gravity: Gravity, spherical: bool, M=None):
    """J_abc2delta entries m[k][d] as (B, 1) planes (k < 3, d < 2).

    M may be the (B, 3, 2) matrix, an already-expanded nested list of
    (B, 1) planes (the Pallas kernel passes planes to avoid rank-changing
    reshapes that Mosaic's layout inference rejects), or None (computed
    from the gravity).
    """
    if isinstance(M, list):
        return M
    if M is None:
        M = manifold_matrix(gravity, spherical)  # (B, 3, 2)
    return [[M[..., k, d][..., None] for d in range(2)] for k in range(3)]


def _focal_planes(camera: Camera, u: Array, v: Array, log_focal: bool):
    """J_uv2f planes (gx, gy): d(u, v)/d(focal step)."""
    if log_focal:
        return -u, -v
    fx, fy = camera.f[..., 0:1], camera.f[..., 1:2]
    return -u / fx, -v / fy


def J_up_planes(
    camera: Camera,
    gravity: Gravity,
    u: Array,
    v: Array,
    spherical: bool = False,
    log_focal: bool = False,
    M: Array = None,
) -> List[List[Array]]:
    """Jacobian planes J[c][p] of the normalized up field, c<2, p<3+num_k.

    Parity: J_up_field (perspective_fields.py and reference :84-182),
    expanded to scalar planes.
    """
    a, b, cg = _gravity_planes(gravity)
    px = a - cg * u
    py = b - cg * v
    has_dist = camera.has_distortion

    if has_dist:
        spec = _spec(camera.model)
        k1, k2 = _k_planes(camera)
        r2 = u * u + v * v
        s = spec.scale(k1, k2, r2)
        phi = spec.phi(k1, k2, r2)
        dphi = spec.dphi_dr2(k1, k2, r2)
        inner = u * px + v * py
        # D = s I + φ uv uvᵀ (symmetric)
        D11 = s + phi * u * u
        D12 = phi * u * v
        D22 = s + phi * v * v
        tx = s * px + phi * u * inner
        ty = s * py + phi * v * inner
        ox, oy = phi * u, phi * v  # offset
    else:
        D11 = D22 = None
        tx, ty = px, py

    # J_vecnorm of (tx, ty): symmetric 2x2 planes
    inv = 1.0 / jnp.maximum(jnp.sqrt(tx * tx + ty * ty), _EPS)
    inv3 = inv * inv * inv
    n11 = inv - tx * tx * inv3
    n12 = -tx * ty * inv3
    n22 = inv - ty * ty * inv3

    cols: List[List[Array]] = [[], []]  # cols[c] -> list over params

    # ---- gravity block: J_t2abc = D @ [[1,0,-u],[0,1,-v]] ---- #
    if has_dist:
        t_abc = (
            (D11, D12, -(D11 * u + D12 * v)),
            (D12, D22, -(D12 * u + D22 * v)),
        )
    else:
        one = jnp.ones_like(u)
        t_abc = ((one, 0.0 * u, -u), (0.0 * u, one, -v))
    m = _manifold_planes(gravity, spherical, M)
    for d in range(2):
        td0 = t_abc[0][0] * m[0][d] + t_abc[0][1] * m[1][d] + t_abc[0][2] * m[2][d]
        td1 = t_abc[1][0] * m[0][d] + t_abc[1][1] * m[1][d] + t_abc[1][2] * m[2][d]
        cols[0].append(n11 * td0 + n12 * td1)
        cols[1].append(n12 * td0 + n22 * td1)

    # ---- focal block ---- #
    gx, gy = _focal_planes(camera, u, v, log_focal)
    if has_dist:
        # J_t2uv[i][j] = p_i o_j + inner (φ δij + 2 φ' u_i u_j) + o_i p_j − cg D[i][j]
        J00 = px * ox + inner * (phi + 2.0 * dphi * u * u) + ox * px - cg * D11
        J01 = px * oy + inner * (2.0 * dphi * u * v) + ox * py - cg * D12
        J10 = py * ox + inner * (2.0 * dphi * v * u) + oy * px - cg * D12
        J11 = py * oy + inner * (phi + 2.0 * dphi * v * v) + oy * py - cg * D22
        tf0 = J00 * gx + J01 * gy
        tf1 = J10 * gx + J11 * gy
    else:
        tf0 = -cg * gx
        tf1 = -cg * gy
    cols[0].append(n11 * tf0 + n12 * tf1)
    cols[1].append(n12 * tf0 + n22 * tf1)

    # ---- distortion block ---- #
    if has_dist:
        ds_dk = spec.ds_dk(k1, k2, r2)
        dphi_dk = spec.dphi_dk(k1, k2, r2)
        for dk, dpk in zip(ds_dk, dphi_dk):
            pre0 = px * dk + dpk * inner * u
            pre1 = py * dk + dpk * inner * v
            cols[0].append(n11 * pre0 + n12 * pre1)
            cols[1].append(n12 * pre0 + n22 * pre1)

    return cols


def J_lat_planes(
    camera: Camera,
    gravity: Gravity,
    u: Array,
    v: Array,
    spherical: bool = False,
    log_focal: bool = False,
    M: Array = None,
) -> List[Array]:
    """Jacobian planes J[p] of sin(latitude), p < 3+num_k.

    Parity: J_latitude_field (reference :214-275), expanded to planes.
    """
    a, b, cg = _gravity_planes(gravity)
    spec = _spec(camera.model)
    k1, k2 = _k_planes(camera)
    r2 = u * u + v * v
    su = spec.undistort_scale(k1, k2, r2)
    dsu = spec.dsu_dr2(k1, k2, r2)
    ud, vd = su * u, su * v

    inv = 1.0 / jnp.sqrt(ud * ud + vd * vd + 1.0)
    inv3 = inv * inv * inv

    # e_j = Σ_i gvec_i · J_vecnorm(w)[i][j] for j in {0, 1} (w = (ud, vd, 1))
    gw = a * ud + b * vd + cg  # gvec · w
    e0 = a * inv - ud * gw * inv3
    e1 = b * inv - vd * gw * inv3

    cols: List[Array] = []

    # gravity: bearing · m[:, d]
    m = _manifold_planes(gravity, spherical, M)
    for d in range(2):
        cols.append((ud * m[0][d] + vd * m[1][d] + m[2][d]) * inv)

    # focal: J_w2f[j] = su g_j + 2 su' uv_j (u gx + v gy)
    gx, gy = _focal_planes(camera, u, v, log_focal)
    dot = u * gx + v * gy
    jw0 = su * gx + 2.0 * dsu * u * dot
    jw1 = su * gy + 2.0 * dsu * v * dot
    cols.append(e0 * jw0 + e1 * jw1)

    # distortion: J_w2k[j] = γ_k uv_j  →  γ_k (e0 u + e1 v)
    for gam in spec.dsu_dk(k1, k2, r2):
        cols.append(gam * (e0 * u + e1 * v))

    return cols
