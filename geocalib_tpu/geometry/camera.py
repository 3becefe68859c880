"""Camera models as immutable pytrees with static model dispatch.

Re-design of the reference camera hierarchy
(/root/reference/geocalib/camera.py:18-950) for JAX/TPU:

- A single ``Camera`` flax.struct pytree holds the packed parameters
  (size, f, c, k) with fixed shapes; the *model* is a static (non-pytree)
  string so every jitted function specializes on it at trace time — no
  Python-level polymorphism inside compiled code.
- Per-model distortion math lives in pure-function tables
  (``_DIST_SPECS``). All functions are shape-polymorphic, broadcast over
  batch dims, and written branch-free so XLA can fuse them into the
  LM solver's normal-equation pass.
- Where the reference falls back to ``torch.func.vmap(jacfwd(...))`` with
  Python loops over the batch (camera.py:216-297), we use closed forms, or
  exact elementwise ``jax.jvp`` derivatives for the ill-conditioned
  simple_divisional terms (camera.py:888-942 notes its hand-derived form is
  unstable) — still compiled to pure arithmetic by XLA, no host round trips.

Supported models (parity with camera_models at camera.py:945-950):
``pinhole``, ``simple_radial``, ``radial``, ``simple_divisional``.
"""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from geocalib_tpu.utils.conversions import deg2rad, focal2fov, fov2focal

CAMERA_MODELS = ("pinhole", "simple_radial", "radial", "simple_divisional")

# number of active distortion parameters per model
NUM_DIST_PARAMS = {
    "pinhole": 0,
    "simple_radial": 1,
    "radial": 2,
    "simple_divisional": 1,
}

# valid range for additive distortion updates in the LM solver
DIST_RANGE = {
    "simple_radial": (-0.7, 0.7),
    "radial": (-0.7, 0.7),
    "simple_divisional": (-3.0, 3.0),
}

_EPS = 1e-3  # min depth for projection (reference BaseCamera.eps)


@struct.dataclass
class Camera:
    """Packed camera parameters.

    Fields (all shaped (..., 2), float32):
        size: (w, h) in pixels.
        f: focal lengths (fx, fy) in pixels.
        c: principal point (cx, cy) in pixels.
        k: distortion parameters, zero-padded to 2 entries.
        model: static camera-model name (not a pytree leaf).
    """

    size: jnp.ndarray
    f: jnp.ndarray
    c: jnp.ndarray
    k: jnp.ndarray
    model: str = struct.field(pytree_node=False, default="pinhole")

    # ------------------------------------------------------------------ #
    # constructors
    # ------------------------------------------------------------------ #

    @classmethod
    def from_data(cls, data: jnp.ndarray, model: str = "pinhole") -> "Camera":
        """From packed (..., {6,7,8}) = [w, h, fx, fy, cx, cy, k1, k2]."""
        data = jnp.asarray(data, dtype=jnp.float32)
        n = data.shape[-1]
        assert n in (6, 7, 8), data.shape
        if n != 8:
            pad = jnp.zeros(data.shape[:-1] + (8 - n,), data.dtype)
            data = jnp.concatenate([data, pad], axis=-1)
        return cls(
            size=data[..., 0:2], f=data[..., 2:4], c=data[..., 4:6], k=data[..., 6:8],
            model=model,
        )

    @classmethod
    def from_dict(cls, params: Dict[str, jnp.ndarray], model: str = "pinhole") -> "Camera":
        """From a parameter dict (parity with BaseCamera.from_dict, camera.py:49-93).

        Requires "height"/"width" and one of "f"/"vfov". Optional: "cx", "cy",
        "k1", "k2", "dist", "k1_hat", "scales".
        """
        get = lambda key, default: jnp.asarray(params.get(key, default), dtype=jnp.float32)
        h = jnp.asarray(params["height"], dtype=jnp.float32)
        w = jnp.asarray(params["width"], dtype=jnp.float32)
        cx, cy = get("cx", w / 2.0), get("cy", h / 2.0)

        if "f" in params:
            f = jnp.asarray(params["f"], dtype=jnp.float32)
        elif "vfov" in params:
            f = fov2focal(jnp.asarray(params["vfov"], dtype=jnp.float32), h)
        else:
            raise ValueError("Either 'f' or 'vfov' must be provided.")

        if "dist" in params:
            dist = jnp.asarray(params["dist"], dtype=jnp.float32)
            k1 = dist[..., 0]
            k2 = dist[..., 1] if dist.shape[-1] > 1 else jnp.zeros_like(k1)
        elif "k1_hat" in params:
            k1 = get("k1_hat", 0.0) * (f / h) ** 2
            k2 = get("k2", jnp.zeros_like(k1))
        else:
            k1 = get("k1", jnp.zeros_like(f))
            k2 = get("k2", jnp.zeros_like(f))

        fx = f
        if "scales" in params:
            scales = jnp.asarray(params["scales"], dtype=jnp.float32)
            fx = fx * scales[..., 0] / scales[..., 1]

        data = jnp.stack([w, h, fx, f, cx, cy, k1, k2], axis=-1)
        return cls.from_data(data, model=model)

    # ------------------------------------------------------------------ #
    # basic properties
    # ------------------------------------------------------------------ #

    @property
    def data(self) -> jnp.ndarray:
        """Packed (..., 8) parameter tensor."""
        return jnp.concatenate([self.size, self.f, self.c, self.k], axis=-1)

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return self.size.shape[:-1]

    @property
    def num_dist_params(self) -> int:
        return NUM_DIST_PARAMS[self.model]

    @property
    def has_distortion(self) -> bool:
        return self.num_dist_params > 0

    @property
    def dist(self) -> jnp.ndarray:
        """Distortion parameters (..., 2) (zero-padded)."""
        return self.k

    @property
    def vfov(self) -> jnp.ndarray:
        return focal2fov(self.f[..., 1], self.size[..., 1])

    @property
    def hfov(self) -> jnp.ndarray:
        return focal2fov(self.f[..., 0], self.size[..., 0])

    @property
    def K(self) -> jnp.ndarray:
        """Intrinsic matrix (..., 3, 3)."""
        z = jnp.zeros_like(self.f[..., 0])
        o = jnp.ones_like(z)
        rows = jnp.stack(
            [self.f[..., 0], z, self.c[..., 0],
             z, self.f[..., 1], self.c[..., 1],
             z, z, o], axis=-1)
        return rows.reshape(self.batch_shape + (3, 3))

    def pinhole(self) -> "Camera":
        """Strip distortion."""
        return Camera(size=self.size, f=self.f, c=self.c,
                      k=jnp.zeros_like(self.k), model="pinhole")

    # ------------------------------------------------------------------ #
    # parameter updates (used inside the LM loop)
    # ------------------------------------------------------------------ #

    def update_focal(self, delta: jnp.ndarray, as_log: bool = False) -> "Camera":
        """Shift focal length (optionally in log-space), clamped to FoV ∈ [5°, 150°].

        Parity: BaseCamera.update_focal (camera.py:136-152). Keeps fx/fy ratio.
        """
        delta = jnp.asarray(delta, self.f.dtype)
        if delta.ndim == self.f.ndim - 1:
            delta = delta[..., None]
        f = jnp.exp(jnp.log(self.f) + delta) if as_log else self.f + delta

        h = self.size[..., 1:2]
        min_f = fov2focal(jnp.full_like(h, deg2rad(150.0)), h)
        max_f = fov2focal(jnp.full_like(h, deg2rad(5.0)), h)
        f = jnp.clip(f, min_f, max_f)

        # keep the aspect of the focal pair fixed
        fx = f[..., 1] * self.f[..., 0] / self.f[..., 1]
        f = jnp.stack([fx, f[..., 1]], axis=-1)
        return self.replace(f=f)

    def update_dist(self, delta: jnp.ndarray) -> "Camera":
        """Shift (active) distortion parameters, clamped to the model's range."""
        if not self.has_distortion:
            return self
        lo, hi = DIST_RANGE[self.model]
        nk = self.num_dist_params
        delta = jnp.asarray(delta, self.k.dtype)
        if delta.ndim == self.k.ndim - 1:
            delta = delta[..., None]
        pad_width = [(0, 0)] * (self.k.ndim - 1) + [(0, 2 - delta.shape[-1])]
        delta_full = jnp.pad(delta, pad_width)
        active = jnp.arange(2) < nk
        k = jnp.where(active, jnp.clip(self.k + delta_full, lo, hi), self.k)
        return self.replace(k=k)

    def scale(self, scales) -> "Camera":
        """Rescale after image resize. scales: scalar or (..., 2) (sx, sy)."""
        s = jnp.asarray(scales, dtype=self.f.dtype)
        if s.ndim == 0:
            s = jnp.stack([s, s], axis=-1)
        return self.replace(size=self.size * s, f=self.f * s, c=self.c * s)

    def crop(self, pad) -> "Camera":
        """Adjust for a symmetric crop/pad of (pad_w, pad_h) pixels."""
        pad = jnp.asarray(pad, dtype=self.size.dtype)
        return self.replace(size=self.size + pad, c=self.c + pad / 2.0)

    def undo_scale_crop(self, data: Dict[str, jnp.ndarray]) -> "Camera":
        """Invert the preprocessing scale/crop recorded in `data`."""
        cam = self.crop(-data["crop_pad"]) if "crop_pad" in data else self
        return cam.scale(1.0 / jnp.asarray(data["scales"], dtype=self.f.dtype))

    # ------------------------------------------------------------------ #
    # pinhole (un)projection
    # ------------------------------------------------------------------ #

    def project(self, p3d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Perspective division; returns (p2d, valid)."""
        z = p3d[..., -1]
        valid = z > _EPS
        z = jnp.maximum(z, _EPS)
        return p3d[..., :-1] / z[..., None], valid

    def J_project(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """(..., 2, 3) Jacobian of the perspective division."""
        x, y, z = p3d[..., 0], p3d[..., 1], p3d[..., 2]
        z = jnp.maximum(z, _EPS)
        zero = jnp.zeros_like(z)
        J = jnp.stack([1 / z, zero, -x / z**2, zero, 1 / z, -y / z**2], axis=-1)
        return J.reshape(p3d.shape[:-1] + (2, 3))

    def denormalize(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Normalized coords → pixels."""
        return p2d * self.f[..., None, :] + self.c[..., None, :]

    def normalize(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Pixels → normalized coords."""
        return (p2d - self.c[..., None, :]) / self.f[..., None, :]

    def J_normalize(self, p2d: jnp.ndarray, wrt: str = "f") -> jnp.ndarray:
        """Jacobian of normalize wrt 'f' or 'pts', shape (..., N, 2, 2) diag."""
        if wrt == "f":
            J_f = -(p2d - self.c[..., None, :]) / self.f[..., None, :] ** 2
            return _diag_embed(J_f)
        if wrt == "pts":
            J = jnp.broadcast_to(1.0 / self.f[..., None, :], p2d.shape)
            return _diag_embed(J)
        raise ValueError(f"Unknown wrt: {wrt}")

    def in_image(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Check pixel coordinates against the image bounds."""
        size = self.size[..., None, :]
        return jnp.all((p2d >= 0) & (p2d <= size - 1), axis=-1)

    def pixel_coordinates(self, h: int, w: int) -> jnp.ndarray:
        """Pixel-center grid, shape (h*w, 2), x fastest (matches reference)."""
        x = jnp.arange(w, dtype=jnp.float32)
        y = jnp.arange(h, dtype=jnp.float32)
        xx, yy = jnp.meshgrid(x, y, indexing="xy")
        return jnp.stack([xx, yy], axis=-1).reshape(-1, 2)

    # ------------------------------------------------------------------ #
    # distortion dispatch
    # ------------------------------------------------------------------ #

    def _k1(self) -> jnp.ndarray:
        return self.k[..., None, 0:1]  # (..., 1, 1), broadcasts against (..., N, 1)

    def _k2(self) -> jnp.ndarray:
        return self.k[..., None, 1:2]

    def distort_scale(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """Radial scale s(uv) with distorted = uv * s; shape (..., N, 1)."""
        return _spec(self.model).scale(self._k1(), self._k2(), _r2(p2d))

    def distort(self, p2d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Apply distortion; returns (distorted, valid)."""
        s = self.distort_scale(p2d)
        valid = jnp.ones(p2d.shape[:-1], dtype=bool)
        return p2d * s, valid

    def undistort(self, p2d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Apply the approximate inverse distortion; returns (undistorted, valid)."""
        s = _spec(self.model).undistort_scale(self._k1(), self._k2(), _r2(p2d))
        valid = jnp.ones(p2d.shape[:-1], dtype=bool)
        return p2d * s, valid

    def J_distort(self, p2d: jnp.ndarray, wrt: str = "scale2pts") -> jnp.ndarray:
        """Jacobians of the distortion scale.

        wrt="scale2pts": ds/duv = φ·uv, shape (..., N, 2).
        wrt="scale2dist": ds/dk (active params), shape (..., N, num_k).
        """
        spec = _spec(self.model)
        r2 = _r2(p2d)
        if wrt == "scale2pts":
            return spec.phi(self._k1(), self._k2(), r2) * p2d
        if wrt == "scale2dist":
            cols = spec.ds_dk(self._k1(), self._k2(), r2)
            if not cols:
                return jnp.zeros(p2d.shape[:-1] + (0,), p2d.dtype)
            return jnp.concatenate(cols, axis=-1)
        raise ValueError(f"Unknown wrt: {wrt}")

    def J_undistort(self, p2d: jnp.ndarray, wrt: str = "pts") -> jnp.ndarray:
        """Jacobian of undistort wrt 'pts' (..., N, 2, 2) or 'dist' (..., N, 2, num_k)."""
        spec = _spec(self.model)
        r2 = _r2(p2d)
        if wrt == "pts":
            su = spec.undistort_scale(self._k1(), self._k2(), r2)
            dsu = spec.dsu_dr2(self._k1(), self._k2(), r2)
            return (
                su[..., None] * jnp.eye(2, dtype=p2d.dtype)
                + 2.0 * dsu[..., None] * _outer(p2d, p2d)
            )
        if wrt == "dist":
            cols = spec.dsu_dk(self._k1(), self._k2(), r2)
            if not cols:
                return jnp.zeros(p2d.shape[:-1] + (2, 0), p2d.dtype)
            return jnp.stack([g * p2d for g in cols], axis=-1)
        raise ValueError(f"Unknown wrt: {wrt}")

    def up_projection_offset(self, p2d: jnp.ndarray) -> jnp.ndarray:
        """o(uv) = ds/duv = φ(r²)·uv, the up-field distortion offset; (..., N, 2)."""
        return self.J_distort(p2d, wrt="scale2pts")

    def J_up_projection_offset(self, p2d: jnp.ndarray, wrt: str = "uv") -> jnp.ndarray:
        """Jacobian of o(uv) wrt 'uv' (..., N, 2, 2) or 'dist' (..., N, 2, num_k)."""
        spec = _spec(self.model)
        r2 = _r2(p2d)
        if wrt == "uv":
            phi = spec.phi(self._k1(), self._k2(), r2)
            dphi = spec.dphi_dr2(self._k1(), self._k2(), r2)
            return (
                phi[..., None] * jnp.eye(2, dtype=p2d.dtype)
                + 2.0 * dphi[..., None] * _outer(p2d, p2d)
            )
        if wrt == "dist":
            cols = spec.dphi_dk(self._k1(), self._k2(), r2)
            if not cols:
                return jnp.zeros(p2d.shape[:-1] + (2, 0), p2d.dtype)
            return jnp.stack([g * p2d for g in cols], axis=-1)
        raise ValueError(f"Unknown wrt: {wrt}")

    # ------------------------------------------------------------------ #
    # image <-> world
    # ------------------------------------------------------------------ #

    def image2world(self, p2d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Pixels → unit-plane rays (..., N, 3); returns (uv1, valid)."""
        uv = self.normalize(p2d)
        uv, valid = self.undistort(uv)
        ones = jnp.ones(uv.shape[:-1] + (1,), uv.dtype)
        return jnp.concatenate([uv, ones], axis=-1), valid

    def J_image2world(self, p2d: jnp.ndarray, wrt: str = "f") -> jnp.ndarray:
        """Jacobian of the xy-part of image2world wrt 'f' or 'dist'."""
        if wrt == "dist":
            uv_norm = self.normalize(p2d)
            return self.J_undistort(uv_norm, "dist")
        if wrt == "f":
            J_norm2f = self.J_normalize(p2d, "f")
            uv_norm = self.normalize(p2d)
            J_dist2norm = self.J_undistort(uv_norm, "pts")
            return jnp.einsum("...ij,...jk->...ik", J_dist2norm, J_norm2f)
        raise ValueError(f"Unknown wrt: {wrt}")

    def world2image(self, p3d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """3D points → pixels; returns (p2d, valid)."""
        p2d, visible = self.project(p3d)
        p2d, mask = self.distort(p2d)
        p2d = self.denormalize(p2d)
        valid = visible & mask & self.in_image(p2d)
        return p2d, valid

    def pixel_bearing_many(self, p3d: jnp.ndarray) -> jnp.ndarray:
        """Unit bearing vectors from (homogeneous) rays."""
        norm = jnp.linalg.norm(p3d, axis=-1, keepdims=True)
        return p3d / jnp.maximum(norm, 1e-12)

    def undistort_image(self, img: jnp.ndarray) -> jnp.ndarray:
        """Remove lens distortion from an image batch (B, h, w, 3).

        Parity with the reference's grid-sample undistortion
        (/root/reference/geocalib/camera.py:396-412): for each output pixel,
        distort its normalized coordinates and bilinearly sample the source.
        """
        from geocalib_tpu.data.pano import _bilinear_sample

        B, h, w = img.shape[0], img.shape[1], img.shape[2]
        xy = self.pixel_coordinates(h, w)  # (N, 2)
        uv = self.normalize(xy)
        duv, _ = self.distort(uv)
        pts = self.denormalize(duv)  # (B, N, 2)
        out = jax.vmap(_bilinear_sample)(img, pts[..., 0], pts[..., 1])
        return out.reshape(B, h, w, img.shape[-1])


# ---------------------------------------------------------------------- #
# distortion model specs (pure functions of k1, k2, uv, r2)
#   k1, k2: (..., 1, 1); uv: (..., N, 2); r2: (..., N, 1)
# ---------------------------------------------------------------------- #


def _r2(p2d: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(p2d**2, axis=-1, keepdims=True)


def _diag_embed(v: jnp.ndarray) -> jnp.ndarray:
    """(..., D) → (..., D, D) diagonal."""
    return v[..., None] * jnp.eye(v.shape[-1], dtype=v.dtype)


def _outer(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.einsum("...i,...j->...ij", a, b)


# Every supported model is *radial*: distortion and its derivatives are fully
# characterized by scalar functions of r². Each spec provides:
#   scale(r2) = s, undistort_scale(r2) = su,
#   phi(r2) with offset = ds/duv = φ·uv (φ = 2·ds/dr²),
#   dphi_dr2, dphi_dk[i], ds_dk[i], dsu_dr2, dsu_dk[i].
# The generic vector forms follow (implemented once in Camera):
#   J_offset_uv     = φ I + 2 φ' uv uvᵀ
#   J_offset_k[i]   = (dφ/dk_i) uv
#   J_undistort_pts = su I + 2 su' uv uvᵀ
#   J_undistort_k[i] = (dsu/dk_i) uv
# This scalar characterization is what makes the TPU-planar hot path possible
# (geometry/planar_fields.py): all per-pixel quantities become (B, N) lanes.


class _Pinhole:
    num_k = 0

    @staticmethod
    def scale(k1, k2, r2):
        return jnp.ones_like(r2)

    @staticmethod
    def undistort_scale(k1, k2, r2):
        return jnp.ones_like(r2)

    @staticmethod
    def phi(k1, k2, r2):
        return jnp.zeros_like(r2)

    @staticmethod
    def dphi_dr2(k1, k2, r2):
        return jnp.zeros_like(r2)

    @staticmethod
    def dphi_dk(k1, k2, r2):
        return ()

    @staticmethod
    def ds_dk(k1, k2, r2):
        return ()

    @staticmethod
    def dsu_dr2(k1, k2, r2):
        return jnp.zeros_like(r2)

    @staticmethod
    def dsu_dk(k1, k2, r2):
        return ()


class _SimpleRadial:
    """s = 1 + k1 r²; inverse ≈ 1 - k1 r² (Drap & Lefèvre exact-series order 1).

    Parity: /root/reference/geocalib/camera.py:565-663.
    """

    num_k = 1

    @staticmethod
    def scale(k1, k2, r2):
        return 1.0 + k1 * r2

    @staticmethod
    def undistort_scale(k1, k2, r2):
        return 1.0 - k1 * r2

    @staticmethod
    def phi(k1, k2, r2):
        return jnp.broadcast_to(2.0 * k1, r2.shape)

    @staticmethod
    def dphi_dr2(k1, k2, r2):
        return jnp.zeros_like(r2)

    @staticmethod
    def dphi_dk(k1, k2, r2):
        return (jnp.full_like(r2, 2.0),)

    @staticmethod
    def ds_dk(k1, k2, r2):
        return (r2,)

    @staticmethod
    def dsu_dr2(k1, k2, r2):
        return jnp.broadcast_to(-k1, r2.shape)

    @staticmethod
    def dsu_dk(k1, k2, r2):
        return (-r2,)


class _Radial:
    """s = 1 + k1 r² + k2 r⁴; inverse ≈ 1 - k1 r² + (3k1² - k2) r⁴ (Drap order 2).

    Parity: /root/reference/geocalib/camera.py:663-789.
    """

    num_k = 2

    @staticmethod
    def scale(k1, k2, r2):
        return 1.0 + r2 * (k1 + k2 * r2)

    @staticmethod
    def undistort_scale(k1, k2, r2):
        return 1.0 + r2 * (-k1 + (3.0 * k1**2 - k2) * r2)

    @staticmethod
    def phi(k1, k2, r2):
        return 2.0 * k1 + 4.0 * k2 * r2

    @staticmethod
    def dphi_dr2(k1, k2, r2):
        return jnp.broadcast_to(4.0 * k2, r2.shape)

    @staticmethod
    def dphi_dk(k1, k2, r2):
        return (jnp.full_like(r2, 2.0), 4.0 * r2)

    @staticmethod
    def ds_dk(k1, k2, r2):
        return (r2, r2**2)

    @staticmethod
    def dsu_dr2(k1, k2, r2):
        return -k1 + 2.0 * (3.0 * k1**2 - k2) * r2

    @staticmethod
    def dsu_dk(k1, k2, r2):
        return (6.0 * k1 * r2**2 - r2, -(r2**2))


class _SimpleDivisional:
    """Fitzgibbon division model: s = (1-√(1-4 k1 r²))/(2 k1 r²); inverse 1/(1+k1 r²).

    Parity: /root/reference/geocalib/camera.py:789-944. Written via the
    smooth equivalent σ(t) = 2/(1+√(1-4t)) (t = k1 r²), which is finite at
    t = 0 — the reference's masked-division form has a uv-Jacobian documented
    as unstable (camera.py:888-942); the closed-form σ', σ'' here are exact.
    σ is the Catalan generating function: σ(0)=1, σ'(0)=1, σ''(0)=4.
    """

    num_k = 1

    @staticmethod
    def _q(k1, r2):
        return jnp.sqrt(jnp.clip(1.0 - 4.0 * k1 * r2, 1e-6, None))

    @classmethod
    def scale(cls, k1, k2, r2):
        return 2.0 / (1.0 + cls._q(k1, r2))

    @staticmethod
    def undistort_scale(k1, k2, r2):
        denom = 1.0 + k1 * r2
        return 1.0 / jnp.where(denom == 0, 1e6, denom)

    @classmethod
    def _sigma1(cls, k1, r2):
        """σ'(t) = 4 / (q (1+q)²)."""
        q = cls._q(k1, r2)
        return 4.0 / (q * (1.0 + q) ** 2)

    @classmethod
    def _sigma2(cls, k1, r2):
        """σ''(t) = 8 (1/(q³(1+q)²) + 2/(q²(1+q)³))."""
        q = cls._q(k1, r2)
        return 8.0 * (1.0 / (q**3 * (1.0 + q) ** 2) + 2.0 / (q**2 * (1.0 + q) ** 3))

    @classmethod
    def phi(cls, k1, k2, r2):
        return 2.0 * k1 * cls._sigma1(k1, r2)

    @classmethod
    def dphi_dr2(cls, k1, k2, r2):
        return 2.0 * k1**2 * cls._sigma2(k1, r2)

    @classmethod
    def dphi_dk(cls, k1, k2, r2):
        return (2.0 * cls._sigma1(k1, r2) + 2.0 * k1 * r2 * cls._sigma2(k1, r2),)

    @classmethod
    def ds_dk(cls, k1, k2, r2):
        return (cls._sigma1(k1, r2) * r2,)

    @staticmethod
    def dsu_dr2(k1, k2, r2):
        denom = (1.0 + k1 * r2) ** 2
        return -k1 / jnp.where(denom == 0, 1e6, denom)

    @staticmethod
    def dsu_dk(k1, k2, r2):
        denom = (1.0 + k1 * r2) ** 2
        return (-r2 / jnp.where(denom == 0, 1e6, denom),)


_DIST_SPECS = {
    "pinhole": _Pinhole,
    "simple_radial": _SimpleRadial,
    "radial": _Radial,
    "simple_divisional": _SimpleDivisional,
}


def _spec(model: str):
    try:
        return _DIST_SPECS[model]
    except KeyError:
        raise ValueError(f"Unknown camera model: {model!r}, expected one of {CAMERA_MODELS}")
