"""High-level calibration API: GeoCalib().calibrate(image).

Re-design of /root/reference/geocalib/extractor.py for TPU serving:
host-side preprocessing produces a fixed-size crop; one jitted function
(compiled per input shape + static solver config) runs the network and the
LM solver entirely on device; post-processing maps the camera back to
original pixels and resizes fields.
"""

import functools
from pathlib import Path
from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from geocalib_tpu.geometry.gravity import Gravity
from geocalib_tpu.models import GeoCalibNet
from geocalib_tpu.optim.lm import LMConfig, run_lm
from geocalib_tpu.utils.image import ImagePreprocessor, load_image

Array = jnp.ndarray


class GeoCalib:
    """Single-image calibration: CNN perspective fields + LM refinement.

    Example:
        calib = GeoCalib(weights="path/to/params.msgpack")
        result = calib.calibrate(image)  # (H, W, 3) RGB float [0, 1]
        result["camera"].vfov, result["gravity"].roll
    """

    def __init__(
        self,
        weights: Optional[Union[str, Path]] = None,
        variant: str = "b",
        compute_dtype: str = "bfloat16",
        fused_heads: bool = True,
        **optimizer_options: Any,
    ):
        """compute_dtype: CNN compute precision ("bfloat16" for the MXU fast
        path, "float32" for exact parity). The LM solver always runs f32.
        fused_heads: run both decoder heads as one 128-channel tower
        (models/fused_heads.py; ~1.2x end-to-end, parity-tested)."""
        self.net = GeoCalibNet(variant=variant)
        self.variant = variant
        self.fused_heads = fused_heads
        self.preprocessor = ImagePreprocessor()
        self.optimizer_options = optimizer_options
        self.compute_dtype = jnp.dtype(compute_dtype)
        if weights is not None:
            self.params = load_params(weights)
        else:
            self.params = jax.jit(self.net.init)(
                {"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 320, 320, 3))
            )

    @functools.lru_cache(maxsize=32)
    def _jitted_front(self, h: int, w: int):
        """Compile the heavy CNN front for a crop shape. Cached separately
        from the solver executable: the front depends only on (h, w) and the
        instance's variant/dtype, so changing solver config or priors reuses
        the compiled backbone."""
        from geocalib_tpu.models.fused_heads import fused_front

        @jax.jit
        def front(params, image):
            p = jax.tree.map(lambda x: x.astype(self.compute_dtype), params)
            return fused_front(p, image.astype(self.compute_dtype), self.variant)

        return front

    @functools.lru_cache(maxsize=32)
    def _jitted_forward(self, h: int, w: int, cfg: LMConfig, prior_keys: tuple):
        """Compile net+solver for a given crop shape / solver config.

        The fused path compiles TWO executables (CNN front / full-res tail
        + LM): XLA schedules the full-resolution tail ~2x faster as its own
        program, and the (feats, ll) intermediate never leaves the device.
        """
        if self.fused_heads:
            from geocalib_tpu.models.fused_heads import fused_tail_from_variables

            front = self._jitted_front(h, w)

            @jax.jit
            def tail(params, feats, ll, priors):
                p = jax.tree.map(lambda x: x.astype(self.compute_dtype), params)
                fields = fused_tail_from_variables(p, feats, ll)
                fields = {k: v.astype(jnp.float32) for k, v in fields.items()}
                data = dict(fields)
                for k in prior_keys:
                    data[k] = priors[k]
                res = run_lm(data, cfg)
                return fields, res

            def forward(params, image, priors):
                feats, ll = front(params, image)
                return tail(params, feats, ll, priors)

            return forward

        @jax.jit
        def forward(params, image, priors):
            p = jax.tree.map(lambda x: x.astype(self.compute_dtype), params)
            fields = self.net.apply(p, image.astype(self.compute_dtype))
            fields = {k: v.astype(jnp.float32) for k, v in fields.items()}
            data = dict(fields)
            for k in prior_keys:
                data[k] = priors[k]
            res = run_lm(data, cfg)
            return fields, res

        return forward

    def calibrate(
        self,
        image: Union[np.ndarray, Array],
        camera_model: str = "pinhole",
        priors: Optional[Dict[str, Any]] = None,
        shared_intrinsics: bool = False,
        batched: bool = False,
    ) -> Dict[str, Any]:
        """Calibrate one image (H, W, 3) or a same-size batch (B, H, W, 3).

        Args:
            image: RGB float [0, 1].
            camera_model: pinhole | simple_radial | radial | simple_divisional.
            priors: optional {"focal": (B,) or scalar pixels,
                "gravity": Gravity or (B, 3) vec}.
            shared_intrinsics: couple intrinsics across the batch (requires
                batched input).

        Returns dict with "camera" (original pixel space), "gravity",
        per-pixel fields resized to the input resolution, confidences and
        uncertainty estimates.
        """
        img = np.asarray(image, np.float32)
        if not batched:
            img = img[None]
        B = img.shape[0]
        assert not (shared_intrinsics and B == 1), (
            "shared_intrinsics needs a batch of images"
        )

        # host-side preprocessing (identical shapes across the batch)
        pre = [self.preprocessor(im) for im in img]
        crop = jnp.stack([jnp.asarray(p["image"]) for p in pre])
        scales = jnp.stack([jnp.asarray(p["scales"]) for p in pre])
        crop_pad = jnp.stack([jnp.asarray(p["crop_pad"]) for p in pre])

        prior_data: Dict[str, Array] = {}
        priors = priors or {}
        if "focal" in priors:
            f = jnp.broadcast_to(jnp.asarray(priors["focal"], jnp.float32), (B,))
            prior_data["prior_focal"] = f * scales[:, 1]
        if "gravity" in priors:
            g = priors["gravity"]
            vec = g.vec3d if isinstance(g, Gravity) else jnp.asarray(g, jnp.float32)
            prior_data["prior_gravity"] = jnp.broadcast_to(vec, (B, 3))
        if "k1" in priors:
            k1 = jnp.broadcast_to(jnp.asarray(priors["k1"], jnp.float32), (B,))
            prior_data["prior_dist"] = jnp.zeros((B, 2)).at[:, 0].set(k1)

        cfg = LMConfig(
            camera_model=camera_model,
            shared_intrinsics=shared_intrinsics,
            **self.optimizer_options,
        )
        h, w = int(crop.shape[1]), int(crop.shape[2])
        fwd = self._jitted_forward(h, w, cfg, tuple(sorted(prior_data)))
        fields, res = fwd(self.params, crop, prior_data)

        # ------- post-process back to original resolution ------- #
        camera = res.camera.undo_scale_crop({"scales": scales, "crop_pad": crop_pad})
        out: Dict[str, Any] = {
            "camera": camera if batched else jax.tree.map(lambda x: x[0], camera),
            "gravity": res.gravity if batched else jax.tree.map(lambda x: x[0], res.gravity),
        }
        H0, W0 = image.shape[-3:-1] if batched else np.asarray(image).shape[:2]
        for k, v in fields.items():
            vv = v if v.ndim == 4 else v[..., None]
            vv = jax.image.resize(vv, (B, H0, W0, vv.shape[-1]), method="bilinear")
            out[k] = vv if batched else vv[0]
        for k, v in res.info.items():
            out[k] = v if batched else jax.tree.map(lambda x: x[0] if hasattr(x, "ndim") and x.ndim > 0 else x, v)
        return out

    def calibrate_path(self, path: Union[str, Path], **kw) -> Dict[str, Any]:
        """Load an image from disk and calibrate it."""
        return self.calibrate(load_image(path), **kw)


def save_params(params, path: Union[str, Path]) -> None:
    """Serialize a params pytree to msgpack."""
    from flax import serialization

    Path(path).write_bytes(serialization.to_bytes(params))


def load_params(path: Union[str, Path], variant: str = "b"):
    """Load a params pytree saved by save_params."""
    from flax import serialization

    net = GeoCalibNet(variant=variant)
    template = jax.eval_shape(
        lambda: net.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 320, 320, 3)))
    )
    template = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), template)
    return serialization.from_bytes(template, Path(path).read_bytes())
