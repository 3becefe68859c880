"""Frame overlay renderers for the interactive demo (numpy, cv2-free).

Re-design of the reference demo's per-frame overlays
(/root/reference/geocalib/interactive_demo.py:40-330: up-field arrows,
latitude heatmap, confidence maps, horizon line, undistortion preview,
gravity-aligned grid and box). The reference draws with OpenCV; these
render straight into numpy RGB frames with a Bresenham rasterizer so they
work (and are testable) in headless environments, and the webcam loop can
use them with or without cv2.
"""

from typing import Dict, Tuple

import numpy as np

Array = np.ndarray


def draw_line(img: Array, p0, p1, color, thickness: int = 1) -> None:
    """In-place Bresenham line with thickness; clips to the frame."""
    h, w = img.shape[:2]
    x0, y0 = float(p0[0]), float(p0[1])
    x1, y1 = float(p1[0]), float(p1[1])
    n = int(max(abs(x1 - x0), abs(y1 - y0), 1)) * 2
    xs = np.linspace(x0, x1, n)
    ys = np.linspace(y0, y1, n)
    r = max(0, thickness // 2)
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            xi = np.round(xs + dx).astype(int)
            yi = np.round(ys + dy).astype(int)
            ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
            img[yi[ok], xi[ok]] = color


def _colormap(v: Array) -> Array:
    """Cheap diverging blue→white→red map for v in [-1, 1], (..., 3)."""
    v = np.clip(v, -1.0, 1.0)
    r = np.clip(1.0 + v, 0, 1)
    b = np.clip(1.0 - v, 0, 1)
    g = 1.0 - np.abs(v) * 0.7
    return np.stack([r, g, b], axis=-1)


def overlay_up_field(frame: Array, up: Array, stride: int = 24, color=(0.0, 0.8, 0.2)) -> Array:
    """Sparse up-vector arrows (reference plot_vector_field)."""
    out = frame.copy()
    h, w = frame.shape[:2]
    scale = stride * 0.75
    for y in range(stride // 2, h, stride):
        for x in range(stride // 2, w, stride):
            dx, dy = float(up[y, x, 0]) * scale, float(up[y, x, 1]) * scale
            draw_line(out, (x, y), (x + dx, y + dy), color, 2)
    return out


def overlay_latitude(frame: Array, latitude: Array, alpha: float = 0.35) -> Array:
    """Latitude heatmap blended over the frame (reference plot_latitude)."""
    lat = np.asarray(latitude)
    if lat.ndim == 3:
        lat = lat[..., 0]
    colors = _colormap(np.sin(lat))
    return (1 - alpha) * frame + alpha * colors


def overlay_confidence(frame: Array, conf: Array, alpha: float = 0.4) -> Array:
    """Confidence shading: low confidence darkens (reference plot_confidence)."""
    c = np.asarray(conf)
    if c.ndim == 3:
        c = c[..., 0]
    c = c / max(float(c.max()), 1e-6)
    return frame * ((1 - alpha) + alpha * c[..., None])


def overlay_horizon(frame: Array, camera, gravity, color=(1.0, 0.1, 0.1)) -> Array:
    """Horizon line across the image (left/right border intersections)."""
    from geocalib_tpu.geometry.perspective_fields import get_horizon_line

    out = frame.copy()
    w = frame.shape[1]
    ys = np.asarray(get_horizon_line(camera, gravity, relative=False)).reshape(2)
    draw_line(out, (0.0, ys[0]), (w - 1.0, ys[1]), color, 3)
    return out


def undistort_preview(frame: Array, camera) -> Array:
    """Undistorted view of the frame (reference undistort toggle)."""
    import jax
    import jax.numpy as jnp

    img = jnp.asarray(frame, jnp.float32)[None]
    cam_b = camera if camera.f.ndim == 2 else jax.tree.map(lambda x: x[None], camera)
    out = cam_b.undistort_image(img)
    return np.asarray(out[0])


def _project_segments(camera, gravity, segments: Array) -> Array:
    """World-frame segments (N, 2, 3) → pixel segments (N, 2, 2) + validity."""
    import jax.numpy as jnp

    R = np.asarray(gravity.R).reshape(3, 3)
    pts = segments.reshape(-1, 3) @ R.T  # world → camera
    p2d, valid = camera.world2image(jnp.asarray(pts)[None])
    p2d = np.asarray(p2d)[0].reshape(-1, 2, 2)
    valid = np.asarray(valid)[0].reshape(-1, 2)
    return p2d, valid.all(-1)


def overlay_grid(frame: Array, camera, gravity, color=(0.2, 0.5, 1.0)) -> Array:
    """Gravity-aligned ground-plane grid (reference grid toggle)."""
    out = frame.copy()
    lines = []
    for i in np.linspace(-2, 2, 9):
        lines.append([[i, 1.0, 2.0], [i, 1.0, 6.0]])  # depth lines on the floor
        pass
    for z in np.linspace(2, 6, 5):
        lines.append([[-2.0, 1.0, z], [2.0, 1.0, z]])
    segs, valid = _project_segments(camera, gravity, np.asarray(lines))
    for (a, b), ok in zip(segs, valid):
        if ok:
            draw_line(out, a, b, color, 1)
    return out


def overlay_box(frame: Array, camera, gravity, color=(1.0, 0.6, 0.1)) -> Array:
    """Gravity-aligned unit cube at 3m depth (reference box toggle)."""
    out = frame.copy()
    c = np.array([0.0, 0.5, 3.0])
    d = 0.5
    corners = np.array(
        [[sx, sy, sz] for sx in (-d, d) for sy in (-d, d) for sz in (-d, d)]
    ) + c
    edges = [
        (0, 1), (0, 2), (1, 3), (2, 3),
        (4, 5), (4, 6), (5, 7), (6, 7),
        (0, 4), (1, 5), (2, 6), (3, 7),
    ]
    lines = np.asarray([[corners[i], corners[j]] for i, j in edges])
    segs, valid = _project_segments(camera, gravity, lines)
    for (a, b), ok in zip(segs, valid):
        if ok:
            draw_line(out, a, b, color, 2)
    return out


def render_overlays(frame: Array, result: Dict, toggles: Dict[str, bool]) -> Array:
    """Compose the enabled overlays onto a float RGB frame."""
    out = np.asarray(frame, np.float32)
    camera, gravity = result["camera"], result["gravity"]
    if toggles.get("undistort") and float(np.abs(np.asarray(camera.k)).max()) > 0:
        out = undistort_preview(out, camera)
    if toggles.get("confidence") and "latitude_confidence" in result:
        out = overlay_confidence(out, np.asarray(result["latitude_confidence"]))
    if toggles.get("latitude") and "latitude_field" in result:
        out = overlay_latitude(out, np.asarray(result["latitude_field"]))
    if toggles.get("up") and "up_field" in result:
        out = overlay_up_field(out, np.asarray(result["up_field"]))
    if toggles.get("grid"):
        out = overlay_grid(out, camera, gravity)
    if toggles.get("box"):
        out = overlay_box(out, camera, gravity)
    if toggles.get("horizon"):
        out = overlay_horizon(out, camera, gravity)
    return np.clip(out, 0.0, 1.0)
