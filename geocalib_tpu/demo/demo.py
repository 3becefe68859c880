"""Calibration demo: annotate images with horizon/up/latitude overlays.

Re-design of /root/reference/geocalib/interactive_demo.py (OpenCV webcam
loop with overlay toggles) for headless environments: processes single
images, directories, or a webcam when OpenCV is present, writing annotated
outputs + printed calibration reports.

CLI:
    python -m geocalib_tpu.demo.demo path/to/img.jpg --out annotated.jpg
    python -m geocalib_tpu.demo.demo path/to/dir --out out_dir --camera_model simple_radial
"""

import argparse
import math
from pathlib import Path

import numpy as np


def print_calibration(result) -> None:
    """Console report (parity: geocalib/utils.py:312-325)."""
    cam, grav = result["camera"], result["gravity"]
    print("\nEstimated parameters (Pred):")
    print(
        f"Roll:  {math.degrees(float(grav.roll)):.1f}° "
        f"(± {math.degrees(float(result.get('roll_uncertainty', 0.0))):.1f})°"
    )
    print(
        f"Pitch: {math.degrees(float(grav.pitch)):.1f}° "
        f"(± {math.degrees(float(result.get('pitch_uncertainty', 0.0))):.1f})°"
    )
    print(
        f"vFoV:  {math.degrees(float(cam.vfov)):.1f}° "
        f"(± {math.degrees(float(result.get('vfov_uncertainty', 0.0))):.1f})°"
    )
    print(
        f"Focal: {float(cam.f[1]):.1f} px "
        f"(± {float(result.get('focal_uncertainty', 0.0)):.1f})"
    )
    if float(np.abs(np.asarray(cam.k)).max()) > 0:
        print(f"K1:    {float(cam.k[0]):.2f}")


def annotate(image: np.ndarray, result, show=("horizon", "up", "latitude")) -> np.ndarray:
    """Render overlays into a figure and return it as an RGB array."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from geocalib_tpu.visualization.viz2d import (
        plot_horizon_lines,
        plot_images,
        plot_latitudes,
        plot_vector_fields,
    )
    import jax

    fig, axs = plot_images([image])
    cam = jax.tree.map(lambda x: np.asarray(x)[None], result["camera"])
    grav = jax.tree.map(lambda x: np.asarray(x)[None], result["gravity"])
    if "up" in show:
        plot_vector_fields(axs, [np.asarray(result["up_field"])])
    if "latitude" in show:
        plot_latitudes(axs, [np.asarray(result["latitude_field"])])
    if "horizon" in show:
        plot_horizon_lines(axs, cam, grav)
    fig.canvas.draw()
    buf = np.asarray(fig.canvas.buffer_rgba())[..., :3].copy()
    plt.close(fig)
    return buf


def run_webcam(calibrator, camera_id: int = 0) -> None:
    """Live webcam loop when OpenCV is available (reference demo parity)."""
    try:
        import cv2
    except ImportError as e:
        raise RuntimeError(
            "webcam mode needs opencv-python; use image/directory mode instead"
        ) from e
    cap = cv2.VideoCapture(camera_id)
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        rgb = frame[..., ::-1].astype(np.float32) / 255.0
        result = calibrator.calibrate(rgb)
        overlay = annotate(rgb, result)
        cv2.imshow("geocalib_tpu", overlay[..., ::-1])
        if cv2.waitKey(1) & 0xFF in (ord("q"), 27):
            break
    cap.release()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("path", help="image file, directory, or 'webcam'")
    ap.add_argument("--out", default=None, help="output file or directory")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--camera_model", default="pinhole")
    ap.add_argument("--variant", default="b")
    args = ap.parse_args()

    from geocalib_tpu.extractor import GeoCalib
    from geocalib_tpu.utils.image import load_image, write_image

    calib = GeoCalib(weights=args.weights, variant=args.variant)

    if args.path == "webcam":
        run_webcam(calib)
        return

    src = Path(args.path)
    paths = (
        sorted(p for p in src.iterdir() if p.suffix.lower() in (".jpg", ".png", ".jpeg"))
        if src.is_dir()
        else [src]
    )
    for p in paths:
        img = load_image(p)
        result = calib.calibrate(img, camera_model=args.camera_model)
        print(f"\n=== {p.name} ===")
        print_calibration(result)
        if args.out:
            out = Path(args.out)
            dst = out / f"{p.stem}_annotated.jpg" if src.is_dir() else out
            dst.parent.mkdir(parents=True, exist_ok=True)
            write_image(annotate(img, result) / 255.0, dst)
            print(f"annotated -> {dst}")


if __name__ == "__main__":
    main()
