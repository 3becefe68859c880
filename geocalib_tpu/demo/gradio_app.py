"""Gradio web demo (optional; parity with /root/reference/gradio_app.py).

Requires `pip install gradio` — gated import so the core package stays
dependency-free. Mirrors the reference app: camera-model dropdown,
field/confidence overlays, undistorted preview.

    python -m geocalib_tpu.demo.gradio_app --weights params.msgpack
"""

import argparse

import numpy as np


def build_app(weights=None, variant: str = "b"):
    try:
        import gradio as gr
    except ImportError as e:
        raise RuntimeError("the web demo requires `pip install gradio`") from e

    import jax.numpy as jnp

    from geocalib_tpu.demo.demo import annotate, print_calibration
    from geocalib_tpu.extractor import GeoCalib

    calib = GeoCalib(weights=weights, variant=variant)

    def inference(img, camera_model, show_up, show_lat, undistort):
        import math

        image = np.asarray(img, np.float32) / 255.0
        result = calib.calibrate(image, camera_model=camera_model)
        show = ["horizon"] + (["up"] if show_up else []) + (
            ["latitude"] if show_lat else []
        )
        overlay = annotate(image, result, show=show)
        cam = result["camera"]
        text = (
            f"roll {math.degrees(float(result['gravity'].roll)):.1f}°  "
            f"pitch {math.degrees(float(result['gravity'].pitch)):.1f}°  "
            f"vfov {math.degrees(float(cam.vfov)):.1f}°  "
            f"focal {float(cam.f[1]):.1f}px"
        )
        if undistort and camera_model != "pinhole":
            import jax

            und = cam.undistort_image(jnp.asarray(image)[None])[0]
            overlay = (np.asarray(und) * 255).astype(np.uint8)
        return overlay, text

    demo = gr.Interface(
        fn=inference,
        inputs=[
            gr.Image(label="image"),
            gr.Dropdown(
                ["pinhole", "simple_radial", "radial", "simple_divisional"],
                value="pinhole",
                label="camera model",
            ),
            gr.Checkbox(True, label="show up field"),
            gr.Checkbox(True, label="show latitude"),
            gr.Checkbox(False, label="undistort"),
        ],
        outputs=[gr.Image(label="calibration"), gr.Textbox(label="estimate")],
        title="GeoCalib-TPU",
    )
    return demo


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--variant", default="b")
    ap.add_argument("--port", type=int, default=7860)
    args = ap.parse_args()
    build_app(args.weights, args.variant).launch(server_port=args.port)


if __name__ == "__main__":
    main()
