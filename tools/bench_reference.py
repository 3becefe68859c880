"""Measure the reference (cvg/GeoCalib, PyTorch) pipeline on host CPU.

Produces the REFERENCE_CPU_IMG_PER_S constant used by bench.py. The
reference's GPU path cannot run here (no CUDA) and it cannot run on TPU at
all; CPU is the only surface both frameworks share in this environment.

Usage: python tools/bench_reference.py
"""

import sys
import time
import types

sys.path.insert(0, "/root/reference")
# stub the visualization-only deps the reference imports at module level
for mod in ["kornia", "torchvision", "cv2", "matplotlib", "matplotlib.pyplot",
            "matplotlib.cm"]:
    sys.modules.setdefault(mod, types.ModuleType(mod))

import torch  # noqa: E402

B, H, W = 16, 320, 320
N_ITERS = 3


def main():
    from geocalib.geocalib import GeoCalib

    torch.set_grad_enabled(False)
    model = GeoCalib().eval()
    img = torch.rand(B, 3, H, W)

    data = {"image": img}
    model(data)  # warmup
    t0 = time.time()
    for _ in range(N_ITERS):
        model(data)
    dt = (time.time() - t0) / N_ITERS
    print(f"reference torch CPU: {dt*1000:.0f} ms/batch -> {B/dt:.3f} images/s")


if __name__ == "__main__":
    main()
