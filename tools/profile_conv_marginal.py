"""Marginal (in-jit) cost of conv formulations: chain K convs inside one jit.

Single-op microbenches through the remote relay are floored by ~3 ms of
per-call overhead; chaining K dependent convs inside one executable and
differencing K=21 vs K=1 isolates the true per-conv cost.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

B, H, W = 16, 320, 320
N = 10


def timeit(fn, *args):
    np.asarray(fn(*args))
    t0 = time.time()
    outs = [fn(*args) for _ in range(N)]
    np.asarray(outs[-1])
    return (time.time() - t0) / N * 1e3


def conv(x, k, pad, groups=1):
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )


def chain(reps, pad, groups=1):
    @jax.jit
    def f(x, k):
        def body(c, _):
            return conv(c, k, pad, groups), None
        out, _ = jax.lax.scan(body, x, None, length=reps)
        return jnp.sum(out.astype(jnp.float32))
    return f


def marginal(cin, cout, ksize, hw, pad, groups=1, label=""):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, hw, hw, cin), jnp.bfloat16)
    k = jax.random.normal(key, (ksize, ksize, cin // groups, cout), jnp.bfloat16) * 0.05
    t1 = timeit(chain(1, pad, groups), x, k)
    t21 = timeit(chain(21, pad, groups), x, k)
    dt = (t21 - t1) / 20
    gfl = B * hw * hw * ksize * ksize * (cin // groups) * cout * 2 / 1e9
    print(f"{label or f'conv{ksize}x{ksize} {cin}->{cout} @{hw}'}: "
          f"{dt:.3f} ms/conv  ({gfl/dt:.0f} GFLOP/ms = {gfl/dt:.0f}e9*1e3 FLOPs/s)")
    return dt


def main():
    p1 = ((1, 1), (1, 1))
    marginal(64, 64, 3, 320, p1)
    marginal(128, 128, 3, 320, p1)
    marginal(256, 256, 2, 160, ((1, 0), (1, 0)), label="conv2x2 s2d 256->256 @160")
    marginal(128, 128, 3, 320, p1, groups=2, label="conv3x3 grouped 2x(64->64) @320")
    marginal(512, 512, 1, 80, ((0, 0), (0, 0)), label="conv1x1 512->512 @80")


if __name__ == "__main__":
    main()
