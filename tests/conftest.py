"""Test configuration: force an 8-device virtual CPU mesh.

Tests never touch the real TPU; multi-device sharding is exercised on
virtual CPU devices via XLA_FLAGS (the reference has no equivalent —
see SURVEY.md §4).
"""

import os

# The sandbox's sitecustomize force-registers a remote TPU backend whenever
# PALLAS_AXON_POOL_IPS is set; clearing it (plus JAX_PLATFORMS) is required
# for tests to actually run on local CPU devices.
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon register() call in sitecustomize sets jax_platforms="axon,cpu"
# via jax.config, which wins over the env var — force it back to cpu before
# any backend is initialized.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
# persistent compile cache: the training-step compiles dominate suite time
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
