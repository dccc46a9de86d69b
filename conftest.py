"""Pytest config: force JAX onto a virtual 8-device CPU mesh for all tests.

The container's sitecustomize registers the axon TPU plugin and pins
jax_platforms=axon programmatically, so env vars alone don't stick —
override via jax.config before any backend is initialized. Real-TPU
benchmarking happens in bench.py only.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

try:
    import jax

    jax.config.update("jax_platforms", "cpu")
except ImportError:  # pragma: no cover
    pass
