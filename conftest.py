"""Pytest config: force JAX onto a virtual 8-device CPU mesh for all tests.

Real-TPU benchmarking happens in bench.py, never in tests. Multi-chip sharding
is validated on the virtual CPU mesh (mirrors the driver's dryrun_multichip).
"""

import os

# Must run before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
