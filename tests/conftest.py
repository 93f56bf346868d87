"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised by bench.py and the driver's compile checks;
the test suite validates correctness + sharding on host CPU.
"""

import os

# Must be set before jax is imported anywhere.
os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
