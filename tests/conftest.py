"""Test configuration: run everything on a virtual 8-device CPU mesh.

Real TPU hardware is exercised by bench.py and the driver's compile checks;
the test suite validates correctness + sharding on host CPU.

Note: this environment's sitecustomize registers the 'axon' TPU platform at
interpreter startup (and may import jax machinery), so setting JAX_PLATFORMS
via the environment is unreliable — we force the platform through
jax.config, which works post-import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags += " --xla_force_host_platform_device_count=8"
# The new XLA:CPU fusion emitters deadlock (0% CPU, block_until_ready never
# returns) on this code's deep int32 dependency chains; the legacy emitters
# are fine. TPU is unaffected.
if "xla_cpu_use_fusion_emitters" not in flags:
    flags += " --xla_cpu_use_fusion_emitters=false"
os.environ["XLA_FLAGS"] = flags.strip()
# CUDASP_TEST_PLATFORM=tpu (or axon) runs the hardware-gated tests (e.g.
# test_pallas_golden_parity_tpu) on the real chip instead of skipping.
_platform = os.environ.get("CUDASP_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
# Persistent compilation cache: the limb-arithmetic graphs are large; this
# makes repeat test runs start in seconds instead of minutes.
jax.config.update("jax_compilation_cache_dir", "/tmp/cudasp_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
