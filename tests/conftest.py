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


def pytest_terminal_summary(terminalreporter, exitstatus, config):
    """Always print the skip list, and (gate-rot guard, VERDICT r4 weak
    #7) assert it matches tests/expected_skips.txt when
    CUDASP_ASSERT_SKIPS=1 — CI sets it for the default CPU job, so a
    wrongly-widened hardware/slow gate turns the build red instead of
    silently shrinking coverage. Update the file when a gate legitimately
    changes: pytest -q 2>/dev/null | true; see the file header."""
    skipped = terminalreporter.stats.get("skipped", [])
    ids = sorted({rep.nodeid for rep in skipped})
    tw = terminalreporter
    if ids:
        tw.write_sep("-", f"{len(ids)} skipped tests")
        for nid in ids:
            tw.write_line(f"  SKIPPED {nid}")
    if os.environ.get("CUDASP_ASSERT_SKIPS") != "1":
        return
    exp_path = os.path.join(os.path.dirname(__file__),
                            "expected_skips.txt")
    try:
        with open(exp_path) as f:
            expected = sorted(ln.strip() for ln in f
                              if ln.strip() and not ln.startswith("#"))
    except OSError:
        expected = []
    # only meaningful for full-suite runs: a -k / path-filtered invocation
    # legitimately collects a subset
    if config.args and set(config.args) - {"tests", "tests/", "."}:
        return
    if ids != expected:
        extra = [i for i in ids if i not in expected]
        missing = [i for i in expected if i not in ids]
        tw.write_sep("=", "SKIP SET DRIFT (CUDASP_ASSERT_SKIPS)")
        for i in extra:
            tw.write_line(f"  unexpected skip: {i}")
        for i in missing:
            tw.write_line(f"  expected skip ran/vanished: {i}")
        tw.write_line("  update tests/expected_skips.txt if intentional")
        import pytest as _pytest

        raise _pytest.UsageError(
            f"skip set drift: +{len(extra)} / -{len(missing)} "
            f"vs tests/expected_skips.txt")
