"""True multi-process distributed scan: two OS processes, jax.distributed
over a localhost coordinator, hash-partitioned table, process_allgather
merge — the deployment shape of parallel.distributed.multihost_scan
(single-process simulations live in test_distributed.py).

Gated behind CUDASP_SLOW_TESTS: spawning two JAX processes and compiling
per process takes minutes cold."""

import os
import socket
import subprocess
import sys

import pytest

_SLOW = pytest.mark.skipif(
    not os.environ.get("CUDASP_SLOW_TESTS"),
    reason="two-process jax.distributed run takes minutes cold; "
           "set CUDASP_SLOW_TESTS=1")

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = ("--xla_force_host_platform_device_count=2 "
                           "--xla_cpu_use_fusion_emitters=false")
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/cudasp_jax_cache")
pid, n, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

from cudasp_tpu.parallel import distributed as D
D.init(coordinator_address=f"localhost:{port}", num_processes=n,
       process_id=pid)
assert jax.process_count() == n

from cudasp_tpu.oracle import vectors as V
case = V.CASES[0]
rows = case.rows * 8                         # 16 rows across 2 hosts
table = {
    "txid": [bytes([i]) * 32 for i in range(len(rows))],
    "height": [r.height for r in rows],
    "tweak_key": [r.tweak_blob for r in rows],
    "outputs": [list(r.outputs) for r in rows],
}
matches = D.multihost_scan(table, case.scan_key_blob, case.spend_blob,
                           case.label_blobs or [])
expect = sorted(i for i, r in enumerate(rows)
                if r.height in case.expected_heights)
got = sorted(int(i) for i in matches)
print(f"proc{pid}: {'OK' if got == expect else f'FAIL {got} != {expect}'}",
      flush=True)
assert got == expect
"""


@_SLOW
def test_two_process_multihost_scan(tmp_path):
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = str(s.getsockname()[1])
    env = dict(os.environ, PYTHONPATH=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(pid), "2", port],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in range(2)]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err[-2000:]}"
        assert "OK" in out
