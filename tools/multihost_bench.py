#!/usr/bin/env python
"""Multi-host scaling benchmark — BASELINE.md configs 3-5, runnable the
day a real >=2-host TPU slice appears (VERDICT r3 item 7).

One command per host (same dataset args everywhere):

    # host 0 (coordinator)
    python tools/multihost_bench.py --coordinator host0:8476 \
        --num-hosts 2 --host-id 0 --rows 32700000
    # host 1
    python tools/multihost_bench.py --coordinator host0:8476 \
        --num-hosts 2 --host-id 1 --rows 32700000

Each host generates ONLY its hash-partition of the synthetic table
(deterministic from the seed — no table distribution needed), scans it on
its local chips through parallel.distributed.multihost_scan, and host 0
prints the aggregate JSON line:

    {"metric": "multihost_scan_throughput", "hosts": N, "value": tx/s,
     "efficiency_vs_1host": ...}

Efficiency is computed against a --one-host-txs reference (run this
script with --num-hosts 1 first). BASELINE target: >=85% at 2 hosts (the
reference: 58% at 2 GPUs, /root/reference/README.md:139-140).

Single-process smoke (CI / no hardware):
    python tools/multihost_bench.py --rows 20000 --platform cpu
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--coordinator", default=None,
                    help="host0:port of the jax.distributed coordinator")
    ap.add_argument("--num-hosts", type=int, default=1)
    ap.add_argument("--host-id", type=int, default=0)
    ap.add_argument("--rows", type=int, default=32_700_000)
    ap.add_argument("--batch-size", type=int, default=524_288)
    ap.add_argument("--pool", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--one-host-txs", type=float, default=None,
                    help="single-host tx/s for the efficiency column")
    ap.add_argument("--platform", default=None)
    args = ap.parse_args()

    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        if args.platform == "cpu":
            flags = os.environ.get("XLA_FLAGS", "")
            if "fusion_emitters" not in flags:
                os.environ["XLA_FLAGS"] = (
                    flags + " --xla_cpu_use_fusion_emitters=false").strip()
    import jax

    from cudasp_tpu.runtime import compile_cache

    compile_cache.ensure()

    from bench import make_dataset
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.oracle.encoding import blob32_to_scalar, blob64_to_point
    from cudasp_tpu.parallel import distributed as D

    D.init(coordinator_address=args.coordinator,
           num_processes=args.num_hosts, process_id=args.host_id)
    pid, nproc = D.host_info()
    print(f"# host {pid}/{nproc} devices: {jax.local_devices()}",
          file=sys.stderr)

    scan_key = blob32_to_scalar(V.SCAN_KEY_BIP352)
    spend = blob64_to_point(V.SPEND_BIP352)
    t0 = time.time()
    # every host generates the same global dataset deterministically;
    # multihost_scan keeps only this host's partition (in production each
    # host would READ only its partition — same routing either way)
    tweaks, flat, offsets, is_match = make_dataset(
        args.rows, pool=args.pool, scan_key=scan_key, spend=spend)
    table = {"tweak_key": tweaks, "outputs": (flat, offsets)}
    print(f"# dataset gen: {time.time()-t0:.1f}s", file=sys.stderr)

    from cudasp_tpu.api import ScanConfig

    cfg = ScanConfig(batch_size=args.batch_size)
    times = []
    for _ in range(args.repeats):
        t0 = time.time()
        idx = D.multihost_scan(table, V.SCAN_KEY_BIP352, V.SPEND_BIP352,
                               (), config=cfg)
        dt = time.time() - t0
        times.append(dt)
        print(f"# run: {dt:.2f}s global_matches={len(idx)}",
              file=sys.stderr)
    best = min(times)
    if pid == 0:
        txs = args.rows / best
        out = {"metric": "multihost_scan_throughput", "hosts": nproc,
               "value": round(txs, 1), "unit": "tx/s",
               "rows": args.rows, "seconds": round(best, 3)}
        if args.one_host_txs:
            out["efficiency_vs_1host"] = round(
                txs / (args.one_host_txs * nproc), 3)
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
