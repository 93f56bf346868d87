#!/usr/bin/env python
"""One-command device autotune: sweep the fused kernel's tunables on the
attached device kind and persist the winners (VERDICT r3 item 6).

    python tools/autotune.py                 # full sweep, writes the row
    python tools/autotune.py --dry-run       # sweep, print, don't write

Writes cudasp_tpu/_cache/tuning_<kind>.json, which runtime/tuning.py
resolves ahead of the built-in table — so first contact with a v5p (or
any new kind) needs exactly this one command to replace the v5e-measured
placeholders. The sweep measures the device-resident kernel only (the
stable number; host/link effects excluded) on random planes — stage costs
are data-independent.
"""

import argparse
import itertools
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BLOCK_ROWS = [256, 384, 512, 640, 768, 896, 1024]
VMEM_MB = [100, 128]


def one_run(args):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cudasp_tpu.io import ingest
    from cudasp_tpu.ops import kernels as K
    from cudasp_tpu.ops import scalar as S
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.oracle.encoding import blob32_to_scalar

    br = args.one_block_rows
    n = (args.rows // br) * br
    rng = np.random.default_rng(0)
    tw = rng.integers(0, 2**32, size=(8, n), dtype=np.uint32)
    oh = rng.integers(0, 2**32, size=(3, n), dtype=np.uint32)
    ol = rng.integers(0, 2**32, size=(3, n), dtype=np.uint32)
    ovm = np.full((1, n), (1 << 31) | 7, np.uint32)
    windows, sx, sy, lx, ly, nlabels = ingest.pack_query_keys(
        V.SCAN_KEY_BIP352, V.SPEND_BIP352, [])
    digits = jnp.asarray(np.asarray(
        S.glv_odd_sched(blob32_to_scalar(V.SCAN_KEY_BIP352)), np.int32))
    dev = tuple(jnp.asarray(a) for a in (tw, oh, ol, ovm))
    dq = tuple(jnp.asarray(a) for a in
               K.pack_query_arrays(sx, sy, lx, ly, br))
    comb = K.comb_table_kernel()

    def run():
        f = K._scan_pallas_call(*dev, digits, *dq, comb, nlabels=0,
                                block_rows=br)
        np.asarray(f)

    try:
        run()
    except Exception as e:                         # noqa: BLE001
        print(json.dumps({"error": f"{type(e).__name__}"}))
        return
    best = 1e9
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"block_rows": br, "ms": round(best * 1e3, 2),
                      "rows": n, "rows_per_s": round(n / best)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--block-rows", default=None,
                    help="comma list to sweep (default built-in set)")
    ap.add_argument("--one-block-rows", type=int, default=None,
                    help="internal: one configuration in-process")
    args = ap.parse_args()
    if args.one_block_rows is not None:
        return one_run(args)

    from cudasp_tpu.runtime import tuning

    kind = tuning.device_kind()
    print(f"# device kind: {kind}", file=sys.stderr)
    brs = ([int(v) for v in args.block_rows.split(",")]
           if args.block_rows else BLOCK_ROWS)
    results = []
    for br, vmem in itertools.product(brs, VMEM_MB):
        env = dict(os.environ)
        env["CUDASP_VMEM_MB"] = str(vmem)
        env.setdefault("JAX_COMPILATION_CACHE_DIR",
                       os.path.expanduser(
                           "~/.cache/cudasp_tpu/jax-cache"))
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
        cmd = [sys.executable, os.path.abspath(__file__),
               "--one-block-rows", str(br), "--rows", str(args.rows),
               "--reps", str(args.reps)]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True)
        lines = [ln for ln in out.stdout.splitlines()
                 if ln.startswith("{")]
        if not lines:
            print(f"br={br} vmem={vmem}: FAILED", file=sys.stderr)
            continue
        r = json.loads(lines[-1])
        if "error" in r:
            print(f"br={br} vmem={vmem}: {r['error']} (skipped)",
                  file=sys.stderr)
            continue
        r["vmem_mb"] = vmem
        results.append(r)
        print(f"br={br:5d} vmem={vmem:4d}MB  {r['ms']:8.1f} ms  "
              f"{r['rows_per_s']:>9,} rows/s", flush=True)
    if not results:
        print("no successful configurations", file=sys.stderr)
        return 1
    best = max(results, key=lambda r: r["rows_per_s"])
    print(f"\nbest: block_rows={best['block_rows']} "
          f"vmem={best['vmem_mb']}MB ({best['rows_per_s']:,} rows/s)")
    if not args.dry_run:
        path = tuning.save_autotuned(kind, best["block_rows"],
                                     tile=524288,
                                     vmem_limit_mb=best["vmem_mb"])
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
