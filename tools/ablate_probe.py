#!/usr/bin/env python
"""Per-stage kernel attribution by subtractive ablation.

Runs the fused kernel with CUDASP_ABLATE=<stage> (ops/kernels._ABLATE)
replacing one stage's work with a cheap shape-preserving stand-in, in a
fresh subprocess per stage (the knob is read at import). Stage cost =
base_time - ablated_time. Ablated kernels return garbage flags — this is
a timing instrument only; correctness is pinned by tests/ and
tools/kernel_probe.py.

Usage: python tools/ablate_probe.py [--block-rows 640] [--rows 524288]
       python tools/ablate_probe.py --one ""        # (internal) one run
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ["", "sqrt", "table", "ladder", "serialize", "hash", "comb",
          "match"]


def one_run(args):
    import numpy as np
    import jax
    import jax.numpy as jnp

    from cudasp_tpu.io import ingest
    from cudasp_tpu.ops import kernels as K
    from cudasp_tpu.ops import scalar as S
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.oracle.encoding import blob32_to_scalar

    br = args.block_rows
    n = (args.rows // br) * br
    rng = np.random.default_rng(0)
    # random planes: ablated kernels compute garbage anyway, and every
    # stage's cost is data-independent (no per-lane branches)
    tw = rng.integers(0, 2**32, size=(8, n), dtype=np.uint32)
    oh = rng.integers(0, 2**32, size=(3, n), dtype=np.uint32)
    ol = rng.integers(0, 2**32, size=(3, n), dtype=np.uint32)
    ovm = np.full((1, n), (1 << 31) | 7, np.uint32)
    windows, sx, sy, lx, ly, nlabels = ingest.pack_query_keys(
        V.SCAN_KEY_BIP352, V.SPEND_BIP352, [V.LABEL2] * args.labels)
    digits = jnp.asarray(np.asarray(
        S.glv_odd_sched(blob32_to_scalar(V.SCAN_KEY_BIP352)), np.int32))
    dev = tuple(jnp.asarray(a) for a in (tw, oh, ol, ovm))
    dq = tuple(jnp.asarray(a) for a in
               K.pack_query_arrays(sx, sy, lx, ly, br))
    comb = K.comb_table_kernel()

    def run():
        f = K._scan_pallas_call(*dev, digits, *dq, comb, nlabels=nlabels,
                                block_rows=br)
        np.asarray(f)          # force sync (block_until_ready lies on axon)

    t0 = time.time()
    run()
    compile_s = time.time() - t0
    best = 1e9
    for _ in range(args.reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"ablate": os.environ.get("CUDASP_ABLATE", ""),
                      "ms": round(best * 1e3, 2), "rows": n,
                      "compile_s": round(compile_s, 1)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-rows", type=int, default=640)
    ap.add_argument("--rows", type=int, default=524288)
    ap.add_argument("--labels", type=int, default=0)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--one", default=None,
                    help="internal: run one ablation in-process")
    ap.add_argument("--stages", default=None,
                    help="comma list; default all")
    args = ap.parse_args()
    if args.one is not None:
        return one_run(args)

    stages = (args.stages.split(",") if args.stages is not None
              else STAGES)
    results = {}
    for st in stages:
        env = dict(os.environ)
        env["CUDASP_ABLATE"] = st
        env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/cudasp_jax_cache")
        env.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")
        cmd = [sys.executable, os.path.abspath(__file__), "--one", st,
               "--block-rows", str(args.block_rows),
               "--rows", str(args.rows), "--labels", str(args.labels),
               "--reps", str(args.reps)]
        out = subprocess.run(cmd, env=env, capture_output=True, text=True)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not line:
            print(f"{st or 'base':10s} FAILED:\n{out.stderr[-2000:]}",
                  file=sys.stderr)
            continue
        r = json.loads(line[-1])
        results[st] = r["ms"]
        print(f"{st or 'base':10s} {r['ms']:8.1f} ms "
              f"(compile {r['compile_s']:.0f}s)", flush=True)
    base = results.get("")
    if base:
        print(f"\nstage attribution (base {base:.1f} ms / "
              f"{args.rows} rows -> {args.rows/base*1e3:,.0f} rows/s):")
        for st, ms in results.items():
            if st:
                print(f"  {st:10s} {base - ms:8.1f} ms "
                      f"({(base - ms) / base * 100:5.1f}%)")


if __name__ == "__main__":
    main()
