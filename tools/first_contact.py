#!/usr/bin/env python
"""First contact with a new device kind (VERDICT r4 item 5): ONE command
that takes a box from clean caches to a tuned, AOT-seeded, bench-ready
state — so the first v5p session spends minutes, not its first hour
compiling 11 kernel variants serially inside a timed scan.

    python tools/first_contact.py                # full bootstrap
    python tools/first_contact.py --quick        # reduced sweep
    python tools/first_contact.py --skip-autotune  # keep existing tuning

Stages (each a subprocess; a failure stops the chain loudly):
  1. tools/autotune.py      — block_rows x VMEM sweep, writes the
                              tuning_<kind>.json row runtime/tuning.py
                              resolves ahead of the built-in table
                              (whose v5p/v6 rows are placeholders).
  2. tools/seed_cache.py    — compiles + serializes every production
                              kernel variant into the committed AOT store
                              (incl. the bench key's static-ladder
                              variants) and the XLA seed dir.
  3. bench.py smoke         — a 1M-row end-to-end run from the warm
                              caches: proves the seeded state actually
                              serves a scan, and records the first curve
                              point for the new kind.

The total wall time is printed at the end; the v5e rehearsal (r5) is
recorded in ROADMAP.md for comparison.
"""

import argparse
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_stage(name, cmd, env=None):
    print(f"\n=== {name}: {' '.join(cmd)}", flush=True)
    t0 = time.time()
    proc = subprocess.run(cmd, cwd=ROOT, env=env)
    dt = time.time() - t0
    print(f"=== {name} done in {dt:.0f}s (exit {proc.returncode})",
          flush=True)
    if proc.returncode != 0:
        print(f"first_contact: stage '{name}' failed — fix it and re-run "
              f"(completed stages are idempotent and will be skipped/fast)",
              file=sys.stderr)
        sys.exit(proc.returncode)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="reduced autotune sweep (512/640/768 only)")
    ap.add_argument("--skip-autotune", action="store_true",
                    help="keep the existing tuning row")
    ap.add_argument("--skip-bench", action="store_true",
                    help="skip the 1M-row smoke run")
    ap.add_argument("--bench-rows", type=int, default=1_000_000)
    args = ap.parse_args()

    sys.path.insert(0, ROOT)
    from cudasp_tpu.runtime import tuning

    kind = tuning.device_kind()
    print(f"# first contact: device kind = {kind}")
    t_start = time.time()
    timings = {}

    if not args.skip_autotune:
        cmd = [sys.executable, os.path.join(ROOT, "tools", "autotune.py")]
        if args.quick:
            cmd += ["--block-rows", "512,640,768"]
        timings["autotune"] = run_stage("autotune", cmd)

    timings["seed_cache"] = run_stage(
        "seed_cache",
        [sys.executable, os.path.join(ROOT, "tools", "seed_cache.py")])

    if not args.skip_bench:
        timings["bench_smoke"] = run_stage(
            "bench_smoke",
            [sys.executable, os.path.join(ROOT, "bench.py"),
             "--rows", str(args.bench_rows), "--repeats", "2"])

    total = time.time() - t_start
    print(f"\n# first_contact complete on '{kind}' in {total:.0f}s "
          f"({json.dumps({k: round(v) for k, v in timings.items()})})")
    print("# commit cudasp_tpu/_cache/ additions to ship the seeded state")
    return 0


if __name__ == "__main__":
    sys.exit(main())
