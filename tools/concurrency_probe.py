#!/usr/bin/env python
"""Multi-tenant probe: N concurrent scan() queries (threads) vs serial.

The reference claims concurrent multi-user scanning (README.md:11-12) via
per-thread GPU state; here scans are pure functions sharing compiled
executables, so concurrency is free of locking — this probe measures
whether interleaving two queries recovers any idle device/tunnel time
(aggregate tx/s vs one query at a time)."""

import argparse
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=500_000)
    ap.add_argument("--tenants", type=int, default=2)
    args = ap.parse_args()

    import jax

    from bench import make_dataset
    from cudasp_tpu import scan
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.oracle.encoding import blob32_to_scalar, blob64_to_point

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    scan_key = blob32_to_scalar(V.SCAN_KEY_BIP352)
    spend = blob64_to_point(V.SPEND_BIP352)
    tweaks, flat, offsets, is_match = make_dataset(
        args.rows, pool=128, scan_key=scan_key, spend=spend)
    table = {"tweak_key": tweaks, "outputs": (flat, offsets)}
    expect = np.flatnonzero(is_match)

    errors = []

    def one():
        try:
            res = scan(table, V.SCAN_KEY_BIP352, V.SPEND_BIP352, [])
            assert np.array_equal(np.asarray(res.indices), expect)
        except BaseException as e:            # noqa: BLE001
            errors.append(e)
            raise

    one()                                     # warm (compile)
    t0 = time.perf_counter()
    one()
    serial = time.perf_counter() - t0
    print(f"single query: {serial:.2f}s  {args.rows/serial:,.0f} tx/s")

    t0 = time.perf_counter()
    ths = [threading.Thread(target=one) for _ in range(args.tenants)]
    for t in ths:
        t.start()
    for t in ths:
        t.join()
    conc = time.perf_counter() - t0
    if errors:
        raise SystemExit(f"tenant scan failed/inexact: {errors[0]!r}")
    agg = args.tenants * args.rows / conc
    print(f"{args.tenants} concurrent: {conc:.2f}s  {agg:,.0f} tx/s aggregate "
          f"({agg/(args.rows/serial):.2f}x single)")


if __name__ == "__main__":
    main()
