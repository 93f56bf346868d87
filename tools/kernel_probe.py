#!/usr/bin/env python
"""Correctness + throughput probe of the fused Pallas kernel at a given
block_rows, bypassing the host packing path (device arrays pre-staged) to
isolate pure kernel throughput."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--block-rows", type=int, default=256)
    ap.add_argument("--rows", type=int, default=262144)
    ap.add_argument("--labels", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--wire", default="x", choices=["x", "xy"],
                    help="xy = full64 upload (kernel skips the sqrt)")
    args = ap.parse_args()

    from bench import make_dataset
    from cudasp_tpu.io import ingest
    from cudasp_tpu.ops import kernels as K
    from cudasp_tpu.ops import scalar as S
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.oracle.encoding import blob32_to_scalar, blob64_to_point

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    scan_key = blob32_to_scalar(V.SCAN_KEY_BIP352)
    spend = blob64_to_point(V.SPEND_BIP352)
    tweaks, flat, offsets, is_match = make_dataset(
        args.rows, pool=64, scan_key=scan_key, spend=spend)

    windows, sx, sy, lx, ly, nlabels = ingest.pack_query_keys(
        V.SCAN_KEY_BIP352, V.SPEND_BIP352, [V.LABEL2] * args.labels)
    digits = S.glv_odd_sched(scan_key)

    br = args.block_rows
    batches = list(ingest.iter_packed(tweaks, flat, offsets,
                                      batch_size=args.rows, max_outputs=3,
                                      layout="kernel"))
    b = batches[0]
    planes = K.pack_batch_arrays(b.tweak_blobs, b.row_valid, b.outputs_hi,
                                 b.outputs_lo, b.outputs_valid, br,
                                 wire=args.wire)
    sxq, syq, lxq, lyq = K.pack_query_arrays(sx, sy, lx, ly, br)
    dev = tuple(jnp.asarray(a) for a in planes)
    dq = tuple(jnp.asarray(a) for a in (sxq, syq, lxq, lyq))
    dd = jnp.asarray(np.asarray(digits, np.int32))
    comb = K.comb_table_kernel()

    t0 = time.time()
    flags = K._scan_pallas_call(*dev, dd, *dq, comb, nlabels=nlabels,
                                block_rows=br, wire=args.wire)
    flags.block_until_ready()
    print(f"# compile+first: {time.time()-t0:.1f}s", file=sys.stderr)

    got = np.flatnonzero(np.asarray(flags)[0, :args.rows])
    exp = np.flatnonzero(is_match)
    ok = np.array_equal(got, exp)
    print(f"# correctness: {'OK' if ok else 'MISMATCH'} "
          f"({len(got)} vs {len(exp)})", file=sys.stderr)

    best = 1e9
    for _ in range(args.reps):
        t0 = time.perf_counter()
        flags = K._scan_pallas_call(*dev, dd, *dq, comb, nlabels=nlabels,
                                    block_rows=br, wire=args.wire)
        np.asarray(flags)  # force real sync (block_until_ready lies on axon)
        best = min(best, time.perf_counter() - t0)
    n = dev[0].shape[1]
    print(f"block_rows={br} rows={n} kernel={best*1e3:.1f}ms "
          f"-> {n/best:,.0f} tx/s ok={ok}")


if __name__ == "__main__":
    main()
