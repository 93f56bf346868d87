#!/usr/bin/env python
"""Separate the scan's wall time into H2D upload vs kernel compute.

The axon remote-TPU tunnel adds a large per-call constant and may cap
host->device bandwidth; this probe times (a) pure device_put of one
batch's planes, (b) the fused kernel on device-resident data, (c) fused
kernel re-dispatch (cached args). All timings force completion with a
D2H copy of a tiny slice (block_until_ready does not block on axon).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def force(x):
    if isinstance(x, (list, tuple)):
        for v in x:
            np.asarray(v)
    else:
        np.asarray(x)


def main():
    import jax
    import jax.numpy as jnp

    from cudasp_tpu.io import ingest
    from cudasp_tpu.ops import kernels as K
    from cudasp_tpu.oracle import vectors as V

    B = 262144
    M = 3
    rows = V.CASES[0].rows
    blobs = np.tile(np.frombuffer(rows[0].tweak_blob, np.uint8), (B, 1))
    rng = np.random.default_rng(0)
    oh = rng.integers(0, 2**31, (B, M)).astype(np.int32)
    ol = rng.integers(0, 2**31, (B, M)).astype(np.int32)
    ov = np.ones((B, M), bool)
    rv = np.ones(B, bool)

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    planes = K.pack_batch_arrays(blobs, rv, oh, ol, ov, 512)
    nbytes = sum(a.nbytes for a in planes)
    print(f"# batch planes: {nbytes/1e6:.1f} MB for {B} rows "
          f"({nbytes/B:.0f} B/row)")

    # --- pure upload
    for _ in range(3):
        t0 = time.perf_counter()
        dev = tuple(jax.device_put(a) for a in planes)
        force(tuple(d[:1, :8] for d in dev))
        dt = time.perf_counter() - t0
        print(f"upload: {dt*1e3:8.1f} ms  {nbytes/dt/1e6:8.1f} MB/s")

    # --- concurrent uploads: does the tunnel scale with parallel streams?
    import threading

    for nthreads in (2, 4):
        halves = []
        per = B // nthreads
        for t in range(nthreads):
            blk = tuple(np.ascontiguousarray(a[:, t * per:(t + 1) * per])
                        for a in planes)
            halves.append(blk)
        out = [None] * nthreads

        def up(t):
            out[t] = tuple(jax.device_put(a) for a in halves[t])

        t0 = time.perf_counter()
        ths = [threading.Thread(target=up, args=(t,)) for t in range(nthreads)]
        for th in ths:
            th.start()
        for th in ths:
            th.join()
        for t in range(nthreads):
            force(tuple(d[:1, :8] for d in out[t]))
        dt = time.perf_counter() - t0
        print(f"upload x{nthreads} threads: {dt*1e3:8.1f} ms  "
              f"{nbytes/dt/1e6:8.1f} MB/s")

    # --- kernel on resident data
    w, sx, sy, lx, ly, nl = ingest.pack_query_keys(
        V.CASES[0].scan_key_blob, V.CASES[0].spend_blob, [])
    digits = jnp.asarray(np.asarray(w.odd, np.int32))
    sxd, syd, lxd, lyd = (jnp.asarray(a) for a in K.pack_query_arrays(
        sx, sy, lx, ly, 512))
    comb = K.comb_table_kernel()

    def run():
        return K._scan_pallas_call(*dev, digits, sxd, syd, lxd, lyd, comb,
                                   nlabels=nl, block_rows=512)

    t0 = time.perf_counter()
    flags = run()
    force(flags[:, :8])
    print(f"first kernel (compile): {time.perf_counter()-t0:.1f} s")
    for _ in range(3):
        t0 = time.perf_counter()
        flags = run()
        force(flags[:, :8])
        dt = time.perf_counter() - t0
        print(f"kernel:  {dt*1e3:8.1f} ms  {B/dt/1e6:8.3f} M rows/s")

    # --- full D2H of flags (what the executor reads back)
    t0 = time.perf_counter()
    np.asarray(flags)
    print(f"flags D2H ({flags.nbytes/1e6:.1f} MB): "
          f"{(time.perf_counter()-t0)*1e3:.1f} ms")


if __name__ == "__main__":
    main()
