#!/usr/bin/env python
"""Benchmark: BIP-352 scan throughput vs the reference's headline number.

Reference baseline: 2,622,216 tx/s on a 32.7M-row scan (2x RTX 5090,
/root/reference/README.md:134; BASELINE.md). Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "tx/s", "vs_baseline": N, ...}

Drift-proofing (VERDICT r3 item 3): the recorded artifact carries the
measured H2D link rate (link_MBps — the axon tunnel drifts 10-42 MB/s
within hours and the e2e number is hostage to it), the device-resident
kernel_rows_per_s (the stable engine number), and repeats auto-extend
until the best two timed runs agree within 10% (cap --max-repeats).

Synthetic dataset: rows cycle through a pool of distinct tweak points;
~1% of rows carry a planted matching value (oracle-computed per distinct
point), the rest carry random candidates. The per-point oracle work is
cached on disk (the r3 bench spent 65 s/run regenerating it). Matching
correctness is asserted before timing is reported.
"""

import argparse
import hashlib
import json
import os
import sys
import time

import numpy as np

BASELINE_TXS = 2_622_216.0
_POOL_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "cudasp_tpu", "_cache")


def _pool_points(pool, seed, scan_key, spend):
    """(blobs (pool, 64) u8, values (pool,) i64): the oracle-computed part
    of the dataset (python-int EC, ~0.25 s/point) — cached on disk."""
    from cudasp_tpu.oracle import ec as O
    from cudasp_tpu.oracle.encoding import point_to_blob64
    from cudasp_tpu.oracle.pipeline import candidate_values

    key = hashlib.sha256(
        f"{pool}|{seed}|{scan_key}|{spend}".encode()).hexdigest()[:16]
    cache = os.path.join(_POOL_CACHE_DIR, f"benchpool_{key}.npz")
    if os.path.exists(cache):
        d = np.load(cache)
        return d["blobs"], d["values"]
    rng = np.random.default_rng(seed)
    g = (O.GX, O.GY)
    ks = rng.integers(1, 2**62, size=pool)
    points = [O.ec_mul(g, int(k)) for k in ks]
    blobs = np.stack([
        np.frombuffer(point_to_blob64(p), np.uint8) for p in points
    ])
    values = np.asarray(
        [candidate_values(p, scan_key, spend)[0] for p in points],
        np.int64,
    )
    try:
        os.makedirs(_POOL_CACHE_DIR, exist_ok=True)
        np.savez_compressed(cache, blobs=blobs, values=values)
    except OSError:
        pass
    return blobs, values


def make_dataset(n_rows, pool=256, match_every=100, outputs_per_row=3,
                 seed=7, scan_key=None, spend=None):
    blobs, values = _pool_points(pool, seed, scan_key, spend)
    rng = np.random.default_rng(seed)
    rng.integers(1, 2**62, size=pool)          # keep stream position stable

    row_pool = rng.integers(0, pool, size=n_rows)
    tweaks = blobs[row_pool]

    flat = rng.integers(-2**62, 2**62, size=n_rows * outputs_per_row,
                        dtype=np.int64)
    offsets = np.arange(n_rows + 1, dtype=np.int64) * outputs_per_row
    is_match = np.zeros(n_rows, bool)
    is_match[::match_every] = True
    # plant the true value in the first slot of matching rows
    flat[offsets[:-1][is_match]] = values[row_pool[is_match]]
    return tweaks, flat, offsets, is_match


def main():
    ap = argparse.ArgumentParser()
    # default = the reference's headline dataset (32.7M rows, 12.5 s,
    # README.md:134) so vs_baseline compares like for like; larger scans
    # also amortize pipeline fill and average out the tunnel's bandwidth
    # drift (tools/bench_curve.py records the smaller points)
    ap.add_argument("--rows", type=int, default=32_700_000)
    ap.add_argument("--batch-size", type=int, default=524_288)
    ap.add_argument("--labels", type=int, default=0)
    ap.add_argument("--pool", type=int, default=256)
    ap.add_argument("--repeats", type=int, default=3,
                    help="minimum timed runs; extended (to --max-repeats) "
                         "until the best two agree within 10%%")
    ap.add_argument("--max-repeats", type=int, default=8)
    ap.add_argument("--no-kernel-only", action="store_true",
                    help="skip the device-resident kernel-only measurement")
    ap.add_argument("--no-static-kernel", action="store_true",
                    help="skip the static-key-ladder kernel measurement "
                         "(it compiles per key unless AOT-seeded)")
    ap.add_argument("--platform", default=None,
                    help="force jax platform (e.g. cpu)")
    args = ap.parse_args()

    if args.platform == "cpu":
        # XLA:CPU's new fusion emitters deadlock on this code's deep int32
        # chains (see conftest.py / __graft_entry__.py); TPU is unaffected
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_cpu_use_fusion_emitters" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + " --xla_cpu_use_fusion_emitters=false").strip()
    if args.platform:
        os.environ["JAX_PLATFORMS"] = args.platform
        import jax

        jax.config.update("jax_platforms", args.platform)
    # the executor's per-batch upload timing feeds link_MBps in the output
    os.environ.setdefault("CUDASP_METRICS", "1")
    import jax

    # Persistent compilation cache (repo-seeded when present): the fused
    # kernel takes minutes to compile cold; see runtime/compile_cache.py.
    from cudasp_tpu.runtime import compile_cache

    compile_cache.ensure()

    from cudasp_tpu import scan
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.oracle.encoding import blob32_to_scalar, blob64_to_point

    scan_key = blob32_to_scalar(V.SCAN_KEY_BIP352)
    spend = blob64_to_point(V.SPEND_BIP352)
    label_blobs = [V.LABEL2] * args.labels

    print(f"# devices: {jax.devices()}", file=sys.stderr)
    t0 = time.time()
    tweaks, flat, offsets, is_match = make_dataset(
        args.rows, pool=args.pool, scan_key=scan_key, spend=spend)
    print(f"# dataset gen: {time.time()-t0:.1f}s", file=sys.stderr)

    table = {"tweak_key": tweaks, "outputs": (flat, offsets)}

    # warm-up run (compile + first-dispatch overheads) on a slice big
    # enough to exercise the production batch shape
    nwarm = min(args.rows, args.batch_size + 1)
    warm = {
        "tweak_key": tweaks[: nwarm],
        "outputs": (flat[: offsets[nwarm]], offsets[: nwarm + 1]),
    }
    t0 = time.time()
    scan(warm, V.SCAN_KEY_BIP352, V.SPEND_BIP352, label_blobs,
         batch_size=args.batch_size)
    # wait out the background variant prewarm before timing anything: an
    # XLA compile on another thread competes for this host's cores and
    # contaminates the timed runs (the labels=1 curve point measured 6.4x
    # run-to-run spread from exactly this; its variants are not in the
    # committed AOT store, so prewarm really compiles)
    from cudasp_tpu.runtime.executor import BatchExecutor

    BatchExecutor.join_prewarm()
    print(f"# warmup (compile + prewarm): {time.time()-t0:.1f}s",
          file=sys.stderr)

    # link-settle run (discarded): the first scan after a compile-heavy
    # warmup consistently sees the axon tunnel collapsed to ~8 MB/s
    # (observed on every fresh process, r5); one small untimed scan lets
    # the link recover so the timed window starts clean
    nset = min(args.rows, 2 * args.batch_size)
    settle = {
        "tweak_key": tweaks[: nset],
        "outputs": (flat[: offsets[nset]], offsets[: nset + 1]),
    }
    t0 = time.time()
    scan(settle, V.SCAN_KEY_BIP352, V.SPEND_BIP352, label_blobs,
         batch_size=args.batch_size)
    print(f"# link settle: {time.time()-t0:.1f}s", file=sys.stderr)

    times = []
    links = []       # measured H2D MB/s per run (executor per-batch timing)
    upload_mode = None
    while True:
        t0 = time.time()
        res = scan(table, V.SCAN_KEY_BIP352, V.SPEND_BIP352, label_blobs,
                   batch_size=args.batch_size)
        dt = time.time() - t0
        times.append(dt)
        m = res.metrics
        link = (m.upload_bytes / m.upload_seconds / 1e6
                if m.upload_seconds else 0.0)
        links.append(link)
        upload_mode = m.upload_mode or "full"
        print(f"# run: {dt:.2f}s pack={m.pack_seconds:.2f}s "
              f"device={m.device_seconds:.2f}s matches={m.matches} "
              f"upload={upload_mode} link={link:.1f}MB/s", file=sys.stderr)
        expected = np.flatnonzero(is_match)
        got = np.asarray(res.indices)
        if not np.array_equal(got, expected):
            print(f"# MISMATCH: expected {len(expected)} matches, "
                  f"got {len(got)}", file=sys.stderr)
            print(json.dumps({
                "metric": "scan_throughput", "value": 0,
                "unit": "tx/s", "vs_baseline": 0.0,
                "error": "match verification failed",
            }))
            return 1
        if len(times) >= args.max_repeats:
            break
        if len(times) >= args.repeats:
            two = sorted(times)[:2]
            if two[1] <= 1.10 * two[0]:
                break
            print(f"# best two {two[0]:.1f}s/{two[1]:.1f}s disagree >10% "
                  f"(link drift) — extending repeats", file=sys.stderr)
    best = min(times)
    # spread over runs in a comparable link window: runs whose measured
    # link rate fell under half the best run's rate are tunnel collapses
    # (weather, not engine) — excluded from spread, counted in the
    # artifact so the error bar stays honest
    best_link = links[int(np.argmin(times))]
    core = [t for t, l in zip(times, links)
            if not best_link or l >= 0.5 * best_link]
    collapsed = len(times) - len(core)
    spread = max(core) / min(core) if core else max(times) / best
    if spread > 1.3:
        # >1.3x run-to-run spread means the tunnel drifted during the
        # window (or a compile leaked into a timed run); the artifact
        # records spread + link range so the judged number carries its
        # own error bar
        print(f"# WARNING: run-to-run spread {spread:.1f}x > 1.3x "
              f"(times: {[round(t, 2) for t in times]})", file=sys.stderr)

    kernel_rows_per_s = kernel_full64 = kernel_static = None
    if not args.no_kernel_only and jax.default_backend() != "cpu":
        kernel_rows_per_s = kernel_only(tweaks, flat, offsets, args)
        # the full64 wire skips the sqrt decompress — the engine's best
        # device-resident number (what e2e converges to on fast links)
        kernel_full64 = kernel_only(tweaks, flat, offsets, args,
                                    wire="xy")
        # per-key compiled ladder on the full64 wire: the engine's peak
        # (ScanConfig(static_key=True); ~21 fewer adds than fixed)
        if not args.no_static_kernel:
            kernel_static = kernel_only(tweaks, flat, offsets, args,
                                        wire="xy", ladder="static")

    txs = args.rows / best
    out = {
        "metric": "scan_throughput",
        "value": round(txs, 1),
        "unit": "tx/s",
        "vs_baseline": round(txs / BASELINE_TXS, 4),
        "rows": args.rows,
        "seconds": round(best, 3),
        "batch_size": args.batch_size,
        "labels": args.labels,
        "repeats": len(times),
        "spread": round(spread, 3),
        # the repeat-extension criterion (two best runs within 10%):
        # the precision of `value` itself; `spread` spans the whole core
        # window and mostly measures link drift on small scans
        "spread_best2": round(sorted(times)[1] / best, 3)
        if len(times) > 1 else 1.0,
        "collapsed_runs": collapsed,
        "upload_mode": upload_mode,
        "link_MBps": round(links[int(np.argmin(times))], 1),
        "link_MBps_range": [round(min(links), 1), round(max(links), 1)],
    }
    if kernel_rows_per_s:
        out["kernel_rows_per_s"] = round(kernel_rows_per_s, 1)
    if kernel_full64:
        out["kernel_rows_per_s_full64"] = round(kernel_full64, 1)
    if kernel_static:
        out["kernel_rows_per_s_static_full64"] = round(kernel_static, 1)
    print(json.dumps(out))
    return 0


def kernel_only(tweaks, flat, offsets, args, n=524288, reps=3, wire="x",
                ladder=None):
    """Device-resident kernel throughput (no host pack / H2D in the timed
    region): the number end-to-end converges to when the upload path is
    not the bottleneck. Reuses the first n rows of the bench dataset.
    Uses the SAME block_rows/ladder resolution as the production executor
    (CUDASP_BLOCK_ROWS / CUDASP_LADDER env over the measured defaults) and
    reports rows/s over the REAL row count, not the padded lane width."""
    import jax.numpy as jnp

    from cudasp_tpu.io import ingest
    from cudasp_tpu.oracle import vectors as V
    from cudasp_tpu.ops import kernels as K
    from cudasp_tpu.ops import scalar as S
    from cudasp_tpu.oracle.encoding import blob32_to_scalar

    n = min(n, args.rows)
    br = int(os.environ.get("CUDASP_BLOCK_ROWS", "640"))
    if ladder is None:
        ladder = os.environ.get("CUDASP_LADDER", "fixed")
    b = next(iter(ingest.iter_packed(
        tweaks[:n], flat[: offsets[n]], offsets[: n + 1], batch_size=n,
        max_outputs=3, layout="kernel")))
    planes = K.pack_batch_arrays(b.tweak_blobs, b.row_valid, b.outputs_hi,
                                 b.outputs_lo, b.outputs_valid, br,
                                 wire=wire)
    windows, sx, sy, lx, ly, nlabels = ingest.pack_query_keys(
        V.SCAN_KEY_BIP352, V.SPEND_BIP352, [V.LABEL2] * args.labels)
    k = blob32_to_scalar(V.SCAN_KEY_BIP352)
    sched = S.glv_wnaf_steps(k) if ladder == "wnaf" else S.glv_odd_sched(k)
    digits = jnp.asarray(np.asarray(sched, np.int32))
    # per-key compiled ladder: the schedule is program literals
    ssched = S.glv_wnaf_static(k) if ladder == "static" else None
    dev = tuple(jnp.asarray(a) for a in planes)
    dq = tuple(jnp.asarray(a) for a in
               K.pack_query_arrays(sx, sy, lx, ly, br))
    comb = K.comb_table_kernel()

    from cudasp_tpu.runtime import aot

    def run():
        args = (*dev, digits, *dq, comb, None)
        f = aot.maybe_call(args, nlabels=nlabels, block_rows=br,
                           ladder=ladder, wire=wire, pack_flags=True,
                           static_sched=ssched)
        if f is None:
            f = K._scan_pallas_call(*dev, digits, *dq, comb,
                                    nlabels=nlabels, block_rows=br,
                                    ladder=ladder, wire=wire,
                                    pack_flags=True, static_sched=ssched)
        np.asarray(f)      # force sync (block_until_ready lies on axon)

    run()                  # compile + warm
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        best = min(best, time.perf_counter() - t0)
    tag = " (full64 wire)" if wire == "xy" else ""
    if ladder == "static":
        tag += " [static-key ladder]"
    print(f"# kernel-only{tag}: {best*1e3:.1f} ms / {n} rows "
          f"(padded {dev[0].shape[1]}) -> {n/best:,.0f} rows/s",
          file=sys.stderr)
    return n / best


if __name__ == "__main__":
    sys.exit(main())
