"""Public scan API — the L5 surface of the engine.

`scan(...)` is the TPU-native equivalent of the reference's SQL table
function (cudasp_scan, /root/reference/src/cudasp_extension.cu:626-635;
README.md:70-119): table in, matching (txid, height, tweak_key) rows out.
Same wire formats, same semantics, defined (non-UB) degenerate cases.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Union

import numpy as np

from .io import ingest
from .runtime.errors import BindError, IngestError
from .runtime.executor import BatchExecutor
from .runtime.metrics import ScanMetrics, Timer

DEFAULT_BATCH_SIZE = 300_000       # reference default (cudasp_extension.cu:88)
MAX_BATCH_SIZE = 10_000_000        # reference cap (cudasp_extension.cu:485)


@dataclass
class ScanConfig:
    batch_size: int = DEFAULT_BATCH_SIZE
    max_outputs: int = 8            # padded outputs width (long lists split)
    mesh: object = None             # jax.sharding.Mesh for data sharding
    fused: bool = False             # single-program pipeline variant
    backend: str = "auto"           # "pallas" (TPU kernel) | "xla" | "auto"
    collect_metrics: bool = True
    # Route mesh batches through the device-side all_to_all exchange
    # (parallel.exchange) so skewed per-shard row counts even out before EC
    # compute. Pays an exchange per batch; worth it when data placement is
    # fixed/skewed, off for hash-balanced ingest. Pallas + mesh only.
    rebalance: bool = False
    # Internal device-batch tile. Fixed so the device compiles one program
    # shape regardless of table size; multiple tiles stream through the
    # executor's async-dispatch window. None = auto per backend (the Pallas
    # kernel amortizes dispatch over much wider batches than the XLA graph
    # pipeline, whose compile time scales with batch width).
    tile: Optional[int] = None
    # Pallas kernel lane-tile width (rows per grid step). None = measured
    # default for the attached device kind (runtime.tuning: 640 on v5e per
    # the r3 sweep; autotuned row or built-in table for other kinds —
    # run tools/autotune.py on first contact with new hardware);
    # CUDASP_BLOCK_ROWS overrides.
    block_rows: Optional[int] = None
    # Scalar-ladder schedule for the Pallas kernel: "fixed" (odd-digit
    # fixed windows, 64 adds) or "wnaf" (interleaved width-5 wNAF, ~43
    # adds). Both are data-driven — changing scan keys never recompiles.
    # "auto" = fixed (measured ~20% faster end-to-end than wnaf despite
    # more adds; the wnaf step's lax.cond serializes worse). CUDASP_LADDER
    # fills the "auto" default only (an explicit value wins).
    ladder: str = "auto"
    # static_key=True compiles the scan key's wNAF schedule INTO the
    # kernel program (ladder="static": ~43 straight-line adds vs fixed's
    # 64, no dynamic table picks — the largest work-removal lever left
    # after r4's ablation). Costs one kernel compile per scan key
    # (minutes, amortized by the AOT store): right for a long-lived
    # production key over 100M+ rows, wrong for interactive/one-shot
    # scans. Overrides `ladder`.
    static_key: bool = False
    # Batch upload width (per row at 3 outputs): "full64" (92 B: ships the
    # reference's own uncompressed 64-B point, src/cudasp_extension.cu:
    # 159-163, so the kernel SKIPS the on-device sqrt decompress — fastest
    # when the link outruns the kernel, i.e. real PCIe/production hosts),
    # "full" (60 B: 32-B x + parity bit, exact), "hi32" (48 B: hi-word
    # prefilter + exact re-verify of flagged rows), "hi16" (40 B:
    # top-16-bit match words packed two per uint32, same re-verify
    # contract, ~2^-16 false-flag rate), "hi8" (36 B: top-8-bit words
    # four per uint32, ~M*2^-8 false-flag rate, same contract; needs
    # <= 6 outputs/row else degrades to hi16), or "auto" (measure the
    # link vs the kernel per batch and pick the fastest mode,
    # hysteresis + density veto; see runtime.executor).
    # CUDASP_UPLOAD fills the "auto" default only (an explicit value wins).
    upload: str = "auto"


@dataclass
class ScanResult:
    """Matching rows, in input order (deterministic, unlike the reference's
    batch-completion order, src/cudasp_extension.cu:384-390)."""
    indices: np.ndarray             # (m,) int64 row indices into the input
    txid: Optional[np.ndarray]      # None when the input had no txid column
    height: Optional[np.ndarray]    # (or on resume from a legacy cursor
    tweak_key: Optional[np.ndarray]  # without persisted match_rows)
    metrics: Optional[ScanMetrics] = None

    def __len__(self) -> int:
        return len(self.indices)


def _normalize_blob_column(col, width: int, name: str):
    """Accepts (n, width) uint8 arrays, lists of bytes (None = NULL), or
    pyarrow arrays with validity. Returns (blobs (n, width) u8, valid (n,)
    bool) — NULL rows come back zero-filled and invalid, and are skipped by
    the scan like the reference skips NULL tweak_keys
    (src/cudasp_extension.cu:195-197)."""
    if isinstance(col, np.ndarray) and col.dtype == np.uint8 and col.ndim == 2:
        if col.shape[1] != width:
            raise IngestError(f"{name}: expected width {width}, got {col.shape[1]}")
        return col, np.ones(col.shape[0], bool)
    if hasattr(col, "is_valid") and hasattr(col, "to_pylist"):   # pyarrow
        valid = np.asarray(col.is_valid())
        rows = [b if v else b"\x00" * width
                for b, v in zip(col.to_pylist(), valid)]
    else:
        try:
            rows = [b"\x00" * width if b is None else bytes(b) for b in col]
        except TypeError as e:
            raise IngestError(
                f"{name}: unsupported column type {type(col)}") from e
        valid = np.array([b is not None for b in col], bool)
    bad = [i for i, b in enumerate(rows) if len(b) != width]
    if bad:
        raise IngestError(
            f"{name}: row {bad[0]} has {len(rows[bad[0]])} bytes, expected {width}"
        )
    if not rows:
        return np.zeros((0, width), np.uint8), np.zeros(0, bool)
    blobs = np.frombuffer(b"".join(rows), np.uint8).reshape(len(rows), width)
    return blobs, valid


def _normalize_outputs(col) -> Tuple[np.ndarray, np.ndarray]:
    """outputs column -> CSR (flat int64, offsets). Accepts (flat, offsets)
    tuples, pyarrow ListArrays/ChunkedArrays, or sequences of sequences.
    A NULL list (None entry) becomes an empty list — such rows can never
    match, matching the reference's NULL-element drop semantics
    (src/cudasp_extension.cu:215)."""
    if isinstance(col, tuple) and len(col) == 2:
        flat = np.asarray(col[0], dtype=np.int64)
        offsets = np.asarray(col[1], dtype=np.int64)
        return flat, offsets
    # pyarrow (optional dependency) — duck-typed; the zero-copy offsets
    # path is only valid when no list or element is NULL
    values = getattr(col, "values", None)
    offsets = getattr(col, "offsets", None)
    if values is not None and offsets is not None and col.null_count == 0 \
            and getattr(values, "null_count", 0) == 0:
        return (np.asarray(values, dtype=np.int64),
                np.asarray(offsets, dtype=np.int64))
    if hasattr(col, "to_pylist"):
        col = col.to_pylist()
    return ingest.outputs_to_csr(
        [[] if o is None else [v for v in o if v is not None]
         for o in col])


def _slice_col(col, a: int, b: int):
    """Rows [a, b) of a column of any supported type (numpy, list, pyarrow
    array, CSR outputs tuple). Shared by scan_stream's mid-chunk resume and
    runtime.checkpoint's chunker."""
    if isinstance(col, tuple) and len(col) == 2:        # CSR outputs
        flat, offs = col
        offs = np.asarray(offs, np.int64)
        flat = np.asarray(flat, np.int64)
        return (flat[offs[a]:offs[b]], offs[a:b + 1] - offs[a])
    if hasattr(col, "slice"):                           # pyarrow
        return col.slice(a, b - a)
    return col[a:b]


def _table_columns(table) -> Dict[str, object]:
    """dict-like or pyarrow.Table -> column mapping."""
    if hasattr(table, "column_names") and hasattr(table, "column"):
        cols = {}
        for name in table.column_names:
            c = table.column(name)
            if hasattr(c, "combine_chunks"):
                c = c.combine_chunks()
            cols[name] = c
        return cols
    if isinstance(table, dict):
        return table
    raise IngestError(f"unsupported table type {type(table)}")


def scan(
    table,
    scan_private_key: bytes,
    spend_public_key: bytes,
    label_keys: Sequence[bytes] = (),
    *,
    batch_size: Optional[int] = None,
    config: Optional[ScanConfig] = None,
) -> ScanResult:
    """Scan `table` for BIP-352 silent-payment matches.

    Set CUDASP_PROFILE_DIR to capture an XLA profiler trace of the scan and
    CUDASP_METRICS=1 to emit a structured metrics line on stderr.

    table: mapping (or pyarrow.Table) with columns
        txid      — arbitrary per-row ids (passed through)
        height    — int (passed through)
        tweak_key — 64-byte blobs (LE x || LE y uncompressed point)
        outputs   — per-row variable-length int64 lists
    scan_private_key: 32-byte LE scalar blob
    spend_public_key: 64-byte LE point blob
    label_keys: 64-byte LE point blobs

    Argument validation mirrors the reference binder
    (src/cudasp_extension.cu:420-509)."""
    from .runtime.trace import emit_metrics, trace_scan

    with trace_scan():
        res = _scan_impl(table, scan_private_key, spend_public_key,
                         label_keys, batch_size=batch_size, config=config)
    if os.environ.get("CUDASP_METRICS"):
        emit_metrics(res.metrics)
    return res


def scan_stream(
    chunks,
    scan_private_key: bytes,
    spend_public_key: bytes,
    label_keys: Sequence[bytes] = (),
    *,
    config: Optional[ScanConfig] = None,
    checkpoint=None,
) -> ScanResult:
    """Scan an ITERATOR of table chunks with bounded host memory.

    The capacity story for 100M+-row tables (reference README.md:11-12):
    each chunk (a column mapping or pyarrow RecordBatch/Table slice) is
    scanned independently — compiled shapes are reused across chunks — and
    only the matching rows are retained. Complements scan_resumable
    (runtime.checkpoint), which needs a sliceable in-memory table; pass a
    runtime.checkpoint.ScanCursor as `checkpoint` to also persist progress
    (chunks already covered by the cursor are skipped without scanning).

    Returns one aggregated ScanResult with indices global to the stream.
    On an actual RESUME (the cursor already covered rows), the prior run's
    matched rows are reconstructed from the cursor's persisted match_rows,
    so the result carries the same full txid/height/tweak_key columns as a
    fresh run (the reference always emits all three,
    src/cudasp_extension.cu:595-621). Only when resuming from a legacy
    cursor without persisted rows do the passthrough columns fall back to
    None (indices + metrics stay exact)."""
    from .runtime.checkpoint import _query_digest

    if checkpoint is not None:
        digest = _query_digest(scan_private_key, spend_public_key,
                               label_keys)
        if checkpoint.query_digest and checkpoint.query_digest != digest:
            raise BindError(
                "checkpoint was written by a different query (key "
                "mismatch); refusing to resume")
        checkpoint.query_digest = digest
    resumed = checkpoint is not None and checkpoint.rows_done > 0
    # snapshot BEFORE the loop extends cursor.matches: these are the
    # indices whose rows must come from the cursor, not this run
    prior_matches = (sorted({int(m) for m in checkpoint.matches})
                     if resumed else [])

    idx_parts: List[np.ndarray] = []
    txid_parts, height_parts, tweak_parts = [], [], []
    agg = ScanMetrics() if (config is None or config.collect_metrics) else None
    offset = 0
    pt_schema = None       # (has txid, has height) — must match all chunks
    for chunk in chunks:
        if hasattr(chunk, "schema") and hasattr(chunk, "column"):
            chunk = {name: chunk.column(i)
                     for i, name in enumerate(chunk.schema.names)}
        cols = _table_columns(chunk)
        n = len(cols["tweak_key"])
        covered = (max(0, min(checkpoint.rows_done - offset, n))
                   if checkpoint is not None else 0)
        if covered >= n:
            # chunk fully covered by a previous run: skip without scanning
            # (its matches are already in checkpoint.matches)
            offset += n
            continue
        if covered:
            # cursor landed mid-chunk (different chunking on resume): scan
            # only the uncovered suffix, so rows_in/rows_scanned and device
            # work reflect exactly the rows this run is responsible for
            cols = {name: _slice_col(c, covered, n)
                    for name, c in cols.items()}
        res = _scan_impl(cols, scan_private_key, spend_public_key,
                         label_keys, config=config)
        # passthrough columns must be all-or-none across the stream, or the
        # concatenated parts would silently misalign with global indices
        have = (res.txid is not None, res.height is not None)
        if pt_schema is None:
            pt_schema = have
        elif pt_schema != have:
            raise IngestError(
                "heterogeneous chunk schema: txid/height columns must be "
                f"present in every chunk or in none (saw {pt_schema} then "
                f"{have})")
        idx_parts.append(res.indices + offset + covered)
        if res.txid is not None:
            txid_parts.append(np.asarray(res.txid, dtype=object))
        if res.height is not None:
            height_parts.append(np.asarray(res.height))
        tweak_parts.append(res.tweak_key)
        if agg is not None and res.metrics is not None:
            agg.rows_in += res.metrics.rows_in
            agg.rows_scanned += res.metrics.rows_scanned
            agg.batches += res.metrics.batches
            agg.pack_seconds += res.metrics.pack_seconds
            agg.device_seconds += res.metrics.device_seconds
            agg.total_seconds += res.metrics.total_seconds
            agg.upload_seconds += res.metrics.upload_seconds
            agg.upload_bytes += res.metrics.upload_bytes
            agg.device_wait_seconds += res.metrics.device_wait_seconds
            agg.reverified_rows += res.metrics.reverified_rows
            if res.metrics.upload_mode:
                agg.upload_mode = res.metrics.upload_mode
        offset += n
        if checkpoint is not None:
            checkpoint.rows_done = offset
            checkpoint.matches.extend(idx_parts[-1].tolist())
            checkpoint.record_rows(idx_parts[-1], res.txid, res.height,
                                   res.tweak_key)
    cat = (np.concatenate(idx_parts) if idx_parts
           else np.zeros(0, np.int64))
    if agg is not None:
        agg.matches = len(cat)
    if resumed:
        return _merge_resumed(cat, prior_matches, checkpoint, pt_schema,
                              txid_parts, height_parts, tweak_parts, agg)
    return ScanResult(
        indices=cat,
        txid=np.concatenate(txid_parts) if txid_parts else None,
        height=np.concatenate(height_parts) if height_parts else None,
        tweak_key=(np.concatenate(tweak_parts) if tweak_parts
                   else np.zeros((0, 64), np.uint8)),
        metrics=agg,
    )


def _merge_resumed(cat, prior_matches, checkpoint, pt_schema,
                   txid_parts, height_parts, tweak_parts, agg) -> ScanResult:
    """Fold a prior run's matches into this run's, rebuilding the full
    passthrough columns from the cursor's persisted match_rows. Falls back
    to index-only columns (the pre-r2 contract) when the cursor predates
    row persistence."""
    prior = np.asarray(prior_matches, np.int64)
    all_idx = (np.unique(np.concatenate([cat, prior]))
               if len(cat) + len(prior) else np.zeros(0, np.int64))
    if agg is not None:
        agg.matches = len(all_idx)
    prior_rows = checkpoint.take_rows(prior_matches)
    if prior_rows is None:
        # legacy/foreign cursor without persisted rows
        return ScanResult(indices=all_idx, txid=None, height=None,
                          tweak_key=None, metrics=agg)
    ptx, phh, ptw = prior_rows

    def _presence(vals, what):
        nn = sum(v is not None for v in vals)
        if nn == 0:
            return False
        if nn == len(vals):
            return True
        raise IngestError(
            f"resumed cursor has mixed {what} presence in match_rows")

    if prior_matches:
        prior_schema = (_presence(ptx, "txid"), _presence(phh, "height"))
        if pt_schema is not None and pt_schema != prior_schema:
            raise IngestError(
                "resumed stream schema mismatch: the prior run recorded "
                f"passthrough columns {prior_schema}, this run saw "
                f"{pt_schema} (txid, height)")
        schema = prior_schema
    else:
        schema = pt_schema or (False, False)

    rowmap = {}
    for k, i in enumerate(prior_matches):
        rowmap[int(i)] = (ptx[k], phh[k], ptw[k])
    fresh_tx = np.concatenate(txid_parts) if txid_parts else None
    fresh_h = np.concatenate(height_parts) if height_parts else None
    fresh_tw = (np.concatenate(tweak_parts) if tweak_parts
                else np.zeros((0, 64), np.uint8))
    for k, i in enumerate(cat):
        rowmap[int(i)] = (
            fresh_tx[k] if fresh_tx is not None else None,
            fresh_h[k] if fresh_h is not None else None,
            fresh_tw[k])
    return ScanResult(
        indices=all_idx,
        txid=(np.asarray([rowmap[int(i)][0] for i in all_idx], object)
              if schema[0] else None),
        height=(np.asarray([rowmap[int(i)][1] for i in all_idx])
                if schema[1] else None),
        tweak_key=(np.stack([rowmap[int(i)][2] for i in all_idx])
                   if len(all_idx) else np.zeros((0, 64), np.uint8)),
        metrics=agg,
    )


def _scan_impl(table, scan_private_key, spend_public_key, label_keys=(),
               *, batch_size=None, config=None) -> ScanResult:
    cfg = config or ScanConfig()
    if batch_size is not None:
        cfg.batch_size = batch_size
    if not (0 < cfg.batch_size <= MAX_BATCH_SIZE):
        raise BindError(
            f"batch_size must be in (0, {MAX_BATCH_SIZE}], got {cfg.batch_size}")
    if len(bytes(scan_private_key)) != 32:
        raise BindError("scan_private_key must be exactly 32 bytes")
    if len(bytes(spend_public_key)) != 64:
        raise BindError("spend_public_key must be exactly 64 bytes")
    for i, lk in enumerate(label_keys):
        if len(bytes(lk)) != 64:
            raise BindError(f"label_keys[{i}] must be exactly 64 bytes")

    metrics = ScanMetrics(batch_size=cfg.batch_size) if cfg.collect_metrics else None
    timer = Timer()

    cols = _table_columns(table)
    for required in ("tweak_key", "outputs"):
        if required not in cols:
            raise IngestError(f"missing required column '{required}'")
    tweaks, row_ok = _normalize_blob_column(cols["tweak_key"], 64, "tweak_key")
    flat, offsets = _normalize_outputs(cols["outputs"])
    n = tweaks.shape[0]
    if len(offsets) != n + 1:
        raise IngestError(
            f"outputs offsets length {len(offsets)} != rows+1 ({n + 1})")
    # NULL txid/height also skip the row (src/cudasp_extension.cu:195-197)
    for name in ("txid", "height"):
        c = cols.get(name)
        if c is not None and hasattr(c, "is_valid"):
            row_ok &= np.asarray(c.is_valid())
        elif isinstance(c, (list, tuple)):
            row_ok &= np.array([v is not None for v in c], bool)

    row_indices = None
    if not row_ok.all():
        keep = np.flatnonzero(row_ok)
        ln = (offsets[1:] - offsets[:-1])[keep]
        new_off = np.zeros(len(keep) + 1, np.int64)
        np.cumsum(ln, out=new_off[1:])
        flat = flat[np.repeat(offsets[keep] - new_off[:-1], ln)
                    + np.arange(new_off[-1], dtype=np.int64)]
        offsets = new_off
        tweaks_scan = tweaks[keep]
        row_indices = keep
    else:
        tweaks_scan = tweaks

    keys = ingest.pack_query_keys(scan_private_key, spend_public_key, label_keys)
    windows, spend_x, spend_y, lx, ly, nlabels = keys

    # Pad the batch shape to a power of two (>=128) so small/ragged tables
    # reuse a handful of compiled shapes instead of one program per n.
    def _pow2_at_least(v, lo=128):
        p = lo
        while p < v:
            p *= 2
        return p

    from .runtime import compile_cache, tuning

    compile_cache.ensure()
    block_rows = cfg.block_rows or tuning.block_rows_default()
    # Env vars fill the "auto" defaults only — an explicitly-set
    # ScanConfig value always wins (same precedence as CUDASP_BLOCK_ROWS).
    ladder = cfg.ladder if cfg.ladder != "auto" else \
        os.environ.get("CUDASP_LADDER", cfg.ladder)
    if cfg.static_key:
        ladder = "static"
    upload = cfg.upload if cfg.upload != "auto" else \
        os.environ.get("CUDASP_UPLOAD", cfg.upload)
    executor = BatchExecutor(mesh=cfg.mesh, fused=cfg.fused,
                             backend=cfg.backend, block_rows=block_rows,
                             rebalance=cfg.rebalance,
                             ladder=ladder, upload=upload)
    # Pallas tile: device-kind default (v5e: 524288 rows/dispatch — the
    # ~21 ms dispatch+readback constant is 5%% of a 262144-row tile,
    # halved at 524288 which probes at 710K vs 690K apparent rows/s;
    # 1M-wide tiles degrade sharply). Narrower tiles pay per-dispatch
    # overhead; runtime.tuning keys the default off device_kind.
    tile = cfg.tile or (tuning.tile_default()
                        if executor.backend == "pallas" else 8192)
    n_scan = tweaks_scan.shape[0]
    eff_batch = min(_pow2_at_least(cfg.batch_size),
                    _pow2_at_least(max(n_scan, 1)), tile)
    # adaptive outputs width: never ship wider planes than the data needs.
    # Hard cap 30 — bits 30/31 of the validity bitmask carry y-parity and
    # row_valid (kernels.pack_batch_arrays); wider lists split into
    # virtual rows instead.
    lens = offsets[1:] - offsets[:-1]
    max_out = int(min(cfg.max_outputs, 30,
                      max(int(lens.max()) if n_scan else 1, 1)))
    pack_time = [0.0]
    # Pipeline ramp (a small first batch to cut fill time) measured
    # neutral on the tunnel-attached v5e — the extra dispatch's fixed cost
    # ate the upload saving — so it's opt-in.
    ramp = int(os.environ.get("CUDASP_RAMP", "0")) \
        if executor.backend == "pallas" else 0
    batches = ingest.iter_packed(tweaks_scan, flat, offsets,
                                 batch_size=eff_batch,
                                 max_outputs=max_out,
                                 row_indices=row_indices,
                                 pack_seconds=pack_time,
                                 ramp=ramp,
                                 layout="kernel"
                                 if executor.backend == "pallas" else "xla")
    if metrics is not None:
        metrics.rows_in = n

    results = executor.run(batches, windows, spend_x, spend_y, lx, ly,
                           nlabels, metrics=metrics)

    matched: List[np.ndarray] = []
    rows_scanned = 0
    for flags, sources in results:
        rows_scanned += int((sources >= 0).sum())
        matched.append(sources[flags & (sources >= 0)])
    idx = (np.unique(np.concatenate(matched)) if matched
           else np.zeros(0, np.int64))
    if metrics is not None:
        metrics.rows_scanned = rows_scanned
        metrics.pack_seconds = pack_time[0]

    def _take(name):
        if name not in cols:
            return None
        col = cols[name]
        if isinstance(col, np.ndarray):
            return col[idx]
        if isinstance(col, (list, tuple)):
            # object array, NOT np.asarray: an 'S'-dtype array would strip
            # trailing NUL bytes from binary txids (passthrough must be
            # byte-exact, src/cudasp_extension.cu:384-390)
            arr = np.empty(len(col), object)
            arr[:] = col
            return arr[idx]
        arr = np.asarray(col)
        return arr[idx]

    if metrics is not None:
        metrics.matches = len(idx)
        metrics.total_seconds = metrics.pack_seconds + timer.lap()
    return ScanResult(
        indices=idx,
        txid=_take("txid"),
        height=_take("height"),
        tweak_key=tweaks[idx] if len(idx) else np.zeros((0, 64), np.uint8),
        metrics=metrics,
    )
