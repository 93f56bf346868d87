"""Batch executor: feeds packed batches through the device pipeline.

Replaces the reference's L3/L4 scheduling machinery (per-thread
accumulators, round-robin GPU pinning, per-batch streams, mutex-guarded
merge — src/cudasp_extension.cu:122-152,226-410): JAX's async dispatch
gives stream-like overlap for free (we enqueue batch i+1 before reading
batch i's flags), and sharded execution over a device mesh replaces
multi-GPU round-robin.

Two compute backends:
  * "pallas" — the fused VMEM-resident TPU kernel (ops/kernels.py); the
    production path on TPU hardware.
  * "xla"    — the jitted XLA-graph pipeline (ops/pipeline.py); used on
    CPU, under interpret-style testing, and for mesh-sharded runs.
"auto" picks pallas on TPU-like backends when no mesh is requested.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
import jax

from ..io.ingest import PackedBatch
from ..ops import pipeline as PL
from .errors import ExecutionError
from .metrics import ScanMetrics, Timer


import functools


@functools.lru_cache(maxsize=32)
def _plane_splitter(sizes):
    """Jitted device-side row-splitter for a combined (sum(sizes), W)
    upload buffer. The axon tunnel pays a large per-transfer constant and
    degrades under concurrent transfers (tools/h2d_probe: 2 parallel
    streams run at 9 MB/s vs 42 single), so the feeder ships each batch
    as ONE contiguous array and slices it back apart on device."""
    import jax

    @jax.jit
    def split(b):
        outs = []
        at = 0
        for s in sizes:
            outs.append(jax.lax.slice_in_dim(b, at, at + s, axis=0))
            at += s
        return tuple(outs)

    return split


def _default_backend(mesh) -> str:
    # CPU has no Pallas TPU backend (tests use interpret mode explicitly);
    # on TPU the fused kernel is the production path, single- or multi-chip
    # (mesh -> shard_map over the 'data' axis).
    return "xla" if jax.default_backend() == "cpu" else "pallas"


def _flags_to_bool(arr: np.ndarray, n: int) -> np.ndarray:
    """Decode a device flags array to (n,) bool. uint32 means the kernel
    bit-packed them (kernels._scan_pallas_call pack_flags — 1 bit/row,
    little-endian within each word); int8 is the unpacked form."""
    if arr.dtype == np.uint32:
        bits = (arr[0][:, None] >> np.arange(32, dtype=np.uint32)) & 1
        return bits.astype(bool).reshape(-1)[:n]
    return arr[0, :n] != 0


def _variant_signature(width, M, tag, skip, *, nlabels, block_rows,
                       ladder, digits_shape, nlimbs, L, pack_flags,
                       static_sched=None):
    """AOT-store signature of one kernel variant built from SHAPES ONLY
    (no arrays): must mirror exactly what dispatch() passes to
    aot.maybe_call — plane shapes per wire/cut, then digits, sx, sy, lx,
    ly, comb, and the blockmask skip bit. Pinned against the real arg
    list by tests/test_aot.py::test_variant_signature_matches_dispatch."""
    from . import aot

    TW = 16 if tag == "full64" else 8
    if tag == "hi16":
        oh_r, lo, ovm = (M + 2) // 2, (1, 1), (1, 1)
        hi_only, nout, wire = "hi16", M, "x"
    elif tag == "hi8":
        oh_r, lo, ovm = (M + 4) // 4, (1, 1), (1, 1)
        hi_only, nout, wire = "hi8", M, "x"
    elif tag == "hi32":
        oh_r, lo, ovm = M, (M, 1), (1, width)
        hi_only, nout, wire = True, None, "x"
    elif tag == "full64":
        oh_r, lo, ovm = M, (M, width), (1, width)
        hi_only, nout, wire = False, None, "xy"
    else:                                        # None = full
        oh_r, lo, ovm = M, (M, width), (1, width)
        hi_only, nout, wire = False, None, "x"
    shapes = [((TW, width), "uint32"), ((oh_r, width), "uint32"),
              (lo, "uint32"), (ovm, "uint32"),
              (tuple(digits_shape), "int32"),
              ((nlimbs, 1), "int32"), ((nlimbs, 1), "int32"),
              ((L, nlimbs, 1), "int32"), ((L, nlimbs, 1), "int32"),
              ((32, 4 * nlimbs, 256), "bfloat16")]
    if skip:
        shapes.append(((width // block_rows,), "int32"))
    return aot.signature(nlabels=nlabels, block_rows=block_rows,
                         ladder=ladder, hi_only=hi_only, nout=nout,
                         wire=wire, skip=skip, shapes=shapes,
                         pack_flags=pack_flags, static_sched=static_sched)


def _variant_tag(tag, skip: bool) -> str:
    """Registry name of one compiled kernel variant: the wire/cut tag
    ("hi8"/"hi16"/"hi32"/"full64", None = full planes) plus whether the
    program carries the block-skip branch (tail batches)."""
    if tag is None:
        return "skip" if skip else "full"
    return f"skip+{tag}" if skip else tag


class BatchExecutor:
    """Runs packed batches on one device or a data-sharded mesh."""

    # Process-wide memo of upload="auto"'s measured decision. The
    # measurement costs one serialized batch (the batch-0 kernel is timed
    # with the pipeline drained — ~15% of a 1M-row scan), so only the
    # first auto scan of a process pays it; later scans reuse the verdict
    # (the link/kernel ratio is a property of the host+chip pair, not of
    # one scan). The density veto still updates it mid-scan.
    _auto_memo: dict = {}
    # Process-wide registry of kernel variants known compiled (filled by
    # the prewarm thread). A later scan whose hi32 variant is already here
    # ships hi32 from batch 0 — without this, each scan's hi_ready gate
    # starts cold and short scans never apply the measured decision.
    _warm_keys: set = set()
    # Live prewarm threads (class-wide), so cache-seeding tools and tests
    # can wait for background compiles to land before reading the cache.
    _prewarm_threads: list = []
    _atexit_registered = False
    # Prewarm failure accounting (VERDICT r4 weak #5): a broken variant
    # compile is logged once and surfaced in the metrics line instead of
    # silently forcing full-width uploads forever.
    _prewarm_failures: int = 0
    _prewarm_logged = False

    @classmethod
    def join_prewarm(cls, timeout: float = 600.0) -> None:
        """Block until all background variant compiles finish."""
        deadline = __import__("time").monotonic() + timeout
        for th in list(cls._prewarm_threads):
            th.join(timeout=max(0.0,
                                deadline - __import__("time").monotonic()))
        cls._prewarm_threads = [t for t in cls._prewarm_threads
                                if t.is_alive()]

    @classmethod
    def _register_atexit(cls) -> None:
        """Join live prewarm threads at interpreter exit: a daemon thread
        still inside an XLA compile when jax tears down aborts the process
        (PyGILState_Release fatal — reproduced on the axon backend when a
        short scan exits immediately). With the AOT store seeded the join
        is near-instant; unseeded, waiting out the compile beats a crash."""
        if not cls._atexit_registered:
            cls._atexit_registered = True
            import atexit

            atexit.register(cls.join_prewarm)

    def __init__(self, mesh=None, fused: bool = False,
                 backend: str = "auto", block_rows: int = 640,
                 rebalance: bool = False, ladder: str = "auto",
                 upload: str = "auto"):
        # block_rows=640 is the measured v5e sweet spot (r3 sweep:
        # 512: -2.2%, 768: -4.2%, 1024: VMEM pressure fails compilation)
        self._shardings = None
        if mesh is not None:
            from ..parallel.mesh import BatchShardings

            self._shardings = BatchShardings(mesh)
        self._fused = fused
        self._backend = (_default_backend(mesh)
                         if backend in (None, "auto") else backend)
        self._block_rows = block_rows
        # rebalance=True routes mesh batches through the device-side
        # all_to_all exchange (parallel.exchange.rebalanced_scan) so skewed
        # per-shard row counts even out before EC compute. Pallas+mesh only.
        self._rebalance = bool(rebalance and mesh is not None)
        # ladder: "fixed" (odd-digit fixed windows, 64 adds) or "wnaf"
        # (interleaved width-5 wNAF, ~43 table adds/row). "auto" = fixed:
        # despite fewer adds, wnaf's per-step lax.cond + dynamic-count
        # doubling fori_loop serializes worse end-to-end (same-session A/B
        # on the bench chip: fixed+full 508K tx/s vs wnaf+full 400K —
        # VERDICT r2). Both are data-driven (no per-key recompile).
        self._ladder = {"auto": "fixed"}.get(ladder, ladder)
        # upload (B/row at 3 outputs): "full64" (92 B, uncompressed point,
        # kernel skips the sqrt decompress), "full" (60 B, exact), "hi32"
        # (48 B prefilter + exact re-verify), "hi16" (40 B, same), "hi8"
        # (36 B, same), or "auto" (model per batch: max(upload_time,
        # kernel_time) per mode, measured link rate + memoized kernel
        # time). Pallas path only; the rebalanced-exchange path always
        # ships full planes.
        self._upload = upload

    @property
    def backend(self) -> str:
        return self._backend

    def run(
        self,
        batches,
        scan_windows,
        spend_x: np.ndarray,
        spend_y: np.ndarray,
        label_x: np.ndarray,
        label_y: np.ndarray,
        nlabels: int,
        metrics: Optional[ScanMetrics] = None,
    ) -> List[tuple]:
        """batches: iterable of PackedBatch (a generator overlaps host
        packing with device compute). Returns per-batch (flags bool (B,),
        source_rows int64 (B,)) pairs."""
        if self._backend == "pallas":
            return self._run_pallas(batches, scan_windows, spend_x, spend_y,
                                    label_x, label_y, nlabels, metrics)
        return self._run_xla(batches, scan_windows, spend_x, spend_y,
                             label_x, label_y, nlabels, metrics)

    # ------------------------------------------------------------------
    def _run_xla(self, batches, scan_windows, spend_x, spend_y,
                 label_x, label_y, nlabels, metrics):
        fn = PL.scan_batch_fused if self._fused else PL.scan_batch
        # ship only the fields the XLA pipeline consumes (the Pallas
        # ladder schedules in the tail of ScanSchedule stay on host)
        scan_windows = tuple(scan_windows[:4])
        if self._shardings is not None:
            w, sx, sy, lx, ly = self._shardings.put_query(
                scan_windows, spend_x, spend_y, label_x, label_y)
        else:
            w, sx, sy, lx, ly = (jax.device_put(a) for a in (
                scan_windows, spend_x, spend_y, label_x, label_y))

        timer = Timer()
        in_flight = []
        results: List[tuple] = []
        nb = 0
        for i, b in enumerate(batches):
            nb += 1
            try:
                if self._shardings is not None:
                    args = self._shardings.put_batch(b)
                else:
                    args = tuple(jax.device_put(a) for a in (
                        b.tweak_x, b.tweak_y, b.row_valid, b.outputs_hi,
                        b.outputs_lo, b.outputs_valid))
                flags = fn(*args, w, sx, sy, lx, ly, nlabels=nlabels)
            except Exception as e:                      # noqa: BLE001
                # one retry, then raise (SURVEY §5; see _run_pallas)
                if metrics is not None:
                    metrics.batch_retries += 1
                try:
                    if self._shardings is not None:
                        args = self._shardings.put_batch(b)
                    else:
                        args = tuple(jax.device_put(a) for a in (
                            b.tweak_x, b.tweak_y, b.row_valid,
                            b.outputs_hi, b.outputs_lo, b.outputs_valid))
                    flags = fn(*args, w, sx, sy, lx, ly, nlabels=nlabels)
                except Exception:
                    raise ExecutionError(i, e) from e
            in_flight.append((flags, b.source_rows))
            # keep a small window in flight (async dispatch overlap, the
            # role of the reference's per-batch CUDA streams)
            while len(in_flight) > 2:
                f, srcs = in_flight.pop(0)
                results.append((np.asarray(f), srcs))
        for f, srcs in in_flight:
            results.append((np.asarray(f), srcs))
        if metrics is not None:
            metrics.device_seconds += timer.lap()
            metrics.batches += nb
        return results

    # ------------------------------------------------------------------
    def _run_pallas(self, batches, scan_windows, spend_x, spend_y,
                    label_x, label_y, nlabels, metrics):
        import queue
        import threading
        import time

        import jax.numpy as jnp

        from ..io.ingest import split_outputs_i64
        from ..ops import kernels as K

        br = self._block_rows
        ladder = self._ladder
        sched = (scan_windows.wnaf if ladder == "wnaf"
                 else scan_windows.odd)
        digits = jnp.asarray(np.asarray(sched, np.int32))
        # ladder="static": the scan key's wNAF schedule is a STATIC jit
        # arg (per-key compiled program). ladder_id keys the warm-variant
        # registry and the auto memo so two keys never share an entry.
        ssched = (scan_windows.wnaf_static if ladder == "static" else None)
        if ssched is None:
            ladder_id = ladder
        else:
            import hashlib

            ladder_id = "static:" + hashlib.sha256(
                repr(ssched).encode()).hexdigest()[:12]
        sx, sy, lx, ly = (jnp.asarray(a) for a in K.pack_query_arrays(
            spend_x, spend_y, label_x, label_y, br))
        comb = K.comb_table_kernel()

        mesh = self._shardings.mesh if self._shardings is not None else None
        ndev = mesh.devices.size if mesh is not None else 1
        pad_to = br * ndev            # sharded batches split lanes evenly
        lane_sh = self._shardings.limbs if mesh is not None else None
        interpret = jax.default_backend() == "cpu"
        rebalance = self._rebalance
        # Detailed stage attribution costs one tiny D2H sync per batch (to
        # time the upload truly: on the axon tunnel block_until_ready does
        # not block), so it only runs when metrics are being emitted.
        detail = metrics is not None and bool(os.environ.get("CUDASP_METRICS"))
        # Upload-mode state (VERDICT r1 lever 1, r3 hi16, r4 full64).
        # "auto" ships batch 0 full (32-B x + parity) while measuring its
        # upload and kernel times, then picks per batch among:
        #   full64 (92 B/row @3 outputs, kernel skips the sqrt decompress
        #           — wins when the link outruns the kernel: PCIe hosts),
        #   full   (60 B/row, exact),
        #   hi8/hi16/hi32 (36/40/48 B/row prefilter + exact reverify —
        #           wins when the link is the bottleneck: the axon tunnel).
        # The rebalanced-exchange path always ships full.
        #
        # The flip NEVER compiles inside the scan (BENCH_r02's 222 s first
        # run was exactly that): "want" records the measured preference and
        # the feeder applies it only once its program is compiled (the
        # process-wide _warm_keys registry, filled by the background
        # prewarm thread). Until then batches ship full.
        auto = self._upload == "auto" and not rebalance and not interpret
        memo = BatchExecutor._auto_memo
        upload_state = {
            "mode": (self._upload
                     if self._upload in ("hi32", "hi16", "hi8", "full64")
                     and not rebalance
                     else "full"),    # explicit modes apply immediately
            "want": None,             # auto's measured preference
            "uploads": [],            # rolling (seconds, bytes) H2D times
            "kernel0": None,          # batch-0 kernel time (memo per shape)
            "mkey": None,             # memo key (set at batch 0)
            "veto": False,            # density veto: cuts off, sticky
            "hi_rows": 0,             # cut-mode rows (density feedback)
            "flagged": 0,             # ...of which needed the exact pass
            "M": None, "width": None, "cut_tag": "hi8",
        }
        # measured on this v5e by tools/ablate_probe.py (r4): the sqrt
        # decompress the full64 wire removes is 7.1% of the fused kernel
        SQRT_SHARE = 0.071

        def _decide():
            """Re-pick the upload mode from the rolling link-rate window
            vs the memoized batch-0 kernel time, by modeled batch latency
            t(mode) = max(bytes(mode)/link_rate, kernel(mode)). The
            kernel0 measurement runs once per program shape per process
            (the chip is stable); upload timings re-measure on EVERY auto
            batch because the link drifts 3-4x within hours (ROADMAP r3).
            Hysteresis (15%) keeps the mode from thrashing; the density
            veto removes the prefilter cuts for the rest of the scan."""
            k0 = upload_state["kernel0"]
            ups = upload_state["uploads"][-4:]
            if k0 is None or not ups:
                return
            rate = max(sent / dt for dt, sent in ups)    # B/s, best recent
            w, M = upload_state["width"], upload_state["M"]
            cut = upload_state["cut_tag"]
            cut_rows = (8 + M + 1 if cut == "hi32"
                        else 8 + (M + 2) // 2 if cut == "hi16"
                        else 8 + (M + 4) // 4)
            cand = {
                "full64": max(4 * w * (16 + 2 * M + 1) / rate,
                              k0 * (1.0 - SQRT_SHARE)),
                "full": max(4 * w * (8 + 2 * M + 1) / rate, k0),
                cut: max(4 * w * cut_rows / rate, k0),
            }
            if upload_state["veto"]:
                del cand[cut]
            cur = upload_state["want"] or "full"
            best = min(cand, key=cand.get)
            if best != cur and cand[best] < 0.85 * cand.get(
                    cur, float("inf")):
                upload_state["want"] = None if best == "full" else best

        def dispatch(dev, bmask, hi_only=False, nout=None, wire="x"):
            if rebalance:
                from ..parallel import exchange

                tw, oh, ol, ovm, shi, slo = dev
                return exchange.rebalanced_scan(
                    mesh, tw, oh, ol, ovm, shi, slo, digits, sx, sy, lx, ly,
                    comb, nlabels=nlabels, block_rows=br,
                    interpret=interpret, ladder=ladder,
                    static_sched=ssched)
            if mesh is None:
                # bit-packed flags (1 B/row -> 1 bit/row D2H) whenever the
                # lane width allows; hosts detect packing by dtype
                packf = dev[0].shape[1] % 32 == 0
                args = (*dev, digits, sx, sy, lx, ly, comb, bmask)
                if not interpret:
                    # AOT store (runtime/aot.py): a deserialized executable
                    # skips the ~30 s trace+lower AND the XLA compile —
                    # the reference's AOT-binary cold-start story
                    from . import aot

                    f = aot.maybe_call(args, nlabels=nlabels,
                                       block_rows=br, ladder=ladder,
                                       hi_only=hi_only, nout=nout,
                                       wire=wire, pack_flags=packf,
                                       static_sched=ssched)
                    if f is not None:
                        return f
                return K._scan_pallas_call(
                    *args, nlabels=nlabels, block_rows=br, ladder=ladder,
                    hi_only=hi_only, nout=nout, wire=wire,
                    pack_flags=packf, static_sched=ssched)
            packf = (dev[0].shape[1] // mesh.devices.size) % 32 == 0
            return K.scan_pallas_sharded(
                mesh, *dev, digits, sx, sy, lx, ly, comb, bmask,
                nlabels=nlabels, block_rows=br, interpret=interpret,
                ladder=ladder, hi_only=hi_only, nout=nout, wire=wire,
                pack_flags=packf, static_sched=ssched)

        # Host packing + H2D upload run on a feeder thread so the transfer
        # of batch i+1 rides alongside the kernel of batch i (the role of
        # the reference's per-batch CUDA streams + cudaMemcpyAsync,
        # src/cudasp_gpu.cu:504-510,609-662; measured 2.4x on the real
        # chip, where uploads otherwise serialize with compute).
        q: "queue.Queue" = queue.Queue(maxsize=3)
        stop = threading.Event()      # poison flag: consumer died, bail out

        def put(item) -> bool:
            """Bounded put that aborts when the consumer has stopped (a
            plain q.put could block forever against a full queue if the
            consumer raised — VERDICT r1 'feeder-thread shutdown edge')."""
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def vkey(width, M, tag):
            """Identity of one compiled kernel variant (jit-signature-ish).
            ladder_id folds the static schedule's digest in, so per-key
            compiled programs never share warm/memo entries across keys."""
            return (mesh, nlabels, br, ladder_id, int(width), int(M), tag)

        def variant_warm(width, M, tag, skip_v) -> bool:
            """A variant is dispatchable without an in-scan compile when
            the process-wide registry says it was compiled, OR the AOT
            store holds its executable (seeded deployments then ship the
            cut/thin wire from batch 0 of the FIRST scan of a process —
            pre-r5 the registry started cold and batch 0 always shipped
            full width, a ~40% byte tax on 2-batch scans)."""
            key = vkey(width, M, _variant_tag(tag, skip_v))
            if key in BatchExecutor._warm_keys:
                return True
            if mesh is not None or interpret:
                return False
            from . import aot

            packf = width % 32 == 0
            dig = _variant_signature(
                width, M, tag, skip_v, nlabels=nlabels, block_rows=br,
                ladder=ladder, digits_shape=digits.shape,
                nlimbs=sx.shape[0], L=lx.shape[0], pack_flags=packf,
                static_sched=ssched)
            if aot.lookup(dig) is not None:
                BatchExecutor._warm_keys.add(key)
                return True
            return False

        def cut_tag_for(M, want="hi8"):
            """The upload-cut variant actually usable at this outputs
            width: the packed validity unit caps hi8 at 6 outputs/row
            (needs bits 6/7) and hi16 at 14 (bits 14/15), so a wanted cut
            degrades one notch at a time — hi8 -> hi16 -> hi32. An
            explicit cut mode therefore degrades gracefully (with a
            warning) instead of raising mid-scan inside the feeder
            (ADVICE r3)."""
            if want == "hi8" and M > 6:
                import warnings

                warnings.warn(
                    f"hi8 upload supports at most 6 outputs/row "
                    f"(got {M}); using hi16", stacklevel=2)
                want = "hi16"
            if want == "hi16" and M > 14:
                import warnings

                warnings.warn(
                    f"hi16 upload supports at most 14 outputs/row "
                    f"(got {M}); using hi32", stacklevel=2)
                return "hi32"
            return want

        def upload_planes(planes, hi_only, pad_width=None):
            """One combined H2D transfer per batch + device-side split.
            The dummy planes of the cut modes (lo always; ovm too under
            hi16) never cross the link — zeros are created on device.
            pad_width: widen the planes to this lane count with DEVICE-side
            zeros after the transfer (reverify reuses the scan's compiled
            width without shipping the padding over the link)."""
            if hi_only in ("hi16", "hi8"):
                wide = [planes[0], planes[1]]
            elif hi_only:
                wide = [planes[0], planes[1], planes[3]]
            else:
                wide = list(planes)
            big = np.concatenate(wide, axis=0)
            devb = jax.device_put(big, lane_sh)
            if pad_width is not None and pad_width > big.shape[1]:
                devb = jnp.concatenate(
                    [devb, jnp.zeros((big.shape[0],
                                      pad_width - big.shape[1]),
                                     jnp.uint32)], axis=1)
                if lane_sh is not None:
                    devb = jax.device_put(devb, lane_sh)
            parts = _plane_splitter(tuple(p.shape[0] for p in wide))(devb)
            if not hi_only:
                return parts

            def zrep(shape):
                z = jnp.zeros(shape, jnp.uint32)
                if mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec

                    z = jax.device_put(z, NamedSharding(
                        mesh, PartitionSpec(None, None)))
                return z

            if hi_only in ("hi16", "hi8"):
                return (parts[0], parts[1], zrep(planes[2].shape),
                        zrep(planes[3].shape))
            return (parts[0], parts[1], zrep(planes[2].shape), parts[2])

        def prewarm(width, M):
            """Background compile of the kernel variants this scan may
            still dispatch, via dummy calls on zero planes of the exact
            production shapes (a dummy call populates the jit dispatch
            cache directly, unlike AOT lower().compile()). Runs once batch
            0's width is known; the auto-flip to hi32 and the tail batch's
            skip program then never compile inside the timed loop
            (BENCH_r02 weak #3: a 222 s first scan from exactly that)."""
            try:
                from jax.sharding import NamedSharding, PartitionSpec

                def zdev(shape):
                    # jnp.zeros fills on device — dummy planes must NOT
                    # ride (and pollute the measurement of) the H2D link.
                    # Width-1 dummies REPLICATE on a mesh (lane-sharding a
                    # width-1 array raises on ndev > 1 and the bare except
                    # below would silently kill the whole prewarm).
                    z = jnp.zeros(shape, jnp.uint32)
                    if mesh is None:
                        return z
                    sh = (NamedSharding(mesh, PartitionSpec(None, None))
                          if shape[-1] == 1 else lane_sh)
                    return jax.device_put(z, sh)

                variants = []     # (mode tag or None=full, skip flag)
                if upload_state["mode"] in ("hi32", "hi16", "hi8",
                                            "full64"):
                    m0 = upload_state["mode"]
                    t0 = m0 if m0 == "full64" else cut_tag_for(M, m0)
                    variants += [(t0, False), (t0, True)]
                elif auto:
                    # warm both directions the per-batch decision can
                    # flip to: the cut variant (link can degrade mid-scan)
                    # and the full64 wire (link can outrun the kernel) —
                    # each in skip-free AND skip (tail) form, so the tail
                    # batch ships the same thin wire as the main batches
                    ct = cut_tag_for(M)
                    variants += [(ct, False), ("full64", False),
                                 (ct, True), ("full64", True)]
                variants.append((None, True))         # full, skip (tail)
                nblk = width // br
                for tag, skip_v in variants:
                    if stop.is_set():
                        return
                    hi_val = (True if tag == "hi32" else
                              tag if tag in ("hi16", "hi8") else False)
                    wire = "xy" if tag == "full64" else "x"
                    if tag in ("hi16", "hi8"):  # packed units, dummy lo/ovm
                        Mp = (M + 2) // 2 if tag == "hi16" else (M + 4) // 4
                        dev = (zdev((8, width)), zdev((Mp, width)),
                               zdev((1, 1)), zdev((1, 1)))
                    else:
                        tw_rows = 16 if tag == "full64" else 8
                        dev = (zdev((tw_rows, width)), zdev((M, width)),
                               zdev((M, 1) if hi_val else (M, width)),
                               zdev((1, width)))
                    bmask = None
                    if skip_v:
                        m = np.ones(nblk, np.int32)
                        m[-1] = 0
                        bmask = jnp.asarray(m)
                        if mesh is not None:
                            bmask = jax.device_put(bmask, NamedSharding(
                                mesh, PartitionSpec("data")))
                    jax.block_until_ready(dispatch(
                        dev, bmask, hi_only=hi_val,
                        nout=M if tag in ("hi16", "hi8") else None,
                        wire=wire))
                    BatchExecutor._warm_keys.add(
                        vkey(width, M, _variant_tag(tag, skip_v)))
            except Exception as e:                    # pragma: no cover
                # prewarm is advisory (the scan keeps shipping full-width
                # uploads), but a silent compile failure means the cut
                # modes NEVER engage — log once per process and count it
                # so the CUDASP_METRICS line shows why no cut happened
                # (VERDICT r4 weak #5)
                BatchExecutor._prewarm_failures += 1
                if not BatchExecutor._prewarm_logged:
                    BatchExecutor._prewarm_logged = True
                    import logging

                    logging.getLogger("cudasp_tpu").warning(
                        "background kernel-variant prewarm failed "
                        "(upload cuts stay disabled for un-warmed "
                        "variants): %r", e)

        def feeder():
            width = 0                 # uniform lane width: every batch padded
            # to the widest seen, so one scan compiles ONE program shape
            # per (skip, hi_only) variant instead of one per tail size
            try:
                for i, b in enumerate(batches):
                    if stop.is_set():
                        return
                    blobs = b.tweak_blobs
                    if blobs is None:   # caller packed with layout="xla"
                        raise ValueError(
                            "pallas backend needs layout='kernel' batches")
                    n = blobs.shape[0]
                    width = max(width, pad_to,
                                ((n + pad_to - 1) // pad_to) * pad_to)
                    M_b = b.outputs_hi.shape[1]
                    cut_tag = cut_tag_for(
                        M_b, upload_state["mode"]
                        if upload_state["mode"] in ("hi32", "hi16", "hi8")
                        else "hi8")
                    if i == 0:
                        # publish batch-0 shape facts for _decide and the
                        # memoized kernel measurement; a prior scan's
                        # memoized decision applies from batch 0
                        upload_state["M"] = M_b
                        upload_state["width"] = width
                        upload_state["cut_tag"] = cut_tag
                        upload_state["mkey"] = vkey(width, M_b, "kernel0")
                        if auto:
                            mm = memo.get(upload_state["mkey"], {})
                            upload_state["kernel0"] = mm.get("kernel0")
                            upload_state["want"] = mm.get("decision")
                    n_live = int(b.row_valid.sum())
                    will_skip = (not rebalance and
                                 K.live_blockmask(n_live, width // br, br)
                                 is not None)
                    # non-full modes apply under auto only once their
                    # program is compiled (the process-wide _warm_keys
                    # registry); the tail (skip) batch ships the same thin
                    # wire once ITS skip-variant program is warm, else
                    # full (pre-r4 it always shipped full — 60 B against
                    # the main batches' 36, a 25% byte tax on 2-batch
                    # scans)
                    target = upload_state["mode"]
                    if target == "full" and auto and upload_state["want"]:
                        # a memoized cut decision resolves to the cut tag
                        # usable at THIS M before the warm-registry check
                        # (a stale "hi16" memo must not dispatch an
                        # un-warmed hi8 program, or vice versa)
                        w_tag = upload_state["want"]
                        if w_tag in ("hi32", "hi16", "hi8"):
                            w_tag = cut_tag
                        if variant_warm(width, M_b, w_tag, False):
                            target = w_tag
                    if target in ("hi32", "hi16", "hi8"):
                        target = cut_tag
                    if will_skip and target != "full" and \
                            not variant_warm(width, M_b, target, True):
                        # never compile a skip-variant inside the scan —
                        # the prewarm thread (or the AOT store) makes it
                        # warm, usually before the tail arrives
                        target = "full"
                    hi_only = (True if target == "hi32" else
                               target if target in ("hi16", "hi8")
                               else False)
                    wire = "xy" if target == "full64" else "x"
                    if target != "full":
                        upload_state["cut_used"] = target
                    planes = K.pack_batch_arrays(
                        blobs, b.row_valid, b.outputs_hi,
                        b.outputs_lo, b.outputs_valid, width,
                        hi_only=hi_only, wire=wire)
                    srcs = b.source_rows
                    if rebalance:
                        # source-row planes ride the exchange with their
                        # rows; flags come back in rebalanced lane order
                        pad = planes[0].shape[1] - len(srcs)
                        s64 = np.concatenate(
                            [srcs, np.full(pad, -1, np.int64)])
                        shi, slo = split_outputs_i64(s64)
                        planes = planes + (
                            np.ascontiguousarray(shi[None]),
                            np.ascontiguousarray(slo[None]))
                    t0 = time.perf_counter()
                    dev = (tuple(jax.device_put(a, lane_sh)
                                 for a in planes) if rebalance
                           else upload_planes(planes, hi_only))
                    if detail or auto:
                        # force transfer completion with a tiny D2H read
                        # (one ~45 ms ping per batch; under auto it feeds
                        # the per-batch upload-vs-kernel decision). The
                        # ping ALSO serializes the tunnel: an every-4th
                        # sampling variant let async device_puts overlap
                        # and the tunnel degrades under concurrent
                        # transfers (measured 7.4 s vs 6.0 s on the same
                        # 2M-row scan at a FASTER link) — do not retry.
                        np.asarray(dev[0][:1, :1])
                        dt = time.perf_counter() - t0
                        if auto:
                            sent = sum(a.nbytes for a in planes)
                            upload_state["uploads"].append((dt, sent))
                            _decide()
                        if detail:
                            metrics.upload_seconds += dt
                            metrics.upload_bytes += sum(
                                a.nbytes for a in planes)
                    bmask = None
                    if not rebalance:
                        # valid rows are a prefix of the packed lanes —
                        # padding tiles skip the whole EC pipeline on device
                        # (None for fully-live batches: the skip-free
                        # variant pipelines a few percent better); the
                        # rebalanced path derives its mask on device
                        bmask = K.live_blockmask(
                            n_live, planes[0].shape[1] // br, br)
                    if bmask is not None:
                        bmask = jnp.asarray(bmask)
                        if mesh is not None:
                            from jax.sharding import (NamedSharding,
                                                      PartitionSpec)

                            bmask = jax.device_put(
                                bmask,
                                NamedSharding(mesh, PartitionSpec("data")))
                    payload = b if hi_only else None
                    if not put((i, n, (dev, bmask), srcs, payload,
                                hi_only, wire)):
                        return
            except Exception as e:                      # noqa: BLE001
                put(e)
                return
            put(None)

        pending = []                  # hi32 rows awaiting exact re-verify:
        # (result slot, flagged idx, sliced tweak/oh/ol/ov arrays) — only
        # the flagged rows' slices are retained, not the whole batch (an
        # all-match table would otherwise hold every batch in host memory)

        def read_back(entry):
            """Blocking device->host read of one in-flight result."""
            n, f, srcs, payload = entry
            t0 = time.perf_counter()
            if rebalance:
                flags, shi, slo = f
                fl = np.asarray(flags)[0] != 0
                srcs = ((np.asarray(shi)[0].astype(np.int64) << 32)
                        | (np.asarray(slo)[0].astype(np.int64)
                           & 0xFFFFFFFF))
            else:
                fl = _flags_to_bool(np.asarray(f), n)
            if detail:
                metrics.device_wait_seconds += time.perf_counter() - t0
            if payload is not None:
                # hi32 prefilter flags are a superset of the exact flags:
                # queue flagged rows for the exact pass, emit zeros now and
                # let _reverify fill the slot in
                flagged = np.flatnonzero(fl)
                final = np.zeros(n, bool)
                results.append([final, srcs])
                if len(flagged):
                    p = payload
                    pending.append((
                        len(results) - 1, flagged,
                        p.tweak_blobs[flagged].copy(),
                        p.outputs_hi[flagged].copy(),
                        p.outputs_lo[flagged].copy(),
                        p.outputs_valid[flagged].copy()))
                # density feedback: when most rows get flagged (high-match
                # tables), the prefilter roughly doubles device work —
                # veto the cut modes for the rest of the scan (sticky);
                # _decide re-picks among full/full64
                upload_state["hi_rows"] += n
                upload_state["flagged"] += len(flagged)
                if (auto and upload_state["hi_rows"] >= pad_to
                        and upload_state["flagged"]
                        > 0.05 * upload_state["hi_rows"]):
                    upload_state["veto"] = True
                    if upload_state["want"] in ("hi8", "hi16", "hi32"):
                        upload_state["want"] = None
                    _decide()
                return
            results.append([fl, srcs])

        def reverify(width):
            """Exact pass over hi32-flagged rows: re-scan them with full
            60 B/row planes through the scan's already-compiled program
            shape (dead blocks skipped via the blockmask — no new lane
            width is ever compiled here). Flags land back in their
            batches' result slots."""
            rows = sum(len(fl) for _, fl, *_ in pending)
            if metrics is not None:
                metrics.reverified_rows += rows
            tw = np.concatenate([p[2] for p in pending])
            oh = np.concatenate([p[3] for p in pending])
            ol = np.concatenate([p[4] for p in pending])
            ov = np.concatenate([p[5] for p in pending])
            exact = np.zeros(rows, bool)
            for a in range(0, rows, width):
                bslice = slice(a, min(a + width, rows))
                nsub = bslice.stop - a
                # pack only the live prefix (a handful of flagged rows,
                # usually); the device pads to the scan's compiled width
                small = min(width,
                            max(pad_to,
                                ((nsub + pad_to - 1) // pad_to) * pad_to))
                planes = K.pack_batch_arrays(
                    tw[bslice], np.ones(nsub, bool), oh[bslice],
                    ol[bslice], ov[bslice], small)
                bmask = K.live_blockmask(nsub, width // br, br)
                if bmask is not None:
                    bmask = jnp.asarray(bmask)
                    if mesh is not None:
                        from jax.sharding import (NamedSharding,
                                                  PartitionSpec)

                        bmask = jax.device_put(
                            bmask,
                            NamedSharding(mesh, PartitionSpec("data")))
                dev = upload_planes(planes, False, pad_width=width)
                f = dispatch(dev, bmask, hi_only=False)
                exact[bslice] = _flags_to_bool(np.asarray(f), nsub)
            at = 0
            for slot, flagged, *_ in pending:
                results[slot][0][flagged] = exact[at: at + len(flagged)]
                at += len(flagged)

        th = threading.Thread(target=feeder, daemon=True)
        timer = Timer()
        th.start()
        in_flight = []
        results: List[list] = []
        nb = 0
        scan_width = 0
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise ExecutionError(nb, item) from item
                i, n, (dev, bmask), srcs, payload, hi_val, wire = item
                scan_width = max(scan_width, dev[0].shape[1])
                nb += 1
                # one retry, then raise (SURVEY §5 elastic-recovery target;
                # the reference instead SILENTLY zero-matches a failed
                # batch, src/cudasp_gpu.cu:467-469 — retry-then-loud beats
                # both silent data loss and fail-on-first-hiccup: the axon
                # transport occasionally drops one dispatch)
                nkw = dict(hi_only=hi_val, wire=wire,
                           nout=(payload.outputs_hi.shape[1]
                                 if hi_val in ("hi16", "hi8") else None))
                try:
                    flags = dispatch(dev, bmask, **nkw)
                except Exception as e:                  # noqa: BLE001
                    if metrics is not None:
                        metrics.batch_retries += 1
                    try:
                        flags = dispatch(dev, bmask, **nkw)
                    except Exception:
                        raise ExecutionError(i, e) from e
                in_flight.append((n, flags, srcs, payload))
                if auto and i == 0 and upload_state["kernel0"] is None:
                    # measure the bare kernel on batch 0: dispatch()
                    # returned after compilation, inputs are resident (the
                    # feeder synced the transfer), the device is otherwise
                    # idle. The wait below is kernel + a sync/readback
                    # constant C (~45-70 ms ping + the flags D2H, which
                    # spikes to hundreds of ms on the tunnel) — measured
                    # at face value it inflated kernel0 ~30% and made the
                    # model believe the kernel binds, suppressing the cut
                    # modes on link-bound scans. Two more back-to-back
                    # dispatches of the resident batch cover 2*kernel + C,
                    # so the difference isolates the kernel. Cost: ~two
                    # extra kernel runs ONCE per program shape per process
                    # (memoized), plus batch 0's lost overlap.
                    t0 = time.perf_counter()
                    entry0 = in_flight.pop(0)
                    read_back(entry0)
                    t1 = time.perf_counter() - t0
                    t0 = time.perf_counter()
                    kw = dict(hi_only=hi_val, wire=wire,
                              nout=(payload.outputs_hi.shape[1]
                                    if hi_val in ("hi16", "hi8")
                                    else None))
                    dispatch(dev, bmask, **kw)
                    f3 = dispatch(dev, bmask, **kw)
                    np.asarray(f3)        # device executes in order
                    dt2 = time.perf_counter() - t0
                    # clamp into [1 ms, t1]: an absolute floor, NOT a
                    # fraction of t1 — when the flags D2H spikes to 100s of
                    # ms, t1 is dominated by the readback constant and the
                    # true kernel is legitimately far below t1/4; a t1/4
                    # floor would inflate kernel0 (memoized process-wide)
                    # and re-suppress the cut modes (ADVICE r4). A tunnel
                    # hiccup in the second window can only overstate the
                    # kernel, which at worst delays a cut, never breaks it.
                    upload_state["kernel0"] = min(
                        max(dt2 - t1, 1e-3), t1)
                    _decide()
                if i == 0 and not rebalance and not interpret:
                    # background-compile the variants this scan may still
                    # need (after the kernel0 measurement, which must see
                    # an otherwise-idle device)
                    M_real = (payload.outputs_hi.shape[1]
                              if payload is not None else dev[1].shape[0])
                    # keeps running past scan end on purpose (it compiles
                    # variants for future scans); _prewarm_thread exposed
                    # so tests/shutdown hooks can join it
                    self._prewarm_thread = threading.Thread(
                        target=prewarm,
                        args=(dev[0].shape[1], M_real),
                        daemon=True)
                    BatchExecutor._register_atexit()
                    self._prewarm_thread.start()
                    BatchExecutor._prewarm_threads.append(
                        self._prewarm_thread)
                while len(in_flight) > 3:
                    read_back(in_flight.pop(0))
            for entry in in_flight:
                read_back(entry)
            if pending:
                reverify(scan_width)
        finally:
            stop.set()
            # a feeder blocked on a full queue unblocks within one put
            # timeout once drained; join must not mask a stuck thread
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            th.join(timeout=10.0)
            if th.is_alive():         # pragma: no cover - defensive
                import sys

                if sys.exc_info()[0] is None:    # don't mask a live error
                    raise RuntimeError("feeder thread failed to shut down")
        if auto and upload_state["mkey"] is not None:
            # memoized PER PROGRAM SHAPE (ADVICE r3: a later scan with a
            # different batch width/M must not reuse a kernel time
            # measured for a different amount of work). Bounded: a
            # long-lived service scanning many shapes/keys must not grow
            # the memo without limit (VERDICT r4 weak #5) — evict oldest.
            memo[upload_state["mkey"]] = {
                "kernel0": upload_state["kernel0"],
                "decision": upload_state["want"],
            }
            while len(memo) > 64:
                memo.pop(next(iter(memo)))
        if metrics is not None:
            metrics.device_seconds += timer.lap()
            metrics.batches += nb
            metrics.upload_mode = (
                upload_state.get("cut_used")
                or (upload_state["mode"]
                    if upload_state["mode"] != "full" else "full"))
            metrics.prewarm_failures = BatchExecutor._prewarm_failures
            metrics.warm_variants = len(BatchExecutor._warm_keys)
        return [tuple(r) for r in results]
