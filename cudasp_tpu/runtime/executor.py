"""Batch executor: feeds packed batches through the jitted pipeline.

Replaces the reference's L3/L4 scheduling machinery (per-thread
accumulators, round-robin GPU pinning, per-batch streams, mutex-guarded
merge — src/cudasp_extension.cu:122-152,226-410): JAX's async dispatch
gives stream-like overlap for free (we enqueue batch i+1 before reading
batch i's flags), and sharded execution over a device mesh replaces
multi-GPU round-robin.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import jax

from ..io.ingest import PackedBatch
from ..ops import pipeline as PL
from .errors import ExecutionError
from .metrics import ScanMetrics, Timer


class BatchExecutor:
    """Runs packed batches on one device or a data-sharded mesh."""

    def __init__(self, mesh=None, fused: bool = False):
        self._shardings = None
        if mesh is not None:
            from ..parallel.mesh import BatchShardings

            self._shardings = BatchShardings(mesh)
        self._fused = fused

    def run(
        self,
        batches: Sequence[PackedBatch],
        scan_windows: np.ndarray,
        spend_x: np.ndarray,
        spend_y: np.ndarray,
        label_x: np.ndarray,
        label_y: np.ndarray,
        nlabels: int,
        metrics: Optional[ScanMetrics] = None,
    ) -> List[np.ndarray]:
        """Returns per-batch (B,) bool match flags (numpy)."""
        fn = PL.scan_batch_fused if self._fused else PL.scan_batch
        if self._shardings is not None:
            w, sx, sy, lx, ly = self._shardings.put_query(
                scan_windows, spend_x, spend_y, label_x, label_y)
        else:
            w, sx, sy, lx, ly = (jax.device_put(a) for a in (
                scan_windows, spend_x, spend_y, label_x, label_y))

        timer = Timer()
        in_flight = []
        results: List[Optional[np.ndarray]] = [None] * len(batches)
        for i, b in enumerate(batches):
            try:
                if self._shardings is not None:
                    args = self._shardings.put_batch(b)
                else:
                    args = tuple(jax.device_put(a) for a in (
                        b.tweak_x, b.tweak_y, b.row_valid, b.outputs_hi,
                        b.outputs_lo, b.outputs_valid))
                flags = fn(*args, w, sx, sy, lx, ly, nlabels=nlabels)
            except Exception as e:                      # noqa: BLE001
                raise ExecutionError(i, e) from e
            in_flight.append((i, flags))
            # keep a small window in flight (async dispatch overlap, the
            # role of the reference's per-batch CUDA streams)
            while len(in_flight) > 2:
                j, f = in_flight.pop(0)
                results[j] = np.asarray(f)
        for j, f in in_flight:
            results[j] = np.asarray(f)
        if metrics is not None:
            metrics.device_seconds += timer.lap()
            metrics.batches += len(batches)
        return results
