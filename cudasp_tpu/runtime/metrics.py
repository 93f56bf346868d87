"""Structured scan metrics (the observability tier the reference lacks:
SURVEY.md §5 — printf-on-error only)."""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Dict, List


@dataclass
class ScanMetrics:
    rows_in: int = 0
    rows_scanned: int = 0          # virtual rows incl. overflow splits
    batches: int = 0
    matches: int = 0
    pack_seconds: float = 0.0
    device_seconds: float = 0.0
    total_seconds: float = 0.0
    batch_size: int = 0
    n_devices: int = 1
    # Stage attribution (populated when CUDASP_METRICS is set — timing the
    # upload needs a per-batch D2H sync, see executor._run_pallas):
    #   pack_seconds        host packing (feeder thread)
    #   upload_seconds      H2D transfer, measured to completion
    #   device_wait_seconds consumer time blocked on flag readback
    # pack+upload run on the feeder thread and overlap device compute, so
    # the three do NOT sum to total_seconds; the LARGEST of
    # (pack+upload, device_wait) names the bottleneck (`bottleneck`).
    upload_seconds: float = 0.0
    upload_bytes: int = 0
    device_wait_seconds: float = 0.0
    # upload cuts (executor upload="hi32"/"hi16"/"hi8"/"auto"): rows
    # whose prefilter flag needed the exact second pass, and the mode the
    # scan settled on ("full" / "full64" / "hi32" / "hi16" / "hi8")
    reverified_rows: int = 0
    upload_mode: str = ""
    # prewarm/registry state at scan end (VERDICT r4 weak #5): failures>0
    # explains a scan that never cut; warm_variants is the process-wide
    # compiled-variant count feeding the warm-registry gate
    prewarm_failures: int = 0
    warm_variants: int = 0
    # batch retry/requeue (SURVEY §5): transient ExecutionErrors retried
    # once before raising
    batch_retries: int = 0

    @property
    def bottleneck(self) -> str:
        host = self.pack_seconds + self.upload_seconds
        if not (host or self.device_wait_seconds):
            return "unknown"
        return "host(pack+upload)" if host > self.device_wait_seconds \
            else "device"

    @property
    def rows_per_second(self) -> float:
        return self.rows_in / self.total_seconds if self.total_seconds else 0.0

    def as_dict(self) -> Dict:
        d = dict(self.__dict__)
        d["rows_per_second"] = self.rows_per_second
        d["bottleneck"] = self.bottleneck
        return d


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt
