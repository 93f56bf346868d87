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

    @property
    def rows_per_second(self) -> float:
        return self.rows_in / self.total_seconds if self.total_seconds else 0.0

    def as_dict(self) -> Dict:
        d = dict(self.__dict__)
        d["rows_per_second"] = self.rows_per_second
        return d


class Timer:
    def __init__(self):
        self.t0 = time.perf_counter()

    def lap(self) -> float:
        now = time.perf_counter()
        dt = now - self.t0
        self.t0 = now
        return dt
