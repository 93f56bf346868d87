"""Resumable scans: a batch cursor over 100M+-row tables.

The reference has no resume story — a dead query rescans from row 0
(SURVEY.md §5 'Checkpoint / resume: none'). Here a scan over a huge table
streams in chunks; after each chunk the cursor (rows consumed + matches so
far) can be persisted, and a restarted scan continues from the last
checkpoint instead of rescanning.

The cursor is deliberately tiny and engine-agnostic JSON: resuming does
not require the same process, host, or mesh shape — only the same table
order and query keys (both are checksummed to catch mismatched resumes).
"""

from __future__ import annotations

import hashlib
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional


def _query_digest(scan_key: bytes, spend_key: bytes, labels) -> str:
    h = hashlib.sha256()
    h.update(bytes(scan_key))
    h.update(bytes(spend_key))
    for lb in labels:
        h.update(bytes(lb))
    return h.hexdigest()[:16]


@dataclass
class ScanCursor:
    """Progress of a resumable scan."""
    rows_done: int = 0
    matches: List[int] = field(default_factory=list)
    query_digest: str = ""

    def save(self, path: str) -> None:
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump({"rows_done": self.rows_done,
                       "matches": self.matches,
                       "query_digest": self.query_digest}, f)
        os.replace(tmp, path)          # atomic on POSIX

    @classmethod
    def load(cls, path: str) -> "ScanCursor":
        with open(path) as f:
            d = json.load(f)
        return cls(rows_done=int(d["rows_done"]),
                   matches=[int(m) for m in d["matches"]],
                   query_digest=d.get("query_digest", ""))

    @classmethod
    def load_or_new(cls, path: Optional[str]) -> "ScanCursor":
        if path and os.path.exists(path):
            return cls.load(path)
        return cls()


def scan_resumable(
    table,
    scan_private_key: bytes,
    spend_public_key: bytes,
    label_keys=(),
    *,
    cursor: Optional[ScanCursor] = None,
    checkpoint_path: Optional[str] = None,
    chunk_rows: int = 1 << 20,
    config=None,
):
    """Scan `table` in chunk_rows-row chunks, checkpointing after each.

    Returns (ScanResult-like indices list, cursor). If `cursor` (or the
    file at checkpoint_path) says N rows are done, the first N rows are
    skipped entirely — no packing, no device work."""
    import numpy as np

    from ..api import scan, _slice_col, _table_columns

    digest = _query_digest(scan_private_key, spend_public_key, label_keys)
    if cursor is None:
        cursor = ScanCursor.load_or_new(checkpoint_path)
    if cursor.query_digest and cursor.query_digest != digest:
        raise ValueError(
            "checkpoint was written by a different query (key mismatch); "
            "refusing to resume")
    cursor.query_digest = digest

    cols = _table_columns(table)
    n = len(cols["tweak_key"])

    while cursor.rows_done < n:
        a = cursor.rows_done
        b = min(a + chunk_rows, n)
        chunk = {name: _slice_col(c, a, b) for name, c in cols.items()}
        res = scan(chunk, scan_private_key, spend_public_key, label_keys,
                   config=config)
        cursor.matches.extend((res.indices + a).tolist())
        cursor.rows_done = b
        if checkpoint_path:
            cursor.save(checkpoint_path)
    return np.asarray(sorted(set(cursor.matches)), np.int64), cursor
