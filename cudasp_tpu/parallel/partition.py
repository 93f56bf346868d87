"""Multi-host partitioning for pod-scale scans.

Design (BASELINE.json north star; the reference has NO multi-node story —
SURVEY.md §2.4 'Communication backend: none'):

  * rows are hash-partitioned across hosts by txid (any stable key) so a
    100M+-row table streams from per-host storage without a central node;
  * each host packs and scans its shard on its local chips (data-parallel
    mesh over ICI);
  * the only cross-host traffic is the match merge — match flags/indices,
    a few bytes per matching row (all_gather over DCN), overlapped with
    the next batch's compute by async dispatch.

Because rows are independent, hash partitioning balances row counts
statistically when every host can read any file. When placement is FIXED
(hosts own specific files/row groups) and counts skew, parallel.exchange
rebalances packed rows across the mesh with a strided all_to_all before
EC compute. Skewed *outputs lengths* are handled locally by virtual-row
splitting (io.ingest).
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np


def partition_rows(keys: np.ndarray, n_parts: int,
                   salt: int = 0x9E3779B97F4A7C15) -> np.ndarray:
    """Stable hash partition: per-row part index in [0, n_parts).

    keys: (n,) uint64-convertible or (n, k) uint8 row keys."""
    k = np.asarray(keys)
    if k.dtype == np.uint8 and k.ndim == 2:
        # fold bytes into u64 (FNV-ish, vectorized)
        acc = np.full(k.shape[0], 0xCBF29CE484222325, np.uint64)
        for c in range(k.shape[1]):
            acc = (acc ^ k[:, c].astype(np.uint64)) * np.uint64(0x100000001B3)
    else:
        acc = k.astype(np.uint64)
    acc ^= np.uint64(salt)
    acc *= np.uint64(0xFF51AFD7ED558CCD)
    acc ^= acc >> np.uint64(33)
    return (acc % np.uint64(n_parts)).astype(np.int64)


def local_shard_indices(keys: np.ndarray, n_hosts: int,
                        host_id: int) -> np.ndarray:
    """Row indices this host owns."""
    return np.flatnonzero(partition_rows(keys, n_hosts) == host_id)


def merge_matches(local_indices: Sequence[np.ndarray]) -> np.ndarray:
    """Merge per-host matched row indices (host-side all_gather analog for
    single-process tests; in a jax.distributed deployment this is
    multihost_utils.process_allgather)."""
    if not local_indices:
        return np.zeros(0, np.int64)
    return np.unique(np.concatenate([np.asarray(i) for i in local_indices]))


def distributed_scan(table_keys: np.ndarray, scan_fn, n_hosts: int,
                     host_id: Optional[int] = None):
    """Single-host simulation/driver of the multi-host protocol.

    scan_fn(shard_indices) -> matched shard indices (absolute). When
    host_id is None, runs every host's shard serially (testing); in a real
    deployment each process calls with its own host_id and merges via
    process_allgather."""
    if host_id is not None:
        return scan_fn(local_shard_indices(table_keys, n_hosts, host_id))
    parts = [scan_fn(local_shard_indices(table_keys, n_hosts, h))
             for h in range(n_hosts)]
    return merge_matches(parts)
