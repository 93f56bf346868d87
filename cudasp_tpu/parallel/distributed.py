"""Multi-host deployment glue: jax.distributed + hash-partitioned scans.

The reference is strictly single-node (SURVEY.md §2.4: no NCCL/MPI, GPUs
never exchange data); its multi-GPU scaling tops out at 58% efficiency
because one host thread feeds both GPUs (README.md:139-140). The TPU-native
design removes that bottleneck structurally:

  * every host reads and packs ONLY its own hash-partition of the table
    (parallel.partition — no central ingest thread);
  * each host's chips run the fused Pallas kernel over a local 'data' mesh
    (ops.kernels.scan_pallas_sharded);
  * the only cross-host traffic is the match merge — a few bytes per
    matching row, all-gathered over DCN once per scan (not per batch), so
    scaling efficiency is bounded by partition balance (~ n/N ± sqrt),
    not by a serial feeder.

Run one process per host:

    import cudasp_tpu.parallel.distributed as D
    D.init(coordinator_address="host0:8476", num_processes=N, process_id=i)
    matches = D.multihost_scan(my_table_source, scan_key, spend_key, labels)

Every function degrades gracefully to single-process (tests run the same
code path with n_hosts=1 or via partition.distributed_scan simulation).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from . import partition


def init(coordinator_address: Optional[str] = None,
         num_processes: Optional[int] = None,
         process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks; no-op when
    single-process (coordinator unset and JAX already initialized)."""
    import jax

    if coordinator_address is None and num_processes in (None, 1):
        return
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def host_info():
    import jax

    return jax.process_index(), jax.process_count()


def local_mesh():
    """Mesh over this process's local chips (data axis). In a pod slice
    each process drives its own chips; cross-host merge is explicit."""
    import jax
    from .mesh import DATA_AXIS, Mesh

    return Mesh(np.asarray(jax.local_devices()), (DATA_AXIS,))


def allgather_matches(local_indices: np.ndarray) -> np.ndarray:
    """Union of per-host matched row indices. Single-process: identity.
    Multi-process: one process_allgather over DCN (variable-size safe via
    pad-to-max + count)."""
    import jax

    if jax.process_count() == 1:
        return np.unique(np.asarray(local_indices, np.int64))
    from jax.experimental import multihost_utils

    local = np.asarray(local_indices, np.int64)
    counts = multihost_utils.process_allgather(
        np.asarray([local.size], np.int64))
    m = int(counts.max())
    padded = np.full(m, -1, np.int64)
    padded[: local.size] = local
    gathered = multihost_utils.process_allgather(padded)  # (nproc, m)
    flat = np.asarray(gathered).reshape(-1)
    return np.unique(flat[flat >= 0])


def multihost_scan(
    table,
    scan_private_key: bytes,
    spend_public_key: bytes,
    label_keys: Sequence[bytes] = (),
    *,
    partition_key: str = "txid",
    config=None,
) -> np.ndarray:
    """Scan `table` cooperatively across all hosts; returns the global
    matched row indices on every host.

    Each host keeps only its hash-partition of the rows (stable in the
    original row order, so returned indices are global), scans it on its
    local chips, and all-gathers the matches."""
    from ..api import scan, ScanConfig, _table_columns

    host, n_hosts = host_info()
    cols = _table_columns(table)
    if partition_key in cols:
        col = cols[partition_key]
        if isinstance(col, np.ndarray) and col.dtype == np.uint8 \
                and col.ndim == 2:
            keys = col
        else:
            if hasattr(col, "to_pylist"):
                col = col.to_pylist()
            rows = [(bytes(b) if b is not None else b"")[:32] for b in col]
            keys = np.zeros((len(rows), 32), np.uint8)
            for i, b in enumerate(rows):
                keys[i, : len(b)] = np.frombuffer(b, np.uint8)
        mine = partition.local_shard_indices(keys, n_hosts, host)
    else:                       # fall back to round-robin by row index
        n = len(cols["tweak_key"])
        mine = np.arange(host, n, n_hosts, dtype=np.int64)

    def _take(col, idx):
        if isinstance(col, np.ndarray):
            return col[idx]
        if hasattr(col, "take"):               # pyarrow
            return col.take(idx)
        if isinstance(col, tuple):             # CSR outputs
            flat, offs = col
            offs = np.asarray(offs, np.int64)
            lens = (offs[1:] - offs[:-1])[idx]
            new_off = np.zeros(len(idx) + 1, np.int64)
            np.cumsum(lens, out=new_off[1:])
            gidx = (np.repeat(offs[idx] - new_off[:-1], lens)
                    + np.arange(new_off[-1], dtype=np.int64))
            return (np.asarray(flat, np.int64)[gidx], new_off)
        return [col[int(i)] for i in idx]

    shard = {name: _take(c, mine) for name, c in cols.items()}
    cfg = config or ScanConfig()
    if cfg.mesh is None:
        cfg.mesh = local_mesh()
    res = scan(shard, scan_private_key, spend_public_key, label_keys,
               config=cfg)
    return allgather_matches(mine[res.indices])
