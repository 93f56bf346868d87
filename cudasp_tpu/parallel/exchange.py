"""Device-side all_to_all row exchange with skew handling.

The reference has no cross-device communication at all (SURVEY.md §2.4 —
its GPUs never exchange data, and its multi-GPU scaling tops out at 58%
because one host thread feeds both). Hash partitioning (parallel.partition)
balances ingest statistically, but when data placement is FIXED — each
host owns specific files or row groups — per-device row counts skew, and
the slowest shard gates the scan. This module rebalances packed row planes
ACROSS THE MESH before EC compute:

 1. **Strided all_to_all**: device d sends its lane l to device (l mod N).
    Valid rows are a prefix of every shard (io.ingest packs them that way),
    so the strided split hands each receiver an equal share (±1 per sender)
    of every sender's live rows. XLA lowers the collective onto ICI within
    a host and DCN across hosts.
 2. **Per-device compaction**: one stable sort along lanes restores the
    valid-prefix invariant on the rebalanced shard.
 3. **Live-block masks**: tiles whose lanes are all padding skip the whole
    EC pipeline (ops.kernels block-skip), so freed capacity is real
    wall-time, not masked-out lanes.

Production entry point: ``ScanConfig(mesh=..., rebalance=True)`` routes
every batch of a scan through ``rebalanced_scan`` (runtime.executor
dispatches it instead of the plain sharded kernel). Because the executor
keeps a 3-deep async dispatch window, the exchange of batch i+1 overlaps
the compute of batch i (the role the reference's per-batch CUDA streams
play for H2D, src/cudasp_gpu.cu:504-510).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from .mesh import DATA_AXIS


ROW_VALID_BIT = 31     # ovm bit layout: see ops.kernels.pack_batch_arrays


def _shard_rebalance(ndev, block_rows, *arrs):
    """Per-shard body: strided all_to_all + valid-first compaction.

    arrs: (K_i, L) planes; the LAST one must be the ovm bitmask (1, L)
    whose bit 31 is row_valid. Returns rebalanced arrs + (1,) live count +
    (L // block_rows,) live-block mask (computed ON DEVICE so the scan can
    be dispatched without a host sync on the exchange result)."""

    def a2a(x):
        k, L = x.shape
        x = x.reshape(k, L // ndev, ndev)
        y = jax.lax.all_to_all(x, DATA_AXIS, split_axis=2, concat_axis=2)
        return y.reshape(k, L)

    arrs = [a2a(x) for x in arrs]
    ovm = arrs[-1]
    valid = ((ovm[0] >> np.uint32(ROW_VALID_BIT)) & np.uint32(1)).astype(
        jnp.int32)
    order = jnp.argsort(1 - valid, stable=True)          # valid lanes first
    arrs = [x[:, order] for x in arrs]
    count = jnp.sum(valid)
    nb = ovm.shape[1] // block_rows
    starts = jax.lax.broadcasted_iota(jnp.int32, (nb, 1), 0)[:, 0] * block_rows
    bmask = (starts < count).astype(jnp.int32)
    return (*arrs, count[None], bmask)


@functools.lru_cache(maxsize=8)
def _rebalance_fn(mesh, n_arrays, block_rows):
    lane = P(None, DATA_AXIS)
    fn = jax.shard_map(
        functools.partial(_shard_rebalance, mesh.devices.size, block_rows),
        mesh=mesh,
        in_specs=(lane,) * n_arrays,
        out_specs=(lane,) * n_arrays + (P(DATA_AXIS), P(DATA_AXIS)),
        check_vma=False,
    )
    return jax.jit(fn)


def rebalance(mesh, *planes, block_rows: int = 512):
    """Rebalance lane-sharded (K, B) planes over the mesh's data axis.

    The LAST plane must be the (1, B) ovm validity bitmask. Returns
    (rebalanced planes (valid rows prefixed per shard), per-shard live-row
    counts (ndev,) int32, live-block mask (B // block_rows,) int32 — both
    device-resident; nothing here forces a host sync)."""
    out = _rebalance_fn(mesh, len(planes), int(block_rows))(*planes)
    return out[:-2], out[-2], out[-1]


def blockmask_from_counts(counts, n_local_blocks: int,
                          block_rows: int) -> np.ndarray:
    """Host-side variant (see ops.kernels.live_blockmask for the shared
    single-shard rule): per-shard live counts -> global
    (ndev * n_local_blocks,) int32 block mask (lanes shard contiguously,
    so global block order is (device, local block))."""
    counts = np.asarray(counts)
    i = np.arange(n_local_blocks) * block_rows
    return (i[None, :] < counts[:, None]).astype(np.int32).reshape(-1)


def rebalanced_scan(mesh, tweak_words, outputs_hi, outputs_lo, outputs_mask,
                    src_hi, src_lo, digits, spend_x, spend_y,
                    label_x, label_y, comb, *, nlabels: int,
                    block_rows: int = 512, interpret: bool = False,
                    ladder: str = "fixed", static_sched=None):
    """all_to_all-rebalanced sharded scan.

    Same contract as ops.kernels.scan_pallas_sharded plus (2, B)-style
    source-row planes (src_hi/src_lo int32 halves of the original row
    index) that travel with their rows through the exchange. Returns
    (flags (1, B) int8, src_hi, src_lo) — flags align with the REBALANCED
    lane order, so callers map matches back through the source planes."""
    from ..ops import kernels as K

    planes, _counts, bmask = rebalance(
        mesh, tweak_words, outputs_hi, outputs_lo, src_hi, src_lo,
        outputs_mask, block_rows=block_rows)
    tw, oh, ol, shi, slo, ovm = planes
    # bmask is device-resident and mesh-sharded straight out of the
    # exchange: the scan dispatches with NO host round-trip, so exchange
    # of batch i+1 genuinely overlaps compute of batch i.
    flags = K.scan_pallas_sharded(
        mesh, tw, oh, ol, ovm, digits, spend_x, spend_y, label_x, label_y,
        comb, bmask, nlabels=nlabels, block_rows=block_rows,
        interpret=interpret, ladder=ladder, static_sched=static_sched)
    return flags, shi, slo
