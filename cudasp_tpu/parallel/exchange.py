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

Exchange of batch i+1 overlaps compute of batch i through the executor's
async dispatch window (the role the reference's per-batch CUDA streams
play for H2D, src/cudasp_gpu.cu:504-510).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from .mesh import DATA_AXIS


ROW_VALID_BIT = 31     # ovm bit layout: see ops.kernels.pack_batch_arrays


def _shard_rebalance(ndev, *arrs):
    """Per-shard body: strided all_to_all + valid-first compaction.

    arrs: (K_i, L) planes; the LAST one must be the ovm bitmask (1, L)
    whose bit 31 is row_valid. Returns rebalanced arrs + (1,) live count."""

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
    return (*arrs, jnp.sum(valid)[None])


@functools.lru_cache(maxsize=8)
def _rebalance_fn(mesh, n_arrays):
    lane = P(None, DATA_AXIS)
    fn = jax.shard_map(
        functools.partial(_shard_rebalance, mesh.devices.size),
        mesh=mesh,
        in_specs=(lane,) * n_arrays,
        out_specs=(lane,) * n_arrays + (P(DATA_AXIS),),
        check_vma=False,
    )
    return jax.jit(fn)


def rebalance(mesh, *planes):
    """Rebalance lane-sharded (K, B) planes over the mesh's data axis.

    The LAST plane must be the (1, B) ovm validity bitmask. Returns the
    rebalanced planes (valid rows prefixed per shard) and a (ndev,) int32
    vector of per-shard live-row counts."""
    out = _rebalance_fn(mesh, len(planes))(*planes)
    return out[:-1], out[-1]


def blockmask_from_counts(counts, n_local_blocks: int,
                          block_rows: int) -> np.ndarray:
    """Per-shard live counts -> global (ndev * n_local_blocks,) int32 block
    mask for ops.kernels.scan_pallas_sharded (lanes shard contiguously, so
    global block order is (device, local block))."""
    counts = np.asarray(counts)
    i = np.arange(n_local_blocks) * block_rows
    return (i[None, :] < counts[:, None]).astype(np.int32).reshape(-1)


def rebalanced_scan(mesh, tweak_words, outputs_hi, outputs_lo, outputs_mask,
                    src_hi, src_lo, digits, spend_x, spend_y,
                    label_x, label_y, comb, *, nlabels: int,
                    block_rows: int = 512, interpret: bool = False):
    """all_to_all-rebalanced sharded scan.

    Same contract as ops.kernels.scan_pallas_sharded plus (2, B)-style
    source-row planes (src_hi/src_lo int32 halves of the original row
    index) that travel with their rows through the exchange. Returns
    (flags (1, B) int8, src_hi, src_lo) — flags align with the REBALANCED
    lane order, so callers map matches back through the source planes."""
    from ..ops import kernels as K

    planes, counts = rebalance(
        mesh, tweak_words, outputs_hi, outputs_lo, src_hi, src_lo,
        outputs_mask)
    tw, oh, ol, shi, slo, ovm = planes
    B = tw.shape[1]
    ndev = mesh.devices.size
    nb_local = B // ndev // block_rows
    bmask = jnp.asarray(
        blockmask_from_counts(np.asarray(counts), nb_local, block_rows))
    bmask = jax.device_put(bmask, NamedSharding(mesh, P(DATA_AXIS)))
    flags = K.scan_pallas_sharded(
        mesh, tw, oh, ol, ovm, digits, spend_x, spend_y, label_x, label_y,
        comb, bmask, nlabels=nlabels, block_rows=block_rows,
        interpret=interpret)
    return flags, shi, slo
