"""Columnar ingest: host-side packing of scan inputs into device batches.

TPU-native replacement for the reference's L4 ingest/accumulator
(AccumulateInput + limb conversion, /root/reference/src/cudasp_extension.cu:
154-224,249-341): columnar in, structure-of-arrays limb planes out, with
the ragged per-row ``outputs`` lists packed into padded (B, M) planes
instead of CSR + per-thread linear scans.

Everything is vectorized numpy (no per-row Python in the hot path); a
native C++ fast path can substitute via io.native.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable, List, Optional, Sequence, Tuple

import numpy as np

from ..ops import field as F

U32 = np.uint32


def blobs_to_limbs(blobs: np.ndarray) -> np.ndarray:
    """(B, 32) uint8 little-endian 256-bit values -> (NLIMBS, B) int32.

    Vectorized 13-bit re-limbing: limb i = bits [13i, 13i+13) which span at
    most 3 bytes. Matches the reference's LE-blob convention
    (src/cudasp_extension.cu:56-85)."""
    b = np.asarray(blobs, dtype=np.uint8)
    if b.ndim != 2 or b.shape[1] != 32:
        raise ValueError("expected (B, 32) byte array")
    padded = np.concatenate(
        [b, np.zeros((b.shape[0], 2), np.uint8)], axis=1
    ).astype(np.int32)
    out = np.empty((F.NLIMBS, b.shape[0]), dtype=np.int32)
    for i in range(F.NLIMBS):
        bit = F.LB * i
        k, s = bit // 8, bit % 8
        window = padded[:, k] | (padded[:, k + 1] << 8) | (padded[:, k + 2] << 16)
        out[i] = (window >> s) & F.MASK
    return out


def point_blobs_to_limbs(blobs: np.ndarray):
    """(B, 64) uint8 point blobs (LE x || LE y) -> two (NLIMBS, B) int32."""
    b = np.asarray(blobs, dtype=np.uint8)
    if b.ndim != 2 or b.shape[1] != 64:
        raise ValueError("expected (B, 64) byte array")
    return blobs_to_limbs(b[:, :32]), blobs_to_limbs(b[:, 32:])


def split_outputs_i64(vals: np.ndarray):
    """int64 array -> (hi, lo) int32 bit halves (TPU-friendly int64)."""
    v = np.asarray(vals, dtype=np.int64)
    lo = (v & 0xFFFFFFFF).astype(U32).view(np.int32).reshape(v.shape)
    hi = ((v >> 32) & 0xFFFFFFFF).astype(U32).view(np.int32).reshape(v.shape)
    return hi, lo


def outputs_to_csr(outputs_list: Sequence) -> Tuple[np.ndarray, np.ndarray]:
    """List of per-row int64 sequences -> (flat values, offsets(n+1,))."""
    lens = np.fromiter((len(o) for o in outputs_list), dtype=np.int64,
                       count=len(outputs_list))
    offsets = np.zeros(len(outputs_list) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    if offsets[-1]:
        flat = np.concatenate(
            [np.asarray(o, dtype=np.int64).reshape(-1)
             for o in outputs_list if len(o)]
        )
    else:
        flat = np.zeros(0, np.int64)
    return flat, offsets


@dataclass
class PackedBatch:
    """Device-ready arrays for one batch (shapes fixed by (B, M))."""
    tweak_x: np.ndarray       # (NLIMBS, B) int32
    tweak_y: np.ndarray       # (NLIMBS, B) int32
    row_valid: np.ndarray     # (B,) bool
    outputs_hi: np.ndarray    # (B, M) int32
    outputs_lo: np.ndarray    # (B, M) int32
    outputs_valid: np.ndarray  # (B, M) bool
    source_rows: np.ndarray   # (B,) int64 — original row index (-1 = pad)

    @property
    def n_valid(self) -> int:
        return int(self.row_valid.sum())


def pack_rows(
    tweak_blobs: np.ndarray,     # (n, 64) uint8
    outputs_flat: np.ndarray,    # flat int64 values (CSR)
    outputs_offsets: np.ndarray,  # (n+1,) int64
    batch_size: int,
    max_outputs: int,
    row_indices: Optional[np.ndarray] = None,
) -> List[PackedBatch]:
    """Pack n rows into fixed-shape batches, fully vectorized.

    Rows whose outputs list exceeds max_outputs split into several virtual
    rows sharing a source row index (the executor dedups matches on
    emission), so long lists are never truncated. Rows with empty outputs
    are dropped (they can never match — src/cudasp_gpu.cu:29-41)."""
    tweak_blobs = np.ascontiguousarray(tweak_blobs, dtype=np.uint8)
    offsets = np.asarray(outputs_offsets, dtype=np.int64)
    n = len(offsets) - 1
    if row_indices is None:
        row_indices = np.arange(n, dtype=np.int64)

    lens = offsets[1:] - offsets[:-1]
    nch = (lens + max_outputs - 1) // max_outputs      # chunks per row
    total = int(nch.sum())
    if total == 0:
        return []
    src = np.repeat(np.arange(n, dtype=np.int64), nch)          # (total,)
    cum = np.zeros(n + 1, np.int64)
    np.cumsum(nch, out=cum[1:])
    chunk_in_row = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], nch)
    starts = offsets[src] + chunk_in_row * max_outputs
    take = np.minimum(lens[src] - chunk_in_row * max_outputs, max_outputs)
    gidx = starts[:, None] + np.arange(max_outputs, dtype=np.int64)[None]
    vmask = np.arange(max_outputs, dtype=np.int64)[None] < take[:, None]
    vals = outputs_flat[np.where(vmask, gidx, 0)]               # (total, M)
    all_hi, all_lo = split_outputs_i64(vals)
    all_tweaks = tweak_blobs[src]                               # (total, 64)
    all_sources = row_indices[src]

    batches: List[PackedBatch] = []
    for start in range(0, total, batch_size):
        stop = min(start + batch_size, total)
        k = stop - start
        pad = batch_size - k
        sl = slice(start, stop)

        def padded(a, fill=0):
            if pad == 0:
                return a[sl]
            shape = (pad,) + a.shape[1:]
            return np.concatenate(
                [a[sl], np.full(shape, fill, dtype=a.dtype)], axis=0
            )

        tx, ty = point_blobs_to_limbs(padded(all_tweaks))
        batches.append(PackedBatch(
            tweak_x=tx,
            tweak_y=ty,
            row_valid=np.concatenate(
                [np.ones(k, bool), np.zeros(pad, bool)]),
            outputs_hi=padded(all_hi),
            outputs_lo=padded(all_lo),
            outputs_valid=padded(vmask),
            source_rows=padded(all_sources, fill=-1),
        ))
    return batches


def pack_query_keys(scan_key_blob: bytes, spend_blob: bytes,
                    label_blobs: Iterable[bytes]):
    """Per-query shared operands -> device-ready arrays."""
    from ..oracle.encoding import blob32_to_scalar, blob64_to_point
    from ..ops import scalar as S

    k = blob32_to_scalar(bytes(scan_key_blob))
    windows = S.glv_windows(k)   # (w1, sign1, w2, sign2) pytree
    sx, sy = blob64_to_point(bytes(spend_blob))
    spend_x = F.int_to_limbs(sx)[:, None]
    spend_y = F.int_to_limbs(sy)[:, None]
    labels = list(label_blobs)
    lx = np.zeros((max(len(labels), 1), F.NLIMBS, 1), np.int32)
    ly = np.zeros((max(len(labels), 1), F.NLIMBS, 1), np.int32)
    for i, lb in enumerate(labels):
        px, py = blob64_to_point(bytes(lb))
        lx[i, :, 0] = F.int_to_limbs(px)
        ly[i, :, 0] = F.int_to_limbs(py)
    return windows, spend_x, spend_y, lx, ly, len(labels)
