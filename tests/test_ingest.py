"""Ingest/packing unit tests: numpy path, native C++ parity, partitioner."""

import numpy as np
import pytest

from cudasp_tpu.io import ingest, native
from cudasp_tpu.ops import field as F
from cudasp_tpu.parallel import partition


def _random_blobs(n, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(n, 64), dtype=np.uint8)


def test_blobs_to_limbs_matches_python_ints():
    blobs = _random_blobs(17)
    tx, ty = ingest.point_blobs_to_limbs(blobs)
    for j in range(17):
        x = int.from_bytes(bytes(blobs[j, :32]), "little")
        y = int.from_bytes(bytes(blobs[j, 32:]), "little")
        assert F.limbs_to_int(tx[:, j]) == x
        assert F.limbs_to_int(ty[:, j]) == y


def test_native_packer_parity():
    if not native.available():
        pytest.skip("native lib not built")
    blobs = _random_blobs(129, seed=3)
    nx, ny = native.pack_points(blobs)
    px, py = ingest.point_blobs_to_limbs(blobs)
    assert np.array_equal(nx, px)
    assert np.array_equal(ny, py)


def test_split_outputs_roundtrip():
    vals = np.asarray(
        [0, 1, -1, 2**62, -2**62, 1714273258699162470, -1265772155233867786],
        np.int64)
    hi, lo = ingest.split_outputs_i64(vals)
    back = (hi.astype(np.int64) << 32) | (lo.astype(np.int64) & 0xFFFFFFFF)
    assert np.array_equal(back, vals)


def test_pack_rows_batches_and_padding():
    n = 10
    blobs = _random_blobs(n, seed=1)
    outputs = [list(range(i)) for i in range(n)]  # row0 empty, lengths 0..9
    flat, offsets = ingest.outputs_to_csr(outputs)
    batches = ingest.pack_rows(blobs, flat, offsets, batch_size=4,
                               max_outputs=4)
    # row 0 dropped (empty); rows 5..9 split into 2+ chunks
    virtual = sum(int(b.row_valid.sum()) for b in batches)
    expected_virtual = sum((len(o) + 3) // 4 for o in outputs)
    assert virtual == expected_virtual
    # every batch has fixed shape
    for b in batches:
        assert b.tweak_x.shape == (F.NLIMBS, 4)
        assert b.outputs_hi.shape == (4, 4)
    # all output values present exactly where valid
    seen = {}
    for b in batches:
        for slot in range(4):
            if not b.row_valid[slot]:
                assert b.source_rows[slot] == -1
                continue
            r = int(b.source_rows[slot])
            vals = [
                (int(b.outputs_hi[slot, m]) << 32)
                | (int(b.outputs_lo[slot, m]) & 0xFFFFFFFF)
                for m in range(4) if b.outputs_valid[slot, m]
            ]
            seen.setdefault(r, []).extend(vals)
    for r, outs in seen.items():
        assert sorted(outs) == sorted(outputs[r])


def test_native_pack_outputs_parity():
    if not native.available():
        pytest.skip("native lib not built")
    rng = np.random.default_rng(5)
    outputs = [list(rng.integers(-2**62, 2**62, size=int(k)))
               for k in rng.integers(0, 12, size=40)]
    flat, offsets = ingest.outputs_to_csr(outputs)
    M = 4
    lens = offsets[1:] - offsets[:-1]
    nch = (lens + M - 1) // M
    src = np.repeat(np.arange(40, dtype=np.int64), nch)
    cum = np.zeros(41, np.int64)
    np.cumsum(nch, out=cum[1:])
    chunk = np.arange(len(src), dtype=np.int64) - np.repeat(cum[:-1], nch)
    hi, lo, valid = native.pack_outputs(flat, offsets, src, chunk, M)
    # numpy reference
    starts = offsets[src] + chunk * M
    take = np.minimum(lens[src] - chunk * M, M)
    gidx = starts[:, None] + np.arange(M)[None]
    vmask = np.arange(M)[None] < take[:, None]
    vals = flat[np.where(vmask, gidx, 0)]
    rhi, rlo = ingest.split_outputs_i64(np.where(vmask, vals, 0))
    assert np.array_equal(valid, vmask)
    assert np.array_equal(np.where(vmask, hi, 0), rhi)
    assert np.array_equal(np.where(vmask, lo, 0), rlo)


def test_partitioner_balance_and_stability():
    keys = _random_blobs(20000, seed=9)[:, :32]
    parts = partition.partition_rows(keys, 4)
    counts = np.bincount(parts, minlength=4)
    assert counts.sum() == 20000
    assert counts.min() > 20000 / 4 * 0.9       # statistically balanced
    # stable across calls
    assert np.array_equal(parts, partition.partition_rows(keys, 4))
    # every row owned by exactly one host
    owned = np.concatenate([
        partition.local_shard_indices(keys, 4, h) for h in range(4)
    ])
    assert np.array_equal(np.sort(owned), np.arange(20000))
