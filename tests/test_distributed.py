"""Multi-host protocol tests, single-process simulated (real pods run one
process per host; the partition/merge logic is process-count agnostic)."""

import numpy as np

from cudasp_tpu import scan
from cudasp_tpu.oracle import vectors as V
from cudasp_tpu.parallel import distributed as D
from cudasp_tpu.parallel import partition as P


def _table(case, n):
    rows = case.rows
    txid = np.zeros((n, 32), np.uint8)
    for j in range(n):
        t = rows[j % len(rows)].txid or bytes([j % 256]) * 32
        txid[j, : len(t[:32])] = np.frombuffer(t[:32], np.uint8)
        txid[j, 0] ^= j & 0xFF          # make txids distinct per row
    return {
        "txid": txid,
        "height": np.asarray(
            [rows[j % len(rows)].height for j in range(n)], np.int32),
        "tweak_key": np.stack(
            [np.frombuffer(rows[j % len(rows)].tweak_blob, np.uint8)
             for j in range(n)]),
        "outputs": [list(rows[j % len(rows)].outputs) for j in range(n)],
    }, sorted(j for j in range(n)
              if rows[j % len(rows)].height in case.expected_heights)


def test_partition_balance_and_stability():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 256, (100_000, 32)).astype(np.uint8)
    parts = P.partition_rows(keys, 4)
    counts = np.bincount(parts, minlength=4)
    assert counts.sum() == 100_000
    assert counts.min() > 20_000            # balanced within ~20%
    # stable: same keys -> same parts
    assert np.array_equal(parts, P.partition_rows(keys, 4))


def test_simulated_multihost_scan_matches_single():
    """Partition the table 4 ways, scan each shard independently (the
    per-host code path), merge — must equal the unpartitioned scan."""
    case = V.CASES[0]
    table, expect = _table(case, 240)

    def scan_shard(shard_idx):
        if len(shard_idx) == 0:
            return np.zeros(0, np.int64)
        shard = {
            "height": table["height"][shard_idx],
            "tweak_key": table["tweak_key"][shard_idx],
            "outputs": [table["outputs"][int(i)] for i in shard_idx],
        }
        res = scan(shard, case.scan_key_blob, case.spend_blob, ())
        return shard_idx[res.indices]

    merged = P.distributed_scan(table["txid"], scan_shard, n_hosts=4)
    assert merged.tolist() == expect


def test_multihost_scan_single_process():
    """multihost_scan with process_count == 1 must equal plain scan."""
    case = V.CASES[3]
    table, expect = _table(case, 120)
    idx = D.multihost_scan(table, case.scan_key_blob, case.spend_blob,
                           case.label_blobs)
    assert idx.tolist() == expect


def test_allgather_matches_single_process():
    got = D.allgather_matches(np.asarray([5, 3, 5, 9], np.int64))
    assert got.tolist() == [3, 5, 9]
