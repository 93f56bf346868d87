"""End-to-end golden tests: the public scan() API against the reference's
SQL test assertions (/root/reference/test/sql/cudasp.test), plus the
batching tests at reduced scale.
"""

import numpy as np
import pytest

from cudasp_tpu import scan, ScanConfig
from cudasp_tpu.oracle import vectors as V
from cudasp_tpu.runtime.errors import BindError, IngestError


def _table_for(case):
    rows = case.rows
    return {
        "txid": np.asarray([r.txid for r in rows], dtype=object),
        "height": np.asarray([r.height for r in rows], dtype=np.int32),
        "tweak_key": np.stack(
            [np.frombuffer(r.tweak_blob, np.uint8) for r in rows]),
        "outputs": [list(r.outputs) for r in rows],
    }


@pytest.mark.parametrize("case", V.CASES, ids=[c.name for c in V.CASES])
def test_golden_case(case):
    res = scan(_table_for(case), case.scan_key_blob, case.spend_blob,
               case.label_blobs)
    got = tuple(int(h) for h in res.height) if res.height is not None else ()
    assert got == case.expected_heights
    # tweak passthrough must be byte-exact
    for i, idx in enumerate(res.indices):
        assert bytes(res.tweak_key[i]) == case.rows[idx].tweak_blob


def test_batching_all_match():
    """20K-row analog (cudasp.test:120-133) at 300 rows: every row matches,
    none dropped at batch boundaries (batch_size forces multiple batches).
    batch_size=128 keeps the compiled shape identical to the other tests."""
    case = V.CASES[0]
    n = 300
    row = case.rows[0]
    table = {
        "height": np.full(n, row.height, np.int32),
        "tweak_key": np.tile(np.frombuffer(row.tweak_blob, np.uint8), (n, 1)),
        "outputs": (
            np.tile(np.asarray(row.outputs, np.int64), n),
            np.arange(n + 1, dtype=np.int64) * len(row.outputs),
        ),
    }
    res = scan(table, case.scan_key_blob, case.spend_blob, (),
               batch_size=128)
    assert len(res) == n
    assert res.metrics.batches == (n + 127) // 128
    assert (np.asarray(res.indices) == np.arange(n)).all()


def test_outputs_overflow_split():
    """Rows with more outputs than max_outputs must still match (virtual-row
    splitting; the reference scans arbitrary-length lists linearly)."""
    case = V.CASES[0]
    row = case.rows[0]
    # bury the matching value deep in a long list (> default max_outputs=8)
    outs = list(range(100, 120)) + [row.outputs[0]]
    table = {
        "height": np.asarray([row.height], np.int32),
        "tweak_key": np.frombuffer(row.tweak_blob, np.uint8)[None],
        "outputs": [outs],
    }
    res = scan(table, case.scan_key_blob, case.spend_blob, ())
    assert len(res) == 1


def test_empty_table():
    table = {
        "height": np.zeros(0, np.int32),
        "tweak_key": np.zeros((0, 64), np.uint8),
        "outputs": [],
    }
    res = scan(table, V.SCAN_KEY_GECC, V.SPEND_GECC, ())
    assert len(res) == 0


def test_bind_validation():
    case = V.CASES[0]
    table = _table_for(case)
    with pytest.raises(BindError):
        scan(table, b"\x00" * 31, case.spend_blob, ())
    with pytest.raises(BindError):
        scan(table, case.scan_key_blob, b"\x00" * 63, ())
    with pytest.raises(BindError):
        scan(table, case.scan_key_blob, case.spend_blob, (b"\x00" * 10,))
    with pytest.raises(BindError):
        scan(table, case.scan_key_blob, case.spend_blob, (),
             batch_size=0)
    with pytest.raises(IngestError):
        scan({"outputs": []}, case.scan_key_blob, case.spend_blob, ())
