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


def test_random_keys_fuzz_vs_oracle():
    """Random scan/spend/label keys and random tweak points: scan() ==
    the pure-Python oracle row by row (the golden vectors only pin FIXED
    keys; this guards the GLV recoding and label paths for arbitrary
    ones). Key changes are data, not shapes — one compile covers all."""
    import random

    from cudasp_tpu.oracle import ec as O
    from cudasp_tpu.oracle import pipeline as PIPE
    from cudasp_tpu.oracle.encoding import point_to_blob64, scalar_to_blob32

    rng = random.Random(1234)
    g = (O.GX, O.GY)
    n = 24
    for trial in range(3):
        scan_key = rng.randrange(1, O.N)
        spend = O.ec_mul(g, rng.randrange(1, O.N))
        label = O.ec_mul(g, rng.randrange(1, O.N))
        tweaks, outputs, expect = [], [], []
        for i in range(n):
            tw = O.ec_mul(g, rng.randrange(1, O.N))
            cands = PIPE.candidate_values(tw, scan_key, spend, [label])
            mode = i % 4      # 0: base match, 1: label match, 2/3: miss
            outs = [rng.randrange(-2**62, 2**62) for _ in range(3)]
            if mode == 0:
                outs[rng.randrange(3)] = cands[0]
            elif mode == 1:
                outs[rng.randrange(3)] = cands[1]
            tweaks.append(point_to_blob64(tw))
            outputs.append(outs)
            expect.append(PIPE.scan_row(tw, scan_key, spend, outs, [label]))
            assert expect[-1] == (mode < 2)
        res = scan(
            {"height": list(range(n)), "tweak_key": tweaks,
             "outputs": outputs},
            scalar_to_blob32(scan_key), point_to_blob64(spend),
            [point_to_blob64(label)],
        )
        got = sorted(int(i) for i in res.indices)
        assert got == [i for i, e in enumerate(expect) if e], f"trial {trial}"


def test_empty_outputs_rows_never_match():
    """Rows with empty outputs lists are dropped before packing (they can
    never match — reference scans them linearly to the same effect)."""
    case = V.CASES[0]
    row = case.rows[0]
    res = scan(
        {"height": [row.height, row.height],
         "tweak_key": [row.tweak_blob, row.tweak_blob],
         "outputs": [[], list(row.outputs)]},
        case.scan_key_blob, case.spend_blob, (),
    )
    assert res.indices.tolist() == [1]
    # the drop happens BEFORE packing: only one virtual row was scanned
    assert res.metrics.rows_scanned == 1


def test_empty_table():
    table = {
        "height": np.zeros(0, np.int32),
        "tweak_key": np.zeros((0, 64), np.uint8),
        "outputs": [],
    }
    res = scan(table, V.SCAN_KEY_GECC, V.SPEND_GECC, ())
    assert len(res) == 0


def test_adversarial_keys_and_points_no_crash():
    """Degenerate queries the reference leaves as UB must be defined here:
    scan_key = 0 and scan_key = n (both send every ECDH to infinity) and an
    off-curve tweak point produce zero matches, never a crash."""
    from cudasp_tpu.oracle import ec as O
    from cudasp_tpu.oracle.encoding import point_to_blob64, scalar_to_blob32

    case = V.CASES[0]
    row = case.rows[0]
    off_curve = bytes(range(64))            # x/y almost surely off-curve
    table = {
        "height": [1, 2],
        "tweak_key": [row.tweak_blob, off_curve],
        "outputs": [list(row.outputs), [123, 456]],
    }
    for k in (0, O.N):
        res = scan(table, scalar_to_blob32(k), case.spend_blob, ())
        assert len(res) == 0
    # valid key + off-curve tweak: the good row still matches, the garbage
    # row never does
    res = scan(table, case.scan_key_blob, case.spend_blob, ())
    assert res.indices.tolist() == [0]


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
