"""API-surface tests: NULL-row skipping, pyarrow tables, and the CLI —
the L4/L5 ingest semantics the reference implements in its bind/accumulate
callbacks (/root/reference/src/cudasp_extension.cu:154-224: NULL
txid/height/tweak_key skip the row, NULL list elements are dropped)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from cudasp_tpu import scan
from cudasp_tpu.oracle import vectors as V

pa = pytest.importorskip("pyarrow")


def _case_table_lists(case, nullify_row=None, null_height_row=None):
    rows = case.rows
    txid = [r.txid for r in rows]
    height = [r.height for r in rows]
    tweak = [r.tweak_blob for r in rows]
    outputs = [list(r.outputs) for r in rows]
    if nullify_row is not None:
        tweak[nullify_row] = None
    if null_height_row is not None:
        height[null_height_row] = None
    return {"txid": txid, "height": height, "tweak_key": tweak,
            "outputs": outputs}


def test_null_tweak_skips_row():
    case = V.CASES[0]
    # find a matching row and null out its tweak -> it must disappear
    match_idx = next(i for i, r in enumerate(case.rows)
                     if r.height in case.expected_heights)
    table = _case_table_lists(case, nullify_row=match_idx)
    res = scan(table, case.scan_key_blob, case.spend_blob, case.label_blobs)
    got = tuple(int(h) for h in res.height) if len(res) else ()
    assert case.rows[match_idx].height not in got


def test_null_height_skips_row():
    case = V.CASES[0]
    match_idx = next(i for i, r in enumerate(case.rows)
                     if r.height in case.expected_heights)
    table = _case_table_lists(case, null_height_row=match_idx)
    res = scan(table, case.scan_key_blob, case.spend_blob, case.label_blobs)
    assert len(res) == len(case.expected_heights) - 1


def test_null_output_elements_dropped():
    case = V.CASES[0]
    table = _case_table_lists(case)
    table["outputs"] = [[None] + o + [None] for o in table["outputs"]]
    res = scan(table, case.scan_key_blob, case.spend_blob, case.label_blobs)
    got = tuple(int(h) for h in res.height) if len(res) else ()
    assert got == case.expected_heights


def test_pyarrow_table_roundtrip():
    case = V.CASES[0]
    rows = case.rows
    table = pa.table({
        "txid": pa.array([r.txid for r in rows], pa.binary()),
        "height": pa.array([r.height for r in rows], pa.int32()),
        "tweak_key": pa.array([r.tweak_blob for r in rows], pa.binary()),
        "outputs": pa.array([list(r.outputs) for r in rows],
                            pa.list_(pa.int64())),
    })
    res = scan(table, case.scan_key_blob, case.spend_blob, case.label_blobs)
    got = tuple(int(h) for h in res.height)
    assert got == case.expected_heights


def test_pyarrow_nulls():
    case = V.CASES[0]
    rows = case.rows
    match_idx = next(i for i, r in enumerate(rows)
                     if r.height in case.expected_heights)
    tweaks = [r.tweak_blob for r in rows]
    tweaks[match_idx] = None
    table = pa.table({
        "height": pa.array([r.height for r in rows], pa.int32()),
        "tweak_key": pa.array(tweaks, pa.binary()),
        "outputs": pa.array([list(r.outputs) for r in rows],
                            pa.list_(pa.int64())),
    })
    res = scan(table, case.scan_key_blob, case.spend_blob, case.label_blobs)
    assert len(res) == len(case.expected_heights) - 1


def test_scan_stream_chunked():
    """scan_stream over an iterator of chunks == scan over the whole table
    (bounded-memory path for 100M+-row tables)."""
    from cudasp_tpu import scan_stream

    case = V.CASES[0]
    rows = case.rows * 4                      # 8 rows, matches at 0,2,4,6
    table_chunks = []
    for i in range(0, len(rows), 3):          # ragged chunk sizes
        chunk_rows = rows[i:i + 3]
        table_chunks.append({
            "txid": [r.txid for r in chunk_rows],
            "height": [r.height for r in chunk_rows],
            "tweak_key": [r.tweak_blob for r in chunk_rows],
            "outputs": [list(r.outputs) for r in chunk_rows],
        })
    res = scan_stream(iter(table_chunks), case.scan_key_blob,
                      case.spend_blob, case.label_blobs)
    expect = [i for i, r in enumerate(rows)
              if r.height in case.expected_heights]
    assert res.indices.tolist() == expect
    assert res.metrics.rows_in == len(rows)
    for i, idx in enumerate(res.indices):
        assert bytes(res.tweak_key[i]) == rows[idx].tweak_blob


def test_scan_stream_checkpoint_resume():
    """A resumed stream skips covered chunks and still reports every match
    (prior matches fold in from the cursor)."""
    from cudasp_tpu import scan_stream
    from cudasp_tpu.runtime.checkpoint import ScanCursor

    case = V.CASES[0]
    rows = case.rows * 4
    def chunks():
        for i in range(0, len(rows), 2):
            cr = rows[i:i + 2]
            yield {"height": [r.height for r in cr],
                   "tweak_key": [r.tweak_blob for r in cr],
                   "outputs": [list(r.outputs) for r in cr]}

    expect = [i for i, r in enumerate(rows)
              if r.height in case.expected_heights]
    cur = ScanCursor()
    res1 = scan_stream(chunks(), case.scan_key_blob, case.spend_blob,
                       case.label_blobs, checkpoint=cur)
    assert res1.indices.tolist() == expect
    rows_done_full = cur.rows_done
    # simulate a restart after 2 chunks: rows_done=4, matches so far kept
    cur2 = ScanCursor(rows_done=4,
                      matches=[i for i in expect if i < 4])
    res2 = scan_stream(chunks(), case.scan_key_blob, case.spend_blob,
                       case.label_blobs, checkpoint=cur2)
    assert res2.indices.tolist() == expect
    assert cur2.rows_done == rows_done_full
    # resumed run scanned only the uncovered chunks
    assert res2.metrics.rows_in == len(rows) - 4


def test_scan_stream_checkpoint_key_mismatch():
    """Resuming a stream with different query keys must refuse, not
    silently report the old key's matches."""
    from cudasp_tpu import scan_stream
    from cudasp_tpu.runtime.checkpoint import ScanCursor
    from cudasp_tpu.runtime.errors import BindError

    case = V.CASES[0]
    rows = case.rows
    chunk = {"height": [r.height for r in rows],
             "tweak_key": [r.tweak_blob for r in rows],
             "outputs": [list(r.outputs) for r in rows]}
    cur = ScanCursor()
    scan_stream(iter([chunk]), case.scan_key_blob, case.spend_blob,
                case.label_blobs, checkpoint=cur)
    assert cur.query_digest
    wrong = bytes([case.scan_key_blob[0] ^ 1]) + case.scan_key_blob[1:]
    with pytest.raises(BindError):
        scan_stream(iter([chunk]), wrong, case.spend_blob,
                    case.label_blobs, checkpoint=cur)


def test_max_outputs_capped_at_30():
    """ScanConfig(max_outputs=31) must not die in the packer: the plane
    width clamps to 30 (bits 30/31 are parity/row_valid) and wider lists
    split into virtual rows."""
    from cudasp_tpu import ScanConfig

    case = V.CASES[0]
    row = case.rows[0]
    outs = list(range(1000, 1032)) + [row.outputs[0]]      # 33 values
    res = scan(
        {"height": [row.height],
         "tweak_key": [row.tweak_blob],
         "outputs": [outs]},
        case.scan_key_blob, case.spend_blob, (),
        config=ScanConfig(max_outputs=31),
    )
    assert len(res) == 1


def test_cli_scan_parquet_stream(tmp_path):
    """CLI --stream: chunked parquet read, same matches as whole-table."""
    import pyarrow.parquet as pq

    case = V.CASES[0]
    rows = case.rows * 3
    table = pa.table({
        "txid": pa.array([r.txid for r in rows], pa.binary()),
        "height": pa.array([r.height for r in rows], pa.int32()),
        "tweak_key": pa.array([r.tweak_blob for r in rows], pa.binary()),
        "outputs": pa.array([list(r.outputs) for r in rows],
                            pa.list_(pa.int64())),
    })
    inp = tmp_path / "in.parquet"
    pq.write_table(table, inp)
    proc = subprocess.run(
        [sys.executable, "-m", "cudasp_tpu", "scan",
         "--input", str(inp), "--stream", "4",
         "--scan-key", case.scan_key_blob.hex(),
         "--spend-key", case.spend_blob.hex(),
         "--backend", "xla"]
        + sum((["--label", lb.hex()] for lb in case.label_blobs), []),
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_cpu_use_fusion_emitters=false",
             "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root",
             "PYTHONPATH": "/root/repo"},
    )
    assert proc.returncode == 0, proc.stderr
    got = sorted(json.loads(line)["row"]
                 for line in proc.stdout.splitlines() if line)
    expect = sorted(i for i, r in enumerate(rows)
                    if r.height in case.expected_heights)
    assert got == expect


def test_cli_scan_parquet(tmp_path):
    import pyarrow.parquet as pq

    case = V.CASES[0]
    rows = case.rows
    table = pa.table({
        "txid": pa.array([r.txid for r in rows], pa.binary()),
        "height": pa.array([r.height for r in rows], pa.int32()),
        "tweak_key": pa.array([r.tweak_blob for r in rows], pa.binary()),
        "outputs": pa.array([list(r.outputs) for r in rows],
                            pa.list_(pa.int64())),
    })
    inp = tmp_path / "in.parquet"
    pq.write_table(table, inp)

    proc = subprocess.run(
        [sys.executable, "-m", "cudasp_tpu", "scan",
         "--input", str(inp),
         "--scan-key", case.scan_key_blob.hex(),
         "--spend-key", case.spend_blob.hex(),
         "--backend", "xla", "--metrics"]
        + sum((["--label", lb.hex()] for lb in case.label_blobs), []),
        capture_output=True, text=True, timeout=600,
        env={"JAX_PLATFORMS": "cpu",
             "XLA_FLAGS": "--xla_cpu_use_fusion_emitters=false",
             "PATH": "/usr/bin:/bin:/usr/local/bin",
             "HOME": "/root",
             "PYTHONPATH": "/root/repo"},
    )
    assert proc.returncode == 0, proc.stderr
    got = sorted(json.loads(line)["height"]
                 for line in proc.stdout.splitlines() if line)
    assert got == sorted(case.expected_heights)
