"""Reference-scale batching tests (cudasp.test:120-154): large all-match
tables with a batch_size override, asserting zero dropped rows at batch
boundaries on the production kernel.

The 20K/200K-row runs need the real chip (CPU analogs at reduced scale run
in test_pipeline_golden); they are gated on CUDASP_TEST_PLATFORM=tpu like
the other hardware tests and run warm in well under 2 minutes.
"""

import os

import numpy as np
import pytest
import jax

from cudasp_tpu.oracle import vectors as V

_TPU = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="reference-scale batching runs on the bench chip "
           "(CUDASP_TEST_PLATFORM=tpu)")


def _all_match_table(n):
    """n copies of the case-0 matching row (cudasp.test:121-128 pattern:
    identical all-match rows force multi-batch + boundary coverage)."""
    r = V.CASES[0].rows[0]
    tweaks = np.tile(np.frombuffer(r.tweak_blob, np.uint8), (n, 1))
    flat = np.tile(np.asarray(r.outputs, np.int64), n)
    offsets = np.arange(n + 1, dtype=np.int64) * len(r.outputs)
    heights = np.full(n, r.height, np.int32)
    return {"height": heights, "tweak_key": tweaks,
            "outputs": (flat, offsets)}


@_TPU
@pytest.mark.parametrize("rows,batch_size", [
    (20_000, 300_000),     # cudasp.test:120-133 (default batch size)
    (200_000, 50_000),     # cudasp.test:135-154 (batch_size := 50000)
])
def test_reference_scale_all_match(rows, batch_size):
    from cudasp_tpu import scan

    case = V.CASES[0]
    res = scan(_all_match_table(rows), case.scan_key_blob,
               case.spend_blob, batch_size=batch_size)
    assert len(res) == rows, f"dropped {rows - len(res)} rows at batch " \
                             f"boundaries (batch_size={batch_size})"
    assert np.array_equal(res.indices, np.arange(rows))
    assert (res.height == case.rows[0].height).all()


@_TPU
def test_reference_scale_no_match_wrong_key():
    """cudasp.test:64-68 at scale: wrong keys -> zero rows."""
    from cudasp_tpu import scan

    res = scan(_all_match_table(20_000), b"\x07" * 32, b"\x11" * 64,
               batch_size=50_000)
    assert len(res) == 0


@_TPU
@pytest.mark.parametrize("upload", ["full", "full64", "hi32", "hi16",
                                    "hi8"])
def test_reference_scale_upload_modes(upload):
    """Every upload wire/cut mode end-to-end on the real chip (VERDICT r3
    item 8): golden matches must be identical across modes — full64 skips
    the device sqrt, hi32/hi16/hi8 prefilter + exact-reverify."""
    from cudasp_tpu import scan
    from cudasp_tpu.api import ScanConfig

    rows = 4_000
    case = V.CASES[0]
    table = _all_match_table(rows)
    # make the second half non-matching so the reverify pass sees a mix
    flat, offsets = table["outputs"]
    flat[offsets[rows // 2]:] += 1
    res = scan(table, case.scan_key_blob, case.spend_blob,
               config=ScanConfig(batch_size=2_048, upload=upload))
    assert np.array_equal(res.indices, np.arange(rows // 2))
    if upload in ("hi32", "hi16", "hi8") and res.metrics is not None:
        # the prefilter really ran (cut mode reported, rows reverified)
        assert res.metrics.upload_mode == upload
        assert res.metrics.reverified_rows >= rows // 2


@_TPU
def test_reference_scale_hi16_wide_outputs_fallback():
    """Explicit hi16 with M > 14 outputs degrades to hi32 (warning), not
    a mid-scan ExecutionError (ADVICE r3)."""
    import warnings

    from cudasp_tpu import scan
    from cudasp_tpu.api import ScanConfig

    rows = 2_000
    r = V.CASES[0].rows[0]
    per = list(r.outputs) + list(range(1, 14))       # 16 outputs/row
    tweaks = np.tile(np.frombuffer(r.tweak_blob, np.uint8), (rows, 1))
    flat = np.tile(np.asarray(per, np.int64), rows)
    offsets = np.arange(rows + 1, dtype=np.int64) * len(per)
    table = {"tweak_key": tweaks, "outputs": (flat, offsets)}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res = scan(table, V.CASES[0].scan_key_blob, V.CASES[0].spend_blob,
                   config=ScanConfig(batch_size=1_024, upload="hi16",
                                     max_outputs=16))
    assert np.array_equal(res.indices, np.arange(rows))
    assert any("hi32" in str(w.message) for w in rec)
    assert res.metrics.upload_mode == "hi32"


@_TPU
def test_reference_scale_hi8_wide_outputs_fallback():
    """Explicit hi8 with M > 6 outputs degrades to hi16 (warning), not a
    mid-scan ExecutionError — the same graceful chain as hi16 -> hi32."""
    import warnings

    from cudasp_tpu import scan
    from cudasp_tpu.api import ScanConfig

    rows = 2_000
    r = V.CASES[0].rows[0]
    per = list(r.outputs) + list(range(1, 7))        # 9 outputs/row
    tweaks = np.tile(np.frombuffer(r.tweak_blob, np.uint8), (rows, 1))
    flat = np.tile(np.asarray(per, np.int64), rows)
    offsets = np.arange(rows + 1, dtype=np.int64) * len(per)
    table = {"tweak_key": tweaks, "outputs": (flat, offsets)}
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        res = scan(table, V.CASES[0].scan_key_blob, V.CASES[0].spend_blob,
                   config=ScanConfig(batch_size=1_024, upload="hi8",
                                     max_outputs=9))
    assert np.array_equal(res.indices, np.arange(rows))
    assert any("hi16" in str(w.message) for w in rec)
    assert res.metrics.upload_mode == "hi16"
