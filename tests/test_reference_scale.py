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
