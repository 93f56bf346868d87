"""CPU-oracle correctness against the reference's golden SQL test vectors.

Each case mirrors an assertion in /root/reference/test/sql/cudasp.test.
"""

import pytest

from cudasp_tpu.oracle import vectors as V
from cudasp_tpu.oracle.ec import GX, GY, N, ec_add, ec_mul, is_on_curve
from cudasp_tpu.oracle.encoding import (
    blob32_to_scalar,
    blob64_to_point,
    point_to_blob64,
    scalar_to_blob32,
)
from cudasp_tpu.oracle.pipeline import (
    candidate_values,
    scan_row,
    shared_secret_hash,
    upper64_signed,
)


@pytest.mark.parametrize("case", V.CASES, ids=[c.name for c in V.CASES])
def test_golden_case(case):
    k = blob32_to_scalar(case.scan_key_blob)
    spend = blob64_to_point(case.spend_blob)
    labels = [blob64_to_point(b) for b in case.label_blobs]
    got = tuple(
        row.height
        for row in case.rows
        if scan_row(blob64_to_point(row.tweak_blob), k, spend,
                    row.outputs, labels)
    )
    assert got == case.expected_heights


def test_gecc_case0_exact_value():
    # cudasp.test:18 — expected upper-64 value 1714273258699162470.
    k = blob32_to_scalar(V.SCAN_KEY_GECC)
    spend = blob64_to_point(V.SPEND_GECC)
    tweak = blob64_to_point(V.ROW_100.tweak_blob)
    vals = candidate_values(tweak, k, spend)
    assert vals[0] == 1714273258699162470


def test_bip352_vector_exact_value():
    # cudasp.test:35 — expected 4512552348537027144.
    k = blob32_to_scalar(V.SCAN_KEY_BIP352)
    spend = blob64_to_point(V.SPEND_BIP352)
    tweak = blob64_to_point(V.ROW_200.tweak_blob)
    vals = candidate_values(tweak, k, spend)
    assert vals[0] == 4512552348537027144


def test_label_case_exact_values():
    # cudasp.test:97 — label value -1265772155233867786,
    # base value -1006811617310360495.
    k = blob32_to_scalar(V.SCAN_KEY_LABEL2)
    spend = blob64_to_point(V.SPEND_LABEL2)
    label = blob64_to_point(V.LABEL2)
    tweak = blob64_to_point(V.ROW_400.tweak_blob)
    base, labeled = candidate_values(tweak, k, spend, [label])
    assert base == -1006811617310360495
    assert labeled == -1265772155233867786


def test_row_points_on_curve():
    for row in (V.ROW_100, V.ROW_200, V.ROW_300, V.ROW_400):
        assert is_on_curve(blob64_to_point(row.tweak_blob))


def test_encoding_roundtrip():
    pt = ec_mul((GX, GY), 0x1234567890ABCDEF)
    assert blob64_to_point(point_to_blob64(pt)) == pt
    assert blob32_to_scalar(scalar_to_blob32(12345)) == 12345


def test_upper64_signedness():
    assert upper64_signed((1 << 255)) == -(1 << 63)
    assert upper64_signed((1 << 192)) == 1
    assert upper64_signed((1 << 192) - 1) == 0


def test_group_order():
    assert ec_mul((GX, GY), N) is None
    assert ec_add(ec_mul((GX, GY), N - 1), (GX, GY)) is None
