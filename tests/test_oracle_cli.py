"""Oracle CLI (python -m cudasp_tpu.oracle) — the reference's scripts/
developer tools as subcommands (SURVEY.md §2.3)."""

import json
import subprocess
import sys

from cudasp_tpu.oracle import vectors as V
from cudasp_tpu.oracle import pipeline as PIPE
from cudasp_tpu.oracle import encoding as ENC


def _run(*args):
    r = subprocess.run([sys.executable, "-m", "cudasp_tpu.oracle", *args],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_compute_expected_golden():
    case = V.CASES[0]
    r = case.rows[0]
    out = _run("compute-expected", "--tweak", r.tweak_blob.hex(),
               "--scan-key", case.scan_key_blob.hex(),
               "--spend-key", case.spend_blob.hex())
    # golden value from the reference's SQL test (cudasp.test:18-19)
    assert out.strip() == "base: 1714273258699162470"


def test_which_case():
    case = V.CASES[0]
    r = case.rows[0]
    out = _run("which-case", "--tweak", r.tweak_blob.hex(),
               "--scan-key", case.scan_key_blob.hex(),
               "--spend-key", case.spend_blob.hex(),
               "--value", "1714273258699162470")
    assert out.strip() == "base"


def test_upper64_and_tagged_hash():
    x = 0x80 << 248  # MSB set -> negative signed upper64
    out = _run("upper64", "--x", f"{x:064x}")
    assert int(out) == PIPE.upper64_signed(x)
    out = _run("tagged-hash", "--msg", "00" * 37)
    assert out.strip() == PIPE.tagged_hash(PIPE.TAG, b"\x00" * 37).hex()


def test_decompress_tweak_roundtrip():
    case = V.CASES[0]
    pt = ENC.blob64_to_point(case.rows[0].tweak_blob)
    sec1 = bytes([0x02 + (pt[1] & 1)]) + pt[0].to_bytes(32, "big")
    out = _run("decompress-tweak", "--sec1", sec1.hex())
    assert bytes.fromhex(out.strip()) == case.rows[0].tweak_blob


def test_gen_vectors_oracle_consistent():
    lines = _run("gen-vectors", "--rows", "6", "--match-every", "3",
                 "--seed", "1").strip().splitlines()
    keys = json.loads(lines[0])["keys"]
    scan_key = ENC.blob32_to_scalar(bytes.fromhex(keys["scan_private_key"]))
    spend = ENC.blob64_to_point(bytes.fromhex(keys["spend_public_key"]))
    for line in lines[1:]:
        row = json.loads(line)
        tweak = ENC.blob64_to_point(bytes.fromhex(row["tweak_key"]))
        got = PIPE.scan_row(tweak, scan_key, spend, row["outputs"])
        assert got == row["expect_match"]


def test_decode_blob_scalar_and_point():
    """decode-blob: the reference's decode_test_blobs.py forensics — LE
    wire scalar round-trips to its documented big-endian form
    (scripts/decode_test_blobs.py:7,24-27)."""
    case = V.CASES[1]          # BIP-352 official vector case
    out = _run("decode-blob", "--blob", case.scan_key_blob.hex())
    lines = dict(ln.split(": ", 1) for ln in out.strip().splitlines())
    assert lines["be_hex"] == case.scan_key_blob[::-1].hex()
    assert lines["in_order_range"] == "True"

    r = case.rows[0]
    out = _run("decode-blob", "--blob", r.tweak_blob.hex())
    lines = dict(ln.split(": ", 1) for ln in out.strip().splitlines())
    assert lines["on_curve"] == "True"
    x = int.from_bytes(r.tweak_blob[:32], "little")
    assert int(lines["upper64_of_x"]) == PIPE.upper64_signed(x)


def test_convert_vector_matches_reference_blobs():
    """convert-vector: big-endian BIP-352 scan key -> the exact LE blob the
    reference's test file carries (convert_bip352_test_vector.py:10-24)."""
    case = V.CASES[1]
    be = case.scan_key_blob[::-1].hex()
    out = _run("convert-vector", "--scan-key-be", be,
               "--tweak", case.rows[0].tweak_blob.hex(),
               "--output", str(case.rows[0].outputs[0]))
    lines = [ln for ln in out.strip().splitlines()]
    d = dict(ln.split(": ", 1) for ln in lines)
    assert d["scan_private_key"] == case.scan_key_blob.hex()
    assert d["tweak_key"] == case.rows[0].tweak_blob.hex()
    assert d["sql"].startswith("INSERT INTO test_data VALUES")
    assert str(case.rows[0].outputs[0]) in d["sql"]
