"""Oracle CLI — the role of the reference's scripts/ developer tools
(SURVEY.md §2.3), as subcommands of the oracle package:

    python -m cudasp_tpu.oracle compute-expected --tweak <128hex> \
        --scan-key <64hex> --spend-key <128hex> [--label <128hex>]...
        -> candidate upper-64 values [base, label_0, ...]
        (compute_bip352_expected.py / compute_correct_label_test_value.py)

    python -m cudasp_tpu.oracle which-case ... --value N
        -> which candidate (base / label_i) produced a match value
        (verify_which_case_matches.py)

    python -m cudasp_tpu.oracle decompress-tweak --sec1 <66hex>
        -> 64-byte LE blob hex (decompress_tweak_key.py; p === 3 mod 4 sqrt)

    python -m cudasp_tpu.oracle upper64 --x <64hex>
        -> signed int64 of bits 192..255 (compute_output_from_x.py)

    python -m cudasp_tpu.oracle tagged-hash --msg <hex>
        -> BIP0352/SharedSecret tagged hash (verify_tagged_hash.py)

    python -m cudasp_tpu.oracle gen-vectors --rows N [--seed S] [--match-every K]
        -> JSONL test table + keys (generate_test_vectors.py)

All key/blob arguments use the wire format of the scan API (little-endian
blobs, reference src/cudasp_extension.cu:56-85).
"""

from __future__ import annotations

import argparse
import json
import sys

from . import ec as EC
from . import encoding as ENC
from . import pipeline as PIPE


def _hex(s: str) -> bytes:
    return bytes.fromhex(s.removeprefix("0x"))


def _keys(args):
    scan_key = ENC.blob32_to_scalar(_hex(args.scan_key))
    spend = ENC.blob64_to_point(_hex(args.spend_key))
    labels = [ENC.blob64_to_point(_hex(lb)) for lb in (args.label or [])]
    return scan_key, spend, labels


def cmd_compute_expected(args):
    tweak = ENC.blob64_to_point(_hex(args.tweak))
    scan_key, spend, labels = _keys(args)
    vals = PIPE.candidate_values(tweak, scan_key, spend, labels)
    names = ["base"] + [f"label_{i}" for i in range(len(labels))]
    for n, v in zip(names, vals):
        print(f"{n}: {v}")
    return 0


def cmd_which_case(args):
    tweak = ENC.blob64_to_point(_hex(args.tweak))
    scan_key, spend, labels = _keys(args)
    vals = PIPE.candidate_values(tweak, scan_key, spend, labels)
    names = ["base"] + [f"label_{i}" for i in range(len(labels))]
    for n, v in zip(names, vals):
        if v == args.value:
            print(n)
            return 0
    print("no-match", file=sys.stderr)
    return 1


def cmd_decompress_tweak(args):
    raw = _hex(args.sec1)
    if len(raw) != 33 or raw[0] not in (2, 3):
        raise SystemExit("need 33-byte compressed SEC1 (02/03 prefix)")
    pt = EC.decompress_point(raw)
    print(ENC.point_to_blob64(pt).hex())
    return 0


def cmd_upper64(args):
    x = int(args.x.removeprefix("0x"), 16)
    print(PIPE.upper64_signed(x))
    return 0


def cmd_tagged_hash(args):
    print(PIPE.tagged_hash(PIPE.TAG, _hex(args.msg)).hex())
    return 0


def cmd_gen_vectors(args):
    import random

    rng = random.Random(args.seed)
    g = (EC.GX, EC.GY)
    scan_key = rng.randrange(1, EC.N)
    spend = EC.ec_mul(g, rng.randrange(1, EC.N))
    keys = {
        "scan_private_key": ENC.scalar_to_blob32(scan_key).hex(),
        "spend_public_key": ENC.point_to_blob64(spend).hex(),
    }
    print(json.dumps({"keys": keys}))
    for i in range(args.rows):
        tweak = EC.ec_mul(g, rng.randrange(1, EC.N))
        is_match = (i % args.match_every) == 0
        outs = [rng.randrange(-2**62, 2**62) for _ in range(args.outputs)]
        if is_match:
            outs[0] = PIPE.candidate_values(tweak, scan_key, spend)[0]
        print(json.dumps({
            "txid": i.to_bytes(32, "big").hex(),
            "height": 100 + i,
            "tweak_key": ENC.point_to_blob64(tweak).hex(),
            "outputs": outs,
            "expect_match": is_match,
        }))
    return 0


def main(argv=None):
    ap = argparse.ArgumentParser(prog="python -m cudasp_tpu.oracle")
    sub = ap.add_subparsers(dest="cmd", required=True)

    def keyargs(p):
        p.add_argument("--tweak", required=True, help="64-B LE point hex")
        p.add_argument("--scan-key", required=True, help="32-B LE scalar hex")
        p.add_argument("--spend-key", required=True, help="64-B LE point hex")
        p.add_argument("--label", action="append", help="64-B LE point hex")

    p = sub.add_parser("compute-expected")
    keyargs(p)
    p.set_defaults(fn=cmd_compute_expected)

    p = sub.add_parser("which-case")
    keyargs(p)
    p.add_argument("--value", type=int, required=True)
    p.set_defaults(fn=cmd_which_case)

    p = sub.add_parser("decompress-tweak")
    p.add_argument("--sec1", required=True, help="33-B compressed point hex")
    p.set_defaults(fn=cmd_decompress_tweak)

    p = sub.add_parser("upper64")
    p.add_argument("--x", required=True, help="affine x as big-endian hex")
    p.set_defaults(fn=cmd_upper64)

    p = sub.add_parser("tagged-hash")
    p.add_argument("--msg", required=True, help="message hex (37 B in the pipeline)")
    p.set_defaults(fn=cmd_tagged_hash)

    p = sub.add_parser("gen-vectors")
    p.add_argument("--rows", type=int, default=16)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--match-every", type=int, default=4)
    p.add_argument("--outputs", type=int, default=3)
    p.set_defaults(fn=cmd_gen_vectors)

    args = ap.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
