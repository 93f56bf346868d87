"""Command-line runner: the user-facing surface that plays the role of the
reference's SQL examples (`SELECT * FROM cudasp_scan(...)`,
/root/reference/README.md:70-119) for users without a SQL engine.

    python -m cudasp_tpu scan --input txs.parquet \
        --scan-key <64-hex LE scalar> --spend-key <128-hex LE point> \
        [--label <128-hex LE point>]... [--batch-size N] [--out matches.parquet]

Input table schema mirrors the reference (README.md:75-80): columns
``txid`` (binary), ``height`` (int), ``tweak_key`` (64-byte binary,
LE x || LE y), ``outputs`` (list<int64>). Parquet, Arrow IPC/Feather, and
JSONL are auto-detected by extension.
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _read_key(spec: str, width: int, name: str) -> bytes:
    """Key argument: hex string, or @path to a raw-bytes / hex file."""
    if spec.startswith("@"):
        with open(spec[1:], "rb") as f:
            data = f.read()
        if len(data) == width:
            return data
        spec = data.decode().strip()
    spec = spec.removeprefix("0x")
    try:
        raw = bytes.fromhex(spec)
    except ValueError as e:
        raise SystemExit(f"{name}: not valid hex: {e}") from e
    if len(raw) != width:
        raise SystemExit(f"{name}: expected {width} bytes, got {len(raw)}")
    return raw


def _load_table(path: str):
    if path.endswith((".parquet", ".pq")):
        import pyarrow.parquet as pq

        return pq.read_table(path)
    if path.endswith((".arrow", ".feather", ".ipc")):
        import pyarrow.feather as feather

        return feather.read_table(path)
    if path.endswith((".jsonl", ".json")):
        rows = []
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rows.append(json.loads(line))
        return {
            "txid": [bytes.fromhex(r["txid"]) if isinstance(r.get("txid"), str)
                     else r.get("txid") for r in rows],
            "height": [r.get("height") for r in rows],
            "tweak_key": [bytes.fromhex(r["tweak_key"]) for r in rows],
            "outputs": [r.get("outputs", []) for r in rows],
        }
    raise SystemExit(f"unsupported input format: {path} "
                     "(use .parquet/.arrow/.feather/.jsonl)")


def _write_result(res, out: str):
    import numpy as np

    n = len(res.indices)
    txid = res.txid if res.txid is not None else [None] * n
    height = res.height if res.height is not None else [None] * n
    if out == "-" or out is None:
        for i in range(n):
            t = txid[i]
            row = {
                "row": int(res.indices[i]),
                "txid": bytes(t).hex() if t is not None else None,
                "height": int(height[i]) if height[i] is not None else None,
                "tweak_key": bytes(res.tweak_key[i]).hex(),
            }
            print(json.dumps(row))
        return
    import pyarrow as pa

    table = pa.table({
        "txid": pa.array([bytes(t) if t is not None else None for t in txid],
                         pa.binary()),
        "height": pa.array([int(h) if h is not None else None for h in height],
                           pa.int32()),
        "tweak_key": pa.array([bytes(t) for t in np.asarray(res.tweak_key)],
                              pa.binary()),
    })
    if out.endswith((".parquet", ".pq")):
        import pyarrow.parquet as pq

        pq.write_table(table, out)
    else:
        import pyarrow.feather as feather

        feather.write_table(table, out)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="cudasp_tpu",
        description="TPU-native BIP-352 silent-payments scanner")
    sub = ap.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("scan", help="scan a table for matches")
    sp.add_argument("--input", required=True,
                    help="table file (.parquet/.arrow/.feather/.jsonl)")
    sp.add_argument("--scan-key", required=True,
                    help="32-byte LE scalar: hex or @file")
    sp.add_argument("--spend-key", required=True,
                    help="64-byte LE point (x||y): hex or @file")
    sp.add_argument("--label", action="append", default=[],
                    help="64-byte LE label point (repeatable)")
    sp.add_argument("--batch-size", type=int, default=None)
    sp.add_argument("--backend", default="auto",
                    choices=["auto", "pallas", "xla"])
    sp.add_argument("--upload", default="auto",
                    choices=["auto", "full64", "full", "hi32", "hi16",
                             "hi8"],
                    help="batch wire format: auto picks per batch from "
                         "the measured link rate vs kernel time; full64 "
                         "ships the uncompressed 64-B point (fast links), "
                         "hi8/hi16/hi32 ship prefilter words + exact "
                         "reverify (slow links)")
    sp.add_argument("--ladder", default="auto",
                    choices=["auto", "fixed", "wnaf"],
                    help="scalar-ladder schedule (auto = fixed)")
    sp.add_argument("--static-key", action="store_true",
                    help="compile the scan key's ladder schedule into the "
                         "kernel (one compile per key, ~43 vs 64 adds; "
                         "for long-lived keys on large scans)")
    sp.add_argument("--block-rows", type=int, default=None,
                    help="Pallas kernel rows per grid step (default: "
                         "measured per device kind)")
    sp.add_argument("--out", default="-",
                    help="output file (.parquet/.feather) or '-' for JSONL")
    sp.add_argument("--metrics", action="store_true",
                    help="print scan metrics to stderr")
    sp.add_argument("--stream", type=int, default=0, metavar="CHUNK_ROWS",
                    help="stream the input in CHUNK_ROWS-row chunks with "
                         "bounded host memory (parquet only; for 100M+-row "
                         "tables)")

    sq = sub.add_parser(
        "sql",
        help="run SQL (the reference's cudasp_scan dialect) from a file, "
             "a -e statement, or stdin; .test files run as sqllogictest")
    sq.add_argument("script", nargs="?",
                    help="SQL script or sqllogictest .test file "
                         "(default: read statements from stdin)")
    sq.add_argument("-e", "--execute", action="append", default=[],
                    help="execute this statement (repeatable)")
    sq.add_argument("--engine", default="auto",
                    choices=["auto", "builtin", "duckdb"],
                    help="duckdb = bridge through a real DuckDB when the "
                         "package is importable")

    args = ap.parse_args(argv)
    if args.cmd == "sql":
        from .sql import make_engine, run_file

        if args.script and args.script.endswith(".test"):
            report = run_file(args.script, engine=make_engine(args.engine))
            for f in report.failures:
                print(f"FAIL {f}", file=sys.stderr)
            print(f"# {report.statements} statements, {report.queries} "
                  f"queries, {len(report.failures)} failures",
                  file=sys.stderr)
            return 1 if report.failures else 0
        engine = make_engine(args.engine)
        statements = list(args.execute)
        if args.script:
            with open(args.script) as f:
                text = f.read()
            statements += [s for s in text.split(";") if s.strip()]
        elif not statements:
            statements = [s for s in sys.stdin.read().split(";")
                          if s.strip()]
        for stmt in statements:
            rows = engine.execute(stmt)
            if rows is not None:
                for row in rows:
                    print("\t".join(
                        v.hex() if isinstance(v, (bytes, bytearray))
                        else str(v) for v in row))
        return 0
    if args.cmd == "scan":
        from . import scan
        from .api import ScanConfig

        scan_key = _read_key(args.scan_key, 32, "--scan-key")
        spend_key = _read_key(args.spend_key, 64, "--spend-key")
        labels = [_read_key(s, 64, "--label") for s in args.label]

        cfg = ScanConfig(backend=args.backend, upload=args.upload,
                         ladder=args.ladder, static_key=args.static_key)
        if args.batch_size is not None:
            cfg.batch_size = args.batch_size
        if args.block_rows is not None:
            cfg.block_rows = args.block_rows
        if args.stream:
            if not args.input.endswith((".parquet", ".pq")):
                raise SystemExit("--stream requires a parquet input")
            from .api import scan_stream
            import pyarrow.parquet as pq

            pf = pq.ParquetFile(args.input)
            t0 = time.time()
            res = scan_stream(pf.iter_batches(batch_size=args.stream),
                              scan_key, spend_key, labels, config=cfg)
            dt = time.time() - t0
        else:
            table = _load_table(args.input)
            t0 = time.time()
            res = scan(table, scan_key, spend_key, labels, config=cfg)
            dt = time.time() - t0
        _write_result(res, args.out)
        if args.metrics and res.metrics is not None:
            m = res.metrics.as_dict()
            m["wall_seconds"] = round(dt, 3)
            print(json.dumps(m), file=sys.stderr)
        print(f"# {len(res)} matches in {dt:.2f}s", file=sys.stderr)
        return 0
    return 2


if __name__ == "__main__":
    sys.exit(main())
