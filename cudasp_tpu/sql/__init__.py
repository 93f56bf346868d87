"""SQL front end: the reference's L5 user surface, engine-agnostic.

The reference exposes exactly one SQL object — the `cudasp_scan` table
in-out function registered inside DuckDB
(/root/reference/src/cudasp_extension.cu:626-635, README.md:70-119).
This package provides that surface twice over:

  * engine.SQLEngine — a self-contained interpreter for the SQL dialect
    the reference's own test suite uses (CREATE TABLE, INSERT ... VALUES,
    CREATE TABLE AS SELECT ... FROM range(N), SELECT over cudasp_scan
    with BLOB literals, lists, casts and the batch_size named parameter),
    so /root/reference/test/sql/cudasp.test runs VERBATIM with zero
    third-party dependencies.
  * duckdb_bridge.DuckDBEngine — the same statement surface executed by a
    real DuckDB (when the `duckdb` package is importable): all relational
    work runs in DuckDB, and cudasp_scan(...) calls are bridged through
    Arrow into api.scan and back as a DuckDB view.

sqllogic.run_file drives either engine through sqllogictest files
(`statement ok` / `query I` / `----` blocks — the format of the
reference's test/sql/cudasp.test, executed there by DuckDB's unittest
runner, test/README.md:1-10).
"""

from .engine import SQLEngine
from .sqllogic import run_file, run_script

__all__ = ["SQLEngine", "run_file", "run_script", "make_engine"]


def make_engine(kind: str = "auto"):
    """kind: 'builtin' | 'duckdb' | 'auto' (duckdb when importable)."""
    if kind in ("auto", "duckdb"):
        try:
            from .duckdb_bridge import DuckDBEngine

            return DuckDBEngine()
        except ImportError:
            if kind == "duckdb":
                raise
    return SQLEngine()
