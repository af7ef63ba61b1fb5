"""Local replica of the driver's differential-oracle check (SURVEY §5.2.1).

For each registered key: run the Spark query and the DuckDB oracle SQL on
the same parquet fixtures, then compare row count, sorted column names, and
order-insensitive values. Strict by design — if this passes, the driver's
value-hash should too, because every query fn already emits rounded floats
and µs-truncated timestamps (SURVEY §5.3).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime
from typing import Any

import duckdb

from engine.io import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def duck_run(sf_dir: str, sql: str):
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t + '.parquet')}')"
            )
        cur = con.execute(sql)
        cols = [d[0] for d in cur.description]
        rows = cur.fetchall()
        return cols, rows
    finally:
        con.close()


def _norm_cell(v: Any) -> Any:
    """Normalize a single value into a hashable, engine-agnostic form."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        # 9dp guard: queries already round their own floats coarser.
        return round(v, 9)
    if isinstance(v, datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if hasattr(v, "asDict"):  # pyspark Row (struct) — MUST precede tuple check
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.asDict().items()))
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_norm_cell(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_cell(x)) for k, x in v.items()))
    if type(v).__module__ == "numpy":  # numpy scalar
        return _norm_cell(v.item())
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def _norm_rows(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def compare(spark_df, sf_dir: str, oracle: str) -> tuple[bool, str]:
    """Return (ok, message). Mirrors the driver: count + schema + values."""
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duck_run(sf_dir, oracle)

    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sn, dn = _norm_rows(s_cols, s_rows), _norm_rows(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"value mismatch, first diffs (spark, duck): {diffs}"
    return True, f"ok ({len(s_rows)} rows)"


def check_key(spark, name: str, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Assert one registered key matches its oracle (or rows>=0 if none)."""
    from engine.registry import ORACLE_SQL, QUERIES

    df = QUERIES[name](spark, sf_dir)
    if name in ORACLE_SQL:
        ok, msg = compare(df, sf_dir, ORACLE_SQL[name])
        assert ok, f"{name}: {msg}"
    else:
        n = df.count()
        assert n >= 0
