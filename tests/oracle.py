"""Local replica of the driver's differential-oracle check (SURVEY §5.2.1).

For each registered key: run the Spark query and the DuckDB oracle SQL on
the same parquet fixtures, then compare row count, sorted column names, and
order-insensitive values.

Strictness contract (r01 lesson — VERDICT "What's wrong"): the driver
canonicalizes BOTH result sets through pandas and value-hashes with full
type sensitivity, so this replica must reproduce the same conversions or it
over-passes:

- DuckDB results come via ``.df()`` (NOT ``fetchall``): HUGEINT (integer
  ``sum()``) and DECIMAL columns land as float64, exactly as the driver
  sees them. Spark results come via ``toPandas``.
- Cells carry a type tag: int ≠ float ≠ Decimal ≠ bool, so
  ``788918400 == 788918400.0`` is a MISMATCH here (it is for the driver).
  Int width is NOT distinguished (Spark INT vs DuckDB BIGINT hash-matched
  in r01, e.g. fn_date_parts).
- Complex cells (ndarray / list / map / struct) in an oracle-checked key
  raise immediately — the driver's canonicalizer crashes on them
  ("unhashable type: numpy.ndarray"), so final projections must serialize
  arrays/maps to strings.
- round() is NOT cross-engine deterministic even on identical doubles:
  Spark routes doubles through BigDecimal's shortest-decimal-repr with
  HALF_UP (round(-138507.235, 2) → -138507.24) while DuckDB rounds the
  binary value (…23499…8 → -138507.23). Harmless when the unrounded
  value carries float noise anyway (the 5-boundary is measure-zero), but
  systematic when exact decimal arithmetic lands values on half cents —
  then use floor(x*100 + 0.5) (a pure value function) or emit integer
  cents (see sql_scalar_subquery).
"""

from __future__ import annotations

import math
import os
from datetime import date, datetime, time, timedelta
from decimal import Decimal
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from engine.io import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.01")


def duck_run_df(sf_dir: str, sql: str) -> pd.DataFrame:
    """Run oracle SQL with the fixture views registered; return ``.df()``
    (pandas) so DuckDB's type conversions match what the driver hashes."""
    con = duckdb.connect()
    try:
        for t in TABLES:
            p = os.path.join(sf_dir, t + ".parquet")
            if os.path.isdir(p):  # Spark-written dataset (e.g. scaled fixtures)
                p = os.path.join(p, "*.parquet")
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
        return con.execute(sql).df()
    finally:
        con.close()


def _norm_cell(v: Any) -> Any:
    """Normalize one value into a hashable, type-tagged form.

    Raises TypeError on complex cells — mirrors the driver's canonicalizer
    crashing on ndarray/dict cells, so the local suite fails BEFORE the
    driver does.
    """
    if v is None:
        return None
    if isinstance(v, (np.ndarray, list, tuple, set, dict)) or hasattr(v, "asDict"):
        raise TypeError(
            f"complex cell {type(v).__name__!r} is not driver-hashable; "
            "serialize arrays/maps/structs to strings in the final projection"
        )
    if isinstance(v, (bool, np.bool_)):
        return ("b", bool(v))
    if isinstance(v, (int, np.integer)):
        return ("i", int(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return None
        # 9dp guard: queries already round their own floats coarser.
        return ("f", round(f, 9))
    if isinstance(v, Decimal):
        return ("d", str(v.normalize()))
    if isinstance(v, pd.Timestamp):
        if pd.isna(v):
            return None
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (time, timedelta)):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    if v is pd.NaT:
        return None
    return v


def _canon(pdf: pd.DataFrame) -> list[tuple]:
    """Column-name-sorted, row-sorted, type-tagged canonical rows."""
    pdf = pdf[sorted(pdf.columns)]
    out = [
        tuple(_norm_cell(v) for v in row)
        for row in pdf.itertuples(index=False, name=None)
    ]
    out.sort(key=lambda r: tuple((x is None, str(type(x)), str(x)) for x in r))
    return out


def compare(spark_df, sf_dir: str, oracle: str) -> tuple[bool, str]:
    """Return (ok, message). Mirrors the driver: count + schema + values."""
    s_pdf = spark_df.toPandas()
    d_pdf = duck_run_df(sf_dir, oracle)

    if sorted(s_pdf.columns) != sorted(d_pdf.columns):
        return False, (
            f"schema mismatch: spark={sorted(s_pdf.columns)} duck={sorted(d_pdf.columns)}"
        )
    if len(s_pdf) != len(d_pdf):
        return False, f"row count mismatch: spark={len(s_pdf)} duck={len(d_pdf)}"
    sn, dn = _canon(s_pdf), _canon(d_pdf)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
        return False, f"value mismatch, first diffs (spark, duck): {diffs}"
    return True, f"ok ({len(s_pdf)} rows)"


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
