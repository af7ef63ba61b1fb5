"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``engine`` package; this file only adapts the
registry to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from engine import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    from engine.relational import agg_pricing_summary

    return agg_pricing_summary(spark, "/root/testdata/sf0.001")


def _coverage_rank() -> dict[str, int]:
    """Rank keys by how much driver-side correctness evidence they have.

    The driver checks keys in ``queries()`` iteration order and r01 stopped
    at a 50-key prefix, leaving 112 keys with no hard signal. Merge every
    CORRECTNESS_r*.json in the repo root and order: never-driver-checked
    first (0), checked-but-not-fully-passed next (1), fully-passed last (2)
    — so each round's budget goes to the keys with the least evidence.
    Streaming keys sort after other unchecked keys: each runs a real
    availableNow query (~5-20 s) and would eat the round budget.
    """
    import glob
    import json

    rank: dict[str, int] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    for path in sorted(glob.glob(os.path.join(here, "CORRECTNESS_r*.json"))):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue
        for key, res in rows.items():
            full = bool(res.get("rows_match")) and bool(res.get("schema_match")) and bool(
                res.get("hash_match")
            )
            rank[key] = max(rank.get(key, 0), 2 if full else 1)
    return rank


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so the
    least-driver-verified keys run first (see _coverage_rank)."""
    rank = _coverage_rank()
    streaming = {k for k in registry.QUERIES if k.startswith(("stream_", "source_stream"))}
    streaming.add("sink_foreachBatch_merge")

    def sort_key(item: tuple[str, Callable]) -> tuple[int, int]:
        name = item[0]
        return (rank.get(name, 0), 1 if name in streaming else 0)

    ordered = sorted(registry.QUERIES.items(), key=sort_key)
    return dict(ordered)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every hash-checkable key."""
    return dict(registry.ORACLE_SQL)
