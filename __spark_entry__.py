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


# VERDICT r04 item 1: the five never-driver-checked SURVEY §2.1–§2.11
# CONTRACT keys (all streaming — the old streaming-last heuristic kept
# pushing them behind §2.12 extras) jump the queue, followed by their two
# §2.12 streaming siblings and the new clustered-ANN evidence keys
# (VERDICT r04 item 4). After round 5 every §2.1–§2.11 key should carry a
# passing CORRECTNESS row.
_PROMOTED_R05 = [
    "source_stream_files",
    "sink_foreachBatch_merge",
    "stream_session_window",
    "stream_watermark_late",
    "stream_stateful_running",
    "stream_stream_join",
    "stream_scd2_foreachbatch",
    "llm_ann_ivf_clustered",
    "llm_ann_pq_clustered",
]

def _coverage_rank() -> dict[str, int]:
    """Rank keys by how much driver-side correctness evidence they have.

    Merge every CORRECTNESS_r*.json in the repo root: never-driver-checked
    first (0), checked-but-not-fully-passed next (1), fully-passed last (2)
    — so each round's ~50-key budget goes to the keys with the least
    evidence.
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
    driver's fixed-prefix check lands on the keys that need it most:

    tier 0: the promoted keys (VERDICT r04 items 1+4) — the five
            never-checked §2.1–§2.11 CONTRACT streaming keys, their two
            §2.12 streaming siblings, and the clustered-ANN evidence
            keys. Contract keys outrank every §2.12 extra regardless of
            the old streaming-last heuristic;
    tier 3: previously rows-only keys that NOW carry a hash oracle
            (re-check upgrades r01/r02 recorded as weaker evidence);
    tier 4: remaining never-driver-checked keys in name order (the 50-key
            prefix covers all but the tail, which lands in round 6);
    tier 5: checked-but-oracle-less keys (re-running a rows-only check
            adds no evidence), then fully-passed keys.
    """
    rank = _coverage_rank()
    promoted = {k: i for i, k in enumerate(_PROMOTED_R05) if rank.get(k, 0) < 2}

    def sort_key(item: tuple[str, Callable]) -> tuple[int, int, str]:
        name = item[0]
        if name in promoted:
            return (0, promoted[name], name)
        r = rank.get(name, 0)
        has_oracle = name in registry.ORACLE_SQL
        if r == 1 and has_oracle:
            return (3, 0, name)  # ran rows-only before, hash-checkable now
        if r == 0:
            return (4, 0, name)
        # rank 2 (passed) and rank-1-without-oracle: least marginal value
        return (5, r, name)

    ordered = sorted(registry.QUERIES.items(), key=sort_key)
    return dict(ordered)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every hash-checkable key."""
    return dict(registry.ORACLE_SQL)
