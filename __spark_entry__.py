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


# VERDICT r03 item 2: the never-driver-checked keys with the largest
# hand-rolled-algorithm surface (and therefore the highest residual risk
# despite strict local green) jump the name-order queue — PQ ANN, BPE
# train/apply, Bloom incremental dedup, the batch+streaming IVM pair,
# and the stateful-streaming pair.
_PROMOTED_R04 = [
    "llm_ann_pq",
    "llm_bpe_train",
    "llm_bpe_apply",
    "llm_bloom_dedup",
    "cdc_join_ivm",
    "stream_join_ivm",
    "stream_timeout_sessions",
    "stream_custom_stateful",
]

# Keys added in round 3 (TPC-H completion + llm_ext): genuinely
# never-checked, but they queue BEHIND the round-1/2 keys that have
# already waited two rounds for driver signal (VERDICT r02 item 1 set
# the burn-down priority before these existed).
_NEW_R03 = [
    "join_min_cost_supplier",
    "agg_order_priority_check",
    "agg_forecast_revenue",
    "agg_market_share",
    "agg_product_profit",
    "agg_important_stock",
    "agg_customer_order_dist",
    "agg_top_supplier",
    "agg_supplier_part_cnt",
    "agg_small_qty_revenue",
    "join_excess_supply",
    "join_waiting_orders",
    "agg_global_sales_opp",
    "llm_kmeans_lloyd",
    "llm_substring_dedup",
    "llm_ccnet_buckets",
    "llm_domain_mix_sampler",
    "events_attribution",
    "sink_compaction",
    "join_null_safe",
    "scan_schema_merge",
    "udf_arrow_optimized",
    "scan_time_travel_log",
    "win_sliding_median",
    "fn_try_arith",
    "agg_heavy_hitters",
    "scan_csv_malformed",
    "sink_dynamic_partition_overwrite",
    "stream_timeout_sessions",
    "udf_multimodal_resize",
    "llm_dataset_card",
    "events_cohort_matrix",
    "join_scd2_lookup",
    # late-r03 additions (pipeline_ext/BPE/PQ/CMS): same rule — they
    # queue behind the r1/r2 keys that have waited longer for a driver row
    "llm_chunk_overlap",
    "llm_block_dedup",
    "llm_bloom_dedup",
    "join_star_schema",
    "agg_multi_distinct",
    "events_path_topk",
    "win_gap_islands",
    "events_window_funnel",
    "events_anomaly_zscore",
    "llm_ann_pq",
    "llm_bpe_train",
    "llm_bpe_apply",
    "join_fuzzy_blocked",
    "events_rfm",
    "agg_count_min_sketch",
    "events_markov_transitions",
    "win_ewma",
    "events_ab_welch",
    "dq_referential_integrity",
    "dq_null_profile",
    "dq_accepted_values",
    "cdc_join_ivm",
    "llm_shard_assignment",
    "events_cuped",
    "stream_join_ivm",
    "join_spatial_grid",
    "llm_pipeline_e2e",
    "dq_skew_profile",
    "dq_freshness",
    "llm_hard_negatives",
    "llm_banding_recall_report",
    "dq_distribution_drift",
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

    tier 0: the 8 promoted most-novel never-checked keys (VERDICT r03
            item 2) — PQ ANN, BPE, Bloom dedup, IVM pair, stateful
            streaming pair — highest residual risk despite local green;
    tier 3: previously rows-only keys that NOW carry a hash oracle
            (re-check upgrades r01/r02 recorded as weaker evidence);
    tier 4: never-driver-checked keys — r1/r2-era keys first (three
            rounds waiting; all win_*/udf_*/sort/set/sql_*/text_ext),
            then r03 additions, then streaming (slow: real availableNow
            queries each);
    tier 5: checked-but-oracle-less keys (re-running a rows-only check
            adds no evidence), then fully-passed keys.
    """
    rank = _coverage_rank()
    streaming = {k for k in registry.QUERIES if k.startswith(("stream_", "source_stream"))}
    streaming.add("sink_foreachBatch_merge")
    promoted = {k: i for i, k in enumerate(_PROMOTED_R04) if rank.get(k, 0) < 2}

    def sort_key(item: tuple[str, Callable]) -> tuple[int, int, str]:
        name = item[0]
        if name in promoted:
            return (0, promoted[name], name)
        r = rank.get(name, 0)
        has_oracle = name in registry.ORACLE_SQL
        if r == 1 and has_oracle:
            return (3, 0, name)  # ran rows-only before, hash-checkable now
        if r == 0:
            # within never-checked: non-streaming r1/r2 keys first (three
            # rounds waiting), then r03 additions, then streaming (slow)
            sub = 2 if name in streaming else (1 if name in _NEW_R03 else 0)
            return (4, sub, name)
        # rank 2 (passed) and rank-1-without-oracle: least marginal value
        return (5, r, name)

    ordered = sorted(registry.QUERIES.items(), key=sort_key)
    return dict(ordered)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins for every hash-checkable key."""
    return dict(registry.ORACLE_SQL)
