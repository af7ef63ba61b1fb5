#!/usr/bin/env python
"""Scale-headroom stress: run the heavy headline shapes on 10× sf0.1 data
(6M lineitem rows / 1M events) synthesized by key-offset self-union —
checks that runtimes scale ~linearly with data (no super-linear shuffle or
state blow-up) on the exact plans bench.py times.

This is a scaling probe, not a correctness gate (correctness runs against
the driver fixtures only). Usage: python stress.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

COPIES = 10


def replicate(df, key_cols, offset_unit: int):
    """Union COPIES copies with disjoint key ranges (keys stay unique)."""
    from pyspark.sql import functions as F

    parts = []
    for i in range(COPIES):
        p = df
        for k in key_cols:
            p = p.withColumn(k, F.col(k) + F.lit(i * offset_unit))
        parts.append(p)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> None:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from engine.io import get_spark, load_tables

    spark = get_spark(app="stress")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).count()
    t = load_tables(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))

    li = replicate(t["lineitem"], ["l_orderkey"], 10_000_000)
    ev = replicate(t["events"], ["event_id", "user_id"], 10_000_000)
    orders = replicate(t["orders"], ["o_orderkey", "o_custkey"], 10_000_000)

    results = {}

    def run(name, fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        results[name] = round(best, 3)

    run("rows_lineitem_10x", lambda: li.groupBy().count())

    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    run(
        "pricing_summary_10x",
        lambda: li.where(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(F.sum("l_quantity").alias("sq"), F.sum(disc).alias("sd"), F.count("*").alias("n")),
    )

    def sessionize():
        us = F.expr("ts_ns div 1000")
        w = Window.partitionBy("user_id").orderBy("ts", "event_id")
        wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        fl = ev.select("user_id", "ts", "event_id", us.alias("us")).withColumn(
            "ns",
            F.when((F.col("us") - F.lag("us").over(w) > 1_800_000_000) | F.lag("us").over(w).isNull(), 1).otherwise(0),
        )
        return (
            fl.withColumn("sid", F.sum("ns").over(wc))
            .groupBy("user_id", "sid")
            .agg(F.count("*").alias("n"))
        )

    run("sessionize_10x", sessionize)

    def cdc_diff():
        from engine.cdc import ORDERS_SPEC, snapshot_diff

        prev = orders.where(F.col("o_orderkey") % 10 != 0)
        curr = orders.where(F.col("o_orderkey") % 11 != 0)
        return snapshot_diff(prev, curr, ORDERS_SPEC).groupBy("op").count()

    run("cdc_snapshot_diff_10x", cdc_diff)

    def join_agg():
        return (
            li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.sum(disc).alias("rev"), F.count("*").alias("n"))
        )

    run("lineitem_orders_join_10x", join_agg)

    print(json.dumps({"metric": "stress_10x", "unit": "sec", "copies": COPIES, "queries": results}))


if __name__ == "__main__":
    main()
