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

    docs = replicate(t["documents"], ["doc_id"], 10_000_000)

    def doc_fingerprint():
        from engine.llm_ops import winnow_fingerprints

        return (
            winnow_fingerprints(
                docs.where(F.length("text") >= 11), id_col="doc_id", text_col="text"
            )
            .groupBy()
            .count()
        )

    run("doc_fingerprint_10x", doc_fingerprint)

    # Banded-LSH embedding dedup at 10×, turning the documented dial: 16 bits
    # per band instead of sf0.1's 4. The fixture embeddings are CLUSTERED
    # (generated around per-label centroids), so coarse buckets concentrate:
    # measured here, 8-bit bands at 10× put ~780 vectors in a bucket →
    # ~156M candidate pairs → a spilling, unstable shuffle (20× rep-to-rep
    # variance). 16-bit bands shrink cross-vector collisions to noise while
    # losing ZERO dedup recall on duplicates — identical vectors agree on
    # every hyperplane sign at any width. A bucket-size ceiling (mirror of
    # llm_ngram_jaccard's df-ceiling) guards the residual skew. The
    # replicated copies are EXACT duplicates of each other, so this also
    # checks recall: ~9/10 of the corpus must be dropped, each copy
    # collapsing onto the lowest-id replica.
    emb = replicate(t["embeddings"], ["vec_id"], 10_000_000)

    def embedding_dedup():
        from engine.similarity import _dbl, _dot, _plane, _spark_bucket

        bands = [[_plane(p) for p in range(16)], [_plane(p) for p in range(16, 32)]]
        b = emb.select(
            "vec_id",
            "embedding",
            F.sqrt(_dot(_dbl("embedding"), _dbl("embedding"))).alias("nrm"),
            _spark_bucket("embedding", bands[0]).alias("b0"),
            _spark_bucket("embedding", bands[1]).alias("b1"),
        )
        m = b.select(
            "vec_id",
            "embedding",
            "nrm",
            F.explode(
                F.array(
                    F.struct(F.lit(0).alias("band"), F.col("b0").alias("bv")),
                    F.struct(F.lit(1).alias("band"), F.col("b1").alias("bv")),
                )
            ).alias("mb"),
        ).select("vec_id", "embedding", "nrm", "mb.band", "mb.bv")
        # skew guard: drop buckets that would go quadratic (cap ≫ the
        # 10-copy duplicate cluster size, so recall is unaffected)
        sizes = m.groupBy("band", "bv").count().where(F.col("count") <= 200)
        m = m.join(F.broadcast(sizes.select("band", "bv")), ["band", "bv"])
        a, x = m.alias("a"), m.alias("x")
        cand = (
            a.join(
                x,
                (F.col("a.band") == F.col("x.band"))
                & (F.col("a.bv") == F.col("x.bv"))
                & (F.col("a.vec_id") < F.col("x.vec_id")),
            )
            .select(F.col("a.vec_id").alias("id_a"), F.col("x.vec_id").alias("id_b"))
            .distinct()
        )
        ea = b.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("emb_a"), F.col("nrm").alias("na"))
        eb = b.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("emb_b"), F.col("nrm").alias("nb"))
        pairs = (
            cand.join(ea, "id_a")
            .join(eb, "id_b")
            .select(
                "id_a",
                "id_b",
                (_dot(_dbl("emb_a"), _dbl("emb_b")) / F.col("na") / F.col("nb")).alias("cos"),
            )
        )
        return (
            pairs.where(F.col("cos") >= 0.35)
            .groupBy("id_b")
            .agg(F.min("id_a").alias("keep_id"))
            .groupBy()
            .count()
        )

    run("embedding_dedup_10x_16bit", embedding_dedup)

    # r03: Q21 one-pass aggregate form at 10× (the 3-exchange reformulation;
    # see engine/tpch_ext.py:join_waiting_orders) — the shape whose semi/anti
    # predecessor was exchange-bound.
    def waiting_orders():
        ps = (
            li.join(
                orders.where(F.col("o_orderstatus") == "F").select(
                    "o_orderkey", "o_orderdate"
                ),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("l_orderkey", "l_suppkey")
            .agg(
                F.max(
                    (
                        F.col("l_shipdate")
                        > F.col("o_orderdate") + F.expr("INTERVAL 60 DAY")
                    ).cast("int")
                ).alias("is_late")
            )
        )
        per_order = ps.groupBy(F.col("l_orderkey").alias("po_ok")).agg(
            F.count("*").alias("n_supp"), F.sum("is_late").alias("n_late")
        )
        return (
            ps.join(per_order, F.col("l_orderkey") == F.col("po_ok"))
            .where(
                (F.col("is_late") == 1)
                & (F.col("n_supp") > 1)
                & (F.col("n_late") == 1)
            )
            .groupBy("l_suppkey")
            .agg(F.count("*").alias("numwait"))
        )

    run("waiting_orders_10x", waiting_orders)

    # r03: substring-level dedup at 10× — the gram-df join is the scaling
    # risk (gram cardinality ~ corpus tokens); replicated docs are exact
    # duplicates so every gram's df jumps 10×, the worst case for the join.
    def substring_dedup():
        w = docs.where(F.col("text") != "").select(
            "doc_id", F.split("text", " ").alias("ws")
        )
        g = w.where(F.size("ws") >= 8).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("ws") - 7),
                    lambda i: F.xxhash64(F.array_join(F.slice("ws", i, 8), " ")),
                )
            ).alias("gram"),
        )
        dfreq = g.groupBy("gram").agg(F.count_distinct("doc_id").alias("docs"))
        return (
            g.join(dfreq, "gram")
            .groupBy("doc_id")
            .agg(
                F.count("*").alias("n_grams"),
                F.count(F.when(F.col("docs") > 1, 1)).alias("n_dup"),
            )
            .groupBy()
            .count()
        )

    run("substring_dedup_10x", substring_dedup)

    print(json.dumps({"metric": "stress_10x", "unit": "sec", "copies": COPIES, "queries": results}))


if __name__ == "__main__":
    main()
