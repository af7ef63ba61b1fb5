#!/usr/bin/env python
"""Materialize an N×-scaled copy of a fixture dir for benchmarking.

The driver ships sf0.001/0.01/0.1; BASELINE/VERDICT ask for bench numbers
at sf1 to retire the ~200 ms fixed local-job overhead that distorts
sub-second queries. This script replicates every fact table N times
(default 10 → "sf1" from sf0.1) with surrogate keys offset per replica so
key cardinalities, join fan-outs, and group counts scale the way a real
TPC-H-style scale-up does:

- dims (region, nation) are copied as-is;
- customer/supplier/part/orders/lineitem offset their PKs AND the matching
  FKs by replica*(max_key+1), so referential joins stay 1:N with 10× rows;
- events offsets event_id/user_id; ts is written as µs timestamp (the
  engine's load_tables accepts both raw-ns and timestamp encodings);
- documents offsets doc_id and applies a per-replica CONTENT-KEYED token
  tag: word w gains a "#r{r}" suffix iff xxhash64(w, r) is even. The map
  is deterministic per token, so within-replica shingle Jaccard (and the
  exact-dup group structure) is preserved EXACTLY, while a 3-token
  shingle survives across two replicas only if all 3 words are untagged
  in BOTH (≈(1/4)³ → cross-replica Jaccard ≈ 1%, far below tau). A mere
  tail token (previous attempt) left replicas at Jaccard ≈ S/(S+1) —
  every doc in an artificial 10-clique (measured: 24 859 minhash pairs
  vs 256 on equal-size native data). n_chars is recomputed;
- embeddings offsets vec_id and applies a per-replica signed dimension
  permutation (an isometry: norms and within-replica geometry exactly
  preserved). Cross-replica cosines then match INDEPENDENT-sample
  statistics: the fixture's vectors are isotropic (label centroid norms
  ≈ 0.07, within-label cosine distribution = global), so scrambled
  cross cosines ~N(0, 1/64) reproduce the native pair distribution —
  validated by edge counts: scaled sf0.01×10 (n=5000) yields 7 349
  LSH-found cos≥0.35 edges vs 7 380 predicted by n²-scaling native
  sf0.1's rate. NOTE the resulting giant dedup component at n≥5k is
  genuine percolation of the cos≥0.35 graph (native sf0.1 already has a
  410-vertex component among 2 000 vectors), NOT a replication artifact
  — the artifact (every replica a near-dup of its original, cos≈1-2/64)
  only existed under the earlier single-dim sign flip.

Deterministic: same input → byte-identical logical content (row order may
differ; all consumers are order-insensitive).

Usage: python scripts/make_scaled.py [src_dir] [dst_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from engine.io import TABLES, get_spark, load_tables


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/tmp/engine_sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    spark = get_spark(app="make_scaled")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, src, dst, factor)


def build(spark, src: str, dst: str, factor: int = 10) -> None:
    """Materialize the scaled copy (importable — bench.py builds the sf1
    fixture through this on first use, marker-cached under dst)."""
    t = load_tables(spark, src)

    # per-table (pk/fk column → stride) offsets; stride = max(pk)+1 once
    strides = {
        "custkey": t["customer"].agg(F.max("c_custkey")).collect()[0][0] + 1,
        "suppkey": t["supplier"].agg(F.max("s_suppkey")).collect()[0][0] + 1,
        "partkey": t["part"].agg(F.max("p_partkey")).collect()[0][0] + 1,
        "orderkey": t["orders"].agg(F.max("o_orderkey")).collect()[0][0] + 1,
        "event_id": t["events"].agg(F.max("event_id")).collect()[0][0] + 1,
        "user_id": t["events"].agg(F.max("user_id")).collect()[0][0] + 1,
        "doc_id": t["documents"].agg(F.max("doc_id")).collect()[0][0] + 1,
        "vec_id": t["embeddings"].agg(F.max("vec_id")).collect()[0][0] + 1,
    }
    offset_cols = {
        "customer": {"c_custkey": "custkey"},
        "supplier": {"s_suppkey": "suppkey"},
        "part": {"p_partkey": "partkey"},
        "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
        "lineitem": {
            "l_orderkey": "orderkey",
            "l_partkey": "partkey",
            "l_suppkey": "suppkey",
        },
        "events": {"event_id": "event_id", "user_id": "user_id"},
        "documents": {"doc_id": "doc_id"},
        "embeddings": {"vec_id": "vec_id"},
    }

    for name in TABLES:
        df = t[name]
        if name == "events":
            df = df.drop("ts_ns")  # derived; re-derived on load
        if name in ("region", "nation"):
            out = df
        else:
            reps = []
            for r in range(factor):
                rep = df
                for col, stride in offset_cols[name].items():
                    rep = rep.withColumn(
                        col, (F.col(col) + F.lit(r * strides[stride])).cast("long")
                    )
                if name == "documents" and r > 0:
                    rep = rep.withColumn(
                        "text",
                        F.when(F.col("text") == "", F.col("text")).otherwise(
                            F.array_join(
                                F.transform(
                                    F.split(F.col("text"), " "),
                                    lambda w: F.when(
                                        F.xxhash64(w, F.lit(r)) % 2 == 0,
                                        F.concat(w, F.lit(f"#r{r}")),
                                    ).otherwise(w),
                                ),
                                " ",
                            )
                        ),
                    ).withColumn("n_chars", F.length("text").cast("int"))
                if name == "embeddings" and r > 0:
                    # per-replica signed dimension permutation (affine map
                    # with odd stride, coprime to 64, + Rademacher signs):
                    # norms and within-replica geometry are exactly
                    # preserved, while cross-replica cosines scramble to
                    # ~N(0, 1/64). Signs alone are NOT enough: the fixture
                    # clusters tightly around label centroids, so a fixed
                    # sign pattern gives every (replica-pair, label) a
                    # FIXED cosine that often exceeds tau -> one giant
                    # artificial dup component.
                    stride = (2 * r + 1) % 64  # odd -> bijective mod 64
                    shift = (r * 23) % 64
                    rep = rep.withColumn(
                        "embedding",
                        F.expr(
                            f"transform(sequence(0, 63), i -> "
                            f"case when pmod((i + 1) * ({r} * 2654435761 + 12345), 97) < 48 "
                            f"then -element_at(embedding, pmod(i * {stride} + {shift}, 64) + 1) "
                            f"else element_at(embedding, pmod(i * {stride} + {shift}, 64) + 1) end)"
                        ).cast("array<float>"),
                    )
                reps.append(rep)
            out = reps[0]
            for rep in reps[1:]:
                out = out.unionByName(rep)
        # scan-parallelism floor (VERDICT r04 item 5): a replica union
        # inherits `factor` input partitions, so sf1 (factor=10) wrote 10
        # files × one 128 MB-bounded row group each — a 10-way scan
        # ceiling on 32 cores for the scan-bound keys (pricing summary,
        # snapshot diff, centroids), while DuckDB parallelizes inside a
        # single row group. Repartition facts to ≥32 output files and
        # bound groups at 16 MB so every scale factor yields at least
        # cores-many splittable units.
        if name not in ("region", "nation"):
            out = out.repartition(max(32, factor))
        out.write.option("parquet.block.size", 16 * 1024 * 1024).mode(
            "overwrite"
        ).parquet(os.path.join(dst, f"{name}.parquet"))
        # stderr: bench.py imports build() and its stdout must stay a
        # single JSON line for the driver
        print(
            f"wrote {name}: "
            f"{spark.read.parquet(os.path.join(dst, name + '.parquet')).count()} rows",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
