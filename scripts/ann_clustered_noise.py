#!/usr/bin/env python
"""Engine-side recall-vs-noise point for the clustered-ANN evidence keys
(VERDICT r05/r06/r07 optional item: map the recall cliff at σ=0.2).

Runs the EXACT llm_ann_ivf_clustered pipeline (engine.similarity.ivf_parts
over engine.ann_clustered.clustered_embeddings, 48 learned cells,
nprobe=1, decorrelated init) at several noise/signal factors and reports
engine-side recall@3 vs in-engine brute force plus the scan fraction.

The numpy twin (scripts/ann_recall.py --clustered) already maps the cliff
(8k corpus, 40 cells, 2.5% scan: σ=0.15 → 0.983, σ=0.2 → 0.883,
σ=0.25 → 0.617); this script puts the SPARK pipeline itself on the same
curve so the registered key's operating point (σ=0.1, recall 1.0) is
bracketed by a measured engine number one step up the noise axis.

Usage: python scripts/ann_clustered_noise.py [sf_dir] [noise_csv]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    noises = [float(x) for x in (sys.argv[2] if len(sys.argv) > 2 else "0.1,0.2").split(",")]

    from engine.ann_clustered import _CELLS, _ITERS, _NPROBE, clustered_embeddings
    from engine.io import get_spark, load_tables
    from engine.similarity import _dot, ivf_parts

    spark = get_spark(app="ann_noise")
    spark.sparkContext.setLogLevel("ERROR")
    base = load_tables(spark, sf_dir)["embeddings"]

    for noise in noises:
        t0 = time.time()
        e = clustered_embeddings(base, noise=noise)
        parts = ivf_parts(e, _CELLS, _NPROBE, _ITERS)
        ev, q, scored, mine = parts["ev"], parts["q"], parts["scored"], parts["mine"]
        # in-engine brute-force truth over the same corpus/queries (the
        # same ranking discipline as the registered key: cos rounded to
        # 1e-6 desc, nid tiebreak)
        bscored = (
            ev.select(
                F.col("vec_id").alias("nid"),
                F.col("v").alias("ne"),
                F.col("nn").alias("nnrm"),
            )
            .join(F.broadcast(q), F.col("nid") != F.col("qid"))
            .select(
                "qid",
                "nid",
                (_dot(F.col("qe"), F.col("ne")) / F.col("qn") / F.col("nnrm")).alias(
                    "cos"
                ),
            )
        )
        w = Window.partitionBy("qid").orderBy(F.round("cos", 6).desc(), "nid")
        brute = (
            bscored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3)
            .select("qid", "rn", F.col("nid").alias("exact_nid"))
        )
        m = mine.join(brute, ["qid", "rn"]).select(
            (F.col("nid") == F.col("exact_nid")).cast("int").alias("hit")
        )
        recall = m.agg(F.avg("hit")).first()[0]
        n_scored = scored.count()
        n_q = q.count()
        n_corpus = ev.count()
        print(
            f"RESULT noise={noise} recall@3={recall:.4f} "
            f"scan_frac={n_scored / (n_q * n_corpus):.4f} "
            f"corpus={n_corpus} queries={n_q} ({time.time() - t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
