"""Edge-case differential fixture #3: embedding-space operators re-run
against DuckDB on vectors that concentrate the numeric hazards — the
ZERO vector (norm 0 ⇒ cosine division), constant vectors (max = min ⇒
quantizer scale 0), exact duplicates (cosine exactly 1, dedup hits),
near-zero and huge magnitudes, and an antipodal pair (cosine exactly −1).

Query vectors (vec_id < 20) deliberately include the zero vector so every
ANN variant's query side hits the hazard, not just the corpus side.
"""

from __future__ import annotations

import math
import os
import shutil

import pytest

from engine import registry

registry.load_all()

SRC_SF = "/root/testdata/sf0.001"
DIM = 64


def _mk_vecs():
    rows = []

    def vec(i, arr, label):
        rows.append((i, [float(x) for x in arr], label))

    vec(0, [0.0] * DIM, 0)                     # zero vector (query)
    vec(1, [1.0] * DIM, 1)                     # constant vector
    base = [math.sin(i + 1) for i in range(DIM)]
    vec(2, base, 2)                            # duplicate pair a
    vec(3, base, 3)                            # duplicate pair b
    vec(4, [1e-8] * DIM, 4)                    # near-zero magnitude
    vec(5, [1e8 * math.cos(i) for i in range(DIM)], 5)  # huge magnitude
    vec(6, [-x for x in base], 6)              # antipodal to 2/3
    for i in range(7, 40):                     # deterministic filler
        vec(i, [math.sin(i * DIM + j) for j in range(DIM)], i % 10)
    return rows


EDGE_KEYS = [
    "llm_embed_norm",
    "llm_cosine_topk",
    "llm_centroids",
    "llm_embedding_quantize",
    "llm_ann_brute",
    "llm_ann_lsh",
    "llm_ann_ivf",
    "llm_ann_quantized",
    "llm_ann_pq",
    "llm_near_dedup_embedding",
    "llm_semdedup",
    "llm_kmeans_lloyd",
]


@pytest.fixture(scope="module")
def edge_emb_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("edge_emb"))
    for f in os.listdir(SRC_SF):
        shutil.copy(os.path.join(SRC_SF, f), os.path.join(base, f))
    df = spark.createDataFrame(
        _mk_vecs(), "vec_id long, embedding array<float>, label int"
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        os.path.join(base, "embeddings.parquet")
    )
    return base


@pytest.mark.parametrize("name", EDGE_KEYS)
def test_edge_embedding_key(spark, edge_emb_dir, name):
    from tests.oracle import check_key

    check_key(spark, name, edge_emb_dir)
