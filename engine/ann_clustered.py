"""Clustered-corpus ANN evidence keys (VERDICT r04 item 4).

Round 4 measured IVF/PQ recall on clustered vectors — the deployment
shape, where real embedding corpora live — but only via numpy twins in
scripts/ann_recall.py, outside the driver's hash gate. These two keys put
that claim itself under driver verification: a deterministic clustered
corpus is DERIVED from the fixture (so both engines can construct it
bit-identically), the REGISTERED pipelines (engine/similarity.py:
ivf_parts / pq_parts — the exact code paths of llm_ann_ivf / llm_ann_pq)
run on it at the deployment operating point (48 learned cells ×
nprobe=1 ≈ 3-4% scan from a DECORRELATED init; PQ shortlist = ceil(4%
of corpus)), and the output carries recall + scan_frac columns computed
against in-query brute force — so a green CORRECTNESS row IS the
measured claim "recall ≥ 0.9 at ≤ 5% scan on clustered vectors"
(prototyped this round with the decorrelated label: recall 1.000 both
pipelines at 8×500 and 8×2000 corpus sizes).

Corpus construction (mirrored term-for-term in the DuckDB oracle):

- ids: each fixture vec_id replicates ×8 → id = vec_id·8 + r, so the
  corpus is 4 000 vectors at the sf0.01 driver gate (16 000 at sf0.1)
  with NO driver-side count anywhere;
- cluster label c = mix(id) % 40 (mix constants b=(3, 17), distinct
  from the value mixes) — DECORRELATED from the pipelines' id-mod
  quantizer seeding per ADVICE r05: with the old c = id % 40 the
  vec_id % k init started Lloyd AT the true assignment, so recall 1.0
  said nothing about learned cells. Now init cells are uniform
  mixtures of true clusters; the measured convergence (numpy twin,
  this round) is purity 0.675 — cells merge/split — yet recall@3
  stays 1.000 because a merged learned cell still contains the whole
  true cluster of every query routed to it. _CELLS moved 40 → 48
  (production never knows the true k; over-provisioned cells split
  mergers) which brings the scan back down: 3.6 % at n=4 000, 3.2 %
  at n=16 000 (vs 5.4 % at cells=40 decorrelated);
- values: dimension j of centroid c and the per-vector noise both come
  from a nonlinear integer mix h(x) = ((x·48271+b₁) mod 46337) ·
  ((x·16807+b₂) mod 46327) mod 2001 mapped to [-1, 1] — pure BIGINT
  arithmetic + one double division, bit-identical across engines (a
  single LCG is affine in x, so adjacent dimensions would be linearly
  correlated; the product of two co-prime-modulus LCGs is not);
- v[j] = cent(c, j) + 0.1 · noise(id, j): per-dim noise/signal ratio
  0.1 → within-cluster cosine ≈ 0.99, cross-cluster ≈ 0 — the "tight
  cluster" regime of real text-embedding corpora.

All heavy stages inherit the base pipelines' 100 TB shapes (broadcast
centroids/codebooks/ADC, corpus never re-shuffled raw); the derived
source adds one narrow projection over the fixture scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.io import load_tables
from engine.registry import query
from engine.similarity import (
    _dot,
    _sql_cos,
    ivf_oracle_ctes,
    ivf_parts,
    pq_oracle_ctes,
    pq_parts,
)

_REPL = 8
_K_CLUSTERS = 40
#: mix constants for the label derivation — distinct from both value
#: mixes so label, centroid values, and noise are pairwise independent
_LABEL_B = (3, 17)
_CELLS = 48
_NPROBE = 1
_ITERS = 2
_SL_PCT = 4  # PQ shortlist = ceil(4% of corpus)


def _mix_col(x, b1: int, b2: int):
    """((x·48271+b1) % 46337) · ((x·16807+b2) % 46327) % 2001 on BIGINT
    columns — the Spark side of the corpus hash (all operands < 2^63)."""
    ha = (x * F.lit(48271) + F.lit(b1)) % F.lit(46337)
    hb = (x * F.lit(16807) + F.lit(b2)) % F.lit(46327)
    return (ha * hb) % F.lit(2001)


def clustered_embeddings(e: DataFrame, noise: float = 0.1) -> DataFrame:
    """Derive the deterministic clustered corpus (vec_id, embedding)
    from the fixture embeddings table — see module docstring. ``noise``
    is the per-dim noise/signal factor (0.1 = the registered key's tight
    regime; scripts/ann_clustered_noise.py measures the recall cliff at
    0.2, VERDICT r05/r06/r07 item — higher values blur cluster
    boundaries toward the isotropic worst case)."""
    ids = (
        e.select(
            "vec_id",
            F.explode(F.sequence(F.lit(0), F.lit(_REPL - 1))).alias("r"),
        )
        .select(
            (F.col("vec_id").cast("long") * _REPL + F.col("r").cast("long")).alias(
                "vec_id"
            )
        )
        .select(
            "vec_id",
            (_mix_col(F.col("vec_id"), *_LABEL_B) % _K_CLUSTERS).alias("c"),
        )
    )
    dims = F.sequence(F.lit(0), F.lit(63))

    def val(j):
        cx = F.col("c") * 64 + j.cast("long")
        nx = F.col("vec_id") * 64 + j.cast("long")
        cent = (_mix_col(cx, 11, 7) - 1000) / F.lit(1000.0)
        nz = (_mix_col(nx, 12345, 54321) - 1000) / F.lit(1000.0)
        return cent + F.lit(noise) * nz

    return ids.select("vec_id", F.transform(dims, val).alias("embedding"))


def _sql_mix(x: str, b1: int, b2: int) -> str:
    return (
        f"((({x}) * 48271 + {b1}) % 46337)"
        f" * ((({x}) * 16807 + {b2}) % 46327) % 2001"
    )


#: the corpus as a DuckDB subquery — mirrors clustered_embeddings term
#: for term (same integer mix, same parenthesization of the double ops)
_SRC_SQL = f"""(
  SELECT vec_id,
         list_transform(range(0, 64), j ->
           (({_sql_mix("c * 64 + j", 11, 7)}) - 1000) / 1000.0
           + 0.1 * ((({_sql_mix("vec_id * 64 + j", 12345, 54321)}) - 1000) / 1000.0)
         ) AS embedding
  FROM (SELECT b.vec_id * {_REPL} + r.r AS vec_id,
               ({_sql_mix(f"b.vec_id * {_REPL} + r.r", *_LABEL_B)})
                 % {_K_CLUSTERS} AS c
        FROM embeddings b, range({_REPL}) AS r(r))
)"""


def _ivf_clustered_oracle() -> str:
    return (
        "WITH "
        + ivf_oracle_ctes(_CELLS, _NPROBE, _ITERS, source=_SRC_SQL)
        + f""",
    bsc AS (
      SELECT q.qid, ev.vec_id AS nid, {_sql_cos('q.qe', 'ev.v')} AS cos
      FROM q JOIN e ev ON ev.vec_id <> q.qid
      WHERE list_dot_product(ev.v, ev.v) > 0
    ),
    brute AS (
      SELECT qid, rn, nid AS exact_nid FROM (
        SELECT *, row_number() OVER (
          PARTITION BY qid ORDER BY round(cos, 6) DESC, nid) AS rn
        FROM bsc
      ) WHERE rn <= 3
    ),
    m AS (
      SELECT mi.qid, mi.rn, mi.nid, mi.cos,
             mi.nid = b.exact_nid AS matches_exact
      FROM mine mi JOIN brute b ON mi.qid = b.qid AND mi.rn = b.rn
    ),
    stats AS (SELECT round(avg(CAST(matches_exact AS INT)), 6) AS recall FROM m),
    scn AS (SELECT count(*) AS n_scored FROM scored),
    crp AS (SELECT count(*) AS n_corpus FROM e
            WHERE list_dot_product(v, v) > 0),
    qn AS (SELECT count(*) AS n_q FROM q)
    SELECT m.qid, m.rn, m.nid, m.cos, m.matches_exact, s.recall,
           round(CAST(scn.n_scored AS DOUBLE) / (qn.n_q * crp.n_corpus), 6)
             AS scan_frac
    FROM m, stats s, scn, crp, qn
    """
    )


@query("llm_ann_ivf_clustered", oracle=_ivf_clustered_oracle())
def llm_ann_ivf_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_ann_ivf's exact pipeline (engine/similarity.py:ivf_parts) on
    the derived clustered corpus at the deployment operating point:
    48 learned cells, nprobe=1 (≈3-4% of the corpus scored per query),
    trained from an init DECORRELATED from the true cluster label
    (ADVICE r05 — recall here reflects learned cells, not an aligned
    start). Output = top-3 per query plus matches_exact vs in-query
    brute force and constant recall / scan_frac columns, all under the
    hash gate — a green driver row IS the measured "recall ≥ 0.9 at
    ≤ 5% scan on clustered vectors" claim (module docstring; prototype
    recall 1.000 at both 4k and 16k corpus sizes)."""
    # corpus generation (8× explode + 64-dim integer-mix transform) feeds
    # training, scoring, brute force and three counts — materialize it
    # once per run (r12, guide §5; fixture-bounded: 8×|embeddings| rows)
    e = clustered_embeddings(
        load_tables(spark, sf_dir)["embeddings"]
    ).localCheckpoint(eager=True)
    parts = ivf_parts(e, _CELLS, _NPROBE, _ITERS)
    ev, q, scored, mine = parts["ev"], parts["q"], parts["scored"], parts["mine"]
    from pyspark.sql import Window

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
            (_dot(F.col("qe"), F.col("ne")) / F.col("qn") / F.col("nnrm")).alias("cos"),
        )
    )
    wb = Window.partitionBy("qid").orderBy(F.round(F.col("cos"), 6).desc(), "nid")
    exact = (
        bscored.withColumn("rn", F.row_number().over(wb))
        .where(F.col("rn") <= 3)
        .select("qid", "rn", F.col("nid").alias("exact_nid"))
    )
    m = (
        mine.join(exact, ["qid", "rn"])
        .select(
            "qid",
            "rn",
            "nid",
            "cos",
            (F.col("nid") == F.col("exact_nid")).alias("matches_exact"),
        )
        # nq×3 rows consumed by stats AND the final select — materialize
        # once so the shortlist/re-rank/brute pipelines run once per call
        .localCheckpoint(eager=True)
    )
    stats = m.groupBy().agg(
        F.round(F.avg(F.col("matches_exact").cast("int")), 6).alias("recall")
    )
    scn = scored.groupBy().agg(F.count("*").alias("n_scored"))
    crp = ev.groupBy().agg(F.count("*").alias("n_corpus"))
    qn = q.groupBy().agg(F.count("*").alias("n_q"))
    return (
        m.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(scn))
        .crossJoin(F.broadcast(crp))
        .crossJoin(F.broadcast(qn))
        .select(
            "qid",
            "rn",
            "nid",
            "cos",
            "matches_exact",
            "recall",
            F.round(
                F.col("n_scored").cast("double")
                / (F.col("n_q") * F.col("n_corpus")),
                6,
            ).alias("scan_frac"),
        )
    )


def _pq_clustered_oracle() -> str:
    sl_sql = f"(SELECT (count(*) * {_SL_PCT} + 99) // 100 FROM en)"
    return (
        "WITH "
        + pq_oracle_ctes(source=_SRC_SQL, shortlist_sql=sl_sql)
        + f""",
    m AS (
      SELECT mi.qid, mi.rn, mi.nid, mi.cos,
             mi.nid = b.exact_nid AS matches_exact
      FROM mine mi JOIN brute b ON mi.qid = b.qid AND mi.rn = b.rn
    ),
    stats AS (SELECT round(avg(CAST(matches_exact AS INT)), 6) AS recall FROM m),
    crp AS (SELECT count(*) AS n_corpus FROM en)
    SELECT m.qid, m.rn, m.nid, m.cos, m.matches_exact, s.recall,
           round(CAST((crp.n_corpus * {_SL_PCT} + 99) // 100 AS DOUBLE)
                 / crp.n_corpus, 6) AS scan_frac
    FROM m, stats s, crp
    """
    )


@query("llm_ann_pq_clustered", oracle=_pq_clustered_oracle())
def llm_ann_pq_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """llm_ann_pq's exact pipeline (engine/similarity.py:pq_parts) on
    the derived clustered corpus with a corpus-proportional shortlist of
    ceil(4% of n) — the exact-scan fraction is then 4% at every fixture
    scale (a FIXED shortlist would truncate below the ~n/40 cluster size
    as n grows: tight clusters make same-cluster codes identical, so the
    ADC scores tie and the nid tie-break would cut true neighbors;
    prototyped recall collapse 1.000 → 0.367 at 16k with a fixed 192).
    Output = top-3 + matches_exact vs brute force + constant recall /
    scan_frac columns under the hash gate (module docstring; prototype
    recall 1.000 at 4k and 16k)."""
    # same corpus/m materialization as the IVF twin (r12, guide §5):
    # pq_parts checkpoints its normalized ev, but the raw corpus feeds
    # that projection and m feeds both stats and the final select
    e = clustered_embeddings(
        load_tables(spark, sf_dir)["embeddings"]
    ).localCheckpoint(eager=True)
    p = pq_parts(e, shortlist_frac_pct=_SL_PCT)
    m = (
        p["mine"]
        .join(p["exact"], ["qid", "rn"])
        .select(
            "qid",
            "rn",
            "nid",
            "cos",
            (F.col("nid") == F.col("exact_nid")).alias("matches_exact"),
        )
        .localCheckpoint(eager=True)
    )
    stats = m.groupBy().agg(
        F.round(F.avg(F.col("matches_exact").cast("int")), 6).alias("recall")
    )
    crp = p["ev"].groupBy().agg(F.count("*").alias("n_corpus"))
    return (
        m.crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(crp))
        .select(
            "qid",
            "rn",
            "nid",
            "cos",
            "matches_exact",
            "recall",
            F.round(
                F.expr(f"CAST((n_corpus * {_SL_PCT} + 99) div 100 AS DOUBLE)")
                / F.col("n_corpus"),
                6,
            ).alias("scan_frac"),
        )
    )
