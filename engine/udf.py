"""UDF / UDAF / UDTF surface (SURVEY.md §2.11) + multimodal stub plumbing.

UDFs are the engine's explicitly-slow path: everything that CAN be a
built-in function lives elsewhere; this module demonstrates the four
extension points with their correct scale posture:

- plain Python UDF — row-at-a-time, pickled; ONLY for tiny/irregular logic
- pandas UDF — Arrow-batched, vectorized; ~10-100× the plain UDF
- applyInPandas — grouped UDAF with whole-group pandas semantics
- UDTF — table function (one row → many rows)
- mapInPandas — streaming Arrow batches; the multimodal decode shape

Multimodal columns: media is an opaque ``binary`` column + typed metadata
struct; decode/feature-extract runs as mapInPandas. The actual codec is
STUBBED (no image/audio libs in this container) with a deterministic fake
documented inline — the Spark-side plumbing (schema, batching, partition
flow) is real and tested.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engine.io import load_tables
from engine.registry import query


@query(
    "udf_python_scalar",
    oracle="""
    SELECT p_partkey,
           lower(replace(p_name, ' ', '-')) || '/' || CAST(p_size AS VARCHAR) AS slug
    FROM part
    """,
)
def udf_python_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plain Python UDF (slug builder), also registered for SQL use. The
    oracle mirrors the logic in SQL — proving UDF output, not the SQL."""

    def slug(name: str, size: int) -> str:
        return f"{name.lower().replace(' ', '-')}/{size}"

    slug_udf = F.udf(slug, T.StringType())
    spark.udf.register("engine_slug", slug_udf)
    p = load_tables(spark, sf_dir)["part"]
    return p.select("p_partkey", slug_udf("p_name", "p_size").alias("slug"))


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 5) AS l2_norm
    FROM embeddings
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF: L2 norm via numpy over Arrow batches — the
    fast path for per-row vector math that HOFs can't express cleanly.
    (This one CAN be a HOF — see llm_embed_norm — the key demonstrates the
    pandas-UDF machinery gives the same answer.)"""
    import numpy as np

    @F.pandas_udf(T.DoubleType())
    def l2_norm(v: pd.Series) -> pd.Series:
        m = np.vstack(v.apply(lambda a: np.asarray(a, dtype=np.float64)))
        return pd.Series(np.sqrt((m * m).sum(axis=1)))

    e = load_tables(spark, sf_dir)["embeddings"]
    return e.select("vec_id", F.round(l2_norm("embedding"), 5).alias("l2_norm"))


@query("udf_grouped_agg")
def udf_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped pandas UDAF via applyInPandas: 10%-trimmed mean of order
    totals per status (rows-only: quantile interpolation details make a
    cross-engine float oracle fragile; self-checked bounds instead).
    Scale note: each group materializes in one python worker — fine for
    bounded groups, never for unbounded keys (use built-ins then)."""

    schema = "o_orderstatus string, trimmed_mean double, n_used long, bounds_ok boolean"

    def trimmed(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["o_totalprice"]
        lo, hi = x.quantile(0.1), x.quantile(0.9)
        kept = x[(x >= lo) & (x <= hi)]
        tm = float(kept.mean())
        return pd.DataFrame(
            {
                "o_orderstatus": [pdf["o_orderstatus"].iloc[0]],
                "trimmed_mean": [round(tm, 4)],
                "n_used": [int(kept.size)],
                "bounds_ok": [bool(x.min() <= tm <= x.max())],
            }
        )

    o = load_tables(spark, sf_dir)["orders"]
    return o.groupBy("o_orderstatus").applyInPandas(trimmed, schema)


@query("udf_table_udtf")
def udf_table_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF: explode each document into fixed-size 10-token chunks
    (sentence surrogate — the fixture text has no punctuation) with chunk
    index and token count (rows-only oracle)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="doc_id bigint, chunk_idx int, n_tokens int, chunk string")
    class Chunker:
        def eval(self, doc_id: int, text: str):
            if not text:
                return
            toks = text.split(" ")
            for i in range(0, len(toks), 10):
                chunk = toks[i : i + 10]
                yield doc_id, i // 10, len(chunk), " ".join(chunk)

    spark.udtf.register("engine_chunker", Chunker)
    load_tables(spark, sf_dir)
    return spark.sql(
        "SELECT c.* FROM documents d, LATERAL engine_chunker(d.doc_id, d.text) c"
    )


_MM_FEATURE_DIM = 8


@query("udf_multimodal_decode")
def udf_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode pipeline over opaque binary media (rows-only).

    Real Spark plumbing: binary payload column + typed metadata struct →
    mapInPandas over Arrow batches → fixed-width feature vector + shape
    metadata out. The codec itself is a STUB: this container has no
    image/audio libraries, so ``_fake_decode`` derives a deterministic
    8-float "feature vector" from the payload bytes (documented fake, not
    a real decoder — swap in PIL/torchaudio in eval() for production).
    Batch shape, schema, and partition flow are the real thing.
    """
    d = load_tables(spark, sf_dir)["documents"]
    media = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),  # opaque binary stand-in
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.col("n_chars").cast("int").alias("size_bytes"),
            F.col("lang").alias("tag"),
        ).alias("meta"),
    )

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("mime", T.StringType()),
            T.StructField("payload_len", T.IntegerType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].apply(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["meta"].apply(lambda m: m["mime"]),
                    "payload_len": pdf["payload"].apply(len).astype("int32"),
                    "features": feats,
                }
            )

    return media.mapInPandas(decode_batches, out_schema)


def _fake_decode(payload: bytes) -> list[float]:
    """STUB decoder: deterministic bytes → 8 floats. NOT a real codec —
    stands in for image/audio decode so the pipeline is testable here."""
    import hashlib

    h = hashlib.sha256(bytes(payload)).digest()
    return [round(b / 255.0, 6) for b in h[:_MM_FEATURE_DIM]]


#: frame-sampling geometry for udf_multimodal_frames (bytes, not pixels —
#: the fixture "video" is an opaque byte stream; real codecs slot in here)
_FRAME_SIZE = 64
_FRAME_SAMPLE = (0, 2, 4, 6)  # stride-2 sampling of the first 8 frames
_CROP = 16


@query(
    "udf_multimodal_frames",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, k.k AS frame_idx,
             substr(text, k.k * {_FRAME_SIZE} + 1, {_FRAME_SIZE}) AS frame
      FROM documents, (SELECT unnest({list(_FRAME_SAMPLE)}) AS k) k
      WHERE text <> '' AND len(text) > k.k * {_FRAME_SIZE}
    ), r AS (
      SELECT doc_id, frame_idx, len(frame) AS frame_len,
             substr(frame, 1, {_CROP}) AS crop
      FROM f
    )
    SELECT doc_id, frame_idx, frame_len,
           round(list_avg(list_transform(generate_series(1, len(crop)),
                 i -> ascii(substr(crop, i, 1)))), 6) AS feat
    FROM r
    """,
)
def udf_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample + resize plumbing for video-like media: one opaque
    binary row explodes into sampled frame rows via mapInPandas.

    Real Spark plumbing end-to-end: binary payload → Arrow batches → per
    row, slice fixed-size "frames" at a sampling stride (0,2,4,6), "resize"
    each frame by cropping to its first 16 bytes, emit one row per sampled
    frame with a feature (mean byte value). The codec is the documented
    STUB (byte slicing stands in for ffmpeg/PIL frame extraction + resize);
    the fan-out schema, batch iteration, and 1→N row explosion are exactly
    the production shape. SQL-oracle-verified because the fake is
    deterministic byte math (fixtures are pure ASCII, so DuckDB's char
    ops mirror the byte ops; real media would be rows-only).

    At 100 TB: mapInPandas streams Arrow batches — no per-row pickling, no
    driver involvement; frame fan-out multiplies rows ~4× AFTER the scan,
    and downstream shuffles key on doc_id which Spark hash-distributes."""
    d = load_tables(spark, sf_dir)["documents"].where(F.col("text") != "")
    media = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))

    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_len", T.IntegerType()),
            T.StructField("feat", T.DoubleType()),
        ]
    )

    def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"doc_id": [], "frame_idx": [], "frame_len": [], "feat": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                for k in _FRAME_SAMPLE:
                    frame = b[k * _FRAME_SIZE : (k + 1) * _FRAME_SIZE]
                    if not frame:
                        continue
                    crop = frame[:_CROP]
                    rows["doc_id"].append(doc_id)
                    rows["frame_idx"].append(k)
                    rows["frame_len"].append(len(frame))
                    rows["feat"].append(round(sum(crop) / len(crop), 6))
            yield pd.DataFrame(rows)

    return media.mapInPandas(sample_frames, out_schema)


@query(
    "udf_pandas_iter",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '[a-z]+')) AS INTEGER) AS n_words
    FROM documents
    """,
)
def udf_pandas_iter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterator-form pandas UDF (SCALAR_ITER): the function receives the
    whole stream of Arrow batches for its partition, so EXPENSIVE
    PER-PARTITION INIT (compiling a pattern here; loading a tokenizer or
    model checkpoint in a real LLM pipeline) runs once per task instead of
    once per batch — the canonical shape for model-assisted scoring over
    100 TB. The mirror SQL proves the Python path computes exactly what
    the declarative regex engine computes."""
    import re

    @F.pandas_udf("int")
    def n_words(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        pat = re.compile(r"[a-z]+")  # once per task, amortized over batches
        for s in batches:
            yield s.map(lambda t: len(pat.findall(t))).astype("int32")

    d = load_tables(spark, sf_dir)["documents"]
    return d.select("doc_id", n_words("text").alias("n_words"))


@query(
    "udf_cogrouped_asof",
    oracle="""
    WITH ev AS (
      SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS kind,
             CASE WHEN event_type = 'click' THEN CAST(ts AS TIMESTAMP) END AS c_ts
      FROM events WHERE event_type IN ('click', 'purchase')
    ), w AS (
      SELECT event_id, user_id, ts, kind,
             last_value(c_ts IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, kind
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS last_click_ts
      FROM ev
    )
    SELECT event_id, user_id, ts, last_click_ts FROM w WHERE kind = 1
    """,
)
def udf_cogrouped_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped applyInPandas: purchases and clicks are cogrouped per
    user_id and merged with ``pd.merge_asof`` (backward, exact matches
    allowed) — the pandas-native as-of join. Same semantics and same
    oracle as ``join_asof``'s union+window formulation; this key exists to
    exercise the ``cogroup().applyInPandas`` extension point, where BOTH
    sides of a key arrive as whole pandas frames in one Python call.

    Scale posture: one shuffle of each side on user_id; per-group work is
    O(n log n) in that user's rows only. Hot users make hot groups — for
    skewed keys prefer the declarative window form (AQE splits its
    shuffle), and reserve cogroup for logic pandas alone can express."""
    e = load_tables(spark, sf_dir)["events"]
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.where(F.col("event_type") == "click").select("user_id", "ts")

    def asof(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if len(left) == 0:
            return pd.DataFrame(
                {
                    "event_id": pd.Series(dtype="int64"),
                    "user_id": pd.Series(dtype="int64"),
                    "ts": pd.Series(dtype="datetime64[us]"),
                    "last_click_ts": pd.Series(dtype="datetime64[us]"),
                }
            )
        left = left.sort_values(["ts", "event_id"])
        if len(right) == 0:
            out = left.copy()
            out["last_click_ts"] = pd.Series(pd.NaT, index=out.index, dtype=left["ts"].dtype)
            return out[["event_id", "user_id", "ts", "last_click_ts"]]
        right = (
            right.sort_values("ts")
            .rename(columns={"ts": "last_click_ts"})
            .drop(columns=["user_id"])
        )
        out = pd.merge_asof(
            left, right, left_on="ts", right_on="last_click_ts", direction="backward"
        )
        return out[["event_id", "user_id", "ts", "last_click_ts"]]

    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            asof,
            "event_id long, user_id long, ts timestamp_ntz, last_click_ts timestamp_ntz",
        )
    )
