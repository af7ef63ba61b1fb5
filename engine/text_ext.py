"""Extended LLM-pipeline text operators (round 2): corpus reporting and
scoped dedup shapes a training-data pipeline runs alongside the §2.10/§2.12
core (length bucketing, corpus n-gram stats, stopword coverage, per-source
mix reports, per-source exact dedup).

All keys are explode→agg or broadcast-join shapes — no per-row Python, one
token-level shuffle each, and every float output is either a ratio of
identical integers (bit-identical across engines) or rounded far above
summation noise. Each has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.io import load_tables
from engine.registry import query


@query(
    "llm_doc_length_buckets",
    oracle="""
    WITH b AS (SELECT lang, CAST(n_chars // 500 AS BIGINT) AS bucket
               FROM documents)
    SELECT lang, bucket, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(*) AS DOUBLE) / sum(count(*)) OVER (PARTITION BY lang)
               AS share
    FROM b GROUP BY lang, bucket
    """,
)
def llm_doc_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length histogram per language (500-char buckets) with
    within-language share — the first report run before choosing packing
    and truncation lengths.

    Bucketing is integer division (exact everywhere); share is a ratio of
    identical integers so the double is bit-identical across engines and
    hashes unrounded. groupBy + one tiny window over the aggregate —
    the window input is |langs|×|buckets| rows, not the corpus."""
    d = load_tables(spark, sf_dir)["documents"]
    agg = (
        d.select("lang", F.floor(F.col("n_chars") / 500).cast("bigint").alias("bucket"))
        .groupBy("lang", "bucket")
        .agg(F.count("*").alias("n_docs"))
    )
    w = Window.partitionBy("lang")
    return agg.select(
        "lang",
        "bucket",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias("share"),
    )


@query(
    "llm_ngram_topk",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE text <> ''),
    ex AS (SELECT doc_id, generate_subscripts(toks, 1) AS i, unnest(toks) AS tok
           FROM t),
    bg AS (SELECT a.tok || ' ' || b.tok AS bigram
           FROM ex a JOIN ex b ON a.doc_id = b.doc_id AND b.i = a.i + 1)
    SELECT bigram, CAST(count(*) AS BIGINT) AS n
    FROM bg GROUP BY bigram ORDER BY n DESC, bigram LIMIT 20
    """,
)
def llm_ngram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word bigrams (count desc, bigram tiebreak).

    Bigrams are built inside the array (transform over an index sequence —
    no self-join, no second explode): each doc emits its n-1 bigrams from
    one pass, then explode→count→TakeOrderedAndProject. The oracle builds
    the same bigrams relationally via an ordinality self-join. At 100 TB
    the only shuffle carries (bigram, partial count) pairs, and the top-20
    never leaves the map side until the final 20-row reduce."""
    d = load_tables(spark, sf_dir)["documents"].where(F.col("text") != "")
    bgs = d.select(
        F.explode(
            F.expr(
                "transform(sequence(0, size(split(text, ' ')) - 2),"
                " i -> concat(element_at(split(text, ' '), i + 1), ' ',"
                " element_at(split(text, ' '), i + 2)))"
            )
        ).alias("bigram")
    )
    return (
        bgs.groupBy("bigram")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@query(
    "llm_stopword_coverage",
    oracle="""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
               FROM documents WHERE text <> ''),
    tok AS (SELECT doc_id, unnest(toks) AS tok FROM t),
    top AS (SELECT tok FROM (
                SELECT tok, count(*) AS n,
                       row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
                FROM tok GROUP BY tok) WHERE rn <= 100)
    SELECT k.doc_id, k.n_tokens, k.n_stop,
           CAST(k.n_stop AS DOUBLE) / k.n_tokens AS coverage
    FROM (SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
                 CAST(count(top.tok) AS BIGINT) AS n_stop
          FROM tok t LEFT JOIN top ON t.tok = top.tok
          GROUP BY t.doc_id) k
    """,
)
def llm_stopword_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document stopword coverage, with the stopword list learned from
    the corpus itself (top-100 tokens by frequency, token tiebreak) — the
    quality signal behind "mostly-stopwords" filters.

    Two passes over the token stream: (1) corpus term counts →
    TakeOrderedAndProject top-100 (20-row-scale result, no global sort),
    (2) per-doc counts with the stop set broadcast into the probe.
    Coverage is a ratio of identical integers — bit-identical doubles."""
    d = load_tables(spark, sf_dir)["documents"].where(F.col("text") != "")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(100)
        .select(F.col("tok").alias("stop_tok"))
    )
    per_doc = (
        toks.join(F.broadcast(top), toks["tok"] == F.col("stop_tok"), "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.count("stop_tok").cast("bigint").alias("n_stop"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_stop",
        (F.col("n_stop").cast("double") / F.col("n_tokens")).alias("coverage"),
    )


@query(
    "llm_source_mix_report",
    oracle="""
    WITH d AS (SELECT source, lang, n_chars,
                      len(string_split(text, ' ')) AS n_toks
               FROM documents),
    agg AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_toks) AS BIGINT) AS n_tokens,
                   round(avg(n_chars), 4) AS mean_chars
            FROM d GROUP BY source),
    lc AS (SELECT source, lang, count(*) AS c FROM d GROUP BY source, lang),
    ent AS (SELECT source,
                   round(-sum((CAST(c AS DOUBLE) / t) * ln(CAST(c AS DOUBLE) / t)),
                         6) AS lang_entropy
            FROM (SELECT source, lang, c,
                         sum(c) OVER (PARTITION BY source) AS t FROM lc)
            GROUP BY source)
    SELECT a.source, a.n_docs, a.n_tokens, a.mean_chars, e.lang_entropy
    FROM agg a JOIN ent e USING (source)
    """,
)
def llm_source_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source corpus mix report: doc/token counts, mean length, and
    language-distribution entropy — the dashboard a data-mixing run reads
    before weighting sources.

    Token counts come from size(split(..)) — no explode, the count is a
    per-row expression. Entropy is computed over the |source|×|lang|
    aggregate (hundreds of rows), not the corpus; rounded at 6dp, ~10
    orders above libm/summation drift on ≤6 terms."""
    d = load_tables(spark, sf_dir)["documents"].select(
        "source", "lang", "n_chars", F.size(F.split("text", " ")).alias("n_toks")
    )
    agg = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.round(F.avg("n_chars"), 4).alias("mean_chars"),
    )
    lc = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    t = Window.partitionBy("source")
    p = F.col("c").cast("double") / F.sum("c").over(t)
    ent = (
        lc.select("source", (p * F.log(p)).alias("term"))
        .groupBy("source")
        .agg(F.round(-F.sum("term"), 6).alias("lang_entropy"))
    )
    return agg.join(ent, "source")


@query(
    "llm_dedup_within_source",
    oracle="""
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_unique,
           CAST(count(*) - count(DISTINCT md5(text)) AS BIGINT) AS n_dupes
    FROM documents GROUP BY source
    """,
)
def llm_dedup_within_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup scoped per source: duplicate counts by content
    fingerprint within each source (cross-source duplicates survive —
    llm_exact_dedup is the global variant).

    The distinct runs on the 128-bit md5, not the text — the shuffle
    carries 16-byte keys regardless of document size, and the per-source
    scope means the distinct-key space partitions by (source, hash) with
    uniform fan-out (hash keys cannot skew)."""
    d = load_tables(spark, sf_dir)["documents"]
    return d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.countDistinct(F.md5("text")).cast("bigint").alias("n_unique"),
        (F.count("*") - F.countDistinct(F.md5("text"))).cast("bigint").alias("n_dupes"),
    )


@query(
    "llm_tokenize_regex",
    oracle=r"""
    WITH t AS (
        SELECT event_id,
               regexp_extract_all(props, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+')
                   AS toks
        FROM events
    )
    SELECT event_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, t -> regexp_full_match(t, '[0-9]+')))
                AS BIGINT) AS n_num,
           CAST(len(list_filter(toks, t -> regexp_full_match(t, '[A-Za-z]+')))
                AS BIGINT) AS n_alpha,
           array_to_string(toks[1:5], '|') AS head_toks
    FROM t
    """,
)
def llm_tokenize_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style regex pre-tokenization (the GPT-2 pre-tokenizer shape:
    runs of letters | runs of digits | runs of punctuation) over the
    events props JSON strings — the token-counting primitive that runs
    BEFORE a real BPE merge table is applied.

    Pure JVM regex (regexp_extract_all + filter HOFs) — no Python in the
    path; per-row work is independent so the op is scan-parallel at any
    scale. Counts are integers; the head sample is serialized to a string
    for driver hashing."""
    ev = load_tables(spark, sf_dir)["events"]
    toks = F.regexp_extract_all("props", F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]+"), 0)
    t = ev.select("event_id", toks.alias("toks"))
    return t.select(
        "event_id",
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.size(F.expr(r"filter(toks, t -> t rlike '^[0-9]+$')"))
        .cast("bigint")
        .alias("n_num"),
        F.size(F.expr(r"filter(toks, t -> t rlike '^[A-Za-z]+$')"))
        .cast("bigint")
        .alias("n_alpha"),
        F.array_join(F.slice("toks", 1, 5), "|").alias("head_toks"),
    )


@query(
    "llm_url_dedup",
    oracle="""
    WITH v AS (
        SELECT c_custkey,
               unnest([
                 'https://' || lower(c_mktsegment) || '.example.com/u/' ||
                   CAST(c_custkey AS VARCHAR) || '/profile?q=' ||
                   CAST(c_nationkey AS VARCHAR),
                 'HTTPS://' || upper(c_mktsegment) || '.EXAMPLE.COM:443/u/' ||
                   CAST(c_custkey AS VARCHAR) || '/profile?q=' ||
                   CAST(c_nationkey AS VARCHAR) || '&utm_source=feed',
                 'https://' || lower(c_mktsegment) || '.example.com/u/' ||
                   CAST(c_custkey AS VARCHAR) || '/profile?utm_campaign=ads&q=' ||
                   CAST(c_nationkey AS VARCHAR) || '#top',
                 'https://' || lower(c_mktsegment) || '.example.com:443/u/' ||
                   CAST(c_custkey AS VARCHAR) || '/profile?q=' ||
                   CAST(c_nationkey AS VARCHAR) || '#frag'
               ]) AS url
        FROM customer
    ),
    n AS (
        SELECT c_custkey, url,
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(lower(url), '#.*$', ''),
                     'utm_[a-z]+=[a-z]+&', ''),
                   '[?&]utm_[a-z]+=[a-z]+$', ''),
                 ':443/', '/') AS norm
        FROM v
    )
    SELECT norm, CAST(count(*) AS BIGINT) AS n_raw,
           CAST(count(DISTINCT url) AS BIGINT) AS n_distinct_raw
    FROM n GROUP BY norm
    """,
)
def llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-canonicalization dedup — the web-corpus primitive that
    collapses scheme/host case, default ports, tracking parameters, and
    fragments before content fetch/dedup ever runs.

    Four deterministic raw variants per customer (case-mangled host,
    :443, utm_* params, #fragments) must collapse onto ONE normalized
    key: every group in the output has n_raw = 4 raw variants, which the
    oracle re-derives with the identical normalization chain (the
    regexp_replace sequence is order-sensitive — utm-in-the-middle is
    stripped with its trailing '&' before a terminal utm eats the '?').
    Pure codegen'd projection + one groupBy on the normalized key; no
    Python, no skew (keys are per-customer unique)."""
    c = load_tables(spark, sf_dir)["customer"]
    key = F.col("c_custkey").cast("string")
    nat = F.col("c_nationkey").cast("string")
    seg_lo = F.lower("c_mktsegment")
    seg_hi = F.upper("c_mktsegment")
    v0 = F.concat(F.lit("https://"), seg_lo, F.lit(".example.com/u/"), key,
                  F.lit("/profile?q="), nat)
    v1 = F.concat(F.lit("HTTPS://"), seg_hi, F.lit(".EXAMPLE.COM:443/u/"), key,
                  F.lit("/profile?q="), nat, F.lit("&utm_source=feed"))
    v2 = F.concat(F.lit("https://"), seg_lo, F.lit(".example.com/u/"), key,
                  F.lit("/profile?utm_campaign=ads&q="), nat, F.lit("#top"))
    v3 = F.concat(F.lit("https://"), seg_lo, F.lit(".example.com:443/u/"), key,
                  F.lit("/profile?q="), nat, F.lit("#frag"))
    raw = c.select("c_custkey", F.explode(F.array(v0, v1, v2, v3)).alias("url"))
    norm = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(
                F.regexp_replace(F.lower("url"), "#.*$", ""),
                "utm_[a-z]+=[a-z]+&", ""),
            r"[?&]utm_[a-z]+=[a-z]+$", ""),
        ":443/", "/")
    return (
        raw.select("c_custkey", "url", norm.alias("norm"))
        .groupBy("norm")
        .agg(
            F.count("*").cast("bigint").alias("n_raw"),
            F.countDistinct("url").cast("bigint").alias("n_distinct_raw"),
        )
    )


@query(
    "llm_dataset_card",
    oracle="""
    WITH base AS (
      SELECT doc_id, text, lang, source,
             md5(text) AS fp,
             len(string_split(text, ' ')) AS n_tok
      FROM documents WHERE text <> ''
    ), top_src AS (
      SELECT source FROM base GROUP BY source
      ORDER BY count(*) DESC, source LIMIT 1
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(count(*) FILTER (WHERE lang = 'en') AS DOUBLE) / count(*)
             AS pct_en,
           1.0 - CAST(count(DISTINCT fp) AS DOUBLE) / count(*)
             AS exact_dup_rate,
           CAST(sum(n_tok) AS DOUBLE) / count(*) AS mean_tokens,
           (SELECT source FROM top_src) AS top_source
    FROM base
    """,
)
def llm_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus datasheet — the summary block of a dataset card
    (Gebru et al., "Datasheets for Datasets"): corpus size in docs and
    tokens, language spread and English share, exact-duplicate rate
    (1 − distinct fingerprints / docs — the md5 content fingerprint
    from llm_exact_dedup), mean document length, dominant source. The
    kind of op a curation pipeline runs after every transformation to
    log what it just did to the data.

    One pass builds per-doc (fingerprint, token count) columns; the card
    is a single global aggregate (count/sum/distinct — the distincts
    shuffle fingerprints and lang codes only), plus a broadcast scalar
    for the deterministically-tiebroken top source. All ratios are
    int/int — bit-identical doubles, no rounding."""
    d = load_tables(spark, sf_dir)["documents"].where(F.col("text") != "")
    base = d.select(
        "lang",
        "source",
        F.md5("text").alias("fp"),
        F.size(F.split("text", " ")).alias("n_tok"),
    )
    top_src = (
        base.groupBy("source")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "source")
        .limit(1)
        .select("source")
    )
    return (
        base.agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.count_distinct("lang").cast("bigint").alias("n_langs"),
            (
                F.count(F.when(F.col("lang") == "en", 1)).cast("double")
                / F.count("*")
            ).alias("pct_en"),
            (
                1.0 - F.count_distinct("fp").cast("double") / F.count("*")
            ).alias("exact_dup_rate"),
            (F.sum("n_tok").cast("double") / F.count("*")).alias("mean_tokens"),
        )
        .crossJoin(F.broadcast(top_src.withColumnRenamed("source", "top_source")))
    )


@query(
    "llm_ngram_entropy",
    oracle="""
    WITH base AS (
      SELECT doc_id, substr(text, 1, 200) AS t,
             CAST(length(substr(text, 1, 200)) AS BIGINT) AS L
      FROM documents WHERE length(text) >= 2
    ),
    grams AS (
      SELECT doc_id,
             unnest(list_transform(range(1, L), i -> substr(t, i, 2))) AS g
      FROM base
    ),
    cnt AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY 1, 2),
    tot AS (SELECT doc_id, g, c, sum(c) OVER (PARTITION BY doc_id) AS n FROM cnt)
    SELECT doc_id, CAST(max(n) AS BIGINT) AS n_bigrams,
           count(*) AS distinct_bigrams,
           round(-sum((CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n)), 6) AS entropy
    FROM tot GROUP BY doc_id
    """,
)
def llm_ngram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-bigram Shannon entropy — the classic
    gibberish/boilerplate detector (low entropy = repeated patterns,
    high = diverse text), computed on the first 200 chars. All bigram
    construction is array-side (sequence → transform → ONE explode, the
    llm_ngram_topk pattern — no self-join); counts shuffle once on
    (doc_id, gram), and the entropy reduces per doc. Float discipline
    follows llm_source_mix_report's precedent: -Σ(p·ln p) over ≤200
    terms rounded at 6dp, ~7 orders above libm/summation drift. At
    100 TB the per-doc group is bounded by the 200-char cap, so no key
    skew is possible regardless of document length distribution."""
    d = load_tables(spark, sf_dir)["documents"]
    base = (
        d.select("doc_id", F.substring("text", 1, 200).alias("t"))
        .withColumn("L", F.length("t").cast("bigint"))
        .where(F.col("L") >= 2)
    )
    grams = base.select(
        "doc_id",
        F.explode(
            F.expr("transform(sequence(CAST(1 AS BIGINT), L - 1), i -> substring(t, CAST(i AS INT), 2))")
        ).alias("g"),
    )
    cnt = grams.groupBy("doc_id", "g").agg(F.count("*").alias("c"))
    n = F.sum("c").over(Window.partitionBy("doc_id"))
    tot = cnt.withColumn("n", n)
    p = F.col("c").cast("double") / F.col("n")
    return tot.groupBy("doc_id").agg(
        F.max("n").cast("long").alias("n_bigrams"),
        F.count("*").alias("distinct_bigrams"),
        F.round(-F.sum(p * F.log(p)), 6).alias("entropy"),
    )
