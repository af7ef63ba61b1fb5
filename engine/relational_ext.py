"""Extended relational surface (round 2): classic decision-support join/agg
shapes (TPC-H Q7/Q10/Q12/Q18/Q19 adapted to the reduced fixture schema),
distribution-style window functions, regression/correlation aggregates,
struct ops, and multiset (ALL) set ops.

Same design rules as engine/relational.py: declarative DataFrame plans,
dims broadcast explicitly, filters expressed before joins so Catalyst
pushes them into the scan, two-phase aggregation everywhere, no driver-side
loops. Every key has a DuckDB oracle twin; float outputs are rounded at a
granularity far above cross-engine summation noise (documented per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from engine.io import load_tables
from engine.registry import query


@query(
    "agg_returned_items",
    oracle="""
    SELECT * FROM (
        SELECT c.c_custkey, c.c_name, n.n_name AS nation,
               round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
        FROM customer c
        JOIN orders o   ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE l.l_returnflag = 'R'
          AND o.o_orderdate >= TIMESTAMP '1995-01-01'
          AND o.o_orderdate <  TIMESTAMP '1996-01-01'
        GROUP BY c.c_custkey, c.c_name, n.n_name
    ) ORDER BY revenue DESC, c_custkey LIMIT 20
    """,
)
def agg_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns.

    Plan: the returnflag filter reaches the lineitem scan and the date
    window reaches the orders scan BEFORE the fact-fact join; customer and
    nation are broadcast. The final top-20 ranks on the ROUNDED revenue
    with c_custkey tiebreak, so ordering is identical across engines
    (unrounded fp noise can never reorder). TakeOrderedAndProject keeps
    the limit on the map side — no global sort at 100 TB."""
    t = load_tables(spark, sf_dir)
    o = t["orders"].where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp_ntz"))
    )
    li = t["lineitem"].where(F.col("l_returnflag") == "R")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["nation"]), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@query(
    "agg_volume_shipping",
    oracle="""
    SELECT supp_nation, cust_nation, l_year,
           CAST((sum(volume_e4) + 50) // 100 AS DOUBLE) / 100.0 AS revenue
    FROM (
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
               year(l.l_shipdate) AS l_year,
               CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 10000 + 0.5)
                    AS BIGINT) AS volume_e4
        FROM supplier s
        JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
        JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
        WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
           OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
    )
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def agg_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between a nation pair by
    ship year.

    The nation-pair restriction is folded into BOTH fact inputs before
    the one real shuffle (the Q5 lesson, engine/relational.py): supplier
    and customer are each pre-joined to their pair-filtered nation dim
    and broadcast against their fact, so lineitem and orders rows for
    the other 23 nations are dropped by a broadcast-hash probe miss
    BEFORE the lineitem⋈orders exchange ever sees them (~2/25 of the
    rows shuffle instead of all). The surviving pair predicate is
    re-checked post-join; one shuffle total (orderkey).

    Revenue quantizes per-row at TEN-THOUSANDTHS, not cents (ADVICE r07):
    a 2dp price × 2dp (1-discount) product is exactly 4dp, so
    floor(x*10000+0.5) recovers the exact decimal per row and the integer
    sum equals the true decimal sum — zero accumulation drift at any
    scale (per-row CENT snapping loses O(sqrt(n)) cents vs canonical Q7).
    The final 2dp presentation rounds in INTEGER domain ((s+50) DIV 100)
    because Spark round() (BigDecimal HALF_UP) and DuckDB round()
    (multiply-then-std::round) disagree near half boundaries, and a /1e4
    quotient HITS exact .xx5 boundaries. Raw double summing was ruled out
    by the r07 sf1 parity sweep (one-cent divergence at ~68M magnitude)."""
    t = load_tables(spark, sf_dir)
    pair = ("NATION_1", "NATION_2")
    n1 = t["nation"].where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = t["nation"].where(F.col("n_name").isin(*pair)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    sup_pair = (
        t["supplier"]
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .select("s_suppkey", "supp_nation")
    )
    cust_pair = (
        t["customer"]
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .select("c_custkey", "cust_nation")
    )
    return (
        t["lineitem"]
        .join(F.broadcast(sup_pair), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(
            t["orders"].join(
                F.broadcast(cust_pair), F.col("o_custkey") == F.col("c_custkey")
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            F.sum(
                F.floor(
                    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 10000
                    + F.lit(0.5)
                ).cast("long")
            ).alias("_s4")
        )
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            (F.expr("CAST((_s4 + 50) DIV 100 AS DOUBLE)") / 100.0).alias("revenue"),
        )
    )


@query(
    "agg_large_volume_customer",
    oracle="""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate,
           round(sum(l.l_quantity), 2) AS total_qty,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate
    HAVING sum(l.l_quantity) > 300
    """,
)
def agg_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold.

    Aggregates lineitem by orderkey FIRST (partial map-side sums), applies
    the HAVING on the aggregate, and only then joins the ~0.1% survivors
    to orders/customer — so the expensive join runs on the filtered
    aggregate, not the raw fact. Quantities are integral doubles, so the
    >300 cut is exact in both engines."""
    t = load_tables(spark, sf_dir)
    big = (
        t["lineitem"]
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("qty"), F.count("*").alias("n_lines"))
        .where(F.col("qty") > 300)
    )
    return (
        big.join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round("qty", 2).alias("total_qty"),
            F.col("n_lines").cast("bigint").alias("n_lines"),
        )
    )


@query(
    "join_disjunctive_pred",
    oracle="""
    SELECT round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lines
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
)
def join_disjunctive_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs across both join sides.

    The disjunction mixes part-side and lineitem-side columns, so neither
    branch can be fully pushed below the join — but Catalyst extracts the
    common single-side implications (brand ∈ {..} on part, quantity ∈
    [1,30] on lineitem) and pushes THOSE into each scan, shrinking the
    join inputs; the full disjunction is re-evaluated post-join. part is
    broadcast. This is the canonical test that predicate extraction, not
    just simple pushdown, reaches the scans."""
    t = load_tables(spark, sf_dir)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        t["lineitem"]
        .join(F.broadcast(t["part"]), F.col("l_partkey") == F.col("p_partkey"))
        .where(cond)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").cast("bigint").alias("n_lines"),
        )
    )


@query(
    "agg_priority_class",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY l.l_linestatus
    """,
)
def agg_priority_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipmode → linestatus on the reduced schema):
    returned lines classified by order priority via conditional sums.

    One join (returnflag filter pushed to the lineitem scan), then a
    2-group conditional aggregate — the CASE sums are map-side partial,
    so the shuffle carries 2 rows per task regardless of input size."""
    t = load_tables(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        t["lineitem"]
        .where(F.col("l_returnflag") == "R")
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "win_percent_rank",
    oracle="""
    SELECT event_id, event_type,
           percent_rank() OVER w AS pr,
           cume_dist()    OVER w AS cd,
           CAST(ntile(4)  OVER w AS INT) AS bucket
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
)
def win_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank / cume_dist / ntile.

    The window orders by (value, event_id) — the unique key makes every
    row its own peer group, so all three functions are pure rational
    arithmetic on identical integers in both engines (no tie-order
    nondeterminism, ntile bucket boundaries included); the doubles are
    bit-identical and hash unrounded. One shuffle on event_type; each
    function is a single streaming pass over the sorted partition."""
    ev = load_tables(spark, sf_dir)["events"]
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return ev.select(
        "event_id",
        "event_type",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).cast("int").alias("bucket"),
    )


@query(
    "agg_corr_regression",
    oracle="""
    SELECT l_returnflag,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qp,
           round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qp,
           round(stddev_samp(l_quantity), 6) AS sd_q,
           round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
           round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
    FROM lineitem GROUP BY l_returnflag
    """,
)
def agg_corr_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate statistics aggregates: corr / covar / stddev / OLS fit.

    All five are single-pass co-moment aggregates with exact partial
    merge, so they distribute like plain sums (map-side partials, tiny
    shuffle). Rounding granularity sits ~4 orders of magnitude above the
    worst cross-engine co-moment summation drift at this row count, which
    the parity suite confirms empirically."""
    li = load_tables(spark, sf_dir)["lineitem"]
    return li.groupBy("l_returnflag").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qp"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_q"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
        F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "intercept"
        ),
    )


@query(
    "fn_struct_ops",
    oracle="""
    SELECT o_orderkey, o_orderpriority AS pri,
           to_json(struct_pack(k := o_orderkey, p := o_orderpriority)) AS s_json,
           true AS eq_rebuilt
    FROM orders
    """,
)
def fn_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct construction, field access, equality, and JSON serialization.

    Structs travel as Tungsten rows (no boxing); to_json is the
    driver-hashable terminal form (both engines emit compact
    {"k":<int>,"p":"<str>"} with no nulls present). eq_rebuilt does a
    real struct-vs-struct comparison against a freshly built value."""
    o = load_tables(spark, sf_dir)["orders"]
    s = F.struct(
        F.col("o_orderkey").alias("k"), F.col("o_orderpriority").alias("p")
    )
    return o.select(
        "o_orderkey",
        F.col("o_orderpriority").alias("pri"),
        F.to_json(s).alias("s_json"),
        (
            s
            == F.struct(
                F.col("o_orderkey").alias("k"), F.col("o_orderpriority").alias("p")
            )
        ).alias("eq_rebuilt"),
    )


@query(
    "set_multiset_ops",
    oracle="""
    WITH a AS (SELECT user_id FROM events WHERE event_type = 'click'),
         b AS (SELECT user_id FROM events WHERE event_type = 'view'),
         ex AS (SELECT user_id, 'click_minus_view' AS tag
                FROM (SELECT user_id FROM a EXCEPT ALL SELECT user_id FROM b)),
         it AS (SELECT user_id, 'click_and_view' AS tag
                FROM (SELECT user_id FROM a INTERSECT ALL SELECT user_id FROM b))
    SELECT tag, user_id, CAST(count(*) AS BIGINT) AS n
    FROM (SELECT * FROM ex UNION ALL SELECT * FROM it)
    GROUP BY tag, user_id
    """,
)
def set_multiset_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset set ops: EXCEPT ALL and INTERSECT ALL (bag semantics, as
    opposed to set_except/set_intersect's distinct semantics).

    Spark plans both as aggregate-count + replicate (no sort), one shuffle
    on the value; grouping the tagged union to (tag, user_id, n) keeps the
    multiplicities observable while making the output hash-stable."""
    ev = load_tables(spark, sf_dir)["events"]
    a = ev.where(F.col("event_type") == "click").select("user_id")
    b = ev.where(F.col("event_type") == "view").select("user_id")
    tagged = a.exceptAll(b).withColumn("tag", F.lit("click_minus_view")).unionByName(
        a.intersectAll(b).withColumn("tag", F.lit("click_and_view"))
    )
    return tagged.groupBy("tag", "user_id").agg(
        F.count("*").cast("bigint").alias("n")
    )


@query(
    "agg_bitmap_distinct",
    oracle="""
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct via RE-AGGREGABLE bitmap partials (Spark 3.5+
    bitmap functions): ids are bucketed (bitmap_bucket_number), each
    bucket builds a fixed-size bit vector (bitmap_construct_agg over
    bitmap_bit_position), and the final count is a SUM of per-bucket
    popcounts. Unlike count(DISTINCT) — whose distinct-expand shuffle
    carries every distinct id — the bitmap shuffle carries one ≤4 KB
    vector per (group, bucket), and the partials are mergeable across
    days/segments the way HLL sketches are, but EXACT. The oracle is the
    plain distinct count: identical answer, different physics."""
    ev = load_tables(spark, sf_dir)["events"]
    per_bucket = ev.groupBy(
        "event_type", F.bitmap_bucket_number("user_id").alias("bucket")
    ).agg(F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm"))
    return per_bucket.groupBy("event_type").agg(
        F.sum(F.bitmap_count("bm")).cast("bigint").alias("n_users")
    )


@query(
    "sql_exists_decorrelated",
    oracle="""
    SELECT c.c_custkey, c.c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o2
                      WHERE o2.o_custkey = c.c_custkey
                        AND o2.o_orderpriority = '1-URGENT')
    """,
)
def sql_exists_decorrelated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS through the SQL entry point.

    Catalyst decorrelates both subqueries into a LEFT SEMI and a LEFT
    ANTI join against pre-filtered orders — no per-row subquery
    execution exists in the physical plan (plan-asserted). The same text
    runs on DuckDB, whose optimizer does the same rewrite: identical
    results from two independent decorrelation engines."""
    load_tables(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, c.c_name FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderpriority = '1-URGENT')
        """
    )


_SCALAR_SUBQ_SQL = """
    SELECT o_orderkey,
           CAST(floor((o_totalprice -
                 (SELECT (CAST(sum(CAST(round(o2.o_totalprice * 100, 0) AS BIGINT))
                               AS DOUBLE) / 100) / count(*)
                  FROM orders o2 WHERE o2.o_custkey = o.o_custkey)) * 100 + 0.5)
                AS BIGINT) AS diff_cents
    FROM orders o
"""


@query("sql_scalar_subquery", oracle=_SCALAR_SUBQ_SQL)
def sql_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (each order vs its customer's average,
    in cents) through the SQL entry point. Catalyst rewrites it to one
    aggregate per customer + a join — the subquery runs once, not per row.

    Two cross-engine determinism lessons are baked in (both observed as
    test failures first): (1) the average is computed over EXACT integer
    cents — float sums differ between engines by ~1e-5 at this magnitude,
    flipping rounding boundaries; integer sums are order-independent, so
    every downstream double op is bit-identical. (2) the terminal value
    avoids round(): Spark's round() goes through BigDecimal's SHORTEST
    DECIMAL REPRESENTATION with HALF_UP (round(-138507.235, 2) →
    -138507.24) while DuckDB rounds the BINARY value (-138507.23499…8 →
    -138507.23) — identical doubles, different answers. floor(x*100+0.5)
    is a pure value function, so identical doubles give identical
    cents in any engine."""
    load_tables(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ_SQL)


@query(
    "events_retention",
    oracle="""
    WITH wk AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
                FROM events)
    SELECT a.w AS week,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(count(b.user_id) AS BIGINT) AS n_retained,
           CAST(count(b.user_id) AS DOUBLE) / count(*) AS retention
    FROM wk a LEFT JOIN wk b
      ON b.user_id = a.user_id AND b.w = a.w + INTERVAL 7 DAY
    GROUP BY a.w
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: of the users active in week w, the share
    also active in week w+1 — the canonical product-analytics rollup.

    The (user, week) activity relation is built ONCE (distinct over a
    truncation — the shuffle carries one row per user-week, not per
    event) and self-joined with a one-week offset; both sides share the
    same partitioning. Retention is a ratio of identical integers —
    bit-identical doubles, hashed unrounded. Both engines truncate weeks
    to ISO Mondays."""
    ev = load_tables(spark, sf_dir)["events"]
    wk = ev.select("user_id", F.date_trunc("week", "ts").alias("w")).distinct()
    nxt = wk.select(
        F.col("user_id").alias("b_user"),
        (F.col("w") - F.expr("INTERVAL 7 DAY")).alias("b_prev_w"),
    )
    return (
        wk.join(
            nxt,
            (F.col("user_id") == F.col("b_user")) & (F.col("w") == F.col("b_prev_w")),
            "left",
        )
        .groupBy(F.col("w").alias("week"))
        .agg(
            F.count("*").cast("bigint").alias("n_active"),
            F.count("b_user").cast("bigint").alias("n_retained"),
            (F.count("b_user").cast("double") / F.count("*")).alias("retention"),
        )
    )


_LATERAL_TOPK_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
"""


@query("sql_lateral_topk", oracle=_LATERAL_TOPK_SQL)
def sql_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery (top-3 orders per customer) through
    the SQL entry point — the SQL-standard spelling of top-k-per-group.

    Catalyst decorrelates the LATERAL into a ranked window join rather
    than running the subquery per customer row; DuckDB's optimizer does
    its own rewrite of the identical text. The unique (o_totalprice,
    o_orderkey) sort makes the top-3 deterministic in both engines.
    win_topk_per_group is the DataFrame spelling of the same shape."""
    load_tables(spark, sf_dir)
    return spark.sql(_LATERAL_TOPK_SQL)


@query(
    "events_attribution",
    oracle="""
    WITH tagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN event_type IN ('click', 'view') THEN 0 ELSE 1 END AS tag,
             CASE WHEN event_type IN ('click', 'view')
                  THEN struct_pack(m_ts := ts, m_id := event_id,
                                   m_type := event_type) END AS mk
      FROM events WHERE event_type IN ('click', 'view', 'purchase')
    ), filled AS (
      SELECT user_id, ts, event_id, tag,
             last_value(mk IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, tag, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS attr
      FROM tagged
    )
    SELECT event_id AS purchase_id, user_id,
           CASE WHEN attr.m_ts >= ts - INTERVAL 7 DAY THEN attr.m_id END
             AS attributed_id,
           CASE WHEN attr.m_ts >= ts - INTERVAL 7 DAY THEN attr.m_type END
             AS attributed_type
    FROM filled WHERE tag = 1
    """,
)
def events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent click/view within a 7-day lookback — the product-
    analytics sibling of join_asof, implemented WITHOUT a join: marketing
    and purchase events are tagged into one stream and a per-user
    fill-forward window (last non-null marketing struct, rows unbounded
    preceding → current) carries the latest touch onto every purchase
    row. One shuffle on user_id instead of an asof join's
    range-bucketized join + dedup; the timeline order (ts, tag,
    event_id) is total, so same-timestamp ties resolve identically in
    both engines (marketing sorts before purchase at equal ts — a touch
    at the purchase instant is attributable). The 7-day lookback is
    applied AFTER the fill (NULL if the last touch is stale), keeping
    the window frame unconditional and cheap. At 100 TB this is the
    sessionize shape: one exchange, per-user streams, no skew beyond the
    busiest user."""
    ev = load_tables(spark, sf_dir)["events"].where(
        F.col("event_type").isin("click", "view", "purchase")
    )
    is_mkt = F.col("event_type").isin("click", "view")
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(is_mkt, 0).otherwise(1).alias("tag"),
        F.when(
            is_mkt,
            F.struct(
                F.col("ts").alias("m_ts"),
                F.col("event_id").alias("m_id"),
                F.col("event_type").alias("m_type"),
            ),
        ).alias("mk"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = tagged.withColumn("attr", F.last("mk", ignorenulls=True).over(w))
    fresh = F.col("attr.m_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAY")
    return filled.where(F.col("tag") == 1).select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.when(fresh, F.col("attr.m_id")).alias("attributed_id"),
        F.when(fresh, F.col("attr.m_type")).alias("attributed_type"),
    )


@query(
    "join_null_safe",
    oracle="""
    WITH a AS (
      SELECT nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio,
             CAST(count(*) AS BIGINT) AS n_all
      FROM orders GROUP BY 1
    ), b AS (
      SELECT nullif(o_orderpriority, '4-NOT SPECIFIED') AS prio,
             CAST(count(*) AS BIGINT) AS n_open
      FROM orders WHERE o_orderstatus = 'O' GROUP BY 1
    )
    SELECT a.prio, a.n_all, b.n_open
    FROM a JOIN b ON a.prio IS NOT DISTINCT FROM b.prio
    """,
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-safe equality join (`<=>` / IS NOT DISTINCT FROM): the NULL
    group key must MATCH itself across the two aggregates — a plain
    equi-join silently drops it (NULL = NULL is NULL), the single most
    common bug when joining on derived nullable keys (nullif/sentinel
    rewrites, optional dimensions).

    Spark plans eqNullSafe as a hash join on a null-coalesced key (no
    nested-loop penalty). Scale note: <=> makes ALL nulls one join key —
    if nulls are a large fraction, that key is a skew cell (here both
    sides aggregate to ≤5 rows first, which is also the general
    mitigation: collapse before the null-safe join)."""
    t = load_tables(spark, sf_dir)
    o = t["orders"]
    prio = F.nullif(F.col("o_orderpriority"), F.lit("4-NOT SPECIFIED"))
    a = o.groupBy(prio.alias("prio")).agg(F.count("*").cast("bigint").alias("n_all"))
    b = (
        o.where(F.col("o_orderstatus") == "O")
        .groupBy(prio.alias("b_prio"))
        .agg(F.count("*").cast("bigint").alias("n_open"))
    )
    return a.join(b, a["prio"].eqNullSafe(b["b_prio"])).select(
        "prio", "n_all", "n_open"
    )


@query(
    "win_sliding_median",
    oracle="""
    SELECT user_id, event_id,
           quantile_cont(value, 0.5) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS med5
    FROM events WHERE event_type = 'purchase'
    """,
)
def win_sliding_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding median (5-event window per user) — a NON-algebraic window
    aggregate: unlike sum/avg, the median cannot be maintained
    incrementally from partials, so the engine materializes each frame
    (Spark's percentile() as a window function; DuckDB's quantile_cont —
    both define the same linear interpolation over the sorted frame, and
    both interpolate from identical doubles, so values hash unrounded).
    The (ts, event_id) ordering is total — frames are engine-identical.

    At 100 TB: one user_id exchange; frame materialization is O(frame)
    per row, fine at frame=5 — for large frames the right tool is the
    two-heap / order-statistic sketch inside applyInPandasWithState,
    which is why this key pins the SMALL-frame declarative form."""
    ev = load_tables(spark, sf_dir)["events"].where(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-4, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.expr("percentile(value, 0.5)").over(w).alias("med5"),
    )


@query(
    "events_cohort_matrix",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS TIMESTAMP) AS w
      FROM events
    ), first_wk AS (
      SELECT user_id, min(w) AS w0 FROM wk GROUP BY user_id
    )
    SELECT f.w0 AS cohort_week,
           CAST(date_diff('week', f.w0, a.w) AS INTEGER) AS age_weeks,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
    FROM first_wk f JOIN wk a ON a.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full cohort-retention triangle: users bucketed by FIRST-ACTIVE week
    (acquisition cohort), counted distinct at every subsequent age —
    the (cohort × age) matrix a growth dashboard renders as the
    retention heatmap. events_retention is the adjacent-week diagonal of
    this; the matrix is the general object.

    Built from the distinct (user, week) activity relation computed once
    (one shuffle carries user-weeks, not events), its per-user min week
    (same partitioning reused), and a self-join back on user_id — age is
    integer week arithmetic on epoch-aligned Monday truncations, so the
    matrix cells are exact counts with no float anywhere. At 100 TB the
    relation is |users| × |active weeks| — the matrix aggregate is tiny
    and the user_id shuffle is the only real exchange."""
    ev = load_tables(spark, sf_dir)["events"]
    wk = ev.select("user_id", F.date_trunc("week", "ts").alias("w")).distinct()
    first = wk.groupBy("user_id").agg(F.min("w").alias("w0"))
    return (
        wk.join(first, "user_id")
        .groupBy(
            F.col("w0").alias("cohort_week"),
            (
                F.floor(
                    (F.unix_micros(F.col("w")) - F.unix_micros(F.col("w0")))
                    / F.lit(604_800_000_000)
                )
            )
            .cast("int")
            .alias("age_weeks"),
        )
        .agg(F.count_distinct("user_id").cast("bigint").alias("n_active"))
    )


@query(
    "ts_gap_fill_interpolate",
    oracle="""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS b,
             sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS sc
      FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT event_type, min(b) AS mn, max(b) AS mx FROM hourly GROUP BY 1),
    grid AS (
      SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS b
      FROM bounds
    ),
    j AS (
      SELECT g.event_type, g.b, h.sc FROM grid g
      LEFT JOIN hourly h ON h.event_type = g.event_type AND h.b = g.b
    ),
    w0 AS (
      SELECT event_type, b, sc,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY b) AS BIGINT) AS idx
      FROM j
    ),
    w AS (
      SELECT event_type, b, sc, idx,
             last_value(sc IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pv,
             last_value(CASE WHEN sc IS NOT NULL THEN idx END IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pi,
             first_value(sc IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nv,
             first_value(CASE WHEN sc IS NOT NULL THEN idx END IGNORE NULLS) OVER
               (PARTITION BY event_type ORDER BY b
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ni
      FROM w0
    )
    SELECT event_type, b, sc IS NULL AS is_gap,
           CASE WHEN sc IS NOT NULL THEN CAST(sc AS DOUBLE)
                WHEN pv IS NOT NULL AND nv IS NOT NULL
                THEN CAST(pv AS DOUBLE)
                     + CAST((nv - pv) * (idx - pi) AS DOUBLE) / CAST(ni - pi AS DOUBLE)
                ELSE NULL END / 100 AS value
    FROM w
    """,
)
def ts_gap_fill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resample + gap fill with LINEAR interpolation — the
    hypertable `time_bucket_gapfill(...interpolate)` workload: hourly
    rollup per event type, a dense per-type hour grid (sequence/
    generate_series — no calendar table), and missing buckets filled
    from the nearest non-null neighbors on both sides (edge gaps stay
    NULL, like the reference semantics of gapfill before the first
    sample). Determinism: bucket sums are exact integer cents; the
    interpolated value is prev + (Δ·k)/gap with the numerator computed
    as exact int64 and ONE double division + ONE double addition in the
    same order in both engines — bit-identical IEEE, no rounding snap
    needed. Plan shape: one events shuffle for the rollup; the grid
    explodes from per-type (min, max) bounds (25 rows), and both
    neighbor lookups ride ONE window partitioning (event_type) — at
    100 TB this is a per-series window over the ROLLUP (10^4× smaller
    than raw), never over raw events."""
    ev = load_tables(spark, sf_dir)["events"]
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("b")
    ).agg(F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias("sc"))
    bounds = hourly.groupBy("event_type").agg(F.min("b").alias("mn"), F.max("b").alias("mx"))
    grid = bounds.select(
        "event_type", F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("b")
    )
    j = grid.join(hourly, ["event_type", "b"], "left")
    win = Window.partitionBy("event_type").orderBy("b")
    prev_f = win.rowsBetween(Window.unboundedPreceding, -1)
    next_f = win.rowsBetween(1, Window.unboundedFollowing)
    idx = F.row_number().over(win)
    marked = j.withColumn("idx", idx.cast("bigint"))
    w = (
        marked.withColumn("pv", F.last("sc", ignorenulls=True).over(prev_f))
        .withColumn(
            "pi",
            F.last(
                F.when(F.col("sc").isNotNull(), F.col("idx")), ignorenulls=True
            ).over(prev_f),
        )
        .withColumn("nv", F.first("sc", ignorenulls=True).over(next_f))
        .withColumn(
            "ni",
            F.first(
                F.when(F.col("sc").isNotNull(), F.col("idx")), ignorenulls=True
            ).over(next_f),
        )
    )
    value = (
        F.when(F.col("sc").isNotNull(), F.col("sc").cast("double"))
        .when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv").cast("double")
            + ((F.col("nv") - F.col("pv")) * (F.col("idx") - F.col("pi"))).cast("double")
            / (F.col("ni") - F.col("pi")).cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
    )
    return w.select(
        "event_type", "b", F.col("sc").isNull().alias("is_gap"), (value / 100).alias("value")
    )


_KMV_K = 256
_KMV_M = 4294967296  # 2^32; the hash is an odd-multiplier bijection mod 2^32


def _kmv_hash(col: str) -> str:
    """32-bit multiplicative-permutation hash, identical SQL text in both
    engines: odd multiplier => bijection mod 2^32, so distinct keys get
    distinct 'uniform' values and ranks are tie-free."""
    return f"(({col} * 2654435761 + 1013904223) % {_KMV_M})"


@query(
    "agg_kmv_theta_sketch",
    oracle=f"""
    WITH a AS (SELECT DISTINCT l_partkey AS x FROM lineitem WHERE l_returnflag = 'R'),
    b AS (SELECT DISTINCT l_partkey AS x FROM lineitem WHERE l_returnflag = 'A'),
    ah AS (SELECT x, {_kmv_hash("x")} AS h,
                  row_number() OVER (ORDER BY {_kmv_hash("x")}) AS rk FROM a),
    bh AS (SELECT x, {_kmv_hash("x")} AS h,
                  row_number() OVER (ORDER BY {_kmv_hash("x")}) AS rk FROM b),
    ska AS (SELECT x, h FROM ah WHERE rk <= {_KMV_K}),
    skb AS (SELECT x, h FROM bh WHERE rk <= {_KMV_K}),
    un AS (SELECT x, h, row_number() OVER (ORDER BY h) AS rk
           FROM (SELECT x, h FROM ska UNION SELECT x, h FROM skb)),
    sku AS (SELECT x, h FROM un WHERE rk <= {_KMV_K}),
    stats AS (
      SELECT (SELECT count(*) FROM a) AS na_exact,
             (SELECT count(*) FROM b) AS nb_exact,
             (SELECT count(*) FROM ska) AS ca,
             (SELECT max(h) FROM ska) AS ta,
             (SELECT count(*) FROM skb) AS cb,
             (SELECT max(h) FROM skb) AS tb,
             (SELECT count(*) FROM sku) AS cu,
             (SELECT max(h) FROM sku) AS tu,
             (SELECT count(*) FROM ska JOIN skb USING (x)
               WHERE ska.h <= (SELECT max(h) FROM sku)) AS ci
    )
    SELECT CAST(na_exact AS BIGINT) AS n_a_exact,
           CAST(CASE WHEN ca < {_KMV_K} THEN ca
                     ELSE ({_KMV_K} - 1) * {_KMV_M} // ta END AS BIGINT) AS n_a_est,
           CAST(nb_exact AS BIGINT) AS n_b_exact,
           CAST(CASE WHEN cb < {_KMV_K} THEN cb
                     ELSE ({_KMV_K} - 1) * {_KMV_M} // tb END AS BIGINT) AS n_b_est,
           CAST(CASE WHEN cu < {_KMV_K} THEN ci
                     ELSE ci * {_KMV_M} // tu END AS BIGINT) AS n_inter_est
    FROM stats
    """,
)
def agg_kmv_theta_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values (theta-sketch-family) distinct sketches with SET
    INTERSECTION estimation — the sketch algebra HLL cannot do (HLL
    unions; KMV/theta intersects): per set keep the K=256 smallest
    values of a 32-bit permutation hash; |A| ≈ (K-1)·2³²/θ_A, and the
    A∩B estimate counts shared sketch samples below the UNION sketch's
    θ. All arithmetic is integer (floor division), the hash is a
    bijection (tie-free ranks), so estimates are hash-exact across
    engines; exact distinct counts ride along so a green row also
    WITNESSES the estimate's accuracy. At 100 TB each sketch is a
    256-row top-k per set (map-side partial top-k, one tiny shuffle),
    and sketches of partitions/days merge by re-ranking — the
    mergeability that makes the sketch a cube/rollup citizen."""
    li = load_tables(spark, sf_dir)["lineitem"]
    hx = F.expr(_kmv_hash("x"))

    def sketch(flag: str) -> DataFrame:
        # orderBy+limit compiles to TakeOrderedAndProject: per-partition
        # top-K + driver merge — the distributed top-k, not a global sort
        s = (
            li.where(F.col("l_returnflag") == flag)
            .select(F.col("l_partkey").alias("x"))
            .distinct()
        )
        return s.withColumn("h", hx).orderBy("h").limit(_KMV_K)

    ska = sketch("R").select(F.col("x"), F.col("h").alias("ha"))
    skb = sketch("A").select(F.col("x"), F.col("h").alias("hb"))
    sku = (
        ska.select("x", F.col("ha").alias("h"))
        .unionByName(skb.select("x", F.col("hb").alias("h")))
        .distinct()
        .orderBy("h")
        .limit(_KMV_K)
    )
    na = (
        li.where(F.col("l_returnflag") == "R")
        .agg(F.count_distinct("l_partkey").alias("na_exact"))
    )
    nb = (
        li.where(F.col("l_returnflag") == "A")
        .agg(F.count_distinct("l_partkey").alias("nb_exact"))
    )
    a_stats = ska.agg(F.count("*").alias("ca"), F.max("ha").alias("ta"))
    b_stats = skb.agg(F.count("*").alias("cb"), F.max("hb").alias("tb"))
    u_stats = sku.agg(F.count("*").alias("cu"), F.max("h").alias("tu"))
    inter = (
        ska.join(skb, "x")
        .crossJoin(F.broadcast(u_stats.select(F.col("tu").alias("tu_"))))
        .where(F.col("ha") <= F.col("tu_"))
        .agg(F.count("*").alias("ci"))
    )
    row = na.crossJoin(nb).crossJoin(a_stats).crossJoin(b_stats).crossJoin(u_stats).crossJoin(inter)
    k, m = _KMV_K, _KMV_M
    return row.select(
        F.col("na_exact").cast("long").alias("n_a_exact"),
        F.expr(f"CASE WHEN ca < {k} THEN ca ELSE ({k} - 1) * {m} div ta END")
        .cast("long")
        .alias("n_a_est"),
        F.col("nb_exact").cast("long").alias("n_b_exact"),
        F.expr(f"CASE WHEN cb < {k} THEN cb ELSE ({k} - 1) * {m} div tb END")
        .cast("long")
        .alias("n_b_est"),
        F.expr(f"CASE WHEN cu < {k} THEN ci ELSE ci * {m} div tu END")
        .cast("long")
        .alias("n_inter_est"),
    )


@query(
    "win_running_distinct",
    oracle="""
    WITH flagged AS (
      SELECT event_type, CAST(ts AS TIMESTAMP) AS ts, event_id, user_id,
             CASE WHEN row_number() OVER (
               PARTITION BY event_type, user_id ORDER BY ts, event_id) = 1
             THEN 1 ELSE 0 END AS first_seen
      FROM events
    ),
    running AS (
      SELECT event_type, ts, event_id,
             CAST(sum(first_seen) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS distinct_users_so_far
      FROM flagged
    )
    -- the thinning filter must sit ABOVE the window CTE: WHERE in the
    -- same SELECT would filter BEFORE window evaluation (SQL clause
    -- order) and the running sum would only see every-20th flag
    SELECT event_type, ts, event_id, distinct_users_so_far
    FROM running WHERE event_id % 20 = 0
    """,
)
def win_running_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running COUNT(DISTINCT) over an ordered window — the cumulative
    unique-users curve — which NEITHER engine supports natively
    (COUNT(DISTINCT) OVER is illegal in Spark and DuckDB alike). The
    standard decomposition: flag each (type, user)'s FIRST occurrence
    with one window, then a running sum of flags with a second window on
    the coarser (type) partitioning — distinct-so-far ≡ first-occurrences-
    so-far. Two shuffles total; the second window's state is one counter,
    never a distinct set, so memory is O(1) per partition at any scale
    (an exact distinct set in window state would be the scale-killer).
    Output thinned to every-20th event to keep the checked result
    compact; the window math runs over all rows."""
    ev = load_tables(spark, sf_dir)["events"]
    w_first = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    w_run = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = ev.select("event_type", "ts", "event_id", "user_id").withColumn(
        "first_seen",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0),
    )
    out = flagged.withColumn(
        "distinct_users_so_far", F.sum("first_seen").over(w_run).cast("long")
    )
    return out.where(F.col("event_id") % 20 == 0).select(
        "event_type", "ts", "event_id", "distinct_users_so_far"
    )
