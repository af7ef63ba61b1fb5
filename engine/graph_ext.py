"""Graph operators (round 8 widening — SURVEY §2.12 contract).

Large-scale training-data pipelines and CDC consumers both end up with
graph-shaped work: duplicate clusters ARE connected components (the
`llm_dedup_clusters` key already runs min-label propagation internally),
web-crawl quality weighting is PageRank over the link graph, and
hierarchy flattening (org charts, category trees arriving through CDC
feeds) is the recursive-CTE workload SQL engines advertise. This module
exposes those shapes as first-class, oracle-checked keys.

Spark has no recursive CTE, so each key demonstrates the Spark-idiomatic
equivalent: a bounded driver loop of DataFrame joins where EVERY
iteration is a distributed shuffle-bounded step and the loop count is
O(log n) by algorithm design (pointer jumping / pointer doubling), never
O(n). The DuckDB oracles use genuine ``WITH RECURSIVE`` — the two
different execution strategies must converge to identical fixpoints,
which is exactly what the hash gate checks.

The shared fixture graph ("referral graph") derives from the customer
table with bounded component size BY CONSTRUCTION: nodes are customer
keys, edges live only inside blocks of 16 consecutive keys (chain edges
c→c+1 kept with ~6/7 probability, skip edges c→c+2 with ~1/5, both
gated by Knuth multiplicative hashes so both engines compute identical
graphs). Bounded components keep the recursive oracle's reach set
linear in n (≤16n pairs), so the same oracle survives the sf10 parity
sweep; the ENGINE paths do not rely on the bound (label propagation +
pointer jumping converges in O(log diameter) rounds on any graph).

100 TB design notes:
- Connected components: per-round cost is one equi-shuffle of the edge
  list + one of the label table; pointer jumping halves the remaining
  tree height every round, so a diameter-d graph needs ~log2(d) rounds
  (the same round structure as Kiveris et al.'s large-star/small-star).
  Labels are ``localCheckpoint``-ed every round — on a real cluster use
  a reliable checkpoint dir; the point is lineage truncation, without
  which round k replays rounds 1..k-1.
- PageRank: the expensive part at scale is deriving EDGE WEIGHTS from
  the fact tables (lineitem⋈orders⋈customer⋈supplier — billions of
  rows); the iterative part runs on the AGGREGATED nation graph (≤625
  weighted edges), so iterations are broadcast-cheap. Ranks use
  all-integer arithmetic (units of 1e-9 of total mass): integer sums
  commute, so the result is bit-identical under any shuffle order and
  any engine — no float accumulation drift across 6 iterations.
- Triangles: edges are oriented low→high id, so each triangle is
  counted exactly once and the join fan-out is bounded by out-degree
  (≤2 here; degree-ordering is the general bound for power-law graphs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from engine.io import load_tables
from engine.registry import query

# Knuth multiplicative gates — also used by llm_stratified_sample; both
# engines evaluate them as exact int64 arithmetic.
_GATE_CHAIN = "({v} * 2654435761) % 7 <> 0"  # ~6/7 of chain edges kept
_GATE_SKIP = "({v} * 1099087573) % 5 = 0"  # ~1/5 of skip edges kept

# Oracle SQL fragment building the identical referral graph in DuckDB.
_EDGES_SQL = """
    n AS (SELECT c_custkey AS v FROM customer),
    cand AS (
      SELECT v AS src, v + 1 AS dst FROM n
      WHERE (v // 16) = ((v + 1) // 16) AND (v * 2654435761) % 7 <> 0
      UNION ALL
      SELECT v AS src, v + 2 AS dst FROM n
      WHERE (v // 16) = ((v + 2) // 16) AND (v * 1099087573) % 5 = 0
    ),
    edges AS (SELECT c.src, c.dst FROM cand c JOIN n ON n.v = c.dst)
"""


def referral_graph(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(nodes, edges) of the deterministic customer referral graph.

    Edges are oriented src < dst and endpoint-verified with a left-semi
    join (customer keys are contiguous so it never drops anything here,
    but it is the scale-honest form for non-contiguous key spaces)."""
    c = load_tables(spark, sf_dir)["customer"].select(F.col("c_custkey").alias("v"))
    chain = c.where(
        (F.expr("v div 16") == F.expr("(v + 1) div 16")) & F.expr(_GATE_CHAIN.format(v="v"))
    ).select(F.col("v").alias("src"), (F.col("v") + 1).alias("dst"))
    skip = c.where(
        (F.expr("v div 16") == F.expr("(v + 2) div 16")) & F.expr(_GATE_SKIP.format(v="v"))
    ).select(F.col("v").alias("src"), (F.col("v") + 2).alias("dst"))
    edges = chain.unionByName(skip).join(
        c.select(F.col("v").alias("dst")), "dst", "left_semi"
    )
    return c, edges.select("src", "dst")


@query(
    "graph_connected_components",
    oracle=f"""
    WITH RECURSIVE
    {_EDGES_SQL},
    und AS (SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges),
    reach(v, lab) AS (
      SELECT v, v FROM n
      UNION
      SELECT u.dst AS v, r.lab FROM reach r JOIN und u ON u.src = r.v
    ),
    comp AS (SELECT v, min(lab) AS component FROM reach GROUP BY v)
    SELECT component, count(*) AS n_nodes, CAST(sum(v) AS BIGINT) AS sum_custkey
    FROM comp GROUP BY component
    """,
)
def graph_connected_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components by min-label propagation WITH pointer jumping:
    each round first pulls the minimum neighbor label (one edge-shuffle +
    one agg), then jumps lab(v) ← lab(lab(v)) (one label self-join), so
    chains collapse in O(log diameter) rounds rather than O(diameter).
    Convergence is detected by the label-sum fixpoint (labels are
    monotonically non-increasing per node, so an unchanged sum IS
    convergence — one tiny scalar action per round, no row diffing).
    The oracle computes the same fixpoint as a recursive CTE (min
    reachable id). Output is the per-component rollup, so the result
    stays compact at any scale."""
    nodes, edges = referral_graph(spark, sf_dir)
    und = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()
    lab = nodes.select("v", F.col("v").alias("lab")).localCheckpoint()
    prev_sum = None
    for _ in range(40):  # safety bound; converges in ~log2(diameter) ≤ 5 here
        nbr = (
            und.join(lab.withColumnRenamed("v", "src"), "src")
            .groupBy("dst")
            .agg(F.min("lab").alias("nlab"))
            .withColumnRenamed("dst", "v")
        )
        stepped = lab.join(nbr, "v", "left").select(
            "v", F.least("lab", F.coalesce("nlab", F.col("lab"))).alias("lab")
        )
        jumped = (
            stepped.alias("a")
            .join(
                stepped.select(
                    F.col("v").alias("lab"), F.col("lab").alias("lab2")
                ).alias("b"),
                "lab",
            )
            .select("v", F.col("lab2").alias("lab"))
        )
        lab = jumped.localCheckpoint()  # truncate lineage between rounds
        # decimal(38,0) sum: labels are custkeys, and at the 100 TB node
        # counts this module argues for (~1.5e10 nodes of similar
        # magnitude) a raw int64 sum wraps silently in non-ANSI Spark —
        # a wrapped collision could falsely signal convergence (ADVICE
        # r08). decimal(38,0) holds sums to ~1e38, far past any corpus.
        s = lab.agg(F.sum(F.col("lab").cast("decimal(38,0)")).alias("s")).collect()[0].s
        if s == prev_sum:
            break
        prev_sum = s
    else:  # pragma: no cover - the fixture graph converges in ≤ 6 rounds
        raise RuntimeError("connected components did not converge in 40 rounds")
    return lab.groupBy(F.col("lab").alias("component")).agg(
        F.count("*").alias("n_nodes"), F.sum("v").alias("sum_custkey")
    )


@query(
    "graph_triangle_count",
    oracle=f"""
    WITH
    {_EDGES_SQL},
    tri AS (
      SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
      FROM edges e1 JOIN edges e2 ON e2.src = e1.dst
      WHERE EXISTS (SELECT 1 FROM edges e3 WHERE e3.src = e1.src AND e3.dst = e2.dst)
    ),
    per_block AS (SELECT a // 16 AS block, count(*) AS n_triangles FROM tri GROUP BY 1)
    SELECT n_triangles, count(*) AS n_blocks FROM per_block GROUP BY n_triangles
    """,
)
def graph_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the oriented edge list: edges point low→high
    id, so every triangle a<b<c is generated exactly once as the wedge
    (a→b, b→c) closed by the semi-join probe a→c — the standard
    node-iterator-with-orientation shape whose intermediate size is
    Σ out_degree² (degree-ordering bounds it on power-law graphs; here
    out-degree ≤ 2 by construction). Two equi-shuffles on the edge key,
    no cartesian anything. Output: histogram of per-block triangle
    counts — compact at any scale."""
    _, edges = referral_graph(spark, sf_dir)
    e = edges  # oriented src < dst by construction
    wedges = e.select(F.col("src").alias("a"), F.col("dst").alias("b")).join(
        e.select(F.col("src").alias("b"), F.col("dst").alias("c")), "b"
    )
    tri = wedges.join(
        e.select(F.col("src").alias("a"), F.col("dst").alias("c")),
        ["a", "c"],
        "left_semi",
    )
    per_block = tri.groupBy(F.expr("a div 16").alias("block")).agg(
        F.count("*").alias("n_triangles")
    )
    return per_block.groupBy("n_triangles").agg(F.count("*").alias("n_blocks"))


def _pagerank_oracle(iters: int) -> str:
    """Unrolled all-integer PageRank oracle (DuckDB has no iteration that
    fits this shape better — the unrolled CTE chain mirrors the engine's
    bounded loop exactly, like llm_kmeans_lloyd's oracle does)."""
    sql = """
    WITH flows AS (
      SELECT c_nationkey AS src, s_nationkey AS dst, count(*) AS w
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN supplier ON l_suppkey = s_suppkey
      GROUP BY 1, 2
    ),
    outw AS (SELECT src, CAST(sum(w) AS BIGINT) AS ow FROM flows GROUP BY src),
    r0 AS (SELECT n_nationkey AS v, CAST(40000000 AS BIGINT) AS r FROM nation)
    """
    for i in range(iters):
        sql += f""",
    r{i + 1} AS (
      SELECT b.v,
             CAST(6000000 + (85 * COALESCE(s.sm, 0)) // 100 AS BIGINT) AS r
      FROM r0 b
      LEFT JOIN (
        SELECT f.dst AS v, CAST(sum((p.r * f.w) // o.ow) AS BIGINT) AS sm
        FROM flows f
        JOIN outw o ON o.src = f.src
        JOIN r{i} p ON p.v = f.src
        GROUP BY f.dst
      ) s ON s.v = b.v
    )"""
    sql += f"""
    SELECT n_name, r.r AS rank_units
    FROM r{iters} r JOIN nation ON n_nationkey = r.v
    """
    return sql


@query("graph_pagerank", oracle=_pagerank_oracle(6))
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the nation-level trade graph (edge u→v weighted by
    the number of lineitems a customer in nation u bought from a supplier
    in nation v) — the web-crawl quality-weighting shape. The 100 TB cost
    is the ONE distributed pass deriving edge weights (fact-fact join on
    orderkey + two broadcast dim joins, then a 625-group agg); the
    6 damped iterations then run on the aggregated graph, each a
    broadcast-sized join — so iteration count never multiplies the fact
    scan (the aggregated graph is localCheckpoint-ed once). Ranks are
    integers in units of 1e-9 of total mass with damping 85/100 and
    floor division — order-independent, hence hash-exact vs the unrolled
    recursive oracle. Dangling mass is dropped (leaky variant) in both
    engines identically."""
    t = load_tables(spark, sf_dir)
    flows = (
        t["lineitem"]
        .join(t["orders"], F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(t["customer"]), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(t["supplier"]), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst"))
        .agg(F.count("*").alias("w"))
        .localCheckpoint()  # ≤ 625 rows at ANY scale; fact scan runs once
    )
    outw = flows.groupBy("src").agg(F.sum("w").alias("ow"))
    fl = flows.join(F.broadcast(outw), "src")
    rank = t["nation"].select(
        F.col("n_nationkey").cast("long").alias("v"), F.lit(40_000_000).alias("r")
    )
    base = rank.select("v")
    for _ in range(6):
        contrib = (
            fl.join(F.broadcast(rank), fl.src == rank.v)
            .select(F.col("dst").alias("v"), F.expr("(r * w) div ow").alias("c"))
            .groupBy("v")
            .agg(F.sum("c").alias("sm"))
        )
        rank = base.join(F.broadcast(contrib), "v", "left").select(
            "v",
            (F.lit(6_000_000) + F.expr("(85 * coalesce(sm, 0)) div 100")).alias("r"),
        )
    return rank.join(
        F.broadcast(load_tables(spark, sf_dir)["nation"]),
        rank.v == F.col("n_nationkey"),
    ).select("n_name", F.col("r").alias("rank_units"))


@query(
    "sql_recursive_hierarchy",
    oracle="""
    WITH RECURSIVE walk(v, anc, d) AS (
      SELECT c_custkey, c_custkey, 0 FROM customer
      UNION ALL
      SELECT w.v, w.anc // 10, w.d + 1 FROM walk w WHERE w.anc > 0
    ),
    depth AS (SELECT v, max(d) AS depth FROM walk GROUP BY v)
    SELECT depth, count(*) AS n_nodes, CAST(sum(v) AS BIGINT) AS sum_custkey
    FROM depth GROUP BY depth
    """,
)
def sql_recursive_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive hierarchy flattening WITHOUT a recursive CTE: customers
    form a decimal trie (parent = custkey div 10, root = 0), and each
    node's (root-distance) is computed by POINTER DOUBLING — state
    (v, anc, d) where anc is the ancestor d steps up; each round joins
    the state to itself (anc ← anc's anc, d ← d + d'), so reach doubles
    per round and a depth-h tree finishes in ceil(log2 h) rounds
    (h ≈ log10 n: 3 rounds at sf100). That is the Spark answer to
    WITH RECURSIVE for path-to-root workloads: O(log depth) shuffles,
    each a plain equi-join on the ancestor key. Unlike connected
    components (diameter unknowable without traversal), the depth bound
    here is DERIVABLE from one scalar — max depth = digits(max key) —
    so the loop runs a PROVABLE round count with no per-round
    convergence actions. r09 floor cut (VERDICT r08 item 3: the key sat
    at 3.11× at sf10, ~0.85 s/round of localCheckpoint materialization
    + job submission): because the round count is provable, NO per-round
    materialization is needed at all — each round's state is lazily
    ``persist()``-ed, the self-join's two references resolve to the same
    InMemoryRelation, and the entire doubling chain runs as ONE job at
    the final action (2 jobs total incl. the max-key scalar, vs
    rounds+2 before). The ancestor join is LEFT with coalesce (ADVICE
    r08): on a key space where some ancestor is absent (1-based TPC-H
    custkeys have no node 0), a missing parent acts as an absorbing
    root instead of silently cascade-dropping its subtree.
    Oracle: genuine recursive CTE. Output: per-depth rollup (≤ 1/key
    digit)."""
    c = load_tables(spark, sf_dir)["customer"].select(F.col("c_custkey").alias("v"))
    state = c.select(
        "v",
        F.expr("CASE WHEN v > 0 THEN v div 10 ELSE v END").alias("anc"),
        F.when(F.col("v") > 0, F.lit(1)).otherwise(F.lit(0)).alias("d"),
    )
    # provable round bound from one 1-row scalar: depth = digit count
    max_key = c.agg(F.max("v").alias("m")).collect()[0].m
    max_depth = len(str(max(int(max_key), 1)))
    rounds = max(1, (max_depth - 1).bit_length())  # ceil(log2(max_depth))
    handles = []
    for _ in range(rounds):
        nxt = (
            state.alias("a")
            .join(
                state.select(
                    F.col("v").alias("anc"),
                    F.col("anc").alias("anc2"),
                    F.col("d").alias("d2"),
                ).alias("b"),
                "anc",
                "left",
            )
            .select(
                "v",
                F.coalesce(F.col("anc2"), F.col("anc")).alias("anc"),
                (F.col("d") + F.coalesce(F.col("d2"), F.lit(0))).alias("d"),
            )
        )
        state = nxt.persist()  # lazy: populated once, read twice, in ONE job
        handles.append(state)
    out = state.groupBy(F.col("d").alias("depth")).agg(
        F.count("*").alias("n_nodes"), F.sum("v").alias("sum_custkey")
    ).localCheckpoint(eager=True)  # ≤ 1 row per key digit; frees the caches
    for h in handles:
        h.unpersist()
    return out
