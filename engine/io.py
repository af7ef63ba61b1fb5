"""Table loading, scan/sink operators (SURVEY.md §2.2) and session config.

The one place that knows about the fixture layout
(``/root/testdata/sf*/{region,nation,...}.parquet``) and the one place that
normalizes the ``events.ts`` nanosecond-timestamp parquet column, which
Spark 4.x cannot read natively (``PARQUET_TYPE_ILLEGAL: INT64
(TIMESTAMP(NANOS,false))``): we read it as a raw ns long via
``spark.sql.legacy.parquet.nanosAsLong`` and truncate to microseconds with
integer division (``ts div 1000`` — integer ``div``, never float ``/``,
which would lose precision on ~1.7e18 ns epochs), matching DuckDB's
``CAST(ts AS TIMESTAMP)`` µs truncation so oracle hashes agree.

Scale notes (100 TB posture): ``load_tables`` is pure metadata — schemas
come from parquet footers, reads are lazy, and every downstream filter /
projection is pushed into the scan by Catalyst (verify: ``PushedFilters``
in ``df.explain('formatted')``). On a real cluster the same code reads
partitioned directories with partition pruning; nothing here assumes
single-node.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from engine.registry import query

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

#: SQL configs every session needs. Applied idempotently by ``configure``.
SESSION_CONF = {
    # events.ts is INT64 TIMESTAMP(NANOS) — unreadable without this flag.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Determinism: all timestamp rendering in UTC (SURVEY §5.3).
    "spark.sql.session.timeZone": "UTC",
    # Runtime re-planning: partition coalescing, skew-join splitting.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for every pandas UDF / toPandas crossing.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Report per-bucket sort order from bucketed scans when (and only
    # when) a bucket is exactly ONE file — Spark checks the file count
    # per bucket before claiming ordering, so this is safe for any
    # layout; engine.io.bucketed_facts repartitions on the bucket key
    # before writing precisely so each bucket IS one sorted file, which
    # lets the orderkey SMJ skip BOTH sides' local sorts (measured sf10:
    # bucketed flagship 1.52 s → 1.37 s). Cost: file listing at
    # planning, which load_tables' table cache already bounds.
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
    # Whole-stage codegen admits plans up to 256 fields (default 100):
    # llm_centroids' single-pass 64-avg aggregate carries 129 aggregate
    # buffer slots, which silently fell back to interpreted eval (r06
    # measured: 1.33 s vs 0.14 s executed for the same plan). 256 keeps
    # the JIT guard (hugeMethodLimit) while covering wide-agg shapes.
    "spark.sql.codegen.maxFields": "256",
}


def tmpdir(prefix: str) -> str:
    """mkdtemp with atexit cleanup — scratch dirs (stream inputs, snapshot
    handoffs) must not accumulate across runs (r01 ADVICE: unbounded /tmp
    growth). Deterministic REUSABLE dirs use fixed paths instead."""
    import atexit
    import shutil
    import tempfile

    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


#: Per-session conf overrides (session → {conf: value}). ``configure``
#: re-applies SESSION_CONF on every ``load_tables`` cache miss, which used
#: to silently clobber any bench-harness toggle set between queries (the
#: r06 AQE tier was a no-op for exactly this reason — ADVICE r06, high).
#: Overrides registered here WIN over SESSION_CONF on every re-apply, so a
#: harness decision survives arbitrary configure() calls. Keyed WEAKLY by
#: the session object (ADVICE r07): an id()-keyed dict never evicted, so a
#: new session allocated at a dead session's address silently inherited
#: its overrides (e.g. AQE-off from a prior bench fixture).
_conf_overrides: "weakref.WeakKeyDictionary[SparkSession, dict[str, str]]" = (
    weakref.WeakKeyDictionary()
)


def set_conf_overrides(spark: SparkSession, overrides: dict[str, str]) -> None:
    """Set runtime confs that persist across ``configure()`` re-applies."""
    _conf_overrides.setdefault(spark, {}).update(overrides)
    for k, v in overrides.items():
        spark.conf.set(k, v)


def configure(spark: SparkSession) -> SparkSession:
    """Apply required runtime confs to an existing session (idempotent).

    Confs registered via :func:`set_conf_overrides` take precedence over
    ``SESSION_CONF`` — the engine's defaults must not undo an explicit
    harness decision mid-run.
    """
    ov = _conf_overrides.get(spark, {})
    for k, v in SESSION_CONF.items():
        spark.conf.set(k, ov.get(k, v))
    return spark


def _dir_bytes(sf_dir: str) -> int | None:
    """Total on-disk bytes under ``sf_dir``; None when the size is unknown
    (unreadable or empty/missing dir — os.walk yields nothing for both).
    Shared by the three input-sizing helpers so missing-dir semantics are
    decided per caller, explicitly (ADVICE r06: the old copies disagreed,
    and shuffle_partitions_for returned the small-fixture floor — the
    worst possible value — for a mistyped big-fixture path)."""
    try:
        total = sum(
            os.path.getsize(os.path.join(root, f))
            for root, _, files in os.walk(sf_dir)
            for f in files
        )
    except OSError:
        return None
    return total or None


def _env_cores(default: int = 32) -> int:
    """Core count the harness was told to run with ($SPARK_GRAFT_CPUS —
    the same variable that sizes local[N]), falling back to ``default``.
    The input-sizing helpers derive their parallelism caps from this
    (r11): the driver ALSO benches at a lower core count to measure
    scaling, and a constant tuned to this machine's 32 threads would
    over-partition those runs — partitions ≈ min(data-derived, cores-
    derived) must track BOTH axes."""
    try:
        return max(1, int(os.environ.get("SPARK_GRAFT_CPUS", default)))
    except ValueError:
        return default


def shuffle_partitions_for(sf_dir: str, cap: int | None = None) -> int:
    """Size ``spark.sql.shuffle.partitions`` to the input, not the machine.

    The cluster rule is partitions ≈ total-shuffle-bytes / 128 MB-1 GB
    (thousands at 100 TB); the LOCAL-mode inverse of that rule is that a
    17 MB fixture does not deserve 32 shuffle tasks — measured at sf0.1,
    dropping 32 → 8 saves 15-50% on every headline key (pure task-launch
    overhead: 32 tasks of ~20k rows each) and regresses none, because a
    600k-row shuffle has no parallelism left to lose at 8 × 4 cores/task.
    Heuristic: one partition per ~2 MB of on-disk input, clamped to
    [8, cap] — sf0.1 → 8, sf1 → ~32, real data → cap (then AQE coalesces).

    Above ~8 GB of input the cluster rule starts to bind even locally:
    at cap=32 a 22 GB fixture (sf100) pushes ≈700 MB of shuffle input
    through each reduce task and the state-heavy shapes spill. Measured
    at sf100 (warm noop-sink, same session, 32/64/96/128 partitions):
    `join_waiting_orders` 124.7 / 83.8 / 74.4 / 82.6 s,
    `agg_revenue_by_nation` 15.1 / 15.7 / 18.8 / 54.4 s,
    `cdc_snapshot_diff` ~21.0 / 21.6 / — / — s, `win_sessionize`
    25.9 (32) / 22.2 (96) s. 64 takes the spill win (-33% on the worst
    key) without the over-partitioning tax that 96+ puts on the
    10 GB fact-fact exchange (more reduce waves + merge fan-in on a
    32-thread scheduler). Large-input tier: one partition per ~256 MB,
    clamped to [cap, 2×cap] — exactly the 128 MB-1 GB/partition cluster
    doctrine, entered only once the data (not the machine) demands it.
    Driver-fixture sizes (≤ sf1) never reach this tier, so driver-gate
    plans are unchanged. Unknown input size → ``cap`` (the safe value for
    a big fixture whose path was mistyped; AQE coalesces the excess).

    ``cap`` defaults to the harness core count ($SPARK_GRAFT_CPUS,
    r11) so a lower-core driver run caps parallelism at ITS machine
    size instead of this host's 32 threads; at 32 CPUs every value is
    unchanged.
    """
    if cap is None:
        cap = max(8, _env_cores())
    total = _dir_bytes(sf_dir)
    if total is None:
        return cap
    if total > (8 << 30):
        return min(2 * cap, max(cap, total // (256 << 20)))
    return max(8, min(cap, total // (2 << 20) or 8))


def max_partition_bytes_for(sf_dir: str, cores: int | None = None) -> str:
    """Size ``spark.sql.files.maxPartitionBytes`` to the input — the scan-side
    sibling of :func:`shuffle_partitions_for`.

    The cluster rule is 128 MB–1 GB per scan partition (thousands of tasks
    at 100 TB); the LOCAL-mode inverse is that a 1.6 GB fixture at the
    128 MB default packs into ~12 input splits and leaves 32 cores
    under-fed on scan-bound shapes. Target ≈ total-input / (2 × cores)
    so every core gets ~2 scan tasks, clamped to [16 MB, 128 MB]
    (measured sf10 pricing summary: 128 MB → 1.04 s, 32 MB → 0.81 s,
    16 MB → 0.75 s warm min; no effect below one row group).

    Below ~512 MB total the regime inverts: the data cannot feed 32 cores
    for longer than a task launch, so task COUNT (not feed rate) is the
    cost, and fewer/larger splits win. Floor at 64 MB there — measured
    r06 at sf1 (183 MB), interleaved min-of-5 over the headline-8:
    (32 shuffle, 16 m) 6.94 s → (16, 64 m) 6.23 s → (8, 64 m) 6.21 s;
    the mpb move is the significant factor (shuffle 16 vs 32 was inside
    noise, consistent with the earlier recorded sweep). On a real
    cluster the default stands — this helper exists for single-host
    benching where the file count, not the data, is the parallelism cap.
    Unknown input size → the Spark default ("128m"). ``cores`` defaults
    to the harness core count ($SPARK_GRAFT_CPUS, r11) so the
    total/(2×cores) split target tracks the machine the bench actually
    runs on; at 32 CPUs every value is unchanged.
    """
    if cores is None:
        cores = _env_cores()
    total = _dir_bytes(sf_dir)
    if total is None:
        return "128m"
    floor = 64 if total < (512 << 20) else 16
    mb = total // (2 * cores) // (1 << 20)
    return f"{max(floor, min(128, mb or floor))}m"


def adaptive_for(sf_dir: str) -> str:
    """Input-sized AQE toggle for the BENCH harness (sibling of
    :func:`shuffle_partitions_for` / :func:`max_partition_bytes_for`).

    AQE exists to re-plan big shuffles at runtime; every adaptive
    decision is bought with a stage barrier (materialize the map side,
    sync with the driver, re-optimize). On a sub-512 MB fixture there is
    nothing to adapt — partitions are already input-sized and every
    join's small side broadcasts — so the barrier is pure latency.
    Measured r06 A/B/A at sf0.1 (headline-8, warm min-of-5, one
    session): `win_sessionize` 0.28 s (AQE) vs 0.14 s (no AQE) — a
    single-exchange window query pays a full extra stage round-trip —
    headline total 1.66 vs 1.54 s. Above 512 MB AQE stays ON: skew
    splitting and runtime join switching are the 100 TB posture
    (SESSION_CONF default, unchanged — the correctness gate always runs
    with AQE on; the full 252-key sf0.01 comparator was also re-swept
    green with AQE OFF before this helper landed, so the toggle is
    hash-neutral by measurement). Unknown input size → "true" (fail to
    the 100 TB posture).

    NOTE for harnesses: set this via :func:`apply_bench_confs` /
    :func:`set_conf_overrides`, NOT a bare ``spark.conf.set`` — the first
    ``load_tables`` cache miss re-applies ``SESSION_CONF`` (AQE on) and
    silently undoes a bare set. This is exactly what happened to every
    r06 bench run (ADVICE r06, high): the recorded numbers were all
    AQE-on despite the harness believing otherwise.
    """
    total = _dir_bytes(sf_dir)
    if total is None:
        return "true"
    return "false" if total < (512 << 20) else "true"


def apply_bench_confs(spark: SparkSession, sf_dir: str) -> dict[str, str]:
    """Register the three input-sized bench confs as sticky overrides.

    One call per (session, fixture) switch in a bench harness: computes
    shuffle partitions / scan split size / AQE toggle for ``sf_dir`` and
    installs them via :func:`set_conf_overrides` so no later
    ``configure()`` can clobber them. Returns the applied dict so the
    harness can record what actually ran.
    """
    confs = {
        "spark.sql.shuffle.partitions": str(shuffle_partitions_for(sf_dir)),
        "spark.sql.files.maxPartitionBytes": max_partition_bytes_for(sf_dir),
        "spark.sql.adaptive.enabled": adaptive_for(sf_dir),
    }
    set_conf_overrides(spark, confs)
    return confs


def get_spark(app: str = "engine", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a local session sized for this machine.

    ``shuffle_partitions`` defaults to the core count — on a real cluster
    you would size it to ~2-3× total executor cores and let AQE coalesce.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    b = (
        SparkSession.builder.appName(app)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # bench_compare materializes BOTH engines' results as pandas frames
        # for timing symmetry; at sf100 win_sessionize's ~100M-row result is
        # >1 GiB of Arrow batches and the 1 GiB default kills the collect.
        # Scoped to the harness that needs it (ADVICE r06): only honored
        # when SPARK_GRAFT_MAX_RESULT is set (bench_compare sets 16g);
        # engine/driver-gate sessions keep the 1g driver-OOM guard.
        # Startup-only conf — ignored if getOrCreate reuses a session.
        .config(
            "spark.driver.maxResultSize",
            os.environ.get("SPARK_GRAFT_MAX_RESULT", "1g"),
        )
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.ui.enabled", "false")
    )
    for k, v in SESSION_CONF.items():
        b = b.config(k, v)
    return configure(b.getOrCreate())


#: session → {sf_dir → table dict}. DataFrames are immutable lazy plans,
#: so caching is safe; it removes ~0.5-1 s of per-query footer reads + view
#: registration (measured part of the local job floor). Weakly keyed by
#: the session (r10, VERDICT r09 item 7 — third strike of the id()-reuse
#: hazard class): an id()-keyed dict is never evicted, so a new session
#: allocated at a dead session's address would inherit DataFrames bound
#: to a dead JVM session. HONEST SCOPE (r11, ADVICE r10): the cached
#: DataFrames strongly reference their session, so entries are never
#: actually evicted — this is safety-via-PINNING, not weak eviction (the
#: documented WeakKeyDictionary value→key caveat). A cached session is
#: kept alive for process life, so its id can never be reused by a new
#: session; the cost is that every session ever cached keeps its JVM
#: state until exit. Acceptable here: bench/tests/driver create 1-2
#: sessions per process; a long-lived multi-session server would want
#: an explicit cache.clear() on session stop instead.
_tables_cache: "weakref.WeakKeyDictionary[SparkSession, dict[str, dict[str, DataFrame]]]" = (
    weakref.WeakKeyDictionary()
)
_views_current: "weakref.WeakKeyDictionary[SparkSession, str]" = (
    weakref.WeakKeyDictionary()
)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table as a lazy DataFrame; normalize ``events.ts``.

    ``events`` gains:
      - ``ts``: timestamp (µs precision, UTC, NTZ) — truncated from ns with
        integer division, identical to DuckDB's ``CAST(ts AS TIMESTAMP)``.
      - ``ts_ns``: the original raw int64 nanoseconds, for ops that need
        full precision (sessionization windows use epoch arithmetic).
    Also registers each table as a temp view ``<name>`` for the SQL entry
    point (SURVEY §3.2). Cached per (session, sf_dir).
    """
    per_session = _tables_cache.setdefault(spark, {})
    cached = per_session.get(sf_dir)
    if cached is not None:
        # temp views must track the ACTIVE sf_dir (SQL-path queries read
        # them); re-register only when this session last pointed elsewhere
        if _views_current.get(spark) != sf_dir:
            for name, df in cached.items():
                df.createOrReplaceTempView(name)
            _views_current[spark] = sf_dir
        return cached
    configure(spark)
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        if name == "events":
            if isinstance(df.schema["ts"].dataType, T.LongType):
                # driver fixture: raw INT64 ns (nanosAsLong) → truncate to µs
                df = df.withColumn("ts_ns", F.col("ts").cast("long")).withColumn(
                    "ts", F.expr("cast(timestamp_micros(ts div 1000) as timestamp_ntz)")
                )
            else:
                # already a timestamp (e.g. re-materialized scaled data):
                # derive ns from µs — same downstream columns either way
                df = df.withColumn(
                    "ts_ns", F.unix_micros(F.col("ts").cast("timestamp")) * 1000
                ).withColumn("ts", F.col("ts").cast("timestamp_ntz"))
        out[name] = df
        df.createOrReplaceTempView(name)
    per_session[sf_dir] = out
    _views_current[spark] = sf_dir
    return out


def run_sql(spark: SparkSession, sf_dir: str, sql: str) -> DataFrame:
    """SQL entry point: register fixture views, run one statement."""
    load_tables(spark, sf_dir)
    return spark.sql(sql)


# ---------------------------------------------------------------------------
# §2.2 scan/sink operator keys
# ---------------------------------------------------------------------------


@query(
    "scan_parquet",
    oracle="""
    SELECT event_id, user_id, event_type, value,
           CAST(ts AS TIMESTAMP) AS ts
    FROM events
    WHERE event_type = 'purchase' AND value > 50.0
    """,
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan incl. the ns-timestamp normalization, with a pushed
    filter + pruned columns (Catalyst pushes both into the scan)."""
    ev = load_tables(spark, sf_dir)["events"]
    return ev.where((F.col("event_type") == "purchase") & (F.col("value") > 50.0)).select(
        "event_id", "user_id", "event_type", "value", "ts"
    )


_CSV_SCHEMA = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)


#: Handoff dir for file-format round-trip keys: the Spark side of a key
#: writes here, the DuckDB oracle reads the SAME files back (the driver
#: runs the Spark query first; the oracle SQL strings embed this path and
#: are built in the same process, so writer and reader always agree).
#: Per-PID since r03: a fixed path let two concurrent harness processes
#: (e.g. the test suite and a verify script) overwrite each other's
#: handoff mid-read — an environment-only hazard, but cheap to remove.
#: atexit cleanup keeps /tmp bounded (r01 ADVICE).
_SCAN_ORACLE_DIR = f"/tmp/engine_scan_oracle_{os.getpid()}"


def _cleanup_scan_oracle_dir() -> None:
    import shutil

    shutil.rmtree(_SCAN_ORACLE_DIR, ignore_errors=True)


import atexit as _atexit  # noqa: E402

_atexit.register(_cleanup_scan_oracle_dir)


@query(
    "scan_csv_schema",
    oracle=f"""
    SELECT r_regionkey, r_name
    FROM read_csv('{_SCAN_ORACLE_DIR}/region_csv/*.csv', header=false,
                  columns={{'r_regionkey': 'INTEGER', 'r_name': 'VARCHAR'}})
    """,
)
def scan_csv_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV with explicit schema — the reference's extract format: periodic
    delimited flat-file dumps with config-supplied schemas, never inferred.

    Round-trips ``region`` through a CSV dir to prove the path; the oracle
    is DuckDB ``read_csv`` over the exact same part files with the same
    explicit schema, so the round-trip is fully hash-checked.
    """
    t = load_tables(spark, sf_dir)
    path = os.path.join(_SCAN_ORACLE_DIR, "region_csv")
    t["region"].select("r_regionkey", "r_name").write.mode("overwrite").option(
        "header", "false"
    ).csv(path)
    df = spark.read.schema(_CSV_SCHEMA).csv(path)
    # localCheckpoint materializes the read before any later run overwrites
    # the handoff dir, while staying distributed (no driver collect).
    return df.orderBy("r_regionkey").localCheckpoint(eager=True)


@query(
    "scan_json_lines",
    oracle=f"""
    SELECT n_nationkey, n_regionkey, n_name
    FROM read_json('{_SCAN_ORACLE_DIR}/nation_json/*.json',
                   format='newline_delimited')
    """,
)
def scan_json_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source with schema inference; the oracle re-reads the
    same newline-delimited part files via DuckDB ``read_json`` (both
    engines infer integer columns as 64-bit), hash-checked."""
    t = load_tables(spark, sf_dir)
    path = os.path.join(_SCAN_ORACLE_DIR, "nation_json")
    t["nation"].write.mode("overwrite").json(path)
    df = spark.read.json(path)
    return (
        df.select("n_nationkey", "n_regionkey", "n_name")
        .orderBy("n_nationkey")
        .localCheckpoint(eager=True)
    )


@query(
    "scan_orc",
    oracle="""
    SELECT o_orderstatus, count(*) AS n, round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_totalprice > 100000 GROUP BY o_orderstatus
    """,
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC round-trip: write orders as ORC, read back with pushdown +
    pruning intact (ORC carries the same min/max stripe stats as parquet),
    aggregate. Oracle runs on the parquet original — equality proves the
    format round-trip is lossless."""
    import tempfile

    t = load_tables(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="engine_orc_") as d:
        path = os.path.join(d, "orders_orc")
        t["orders"].write.mode("overwrite").orc(path)
        back = spark.read.orc(path)
        return (
            back.where(F.col("o_totalprice") > 100000)
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
            .localCheckpoint(eager=True)
        )


_FEED_PARTS = 4
_FEED_ROWS_PER_PART = 100


@query(
    "source_custom_python",
    oracle=f"""
    WITH g AS (SELECT unnest(generate_series(0, {_FEED_PARTS * _FEED_ROWS_PER_PART - 1})) AS key)
    SELECT key,
           CASE ascii(substring(md5(CAST(key AS VARCHAR)), 1, 1)) % 3
                WHEN 0 THEN 'I' WHEN 1 THEN 'U' ELSE 'D' END AS op,
           substring(md5(CAST(key AS VARCHAR)), 1, 8) AS val,
           key % {_FEED_PARTS} AS part
    FROM g
    """,
)
def source_custom_python(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector via the Spark 4 Python DataSource API: a
    deterministic synthetic CDC feed, partitioned 4 ways, generated
    executor-side per partition (the connector shape for any system Spark
    lacks a reader for). The generation rule is pure md5 arithmetic, so
    the DuckDB oracle REGENERATES the identical feed from generate_series
    — a fully hash-checked custom source."""
    import hashlib

    from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

    class CdcFeedReader(DataSourceReader):
        def partitions(self):
            return [InputPartition(p) for p in range(_FEED_PARTS)]

        def read(self, partition):
            p = partition.value
            for i in range(_FEED_ROWS_PER_PART):
                key = i * _FEED_PARTS + p  # interleaved → balanced parts
                h = hashlib.md5(str(key).encode()).hexdigest()
                op = "IUD"[int(ord(h[0]) % 3)]
                yield (key, op, h[:8], key % _FEED_PARTS)

    class CdcFeedSource(DataSource):
        @classmethod
        def name(cls):
            return "engine_cdc_feed"

        def schema(self):
            return "key long, op string, val string, part long"

        def reader(self, schema):
            return CdcFeedReader()

    spark.dataSource.register(CdcFeedSource)
    return spark.read.format("engine_cdc_feed").load()


def bucketed_facts(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(orders, lineitem) read from a co-bucketed-on-orderkey layout,
    creating it on first use (sorted by the key — pay the shuffle once at
    write time, never again). Shared by ``sink_bucketed_join`` (the
    mechanism demo) and ``agg_revenue_by_nation_bucketed`` (the flagship
    wired to it, VERDICT r06 item 2), so one layout serves every orderkey
    join.

    The bucket count is INPUT-SIZED via :func:`shuffle_partitions_for`
    (8 below ~16 MB, up to 2×cores at sf100): a bucketed scan reads each
    bucket as exactly one task — a fixed 8-bucket layout caps scan AND
    sort parallelism at 8 of 32 cores, and measured at sf10 that made
    the bucketed flagship SLOWER than paying the shuffle (2.72 s vs
    2.22 s warm-min; 190 MB/task vs 28 MB splits). On a cluster the same
    rule holds at a different magnitude: buckets ≈ data / target-task
    size (thousands at 100 TB), never a constant. Driver fixtures
    (≤ sf1) still get 8, so driver-gate plans are unchanged.
    """
    t = load_tables(spark, sf_dir)
    n_buckets = shuffle_partitions_for(sf_dir)
    # external tables at a per-process tmp path: the default warehouse dir
    # outlives the in-memory catalog, so a managed-table name would collide
    # on the second process run against the stale directory
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    # fixed path (not pid-keyed): content is deterministic per (sf, bucket
    # count — encoded in the name), so a stale dir from an earlier process
    # is reused — bounded disk
    base = "/tmp/engine_bkt"
    names = (f"orders_bkt_{sf_tag}_b{n_buckets}", f"lineitem_bkt_{sf_tag}_b{n_buckets}")
    for name, df, key in (
        (names[0], t["orders"], "o_orderkey"),
        (names[1], t["lineitem"], "l_orderkey"),
    ):
        if spark.catalog.tableExists(name):
            continue
        path = os.path.join(base, name)
        if os.path.exists(os.path.join(path, "_SUCCESS")):
            # Files from an earlier process are complete on disk: the
            # catalog entry died with that session, so RE-REGISTER the
            # external bucketed table over them instead of re-shuffling
            # and rewriting the whole fact. Before r08 this path used
            # tableExists alone, so every fresh process silently paid
            # the full layout build again — at sf100 that is a ~30 GB
            # shuffle + 11 GB rewrite per process (it filled the disk
            # twice in the r08 measurement sessions). The DDL carries
            # the same CLUSTERED/SORTED spec the writer used, so the
            # bucketed-scan plan (zero-Exchange SMJ) is identical.
            cols = ", ".join(
                f"{f.name} {f.dataType.simpleString()}"
                for f in spark.read.parquet(path).schema.fields
            )
            spark.sql(
                f"CREATE TABLE {name} ({cols}) USING parquet "
                f"CLUSTERED BY ({key}) SORTED BY ({key}) "
                f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
            )
        else:
            (
                # repartition on the bucket key FIRST: without it every
                # write task emits a file into every bucket (tasks ×
                # buckets files — measured 3 200 files of ~0.4 MB at
                # sf10, each scan task paying ~100 footer reads, which
                # made the bucketed read SLOWER than the shuffle it
                # saves). With it each bucket is exactly ONE file whose
                # rows sortBy actually sorts — the layout the read side
                # assumes.
                df.repartition(n_buckets, F.col(key))
                .write.mode("overwrite")
                .bucketBy(n_buckets, key)
                .sortBy(key)
                .format("parquet")
                .option("path", os.path.join(base, name))
                .saveAsTable(name)
            )
    return spark.table(names[0]), spark.table(names[1])


def sorted_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem read from an ingest-sorted layout (sorted on
    ``l_shipdate`` WITHIN each input split, small row groups), creating
    it on first use — the layout twin of :func:`bucketed_facts`, serving
    the scan-bound date-filtered shape (``agg_pricing_summary_sorted``,
    VERDICT r07 item 1).

    Why layout and not conf: Q1's pushed ``l_shipdate <= cutoff`` filter
    keeps ~83% of rows, and on the arrival-ordered fixture EVERY row
    group's [min,max] straddles the cutoff — the pushed min/max predicate
    prunes nothing, so both scan-conf levers were measured useless (r07).

    Why ``sortWithinPartitions`` and NOT ``repartitionByRange``:
    row-group skipping needs only WITHIN-FILE order — a file whose rows
    are shipdate-sorted has tight per-row-group [min,max], so the ~17%
    of row groups entirely above the cutoff are footer-skipped whether
    or not files cover disjoint global ranges. Dropping the range
    exchange makes the layout build a MAP-ONLY rewrite: zero shuffle at
    ANY scale (the first r08 build attempt range-shuffled 600M rows at
    sf100 and its ~30 GB of shuffle files filled the disk before the
    11 GB output — the map-only form peaks at input+output). At 100 TB
    this is the difference between an ingest-time rewrite that costs
    one pass and a cluster-wide sort; global range layout remains worth
    its shuffle only when file-level pruning or range-colocated joins
    are ALSO wanted, which Q1's row-group skipping does not need.

    ``parquet.block.size`` is INPUT-SIZED (table_bytes/64, clamped to
    [256 KB, 16 MB]): with the default 128 MB block a whole file is one
    row group and its [min,max] straddles the cutoff again — the skip
    granularity IS the row group, so the layout must create ≥tens of
    them regardless of fixture size (a fixed 16 MB block left the whole
    sf0.01 table in ONE group). Cost: a few extra footer entries per
    file, noise against the 17% I/O win (measured A/B in BENCH.md
    r08)."""
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    block = max(256 * 1024, min(16 * 1024 * 1024, (_dir_bytes(sf_dir) or 0) // 64))
    # fixed path, content deterministic per (sf, layout shape v2): a
    # stale dir from an earlier process is reused as-is when complete
    # (_SUCCESS), rebuilt otherwise — bounded disk, like the bucketed
    # layout
    path = os.path.join("/tmp/engine_srt", f"lineitem_srt2_{sf_tag}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            load_tables(spark, sf_dir)["lineitem"]
            .sortWithinPartitions("l_shipdate")
            .write.mode("overwrite")
            .option("parquet.block.size", block)
            .parquet(path)
        )
    return spark.read.parquet(path)


@query(
    "sink_bucketed_join",
    oracle="""
    SELECT o.o_orderstatus, count(*) AS n,
           round(sum(l.l_extendedprice), 2) AS total
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderstatus
    """,
)
def sink_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed tables + co-located join: both fact tables written
    bucketed on the join key with an INPUT-SIZED bucket count (see
    :func:`bucketed_facts` — 8 only for small fixtures, up to 2×cores at
    sf100), then joined WITHOUT a shuffle — the plan has no Exchange on
    either side (asserted in tests/test_plans.py). This is the 100 TB
    pattern for repeated joins on the same key: pay the shuffle once at
    write time, never again.
    """
    o, li = bucketed_facts(spark, sf_dir)
    # force SMJ: at tiny SF the planner would broadcast, which hides the
    # bucketed (shuffle-free, sort-free) join path this key demonstrates
    return (
        li.hint("merge")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("total"))
    )


@query(
    "sink_partitioned_parquet",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total
    FROM orders WHERE o_orderstatus = 'O'
    GROUP BY o_orderstatus
    """,
)
def sink_partitioned_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a snapshot partitioned by a column, read it back, and
    aggregate the pruned partition; the oracle aggregates the same slice
    straight from the source table, so the write→prune→read round trip is
    hash-checked (any row lost, duplicated, or mis-partitioned by the sink
    shifts n or total).

    This is the reference's persisted current-state layout; partitioning by
    a low-cardinality column gives partition pruning on read at 100 TB.
    """
    import tempfile

    t = load_tables(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="engine_sink_") as d:
        path = os.path.join(d, "orders_by_status")
        t["orders"].write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
        back = spark.read.parquet(path)
        # Partition-pruned read: only the 'O' directory is scanned.
        return (
            back.where(F.col("o_orderstatus") == "O")
            .groupBy("o_orderstatus")
            .agg(
                F.count("*").alias("n"),
                F.round(F.sum("o_totalprice"), 2).alias("total"),
            )
            .localCheckpoint(eager=True)
        )


@query(
    "join_dpp_prune",
    oracle="""
    SELECT year(o_orderdate) AS o_year,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    WHERE year(o_orderdate) % 2 = 0
    GROUP BY year(o_orderdate)
    """,
)
def join_dpp_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: the fact table is laid out partitioned by
    year; the query joins it to a small calendar dim filtered on an
    attribute (is_even) that only exists dim-side. Catalyst broadcasts the
    filtered dim AND reuses that broadcast as a runtime partition filter on
    the fact scan (`dynamicpruning` subquery — asserted in
    tests/test_plans.py), so non-qualifying partitions are never read.
    This is THE 100 TB star-join pattern: a date-dim predicate prunes the
    fact scan to the matching partitions without the user naming them."""
    t = load_tables(spark, sf_dir)
    sf_tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    path = f"/tmp/engine_dpp/orders_{sf_tag}"
    # _SUCCESS (not bare dir): a killed writer leaves a partial dir that
    # must be rewritten, while a complete one is deterministic → reusable
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (
            t["orders"]
            .withColumn("o_year", F.year("o_orderdate"))
            .write.mode("overwrite")
            .partitionBy("o_year")
            .parquet(path)
        )
    fact = spark.read.parquet(path)
    dim = spark.range(1990, 2010).select(
        F.col("id").cast("int").alias("year"),
        (F.col("id") % 2 == 0).alias("is_even"),
    )
    return (
        fact.join(F.broadcast(dim.where("is_even")), fact["o_year"] == F.col("year"))
        .groupBy("o_year")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


_BINSCAN_DIR = "/tmp/engine_binscan"
_BINSCAN_N = 24


def _binscan_materialize() -> None:
    """(Re)write the deterministic payload files — idempotent, byte-stable.

    Called at import time as well as inside the query so the files exist
    no matter which side (Spark query or DuckDB oracle) a harness runs
    first."""
    os.makedirs(_BINSCAN_DIR, exist_ok=True)
    for i in range(_BINSCAN_N):
        body = f"payload-{i}-" + "x" * (i * 7 % 50)
        with open(os.path.join(_BINSCAN_DIR, f"doc_{i:03d}.bin"), "w") as f:
            f.write(body)


_binscan_materialize()


@query(
    "scan_binary_files",
    oracle=f"""
    SELECT regexp_extract(filename, '[^/]+$') AS fname,
           CAST(length(content) AS BIGINT) AS n_bytes,
           md5(content) AS content_md5
    FROM read_text('{_BINSCAN_DIR}/*.bin')
    """,
)
def scan_binary_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """binaryFile source scan — the ingestion shape for multimodal
    payloads (each file becomes one row: path, length, raw bytes).

    A fixed set of {_BINSCAN_N} deterministic payload files is
    (re)written idempotently to a constant directory, then read back via
    ``format("binaryFile")``; the oracle reads the SAME files with
    DuckDB's read_text and both engines fingerprint the bytes with md5 —
    a real two-engine round trip through the filesystem. The fixed dir is
    reused across runs (no /tmp growth). At scale this reader is the
    entry point that feeds udf_multimodal_decode's mapInPandas stage;
    one task per file group, no shuffle."""
    _binscan_materialize()
    back = spark.read.format("binaryFile").load(_BINSCAN_DIR)
    return (
        back.select(
            F.regexp_extract("path", "[^/]+$", 0).alias("fname"),
            F.length("content").cast("bigint").alias("n_bytes"),
            F.md5("content").alias("content_md5"),
        )
        .localCheckpoint(eager=True)
    )


@query(
    "sink_compaction",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(32 AS BIGINT) AS n_files_small,
           CAST(2 AS BIGINT) AS n_files_compacted
    FROM documents
    """,
)
def sink_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction — the table-maintenance op every long-lived
    100 TB lake needs: streaming/CDC sinks accrete thousands of tiny
    files per partition (each a task + an open + a footer parse at read
    time), and compaction rewrites them into few large files without
    changing a row. Here: documents is deliberately fragmented into 32
    files (round-robin repartition — every micro-batch-sized shard
    non-empty), then compacted with a width chosen by target file size
    (repartition(2) for this fixture; on a real lake, bytes/512 MB).

    The result row is the compaction CONTRACT, hash-checked: row count
    read back from the compacted layout must equal the source exactly
    (the oracle recomputes it from the source table — any row lost or
    duplicated by the rewrite breaks the hash) and both file counts are
    exact literals (round-robin repartition guarantees 32 non-empty
    shards; the compactor writes exactly its partition count). Eager
    writes at call time, like the other sink keys."""
    import glob
    import tempfile

    d = load_tables(spark, sf_dir)["documents"]
    with tempfile.TemporaryDirectory(prefix="engine_compact_") as base:
        small = os.path.join(base, "small")
        compact = os.path.join(base, "compact")
        d.repartition(32).write.mode("overwrite").parquet(small)
        n_small = len(glob.glob(os.path.join(small, "*.parquet")))
        spark.read.parquet(small).repartition(2).write.mode("overwrite").parquet(
            compact
        )
        n_compact = len(glob.glob(os.path.join(compact, "*.parquet")))
        return (
            spark.read.parquet(compact)
            .agg(F.count("*").cast("bigint").alias("n_rows"))
            .select(
                "n_rows",
                F.lit(n_small).cast("bigint").alias("n_files_small"),
                F.lit(n_compact).cast("bigint").alias("n_files_compacted"),
            )
            .localCheckpoint(eager=True)
        )


@query(
    "scan_schema_merge",
    oracle="""
    SELECT CASE WHEN doc_id % 2 = 0 THEN 'v1' ELSE 'v2' END AS file_ver,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(lang) FILTER (WHERE doc_id % 2 = 1) AS BIGINT) AS n_lang,
           CAST(sum(n_chars) FILTER (WHERE doc_id % 2 = 1) AS BIGINT)
             AS sum_chars
    FROM documents
    GROUP BY 1
    """,
)
def scan_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-merging parquet scan: two file generations with DIFFERENT
    schemas (v1 wrote only (doc_id, text); v2 added lang + n_chars) read
    as ONE relation via mergeSchema — the scan-level half of schema
    evolution (cdc_schema_evolution is the merge-level half). v1 rows
    surface the added columns as NULLs; the aggregate proves both that
    no row was lost per generation and that null-extension happened
    exactly where it should (n_lang counts lang only among v2 rows —
    any bleed drops or inflates it vs the oracle's recomputation from
    the source table).

    At 100 TB, mergeSchema reads every file footer — so production
    tables pin the merged schema in a catalog instead; the READ semantics
    (old files null-extend) are identical, which is what this key pins."""
    import tempfile

    d = load_tables(spark, sf_dir)["documents"]
    with tempfile.TemporaryDirectory(prefix="engine_schmerge_") as base:
        v1 = os.path.join(base, "gen=1")
        v2 = os.path.join(base, "gen=2")
        d.where(F.col("doc_id") % 2 == 0).select("doc_id", "text").write.mode(
            "overwrite"
        ).parquet(v1)
        d.where(F.col("doc_id") % 2 == 1).select(
            "doc_id", "text", "lang", "n_chars"
        ).write.mode("overwrite").parquet(v2)
        back = spark.read.option("mergeSchema", "true").parquet(v1, v2)
        return (
            back.groupBy(
                F.when(F.col("doc_id") % 2 == 0, "v1").otherwise("v2").alias(
                    "file_ver"
                )
            )
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.count(
                    F.when(F.col("doc_id") % 2 == 1, F.col("lang"))
                ).cast("bigint").alias("n_lang"),
                F.sum(
                    F.when(F.col("doc_id") % 2 == 1, F.col("n_chars"))
                ).cast("bigint").alias("sum_chars"),
            )
            .localCheckpoint(eager=True)
        )


@query(
    "scan_time_travel_log",
    oracle="""
    WITH v1 AS (SELECT o_orderkey, o_totalprice FROM orders),
    v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                  ELSE o_totalprice END AS o_totalprice
      FROM orders
    ), v3 AS (
      SELECT * FROM v2 WHERE o_orderkey % 10 <> 0
    )
    SELECT 1 AS version, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
             AS checksum_cents
    FROM v1
    UNION ALL
    SELECT 2, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM v2
    UNION ALL
    SELECT 3, CAST(count(*) AS BIGINT),
           CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
    FROM v3
    """,
)
def scan_time_travel_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poor-man's lakehouse time travel: a base snapshot plus an ordered
    delta log (upsert file, then tombstone file) persisted as parquet,
    with any historical version reconstructed by LOG REPLAY — version v =
    base, minus keys superseded by deltas ≤ v (left-anti on the key),
    union the surviving upserts, minus tombstones ≤ v. This is the read
    path Delta/Iceberg implement with manifests; the reconstruction
    algebra (anti-join supersession + union, exactly the CDC apply
    shape — engine/cdc.py:cdc_apply_changes) is what this key pins.

    All three versions' (row count, exact-cents checksum) are
    reconstructed FROM THE WRITTEN LOG FILES and hash-checked against the
    oracle's direct derivation from the source table — a lost tombstone,
    double-applied upsert, or stale base row shifts a checksum. At
    100 TB: replay cost is O(base + deltas ≤ v) with the anti joins on
    the key only, and periodic compaction (sink_compaction) re-bases the
    log; version state is partitioned parquet, so the reconstruction
    plans prune like any other scan."""
    import tempfile

    o = load_tables(spark, sf_dir)["orders"].select("o_orderkey", "o_totalprice")
    with tempfile.TemporaryDirectory(prefix="engine_ttlog_") as base_dir:
        p_base = os.path.join(base_dir, "base")
        p_d1 = os.path.join(base_dir, "delta1_upserts")
        p_d2 = os.path.join(base_dir, "delta2_tombstones")
        o.write.mode("overwrite").parquet(p_base)
        # delta 1: price bump for every 7th key (upsert rows)
        o.where(F.col("o_orderkey") % 7 == 0).withColumn(
            "o_totalprice", F.col("o_totalprice") + 1
        ).write.mode("overwrite").parquet(p_d1)
        # delta 2: tombstones for every 10th key
        o.where(F.col("o_orderkey") % 10 == 0).select("o_orderkey").write.mode(
            "overwrite"
        ).parquet(p_d2)

        base = spark.read.parquet(p_base)
        d1 = spark.read.parquet(p_d1)
        d2 = spark.read.parquet(p_d2).select(F.col("o_orderkey").alias("t_key"))

        def state(version: int):
            s = base
            if version >= 2:
                s = s.join(
                    d1.select(F.col("o_orderkey").alias("u_key")),
                    F.col("o_orderkey") == F.col("u_key"),
                    "left_anti",
                ).unionByName(d1)
            if version >= 3:
                s = s.join(d2, F.col("o_orderkey") == F.col("t_key"), "left_anti")
            return s.agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
                .cast("bigint")
                .alias("checksum_cents"),
            ).select(F.lit(version).alias("version"), "n", "checksum_cents")

        out = state(1).unionByName(state(2)).unionByName(state(3))
        return out.localCheckpoint(eager=True)


@query(
    "scan_csv_malformed",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_good,
           CAST(3 AS BIGINT) AS n_bad,
           CAST(sum(n_nationkey) AS BIGINT) AS key_sum
    FROM nation
    """,
)
def scan_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Malformed-record handling on ingest: a CSV feed of the nation table
    with three hand-broken lines (wrong arity, non-numeric key, bare
    garbage) read in PERMISSIVE mode with a ``_corrupt_record`` column —
    the posture a 100 TB ingest needs, where FAILFAST on one bad line
    would kill the job and silent DROPMALFORMED would lose data without
    evidence. Output: good-row count, quarantined-row count, and an
    exact checksum over a parsed column; the oracle recomputes the good
    side from the source table and states the quarantine count as the
    construction literal — a row mis-parsed into the good side (or a
    good row mis-quarantined) shifts two of the three values."""
    import csv as _csv

    t = load_tables(spark, sf_dir)
    path = os.path.join(_SCAN_ORACLE_DIR, "nation_malformed_csv")
    os.makedirs(path, exist_ok=True)
    rows = [(r["n_nationkey"], r["n_name"]) for r in t["nation"].collect()]
    fpath = os.path.join(path, "part-0.csv")
    with open(fpath, "w", newline="") as f:
        w = _csv.writer(f)
        for k, name in rows:
            w.writerow([k, name])
        f.write("7,EXTRA,FIELD,HERE\n")       # wrong arity
        f.write("not_a_number,BADKEY\n")       # unparseable key
        f.write("garbage-line-without-comma\n")  # wrong arity (1 field)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()
    )
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    return (
        good.agg(
            F.count("*").cast("bigint").alias("n_good"),
            F.sum("n_nationkey").cast("bigint").alias("key_sum"),
        )
        .crossJoin(bad.agg(F.count("*").cast("bigint").alias("n_bad")))
        .select("n_good", "n_bad", "key_sum")
        .localCheckpoint(eager=True)
    )


@query(
    "sink_dynamic_partition_overwrite",
    oracle="""
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor((CASE WHEN o_orderstatus = 'O'
                                     THEN o_totalprice + 1
                                     ELSE o_totalprice END) * 100 + 0.5)
                         AS BIGINT)) AS BIGINT) AS checksum_cents
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def sink_dynamic_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite (partitionOverwriteMode=dynamic): the
    in-place partition upsert primitive a lakehouse table maintenance
    loop runs daily — rewrite ONLY the partitions present in the incoming
    batch, leave every other partition's files untouched. In STATIC mode
    (the default) the same INSERT OVERWRITE would first TRUNCATE THE
    WHOLE TABLE and then write the one incoming partition — silently
    deleting every other partition: the exact failure mode this key
    exists to pin.

    Here: orders written partitioned by status, then a corrected batch
    (price + 1) for status 'O' ONLY is overwritten in; the read-back
    aggregate must show 'O' rows updated AND the untouched partitions
    byte-identical — the oracle recomputes all three partitions' counts
    and exact-cents checksums from the source with the correction
    applied to 'O'. A truncate-style overwrite zeroes two groups; a
    missed update leaves 'O' at the old checksum."""
    import tempfile

    t = load_tables(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="engine_dynover_") as base:
        path = os.path.join(base, "orders_by_status")
        t["orders"].write.mode("overwrite").partitionBy("o_orderstatus").parquet(path)
        corrected = (
            t["orders"]
            .where(F.col("o_orderstatus") == "O")
            .withColumn("o_totalprice", F.col("o_totalprice") + 1)
        )
        (
            corrected.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("o_orderstatus")
            .parquet(path)
        )
        back = spark.read.parquet(path)
        return (
            back.groupBy("o_orderstatus")
            .agg(
                F.count("*").cast("bigint").alias("n"),
                F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long"))
                .cast("bigint")
                .alias("checksum_cents"),
            )
            .localCheckpoint(eager=True)
        )
