"""Transaction-log format invariants (engine/txlog.py) beyond what the
registry keys pin: mutual exclusion of the commit point under a REAL
concurrent race (threads, not a scripted interleaving), rebase-retry
liveness, and the putIfAbsent publish primitive in isolation.

The registry keys (`sink_txlog_acid`, `scan_txlog_snapshot_isolation`,
`sink_txlog_conflict`, `stream_txlog_sink`) carry the oracle-checked
semantics; these tests exist because a commit-protocol race is exactly
the kind of bug a deterministic single-threaded key can script around
without ever proving the primitive holds when two threads actually
interleave at OS level.
"""

from __future__ import annotations

import json
import os
import tempfile
import threading

import pytest
from pyspark.sql import functions as F

from engine.io import load_tables
from engine.txlog import CommitConflict, TxTable
from tests.oracle import DEFAULT_SF_DIR


@pytest.fixture()
def orders_small(spark):
    return (
        load_tables(spark, DEFAULT_SF_DIR)["orders"]
        .select("o_orderkey", "o_totalprice")
        .limit(200)
        .localCheckpoint(eager=True)
    )


def test_commit_is_put_if_absent(spark, orders_small, tmp_path):
    """The publish primitive itself: once vNNNNN.json exists, a second
    _commit targeting the same version must raise, never clobber."""
    t = TxTable(spark, str(tmp_path / "tbl"))
    t.create(orders_small, n_files=1)
    files_v0 = t.manifest(0)["files"]
    # forge a manifest already sitting at v1 (the "other writer won")
    with open(t._manifest_path(1), "w") as fh:
        json.dump({"version": 1, "op": "MERGE#winner", "files": files_v0}, fh)
    with pytest.raises(CommitConflict):
        t._commit(files_v0, "MERGE#loser", expected_version=1)
    assert t.manifest(1)["op"] == "MERGE#winner", "loser must not clobber"
    # the stale-counter path (expected version already taken) also raises
    with pytest.raises(CommitConflict):
        t._commit(files_v0, "MERGE#loser", expected_version=1)


def test_link_race_detected_without_version_check(spark, orders_small, tmp_path):
    """Even with NO expected_version (the pure EEXIST window: two writers
    list versions() before either publishes), os.link must make exactly
    one winner."""
    t = TxTable(spark, str(tmp_path / "tbl"))
    t.create(orders_small, n_files=1)
    files = t.manifest(0)["files"]
    # simulate the race window: manifest for v1 appears between this
    # writer's versions() call and its link() by pre-creating it via a
    # patched versions() that still reports only v0
    real_versions = t.versions
    t.versions = lambda: [0]  # stale read, as in the race window
    with open(t._manifest_path(1), "w") as fh:
        json.dump({"version": 1, "op": "MERGE#winner", "files": files}, fh)
    with pytest.raises(CommitConflict):
        t._commit(files, "MERGE#loser")
    t.versions = real_versions
    assert t.manifest(1)["op"] == "MERGE#winner"


def test_concurrent_merges_both_land_no_lost_update(spark, orders_small, tmp_path):
    """Two genuinely concurrent threads merge disjoint key sets with the
    retry loop; afterwards the table must contain BOTH writers' effects
    (no lost update), versions must be contiguous with unique ops, and
    every manifest must be parseable (no torn commits)."""
    t = TxTable(spark, str(tmp_path / "tbl"))
    t.create(orders_small)
    errors: list[Exception] = []
    barrier = threading.Barrier(2)

    def writer(tag: str, mod: int, bump: float) -> None:
        try:
            upd = orders_small.where(F.col("o_orderkey") % 3 == mod).withColumn(
                "o_totalprice", F.col("o_totalprice") + bump
            )
            barrier.wait(timeout=60)
            t.merge(upd, "o_orderkey", note=tag, max_retries=5)
        except Exception as e:  # noqa: BLE001 - surfaced via the errors list
            errors.append(e)

    th_a = threading.Thread(target=writer, args=("A", 1, 1.0))
    th_b = threading.Thread(target=writer, args=("B", 2, 2.0))
    th_a.start()
    th_b.start()
    th_a.join(timeout=300)
    th_b.join(timeout=300)
    assert not errors, f"writer failed: {errors}"
    assert t.versions() == [0, 1, 2], "both merges must land, contiguously"
    ops = set(t.ops())
    assert ops == {"CREATE", "MERGE#A", "MERGE#B"}
    # no lost update: both bumps visible in the latest snapshot
    base = {r.o_orderkey: r.o_totalprice for r in orders_small.collect()}
    final = {r.o_orderkey: r.o_totalprice for r in t.read().collect()}
    assert set(final) == set(base)
    for k, v in final.items():
        want = base[k] + (1.0 if k % 3 == 1 else 2.0 if k % 3 == 2 else 0.0)
        assert v == pytest.approx(want), f"key {k}: lost update"


def test_orphaned_staged_files_invisible_and_reclaimable(spark, orders_small, tmp_path):
    """A staged-but-conflicted transaction's files must be referenced by
    no manifest, and data files on disk must be a superset of referenced
    ones only by those orphans (readers can never see them)."""
    t = TxTable(spark, str(tmp_path / "tbl"))
    t.create(orders_small, n_files=2)
    upd = orders_small.limit(10).withColumn("o_totalprice", F.lit(0.0))
    target, staged = t.stage_merge(upd, "o_orderkey", n_files=2)
    t.merge(upd.withColumn("o_totalprice", F.lit(1.0)), "o_orderkey")  # wins v1
    with pytest.raises(CommitConflict):
        t._commit(staged, "MERGE#stale", expected_version=target)
    referenced: set[str] = set()
    for v in t.versions():
        referenced.update(t.manifest(v)["files"])
    on_disk = {
        os.path.join(dp, f)
        for dp, _, fs in os.walk(t.data_dir)
        for f in fs
        if f.endswith(".parquet")
    }
    assert not (set(staged) & referenced)
    assert on_disk - referenced == set(staged), "only the orphans may dangle"
