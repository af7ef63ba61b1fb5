"""Edge-case differential fixture #2: event-time operators re-run against
DuckDB on a hand-built stream that concentrates every ordering hazard —
DUPLICATE timestamps (the event_id tie-break must agree), gaps of exactly
the 30-minute session threshold (> vs >= must agree), midnight-boundary
days (gap-island day arithmetic), single-event users, and a user whose
events all share one second.

Every event-time key totals its order on (us, event_id); a cross-engine
disagreement in tie-breaking or boundary comparison is invisible on the
organic fixture (unique µs timestamps) and guaranteed-visible here.
"""

from __future__ import annotations

import os
import shutil
from datetime import datetime, timedelta

import pytest

from engine import registry

registry.load_all()

SRC_SF = "/root/testdata/sf0.001"

T0 = datetime(2024, 1, 1, 0, 0, 0)


def _mk_events():
    rows = []
    eid = [0]

    def ev(user, dt, etype, value=10.0):
        rows.append((eid[0], dt, user, etype, value, '{"k": 1}'))
        eid[0] += 1

    # user 0: three events with IDENTICAL timestamps — pure event_id order
    for _ in range(3):
        ev(0, T0 + timedelta(hours=1), "view")
    ev(0, T0 + timedelta(hours=1), "purchase", 20.0)
    # user 1: consecutive gaps of EXACTLY 30 minutes (the session
    # threshold: gap > 30min splits, == must NOT split, both engines)
    for i in range(4):
        ev(1, T0 + timedelta(minutes=30 * i), "click")
    # then one gap of 30min + 1µs (must split)
    ev(1, T0 + timedelta(minutes=120) + timedelta(microseconds=1), "view")
    # user 2: single event
    ev(2, T0 + timedelta(days=2), "signup")
    # user 3: events straddling midnight exactly (day-boundary islands)
    ev(3, datetime(2024, 1, 5, 23, 59, 59, 999999), "view")
    ev(3, datetime(2024, 1, 6, 0, 0, 0), "click")
    ev(3, datetime(2024, 1, 8, 0, 0, 0), "view")  # gap day -> new island
    # user 4: funnel exactly at the 24h window edge
    ev(4, T0, "view")
    ev(4, T0 + timedelta(hours=24), "click")          # == t1+24h: inside
    ev(4, T0 + timedelta(hours=24, seconds=1), "purchase")  # outside window
    # user 5: same-second burst with distinct µs + rounding-edge values
    for i in range(5):
        ev(5, T0 + timedelta(days=1, microseconds=i), "purchase", 1.005 + i)
    # user 6: 10 daily events for z-score/EWMA full windows
    for d in range(10):
        ev(6, T0 + timedelta(days=d, hours=12), "error", 5.5)
    return rows


EDGE_KEYS = [
    "win_sessionize",
    "events_path_topk",
    "events_markov_transitions",
    "events_window_funnel",
    "win_gap_islands",
    "events_anomaly_zscore",
    "win_ewma",
    "events_rfm",
    "events_cuped",
    "events_ab_welch",
    "dq_freshness",
    "agg_time_rollup_multires",
    "events_funnel",
    "events_retention",
    "win_lag_lead",
    "win_running_sum",
]


@pytest.fixture(scope="module")
def edge_events_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("edge_ev"))
    for f in os.listdir(SRC_SF):
        shutil.copy(os.path.join(SRC_SF, f), os.path.join(base, f))
    df = spark.createDataFrame(
        _mk_events(),
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, "events.parquet"))
    return base


@pytest.mark.parametrize("name", EDGE_KEYS)
def test_edge_event_key(spark, edge_events_dir, name):
    from tests.oracle import check_key

    check_key(spark, name, edge_events_dir)
