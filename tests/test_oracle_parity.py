"""Differential-oracle parity for every registered key (SURVEY §5.2.1).

This replicates the driver's check locally at sf0.01: row count + schema +
order-insensitive values vs DuckDB. A key is only *declared* (registered)
once it passes here.
"""

from __future__ import annotations

import pytest

from engine import registry

registry.load_all()

ALL_KEYS = sorted(registry.QUERIES)


@pytest.mark.parametrize("name", ALL_KEYS)
def test_key(spark, sf_dir, name):
    from tests.oracle import check_key

    check_key(spark, name, sf_dir)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.oracle_sql()) <= set(e.queries())
