"""Streaming-specific semantic assertions (beyond oracle parity)."""

from __future__ import annotations

from engine import registry

registry.load_all()


def test_watermark_drops_late_row(spark, sf_dir):
    """The injected late row (user_id = -1) must not reach the sink."""
    df = registry.QUERIES["stream_watermark_late"](spark, sf_dir)
    rows = df.collect()
    assert len(rows) > 0
    assert all(r.late_row_absent for r in rows), "late row leaked past watermark"


def test_cdc_pipeline_idempotent_vs_batch(spark, sf_dir):
    """Streaming CDC snapshot ≡ batch latest-per-key (exactly-once merge)."""
    stream_snap = registry.QUERIES["stream_cdc_pipeline"](spark, sf_dir)
    batch = registry.QUERIES["cdc_dedup_extract"](spark, sf_dir)
    s = {tuple(r) for r in stream_snap.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b
