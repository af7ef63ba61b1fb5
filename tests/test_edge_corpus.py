"""Edge-case differential fixture: the text/tokenizer operators re-run
against DuckDB on a hand-built corpus of boundary documents — empty-ish,
single-word, exact block/chunk boundaries (19/20/21, 31/32/33 words),
repeated-symbol runs (the BPE island rule's worst case), and non-ASCII.

The standard fixtures exercise typical shapes; every historical
cross-engine bug (rounding boundaries, slice-overrun semantics, greedy
merge ties) lived at boundaries like these, so this suite pins them
explicitly with the SAME comparator the driver uses.
"""

from __future__ import annotations

import os
import shutil

import pytest

from engine import registry

registry.load_all()

SRC_SF = "/root/testdata/sf0.001"

EDGE_DOCS = [
    # (doc_id, text) — lang/source/n_chars filled in below
    (0, "word"),  # single word
    (1, " ".join(f"w{i}" for i in range(19))),  # one under block boundary
    (2, " ".join(f"w{i}" for i in range(20))),  # exact block boundary
    (3, " ".join(f"w{i}" for i in range(21))),  # one over
    (4, " ".join(f"w{i}" for i in range(31))),  # one under chunk W
    (5, " ".join(f"w{i}" for i in range(32))),  # exact chunk W
    (6, " ".join(f"w{i}" for i in range(33))),  # first doc needing 2 chunks
    (7, " ".join(f"w{i}" for i in range(56))),  # exact 2-chunk cover (32+24)
    (8, " ".join(f"w{i}" for i in range(57))),  # 3 chunks
    (9, "aaaa aaaa aaaa"),  # BPE (a,a) run — island even-offset rule
    (10, "ab ab ab ab ab ab"),  # high-frequency bigram word
    (11, "x " * 40 + "x"),  # 41 identical single-char words
    (12, "café naïve café naïve zürich"),  # multi-byte UTF-8
    (13, " ".join(["dup block words"] * 20)),  # repeated 3-word phrase
    (14, "tail " + " ".join(f"u{i}" for i in range(39))),  # 40 words
    (15, ""),  # empty text — excluded by every key's text <> '' guard
    (16, "two  spaces   here"),  # empty tokens from repeated separators
]

KEYS = [
    "llm_chunk_overlap",
    "llm_block_dedup",
    "llm_bpe_train",
    "llm_bpe_apply",
    "llm_token_count",
    "llm_text_stats",
    "llm_exact_dedup",
    "agg_count_min_sketch",
    "llm_shard_assignment",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("edge_sf"))
    for f in os.listdir(SRC_SF):
        shutil.copy(os.path.join(SRC_SF, f), os.path.join(base, f))
    rows = [
        (int(i), t, "en", "edge", int(len(t)))
        for i, t in EDGE_DOCS
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(os.path.join(base, "documents.parquet"))
    # drop any cached tables/views for this dir path
    return base


@pytest.mark.parametrize("name", KEYS)
def test_edge_key(spark, edge_dir, name):
    from tests.oracle import check_key

    check_key(spark, name, edge_dir)
