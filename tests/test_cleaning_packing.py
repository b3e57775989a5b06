"""Behavioral tests for text cleaning / PII scrubbing and sequence packing.

The testdata corpus contains no PII-shaped strings, so the oracle-gated
query proves only cross-engine regex parity; these tests pin the actual
substitution behavior on crafted inputs, and the packing invariants the
window formulation guarantees.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myrecommendsystem_spark.functions import text as TXT
from myrecommendsystem_spark.operators import packing


def _clean_one(spark, s: str) -> str:
    return (
        spark.createDataFrame([(s,)], "t string")
        .select(TXT.clean_text(F.col("t")).alias("c"))
        .head()[0]
    )


@pytest.mark.parametrize(
    "raw,expected",
    [
        ("mail me at bob.smith+x@example.co.uk today", "mail me at <EMAIL> today"),
        ("see https://example.com/a?b=c&d=e for info", "see <URL> for info"),
        # email-shaped userinfo inside a URL is claimed by the URL pass
        ("ref http://user@host.com/path ok", "ref <URL> ok"),
        ("server at 192.168.0.1 down", "server at <IP> down"),
        ("call +1 (555) 123-4567 now", "call <PHONE> now"),
        ("multi   space\t and\nnewlines", "multi space and newlines"),
        ("", ""),
    ],
)
def test_clean_text_substitutions(spark, raw, expected):
    assert _clean_one(spark, raw) == expected


def test_pii_counts_independent_per_category(spark):
    # the email is inside a URL: counts are measured on RAW text, so both
    # the URL and the EMAIL categories see it
    df = spark.createDataFrame(
        [("go to http://a@b.com and mail c@d.org or 10.0.0.1",)], "t string"
    )
    c = TXT.pii_counts(F.col("t"))
    row = df.select(
        c["n_urls"].alias("u"), c["n_emails"].alias("e"), c["n_ips"].alias("i")
    ).head()
    assert (row.u, row.e, row.i) == (1, 2, 1)


@pytest.fixture
def packed(spark):
    rows = [
        # (doc_id, source, text with doc_id-determined token count)
        (i, f"s{i % 2}", " ".join(["w"] * n))
        for i, n in enumerate([10, 100, 200, 30, 300, 5, 250, 0, 40, 120])
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return packing.pack_by_token_budget(df, budget=256).collect()


def test_packing_start_offset_rule(packed):
    for r in packed:
        start = r.end_offset - r.n_tokens
        assert r.bin_id == start // 256


def test_packing_is_contiguous_and_never_splits(packed):
    # within a source, bin ids are non-decreasing in doc order and offsets
    # are an exact prefix sum — each doc appears exactly once, whole
    by_src: dict[str, list] = {}
    for r in sorted(packed, key=lambda r: (r.source, r.doc_id)):
        by_src.setdefault(r.source, []).append(r)
    for rows in by_src.values():
        total = 0
        prev_bin = 0
        for r in rows:
            total += r.n_tokens
            assert r.end_offset == total
            assert r.bin_id >= prev_bin
            prev_bin = r.bin_id


def test_packing_empty_doc_lands_in_current_bin(packed):
    empty = next(r for r in packed if r.n_tokens == 0)
    assert empty.bin_id == (empty.end_offset) // 256
