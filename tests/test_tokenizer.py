"""BPE merge learning — semantics pinned against a pure-python trainer.

The registry's ``bpe_pair_counts`` is oracle-gated (DuckDB); the
iterative ``bpe_learned_merges`` is rows-only at the driver, so the
merge-sequence semantics are pinned here by exact equality with an
independent in-memory implementation of Sennrich-2016 greedy BPE.
"""

from __future__ import annotations

import collections
import re

from myrecommendsystem_spark.ml import bpe

_WORD_RE = re.compile(r"^[a-z]+$")


def _reference_bpe(texts, n_merges):
    """Independent driver-side BPE: word counts -> greedy merges."""
    vocab = collections.Counter()
    for t in texts:
        for w in t.lower().strip().split():
            if 2 <= len(w) <= 20 and _WORD_RE.match(w):
                vocab[w] += 1
    syms = {w: list(w) for w in vocab}
    merges = []
    for _ in range(n_merges):
        pairs = collections.Counter()
        for w, s in syms.items():
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += vocab[w]
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        for w, s in syms.items():
            res, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            syms[w] = res
    return merges


TEXTS = [
    "the cat sat on the mat and the cat ate",
    "low lower lowest newer newest wide wider widest",
    "banana bandana ananas banal canal",
    "aaa aaaa aaaaa bb bbb",  # overlap case: merging (a,a) must not chain
    "the newer cat sat lower on a wider mat",
]


def test_merge_sequence_matches_reference(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    got = bpe.train_bpe_merges(docs, n_merges=12, max_vocab=None)
    want = _reference_bpe(TEXTS, 12)
    assert got == want


def test_merge_overlap_is_left_to_right():
    # Merging ('a','a') in 'aaaaa' -> ['aa','aa','a'], never ['aa','aaa'].
    assert bpe.segment_word("aaaaa", [("a", "a", 99)]) == ["aa", "aa", "a"]
    assert bpe.segment_word(
        "aaaaa", [("a", "a", 99), ("aa", "aa", 98)]
    ) == ["aaaa", "a"]


def test_segmenter_applies_merges_in_rank_order(spark):
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    merges = bpe.train_bpe_merges(docs, n_merges=12, max_vocab=None)
    # Every learned merge token reassembles its pair.
    for a, b, _ in merges:
        assert (a + b) == "".join(bpe.segment_word(a + b, merges)[:])[
            : len(a + b)
        ]
    # Segmentation of a word is a partition of its characters.
    for w in ["lowest", "banana", "thecat"]:
        assert "".join(bpe.segment_word(w, merges)) == w


def test_vocab_cap_is_frequency_ranked(spark):
    docs = spark.createDataFrame(
        [("zz zz zz yy yy xx",)], "text string"
    )
    top2 = {r["w"] for r in bpe.word_vocab(docs, max_vocab=2).collect()}
    assert top2 == {"zz", "yy"}


def test_segment_corpus_stats_laws(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = bpe.train_bpe_merges(docs, n_merges=12, max_vocab=None)
    stats = {
        r["doc_id"]: r
        for r in bpe.segment_corpus_stats(docs, merges).collect()
    }
    assert set(stats) == set(range(len(TEXTS)))
    for i, t in enumerate(TEXTS):
        words = [
            w for w in t.lower().split() if 2 <= len(w) <= 20 and w.isalpha()
        ]
        r = stats[i]
        assert r["n_words"] == len(words)
        assert r["n_chars"] == sum(len(w) for w in words)
        # tokens count must equal independently-segmented total
        want = sum(len(bpe.segment_word(w, merges)) for w in words)
        assert r["n_tokens"] == want
        # merges only ever reduce token count below the char baseline
        assert r["n_tokens"] <= r["n_chars"]
        if r["n_tokens"]:
            assert r["chars_per_token"] >= 1.0


def test_compression_ratio_orders_text_classes(spark):
    from myrecommendsystem_spark.functions.text import compression_ratio
    import random

    rng = random.Random(5)
    repetitive = "spam ham " * 200
    natural = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronauts debate the merits of distributed query planning "
    ) * 10
    rand = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(1600))
    df = spark.createDataFrame(
        [(1, repetitive), (2, natural), (3, rand), (4, "")],
        "id long, text string",
    )
    from pyspark.sql import functions as F

    got = {
        r["id"]: r["r"]
        for r in df.select(
            "id", compression_ratio(F.col("text")).alias("r")
        ).collect()
    }
    assert got[1] < got[2] < got[3]  # repetitive < natural < random
    assert got[4] == 0.0
    assert 0 < got[1] < 0.2 and got[3] > 0.6


def test_distributed_merge_loop_matches_driver_path(spark, monkeypatch):
    """Forcing the vocab cap to 0 exercises the distributed per-iteration
    loop; it must learn the identical merge sequence as the driver-side
    fast path (same algorithm, same tie-breaks)."""
    docs = spark.createDataFrame([(t,) for t in TEXTS], "text string")
    fast = bpe.train_bpe_merges(docs, n_merges=8, max_vocab=None)
    monkeypatch.setattr(bpe, "_DRIVER_VOCAB_CAP", 0)
    slow = bpe.train_bpe_merges(docs, n_merges=8, max_vocab=None)
    assert slow == fast
