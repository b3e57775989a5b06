"""Byte-Pair-Encoding merge learning over a distributed corpus.

The tokenizer-training step of an LLM data pipeline (Sennrich et al.
2016, "Neural Machine Translation of Rare Words with Subword Units").
The reference system has no tokenizer component — this extends the
engine with the standard corpus->vocab->greedy-merge loop, shaped for
Spark:

- **Corpus -> word vocabulary first.**  Pair statistics are counted on
  the *word-frequency table* (``word, freq``), never on raw documents:
  the vocab is orders of magnitude smaller than a 100 TB corpus (it is
  bounded by the language, not the data volume), so every subsequent
  iteration shuffles a relation whose size is O(|vocab|), not O(corpus).
  This mirrors how production BPE trainers (HuggingFace tokenizers,
  SentencePiece) operate on word-count dictionaries.
- **Adjacent-pair counting is JVM-side**: the symbol array's neighbour
  pairs come from ``transform`` over the array indices — no shuffle
  besides the grouped sum, no Python in the count path.
- **Merge application is an Arrow kernel** (``applyInPandas``-style
  batch over the vocab): replacing adjacent symbol pairs in-place is a
  sequential scan per word with no relational equivalent; it runs over
  the small vocab relation only.
- **One merge per iteration is collected** (a single argmax row) —
  driver traffic is O(n_merges), independent of corpus size.
- **Lineage is truncated** with ``localCheckpoint`` every few
  iterations, the same discipline as the connected-components closure
  in ``operators/dedup.py``.

Determinism: ties on pair count break lexicographically on (a, b); the
vocab cap is frequency-ranked with the word as tie-break.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_WORD_RE = "^[a-z]+$"

# Every CHECKPOINT_EVERY merge iterations the vocab lineage is cut;
# without this the plan depth grows linearly in n_merges.
_CHECKPOINT_EVERY = 5


def word_vocab(
    docs: DataFrame,
    text_col: str = "text",
    min_len: int = 2,
    max_len: int = 20,
    max_vocab: int | None = 50_000,
) -> DataFrame:
    """``(word, freq)`` over lowercased alphabetic words.

    ``max_vocab`` caps the vocabulary frequency-ranked (word ASC breaks
    ties) so iteration cost is bounded on a pathological corpus; the cap
    is a broadcast-side limit, corpus scan stays one pass.
    """
    words = (
        docs.select(
            F.explode(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
            ).alias("w")
        )
        .filter(
            (F.length("w") >= min_len)
            & (F.length("w") <= max_len)
            & F.col("w").rlike(_WORD_RE)
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("bigint").alias("freq"))
    )
    if max_vocab is not None:
        words = words.orderBy(F.col("freq").desc(), "w").limit(max_vocab)
    return words


def _adjacent_pairs(vocab: DataFrame) -> DataFrame:
    """Explode each word's symbol array into (a, b, freq-weighted count).

    ``transform`` over ``sequence(0, size-2)`` builds the neighbour
    structs JVM-side; only the grouped sum shuffles.
    """
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("syms") - 2),
        lambda i: F.struct(
            F.element_at("syms", i + 1).alias("a"),
            F.element_at("syms", i + 2).alias("b"),
        ),
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select(F.explode(pairs).alias("p"), "freq")
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("freq").cast("bigint").alias("cnt"))
    )


_VOCAB_SCHEMA = StructType(
    [
        StructField("w", StringType()),
        StructField("freq", LongType()),
        StructField("syms", ArrayType(StringType())),
    ]
)


def _merge_kernel(a: str, b: str):
    """Arrow kernel: replace every adjacent (a, b) in syms with a+b.

    Sequential left-to-right scan per word — the BPE contract (a merged
    occurrence cannot overlap the next match, e.g. merging ('a','a') in
    'aaa' yields ['aa','a']).
    """
    merged = a + b

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["syms"]:
                res = []
                i, n = 0, len(syms)
                while i < n:
                    if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(syms[i])
                        i += 1
                out.append(res)
            pdf = pdf.copy()
            pdf["syms"] = out
            yield pdf

    return apply


# Vocabularies at or below this row count run the merge loop driver-side
# (one bounded collect, zero per-iteration jobs); larger vocabularies take
# the distributed loop.  Word-count dictionaries are language-bounded, so
# virtually every real corpus lands on the fast path — the same bounded-
# collect discipline as the ANN quantizer trainers.
_DRIVER_VOCAB_CAP = 200_000


def _greedy_merges_inmem(
    vocab_rows: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str, int]]:
    """Driver-side greedy loop over the collected (word, freq) table —
    identical semantics and tie-breaks ((-count, a, b)) to the
    distributed loop; equality with an independent implementation is
    pinned in tests/test_tokenizer.py."""
    freqs = {w: f for w, f in vocab_rows}
    syms = {w: list(w) for w in freqs}
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for w, sy in syms.items():
            f = freqs[w]
            for i in range(len(sy) - 1):
                pairs[(sy[i], sy[i + 1])] = pairs.get((sy[i], sy[i + 1]), 0) + f
        if not pairs:
            break
        (a, b), cnt = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < 2:
            break
        merges.append((a, b, cnt))
        for w, sy in syms.items():
            res, i = [], 0
            while i < len(sy):
                if i + 1 < len(sy) and sy[i] == a and sy[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(sy[i])
                    i += 1
            syms[w] = res
    return merges


def train_bpe_merges(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    max_vocab: int | None = 50_000,
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` greedy BPE merges; returns [(a, b, count)].

    The corpus scan (word counting) is always distributed.  The merge
    loop itself sizes its venue to the VOCABULARY: at or under
    ``_DRIVER_VOCAB_CAP`` rows it runs in driver memory off one bounded
    collect (20 Spark jobs of pure scheduling overhead otherwise
    dominated the wall clock — measured 7 s -> <1 s at sf0.1); above
    the cap each iteration is one grouped sum over the vocab-sized
    relation + a single-row argmax collect + one Arrow merge pass —
    O(|vocab|) executor state regardless of corpus size.
    """
    spark = docs.sparkSession
    base = word_vocab(docs, text_col=text_col, max_vocab=max_vocab)
    n_vocab = base.count()
    if n_vocab <= _DRIVER_VOCAB_CAP:
        rows = [(r["w"], int(r["freq"])) for r in base.collect()]
        return _greedy_merges_inmem(rows, n_merges)
    vocab = base.select("w", "freq", F.split("w", "").alias("syms"))
    vocab = vocab.localCheckpoint(eager=True)

    merges: list[tuple[str, str, int]] = []
    for it in range(n_merges):
        top = (
            _adjacent_pairs(vocab)
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        if cnt < 2:  # nothing left worth merging
            break
        merges.append((a, b, cnt))
        vocab = vocab.mapInPandas(_merge_kernel(a, b), schema=_VOCAB_SCHEMA)
        if (it + 1) % _CHECKPOINT_EVERY == 0:
            vocab = vocab.localCheckpoint(eager=True)
    return merges


def learned_merges_df(
    spark: SparkSession,
    docs: DataFrame,
    n_merges: int = 20,
    max_vocab: int | None = 50_000,
) -> DataFrame:
    """Merge table as a DataFrame: (rank, a, b, merged, cnt)."""
    merges = train_bpe_merges(docs, n_merges=n_merges, max_vocab=max_vocab)
    rows = [
        (i + 1, a, b, a + b, cnt) for i, (a, b, cnt) in enumerate(merges)
    ]
    schema = (
        "rank int, a string, b string, merged string, cnt bigint"
    )
    return spark.createDataFrame(rows, schema=schema)


def segment_word(word: str, merges: list[tuple[str, str, int]]) -> list[str]:
    """Apply a learned merge list to one word (driver-side helper for
    tests and interactive inspection — production segmentation would be
    an Arrow kernel with the merge list broadcast)."""
    syms = list(word)
    for a, b, _ in merges:
        res: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                res.append(a + b)
                i += 2
            else:
                res.append(syms[i])
                i += 1
        syms = res
    return syms


def segment_corpus_stats(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a learned merge list to every document: per-doc token
    statistics (n_words, n_chars, n_tokens, chars_per_token).

    The deployment half of BPE: the merge table (a few hundred pairs)
    broadcasts inside an Arrow kernel; each word segments by one
    sequential pass per merge rank.  The corpus never shuffles —
    segmentation is map-only.
    """
    import pandas as pd

    ordered = [(a, b) for a, b, _ in merges]

    # segmentation is a pure function of the WORD — memoize per unique
    # word across the whole executor (the vocabulary is language-bounded,
    # so the cache is small and the per-occurrence cost collapses to a
    # dict lookup; measured 11.9 s -> ~2 s at sf0.1)
    seg_cache: dict[str, int] = {}

    def n_toks(w: str) -> int:
        hit = seg_cache.get(w)
        if hit is not None:
            return hit
        syms = list(w)
        for a, b in ordered:
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        seg_cache[w] = len(syms)
        return len(syms)

    def seg(batches):
        for pdf in batches:
            rows = []
            for did, t in zip(pdf[id_col], pdf[text_col]):
                words = [
                    w
                    for w in (t or "").lower().strip().split()
                    if 2 <= len(w) <= 20 and w.isalpha()
                ]
                n_chars = sum(len(w) for w in words)
                n_tokens = sum(n_toks(w) for w in words)
                rows.append((int(did), len(words), n_chars, n_tokens))
            yield pd.DataFrame(
                rows, columns=[id_col, "n_words", "n_chars", "n_tokens"]
            )

    out_schema = f"{id_col} long, n_words int, n_chars int, n_tokens int"
    return (
        docs.select(id_col, text_col)
        .mapInPandas(seg, schema=out_schema)
        .withColumn(
            "chars_per_token",
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.col("n_chars") * 1.0 / F.col("n_tokens"),
                ).otherwise(0.0),
                4,
            ),
        )
    )
