"""Tokenizer-training queries — BPE merge learning over the documents
table (Sennrich 2016).  The LLM-pipeline step between corpus cleaning
and training-example export; the reference has no tokenizer component,
so these extend the engine (SURVEY.md "beyond the reference" tier).

All registered ``defer=True`` (round-5 driver window overflow —
registry.py rotation note); replayed locally by
tests/test_registry_oracle.py at driver scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from myrecommendsystem_spark.io import readers
from myrecommendsystem_spark.ml import bpe
from myrecommendsystem_spark.plans.registry import register


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return readers.load_table(spark, sf_dir, "documents")


@register(
    "bpe_pair_counts",
    r"""
WITH words AS (
    SELECT w, CAST(COUNT(*) AS BIGINT) AS freq
    FROM (
        SELECT unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS w
        FROM documents
    )
    WHERE length(w) BETWEEN 2 AND 20 AND regexp_matches(w, '^[a-z]+$')
    GROUP BY w
),
pairs AS (
    SELECT substr(w.w, CAST(i.i AS INTEGER), 1) AS a,
           substr(w.w, CAST(i.i AS INTEGER) + 1, 1) AS b,
           SUM(w.freq) AS cnt
    FROM words w, unnest(range(1, length(w.w))) AS i(i)
    GROUP BY a, b
)
SELECT a, b, CAST(cnt AS BIGINT) AS cnt
FROM pairs
ORDER BY cnt DESC, a, b
LIMIT 30
""",
    doc="BPE iteration-0 statistics: the 30 most frequent adjacent "
    "character pairs, frequency-weighted over the word vocabulary.  "
    "The scale discipline IS the vocab indirection — pairs are counted "
    "on (word, freq), a language-bounded relation, never on the raw "
    "corpus, so a 100 TB corpus costs one word-count aggregate and the "
    "pair stage is O(|vocab|).  Neighbour pairs built JVM-side with "
    "transform over sequence indices (codegen), one grouped sum, "
    "TakeOrderedAndProject top-k",
    defer=True,
)
def bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = bpe.word_vocab(_docs(spark, sf_dir), max_vocab=None).select(
        "w", "freq", F.split("w", "").alias("syms")
    )
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
        .orderBy(F.col("cnt").desc(), "a", "b")
        .limit(30)
    )


@register(
    "bpe_learned_merges",
    None,  # greedy iterative argmax — not expressible as one SQL query;
    # semantics pinned against a pure-python reference trainer in
    # tests/test_tokenizer.py (exact merge-sequence equality)
    doc="BPE merge learning: 20 greedy merge iterations over the "
    "documents vocabulary (ml/bpe.py).  Each iteration shuffles only "
    "the vocab-sized relation, collects exactly one argmax row, and "
    "applies the merge with an Arrow kernel; lineage checkpointed "
    "every 5 iterations.  Output (rank, a, b, merged, cnt) is the "
    "merge table a segmenter broadcasts",
    defer=True,
)
def bpe_learned_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return bpe.learned_merges_df(
        spark, _docs(spark, sf_dir), n_merges=20
    )


@register(
    "doc_bpe_segment_stats",
    None,  # segmentation applies the learned (iterative) merge list —
    # rows-only; per-word reassembly and compression-monotonicity laws
    # in tests/test_tokenizer.py
    doc="BPE deployment half: segment every document with the 20 "
    "learned merges (broadcast merge table, map-only Arrow kernel — "
    "the corpus never shuffles) and report per-doc compression "
    "(words, chars, tokens, chars/token).  chars/token is the "
    "fertility metric tokenizer teams track; it must strictly "
    "improve over the 1.0 char baseline wherever any merge applies",
    defer=True,
)
def doc_bpe_segment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    merges = bpe.train_bpe_merges(docs, n_merges=20)
    return bpe.segment_corpus_stats(docs, merges).orderBy("doc_id")
