"""Model-based corpus filtering — a trained classifier scoring documents.

The production pattern behind fastText-style quality/language filters
(GPT-3 §2.2 "quality classifier", CCNet, RedPajama): take WEAK labels
from a cheap heuristic or a curated subset, train a linear model on
hashed character-n-gram features, then score the whole corpus with the
model and gate on the probability.  The value over the raw heuristic is
calibration + generalization: the model smooths over individual rule
misfires and emits a continuous score a pipeline can threshold per use
case.

Spark shape:

- featurization is JVM-side end-to-end: char bigrams via
  ``sequence``+``transform`` (codegen) feeding MLlib ``HashingTF``
  (hashing trick — fixed 256-dim vectors, no vocabulary state to ship);
- weak labels come from the existing heuristic language-ID
  (``functions.text.predicted_lang``) — no human labels anywhere;
- ``LogisticRegression`` fit is MLlib's distributed L-BFGS (the same
  treeAggregate gradient shape ALS uses), scoring is one ``transform``
  — model broadcast, corpus never shuffles.

At 100 TB you fit on a bounded deterministic sample (same discipline as
the ANN quantizer trainers) and score the full corpus; the fit here
uses the whole (tiny) table.
"""

from __future__ import annotations

from pyspark.ml.classification import LogisticRegression
from pyspark.ml.feature import HashingTF
from pyspark.sql import DataFrame, functions as F

from myrecommendsystem_spark.functions import text as TXT
from myrecommendsystem_spark.functions.compat import round_stable

_N_FEATURES = 256


def _char_bigrams(col: str) -> F.Column:
    """Array of character bigrams, JVM-side and O(len) per document:
    split to chars once, zip the array with its own shift-by-one.  (A
    per-index ``substr`` of the full string is O(len^2) char copying —
    measured 2x slower on 300-char docs.)"""
    s = F.lower(F.trim(F.col(col)))
    cs = F.split(s, "")
    n = F.size(cs)
    return F.zip_with(
        F.slice(cs, 1, F.greatest(n - 1, F.lit(1))),
        F.slice(cs, 2, F.greatest(n - 1, F.lit(1))),
        lambda a, b: F.concat(a, F.coalesce(b, F.lit(""))),
    )


def featurize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    grams = docs.withColumn("grams", _char_bigrams(text_col))
    tf = HashingTF(
        inputCol="grams", outputCol="features", numFeatures=_N_FEATURES
    )
    return tf.transform(grams).drop("grams")


def train_quality_model(
    docs: DataFrame,
    text_col: str = "text",
    target_lang: str = "en",
    max_train: int = 20_000,
):
    """Fit LR on weak labels: heuristic language-ID == ``target_lang``.

    Two scale disciplines: the training set is a bounded DETERMINISTIC
    sample (md5-ranked, like the ANN quantizer trainers — the fit cost
    is O(max_train), not O(corpus)), and the featurized frame is
    persisted for the L-BFGS iterations — without the cache every
    gradient pass re-runs the char-gram featurization (measured 27.6 s
    → ~3 s at sf0.1).
    """
    train = docs.select(text_col)
    if max_train is not None:
        train = (
            train.withColumn("__r", F.md5(F.col(text_col)))
            .orderBy("__r")
            .limit(max_train)
            .drop("__r")
        )
    labeled = (
        featurize(train, text_col)
        .withColumn(
            "label",
            (TXT.predicted_lang(F.col(text_col)) == target_lang)
            .cast("double"),
        )
        .select("features", "label")
        .persist()
    )
    labeled.count()  # materialize before the iterative fit
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=0.01,
        maxIter=12,
    )
    try:
        return lr.fit(labeled)
    finally:
        labeled.unpersist()


def score_documents(
    docs: DataFrame,
    model=None,
    text_col: str = "text",
    id_col: str = "doc_id",
    target_lang: str = "en",
) -> DataFrame:
    """(doc_id, weak_label, p_target) for every document.

    ``model=None`` trains on the input itself (the sf-test path); pass a
    pre-fit model to reproduce the 100 TB sample-fit/full-score split.
    The self-train path featurizes ONCE: the scored frame is persisted
    and the training sample is carved out of it, instead of running the
    char-gram + langid expressions a second time.
    """
    feat = featurize(docs, text_col).withColumn(
        "weak_label",
        (TXT.predicted_lang(F.col(text_col)) == target_lang).cast("int"),
    )
    cached = None
    if model is None:
        cached = feat.persist()
        cached.count()
        # bounded deterministic training sample (same md5-ranked cut as
        # train_quality_model) — the fit stays O(max_train) even when
        # scoring the whole corpus
        labeled = (
            cached.orderBy(F.md5(F.col(text_col)))
            .limit(20_000)
            .select(
                "features", F.col("weak_label").cast("double").alias("label")
            )
        )
        lr = LogisticRegression(
            featuresCol="features",
            labelCol="label",
            regParam=0.01,
            maxIter=12,
        )
        model = lr.fit(labeled)
        feat = cached
    from pyspark.ml.functions import vector_to_array

    p1 = F.element_at(vector_to_array(F.col("probability")), 2).cast("double")
    out = (
        model.transform(feat)
        .select(
            F.col(id_col).cast("bigint").alias(id_col),
            "weak_label",
            round_stable(p1, 4).alias("p_target"),
        )
        .orderBy(id_col)
    )
    if cached is not None:
        from myrecommendsystem_spark.functions.caching import eager_release

        return eager_release(out, cached).orderBy(id_col)
    return out
