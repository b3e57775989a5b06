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
    """Array of character bigrams, JVM-side (sequence + transform)."""
    s = F.lower(F.trim(F.col(col)))
    return F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(s) - 1, F.lit(1))),
        lambda i: F.substring(s, 1, 0x7FFFFFFF).substr(i, F.lit(2)),
    )


def featurize(docs: DataFrame, text_col: str = "text") -> DataFrame:
    grams = docs.withColumn("grams", _char_bigrams(text_col))
    tf = HashingTF(
        inputCol="grams", outputCol="features", numFeatures=_N_FEATURES
    )
    return tf.transform(grams).drop("grams")


def train_quality_model(
    docs: DataFrame, text_col: str = "text", target_lang: str = "en"
):
    """Fit LR on weak labels: heuristic language-ID == ``target_lang``."""
    labeled = featurize(docs, text_col).withColumn(
        "label",
        (TXT.predicted_lang(F.col(text_col)) == target_lang)
        .cast("double"),
    )
    lr = LogisticRegression(
        featuresCol="features",
        labelCol="label",
        regParam=0.01,
        maxIter=12,
    )
    return lr.fit(labeled)


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
    """
    if model is None:
        model = train_quality_model(docs, text_col, target_lang)
    feat = featurize(docs, text_col).withColumn(
        "weak_label",
        (TXT.predicted_lang(F.col(text_col)) == target_lang).cast("int"),
    )
    from pyspark.ml.functions import vector_to_array

    p1 = F.element_at(vector_to_array(F.col("probability")), 2).cast("double")
    return (
        model.transform(feat)
        .select(
            F.col(id_col).cast("bigint").alias(id_col),
            "weak_label",
            round_stable(p1, 4).alias("p_target"),
        )
        .orderBy(id_col)
    )
