"""ML queries (SURVEY.md §2.8) — rows-only driver checks (no SQL oracle).

ALS factorization is iterative least-squares — not expressible in ANSI SQL,
so per the driver contract these register without an oracle and get a
rows-only check.  Correctness is covered by property tests in
``tests/test_ml.py`` (list lengths, ordering, RMSE threshold vs the
reference's recorded 1.2837, exact-vs-LSH agreement).

The ratings input is the deterministic events-derived relation, so these
run at any scale factor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from myrecommendsystem_spark.io import readers
from myrecommendsystem_spark.ml import als as als_mod
from myrecommendsystem_spark.ml.tuner import grid_search_als
from myrecommendsystem_spark.plans.registry import RATINGS_CTE, register

# Query-sized ALS config: small rank keeps the correctness-gate runtime in
# seconds; the production config (rank=50, iter=5, reg=0.01 —
# OfflineRecommender.scala:66) is exercised in tests/bench.
_QUERY_RANK = 8
_QUERY_ITER = 5


def _ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    return readers.events_as_ratings(spark, sf_dir).select(
        "userId", "productId", "score"
    )


@register(
    "als_user_recs",
    None,
    doc="M1+M2+A5: ALS fit + recommendForAllUsers top-10, flat "
    "(userId, productId, score, rnk) — replaces the cartesian+predict+ "
    "groupByKey-top-k pipeline (OfflineRecommender.scala:64-90)",
)
def als_user_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = als_mod.train_als(
        _ratings(spark, sf_dir), rank=_QUERY_RANK, max_iter=_QUERY_ITER
    )
    return als_mod.user_recs_flat(model, k=10)


@register(
    "als_item_similarities",
    None,
    doc="M3+M7: item-factor cosine similarity matrix, exact normalized-dot "
    "self-join, sim > 0.6 (OfflineRecommender.scala:92-109)",
)
def als_item_similarities(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = als_mod.train_als(
        _ratings(spark, sf_dir), rank=_QUERY_RANK, max_iter=_QUERY_ITER
    )
    factors = als_mod.item_factors_df(model)
    return als_mod.item_similarities(factors, threshold=0.6, method="exact")


@register(
    "als_grid_search",
    None,
    doc="M4-M6: TrainValidationSplit grid search (ALSTrainer.scala:41-79) — "
    "query-sized grid; returns (rank, reg_param, rmse) per grid point",
)
def als_grid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    _, results = grid_search_als(
        _ratings(spark, sf_dir),
        ranks=(4, 8),
        regs=(0.1, 0.01),
        max_iter=3,
    )
    return results.select(
        "rank", "reg_param", F.round("rmse", 4).alias("rmse")
    )


@register(
    "ratings_next_item_examples",
    f"""
WITH {RATINGS_CTE},
h AS (
    SELECT userId,
           array_to_string(
               list(productId) OVER (
                   PARTITION BY userId
                   ORDER BY ts, productId, score
                   ROWS BETWEEN 5 PRECEDING AND 1 PRECEDING
               ), ',') AS history,
           productId AS label,
           CAST(FLOOR(epoch(ts)) AS BIGINT) AS ts_sec
    FROM ratings
)
SELECT userId, history, label, ts_sec
FROM h
WHERE history IS NOT NULL AND length(history) > 0
""",
    doc="training-example generation for sequential recommenders: each "
    "interaction with >=1 predecessor becomes (history of last <=5 item "
    "ids, next-item label) — one userId shuffle, O(k) ROWS frame, "
    "history flattened to CSV string (flat schema for any consumer)",
    defer=True,
)
def ratings_next_item_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from myrecommendsystem_spark.ml.examples import next_item_examples

    # events_as_ratings keeps ts, which the chronological window needs
    return next_item_examples(readers.events_as_ratings(spark, sf_dir), history_k=5)


@register(
    "als_implicit_recs",
    None,
    doc="implicit-feedback ALS (Hu/Koren/Volinsky 2008 — the MLlib mode "
    "the reference never exercises but any view/click pipeline needs): "
    "scores as confidence weights over binary preferences, top-10 per "
    "user; rows-only (iterative factorization not SQL-expressible)",
    defer=True,
)
def als_implicit_recs(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = als_mod.train_als(
        _ratings(spark, sf_dir),
        rank=_QUERY_RANK,
        max_iter=_QUERY_ITER,
        implicit_prefs=True,
        alpha=40.0,
    )
    return als_mod.user_recs_flat(model, k=10)
