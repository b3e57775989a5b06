"""Batch statistics operators — the StatisticsRecommender module, Spark-first.

Reference: ``/root/reference/recommender/StatisticsRecommender/src/main/scala/
com/ng/statistics/StatisticsRecommender.scala`` (SQL strings at :54, :79-86,
:101).  Three derived tables over the ratings relation:

- RateMoreProducts          — per-product rating count (A1)
- RateMoreRecentlyProducts  — per-(period, product) count, recent first (A2+F1+O1)
- AverageProducts           — per-product mean score (A3)

Differences from the reference, on purpose:
- The ``changeDate`` SimpleDateFormat UDF (:73-76) is replaced by the
  built-in ``date_format`` so Catalyst can fold/push it (SURVEY.md §4).
- The reference's first query *comments* "sorted desc" but has no ORDER BY
  (:52-55) — we add the explicit sort and a deterministic productId
  tie-break (SURVEY.md §2.6 O-NB).

All functions take a ratings-shaped DataFrame
``(userId int, productId int, score double, ts timestamp)`` so they run
against reference-shaped fixtures and against the driver's events-derived
ratings alike.  Every aggregate is a ``groupBy().agg()`` — Catalyst plans
partial (map-side) + final aggregation automatically, so each query is one
shuffle on its group key regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from myrecommendsystem_spark.functions.compat import round_stable


def rate_more_products(ratings: DataFrame) -> DataFrame:
    """Per-product rating count, most-rated first (A1).

    Reference: ``select productId, count(productId) as count from ratings
    group by productId`` (StatisticsRecommender.scala:54).
    """
    return (
        ratings.groupBy("productId")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("productId"))
    )


def rate_more_recently_products(
    ratings: DataFrame, period_format: str = "yyyyMM"
) -> DataFrame:
    """Per-(period, product) rating count, recent + popular first (A2).

    Reference: ``changeDate`` UDF to yyyyMM (:73-79) then ``select
    productId, count(productId) as count, yearmonth … group by yearmonth,
    productId order by yearmonth desc, count desc`` (:84-86).

    ``period_format`` defaults to the reference's month granularity; the
    driver's events table spans one month, so callers there use ``yyyyMMdd``.
    The date math is a built-in (no UDF) — it folds into the scan projection.
    """
    period = F.date_format(F.col("ts"), period_format).cast("int").alias("period")
    return (
        ratings.select(period, "productId")
        .groupBy("period", "productId")
        .agg(F.count("*").alias("cnt"))
        .orderBy(
            F.col("period").desc(), F.col("cnt").desc(), F.col("productId")
        )
    )


def average_products(ratings: DataFrame, ndigits: int = 4) -> DataFrame:
    """Per-product mean score (A3).

    Reference: ``select productId, avg(score) as avg from ratings group by
    productId`` (StatisticsRecommender.scala:101).  Rounded via
    ``round_stable`` so results are stable across summation orders and
    engine rounding modes (see functions.compat).
    """
    return (
        ratings.groupBy("productId")
        .agg(round_stable(F.avg("score"), ndigits).alias("avg_score"))
        .orderBy("productId")
    )
