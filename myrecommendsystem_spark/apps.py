"""The reference's five runnable applications, re-expressed as library
entry points.

The reference ships five Spark jobs a user submits independently —
DataLoader, StatisticsRecommender, OfflineRecommender, ALSTrainer,
StreamingRecommender (+ the KafkaStreaming log-filter topology).  A user
switching engines wants those same five verbs, not just the operator
library; each ``run_*`` here composes the already-tested operators into
the corresponding end-to-end job (read → compute → write) and returns the
written output paths.

Sinks are parquet directories (the reference wrote MongoDB collections +
secondary indexes; partition layout plays the index role — see
io/writers.py).  Every function takes an explicit SparkSession and path
arguments: no global state, so the jobs compose in one session or run
isolated, and the driver/cluster submit story is just
``spark-submit -c 'apps.run_statistics(...)``-shaped glue.

Reference provenance: DataLoader.scala:38-95 (parse + write + index),
StatisticsRecommender.scala:54-101 (three stats tables),
OfflineRecommender.scala:66-105 (ALS + user recs + item sims),
ALSTrainer.scala:41-66 (grid search), StreamingRecommender.scala:48-263
and LogProcess.java:20-23 (streaming cycle + log filter).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from myrecommendsystem_spark.io import readers, writers
from myrecommendsystem_spark.ml import als as ALS
from myrecommendsystem_spark.ml.tuner import grid_search_als
from myrecommendsystem_spark.operators import stats


def run_data_loader(
    spark: SparkSession,
    products_path: str,
    ratings_path: str,
    out_dir: str,
) -> dict[str, str]:
    """DataLoader: parse the reference-format inputs, write the base tables.

    Ratings partition by none but sort by userId (the reference's index);
    products are a broadcast-scale dim — one file.
    """
    products = readers.read_products_delimited(spark, products_path)
    ratings = readers.read_ratings_csv(spark, ratings_path)
    paths = {
        "products": f"{out_dir}/products",
        "ratings": f"{out_dir}/ratings",
    }
    writers.write_overwrite(products.coalesce(1), paths["products"])
    writers.write_overwrite(ratings, paths["ratings"], sort_by=["userId"])
    return paths


def run_statistics(
    spark: SparkSession, ratings: DataFrame, out_dir: str
) -> dict[str, str]:
    """StatisticsRecommender: the three popularity tables in one pass
    over a shared cached ratings relation."""
    ratings = ratings.persist()
    paths = {
        "rate_more": f"{out_dir}/rate_more_products",
        "rate_more_recently": f"{out_dir}/rate_more_recently_products",
        "average": f"{out_dir}/average_products",
    }
    writers.write_overwrite(stats.rate_more_products(ratings), paths["rate_more"])
    writers.write_overwrite(
        stats.rate_more_recently_products(ratings), paths["rate_more_recently"]
    )
    writers.write_overwrite(stats.average_products(ratings), paths["average"])
    ratings.unpersist()
    return paths


def run_offline_recommender(
    spark: SparkSession,
    ratings: DataFrame,
    out_dir: str,
    rank: int = 50,
    max_iter: int = 5,
    reg_param: float = 0.01,
    k: int = ALS.USER_MAX_RECOMMENDATION,
    sim_threshold: float = ALS.SIM_THRESHOLD,
) -> dict[str, str]:
    """OfflineRecommender: one ALS fit feeds BOTH outputs (user recs and
    the thresholded item-item cosine matrix) — the reference refits
    nothing either; defaults are its production config."""
    model = ALS.train_als(
        ratings, rank=rank, max_iter=max_iter, reg_param=reg_param
    )
    paths = {
        "user_recs": f"{out_dir}/user_recs",
        "product_recs": f"{out_dir}/product_recs",
    }
    writers.write_overwrite(
        ALS.user_recs_flat(model, k=k), paths["user_recs"], sort_by=["userId"]
    )
    sims = ALS.item_similarities(
        ALS.item_factors_df(model), threshold=sim_threshold
    )
    writers.write_overwrite(sims, paths["product_recs"])
    return paths


def run_als_trainer(
    spark: SparkSession,
    ratings: DataFrame,
    ranks: tuple[int, ...] | None = None,
    regs: tuple[float, ...] | None = None,
):
    """ALSTrainer: hold-out grid search; returns (best_row, results_df).

    Defaults are the reference's full grid (ALSTrainer.scala:55) —
    callers benchmarking at small scale pass a reduced grid.
    """
    kwargs = {}
    if ranks is not None:
        kwargs["ranks"] = ranks
    if regs is not None:
        kwargs["regs"] = regs
    return grid_search_als(ratings, **kwargs)


def run_streaming(
    spark: SparkSession,
    events_stream: DataFrame,
    sim_flat: DataFrame,
    seen_ratings: DataFrame,
    recent_ratings: DataFrame,
    out_path: str,
    checkpoint: str,
    trigger: dict | None = None,
):
    """StreamingRecommender: the foreachBatch micro-batch cycle (see
    streaming/recommender.py for the per-batch plan)."""
    from myrecommendsystem_spark.streaming.recommender import (
        run_streaming_recommender,
    )

    return run_streaming_recommender(
        events_stream,
        sim_flat,
        seen_ratings,
        recent_ratings,
        out_path,
        checkpoint,
        trigger=trigger,
    )
