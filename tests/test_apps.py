"""End-to-end runs of the five reference applications (apps.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from myrecommendsystem_spark import apps
from myrecommendsystem_spark.io import readers

FIXTURES = "/root/repo/fixtures"


def test_data_loader_end_to_end(spark, tmp_path):
    paths = apps.run_data_loader(
        spark,
        f"{FIXTURES}/products_ref.csv",
        f"{FIXTURES}/ratings_ref.csv",
        str(tmp_path),
    )
    products = spark.read.parquet(paths["products"])
    ratings = spark.read.parquet(paths["ratings"])
    assert products.count() > 0
    assert set(products.columns) >= {"productId", "name", "categories", "tags"}
    assert ratings.count() > 0
    assert set(ratings.columns) == {"userId", "productId", "score", "timestamp"}


def test_statistics_end_to_end(spark, tmp_path, sf_dir):
    ratings = readers.events_as_ratings(spark, sf_dir)
    paths = apps.run_statistics(spark, ratings, str(tmp_path))
    rm = spark.read.parquet(paths["rate_more"])
    avg = spark.read.parquet(paths["average"])
    n_products = ratings.select("productId").distinct().count()
    assert rm.count() == n_products
    assert avg.count() == n_products
    # spot-check one product's average against a direct computation
    pid, direct = (
        ratings.groupBy("productId")
        .agg(F.round(F.avg("score"), 4).alias("a"))
        .orderBy("productId")
        .head()
    )
    got = avg.filter(F.col("productId") == pid).head().avg_score
    assert abs(got - direct) < 1e-3


def test_offline_recommender_end_to_end(spark, tmp_path, sf_dir):
    ratings = readers.events_as_ratings(spark, sf_dir)
    # small rank/iter: this test pins the JOB WIRING, not model quality
    paths = apps.run_offline_recommender(
        spark, ratings, str(tmp_path), rank=4, max_iter=2, k=5
    )
    recs = spark.read.parquet(paths["user_recs"])
    sims = spark.read.parquet(paths["product_recs"])
    assert recs.groupBy("userId").count().agg(F.max("count")).head()[0] <= 5
    assert set(recs.columns) == {"userId", "productId", "score", "rnk"}
    # thresholded cosine: similarity values must respect the cut
    if sims.count() > 0:
        assert sims.agg(F.min("sim")).head()[0] > 0.6


def test_als_trainer_reduced_grid(spark, sf_dir):
    ratings = readers.events_as_ratings(spark, sf_dir)
    best, results = apps.run_als_trainer(
        spark, ratings, ranks=(4, 8), regs=(0.1,)
    )
    assert results.count() == 2
    assert best.rank in (4, 8)
