"""Deterministic reference-shaped fixtures, generated Spark-side.

FIXTURES.md §2: a miniature ratings/products corpus mirroring the data
model of the reference (~8,923 users × 96 products × 44,852 ratings,
DataLoader resources).  Everything is a pure function of ``spark.range``
ids — no RNG, no driver-side data, so the same fixture materializes
identically at any parallelism and any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def make_ratings(
    spark: SparkSession,
    n_rows: int = 44_852,
    n_users: int = 8_923,
    n_products: int = 96,
    seed: int = 42,
) -> DataFrame:
    """Rating(userId, productId, score, timestamp) — deterministic.

    Mirrors the reference's sample corpus shape (ratings.csv: 44,852 rows,
    8,923 users, 96 products).  Properties FIXTURES.md requires:
    - scores in {0.5 .. 5.0 step 0.5}, skewed high (ref data is 3-5 heavy);
    - timestamps spanning ≥ 24 months (yyyyMM grouping yields many groups);
    - ≥1 user with >20 ratings; duplicate (user, product) pairs; score
      ties — all guaranteed by the modular construction below.
    """
    def idiv(col, d):  # integer division on non-negative columns
        return F.floor(col / F.lit(d)).cast("long")

    df = spark.range(0, n_rows, 1)
    mix = F.abs(F.xxhash64(F.col("id") + F.lit(seed)))
    # Skew users with Zipf-ish folding: low user ids get more rows.
    user = idiv((mix % n_users) * (idiv(mix, 7) % 13), 13)
    product = idiv(mix, n_users) % n_products
    # score in {0.5..5}, skewed toward 3.5-5.
    half_steps = idiv(mix, 31) % 10  # 0..9
    skewed = F.when(half_steps < 3, half_steps + 6).otherwise(half_steps)
    score = (skewed + 1).cast("double") / 2.0
    base_ts = 1_420_070_400  # 2015-01-01
    ts = base_ts + (mix % (3 * 365 * 24 * 3600))  # 3-year span
    return df.select(
        user.cast("int").alias("userId"),
        product.cast("int").alias("productId"),
        score.alias("score"),
        ts.cast("int").alias("timestamp"),
    )


def make_structured_ratings(
    spark: SparkSession,
    n_rows: int = 44_852,
    n_users: int = 8_923,
    n_products: int = 96,
    latent_rank: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Reference-shaped corpus WITH low-rank latent structure.

    ``make_ratings`` scores are hash noise (right for relational-operator
    tests, wrong for model-quality tests — no model can beat the noise
    floor).  Here score = quantized affinity of deterministic rank-4
    user/product factors, so a factorization model genuinely can recover
    it and a hold-out RMSE bound is a meaningful quality gate
    (tests/test_ml.py pins it at the reference's recorded 1.2837,
    ALSTrainer.scala:47).
    """
    df = spark.range(0, n_rows, 1)
    mix = F.abs(F.xxhash64(F.col("id") + F.lit(seed)))
    user = (mix % n_users).cast("int")
    product = F.floor(mix / n_users).cast("long") % n_products

    # deterministic latent factors in [-1, 1]
    affinity = F.lit(0.0)
    for k in range(latent_rank):
        u_k = ((user * (3 + 2 * k) % 7) - 3) / 3.0
        p_k = ((product * (5 + 2 * k) % 7) - 3) / 3.0
        affinity = affinity + u_k * p_k
    raw = 3.0 + 1.5 * affinity / latent_rank
    # quantize to half steps, clip to [0.5, 5.0]
    score = F.least(
        F.greatest(F.round(raw * 2) / 2.0, F.lit(0.5)), F.lit(5.0)
    )
    base_ts = 1_420_070_400
    ts = base_ts + (mix % (3 * 365 * 24 * 3600))
    return df.select(
        user.alias("userId"),
        product.cast("int").alias("productId"),
        score.cast("double").alias("score"),
        ts.cast("int").alias("timestamp"),
    )


def make_products(spark: SparkSession, n_products: int = 96) -> DataFrame:
    """Product(productId, name, imageUrl, categories, tags) — deterministic."""
    df = spark.range(0, n_products, 1)
    pid = F.col("id").cast("int")
    return df.select(
        pid.alias("productId"),
        F.concat(F.lit("product-"), pid).alias("name"),
        F.concat(F.lit("https://img.example/"), pid, F.lit(".jpg")).alias("imageUrl"),
        F.array(
            F.concat(F.lit("cat-"), pid % 7), F.concat(F.lit("cat-"), pid % 3)
        ).alias("categories"),
        F.array(
            F.concat(F.lit("tag-"), pid % 11),
            F.concat(F.lit("tag-"), pid % 5),
            F.concat(F.lit("tag-"), pid % 2),
        ).alias("tags"),
    )
