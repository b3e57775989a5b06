"""Offline recommender — ALS + item-item similarity, DataFrame-native.

Re-expresses ``OfflineRecommender.scala`` (reference root
``/root/reference/recommender/OfflineRecommender/src/main/scala/com/ng/offline/``)
without ever leaving Catalyst:

- M1 ALS training (``ALS.train(rank=50, iterations=5, lambda=0.01)``,
  OfflineRecommender.scala:64-68) → ``pyspark.ml.recommendation.ALS``.
- J1+M2+A5: the reference scores the FULL user×product cartesian
  (:71-73) then does groupByKey-sort-take(20) (:75-84).  At 8,923×96
  that is 856k pairs; at real scale it explodes quadratically.  We call
  ``recommendForAllUsers(k)`` instead — MLlib's blocked BLAS top-k, which
  never materializes the cartesian.
- M3+J2+F6+P4+A6: the item-item cosine similarity matrix (:92-109) —
  exact normalized-dot self-join below the ``lsh_threshold`` item count,
  ``BucketedRandomProjectionLSH.approxSimilarityJoin`` above it.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, Normalizer
from pyspark.ml.functions import array_to_vector
from pyspark.ml.recommendation import ALS, ALSModel
from pyspark.sql import DataFrame, functions as F

from myrecommendsystem_spark.operators.relational import collect_recs

USER_MAX_RECOMMENDATION = 20  # OfflineRecommender.scala:32
SIM_THRESHOLD = 0.6  # OfflineRecommender.scala:105


def train_als(
    ratings: DataFrame,
    rank: int = 50,
    max_iter: int = 5,
    reg_param: float = 0.01,
    seed: int = 42,
    num_blocks: int | None = None,
    implicit_prefs: bool = False,
    alpha: float = 1.0,
) -> ALSModel:
    """M1: explicit-feedback ALS with the reference's production config.

    ``implicit_prefs=True`` switches to the implicit-feedback objective
    (Hu/Koren/Volinsky 2008): scores become confidence weights
    ``1 + alpha·r`` over binary preferences instead of values to
    regress — the right mode when the signal is views/clicks rather
    than explicit stars.  Same blocking and cold-start discipline.

    ``coldStartStrategy="drop"`` makes downstream RMSE well-defined on
    hold-out users (the reference's join-based RMSE silently drops
    unmatched pairs too, ALSTrainer.scala:68-72).

    ``num_blocks`` (user AND item blocks): ALS defaults to one block per
    task slot, but block count should track DATA volume, not slot count —
    every one of the 2·maxIter alternations shuffles between all block
    pairs, and on a small relation 32 blocks is pure scheduling/shuffle
    overhead (measured 11.7 s → 1.3 s for the identical 100k-rating fit
    at 32 → 4 blocks on local[32]).  Auto (None): ~125k ratings per
    block, clamped to [4, defaultParallelism] — large inputs still fan
    out to every slot; the sizing count() is one cheap job.
    """
    if num_blocks is None:
        n = ratings.count()
        par = ratings.sparkSession.sparkContext.defaultParallelism
        num_blocks = max(4, min(par, -(-n // 125_000)))
    als = ALS(
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        userCol="userId",
        itemCol="productId",
        ratingCol="score",
        seed=seed,
        coldStartStrategy="drop",
        implicitPrefs=implicit_prefs,
        alpha=alpha,
        numUserBlocks=num_blocks,
        numItemBlocks=num_blocks,
    )
    return als.fit(ratings.select("userId", "productId", "score"))


def user_recs_flat(model: ALSModel, k: int = USER_MAX_RECOMMENDATION) -> DataFrame:
    """Top-k recommendations per user, flat (userId, productId, score, rnk).

    Replaces cartesian+predict+groupByKey-top20
    (OfflineRecommender.scala:71-84) with ``recommendForAllUsers`` —
    blocked matrix multiply with per-block top-k, linear not quadratic
    shuffle volume.  Scores rounded to 4 decimals for stable comparisons.
    """
    recs = model.recommendForAllUsers(k)
    exploded = recs.select(
        "userId", F.posexplode("recommendations").alias("pos", "rec")
    )
    return exploded.select(
        F.col("userId"),
        F.col("rec.productId").alias("productId"),
        F.round(F.col("rec.rating").cast("double"), 4).alias("score"),
        (F.col("pos") + 1).cast("int").alias("rnk"),
    )


def user_recs(model: ALSModel, k: int = USER_MAX_RECOMMENDATION) -> DataFrame:
    """UserRecs shape: (userId, recs array<struct<productId,score>>) —
    the reference's output table (OfflineRecommender.scala:85-90)."""
    flat = user_recs_flat(model, k)
    return collect_recs(flat, "userId", "productId", "score", k=k)


def item_factors_df(model: ALSModel) -> DataFrame:
    """M3: item factor matrix as (productId, features array<double>)."""
    return model.itemFactors.select(
        F.col("id").cast("int").alias("productId"),
        F.col("features").cast("array<double>").alias("features"),
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def item_similarities(
    factors: DataFrame,
    threshold: float = SIM_THRESHOLD,
    method: str = "auto",
    lsh_item_limit: int = 100_000,
    lsh_bucket_length: float = 0.5,
    seed: int = 42,
) -> DataFrame:
    """M7: pairwise cosine similarity over item factors, thresholded.

    ``factors``: (productId int, features array<double>).  Returns both
    directions (pid, other_pid, sim) with pid != other_pid and sim >
    threshold — matching OfflineRecommender.scala:99-109.

    - ``exact``: pre-normalize, then self-join and dot-product with
      built-ins (zip_with/aggregate — JVM-side, codegen).  O(P²): correct
      choice only below ~1e5 items.
    - ``lsh``: BucketedRandomProjectionLSH approx similarity join on the
      normalized vectors; cosine = 1 - d²/2 for unit vectors, so the
      threshold maps to euclidean distance sqrt(2(1-threshold)).
    - ``auto``: exact under ``lsh_item_limit`` items, else LSH — the
      100 TB-safe default.
    """
    norm = F.sqrt(_dot(F.col("features"), F.col("features")))
    unit = factors.select(
        "productId",
        F.transform("features", lambda x: x / norm).alias("unit"),
    )

    if method == "auto":
        method = "exact" if factors.count() <= lsh_item_limit else "lsh"

    if method == "exact":
        a = unit.select(
            F.col("productId").alias("pid"), F.col("unit").alias("ua")
        )
        b = unit.select(
            F.col("productId").alias("other_pid"), F.col("unit").alias("ub")
        )
        pairs = a.crossJoin(b).filter(F.col("pid") != F.col("other_pid"))
        sims = pairs.select(
            "pid",
            "other_pid",
            F.round(_dot(F.col("ua"), F.col("ub")), 4).alias("sim"),
        )
        return sims.filter(F.col("sim") > threshold)

    if method == "lsh":
        vecs = unit.select(
            "productId", array_to_vector(F.col("unit")).alias("vec")
        )
        lsh = BucketedRandomProjectionLSH(
            inputCol="vec",
            outputCol="hashes",
            bucketLength=lsh_bucket_length,
            numHashTables=4,
            seed=seed,
        )
        lsh_model = lsh.fit(vecs)
        dist_threshold = float((2.0 * (1.0 - threshold)) ** 0.5)
        joined = lsh_model.approxSimilarityJoin(
            vecs, vecs, dist_threshold, distCol="dist"
        )
        return (
            joined.select(
                F.col("datasetA.productId").alias("pid"),
                F.col("datasetB.productId").alias("other_pid"),
                F.round(1.0 - F.col("dist") * F.col("dist") / 2.0, 4).alias("sim"),
            )
            .filter(F.col("pid") != F.col("other_pid"))
            .filter(F.col("sim") > threshold)
        )

    raise ValueError(f"unknown method: {method!r}")


def product_recs(sims: DataFrame, k: int | None = None) -> DataFrame:
    """ProductRecs shape: (productId, recs array<struct<productId,score>>).

    The reference keeps ALL sims > 0.6 per product (unbounded A6,
    OfflineRecommender.scala:106-109); pass ``k`` to bound the list —
    the bounded form is what survives at scale.
    """
    flat = sims.select(
        F.col("pid").alias("key"),
        F.col("other_pid").alias("productId"),
        F.col("sim").alias("score"),
    )
    out = collect_recs(flat, "key", "productId", "score", k=k)
    return out.withColumnRenamed("key", "productId")
