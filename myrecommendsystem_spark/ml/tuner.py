"""ALS hyperparameter tuning — the ALSTrainer module, pipeline-native.

Reference: ``ALSTrainer.scala`` (reference root
``/root/reference/recommender/OfflineRecommender/src/main/scala/com/ng/offline/``):
80/20 random split (:41-43), grid rank ∈ {100,200,250} × λ ∈
{1,0.1,0.01,0.001} at iter=5 (:55), hand-rolled RMSE via join on
(userId, productId) + mean squared error + sqrt (:65-79), winner printed
(:62; recorded best (250, 0.01, RMSE 1.2837) at :47).

Here: ``TrainValidationSplit`` + ``RegressionEvaluator("rmse")`` — the
same protocol, but the evaluation join and metric run inside Catalyst and
each grid point is an independent fit Spark can schedule.
"""

from __future__ import annotations

from pyspark.ml.evaluation import RegressionEvaluator
from pyspark.ml.recommendation import ALS
from pyspark.ml.tuning import ParamGridBuilder, TrainValidationSplit
from pyspark.sql import DataFrame, Row

REFERENCE_GRID_RANKS = (100, 200, 250)  # ALSTrainer.scala:55
REFERENCE_GRID_REGS = (1.0, 0.1, 0.01, 0.001)


def grid_search_als(
    ratings: DataFrame,
    ranks: tuple[int, ...] = REFERENCE_GRID_RANKS,
    regs: tuple[float, ...] = REFERENCE_GRID_REGS,
    max_iter: int = 5,
    train_ratio: float = 0.8,
    seed: int = 42,
) -> tuple[Row, DataFrame]:
    """M4-M6: grid-search ALS by hold-out RMSE.

    Returns (best_row, results_df) where results_df is one row per grid
    point ``(rank, reg_param, rmse)`` sorted ascending by rmse — the
    DataFrame form of the reference's driver-side ``result.sortBy(_._3)``
    (ALSTrainer.scala:61-62).
    """
    # block count tracks data volume, not slot count — same sizing (and
    # rationale) as ml.als.train_als; with parallelism=4 grid fits running
    # concurrently the per-fit overhead multiplies, so this matters MORE
    # here than in the single-fit path.
    n = ratings.count()
    par = ratings.sparkSession.sparkContext.defaultParallelism
    blocks = max(4, min(par, -(-n // 125_000)))
    als = ALS(
        userCol="userId",
        itemCol="productId",
        ratingCol="score",
        maxIter=max_iter,
        seed=seed,
        coldStartStrategy="drop",
        numUserBlocks=blocks,
        numItemBlocks=blocks,
    )
    grid = (
        ParamGridBuilder()
        .addGrid(als.rank, list(ranks))
        .addGrid(als.regParam, list(regs))
        .build()
    )
    evaluator = RegressionEvaluator(
        metricName="rmse", labelCol="score", predictionCol="prediction"
    )
    tvs = TrainValidationSplit(
        estimator=als,
        estimatorParamMaps=grid,
        evaluator=evaluator,
        trainRatio=train_ratio,
        seed=seed,
        # Grid points are independent fits; running them serially leaves
        # the cluster idle between stages.  4 concurrent fits ~halves the
        # registry query's wall time on local[32] with identical metrics.
        parallelism=4,
    )
    model = tvs.fit(ratings.select("userId", "productId", "score"))

    spark = ratings.sparkSession
    rows = [
        Row(
            rank=pm[als.rank],
            reg_param=pm[als.regParam],
            rmse=float(metric),
        )
        for pm, metric in zip(grid, model.validationMetrics)
    ]
    results = spark.createDataFrame(rows).orderBy("rmse")
    best = results.first()
    return best, results
