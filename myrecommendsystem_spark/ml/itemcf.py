"""Item-based collaborative-filtering similarity — deterministic, SQL-parity.

The reference's only item-item similarity source is the ALS factor matrix
(OfflineRecommender.scala:92-109), which is iterative and seed-dependent —
fine for recommendations, useless as a DuckDB-oracle subject.  This module
computes the classic item-CF cosine over the raw rating vectors instead:

    sim(i, j) = Σ_u r_ui · r_uj  /  (‖r_i‖₂ · ‖r_j‖₂)

which is exactly expressible in ANSI SQL (self-join on userId + grouped
sums), making the full streaming-recommender cycle oracle-checkable end to
end.  It is also a real capability the reference lacks: item-CF without
training a model.

Scale notes: the userId self-join produces Σ_u n_u² pairs — a power-law
"whale" user with 10⁵ ratings alone yields 10¹⁰ pairs.  ``per_user_cap``
bounds this by pre-compacting each user to their most recent K ratings
(the same recent-K state the streaming job keeps), making pair volume
O(users · K²) and the shuffle key (pid, other_pid) well-distributed.
The cap defaults ON (K=20, matching the reference's Redis recent-K list,
StreamingRecommender.scala:48) — the uncapped exact cosine is an explicit
opt-in via ``per_user_cap=None``, not a scale trap a caller falls into.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from myrecommendsystem_spark.functions.compat import round_stable
from myrecommendsystem_spark.operators.relational import top_k_per_group


DEFAULT_PER_USER_CAP = 20


def corating_similarities(
    ratings: DataFrame,
    threshold: float = 0.6,
    per_user_cap: int | None = DEFAULT_PER_USER_CAP,
) -> DataFrame:
    """Thresholded item-item cosine over co-ratings.

    ``ratings``: (userId, productId, score[, ts]).  Returns both directions
    (pid, other_pid, sim) with pid != other_pid and sim > threshold —
    the same shape OfflineRecommender.scala:99-109 produces from factors.

    ``per_user_cap``: bound each user's contribution to their most recent
    K ratings before pairing (requires a ``ts`` column) — the 100 TB knob.
    Defaults to 20 (the reference's recent-K); pass ``None`` for the exact
    uncapped cosine (Σ_u n_u² pairs — safe only for bounded user activity).
    """
    if per_user_cap is not None:
        ratings = top_k_per_group(
            ratings,
            ["userId"],
            [F.col("ts").desc(), F.col("productId").desc(), F.col("score").desc()],
            per_user_cap,
        ).drop("rnk")

    # Mean-collapse duplicate (user, product) ratings so each user is one
    # coordinate of the item vector and sim is a true cosine in [0, 1].
    r = (
        ratings.select("userId", "productId", "score")
        .groupBy("userId", "productId")
        .agg(F.avg("score").alias("score"))
    )
    norms = r.groupBy("productId").agg(
        F.sqrt(F.sum(F.col("score") * F.col("score"))).alias("norm")
    )

    a = r.select(
        "userId", F.col("productId").alias("pid"), F.col("score").alias("score_a")
    )
    b = r.select(
        "userId",
        F.col("productId").alias("other_pid"),
        F.col("score").alias("score_b"),
    )
    dots = (
        a.join(b, "userId")
        .filter(F.col("pid") != F.col("other_pid"))
        .groupBy("pid", "other_pid")
        .agg(F.sum(F.col("score_a") * F.col("score_b")).alias("dot"))
    )
    sims = (
        dots.join(norms.withColumnRenamed("productId", "pid"), "pid")
        .join(
            norms.select(
                F.col("productId").alias("other_pid"), F.col("norm").alias("norm_b")
            ),
            "other_pid",
        )
        .select(
            "pid",
            "other_pid",
            round_stable(F.col("dot") / (F.col("norm") * F.col("norm_b")), 4).alias(
                "sim"
            ),
        )
    )
    return sims.filter(F.col("sim") > threshold)
