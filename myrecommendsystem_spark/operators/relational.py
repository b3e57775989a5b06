"""Relational kernel — the generic operator library (SURVEY.md §2.2/2.3/2.6).

Each helper is a thin, composable wrapper over DataFrame built-ins; nothing
here leaves Catalyst.  The reference implements these shapes imperatively
over RDDs (groupByKey + sortWith + take for top-k, driver-side ``contains``
for anti-membership, ``cartesian`` for cross joins) — every one of those
loses the optimizer; these keep it.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.column import Column

from myrecommendsystem_spark.functions.compat import round_stable


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rnk",
) -> DataFrame:
    """Top-k rows per group via window ``row_number`` (A5/O2).

    Replaces the reference's ``groupByKey → sortWith(_._2 > _._2).take(20)``
    (OfflineRecommender.scala:78-84): the window sort is spillable
    (ExternalSorter) and never materializes a whole group in memory, so a
    single hot key cannot OOM an executor.  Callers must pass a total order
    (include a unique tie-break column) for deterministic results — the
    reference's ``sortWith`` is unstable on ties (SURVEY.md §7).
    """
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def anti_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of ``left`` with no match in ``right`` (P5/J5).

    Replaces the reference's per-event Mongo ``find`` + driver-side
    ``!contains`` filter (StreamingRecommender.scala:175-183) with one
    set-oriented left anti join: Catalyst picks broadcast-anti when the
    right side is small, shuffle otherwise.
    """
    return left.join(right, on=list(on), how="left_anti")


def semi_join(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Rows of ``left`` with at least one match in ``right``."""
    return left.join(right, on=list(on), how="left_semi")


def collect_recs(
    df: DataFrame,
    key_col: str,
    item_col: str,
    score_col: str,
    k: int | None = None,
) -> DataFrame:
    """Nest (item, score) pairs into the reference's recs array shape.

    Produces ``key, recs: array<struct<productId,score>>`` sorted by score
    descending (UserRecs/ProductRecs shape, OfflineRecommender.scala:75-84,
    106-109).  Implemented as ``sort_array(collect_list(struct(...)))`` —
    one aggregation, no second shuffle for the per-group sort.  The struct
    is built score-first so ``sort_array`` orders by score (then item id as
    the deterministic tie-break), then re-projected to (productId, score).
    """
    sortable = F.struct(
        F.col(score_col).alias("score"), F.col(item_col).alias("productId")
    )
    recs = F.reverse(F.sort_array(F.collect_list(sortable)))
    if k is not None:
        recs = F.slice(recs, 1, k)
    recs = F.transform(
        recs,
        lambda r: F.struct(
            r.getField("productId").alias("productId"),
            r.getField("score").alias("score"),
        ),
    )
    return df.groupBy(key_col).agg(recs.alias("recs"))


def streaming_priority_scores(
    candidate_pairs: DataFrame,
    sim_col: str = "sim",
    score_col: str = "score",
    candidate_col: str = "candidateId",
    pivot: float = 3.0,
    group_cols: Sequence[str] = (),
) -> DataFrame:
    """The streaming priority formula as one grouped aggregation (A8).

    Reference (StreamingRecommender.scala:197-231): for each candidate
    product, over the pairs (candidate, user-recent-rating):

        base  = sum(sim * rating) / count(pairs with sim contribution)
        boost = log10(#ratings > 3)      (count defaulting to 1 ⇒ log = 0)
        decay = log10(#ratings <= 3)     (same default)
        priority = base + boost - decay

    The reference computes this in a per-key Scala loop; here it is a single
    ``groupBy().agg()`` with ``when`` counters — map-side partial aggregation
    included.  ``greatest(cnt, 1)`` reproduces the reference's default-1
    count semantics exactly (:223-229, getCountMap default at :250-252).

    ``group_cols`` prepends extra grouping keys (the streaming path groups
    per (userId, candidate)).  Rounding uses the same epsilon-stabilized
    form as the SQL oracle (``functions.compat``) so boundary ties land on
    the same side in both engines.
    """
    gt = F.sum(F.when(F.col(score_col) > pivot, 1).otherwise(0))
    le = F.sum(F.when(F.col(score_col) <= pivot, 1).otherwise(0))
    return candidate_pairs.groupBy(*group_cols, candidate_col).agg(
        round_stable(
            F.avg(F.col(sim_col) * F.col(score_col))
            + F.log10(F.greatest(gt, F.lit(1)))
            - F.log10(F.greatest(le, F.lit(1))),
            4,
        ).alias("priority")
    )


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_col: str,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Keep each key's most recent row (keep-latest dedup / SCD type-1).

    ``row_number`` over (key, order DESC) = 1: one shuffle on the key,
    spillable window, never a per-key collect.  A unique ``tiebreak_col``
    makes equal-timestamp rows deterministic — without it the survivor
    depends on partition placement (same caveat as top_k_per_group).
    """
    order = [F.col(order_col).desc()]
    if tiebreak_col:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
