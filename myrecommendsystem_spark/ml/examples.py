"""Training-example generation from interaction logs.

The step between the raw ratings/events tables and model training: turn
each user's chronological interaction stream into supervised
(history → next item) examples — the sample format sequential
recommenders and next-item prediction models consume (the natural
continuation of the reference's ratings pipeline,
``OfflineRecommender.scala`` trains directly on raw triples).

Scale shape: ONE shuffle on ``userId`` serves the ordering window; the
history is a bounded ROWS frame (``history_k`` preceding rows), so state
per row is O(k) and nothing materializes a per-user full history.  The
history column is emitted as a CSV STRING, not an array — flat schemas
survive every downstream consumer (and the driver's canonicalizer, which
cannot sort array cells).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def next_item_examples(
    ratings: DataFrame,
    history_k: int = 5,
    user_col: str = "userId",
    item_col: str = "productId",
    ts_col: str = "ts",
    score_col: str = "score",
) -> DataFrame:
    """(userId, history, label, ts_sec): for every interaction with at
    least one predecessor, the ≤ ``history_k`` immediately-preceding item
    ids (chronological, comma-joined) and the interacted item as label.

    Total order within a user is (ts, item, score) so ties resolve
    identically on any engine/partitioning; ``collect_list`` over an
    ordered ROWS frame preserves frame order.  First interactions (empty
    history) are dropped — a sequential model has nothing to condition
    on.
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, item_col, score_col)
        .rowsBetween(-history_k, -1)
    )
    return (
        ratings.select(
            F.col(user_col),
            F.concat_ws(",", F.collect_list(item_col).over(w)).alias("history"),
            F.col(item_col).alias("label"),
            F.floor(F.unix_timestamp(ts_col)).cast("bigint").alias("ts_sec"),
        )
        .filter(F.length("history") > 0)
    )


def session_next_item_examples(
    ratings: DataFrame,
    history_k: int = 5,
    gap_minutes: int = 30,
    user_col: str = "userId",
    item_col: str = "productId",
    ts_col: str = "ts",
    score_col: str = "score",
) -> DataFrame:
    """Session-scoped (userId, session_id, history, label) examples:
    like :func:`next_item_examples` but history never crosses a session
    boundary (> ``gap_minutes`` of inactivity starts a new session) —
    the shape session-based recommenders train on, where yesterday's
    browsing must not condition today's prediction.

    Session ids come from the classic gap-flag running sum (the same
    composition the batch sessionization oracle uses); both windows
    share one userId shuffle — Catalyst reuses the partitioning for the
    (userId, session_id) history window since it is a prefix-compatible
    key.
    """
    order = [F.col(ts_col), F.col(item_col), F.col(score_col)]
    wu = Window.partitionBy(user_col).orderBy(*order)
    gap = F.unix_timestamp(ts_col) - F.unix_timestamp(F.lag(ts_col).over(wu))
    new_s = F.when(
        gap.isNull() | (gap > gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    with_sid = ratings.withColumn(
        "session_id",
        F.sum(new_s)
        .over(wu.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int"),
    )
    ws = (
        Window.partitionBy(user_col, "session_id")
        .orderBy(*order)
        .rowsBetween(-history_k, -1)
    )
    return (
        with_sid.select(
            F.col(user_col),
            "session_id",
            F.concat_ws(",", F.collect_list(item_col).over(ws)).alias(
                "history"
            ),
            F.col(item_col).alias("label"),
        )
        .filter(F.length("history") > 0)
    )
