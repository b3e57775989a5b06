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
