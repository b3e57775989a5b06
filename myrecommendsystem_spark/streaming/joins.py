"""Stream-stream interval join — engine extension (SURVEY.md §2.9 absent
list: the reference's DStream job never correlates two live streams).

The classic shape is attribution: for each left event (a view), find right
events (purchases) by the same key within a bounded time interval after it.
Structured Streaming supports this as an inner join between two watermarked
streams with a time-range conjunct; the watermark + interval bound is what
lets the join state be EVICTED — without it stream-stream join state grows
forever.  At 100 TB/day the state per executor stays O(events within the
interval horizon per key-range), independent of stream lifetime.

The same function works in batch mode (watermarks are no-ops): the batch
twin is oracle-gated (``plans.streaming_queries.events_view_purchase``)
while the streaming execution is pinned by
tests/test_streaming.py::test_interval_join_streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join ``right`` rows onto ``left`` rows with the same ``key``
    where ``left_ts <= right_ts <= left_ts + upper``.

    Both inputs must already have distinct column names apart from ``key``
    (pre-rename on the caller side).  In streaming mode both sides are
    watermarked so expired state is dropped; in batch mode the exact same
    plan is an equi hash join on ``key`` with the time range as a join
    residual — never a nested loop.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond).drop(rw[key])


def interval_join_outer(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    upper: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Left-outer variant of :func:`interval_join`: every left event is
    emitted; unmatched ones carry NULL right columns.

    The outer semantics are what make the watermark LOAD-BEARING rather
    than just a state-eviction bound: the engine may only emit the
    null-padded row once the watermark proves no future right match can
    arrive, so unmatched results are delayed by the watermark delta.  In
    batch mode the same plan is an ordinary left-outer hash join with the
    interval as residual (nulls emitted immediately).  The attribution
    reading: views that did NOT convert within the window — the
    complement the inner join cannot express.
    """
    # rename the right key instead of relying on lw[key]/rw[key] column
    # provenance: when both sides derive from the same source (the usual
    # self-join attribution shape), attribute-by-DataFrame resolution can
    # silently bind both references to one side — with outer semantics
    # that surfaces as the LEFT key going null on unmatched rows.
    rkey = f"__r_{key}"
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withColumnRenamed(key, rkey).withWatermark(right_ts, watermark)
    cond = (
        (F.col(key) == F.col(rkey))
        & (F.col(right_ts) >= F.col(left_ts))
        & (F.col(right_ts) <= F.col(left_ts) + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, "left_outer").drop(rkey)
