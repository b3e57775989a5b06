"""Time-series regularization — resample to a fixed grid and gap-fill.

Sensor/metric/event streams arrive irregular; models and dashboards want
a dense regular grid.  The distributed formulation:

1. per-key time bounds (one narrow aggregate);
2. the dense grid via ``sequence(lo, hi, step)`` + ``explode`` — grid
   size is (range/step) rows per key, generated JVM-side, never a
   driver loop;
3. left join the observed per-bucket aggregates onto the grid (one
   shuffle on (key, bucket));
4. forward-fill with ``last(value, ignorenulls=True)`` over the keyed
   window — a streaming ROWS frame, spillable, one shuffle shared with
   the join when AQE co-partitions.

Grid explosion is the scale knob: a key spanning years at 1-second step
is (key_range/step) rows — callers choose ``step`` against their span,
the same contract as any resample API.  Everything is Catalyst; no
Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def resample_ffill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    agg_expr,
    step: str = "1 hour",
    out_val: str = "val",
) -> DataFrame:
    """Dense (key, bucket) grid with per-bucket ``agg_expr`` and
    forward-filled gaps.

    Returns columns: key_col, ``bucket`` (timestamp), ``out_val``
    (observed aggregate, NULL where no data landed in the bucket),
    ``{out_val}_ffill`` (last observed carried forward), ``is_gap``.
    Leading buckets before a key's first observation keep NULL fill —
    there is nothing yet to carry.
    """
    bucket = F.date_trunc("hour" if step == "1 hour" else step.split()[1], F.col(ts_col))
    obs = (
        df.withColumn("bucket", bucket)
        .groupBy(key_col, "bucket")
        .agg(agg_expr.alias(out_val))
    )
    bounds = obs.groupBy(key_col).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(F.col("_lo"), F.col("_hi"), F.expr(f"INTERVAL {step}"))
        ).alias("bucket"),
    )
    joined = grid.join(obs, [key_col, "bucket"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key_col,
        "bucket",
        out_val,
        F.last(out_val, ignorenulls=True).over(w).alias(f"{out_val}_ffill"),
        F.col(out_val).isNull().cast("int").alias("is_gap"),
    )
