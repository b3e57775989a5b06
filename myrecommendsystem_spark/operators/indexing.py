"""Distributed global row numbering — dense ids without a global sort.

The naive spelling, ``row_number() OVER (ORDER BY key)``, range-shuffles
every row into ONE partition: correct, and a guaranteed straggler/OOM at
100 TB.  The distributed formulation is the classic two-pass
partition-offset scheme (what RDD ``zipWithIndex`` does), built here from
DataFrame primitives:

1. ``repartitionByRange`` on the key — partition i holds a contiguous key
   range, partitions globally ordered end-to-end — then
   ``sortWithinPartitions`` (sort, no movement);
2. ``monotonically_increasing_id`` immediately after: its bit layout IS
   (partition_id << 33) | local_row_index, so one codegen expression
   yields both the physical partition and the 0-based position in sorted
   order — no Window, no second full-data shuffle;
3. per-partition counts → running-sum offsets (a P-row relation; its
   single-partition window is over hundreds of rows, not the data) →
   broadcast join back and add.

Total data movement: ONE range shuffle.  The input is persisted so the
offset pass reads the cache instead of replaying the shuffle.

Correctness notes: the final numbering does not depend on where the
range sampler happens to place partition boundaries — offsets compose in
partition order whatever the boundaries are — so the result is
deterministic for any total order.  Callers must pass a UNIQUE key
(tuple); with ties, rows straddling a boundary would order by placement.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F

_LOCAL_BITS = 33  # monotonically_increasing_id: upper bits pid, lower 33 local


def assign_global_row_numbers(
    df: DataFrame,
    order_cols: Sequence[str],
    out_col: str = "row_num",
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a dense 1-based ``out_col`` ordered by ``order_cols`` without
    ever materializing a single global data partition."""
    cols = [F.col(c) for c in order_cols]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *cols)
        .sortWithinPartitions(*cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright(F.col("_mid"), _LOCAL_BITS).cast("int"))
        .withColumn(
            "_local", F.col("_mid").bitwiseAND(F.lit((1 << _LOCAL_BITS) - 1))
        )
        .drop("_mid")
    ).persist()  # offset pass must read this, not replay the range shuffle
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_n").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("_pid", "_offset")
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local") + F.col("_offset") + 1).cast("long"))
        .drop("_pid", "_local")
    )


def running_sums(
    df: DataFrame,
    order_cols: Sequence[str],
    value_cols: Sequence[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Global running totals (``cum_<c>`` per value column) ordered by
    ``order_cols`` — the distributed twin of
    ``SUM(c) OVER (ORDER BY key ROWS UNBOUNDED PRECEDING)``.

    The naive global-ORDER-BY window funnels every row through one
    partition.  Here, as in :func:`assign_global_row_numbers`:

    1. range-partition on the key (partition i holds a contiguous key
       range, globally ordered end-to-end) and tag rows with
       ``spark_partition_id``;
    2. within-partition prefix sums via a window PARTITIONED on the
       physical pid — each window group is one partition's rows, so the
       sort is partition-local and spillable;
    3. per-partition totals → exclusive running offsets (a P-row
       relation) → broadcast back and add.

    Two bounded shuffles (range + pid clustering), never a
    single-partition stage.  ``order_cols`` must be a unique total
    order (same contract as row numbering); prefix sums at ties would
    otherwise depend on placement.
    """
    cols = [F.col(c) for c in order_cols]
    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(parts, *cols)
        .withColumn("_pid", F.spark_partition_id())
        .persist()  # offset pass must not replay the range shuffle
    )
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(*cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = ranged.select(
        "*", *[F.sum(c).over(w_local).alias(f"_local_{c}") for c in value_cols]
    )
    w_off = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("_pid")
        .agg(*[F.sum(c).alias(f"_tot_{c}") for c in value_cols])
        .select(
            "_pid",
            *[
                F.coalesce(F.sum(f"_tot_{c}").over(w_off), F.lit(0)).alias(
                    f"_off_{c}"
                )
                for c in value_cols
            ],
        )
    )
    out = local.join(F.broadcast(offsets), "_pid")
    for c in value_cols:
        out = out.withColumn(
            f"cum_{c}", F.col(f"_local_{c}") + F.col(f"_off_{c}")
        ).drop(f"_local_{c}", f"_off_{c}")
    return out.drop("_pid")
