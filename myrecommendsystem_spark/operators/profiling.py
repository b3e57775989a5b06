"""Column profiling — the first pass a pipeline runs over new data.

One job computes per-column row/null/distinct counts plus min/max (as
strings, so heterogeneous column types fit one result schema).  All
counts ride a single wide aggregation — one scan, one reduce, no
per-column jobs — which is the difference between profiling 100 TB once
and scanning it C times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx_rsd: float | None = None
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per column.

    ``approx_rsd=None`` → exact count-distinct (each one adds an EXPAND
    replication of the input — C distinct columns scan-equivalent to
    C+1×); pass e.g. ``0.02`` to use HLL++ instead, which keeps the whole
    profile a single-pass pipeline — the right default at 100 TB.
    min/max are cast to string for a uniform schema.
    """
    def dist(c):
        if approx_rsd is not None:
            return F.approx_count_distinct(c, rsd=approx_rsd)
        return F.countDistinct(c)

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            dist(c).alias(f"__dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"__min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"__max_{c}"),
        ]
    wide = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__null_{c}").cast("bigint").alias("n_nulls"),
                F.col(f"__dist_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(per_col).alias("p")).select("p.*")
