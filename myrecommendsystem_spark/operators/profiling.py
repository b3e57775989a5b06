"""Column profiling — the first pass a pipeline runs over new data.

Per-column row/null/distinct counts plus min/max (as strings, so
heterogeneous column types fit one result schema).  Two execution
strategies, chosen by the distinct-count mode:

- **exact** (``approx_rsd=None``): one aggregation branch per column,
  unioned.  Each branch's scan prunes to a single column, so C branches
  read the same bytes as one all-column pass — and it avoids the EXPAND
  operator a multi-``countDistinct`` aggregate plans, which replicates
  every input row C+1 times (measured 4× slower at sf0.1).
- **approx** (``approx_rsd=0.02``-ish): HLL++ sketches are plain
  aggregates, so ALL columns profile in one single-pass wide aggregation
  — the right default at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def profile_columns(
    df: DataFrame, cols: Sequence[str], approx_rsd: float | None = None
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per column."""
    if approx_rsd is None:
        parts = [
            df.select(F.col(c)).agg(
                F.lit(c).alias("column"),
                F.count(F.lit(1)).alias("n_rows"),
                F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
                .cast("bigint")
                .alias("n_nulls"),
                F.countDistinct(c).cast("bigint").alias("n_distinct"),
                F.min(F.col(c)).cast("string").alias("min_val"),
                F.max(F.col(c)).cast("string").alias("max_val"),
            )
            for c in cols
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__null_{c}"),
            F.approx_count_distinct(c, rsd=approx_rsd).alias(f"__dist_{c}"),
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
