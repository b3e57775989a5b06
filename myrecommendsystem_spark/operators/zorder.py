"""Z-order (Morton) clustering — multi-dimensional data layout for pruning.

A table sorted on one column gives selective parquet min/max stats on
THAT column only; filters on a second dimension still scan every file.
Interleaving the bits of two (or more) normalized column ranks produces a
space-filling curve: sorting by the Z-value clusters rows that are close
in EVERY dimension, so each file covers a small hyper-rectangle and
min/max stats prune on all participating columns at once.  This is the
layout trick behind Delta/Iceberg ``OPTIMIZE ZORDER BY`` — here built
from plain Catalyst bit expressions, so it works on any Spark and the
whole computation is codegen (no UDF anywhere).

Scale shape: one pass to collect per-column min/max (a 1-row broadcast),
one range shuffle on the Z-value, sort-within-partitions, write.  Cost is
identical to a linear sort-by-write; the payoff is multi-dim pruning on
every subsequent scan.

Normalization maps each column onto ``2**bits`` buckets two ways:

- ``rank_mode="linear"``: linear between observed min/max.  Cheapest, but
  a single outlier stretches the range and collapses the real data onto
  a handful of buckets — that column then contributes nothing to the
  curve and its pruning silently disappears.
- ``rank_mode="histogram"``: equal-frequency remap.  Each column first
  maps to a fine linear micro-histogram (codegen ``width_bucket``), a
  tiny per-column aggregate (M rows, not N) computes cumulative
  frequencies, and the micro-bucket → rank map broadcasts back.  Rank is
  then (approximate) percentile — outliers own one bucket instead of the
  whole range.  Cost: one extra M-row aggregate + broadcast join per
  column, all still codegen; this is the same two-level trick as any
  equi-depth histogram build.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.column import Column


def _interleave(scaled: Sequence[Column], bits: int) -> Column:
    """Morton-interleave ``len(scaled)`` bucket ids of ``bits`` bits each."""
    d = len(scaled)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, col in enumerate(scaled):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * d + j))
    return z


def zorder_value(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    out_col: str = "_z",
    rank_mode: str = "linear",
    micro_buckets: int = 1 << 14,
) -> DataFrame:
    """Append the Morton code of ``cols`` (numeric/timestamp) as ``out_col``.

    Min/max per column ride a 1-row broadcast cross join (never a driver
    collect), the bucket mapping and bit interleave are pure codegen
    expressions.  ``rank_mode="histogram"`` inserts the equal-frequency
    remap (see module docstring).
    """
    nums = [F.col(c).cast("double") for c in cols]
    stats = df.agg(
        *[F.min(n).alias(f"_mn{i}") for i, n in enumerate(nums)],
        *[F.max(n).alias(f"_mx{i}") for i, n in enumerate(nums)],
    )
    top = (1 << bits) - 1
    out = df.crossJoin(F.broadcast(stats))
    scaled: list[Column] = []
    if rank_mode == "linear":
        for i, n in enumerate(nums):
            mn, mx = F.col(f"_mn{i}"), F.col(f"_mx{i}")
            span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
            scaled.append(
                F.least(
                    F.lit(top),
                    F.floor((n - mn) / span * (1 << bits)).cast("long"),
                )
            )
    elif rank_mode == "histogram":
        from pyspark.sql import Window

        n_rows = F.lit(df.count())
        for i, n in enumerate(nums):
            # LOG-compressed first level: a linear micro-histogram dies the
            # same outlier death as linear ranks (one 1e9 value maps every
            # real row into micro-bucket 1).  signed log1p spreads
            # multiplicative ranges; the frequency remap below then makes
            # the final rank equal-depth regardless of the transform.
            t = F.signum(n) * F.log1p(F.abs(n))
            mn, mx = (
                F.signum(F.col(f"_mn{i}")) * F.log1p(F.abs(F.col(f"_mn{i}"))),
                F.signum(F.col(f"_mx{i}")) * F.log1p(F.abs(F.col(f"_mx{i}"))),
            )
            micro = F.width_bucket(t, mn, mx + F.lit(1e-9), F.lit(micro_buckets))
            out = out.withColumn(f"_mb{i}", micro)
            # M-row relation: micro bucket → cumulative-start percentile rank.
            # The single-partition running sum is over ≤M tiny rows.
            hist = (
                out.groupBy(f"_mb{i}")
                .agg(F.count(F.lit(1)).alias("_n"))
                .withColumn(
                    "_cum",
                    F.coalesce(
                        F.sum("_n").over(
                            Window.orderBy(f"_mb{i}").rowsBetween(
                                Window.unboundedPreceding, -1
                            )
                        ),
                        F.lit(0),
                    ),
                )
                .select(
                    f"_mb{i}",
                    F.least(
                        F.lit(top),
                        F.floor(F.col("_cum") / n_rows * (1 << bits)).cast(
                            "long"
                        ),
                    ).alias(f"_rk{i}"),
                )
            )
            out = out.join(F.broadcast(hist), f"_mb{i}")
            scaled.append(F.col(f"_rk{i}"))
    else:
        raise ValueError(f"unknown rank_mode: {rank_mode!r}")
    helper = [f"_mn{i}" for i in range(len(nums))] + [
        f"_mx{i}" for i in range(len(nums))
    ]
    if rank_mode == "histogram":
        helper += [f"_mb{i}" for i in range(len(nums))] + [
            f"_rk{i}" for i in range(len(nums))
        ]
    return out.withColumn(out_col, _interleave(scaled, bits)).drop(*helper)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 8,
    bits: int = 16,
    rank_mode: str = "linear",
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols``: range-partition
    on the Z-value (globally ordered files), sort within partitions, drop
    the helper column.  Each output file then covers a compact
    hyper-rectangle in ``cols``-space — parquet min/max stats prune scans
    filtering on ANY of the participating columns."""
    z = zorder_value(df, cols, bits, rank_mode=rank_mode)
    (
        z.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
