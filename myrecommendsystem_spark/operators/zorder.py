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

Normalization maps each column linearly onto ``2**bits`` buckets between
its observed min/max.  Linear rank is the simple variant — a heavily
skewed column concentrates in few buckets and loses resolution (the
quantile-rank variant costs one extra approxQuantile pass; documented,
not implemented — the layout CONTRACT is the same).
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
    df: DataFrame, cols: Sequence[str], bits: int = 16, out_col: str = "_z"
) -> DataFrame:
    """Append the Morton code of ``cols`` (numeric/timestamp) as ``out_col``.

    Min/max per column ride a 1-row broadcast cross join (never a driver
    collect), the bucket mapping and bit interleave are pure codegen
    expressions.
    """
    nums = [F.col(c).cast("double") for c in cols]
    stats = df.agg(
        *[F.min(n).alias(f"_mn{i}") for i, n in enumerate(nums)],
        *[F.max(n).alias(f"_mx{i}") for i, n in enumerate(nums)],
    )
    top = (1 << bits) - 1
    with_stats = df.crossJoin(F.broadcast(stats))
    scaled = []
    for i, n in enumerate(nums):
        mn, mx = F.col(f"_mn{i}"), F.col(f"_mx{i}")
        span = F.when(mx > mn, mx - mn).otherwise(F.lit(1.0))
        scaled.append(
            F.least(
                F.lit(top),
                F.floor((n - mn) / span * (1 << bits)).cast("long"),
            )
        )
    return with_stats.withColumn(out_col, _interleave(scaled, bits)).drop(
        *[f"_mn{i}" for i in range(len(nums))],
        *[f"_mx{i}" for i in range(len(nums))],
    )


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    num_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` clustered by the Z-order of ``cols``: range-partition
    on the Z-value (globally ordered files), sort within partitions, drop
    the helper column.  Each output file then covers a compact
    hyper-rectangle in ``cols``-space — parquet min/max stats prune scans
    filtering on ANY of the participating columns."""
    z = zorder_value(df, cols, bits)
    (
        z.repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
