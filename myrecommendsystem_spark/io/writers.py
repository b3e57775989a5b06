"""Sinks: overwrite-mode parquet writer (replaces MongoDB collection writes).

The reference's write pattern is drop-collection + full overwrite + create
secondary indexes (DataLoader.scala:74-95, S5/S6 in SURVEY.md §2.1).  In
Parquet-land ``mode("overwrite")`` subsumes the drop, and the indexes map
to partition layout + sort-within-partition (data clustering Catalyst can
prune against), not index structures.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_overwrite(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    sort_by: Sequence[str] | None = None,
    fmt: str = "parquet",
) -> None:
    """Overwrite ``path`` with ``df``; optional partitioning/clustering.

    ``partition_by`` plays the role of the reference's secondary index on
    the key column (DataLoader.scala:93-95): queries filtering on the
    partition column get partition pruning.  ``sort_by`` clusters rows
    within files so min/max parquet stats become selective.

    ``fmt``: ``parquet`` (default) or ``orc`` keep columnar stats +
    pushdown; ``json`` (newline-delimited) and ``csv`` are interchange
    sinks — row-oriented, no stats, strictly for handoff to systems that
    can't read columnar.  Partitioning/sorting applies to all formats.
    """
    if sort_by:
        df = df.sortWithinPartitions(*sort_by)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_by: Sequence[str],
    num_buckets: int = 16,
    sort_by: Sequence[str] | None = None,
) -> None:
    """Save as a bucketed managed table — the co-located-join layout.

    Two tables bucketed the same way on the join key let Catalyst plan a
    sort-merge join with ZERO shuffle exchanges: each bucket pair joins
    locally.  At 100 TB this converts the dominant repeated cost of a
    fact-fact join (re-shuffling both sides per query) into a one-time
    write-side layout decision — the parquet analogue of the reference's
    MongoDB secondary indexes (DataLoader.scala:93-95), but for joins
    instead of point reads.
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_by)
    if sort_by:
        writer = writer.sortBy(*sort_by)
    writer.format("parquet").saveAsTable(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
