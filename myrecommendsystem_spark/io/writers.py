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


def compact_files(
    spark: SparkSession,
    src_path: str,
    dest_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Rewrite ``src_path`` into ``dest_path`` with ~``target_file_bytes``
    files; returns the output file count.

    The small-files problem is the silent killer of long-lived ingest
    paths: a streaming sink or per-batch overwrite leaves thousands of
    KB-scale files, and every downstream scan pays one task + one open
    per file.  Compaction = read + ``coalesce(ceil(bytes/target))`` +
    write: coalesce (not repartition) because merging files needs NO
    shuffle — each output task just concatenates input splits.  Sizing
    uses the actual on-disk bytes of the source, not row counts, so the
    target tracks the real scan-side cost.

    Writes to a NEW path: Spark reads lazily, so overwriting the path
    being read loses data — callers swap directories (or table pointers)
    atomically after the rewrite, which is also the crash-safe order.
    """
    import math

    # on-disk size via the JVM filesystem API (works for any hadoop FS)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src_path)
    fs = p.getFileSystem(conf)
    size = fs.getContentSummary(p).getLength()
    n_files = max(1, math.ceil(size / target_file_bytes))

    df = spark.read.format(fmt).load(src_path)
    df.coalesce(n_files).write.mode("overwrite").format(fmt).save(dest_path)

    dest = jvm.org.apache.hadoop.fs.Path(dest_path)
    return sum(
        1
        for f in fs.listStatus(dest)
        if f.getPath().getName().endswith((".parquet", ".orc", ".json", ".csv"))
        or f.getPath().getName().startswith("part-")
    )
