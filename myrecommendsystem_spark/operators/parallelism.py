"""Parallelism guard for CPU-bound Arrow kernel stages.

A small parquet input (one row-group under
``spark.sql.files.maxPartitionBytes``) arrives as ONE partition, so any
Pandas-UDF / mapInPandas stage downstream runs on one core no matter how
many the cluster has — measured 6 s single-threaded vs sub-second wide for
the minhash signature kernel over 5k docs on local[32].  Scan partitioning
follows BYTES, but kernel stages are CPU-bound: their ideal partitioning
follows CORES.

``widen_for_kernel`` repartitions UP to the session default parallelism
only when the input has fewer partitions — at 100 TB inputs already carry
thousands of partitions and this is a no-op; locally (and for the tail
stages of heavily-filtered pipelines) it is the difference between using
one core and all of them.  Round-robin repartition: kernel inputs need no
co-location, and Spark sorts before round-robin so the placement is
deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def widen_for_kernel(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to ``min_partitions`` (default: the session's
    ``defaultParallelism``) iff it currently has fewer partitions."""
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
