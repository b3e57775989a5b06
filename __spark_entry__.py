"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`myrecommendsystem_spark.plans.registry` — the engine's
central query registry.  The driver's verify runs ``entry(spark)`` as a
smoke check, runs each ``queries()[name]`` at sf=0.01 and compares it
against the matching ``oracle_sql()[name]`` via DuckDB (row-count + schema
+ order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from myrecommendsystem_spark.plans import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: one full streaming-recommender
    micro-batch cycle in batch form — trigger selection, broadcast
    similarity join, seen anti-join, recent-K pairing, priority top-20
    (the whole §2.9 pipeline in one plan)."""
    return registry.all_queries()["stream_recs_batch"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.all_queries()


def oracle_sql() -> dict[str, str]:
    return registry.all_oracle_sql()
