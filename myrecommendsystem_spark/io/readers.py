"""Sources: parquet tables, reference-style delimited text, event lines.

Replaces the reference's scans (SURVEY.md §2.1):
- S1/S2/S3 text scans + hand parsing (DataLoader.scala:38-50) → schema-ful
  ``spark.read.csv`` with explicit separators; Catalyst gets column pruning
  and predicate pushdown for free.
- S4 MongoDB batch read (StatisticsRecommender.scala:38-44 etc.) →
  ``spark.read.parquet`` over the testdata contract.

All reads declare their schema explicitly — no inference pass over the
data (one less job, and stable types at 100 TB).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from myrecommendsystem_spark import schemas

# Columns written as parquet TIMESTAMP(NANOS) — Spark 4 rejects them unless
# read as raw int64 nanos (spark.sql.legacy.parquet.nanosAsLong); we then
# rebuild a proper timestamp with integer division (no double round-trip —
# nanos-since-epoch exceeds double's 53-bit mantissa).
_NANOS_TS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def ensure_engine_confs(spark: SparkSession) -> None:
    """Apply runtime confs every reader depends on.

    Called from the read path (not only our session factory) so the queries
    behave identically inside the driver's own SparkSession: nanos parquet
    timestamps readable, and a fixed UTC session timezone so date functions
    match the DuckDB oracle's naive-timestamp semantics.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table (TESTDATA.md contract)."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for col in _NANOS_TS_COLS.get(name, ()):
        # Only rebuild when the file actually stores TIMESTAMP(NANOS) (read
        # back as int64 under nanosAsLong).  Newer testdata generations write
        # plain timestamp[us], which arrives as TimestampType already.
        if isinstance(df.schema[col].dataType, T.LongType):
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"`{col}` div 1000"))
            )
    return df


def table_stamp(sf_dir: str, name: str) -> tuple:
    """Cheap change-detection stamp of one testdata table: sorted
    (name, mtime_ns, size) of its files.

    Round-10 ADVICE class: per-process memos keyed on sf_dir alone go
    stale when the data under a reused directory is regenerated
    in-process (tests re-materializing a tmp path, bench rebuilding a
    scale factor) — key them on (sf_dir, table_stamp(...)) instead.
    Remote/object-store paths (no local stat) degrade to a constant, so
    such memos fall back to sf_dir-only keying rather than erroring."""
    p = os.path.join(sf_dir, f"{name}.parquet")
    try:
        if os.path.isdir(p):
            return tuple(
                (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                for e in sorted(os.scandir(p), key=lambda e: e.name)
            )
        st = os.stat(p)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return ("unstattable",)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for spark.sql use."""
    for name in schemas.TESTDATA_TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def events_as_ratings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project the ``events`` table into the reference's Rating shape.

    The reference's core relation is ``Rating(userId, productId, score,
    timestamp)`` (DataLoader.scala:106-107).  The driver testdata has no
    ratings table, so we derive one deterministically from ``events``:
    ``user_id`` is the user key, the integer in ``props`` (JSON ``{"k": N}``,
    N in ~[0,100)) is the product key, ``value`` is the score.  This keeps
    every recommender query runnable at any scale factor.

    The extraction is a plain ``regexp_extract`` (not a UDF) so it stays
    inside whole-stage codegen and matches the DuckDB oracle exactly.
    """
    return (
        load_table(spark, sf_dir, "events")
        .select(
            F.col("user_id").cast("int").alias("userId"),
            F.regexp_extract(F.col("props"), "[0-9]+", 0)
            .cast("int")
            .alias("productId"),
            F.col("value").alias("score"),
            F.col("ts").alias("ts"),
        )
    )


def read_products_delimited(spark: SparkSession, path: str) -> DataFrame:
    """Parse reference-style ``^``-delimited product lines (S2).

    Mirrors DataLoader.scala:40-43: 7 fields in, keep fields 0,1,4,5,6
    (drop categoryIds and amazonId), cast productId to int, trim name.
    ``categories``/``tags`` are further split on ``|`` into arrays — the
    idiomatic type the reference approximates with delimited strings.
    """
    raw = spark.read.csv(path, sep="^", schema=schemas.PRODUCT_RAW)
    return raw.select(
        F.col("productId"),
        F.trim(F.col("name")).alias("name"),
        F.trim(F.col("imageUrl")).alias("imageUrl"),
        F.split(F.col("categories"), r"\|").alias("categories"),
        F.split(F.col("tags"), r"\|").alias("tags"),
    )


def read_ratings_csv(spark: SparkSession, path: str) -> DataFrame:
    """Parse reference-style comma-delimited rating lines (S3).

    Mirrors DataLoader.scala:47-50: ``userId,productId,score,timestamp``
    with explicit schema (no inference job).
    """
    return spark.read.csv(path, sep=",", schema=schemas.RATING)


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType | str
) -> DataFrame:
    """Read newline-delimited JSON with an EXPLICIT schema.

    Schema is mandatory by design: ``spark.read.json`` without one runs a
    full inference pass over the data — an extra scan that at 100 TB costs
    as much as the query itself, and whose inferred types can drift between
    runs (a column that happens to hold only integers today infers long,
    tomorrow double).  Permissive mode keeps corrupt lines as nulls instead
    of failing the scan.
    """
    ensure_engine_confs(spark)
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """Read an ORC file/directory — columnar like parquet, same pushdown.

    ORC carries its schema, so no explicit schema needed; Catalyst gets
    predicate pushdown + column pruning exactly as with parquet (both are
    tested in tests/test_io_formats.py via the round-trip plan check).
    """
    ensure_engine_confs(spark)
    return spark.read.orc(path)


def read_kafka_lines(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Kafka streaming source (S7) — value bytes as a string column.

    Mirrors the reference's direct stream (StreamingRecommender.scala:
    94-107: subscribe + ``auto.offset.reset=latest``).  Compose with
    :func:`read_rating_lines` / ``streaming.filter_rating_log`` for the
    full topology.  Requires the spark-sql-kafka package on the cluster;
    this container has no broker, so the wiring is exercised via the file
    source in tests (same downstream code path — both yield a streaming
    DataFrame with one ``value`` string column).
    """
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
        .select(F.col("value").cast("string").alias("value"))
    )


def read_rating_lines(df: DataFrame, value_col: str = "value") -> DataFrame:
    """Parse ``UID|MID|SCORE|TIMESTAMP`` event lines into typed columns.

    Mirrors StreamingRecommender.scala:109-113 (T2).  Works on both batch
    and streaming DataFrames — one shared parse stage.
    """
    parts = F.split(F.col(value_col), r"\|")
    return df.select(
        parts.getItem(0).cast("int").alias("userId"),
        parts.getItem(1).cast("int").alias("productId"),
        parts.getItem(2).cast("double").alias("score"),
        parts.getItem(3).cast("int").alias("timestamp"),
    )
