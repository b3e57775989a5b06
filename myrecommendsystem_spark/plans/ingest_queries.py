"""Ingestion queries (SURVEY.md §2.1 S1-S3) — reference-style text parsing.

The reference's first user-visible behavior is DataLoader.scala:38-50:
read ``^``-delimited product lines (7 fields, keep 0,1,4,5,6, trim, split
categories/tags on ``|``) and comma-delimited rating lines.  The driver
testdata has no such files, so a deterministic reference-shaped fixture is
committed in-repo (``fixtures/*.csv``, generated arithmetic — see
FIXTURES.md) and BOTH engines parse the same bytes: Spark through
``io.readers`` (S1/S2/S3), DuckDB through ``read_csv`` with the identical
field-drop/trim/split semantics.  That makes the ingestion path itself
oracle-gated, not just unit-tested.

Array columns (categories/tags) are projected to comma-joined strings in
the gated output — the driver's canonicalizer hashes flat values only;
the array form is covered by tests/test_operators.py.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, functions as F

from myrecommendsystem_spark.io import readers
from myrecommendsystem_spark.plans.registry import register

_FIXTURE_DIR = Path(__file__).resolve().parents[2] / "fixtures"
PRODUCTS_CSV = str(_FIXTURE_DIR / "products_ref.csv")
RATINGS_CSV = str(_FIXTURE_DIR / "ratings_ref.csv")
RATINGS_JSONL = str(_FIXTURE_DIR / "ratings_ref.jsonl")


@register(
    "ingest_products_delimited",
    f"""
SELECT CAST(f0 AS INTEGER) AS productId,
       trim(f1) AS name,
       trim(f4) AS imageUrl,
       array_to_string(regexp_split_to_array(f5, '\\|'), ',') AS categories_csv,
       array_to_string(regexp_split_to_array(f6, '\\|'), ',') AS tags_csv,
       CAST(length(regexp_split_to_array(f5, '\\|')) AS INTEGER) AS n_categories
FROM read_csv('{PRODUCTS_CSV}', delim='^', header=false, auto_detect=false,
              columns={{'f0':'VARCHAR','f1':'VARCHAR','f2':'VARCHAR','f3':'VARCHAR',
                        'f4':'VARCHAR','f5':'VARCHAR','f6':'VARCHAR'}})
ORDER BY productId
""",
    doc="S1+S2: reference ^-delimited product parse (DataLoader.scala:40-43"
    " — 7 fields in, fields 2,3 dropped, name/imageUrl trimmed, categories/"
    "tags |-split); fixture bytes parsed by both engines",
)
def ingest_products_delimited(spark: SparkSession, sf_dir: str) -> DataFrame:
    prods = readers.read_products_delimited(spark, PRODUCTS_CSV)
    return prods.select(
        "productId",
        "name",
        "imageUrl",
        F.array_join("categories", ",").alias("categories_csv"),
        F.array_join("tags", ",").alias("tags_csv"),
        F.size("categories").cast("int").alias("n_categories"),
    ).orderBy("productId")


@register(
    "ingest_ratings_csv",
    f"""
SELECT userId, productId, score, ts_sec
FROM read_csv('{RATINGS_CSV}', delim=',', header=false, auto_detect=false,
              columns={{'userId':'INTEGER','productId':'INTEGER',
                        'score':'DOUBLE','ts_sec':'INTEGER'}})
ORDER BY ts_sec
""",
    doc="S1+S3: reference comma-delimited rating parse with explicit "
    "schema, no inference job (DataLoader.scala:47-50)",
)
def ingest_ratings_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        readers.read_ratings_csv(spark, RATINGS_CSV)
        .withColumnRenamed("timestamp", "ts_sec")
        .orderBy("ts_sec")
    )


@register(
    "ingest_ratings_jsonl",
    f"""
SELECT userId, productId, score, ts_sec,
       CAST(COUNT(*) OVER (PARTITION BY userId) AS BIGINT) AS user_n
FROM read_json('{RATINGS_JSONL}', format='newline_delimited',
               columns={{'userId':'INTEGER','productId':'INTEGER',
                         'score':'DOUBLE','ts_sec':'INTEGER'}})
ORDER BY ts_sec, userId
""",
    doc="JSON-lines ingestion with an explicit schema (no inference scan — "
    "a second full pass at 100 TB) plus a per-user window count proving the "
    "parsed relation composes with downstream operators; both engines parse "
    "the same fixture bytes",
    defer=True,
)
def ingest_ratings_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window, functions as F2

    df = readers.read_jsonl(
        spark,
        RATINGS_JSONL,
        "userId INT, productId INT, score DOUBLE, ts_sec INT",
    )
    w = Window.partitionBy("userId")
    return df.withColumn("user_n", F2.count("*").over(w)).orderBy(
        "ts_sec", "userId"
    )


@register(
    "product_category_counts",
    f"""
SELECT trim(cat) AS category, CAST(COUNT(*) AS BIGINT) AS n_products
FROM (
    SELECT unnest(regexp_split_to_array(f5, '\\|')) AS cat
    FROM read_csv('{PRODUCTS_CSV}', delim='^', header=false, auto_detect=false,
                  columns={{'f0':'VARCHAR','f1':'VARCHAR','f2':'VARCHAR',
                            'f3':'VARCHAR','f4':'VARCHAR','f5':'VARCHAR',
                            'f6':'VARCHAR'}})
)
WHERE length(trim(cat)) > 0
GROUP BY category
ORDER BY n_products DESC, category
""",
    doc="LATERAL-VIEW surface over the reference catalog: explode the "
    "|-split category array (the multi-valued attribute DataLoader "
    "carries) into per-category product counts — explode + hash "
    "aggregate, the array-normalization shape every catalog query needs",
    defer=True,
)
def product_category_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    prods = readers.read_products_delimited(spark, PRODUCTS_CSV)
    return (
        prods.select(F.explode("categories").alias("category"))
        .select(F.trim("category").alias("category"))
        .filter(F.length("category") > 0)
        .groupBy("category")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_products"))
        .orderBy(F.col("n_products").desc(), "category")
    )
