"""Canonical schemas — the single source of truth for every table shape.

The reference redeclares its case classes per module (``Rating`` at
DataLoader.scala:106-107 vs ``ProductRating`` at OfflineRecommender.scala:14,
reference root ``/root/reference/recommender/``), which invites drift.  Here
every schema lives in one module and is imported everywhere.

Reference data model (SURVEY.md §1):
- ``Product(productId, name, imageUrl, categories, tags)``  — DataLoader.scala:103-104
- ``Rating(userId, productId, score, timestamp)``           — DataLoader.scala:106-107
- ``Recommendation(productId, score)``                      — OfflineRecommender.scala:18
- ``UserRecs(userId, recs: Seq[Recommendation])``           — OfflineRecommender.scala:20
- ``ProductRecs(productId, recs: Seq[Recommendation])``     — OfflineRecommender.scala:22

``categories``/``tags`` are ``|``-joined strings in the raw data; the
idiomatic engine type is ``array<string>`` (split at the ingest edge).
``timestamp`` is Unix seconds stored as int; a TimestampType view is
derived where date logic needs it (StatisticsRecommender.scala:73-79).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Reference-shaped recommender tables
# ---------------------------------------------------------------------------

PRODUCT = T.StructType(
    [
        T.StructField("productId", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("imageUrl", T.StringType(), True),
        T.StructField("categories", T.ArrayType(T.StringType()), True),
        T.StructField("tags", T.ArrayType(T.StringType()), True),
    ]
)

# Raw 7-field `^`-delimited product line: fields 2 (categoryIds) and 3
# (amazonId) are dropped on load — DataLoader.scala:41-42.
PRODUCT_RAW = T.StructType(
    [
        T.StructField("productId", T.IntegerType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("categoryIds", T.StringType(), True),
        T.StructField("amazonId", T.StringType(), True),
        T.StructField("imageUrl", T.StringType(), True),
        T.StructField("categories", T.StringType(), True),
        T.StructField("tags", T.StringType(), True),
    ]
)

RATING = T.StructType(
    [
        T.StructField("userId", T.IntegerType(), False),
        T.StructField("productId", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
        T.StructField("timestamp", T.IntegerType(), False),
    ]
)

RECOMMENDATION = T.StructType(
    [
        T.StructField("productId", T.IntegerType(), False),
        T.StructField("score", T.DoubleType(), False),
    ]
)

USER_RECS = T.StructType(
    [
        T.StructField("userId", T.IntegerType(), False),
        T.StructField("recs", T.ArrayType(RECOMMENDATION), False),
    ]
)

PRODUCT_RECS = T.StructType(
    [
        T.StructField("productId", T.IntegerType(), False),
        T.StructField("recs", T.ArrayType(RECOMMENDATION), False),
    ]
)

# Kafka-style rating event line: "UID|MID|SCORE|TIMESTAMP"
# (StreamingRecommender.scala:109-113).
RATING_EVENT_LINE = T.StructType([T.StructField("value", T.StringType(), False)])

# ---------------------------------------------------------------------------
# Driver testdata tables (/root/testdata/sf*/ — TESTDATA.md)
# ---------------------------------------------------------------------------

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

EVENT = T.StructType(
    [
        T.StructField("event_id", T.LongType(), False),
        T.StructField("ts", T.TimestampNTZType(), False),
        T.StructField("user_id", T.LongType(), False),
        T.StructField("event_type", T.StringType(), False),
        T.StructField("value", T.DoubleType(), False),
        T.StructField("props", T.StringType(), True),
    ]
)

DOCUMENT = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)

EMBEDDING = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)
