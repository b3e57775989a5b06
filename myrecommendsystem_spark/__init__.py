"""myrecommendsystem_spark — a PySpark-native analytics/recommendation engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference system psy0703/MyRecommendSystem (Scala/Spark 2.1 + MongoDB +
Redis + Kafka).  Everything here is DataFrame / Spark SQL / pyspark.ml /
Structured Streaming:

- storage          : Parquet tables (replaces MongoDB collections)
- batch statistics : Catalyst-optimized groupBy/agg (StatisticsRecommender)
- offline recs     : pyspark.ml ALS + item-factor similarity (OfflineRecommender)
- streaming recs   : Structured Streaming foreachBatch (StreamingRecommender)
- log filtering    : one streaming filter stage (KafkaStreaming module)

Plus LLM-data-pipeline extensions: dedup (exact / MinHash-LSH / SimHash),
similarity search over embeddings, text analysis, multimodal plumbing.
"""

__version__ = "0.1.0"
