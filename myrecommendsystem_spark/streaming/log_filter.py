"""Log-filter stage — the KafkaStreaming module as ONE streaming stage.

Reference: a whole Kafka Streams app (``Application.java`` +
``LogProcess.java``, reference root ``/root/reference/recommender/
KafkaStreaming/src/main/java/com/ng/kafkastreaming/``) exists only to
read topic ``log``, keep lines containing ``PRODUCT_RATING_PREFIX:``,
forward the suffix to topic ``recommender`` (LogProcess.java:17-25).

Here it is three Catalyst expressions on a DataFrame — batch or
streaming identically (apply to ``readStream`` from Kafka/file and write
back out with ``writeStream``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

PRODUCT_RATING_PREFIX = "PRODUCT_RATING_PREFIX:"


def filter_rating_log(
    df: DataFrame, value_col: str = "value", prefix: str = PRODUCT_RATING_PREFIX
) -> DataFrame:
    """Keep rating lines, strip everything up to and incl. the prefix.

    Mirrors LogProcess.java:20-23 (P6: contains → split[1] → trim).
    Output: single ``value`` column holding ``UID|MID|SCORE|TIMESTAMP``.
    """
    col = F.col(value_col)
    return (
        df.filter(col.contains(prefix))
        .select(
            F.trim(F.element_at(F.split(col, F.lit(prefix), 2), 2)).alias("value")
        )
    )
