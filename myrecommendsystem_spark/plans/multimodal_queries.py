"""Multimodal-column queries — binary payloads + typed metadata.

The media table is synthesized deterministically from ``documents``
(``operators.multimodal.synthesize_media``), so the metadata/pruning
surface is fully oracle-backed — and because the STUB decode is
deterministic byte tiling, the decode-dependent stages (features, frame
sampling) are hash-gated too, in closed form.  Swapping the stub for a
real codec (PIL/libav) returns those two to rows-only; the stub is also
property-tested in tests/test_multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from myrecommendsystem_spark.functions.compat import sql_round_stable
from myrecommendsystem_spark.io import readers
from myrecommendsystem_spark.operators import multimodal
from myrecommendsystem_spark.plans.registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.synthesize_media(
        readers.load_table(spark, sf_dir, "documents")
    )


@register(
    "media_metadata",
    """
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CASE WHEN doc_id % 3 = 0 THEN 'video' ELSE 'image' END AS kind,
       CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
       CAST(doc_id % 48 + 16 AS INTEGER) AS width,
       CAST((doc_id * 7) % 48 + 16 AS INTEGER) AS height,
       CAST(CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END AS INTEGER) AS channels,
       CASE WHEN doc_id % 3 = 0 THEN 'rawv' ELSE 'rawi' END AS format,
       CAST(CASE WHEN doc_id % 3 = 0 THEN doc_id % 8 + 2 ELSE 1 END AS INTEGER)
           AS n_frames
FROM documents
""",
    doc="multimodal metadata surface: binary payload length + typed meta "
    "struct, fully relational — the layer scan-time pruning runs on",
)
def media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir)
    return m.select(
        "media_id",
        "kind",
        F.octet_length("payload").alias("n_bytes"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.channels").alias("channels"),
        F.col("meta.format").alias("format"),
        F.col("meta.n_frames").alias("n_frames"),
    )


@register(
    "media_image_features",
    f"""
WITH m AS (
    -- image rows passing the width >= 32 metadata prune, with the
    -- payload's byte codes (ASCII corpus: chars == bytes)
    SELECT doc_id, length(text) AS L,
           CASE WHEN length(text) = 0 THEN [0]
                ELSE [ord(ch) for ch in regexp_split_to_array(text, '')]
           END AS codes,
           (doc_id % 48 + 16)
             * ((doc_id * 7) % 48 + 16)
             * (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END) AS n
    FROM documents
    WHERE doc_id % 3 != 0 AND (doc_id % 48 + 16) >= 32
),
vals AS (
    -- the stub decode tiles the payload to n pixels: closed form over
    -- full repetitions + the leading remainder slice
    SELECT doc_id, L, n,
           (n // greatest(len(codes), 1)) * list_sum(codes)
             + COALESCE(list_sum(codes[1:(n % greatest(len(codes), 1))]), 0)
               AS s_tiled,
           (n // greatest(len(codes), 1))
               * len(list_filter(codes, x -> x < 16))
             + len(list_filter(codes[1:(n % greatest(len(codes), 1))],
                               x -> x < 16)) AS c_bin0
    FROM m
)
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(L AS INTEGER) AS n_bytes,
       {sql_round_stable('CAST(s_tiled AS DOUBLE) / n', 4)} AS mean_intensity,
       CAST(c_bin0 AS BIGINT) AS hist_bin0,
       CAST(n AS BIGINT) AS hist_total
FROM vals
""",
    doc="decode + feature-extract via mapInPandas (Arrow batches → numpy): "
    "mean intensity + 16-bin histogram; metadata filter (width >= 32) "
    "prunes BEFORE the decode stage.  Upgraded rows-only → hash-gated: "
    "the stub decode is deterministic byte tiling, so the oracle "
    "computes the tiled sum / bin-0 count in closed form (full "
    "repetitions + remainder slice); hist_total == pixel count by "
    "construction.  Swapping the stub for a real codec returns this "
    "query to rows-only — the plumbing contract is what's pinned",
)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir).filter(
        (F.col("kind") == "image") & (F.col("meta.width") >= 32)
    )
    feats = multimodal.image_features(m)
    return feats.select(
        "media_id",
        "n_bytes",
        "mean_intensity",
        F.element_at("histogram", 1).alias("hist_bin0"),
        F.aggregate(
            "histogram", F.lit(0).cast("bigint"), lambda a, x: a + x
        ).alias("hist_total"),
    )


@register(
    "media_frame_sample",
    """
WITH v AS (
    SELECT doc_id, length(text) AS L,
           CASE WHEN length(text) = 0 THEN [0]
                ELSE [ord(ch) for ch in regexp_split_to_array(text, '')]
           END AS codes,
           (doc_id % 48 + 16)
             * ((doc_id * 7) % 48 + 16)
             * (CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 1 END) AS n,
           (doc_id % 8 + 2) AS n_frames
    FROM documents
    WHERE doc_id % 3 = 0
),
s AS (
    SELECT doc_id, n, n_frames,
           (n // greatest(len(codes), 1)) * list_sum(codes)
             + COALESCE(list_sum(codes[1:(n % greatest(len(codes), 1))]), 0)
               AS s_tiled
    FROM v
)
SELECT CAST(doc_id AS BIGINT) AS media_id,
       CAST(fi AS INTEGER) AS frame_idx,
       CAST(s_tiled + fi * n AS BIGINT) AS frame_checksum
FROM s, unnest(range(0, n_frames, 2)) AS t(fi)
""",
    doc="video frame sampling via mapInPandas: every 2nd frame index + "
    "per-frame checksum, exploded one-row-per-frame.  Upgraded "
    "rows-only → hash-gated: the fake per-frame decode is "
    "(tiled + frame_idx) mod 256 — ASCII payload bytes are <= 127 and "
    "frame offsets <= 8, so the mod never wraps and the checksum is "
    "the closed form tiled_sum + frame_idx * n_pixels (documented "
    "corpus assumption, same ASCII family as the RK oracles)",
)
def media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return multimodal.sample_frames(_media(spark, sf_dir), every_k=2)


@register(
    "media_dedup_exact",
    """
SELECT md5(text) AS fp,  -- payload IS the utf-8 text bytes; VARCHAR md5 hashes the same bytes
       CAST(MIN(doc_id) AS BIGINT) AS keep_id,
       CAST(COUNT(*) AS BIGINT) AS dup_cnt,
       CAST(SUM(octet_length(encode(text))) AS BIGINT) AS total_bytes
FROM documents
GROUP BY fp
ORDER BY fp
""",
    doc="binary-payload exact dedup: md5 over the raw media BYTES "
    "(never a decode) grouped to clone sets — keep_id = min media_id "
    "survivor, plus the reclaimable byte volume per group.  The same "
    "one-hash-groupBy discipline as dedup_exact_groups applied to the "
    "multimodal column: at 100 TB only 16-byte digests shuffle, the "
    "payloads never move",
    defer=True,
)
def media_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = _media(spark, sf_dir)
    return (
        media.groupBy(F.md5("payload").alias("fp"))
        .agg(
            F.min("media_id").cast("bigint").alias("keep_id"),
            F.count(F.lit(1)).cast("bigint").alias("dup_cnt"),
            F.sum(F.octet_length("payload")).cast("bigint").alias(
                "total_bytes"
            ),
        )
        .orderBy("fp")
    )
