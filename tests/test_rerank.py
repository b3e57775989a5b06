"""MMR diversification laws (ml/rerank.py)."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from myrecommendsystem_spark.ml.rerank import mmr_rerank


def _fixture(spark):
    # user 1: items 10,11 near-identical (sim .95), 12 diverse, 13 filler
    recs = spark.createDataFrame(
        [
            (1, 10, 1.0),
            (1, 11, 0.99),
            (1, 12, 0.8),
            (1, 13, 0.2),
            (2, 20, 0.5),
        ],
        "userId int, productId int, score double",
    )
    sims = spark.createDataFrame(
        [
            (10, 11, 0.95),
            (11, 10, 0.95),
            (10, 12, 0.05),
            (12, 10, 0.05),
            (11, 12, 0.05),
            (12, 11, 0.05),
        ],
        "pid int, other_pid int, sim double",
    )
    return recs, sims


def test_mmr_first_pick_is_pure_relevance_and_diversity_demotes(spark):
    recs, sims = _fixture(spark)
    got = {
        (r["userId"], r["mmr_rank"]): r["productId"]
        for r in mmr_rerank(recs, sims, k=3, lam=0.7).collect()
    }
    assert got[(1, 1)] == 10  # top relevance first, always
    # item 11 (0.99 relevant but ~duplicate of 10) must fall behind the
    # diverse item 12: 0.7*0.99-0.3*0.95=0.408 < 0.7*0.8-0.3*0.05=0.545
    assert got[(1, 2)] == 12
    assert got[(1, 3)] == 11
    assert got[(2, 1)] == 20  # singleton user unaffected


def test_mmr_lambda_one_is_relevance_order(spark):
    recs, sims = _fixture(spark)
    got = [
        r["productId"]
        for r in mmr_rerank(recs, sims, k=4, lam=1.0)
        .filter(F.col("userId") == 1)
        .orderBy("mmr_rank")
        .collect()
    ]
    assert got == [10, 11, 12, 13]


def test_mmr_reduces_intra_list_similarity(spark, sf_dir):
    from myrecommendsystem_spark.plans.streaming_queries import (
        recsys_mmr_rerank,
        stream_recs_batch,
    )

    mmr = recsys_mmr_rerank(spark, sf_dir)
    base = stream_recs_batch(spark, sf_dir)
    # per-user list size law: MMR list is a k-prefix of the candidates
    sizes = mmr.groupBy("userId").count().collect()
    assert all(r["count"] <= 10 for r in sizes)
    base_u = {
        r["userId"]
        for r in base.select("userId").distinct().collect()
    }
    mmr_u = {r["userId"] for r in sizes}
    assert mmr_u == base_u  # every user keeps a list
