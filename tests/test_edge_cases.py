"""Degenerate-input behavior for the round-2 operators.

Every operator must survive empty inputs, single rows, and collapsed
domains without crashing — at 100 TB a heavily-filtered partition or an
empty delta slice hits these paths constantly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myrecommendsystem_spark.operators import (
    incremental as INC,
    packing,
    sampling,
    skew,
    timeseries,
    zorder,
)
from myrecommendsystem_spark.operators.indexing import assign_global_row_numbers


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, source string, text string")


def test_packing_empty_input(spark):
    assert packing.pack_by_token_budget(_empty_docs(spark)).count() == 0


def test_packing_single_doc(spark):
    df = spark.createDataFrame([(1, "s", "a b c")], "doc_id long, source string, text string")
    row = packing.pack_by_token_budget(df, budget=2).head()
    assert (row.n_tokens, row.end_offset, row.bin_id) == (3, 3, 0)


def test_zorder_single_row_collapsed_domain(spark):
    df = spark.createDataFrame([(5.0, 7.0)], "x double, y double")
    row = zorder.zorder_value(df, ["x", "y"], bits=8).head()
    assert row._z == 0  # both spans collapse; code must not NaN/overflow


def test_row_numbers_empty_and_single(spark):
    empty = spark.createDataFrame([], "k long")
    assert assign_global_row_numbers(empty, ["k"]).count() == 0
    one = spark.createDataFrame([(42,)], "k long")
    assert assign_global_row_numbers(one, ["k"]).head().row_num == 1


def test_resample_single_bucket_key(spark):
    df = spark.createDataFrame(
        [("a", "2024-01-01 10:10:00", 1.0), ("a", "2024-01-01 10:40:00", 2.0)],
        "k string, ts string, v double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = timeseries.resample_ffill(
        df, "k", "ts", F.sum("v"), step="1 hour", out_val="s"
    ).collect()
    assert len(out) == 1  # one bucket, no gaps to fill
    assert out[0].s == 3.0 and out[0].is_gap == 0


def test_kfold_k1_and_determinism(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "u int")
    one = sampling.kfold_assignment(df, "u", k=1)
    assert one.filter(F.col("fold") != 0).count() == 0
    a = sorted((r.u, r.fold) for r in sampling.kfold_assignment(df, "u", k=5).collect())
    b = sorted((r.u, r.fold) for r in sampling.kfold_assignment(df, "u", k=5).collect())
    assert a == b
    assert len({f for _, f in a}) == 5  # 50 keys spread over all folds


def test_weighted_sample_extremes(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "id int")
    assert sampling.sample_weighted(df, "id", F.lit(0.0)).count() == 0
    assert sampling.sample_weighted(df, "id", F.lit(1.5)).count() == 100


def test_two_phase_distinct_empty(spark):
    empty = spark.createDataFrame([], "k int, x int")
    assert skew.count_distinct_two_phase(empty, ["k"], "x").count() == 0


def test_incremental_merge_with_empty_side(spark):
    data = spark.createDataFrame([(1, 2.0), (1, 4.0)], "k int, v double")
    empty = spark.createDataFrame([], "k int, v double")
    merged = INC.merge_states(
        INC.aggregate_state(data, ["k"], "v"),
        INC.aggregate_state(empty, ["k"], "v"),
        ["k"],
    ).head()
    assert (merged.cnt, merged.s, merged.mn, merged.mx) == (2, 6.0, 2.0, 4.0)
