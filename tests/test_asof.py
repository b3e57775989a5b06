"""As-of / range join semantics against hand-computed expectations."""

from __future__ import annotations

from pyspark.sql import functions as F

from myrecommendsystem_spark.operators.asof import asof_join, range_join_count


def _ts(s):
    return F.to_timestamp(F.lit(s))


def test_asof_join_strict_takes_latest_prior(spark):
    left = spark.createDataFrame(
        [(1, 100, "a"), (1, 200, "b"), (2, 50, "c")],
        "k int, t long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 90, 9.0), (1, 100, 10.0), (1, 150, 15.0), (3, 10, 1.0)],
        "k int, t long, v double",
    )
    out = {
        (r.k, r.t): (r.asof_ts, r.asof_v)
        for r in asof_join(
            left, right, "k", "t", "t", ["v"], strict=True
        ).collect()
    }
    # strict: the right row at t=100 does NOT serve the left row at t=100
    assert out[(1, 100)] == (90, 9.0)
    assert out[(1, 200)] == (150, 15.0)
    assert out[(2, 50)] == (None, None)  # no right rows for key 2


def test_asof_join_inclusive(spark):
    left = spark.createDataFrame([(1, 100)], "k int, t long")
    right = spark.createDataFrame([(1, 100, 10.0)], "k int, t long, v double")
    row = asof_join(left, right, "k", "t", "t", ["v"], strict=False).first()
    assert (row.asof_ts, row.asof_v) == (100, 10.0)


def test_range_join_count_band(spark):
    probes = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (1, "2024-01-01 12:00:00"),
         (2, "2024-01-01 10:00:00")],
        "k int, t string",
    ).select("k", F.to_timestamp("t").alias("t"))
    events = spark.createDataFrame(
        [(1, "2024-01-01 09:10:00"),   # in band of probe1 (50 min before)
         (1, "2024-01-01 09:59:59"),   # in band (1s before)
         (1, "2024-01-01 10:00:00"),   # NOT in band (not strictly before)
         (1, "2024-01-01 08:59:59"),   # NOT in band (>1h before)
         (1, "2024-01-01 11:30:00")],  # in band of probe at 12:00
        "k int, t string",
    ).select("k", F.to_timestamp("t").alias("t"))
    out = {
        (r.k, str(r.t)): r.n_in_band
        for r in range_join_count(probes, events, "k", "t", "t", 3600).collect()
    }
    assert out[(1, "2024-01-01 10:00:00")] == 2
    assert out[(1, "2024-01-01 12:00:00")] == 1
    assert out[(2, "2024-01-01 10:00:00")] == 0
