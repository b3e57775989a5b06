"""Z-order layout: both dimensions must get selective per-file stats.

The measurable contract of the layout (the thing scans actually prune
on) is each file's min/max span per column: under a linear sort only the
leading column is bounded per file; under Z-order EVERY participating
column's per-file span shrinks to ~1/sqrt(files) of its domain.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myrecommendsystem_spark.operators import zorder


def _per_file_spans(spark, path: str, col_a: str, col_b: str):
    df = spark.read.parquet(path).withColumn("_f", F.input_file_name())
    spans = (
        df.groupBy("_f")
        .agg(
            (F.max(col_a) - F.min(col_a)).alias("span_a"),
            (F.max(col_b) - F.min(col_b)).alias("span_b"),
        )
        .agg(F.avg("span_a").alias("a"), F.avg("span_b").alias("b"))
        .head()
    )
    return spans.a, spans.b


def test_zorder_bounds_both_dimensions(spark, tmp_path):
    # uniform 2-D grid: x and y independent, both in [0, 1024)
    df = (
        spark.range(0, 16_384)
        .withColumn("x", (F.col("id") * 7919 % 1024).cast("double"))
        .withColumn("y", (F.col("id") * 104729 % 1024).cast("double"))
    )
    linear = str(tmp_path / "linear")
    zpath = str(tmp_path / "zorder")
    (
        df.repartitionByRange(16, "x")
        .sortWithinPartitions("x")
        .write.mode("overwrite")
        .parquet(linear)
    )
    zorder.write_zordered(df, zpath, ["x", "y"], num_files=16)

    lin_a, lin_b = _per_file_spans(spark, linear, "x", "y")
    z_a, z_b = _per_file_spans(spark, zpath, "x", "y")

    # linear: x tightly bounded, y spans ~the whole domain
    assert lin_a < 150 and lin_b > 900
    # z-order: BOTH dimensions bounded well below the domain — 16 files
    # ≈ 4×4 quadrants → per-file span ~1/4 of the domain
    assert z_a < 450 and z_b < 450, (z_a, z_b)


def test_zorder_value_is_deterministic_and_total(spark):
    df = spark.createDataFrame(
        [(1.0, 8.0), (2.0, 7.0), (1.0, 8.0)], "x double, y double"
    )
    out = zorder.zorder_value(df, ["x", "y"], bits=8)
    vals = [r._z for r in out.collect()]
    assert vals[0] == vals[2]  # same point, same code
    assert len(out.columns) == 3  # helper stats dropped


def test_zorder_constant_column_degrades_gracefully(spark):
    df = spark.createDataFrame([(1.0, float(i)) for i in range(64)], "c double, v double")
    out = zorder.zorder_value(df, ["c", "v"], bits=8)
    # constant column contributes zero bits; codes still strictly ordered by v
    codes = [r._z for r in out.orderBy("v").collect()]
    assert codes == sorted(codes)
    assert len(set(codes)) > 1


def test_histogram_rank_survives_outliers(spark, tmp_path):
    """One outlier stretches the linear range so the real data collapses
    onto a handful of buckets — that dimension stops contributing to the
    curve.  Equal-frequency ranks keep it clustering."""
    df = (
        spark.range(0, 16_384)
        .withColumn("x", (F.col("id") * 7919 % 1000).cast("double"))
        .withColumn("y", (F.col("id") * 104729 % 1000).cast("double"))
    )
    # 16 outliers at 1e9 wreck x's linear range
    df = df.withColumn(
        "x", F.when(F.col("id") % 1024 == 0, 1e9).otherwise(F.col("x"))
    )
    lin = str(tmp_path / "lin")
    hist = str(tmp_path / "hist")
    zorder.write_zordered(df, lin, ["x", "y"], num_files=16, rank_mode="linear")
    zorder.write_zordered(df, hist, ["x", "y"], num_files=16, rank_mode="histogram")

    def normal_x_span(path):
        d = (
            spark.read.parquet(path)
            .filter(F.col("x") < 1e6)  # measure clustering of the real data
            .withColumn("_f", F.input_file_name())
        )
        return (
            d.groupBy("_f")
            .agg((F.max("x") - F.min("x")).alias("s"))
            .agg(F.avg("s"))
            .head()[0]
        )

    lin_span, hist_span = normal_x_span(lin), normal_x_span(hist)
    # linear: normal xs all share bucket 0 → files span ~the whole normal
    # domain; histogram: they spread over the rank space and stay tight
    assert lin_span > 700, lin_span
    assert hist_span < lin_span / 2, (hist_span, lin_span)
