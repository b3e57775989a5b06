"""Small-file compaction and incremental aggregate maintenance."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from myrecommendsystem_spark.io import writers
from myrecommendsystem_spark.operators import incremental as INC


def test_compact_files_reduces_count_preserves_rows(spark, tmp_path):
    src = str(tmp_path / "small")
    dest = str(tmp_path / "compacted")
    df = spark.range(0, 10_000).withColumn("v", F.col("id") * 2)
    df.repartition(64).write.parquet(src)  # 64 tiny files

    n_out = writers.compact_files(spark, src, dest, target_file_bytes=10**9)
    assert n_out == 1  # everything fits one target-sized file

    back = spark.read.parquet(dest)
    assert back.count() == 10_000
    assert back.agg(F.sum("v")).head()[0] == df.agg(F.sum("v")).head()[0]


def test_compact_files_respects_target_size(spark, tmp_path):
    src = str(tmp_path / "small2")
    dest = str(tmp_path / "compacted2")
    spark.range(0, 50_000).withColumn(
        "pad", F.sha2(F.col("id").cast("string"), 256)
    ).repartition(32).write.parquet(src)

    # pick a target ~1/3 of the source size → expect 3-4 output files
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(src)
    size = p.getFileSystem(conf).getContentSummary(p).getLength()
    n_out = writers.compact_files(
        spark, src, dest, target_file_bytes=max(1, size // 3)
    )
    assert 2 <= n_out <= 4
    assert spark.read.parquet(dest).count() == 50_000


def test_merge_states_equals_full_aggregate(spark):
    rows = [(i % 7, float(i)) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, v double")
    full = {
        r.k: r
        for r in INC.finalize_stats(
            INC.aggregate_state(df, ["k"], "v"), ["k"]
        ).collect()
    }
    a, b = df.filter(F.col("v") < 200), df.filter(F.col("v") >= 200)
    merged = {
        r.k: r
        for r in INC.finalize_stats(
            INC.merge_states(
                INC.aggregate_state(a, ["k"], "v"),
                INC.aggregate_state(b, ["k"], "v"),
                ["k"],
            ),
            ["k"],
        ).collect()
    }
    assert full.keys() == merged.keys()
    for k in full:
        assert full[k].n == merged[k].n
        assert abs(full[k].total - merged[k].total) < 1e-9
        assert full[k].vmin == merged[k].vmin
        assert full[k].vmax == merged[k].vmax


def test_merge_states_keys_on_one_side_only(spark):
    a = spark.createDataFrame([(1, 10.0), (1, 20.0)], "k int, v double")
    b = spark.createDataFrame([(2, 5.0)], "k int, v double")
    out = {
        r.k: r
        for r in INC.merge_states(
            INC.aggregate_state(a, ["k"], "v"),
            INC.aggregate_state(b, ["k"], "v"),
            ["k"],
        ).collect()
    }
    assert out[1].cnt == 2 and out[1].s == 30.0
    assert out[2].cnt == 1 and out[2].mn == 5.0 and out[2].mx == 5.0


def test_hll_union_of_slices_equals_direct(spark, sf_dir):
    """HLL merge must be lossless: estimate(union(per-day sketches)) is
    BIT-EXACT equal to estimate(one sketch over all days) at the same
    precision — the property that makes sketch state maintainable
    incrementally.  Also sanity-bound the estimate against the exact
    distinct count (lgK=12 → ~1.6% rse; assert 5%)."""
    from pyspark.sql import functions as F
    from myrecommendsystem_spark.io import readers

    ev = readers.load_table(spark, sf_dir, "events").select(
        "event_type", F.to_date("ts").alias("day"), "user_id"
    )
    merged = (
        ev.groupBy("event_type", "day")
        .agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = ev.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias("est"),
        F.count_distinct("user_id").alias("exact"),
    )
    m = {r.event_type: r.est for r in merged.collect()}
    d = {r.event_type: (r.est, r.exact) for r in direct.collect()}
    assert m.keys() == d.keys()
    for k in m:
        assert m[k] == d[k][0], f"merge not lossless for {k}"
        assert abs(m[k] - d[k][1]) / d[k][1] < 0.05


from hypothesis import given, settings, strategies as st


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=4),
            st.floats(
                min_value=-1e6,
                max_value=1e6,
                allow_nan=False,
                allow_infinity=False,
            ),
        ),
        min_size=1,
        max_size=60,
    ),
    cut=st.integers(min_value=0, max_value=59),
)
@pytest.mark.slow
def test_merge_states_property(spark, vals, cut):
    """merge(state(A), state(B)) ≡ state(A ∪ B) for ANY split point —
    the monoid law the incremental design rests on, checked on random
    data instead of one fixture."""
    cut = min(cut, len(vals))
    df = spark.createDataFrame(vals, "k int, v double")
    a = spark.createDataFrame(vals[:cut] or [(99, 0.0)], "k int, v double")
    b = spark.createDataFrame(vals[cut:] or [(99, 0.0)], "k int, v double")
    # the sentinel key 99 never appears in real rows (keys ≤ 4)
    full = {
        r.k: r
        for r in INC.aggregate_state(df, ["k"], "v").collect()
    }
    merged = {
        r.k: r
        for r in INC.merge_states(
            INC.aggregate_state(a, ["k"], "v"),
            INC.aggregate_state(b, ["k"], "v"),
            ["k"],
        )
        .filter(F.col("k") != 99)
        .collect()
    }
    assert full.keys() == merged.keys()
    for k in full:
        assert full[k].cnt == merged[k].cnt
        assert full[k].mn == merged[k].mn
        assert full[k].mx == merged[k].mx
        assert abs(full[k].s - merged[k].s) <= 1e-6 * max(1.0, abs(full[k].s))


def test_join_delta_law_and_disjointness(spark):
    """Δ(A⋈B) = (A∪ΔA)⋈(B∪ΔB) − A⋈B, and the three delta terms are
    pairwise disjoint for insert-only deltas (UNION ALL loses nothing)."""
    a_old = spark.createDataFrame(
        [(1, "a1"), (2, "a2"), (3, "a3")], "k int, av string"
    )
    a_delta = spark.createDataFrame([(2, "a4"), (4, "a5")], "k int, av string")
    b_old = spark.createDataFrame([(1, "b1"), (2, "b2")], "k int, bv string")
    b_delta = spark.createDataFrame(
        [(2, "b3"), (3, "b4"), (4, "b5")], "k int, bv string"
    )

    delta = INC.join_delta(a_old, a_delta, b_old, b_delta, ["k"])
    full = a_old.unionByName(a_delta).join(
        b_old.unionByName(b_delta), ["k"]
    )
    old = a_old.join(b_old, ["k"])

    expected = {tuple(r) for r in full.collect()} - {
        tuple(r) for r in old.collect()
    }
    got = [tuple(r) for r in delta.collect()]
    assert set(got) == expected
    assert len(got) == len(set(got))  # disjoint terms → no duplicates

    view = INC.maintain_join_view(
        old, a_old, a_delta, b_old, b_delta, ["k"]
    )
    assert {tuple(r) for r in view.collect()} == {
        tuple(r) for r in full.collect()
    }
    assert view.count() == full.count()


def test_running_sums_matches_global_window(spark):
    from myrecommendsystem_spark.operators.indexing import running_sums
    from pyspark.sql import Window

    df = spark.range(0, 3000).select(
        (F.hash("id") % 1000).alias("k"),
        (F.col("id") % 7).cast("double").alias("x"),
        (F.col("id") % 3).alias("y"),
        "id",
    )
    got = running_sums(df, ["k", "id"], ["x", "y"])
    w = Window.orderBy("k", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = df.select(
        "id", F.sum("x").over(w).alias("cum_x"), F.sum("y").over(w).alias("cum_y")
    )
    a = {r["id"]: (r["cum_x"], r["cum_y"]) for r in got.collect()}
    b = {r["id"]: (r["cum_x"], r["cum_y"]) for r in want.collect()}
    assert a == b
