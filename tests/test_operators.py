"""Unit tests for operator edge semantics the reference leaves undefined
(SURVEY.md §5/§7): top-k tie-breaks, log10 default-1 counts, period
formatting, anti-join semantics, recs nesting."""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from myrecommendsystem_spark.operators import relational, stats


def test_top_k_tie_break_deterministic(spark):
    df = spark.createDataFrame(
        [Row(g=1, v=5.0, id=i) for i in range(5)]
        + [Row(g=2, v=1.0, id=9), Row(g=2, v=2.0, id=8)]
    )
    out = relational.top_k_per_group(
        df, ["g"], [F.col("v").desc(), F.col("id")], k=3
    ).collect()
    g1 = sorted((r.id, r.rnk) for r in out if r.g == 1)
    # all v equal in g1 → tie broken by id ascending, deterministic
    assert g1 == [(0, 1), (1, 2), (2, 3)]
    g2 = sorted((r.id, r.rnk) for r in out if r.g == 2)
    assert g2 == [(8, 1), (9, 2)]


def test_priority_formula_default_one_counts(spark):
    """StreamingRecommender.scala:223-229: when one side's count is 0 the
    reference defaults it to 1 ⇒ log10(1)=0 contribution."""
    # only high ratings → decay term must be 0, boost = log10(2)
    df = spark.createDataFrame(
        [
            Row(candidateId=1, sim=0.8, score=4.0),
            Row(candidateId=1, sim=0.5, score=5.0),
        ]
    )
    out = relational.streaming_priority_scores(df).collect()
    expected = (0.8 * 4.0 + 0.5 * 5.0) / 2 + math.log10(2) - 0.0
    assert math.isclose(out[0].priority, round(expected, 4), abs_tol=2e-4)

    # only low ratings → boost 0, decay = log10(2)
    df2 = spark.createDataFrame(
        [
            Row(candidateId=7, sim=1.0, score=2.0),
            Row(candidateId=7, sim=1.0, score=1.0),
        ]
    )
    out2 = relational.streaming_priority_scores(df2).collect()
    expected2 = (2.0 + 1.0) / 2 + 0.0 - math.log10(2)
    assert math.isclose(out2[0].priority, round(expected2, 4), abs_tol=2e-4)


def test_rate_more_recently_period_format(spark):
    df = spark.createDataFrame(
        [
            Row(userId=1, productId=10, score=5.0, ts="2015-03-02 10:00:00"),
            Row(userId=2, productId=10, score=4.0, ts="2015-03-20 10:00:00"),
            Row(userId=3, productId=10, score=4.0, ts="2016-01-01 00:00:00"),
        ]
    ).withColumn("ts", F.to_timestamp("ts"))
    out = stats.rate_more_recently_products(df).collect()
    assert [(r.period, r.productId, r.cnt) for r in out] == [
        (201601, 10, 1),
        (201503, 10, 2),
    ]


def test_collect_recs_orders_and_truncates(spark):
    df = spark.createDataFrame(
        [
            Row(k=1, item=100, s=1.0),
            Row(k=1, item=200, s=3.0),
            Row(k=1, item=300, s=2.0),
            Row(k=1, item=400, s=3.0),  # tie with 200 → higher id first
        ]
    )
    out = relational.collect_recs(df, "k", "item", "s", k=3).collect()[0]
    assert [(r["productId"], r["score"]) for r in out["recs"]] == [
        (400, 3.0),
        (200, 3.0),
        (300, 2.0),
    ]


def test_anti_join_removes_seen(spark):
    left = spark.createDataFrame(
        [Row(userId=1, productId=p) for p in (1, 2, 3)]
    )
    seen = spark.createDataFrame([Row(userId=1, productId=2)])
    out = relational.anti_join(left, seen, ["userId", "productId"]).collect()
    assert sorted(r.productId for r in out) == [1, 3]


def test_read_products_delimited(spark, tmp_path):
    """S1/S2: reference-style ^-delimited product lines (DataLoader.scala:
    40-43) — keep fields 0,1,4,5,6, trim, split categories/tags on |."""
    p = tmp_path / "products.csv"
    p.write_text(
        "1^ widget one ^100|200|300^B000X^http://img/1.jpg^cat1|cat2^tagA|tagB\n"
        "2^gadget^4|5^B000Y^http://img/2.jpg^cat3^tagC\n"
    )
    from myrecommendsystem_spark.io import readers

    rows = {r.productId: r for r in readers.read_products_delimited(
        spark, str(p)
    ).collect()}
    assert rows[1].name == "widget one"
    assert rows[1].imageUrl == "http://img/1.jpg"
    assert rows[1].categories == ["cat1", "cat2"]
    assert rows[2].tags == ["tagC"]


def test_read_ratings_csv(spark, tmp_path):
    """S3: comma-delimited rating lines (DataLoader.scala:47-50)."""
    p = tmp_path / "ratings.csv"
    p.write_text("7,42,4.5,1260759144\n8,43,2.0,1260759145\n")
    from myrecommendsystem_spark.io import readers

    rows = readers.read_ratings_csv(spark, str(p)).collect()
    assert [(r.userId, r.productId, r.score, r.timestamp) for r in rows] == [
        (7, 42, 4.5, 1260759144),
        (8, 43, 2.0, 1260759145),
    ]


def test_approx_distinct_within_tolerance(spark, sf_dir):
    from myrecommendsystem_spark.io import readers
    from myrecommendsystem_spark.plans import registry

    r = readers.events_as_ratings(spark, sf_dir)
    exact = r.select("userId").distinct().count()
    row = registry.all_queries()["approx_distinct_users"](spark, sf_dir).first()
    assert abs(row.approx_users - exact) <= max(0.05 * exact, 2)
    assert row.q50 <= row.q90 <= row.q99  # scalar columns (driver-canon safe)


def test_deterministic_split_disjoint_exhaustive_stable(spark):
    from myrecommendsystem_spark.operators.sampling import (
        sample_fraction,
        train_eval_split,
    )

    df = spark.range(0, 5000).select(F.col("id").alias("k"))
    train, ev = train_eval_split(df, "k", eval_fraction=0.2)
    n_train, n_eval = train.count(), ev.count()
    assert n_train + n_eval == 5000
    assert abs(n_eval - 1000) < 150  # ~20% within sampling noise
    assert train.join(ev, "k", "inner").count() == 0
    # stability: same result on a differently-partitioned input
    ev2 = train_eval_split(df.repartition(17), "k", eval_fraction=0.2)[1]
    assert {r.k for r in ev.collect()} == {r.k for r in ev2.collect()}
    # independent salts decorrelate
    s_a = {r.k for r in sample_fraction(df, "k", 0.2, salt="a").collect()}
    s_b = {r.k for r in sample_fraction(df, "k", 0.2, salt="b").collect()}
    overlap = len(s_a & s_b) / max(len(s_a), 1)
    assert 0.05 < overlap < 0.40  # ≈20% if independent


def test_sample_fraction_boundary_values(spark):
    """fraction >= 1.0 keeps everything, <= 0.0 keeps nothing — the naive
    9-char hex cut for 1.0 silently kept ~6% (lexicographic '100000000'
    vs 8-char hashes)."""
    from myrecommendsystem_spark.operators.sampling import (
        sample_fraction,
        sample_stratified,
        train_eval_split,
    )

    df = spark.range(0, 500).select(F.col("id").alias("k"))
    assert sample_fraction(df, "k", 1.0).count() == 500
    assert sample_fraction(df, "k", 1.5).count() == 500
    assert sample_fraction(df, "k", 0.0).count() == 0
    assert sample_fraction(df, "k", -0.5).count() == 0
    train, ev = train_eval_split(df, "k", eval_fraction=1.0)
    assert train.count() == 0 and ev.count() == 500
    strat = df.withColumn("s", (F.col("k") % 2 == 0).cast("string"))
    kept = sample_stratified(strat, "k", "s", {"true": 1.0, "false": 0.0})
    got = {r.k for r in kept.collect()}
    assert got == {k for k in range(500) if k % 2 == 0}


def test_itemcf_per_user_cap_bounds_pair_volume(spark):
    """The default recent-K cap makes co-rating pair volume O(users·K²):
    a 60-rating whale contributes at most K·(K-1) ordered pairs, not
    60·59.  threshold=-1 keeps every pair so the count IS the volume."""
    from myrecommendsystem_spark.ml.itemcf import corating_similarities

    rows = [(1, p, float(1 + p % 5), p) for p in range(60)]  # whale
    rows += [(2, p, 3.0, p) for p in range(3)]
    df = spark.createDataFrame(rows, "userId int, productId int, score double, ts long")
    k = 5
    capped = corating_similarities(df, threshold=-1.0, per_user_cap=k)
    assert capped.count() <= 2 * k * (k - 1)
    # user 2's products ⊂ whale's, so distinct pairs = whale's 60·59
    uncapped = corating_similarities(df, threshold=-1.0, per_user_cap=None)
    assert uncapped.count() == 60 * 59
