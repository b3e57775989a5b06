"""Round-4d additions: skyline, audience overlap (exact + HLL), PCA.

The oracle-gated queries are covered by test_registry_oracle; here the
non-SQL semantics are pinned: skyline vs brute-force dominance, HLL
estimates vs exact overlap, distributed covariance/PCA vs numpy.
"""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from myrecommendsystem_spark.operators import similarity
from myrecommendsystem_spark.plans.analytics_queries import (
    events_audience_overlap,
    events_audience_overlap_hll,
    parts_skyline,
)


def _brute_skyline(points):
    out = []
    for p, s in points:
        dominated = any(
            (dp <= p and ds >= s and (dp < p or ds > s))
            for dp, ds in points
        )
        if not dominated:
            out.append((p, s))
    return sorted(set(out))


def test_skyline_matches_bruteforce_random(spark):
    rng = np.random.default_rng(7)
    pts = [
        (float(rng.integers(0, 50)), int(rng.integers(0, 20)))
        for _ in range(300)
    ]
    df = spark.createDataFrame(pts, "p_retailprice double, p_size int")
    # Route through the registered builder by faking a table dir: call
    # the two-phase pipeline directly on a temp view instead.
    from myrecommendsystem_spark.plans import analytics_queries as aq

    # monkeypatch-free: rebuild the same plan inline on `df`
    import types

    def fake_t(_spark, _dir, name):
        assert name == "part"
        return df

    orig = aq._t
    aq._t = fake_t
    try:
        got = sorted(
            (float(r["price"]), int(r["size"]))
            for r in parts_skyline(spark, "ignored").collect()
        )
    finally:
        aq._t = orig
    want = [
        (round(p + 1e-7, 2), s) for p, s in _brute_skyline(set(pts))
    ]
    assert got == sorted(want)


def test_skyline_on_testdata_is_mutually_nondominated(spark, sf_dir):
    rows = [
        (float(r["price"]), int(r["size"]))
        for r in parts_skyline(spark, sf_dir).collect()
    ]
    assert rows, "skyline must be non-empty"
    for i, (p1, s1) in enumerate(rows):
        for j, (p2, s2) in enumerate(rows):
            if i != j:
                assert not (
                    p2 <= p1 and s2 >= s1 and (p2 < p1 or s2 > s1)
                )


def test_hll_overlap_tracks_exact(spark, sf_dir):
    exact = {
        (r["type_a"], r["type_b"]): r["n_common"]
        for r in events_audience_overlap(spark, sf_dir).collect()
    }
    est = {
        (r["type_a"], r["type_b"]): r["n_common_est"]
        for r in events_audience_overlap_hll(spark, sf_dir).collect()
    }
    assert set(est) == set(exact)
    for k, e in exact.items():
        # inclusion-exclusion compounds three 2% sketches; allow 15%
        # + small absolute slack for tiny intersections
        assert abs(est[k] - e) <= max(0.15 * e, 10), (k, est[k], e)


def test_pca_covariance_matches_numpy(spark):
    rng = np.random.default_rng(11)
    mat = rng.normal(size=(400, 8)) @ np.diag([5, 4, 3, 2, 1, 0.5, 0.2, 0.1])
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(mat)],
        "vec_id long, embedding array<double>",
    ).repartition(7)
    n, mean, cov = similarity.pca_covariance(df)
    assert n == 400
    np.testing.assert_allclose(mean, mat.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(mat, rowvar=False), atol=1e-9)


def test_pca_spectrum_matches_numpy_eigh(spark):
    rng = np.random.default_rng(13)
    base = rng.normal(size=(300, 6))
    base[:, 0] *= 10.0  # dominant direction → top_dim must be 0
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(base)],
        "vec_id long, embedding array<double>",
    ).repartition(5)
    got = similarity.pca_spectrum(df).orderBy("component").collect()
    evals = np.sort(np.linalg.eigvalsh(np.cov(base, rowvar=False)))[::-1]
    np.testing.assert_allclose(
        [r["eigenvalue"] for r in got], np.round(evals, 6), atol=1e-5
    )
    assert got[0]["top_dim"] == 0
    assert abs(got[-1]["cum_explained"] - 1.0) < 1e-5
    # explained ratios sorted non-increasing
    ratios = [r["explained_var"] for r in got]
    assert ratios == sorted(ratios, reverse=True)


def test_pca_project_reduces_and_centers(spark):
    rng = np.random.default_rng(17)
    mat = rng.normal(size=(200, 5))
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(mat)],
        "vec_id long, embedding array<double>",
    )
    n, mean, cov = similarity.pca_covariance(df)
    evals, evecs = np.linalg.eigh(cov)
    comps = evecs[:, np.argsort(evals)[::-1]][:, :2].T  # k×d
    out = similarity.pca_project(df, comps, mean).select(
        "vec_id", "pca"
    ).collect()
    got = np.array(
        [r["pca"] for r in sorted(out, key=lambda r: r["vec_id"])]
    )
    want = (mat - mat.mean(axis=0)) @ comps.T
    np.testing.assert_allclose(got, want, atol=1e-9)
    assert got.shape == (200, 2)
    np.testing.assert_allclose(got.mean(axis=0), 0.0, atol=1e-9)
