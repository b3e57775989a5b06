"""Similarity search over embedding columns (array<float>).

LLM-data-pipeline extensions (BASELINE.json north star):

- brute-force cosine top-k — the exactness baseline.  Query set broadcast
  against the corpus scan; per-query top-k via window.  O(Q·N) but zero
  shuffle of the corpus: at 100 TB this is the right shape whenever the
  query set is small.
- IVF (inverted file) top-k — sampled-train coarse quantizer; corpus
  partitioned by nearest centroid; queries probe only ``nprobe`` nearest
  cells.  The scale path: the corpus join key is the centroid id, so the
  search touches ~nprobe/k of the data.
- embedding near-dup pairs — thresholded cosine self-join (small side) /
  IVF-bucketed at scale via the same assignment.

Vector math: the DuckDB-oracle-gated baselines keep ``zip_with`` /
``aggregate`` expressions (semantics frozen — summation order matches
the recorded hashes); the approximate IVF paths use Arrow-batched numpy
kernels (:func:`_pdot`) — higher-order array lambdas are *interpreted*
per element in Spark (never whole-stage-codegen'd), and the measured
difference on 64-dim embeddings is ~5-10× (same finding as the
text-fingerprint kernels, functions/text.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.column import Column

from myrecommendsystem_spark.functions.compat import round_stable


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _pdot(a: Column, b: Column) -> Column:
    """Arrow-batched dot product of two array<double> columns."""

    @pandas_udf("double")
    def _k(xa: pd.Series, xb: pd.Series) -> pd.Series:
        ma = np.array(list(xa), dtype=np.float64)
        mb = np.array(list(xb), dtype=np.float64)
        return pd.Series(np.einsum("ij,ij->i", ma, mb))

    return _k(a, b)


def as_unit_vectors(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(id, unit array<double>) — L2-normalized, double precision."""
    v = F.col(vec_col).cast("array<double>")
    norm = F.sqrt(_dot(v, v))
    return df.select(
        F.col(id_col).alias("id"),
        F.transform(v, lambda x: x / norm).alias("unit"),
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query: (query_id, vec_id, cos, rnk).

    The query side is broadcast — the corpus never shuffles.  Ties broken
    by corpus id for determinism.  Excludes self-matches when a query id
    also appears in the corpus.
    """
    c = as_unit_vectors(corpus, id_col, vec_col).withColumnsRenamed(
        {"id": "vec_id", "unit": "cu"}
    )
    q = as_unit_vectors(queries, id_col, vec_col).withColumnsRenamed(
        {"id": "query_id", "unit": "qu"}
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            round_stable(_dot(F.col("cu"), F.col("qu")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )


def near_duplicate_pairs(
    df: DataFrame,
    threshold: float = 0.35,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "auto",
    exact_row_limit: int = 500_000,
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cos ≥ threshold).

    - ``exact``: broadcast-GEMM — the unit-normalized corpus (N×d float64,
      1 MB per 2k vectors at d=64) is collected once and broadcast to every
      task; each ``mapInPandas`` partition computes its block of the gram
      matrix with one numpy matmul and emits only the above-threshold
      pairs.  Same small-side-broadcast constraint as any broadcast join —
      the expression-tree pairwise dot it replaces evaluated interpreted
      per element and was ~10× slower at 2k vectors (2M pairs).
    - ``ivf``: delegate to :func:`near_duplicate_pairs_ivf` — bucketed
      self-join, corpus never leaves the executors.
    - ``auto`` (default): exact under ``exact_row_limit`` rows
      (500k × d=64 float64 ≈ 256 MB broadcast ceiling), else IVF — the
      same size-gated routing as ``ml.als.item_similarities``, so callers
      never fall into the driver-collect path at scale.
    """
    import numpy as np
    import pandas as pd

    if method == "auto":
        method = "exact" if df.count() <= exact_row_limit else "ivf"
    if method == "ivf":
        return near_duplicate_pairs_ivf(
            df, threshold=threshold, id_col=id_col, vec_col=vec_col
        )

    u = as_unit_vectors(df, id_col, vec_col)
    rows = u.collect()  # corpus side must fit the driver — see docstring
    ids = np.array([r.id for r in rows], dtype=np.int64)
    mat = np.array([r.unit for r in rows], dtype=np.float64)
    spark = df.sparkSession
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    eps = 1e-9

    def block(batches):
        for pdf in batches:
            a_ids = pdf["id"].to_numpy(dtype=np.int64)
            a_mat = np.array(list(pdf["unit"]), dtype=np.float64)
            sims = a_mat @ b_mat.value.T  # (block, N)
            sims = np.round(sims + eps, 4)
            ia, ib = np.nonzero(
                (sims >= threshold) & (a_ids[:, None] < b_ids.value[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": a_ids[ia],
                    "id_b": b_ids.value[ib],
                    "cos": sims[ia, ib],
                }
            )

    return u.mapInPandas(block, "id_a long, id_b long, cos double")


def near_duplicate_pairs_ivf(
    df: DataFrame,
    threshold: float = 0.35,
    n_cells: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Embedding near-dup pairs, IVF-bucketed — the O(N²) escape hatch.

    Vectors are compared only when they share a cell; each vector is
    multi-probed into its ``nprobe`` nearest cells so pairs straddling a
    cell boundary are still found.  Pair volume shrinks
    ~n_cells/nprobe²× on uniform data.  Approximate — recall vs the
    exact join is asserted in tests; same output shape as
    :func:`near_duplicate_pairs` so the two are drop-in comparable.
    """
    centroids = fit_ivf_centroids(df, n_cells, id_col, vec_col, seed)
    # both self-join sides consume the assignment — persist so the
    # normalize+probe Arrow pass runs once, not twice
    assigned = ivf_assign(df, centroids, id_col, vec_col, nprobe=nprobe).persist()
    a = assigned.withColumnsRenamed({"id": "id_a", "unit": "ua"})
    b = assigned.withColumnsRenamed({"id": "id_b", "unit": "ub"})
    return (
        a.join(b, "cell_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            round_stable(_pdot(F.col("ua"), F.col("ub")), 4).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def fit_ivf_centroids(
    df: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_train: int = 100_000,
) -> DataFrame:
    """Coarse quantizer → (cell_id, centroid array<double>).

    Trained the way production IVF indexes train (faiss-style): on a
    BOUNDED deterministic subsample (≤ ``max_train`` rows, hash-keyed so
    the same rows are picked at any parallelism), k-means++ seeded Lloyd
    iterations in numpy on the driver.  The sample cap makes this O(1) in
    corpus size — at 100 TB the quantizer still trains on ≤100k vectors
    while ASSIGNMENT (:func:`ivf_assign`) stays fully distributed.
    Replaces a distributed MLlib KMeans fit that spent ~10 s of job-
    scheduling overhead per bench run on data that fits in one task.
    """
    u = as_unit_vectors(df, id_col, vec_col)
    n = u.count()
    if n > max_train:
        from myrecommendsystem_spark.operators.sampling import sample_fraction

        u = sample_fraction(u, "id", max_train / n, salt="ivf")
    mat = np.array([r.unit for r in u.collect()], dtype=np.float64)

    rng = np.random.RandomState(seed)
    # k-means++ init
    centers = [mat[rng.randint(len(mat))]]
    for _ in range(1, n_cells):
        d2 = np.min(
            [((mat - c) ** 2).sum(axis=1) for c in centers], axis=0
        )
        probs = d2 / d2.sum() if d2.sum() > 0 else None
        centers.append(mat[rng.choice(len(mat), p=probs)])
    cent = np.array(centers)
    for _ in range(20):  # Lloyd
        assign = ((mat[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
        new = np.array(
            [
                mat[assign == c].mean(axis=0) if (assign == c).any() else cent[c]
                for c in range(n_cells)
            ]
        )
        if np.allclose(new, cent, atol=1e-6):
            cent = new
            break
        cent = new

    spark = df.sparkSession
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(cent)]
    return spark.createDataFrame(rows, "cell_id INT, centroid ARRAY<DOUBLE>")


def _probe_cells(centroids: DataFrame, nprobe: int) -> Column:
    """array<int> of the ``nprobe`` nearest cell ids for a ``unit`` column.

    The centroid table is tiny (n_cells × d) and fixed for the query, so
    it rides into the Arrow kernel as a closure matrix — each batch is
    one (B, d) @ (d, C) matmul + argsort, no per-element interpretation
    and no join.  Ties break on cell_id ascending (argsort stability).
    """
    cmat = np.array(
        [r.centroid for r in centroids.orderBy("cell_id").collect()],
        dtype=np.float64,
    ).T  # (d, C)

    @pandas_udf("array<int>")
    def _k(units: pd.Series) -> pd.Series:
        m = np.array(list(units), dtype=np.float64)  # (B, d)
        top = np.argsort(-(m @ cmat), axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(top.astype(np.int32)))

    def col(unit: Column) -> Column:
        return _k(unit)

    return col


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids:
    (id, cell_id, unit) — one row per probed cell.

    One narrow Arrow pass over the corpus (no shuffle, no join): the
    centroid matrix is kernel-closure state, scoring is a batch matmul.
    ``nprobe=1`` is plain IVF assignment; >1 is the multi-probe form the
    near-dup self-join uses.
    """
    u = as_unit_vectors(df, id_col, vec_col)
    probe = _probe_cells(centroids, nprobe)
    return u.select(
        "id", "unit", F.explode(probe(F.col("unit"))).alias("cell_id")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    n_cells: int = 16,
    nprobe: int = 4,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: probe only the nprobe nearest cells.

    (query_id, vec_id, cos, rnk) — same shape as brute_force_topk so the
    two are drop-in comparable (recall measured in tests).
    """
    centroids = fit_ivf_centroids(corpus, n_cells, id_col, vec_col, seed)
    assigned = ivf_assign(corpus, centroids, id_col, vec_col).withColumnsRenamed(
        {"id": "vec_id", "unit": "cu"}
    )

    qu = as_unit_vectors(queries, id_col, vec_col).withColumnsRenamed(
        {"id": "query_id", "unit": "qu"}
    )
    # nprobe nearest cells per query — same Arrow kernel as the corpus side
    probe = _probe_cells(centroids, nprobe)
    q_cells = qu.select(
        "query_id", "qu", F.explode(probe(F.col("qu"))).alias("cell_id")
    )
    scored = (
        assigned.join(F.broadcast(q_cells), "cell_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            round_stable(_pdot(F.col("cu"), F.col("qu")), 4).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )
