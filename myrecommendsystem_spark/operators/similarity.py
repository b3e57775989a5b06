"""Similarity search over embedding columns (array<float>).

LLM-data-pipeline extensions (BASELINE.json north star):

- brute-force cosine top-k — the exactness baseline.  Query set broadcast
  against the corpus scan; per-query top-k via window.  O(Q·N) but zero
  shuffle of the corpus: at 100 TB this is the right shape whenever the
  query set is small.
- IVF (inverted file) top-k — KMeans coarse quantizer; corpus partitioned
  by nearest centroid; queries probe only ``nprobe`` nearest cells.  The
  scale path: the corpus join key is the centroid id, so the search
  touches ~nprobe/k of the data.
- embedding near-dup pairs — thresholded cosine self-join (small side) /
  LSH-bucketed at scale via the same IVF assignment.

All vector math is zip_with/aggregate over array<double> — JVM-side.
"""

from __future__ import annotations

from pyspark.ml.clustering import KMeans
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.column import Column

from myrecommendsystem_spark.functions.compat import round_stable


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


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
) -> DataFrame:
    """Embedding near-dup pairs (id_a < id_b, cos ≥ threshold), exact.

    Broadcast-GEMM execution: the unit-normalized corpus (N×d float64 —
    1 MB per 2k vectors at d=64) is broadcast to every task; each
    ``mapInPandas`` partition computes its block of the gram matrix with
    one numpy matmul and emits only the above-threshold pairs.  This is
    the same small-side-broadcast constraint as any broadcast join — the
    expression-tree pairwise dot it replaces evaluated interpreted per
    element and was ~10× slower at 2k vectors (2M pairs).  Past broadcast
    size, route through :func:`near_duplicate_pairs_ivf`.
    """
    import numpy as np
    import pandas as pd

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
    assigned = ivf_assign(df, centroids, id_col, vec_col, nprobe=nprobe)
    a = assigned.withColumnsRenamed({"id": "id_a", "unit": "ua"})
    b = assigned.withColumnsRenamed({"id": "id_b", "unit": "ub"})
    return (
        a.join(b, "cell_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            round_stable(_dot(F.col("ua"), F.col("ub")), 4).alias("cos"),
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
) -> DataFrame:
    """KMeans coarse quantizer → (cell_id, centroid array<double>)."""
    u = as_unit_vectors(df, id_col, vec_col)
    vecs = u.select(array_to_vector(F.col("unit")).alias("features"))
    km = KMeans(k=n_cells, seed=seed, featuresCol="features")
    model = km.fit(vecs)
    spark = df.sparkSession
    rows = [
        (i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())
    ]
    return spark.createDataFrame(rows, "cell_id INT, centroid ARRAY<DOUBLE>")


def ivf_assign(
    df: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """Assign each vector to its ``nprobe`` nearest centroids:
    (id, cell_id, unit) — one row per probed cell.

    Broadcast the (tiny) centroid table, score all cells per row — one
    narrow pass over the corpus, no shuffle.  ``nprobe=1`` is plain IVF
    assignment; >1 is the multi-probe form the near-dup self-join uses.
    """
    u = as_unit_vectors(df, id_col, vec_col)
    cent = F.broadcast(
        centroids.groupBy().agg(
            F.collect_list(F.struct("cell_id", "centroid")).alias("cells")
        )
    )
    ranked = F.slice(
        F.reverse(
            F.array_sort(
                F.transform(
                    F.col("cells"),
                    lambda c: F.struct(
                        _dot(F.col("unit"), c.getField("centroid")).alias("score"),
                        c.getField("cell_id").alias("cell_id"),
                    ),
                )
            )
        ),
        1,
        nprobe,
    )
    return u.crossJoin(cent).select(
        "id",
        "unit",
        F.explode(
            F.transform(ranked, lambda p: p.getField("cell_id"))
        ).alias("cell_id"),
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
    cent = F.broadcast(
        centroids.groupBy().agg(
            F.collect_list(F.struct("cell_id", "centroid")).alias("cells")
        )
    )
    # nprobe nearest cells per query
    q_cells = (
        qu.crossJoin(cent)
        .select(
            "query_id",
            "qu",
            F.slice(
                F.reverse(
                    F.array_sort(
                        F.transform(
                            F.col("cells"),
                            lambda c: F.struct(
                                _dot(F.col("qu"), c.getField("centroid")).alias(
                                    "score"
                                ),
                                c.getField("cell_id").alias("cell_id"),
                            ),
                        )
                    )
                ),
                1,
                nprobe,
            ).alias("probes"),
        )
        .select(
            "query_id",
            "qu",
            F.explode(
                F.transform(F.col("probes"), lambda p: p.getField("cell_id"))
            ).alias("cell_id"),
        )
    )
    scored = (
        assigned.join(F.broadcast(q_cells), "cell_id")
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
