"""Parity pins for the lazy ANN oracles (round 8).

The quantized/coarse-ANN and RAG oracles inline constants TRAINED by the
oracle generator outside Spark (plans/ann_oracles.py).  The whole scheme
rests on three equalities that a refactor on either side could silently
break long before a driver replay catches it — each is pinned here
bit-exactly:

1. the generator's training matrix equals the Spark fits' collected one;
2. the shared numpy fit functions therefore produce identical
   codebooks/centroids from both entry points;
3. the generator's local chunk+embed recomputation equals the Spark RAG
   pipeline's rows (same pure kernels, same values);
plus the pure-Python sampling twin equals sampling.sample_fraction —
the n > max_train path no small-SF replay ever exercises.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from myrecommendsystem_spark.plans import ann_oracles

SF = "/root/testdata/sf0.001"


def _spark_training_matrix(spark, sf_dir):
    """The exact collect path fit_ivf_centroids / fit_pq_codebooks run
    (below the max_train cap): all rows ordered by id, float64, unit."""
    from myrecommendsystem_spark.io import readers

    emb = readers.load_table(spark, sf_dir, "embeddings")
    rows = (
        emb.select(F.col("vec_id").alias("id"), F.col("embedding").alias("vec"))
        .orderBy("id")
        .collect()
    )
    mat = np.array([r.vec for r in rows], dtype=np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    return mat


def test_local_training_matrix_matches_spark_collect(spark):
    spark_mat = _spark_training_matrix(spark, SF)
    _, local_mat = ann_oracles._unit_matrix(SF)
    assert spark_mat.shape == local_mat.shape
    assert (spark_mat == local_mat).all()  # bit-exact, not allclose


def test_quantizer_fits_identical_from_both_entry_points(spark):
    from myrecommendsystem_spark.io import readers
    from myrecommendsystem_spark.operators import similarity

    emb = readers.load_table(spark, SF, "embeddings")
    spark_books = similarity.fit_pq_codebooks(emb, m=8, k=16, seed=42)
    local_books = similarity.pq_fit_mat(
        ann_oracles._train_matrix(SF, "pq"), m=8, k=16, seed=42
    )
    assert (spark_books == local_books).all()
    spark_cents = similarity.fit_ivf_centroids(emb, n_cells=16, seed=42)
    local_cents = similarity.kmeans_fit_mat(
        ann_oracles._train_matrix(SF, "ivf"), n_cells=16, seed=42
    )
    assert (spark_cents == local_cents).all()


def test_rag_local_chunk_embeddings_match_spark_pipeline(spark):
    from myrecommendsystem_spark.functions import text as TXT
    from myrecommendsystem_spark.io import readers

    docs = readers.load_table(spark, SF, "documents")
    chunks = TXT.content_defined_chunks(docs).select(
        (F.col("id") * 10_000 + F.col("chunk_idx")).alias("vec_id"),
        TXT.hashing_embedding(F.col("chunk")).alias("embedding"),
    )
    spark_rows = {
        int(r.vec_id): list(r.embedding) for r in chunks.collect()
    }

    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    local_rows = {}
    for did, txt in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        data = (txt or "").encode("utf-8")
        cuts = TXT.cdc_cut_points(data)
        for ci in range(len(cuts) - 1):
            chunk = data[cuts[ci] : cuts[ci + 1]].decode("utf-8", "ignore")
            local_rows[did * 10_000 + ci] = TXT.hash_embed_one(chunk)
    assert set(spark_rows) == set(local_rows)
    for k in spark_rows:
        assert spark_rows[k] == local_rows[k], k  # bit-exact float32 rows


def test_sampling_twin_matches_spark_membership(spark):
    """The generator's _sample_ids must pick EXACTLY the rows
    sampling.sample_fraction keeps — the n > max_train fit path that
    small-SF replays never exercise (fit caps at 100k; test corpora are
    far smaller), so a divergence would only surface on a huge corpus."""
    from myrecommendsystem_spark.operators.sampling import sample_fraction

    ids = np.arange(1, 5001, dtype=np.int64)
    frac = 0.37
    df = spark.createDataFrame([(int(i),) for i in ids], "id long")
    spark_kept = {r.id for r in sample_fraction(df, "id", frac, "ivf").collect()}
    mask = ann_oracles._sample_ids(ids, frac, "ivf")
    local_kept = set(ids[mask].tolist())
    assert spark_kept == local_kept
    # and the fraction is in the right ballpark (sanity on the cut math)
    assert 0.3 < len(local_kept) / len(ids) < 0.45
