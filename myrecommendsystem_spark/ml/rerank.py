"""Result-list re-ranking — maximal marginal relevance (Carbonell 1998).

Serving-side diversification: greedily pick the candidate maximizing

    lambda * relevance  -  (1 - lambda) * max_sim_to_already_picked

so near-duplicate recommendations (sequels, colorway variants) don't
fill the whole list.  Spark shape:

- candidate lists are per-user top-K (bounded by the recommender
  contract, K<=20 here) and the pairwise similarities among ONE user's
  candidates are at most K^2 rows — both tiny per group;
- the candidate->candidate similarity edges are materialized
  relationally FIRST (self-join of the rec list through the sparse
  item-sim matrix), so the greedy kernel never sees the full sim
  matrix;
- the greedy selection itself is inherently sequential per user — a
  cogrouped Arrow kernel (``cogroup().applyInPandas``), users
  parallelize across executors.

The same shape serves search-result diversification over the hybrid
retrieval output (doc_hybrid_search_rrf).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F


def candidate_pair_sims(recs: DataFrame, sims: DataFrame) -> DataFrame:
    """(userId, pid_a, pid_b, sim) for candidate pairs within each
    user's list — at most K^2 rows per user, produced by one self-join
    routed through the sparse similarity matrix."""
    a = recs.select(F.col("userId"), F.col("productId").alias("pid_a")).alias(
        "mmr_a"
    )
    b = recs.select(F.col("userId"), F.col("productId").alias("pid_b")).alias(
        "mmr_b"
    )
    pairs = a.join(
        b, F.col("mmr_a.userId") == F.col("mmr_b.userId")
    ).select(
        F.col("mmr_a.userId").alias("userId"), "pid_a", "pid_b"
    ).filter(F.col("pid_a") != F.col("pid_b"))
    edge = sims.select(
        F.col("pid").alias("pid_a"),
        F.col("other_pid").alias("pid_b"),
        "sim",
    )
    return pairs.join(edge, ["pid_a", "pid_b"])


def mmr_rerank(
    recs: DataFrame,
    sims: DataFrame,
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """Greedy MMR over per-user candidate lists.

    ``recs``: (userId, productId, score); ``sims``: (pid, other_pid,
    sim) — absent pairs mean similarity 0.  Deterministic: ties break
    on productId ascending.  Output (userId, productId, mmr_rank,
    mmr_score).
    """
    pair_sims = candidate_pair_sims(recs, sims)

    out_schema = (
        "userId int, productId int, mmr_rank int, mmr_score double"
    )

    def pick(key, cands: pd.DataFrame, edges: pd.DataFrame) -> pd.DataFrame:
        cand = {
            int(r.productId): float(r.score) for r in cands.itertuples()
        }
        sim = {
            (int(r.pid_a), int(r.pid_b)): float(r.sim)
            for r in edges.itertuples()
        }
        picked: list[tuple[int, float]] = []
        remaining = dict(cand)
        while remaining and len(picked) < k:
            best, best_val = None, None
            for pid in sorted(remaining):
                rel = remaining[pid]
                pen = max(
                    (sim.get((pid, q), 0.0) for q, _ in picked),
                    default=0.0,
                )
                val = lam * rel - (1.0 - lam) * pen
                if best_val is None or val > best_val:
                    best, best_val = pid, val
            # round_stable convention (+1e-11, 6 digits) so the DuckDB
            # recursive-CTE twin hash-matches; selection uses unrounded
            picked.append((best, round(best_val + 1e-11, 6)))
            del remaining[best]
        return pd.DataFrame(
            [
                (int(key[0]), pid, i + 1, v)
                for i, (pid, v) in enumerate(picked)
            ],
            columns=["userId", "productId", "mmr_rank", "mmr_score"],
        )

    return (
        recs.groupBy("userId")
        .cogroup(pair_sims.groupBy("userId"))
        .applyInPandas(pick, schema=out_schema)
    )
