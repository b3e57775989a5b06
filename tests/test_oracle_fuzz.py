"""Adversarial fuzz of the round-6 recursive/hash-replay oracles.

The sf0.001/sf0.01 replays prove parity on the benchmark corpora; these
cases attack the encodings where they could plausibly break:

- BPE trainer oracle: a near-unary alphabet ('a','b' only) maximizes
  merge-count ties and overlapping-run merges ('aaa' under (a,a) must
  fold left-to-right to [aa, a]) — the exact semantics the
  dot-delimited replace() trick claims to reproduce.
- MinHash pairs oracle: short docs (whole-text-gram fallback), repeated
  tokens, and planted near-dups exercise the Horner hash, the
  HUGEINT-mod-2^64 permutation replay, and the band r-tuple join.

Seeds are fixed so the cases are deterministic; each ran green on 8
random seeds before being pinned.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from myrecommendsystem_spark.plans import registry


def _oracle(name: str) -> str:
    return next(s.oracle for s in registry.REGISTRY if s.name == name)


def _duck(rows):
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", rows)
    return con


@pytest.mark.parametrize("seed", [0, 3, 7])
def test_bpe_merges_oracle_fuzz(spark, seed):
    from myrecommendsystem_spark.ml.bpe import learned_merges_df

    rng = random.Random(seed)
    words = [
        "".join(rng.choice("aab") for _ in range(rng.randint(2, 8)))
        for _ in range(rng.randint(5, 30))
    ]
    rows = [
        (i, " ".join(rng.choice(words) for _ in range(rng.randint(3, 20))))
        for i in range(rng.randint(3, 10))
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [
        (r.rank, r.a, r.b, r.merged, r.cnt)
        for r in learned_merges_df(spark, docs, n_merges=20)
        .orderBy("rank")
        .collect()
    ]
    con = _duck(rows)
    want = [tuple(r) for r in con.execute(_oracle("bpe_learned_merges")).fetchall()]
    con.close()
    assert got == want


@pytest.mark.parametrize("seed", [1, 4])
def test_minhash_pairs_oracle_fuzz(spark, seed):
    from myrecommendsystem_spark.operators import dedup

    rng = random.Random(seed)
    vocab = [f"t{i}" for i in range(40)]
    rows = []
    for i in range(25):
        n = rng.randint(1, 30)  # includes <=3-token whole-text fallback docs
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # planted near-dups: copy with one word changed
    base = rows[0][1]
    rows.append((100, base))
    toks = base.split()
    if toks:
        toks[len(toks) // 2] = "mutated"
    rows.append((101, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in dedup.minhash_near_duplicates(
            docs, jaccard_threshold=0.5
        ).collect()
    )
    con = _duck(rows)
    want = sorted(
        (int(a), int(b), float(j))
        for a, b, j in con.execute(_oracle("dedup_minhash_pairs")).fetchall()
    )
    con.close()
    assert got == want
    assert (0, 100, 1.0) in got  # the planted exact copy must collide
