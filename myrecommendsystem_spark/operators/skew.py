"""Skew handling: salted joins (the manual fallback when AQE can't help).

AQE's skew-join splitting (on by default in our session factory) handles
most hot keys at runtime, but it only works for sort-merge joins and only
when statistics expose the skew.  The classic manual remedy — salt the hot
side, replicate the small side — stays useful for the 100 TB cases AQE
misses (skewed broadcast-probe misses, stateful streaming joins).  The
salt here is DETERMINISTIC (hash of the whole row modulo the factor), so
results are reproducible and no ``rand()`` breaks retries/speculation.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the skewed side salted ``salt_factor`` ways.

    ``skewed`` rows get a deterministic salt in ``[0, salt_factor)``; the
    ``small`` side is replicated once per salt value.  The shuffle key
    becomes (join keys…, salt) so one hot key spreads over
    ``salt_factor`` reducers instead of melting one.  Replication
    multiplies the small side — keep it for dimension-sized relations.
    """
    salted = skewed.withColumn(
        _SALT,
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_factor)),
    )
    replicated = small.withColumn(
        _SALT,
        F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)).cast("array<bigint>")),
    )
    return salted.join(replicated, [*on, _SALT], how).drop(_SALT)


def salted_group_count(
    df: DataFrame, keys: Sequence[str], salt_factor: int = 8
) -> DataFrame:
    """Two-stage grouped count: (keys, salt) partial → keys final.

    Mostly pedagogical — ``groupBy().agg()`` already map-side combines, so
    salting a count is only needed for high-cardinality-per-key aggregates
    without partial support (exact distinct, collect_list on a hot key).
    """
    partial = (
        df.withColumn(
            _SALT,
            F.pmod(
                F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_factor)
            ),
        )
        .groupBy(*keys, _SALT)
        .agg(F.count("*").alias("partial_cnt"))
    )
    return partial.groupBy(*keys).agg(F.sum("partial_cnt").alias("cnt"))


def count_distinct_two_phase(
    df: DataFrame,
    key_cols: Sequence[str],
    distinct_col: str,
) -> DataFrame:
    """COUNT(DISTINCT x) per key as dedupe-then-count — the hot-key-safe
    rewrite.

    The direct form keeps every key's full distinct set in one
    aggregation buffer: a whale key (one user id behind half the events)
    concentrates its whole set in a single task.  Phase 1 groups by
    (key, x) — the dedupe shuffle spreads a hot key across as many
    partitions as it has distinct values, each buffer O(1).  Phase 2
    counts rows per key — a plain partial/final count.  Same answer,
    bounded memory per task at any skew.
    """
    deduped = df.select(*key_cols, distinct_col).groupBy(
        *key_cols, distinct_col
    ).agg(F.lit(1))
    return deduped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias(f"n_distinct_{distinct_col}")
    )
