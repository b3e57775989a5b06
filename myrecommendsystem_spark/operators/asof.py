"""As-of and range joins — temporal operators Spark lacks as built-ins.

SURVEY.md §2.3 lists these absent from the reference; they're first-class
here because event-time lookups ("the user's state as of this event",
"activity in the preceding hour") are the backbone of feature generation
for training pipelines.

Neither is implemented as a theta join: Spark plans inequality-only join
conditions as BroadcastNestedLoopJoin — O(|L|·|R|) per key and a
guaranteed 100 TB death.  Instead:

- **as-of**: union both sides, one window pass per key ordered by time,
  ``last(..., ignorenulls)`` carries the most recent right-side value
  forward onto each left row.  One shuffle on the key, no join at all.
- **range count**: bucketize time at the band width; each right row can
  only serve left rows in its own or the next bucket, so exploding the
  right side into 2 buckets turns the band predicate into an equi-join
  on (key, bucket) + a residual filter.  Shuffle volume is 2|R| + |L|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = True,
) -> DataFrame:
    """For each left row: the latest right row with ts < (≤) left ts.

    Returns the left rows plus ``asof_<col>`` for each value col and
    ``asof_ts`` (null when no prior right row exists — left-outer
    semantics, matching DuckDB's ASOF LEFT JOIN).  ``strict`` picks
    ``<`` vs ``<=``.  Right-side (key, ts) duplicates must be resolved
    by the caller (e.g. max per ts) for deterministic results.
    """
    lt = F.col(left_ts)
    l_tag = left.select(
        F.col(key).alias("__k"),
        lt.alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__rts"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__lrow"].dataType).alias("__lrow"),
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
        F.col(right_ts).alias("__rts"),
    )
    u = l_tag.unionByName(r_tag)
    # strict: at equal ts, left sorts BEFORE right (is_left desc) so the
    # window's "previous right row" excludes same-ts rows; non-strict the
    # reverse.  Secondary is_left ordering also makes replays stable.
    order = [F.col("__ts").asc(), F.col("__is_left").desc() if strict else F.col("__is_left").asc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.select(
        "__is_left",
        "__lrow",
        F.last("__rts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    out_cols = [F.col("__lrow").getField(c).alias(c) for c in left.columns]
    return carried.filter(F.col("__is_left") == 1).select(
        *out_cols, "asof_ts", *[f"asof_{c}" for c in value_cols]
    )


def range_join_count(
    probes: DataFrame,
    events: DataFrame,
    key: str,
    probe_ts: str,
    event_ts: str,
    band_seconds: int,
) -> DataFrame:
    """Per probe row: count of events with ts in [probe_ts − band, probe_ts).

    Bucketized band join (see module docstring).  Returns the probe rows
    plus ``n_in_band``.  Timestamps are compared at second precision via
    ``unix_timestamp``.
    """
    p_sec = F.unix_timestamp(F.col(probe_ts))
    e_sec = F.unix_timestamp(F.col(event_ts))
    p = probes.select(
        F.col(key).alias("__k"),
        p_sec.alias("__psec"),
        F.floor(p_sec / band_seconds).alias("__bucket"),
        F.struct(*[F.col(c) for c in probes.columns]).alias("__prow"),
    )
    e = events.select(
        F.col(key).alias("__k"),
        e_sec.alias("__esec"),
        F.explode(
            F.array(
                F.floor(e_sec / band_seconds),
                F.floor(e_sec / band_seconds) + 1,
            )
        ).alias("__bucket"),
    )
    # in-band test lives inside the aggregate (not a filter) so probes
    # whose candidates all miss the band still surface with count 0
    in_band = (
        F.col("__esec").isNotNull()
        & (F.col("__esec") >= F.col("__psec") - band_seconds)
        & (F.col("__esec") < F.col("__psec"))
    )
    joined = p.join(e, ["__k", "__bucket"], "left")
    counted = joined.groupBy("__k", "__psec", "__prow").agg(
        F.sum(F.when(in_band, 1).otherwise(0)).alias("n_in_band")
    )
    out_cols = [F.col("__prow").getField(c).alias(c) for c in probes.columns]
    return counted.select(*out_cols, F.col("n_in_band").cast("bigint"))
