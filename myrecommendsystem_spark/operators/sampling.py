"""Deterministic sampling — stable subsets for training pipelines.

``df.sample()`` draws differently on every execution, partitioning
change, and retry — useless when a 100 TB corpus must yield the SAME
eval split next month.  Hash-based sampling keys the decision on the
ROW (md5 of a key column), so membership is a pure function of the
data: reproducible across runs, engines (md5 is universal — the DuckDB
oracle computes the identical subset), cluster sizes, and incremental
appends (new rows don't reshuffle old ones between splits).

The cut is a lexicographic threshold on the first 8 hex chars of the
md5 — pure string comparison, no hex→int conversion, identical in any
SQL dialect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _hex_cut(fraction: float) -> str:
    # Clamp: fraction >= 1.0 must keep ALL rows, but its 9-char "100000000"
    # would compare lexicographically BELOW most 8-char hashes and silently
    # keep only ~6%.  "g" sorts above every hex digit → keeps everything;
    # "00000000" is below every hash (strict <) → keeps nothing.
    if fraction >= 1.0:
        return "g"
    if fraction <= 0.0:
        return "00000000"
    return format(int(round(fraction * 16**8)), "08x")


def hash_key(key: Column, salt: str = "") -> Column:
    """First 8 hex chars of md5(salt || key) — the sampling coordinate.

    ``salt`` derives independent samplings from the same key (train vs
    eval vs holdout must not correlate).
    """
    return F.substring(F.md5(F.concat(F.lit(salt), key.cast("string"))), 1, 8)


def sample_fraction(
    df: DataFrame, key: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided by the key's hash coordinate.

    All rows sharing a key land on the same side of the cut — sampling
    by user keeps each kept user's history COMPLETE, which row-level
    random sampling destroys.
    """
    return df.filter(hash_key(F.col(key), salt) < F.lit(_hex_cut(fraction)))


def train_eval_split(
    df: DataFrame, key: str, eval_fraction: float = 0.1, salt: str = "split"
) -> tuple[DataFrame, DataFrame]:
    """Disjoint, exhaustive (train, eval) split by key hash — the
    deterministic replacement for ``randomSplit`` in M4."""
    cut = F.lit(_hex_cut(eval_fraction))
    coord = hash_key(F.col(key), salt)
    return df.filter(coord >= cut), df.filter(coord < cut)


def sample_stratified(
    df: DataFrame,
    key: str,
    strata_col: str,
    fractions: dict[str, float],
    salt: str = "",
) -> DataFrame:
    """Per-stratum keep fractions — corpus rebalancing (e.g. downsample the
    dominant language) with the same deterministic membership guarantees
    as :func:`sample_fraction`.

    The fraction table joins in as a broadcast (it has one row per
    stratum), so the cut comparison stays a codegen filter over the scan —
    no shuffle, no driver loop.  Strata absent from ``fractions`` are
    DROPPED (inner join), which is the usual "keep only listed sources"
    pipeline semantics.
    """
    spark = df.sparkSession
    frac = spark.createDataFrame(
        [(s, _hex_cut(f)) for s, f in fractions.items()],
        f"{strata_col} string, __cut string",
    )
    return (
        df.join(F.broadcast(frac), strata_col)
        .filter(hash_key(F.col(key), salt) < F.col("__cut"))
        .drop("__cut")
    )


def kfold_assignment(
    df: DataFrame, key: str, k: int = 5, salt: str = "fold"
) -> DataFrame:
    """Append a deterministic ``fold`` ∈ [0, k) — whole-key k-fold CV
    splits.

    fold = first-8-hex-chars(md5(salt ++ key)) mod k: a pure function of
    the DATA, so the same row lands in the same fold on any engine, any
    partitioning, any run — the reproducibility `randomSplit` can't give
    — and every key's rows stay together (fold-disjoint histories).
    Uniformity inherits from md5; salt decorrelates from the
    train/eval-split coordinate.
    """
    coord = F.conv(hash_key(F.col(key), salt), 16, 10).cast("long")
    return df.withColumn("fold", (coord % k).cast("int"))


def sample_weighted(
    df: DataFrame, key: str, weight_col, salt: str = "wsample"
) -> DataFrame:
    """Per-row weighted Bernoulli keep, deterministic: row survives iff
    its hash coordinate (md5(salt ++ key) → uniform [0,1)) is below its
    weight.

    The data-mixture primitive: upweight/downweight sources by giving
    each row a keep probability (weights > 1 always keep), and the
    decision is a pure function of (salt, key) — reruns, engines, and
    repartitions all agree, and disjoint salts give independent draws.
    Expected kept fraction per stratum = mean(weight clamped to [0,1]).
    """
    coord = F.conv(hash_key(F.col(key), salt), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )
    return df.filter(coord < weight_col)


def resample_balanced(
    df: DataFrame,
    key: str,
    strata_col: str,
    target_fraction: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministically downsample every stratum toward the SMALLEST
    stratum's size (× ``target_fraction``) — the data-mixture balancer
    (e.g. cap every source/language at parity before pretraining).

    Per-stratum keep fraction = ``target_fraction · min_n / n``, computed
    relationally: the count table is an aggregate, the min rides a 1-row
    broadcast, and membership is the md5(salt ++ key) coordinate — the
    kept subset is a pure function of the data (any engine, any
    partitioning, any cluster size agrees), unlike ``sampleBy``'s
    seed-and-partition-dependent draw.  Nothing collects to the driver;
    the filter is codegen at the scan side of a broadcast join.
    """
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("__n"))
    mn = counts.agg(F.min("__n").alias("__m"))
    frac = counts.crossJoin(F.broadcast(mn)).select(
        strata_col,
        (
            F.lit(float(target_fraction))
            * F.col("__m").cast("double")
            / F.col("__n")
        ).alias("__frac"),
    )
    coord = F.conv(hash_key(F.col(key), salt), 16, 10).cast("double") / F.lit(
        float(1 << 32)
    )
    return (
        df.join(F.broadcast(frac), strata_col)
        .filter(coord < F.col("__frac"))
        .drop("__frac")
    )


def shard_assignment(
    df: DataFrame, key: str, n_shards: int, salt: str = "shard"
) -> DataFrame:
    """Append a deterministic ``shard`` column: md5-coordinate of the key
    mod ``n_shards``.

    The training-data-export primitive: which output shard a document
    lands in is a pure function of the data, so re-exports, engines, and
    cluster sizes all produce identical shard contents — resumable,
    diffable exports (compare manifests, re-ship only changed shards).
    Unlike ``repartition(n)`` (round-robin on task order, different every
    run), this survives any physical layout.
    """
    coord = F.conv(hash_key(F.col(key), salt), 16, 10).cast("long")
    return df.withColumn("shard", (coord % n_shards).cast("int"))


def export_shard_manifest(
    df: DataFrame,
    key: str,
    n_shards: int,
    size_col: str | None = None,
    salt: str = "shard",
) -> DataFrame:
    """Per-shard export manifest: (shard, n_rows, n_keys[, total_size]).

    One hash-groupBy over the shard id (map-side combinable).  The
    manifest is the reproducibility receipt a 100 TB export ships with:
    row/key counts (and bytes when ``size_col`` is given) per shard,
    stable across reruns because shard membership is content-addressed
    (:func:`shard_assignment`).
    """
    aggs = [
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.countDistinct(key).cast("long").alias("n_keys"),
    ]
    if size_col is not None:
        aggs.append(F.sum(size_col).cast("long").alias("total_size"))
    return (
        shard_assignment(df, key, n_shards, salt)
        .groupBy("shard")
        .agg(*aggs)
        .orderBy("shard")
    )


def sample_exact_n_per_stratum(
    df: DataFrame,
    key: str,
    strata_col: str,
    n: int,
    salt: str = "exact",
) -> DataFrame:
    """EXACTLY ``n`` rows per stratum (fewer only if the stratum is
    smaller), chosen deterministically: rows rank by their md5 hash
    coordinate within each stratum and the first ``n`` win.

    The exact-size complement of :func:`sample_stratified` (which keeps a
    FRACTION and so has binomial jitter): eval-set construction usually
    specifies "exactly 5k per language", and hash-ordering makes the
    winners a pure function of the data — stable under reruns, engines,
    appends of losing rows, and any partitioning.  One shuffle on the
    stratum key serves the ranking window.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_key(F.col(key), salt), F.col(key)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n)
        .drop("__rn")
    )
