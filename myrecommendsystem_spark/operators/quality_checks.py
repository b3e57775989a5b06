"""Data-quality expectations — a violations report over named checks.

The training-data / warehouse ingest gate: before a table feeds a
pipeline, count how many rows violate each declared expectation
(orphaned foreign keys, duplicated business keys, out-of-range measures,
impossible date orderings).  Each check is expressed as a DataFrame of
its VIOLATING rows — fully declarative, so every predicate stays a
pushed filter / join in the engine — and the report is the union of
their counts.  At 100 TB each count is a partial/final aggregate over an
independently optimized subplan; nothing materializes violating rows
unless a caller asks the check DataFrame for them directly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, functions as F


def violations_report(checks: dict[str, DataFrame]) -> DataFrame:
    """(check_name, n_violations) for each named check, sorted by name.

    ``checks`` maps a check name to the DataFrame of rows VIOLATING it
    (empty ⇒ the expectation holds).
    """
    if not checks:
        raise ValueError("violations_report needs at least one check")
    counted = [
        df.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations")).select(
            F.lit(name).alias("check_name"), "n_violations"
        )
        for name, df in checks.items()
    ]
    return reduce(DataFrame.unionByName, counted).orderBy("check_name")
