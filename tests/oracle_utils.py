"""Local replica of the driver's DuckDB-oracle comparison.

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet tables, then compares row count, column names, and an
order-insensitive value snapshot.  Running this in pytest catches
engine-divergence (types, rounding, dialect) before the driver does.
"""

from __future__ import annotations

import math

import duckdb

from myrecommendsystem_spark import schemas


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in schemas.TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _normalize(rows, colnames):
    """Sort columns by name, stringify values, sort rows — order-insensitive."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])

    def norm_val(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            if math.isnan(v):
                return "NaN"
            return f"{v:.6g}"
        if isinstance(v, bool):
            return str(v).lower()
        return str(v)

    return sorted(tuple(norm_val(row[i]) for i in order) for row in rows)


def compare_query_to_oracle(spark, sf_dir: str, builder, oracle: str):
    sdf = builder(spark, sf_dir)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = duckdb_connection(sf_dir)
    res = con.execute(oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = [tuple(r) for r in res.fetchall()]
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={spark_cols} duckdb={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duckdb={len(duck_rows)}"
    )
    sn = _normalize(spark_rows, spark_cols)
    dn = _normalize(duck_rows, duck_cols)
    diffs = [(a, b) for a, b in zip(sn, dn) if a != b]
    assert not diffs, f"value mismatch, first diffs: {diffs[:5]}"
