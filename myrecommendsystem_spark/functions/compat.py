"""Cross-engine numeric stability helpers.

Float aggregates must hash-match between Spark and the DuckDB oracle.  Two
sources of divergence:

1. summation order (partial aggregation) — ~1e-12 relative noise;
2. rounding ties: inputs with 2 decimals make averages land *exactly* on
   ``.xxxx5`` boundaries, where Spark (BigDecimal HALF_UP) and DuckDB
   (C-style rounding on the double) can disagree.

``round_stable`` nudges the value off the tie boundary by an epsilon that
is far larger than summation noise and far smaller than the rounding step,
so both engines always land on the same side.  Use the same digits+epsilon
on both sides (``sql_round_stable`` emits the oracle twin).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.column import Column


def _eps(digits: int) -> float:
    return 10.0 ** -(digits + 5)


def round_stable(col: Column, digits: int = 4) -> Column:
    return F.round(col + F.lit(_eps(digits)), digits)


def sql_round_stable(expr: str, digits: int = 4) -> str:
    return f"ROUND(({expr}) + {_eps(digits)!r}, {digits})"
