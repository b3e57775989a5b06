"""True keyed streaming state — the Redis recent-K list, Spark-managed.

The reference keeps each user's last ≤20 ratings in an external Redis list
(``StreamingRecommender.scala:151-159``, written by the business server per
the comment at :140-143).  The engine offers two designs (SURVEY.md §7):

1. **Compacted table** (``recommender.compact_recent_ratings``): recompute
   the top-K per user from the ratings table each cycle — simple, fully
   testable in batch, oracle-backed.
2. **This module**: per-key state inside the streaming runtime via
   ``applyInPandasWithState`` — no external store, no recompute; state
   volume is O(users × K) and survives micro-batches through the
   checkpoint.  This is the shape that replaces Redis outright.

Semantics pinned by tests: buffer ordered by (ts, productId, score)
descending, trimmed to K; each micro-batch emits the full updated buffer
for every user that received events (update-mode output).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RECENT_K = 20  # StreamingRecommender.scala:48

_OUTPUT_SCHEMA = "userId int, productId int, score double, ts bigint"
_STATE_SCHEMA = "productIds array<int>, scores array<double>, tss array<bigint>"


def _merge_recent(
    rows: list[tuple[int, float, int]], k: int
) -> list[tuple[int, float, int]]:
    """Top-k by (ts desc, productId desc, score desc) — the same total
    order as ``compact_recent_ratings`` so both designs agree."""
    rows.sort(key=lambda r: (-r[2], -r[0], -r[1]))
    return rows[:k]


def recent_ratings_state(
    events: DataFrame, k: int = RECENT_K, user_col: str = "userId"
) -> DataFrame:
    """Streaming recent-K buffer per user (T4/S8 as Spark-managed state).

    ``events``: streaming DF with (userId, productId, score, ts).  Returns
    an update-mode streaming DF emitting each touched user's full buffer
    (userId, productId, score, ts) after every micro-batch.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            pids, scores, tss = state.get
            buf = list(zip(pids, scores, tss))
        else:
            buf = []
        for pdf in pdfs:
            buf.extend(
                zip(
                    pdf["productId"].astype(int),
                    pdf["score"].astype(float),
                    pdf["ts"].astype(int),
                )
            )
        buf = _merge_recent(buf, k)
        state.update(
            (
                [int(p) for p, _, _ in buf],
                [float(s) for _, s, _ in buf],
                [int(t) for _, _, t in buf],
            )
        )
        yield pd.DataFrame(
            {
                "userId": [int(user_id)] * len(buf),
                "productId": [p for p, _, _ in buf],
                "score": [s for _, s, _ in buf],
                "ts": [t for _, _, t in buf],
            }
        )

    return events.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=_OUTPUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
