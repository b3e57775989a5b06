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


_SESS_OUTPUT = (
    "user_id bigint, session_start bigint, session_end bigint, "
    "n_events int, sum_value double"
)
_SESS_STATE = "start_ms bigint, last_ms bigint, n int, sv double"


def sessionize_state(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based sessionization as CUSTOM keyed state with an event-time
    timeout — the applyInPandasWithState twin of the built-in
    ``session_window`` aggregation (streaming/windows.py).

    Why both exist: ``session_window`` handles windowed AGGREGATES; the
    custom-state form is the extension point for session logic the
    builtin can't express (per-session sequences, abandonment triggers,
    model features at close).  This implementation keeps the aggregate
    semantics so the two are comparable in tests.

    Mechanics: per user, state holds the one OPEN session (start, last,
    n, sum).  Each batch folds its events (sorted by event time, resumed
    from state) and splits on gaps: a session followed by a later event
    in the same fold is closed by that successor and emits immediately;
    the trailing open session goes back to state with an EVENT-TIME
    timeout armed at ``last + gap``.  When the WATERMARK passes that
    point the runtime calls back with ``hasTimedOut`` and it emits.
    Append-mode output; state volume O(open sessions), bounded by the
    watermark.  Session timestamps are epoch milliseconds.

    Late-data caveat (documented semantics): an in-delay late event that
    lands inside a successor-closed session starts a NEW session instead
    of retro-extending the emitted one — the standard bounded-state
    tradeoff; the timeout-closed path is exact under the watermark.
    """

    _empty = {
        "user_id": pd.Series([], dtype="int64"),
        "session_start": pd.Series([], dtype="int64"),
        "session_end": pd.Series([], dtype="int64"),
        "n_events": pd.Series([], dtype="int32"),
        "sum_value": pd.Series([], dtype="float64"),
    }

    def _frame(uid, sessions):
        return pd.DataFrame(
            {
                "user_id": [int(uid)] * len(sessions),
                "session_start": [int(s[0]) for s in sessions],
                "session_end": [int(s[1]) for s in sessions],
                "n_events": [int(s[2]) for s in sessions],
                "sum_value": [float(s[3]) for s in sessions],
            }
        )

    def update(key, pdfs, state: GroupState):
        (uid,) = key
        if state.hasTimedOut:
            start_ms, last_ms, n, sv = state.get
            state.remove()
            yield _frame(uid, [(start_ms, last_ms, n, sv)])
            return
        events: list[tuple[int, float]] = []
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ms = pdf[ts_col].astype("datetime64[ms]").astype("int64")
            events.extend(zip(ms, pdf[value_col].astype(float)))
        events.sort()
        gap_ms = gap_seconds * 1000
        cur = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int, float]] = []
        for t, v in events:
            if cur is None:
                cur = [t, t, 1, v]
            elif t - cur[1] <= gap_ms:
                cur[1] = max(cur[1], t)
                cur[2] += 1
                cur[3] += v
            else:
                closed.append(tuple(cur))
                cur = [t, t, 1, v]
        if cur is not None:
            state.update((int(cur[0]), int(cur[1]), int(cur[2]), float(cur[3])))
            state.setTimeoutTimestamp(int(cur[1]) + gap_ms)
        yield _frame(uid, closed) if closed else pd.DataFrame(_empty)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=_SESS_OUTPUT,
            stateStructType=_SESS_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
