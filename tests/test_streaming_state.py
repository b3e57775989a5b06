"""applyInPandasWithState recent-K buffer: multi-micro-batch semantics.

Feeds two files through one availableNow run with maxFilesPerTrigger=1 so
the state genuinely carries across micro-batches, and snapshots each
batch's output via foreachBatch.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from myrecommendsystem_spark.streaming.state import recent_ratings_state

SCHEMA = "userId int, productId int, score double, ts long"


def _write_events(path, rows):
    with open(path, "w") as f:
        for u, p, s, t in rows:
            f.write(
                json.dumps(
                    {"userId": u, "productId": p, "score": s, "ts": t}
                )
                + "\n"
            )


def test_recent_k_state_across_micro_batches(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    # batch 1: 25 ratings for user 1 (ts 1..25) → buffer trims to 20
    _write_events(
        src / "a.json", [(1, p, float(p % 5), p) for p in range(1, 26)]
    )
    # batch 2: 3 newer ratings + one for a fresh user
    _write_events(
        src / "b.json",
        [(1, 100, 4.0, 100), (1, 101, 2.0, 101), (1, 102, 5.0, 102), (2, 7, 3.0, 50)],
    )

    snapshots = []

    def capture(batch_df, batch_id):
        snapshots.append(
            sorted(
                (r.userId, r.productId, r.ts) for r in batch_df.collect()
            )
        )

    stream = spark.readStream.schema(SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).json(str(src))
    q = (
        recent_ratings_state(stream, k=20)
        .writeStream.outputMode("update")
        .foreachBatch(capture)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    assert len(snapshots) == 2
    first = [s for s in snapshots if len(s) == 20]
    second = [s for s in snapshots if s != first[0]]
    assert len(first) == 1 and len(second) == 1
    # batch 1: 20 most recent of 25 → ts 6..25
    assert [t for _, _, t in first[0]] == list(range(6, 26))
    # batch 2: user 1's buffer keeps the 3 new + 17 carried (ts 9..25 top-17
    # of previous 20 → total 20, min ts 9); user 2 has its single rating
    by_user = {}
    for u, p, t in second[0]:
        by_user.setdefault(u, []).append(t)
    assert sorted(by_user[1]) == list(range(9, 26)) + [100, 101, 102]
    assert by_user[2] == [50]
    assert len(by_user[1]) == 20


def test_sessionize_state_closes_on_watermark(spark, tmp_path):
    """Two sessions for user 1 separated by > gap; a later file advances
    the watermark past session_end + gap so the event-time timeout fires
    and each session emits exactly once.  maxFilesPerTrigger=1 forces
    one micro-batch per file (timeouts fire against the PREVIOUS batch's
    watermark, so single-batch runs emit nothing)."""
    import json as _json

    from myrecommendsystem_spark.streaming.state import sessionize_state

    src = tmp_path / "sess_src"
    src.mkdir()
    # file 0: session A (10:00-10:05) and session B start (11:00)
    with open(src / "a.json", "w") as f:
        for ts, v in [
            ("2024-01-01 10:00:00", 1.0),
            ("2024-01-01 10:05:00", 2.0),
            ("2024-01-01 11:00:00", 4.0),
        ]:
            f.write(_json.dumps({"user_id": 1, "ts": ts, "value": v}) + "\n")
    # file 1: watermark pusher far past 11:00 + gap + watermark delay
    with open(src / "b.json", "w") as f:
        f.write(
            _json.dumps(
                {"user_id": 99, "ts": "2024-01-02 00:00:00", "value": 0.0}
            )
            + "\n"
        )
    # file 2: one more batch so file 1's watermark takes effect
    with open(src / "c.json", "w") as f:
        f.write(
            _json.dumps(
                {"user_id": 98, "ts": "2024-01-02 00:00:01", "value": 0.0}
            )
            + "\n"
        )

    stream = (
        spark.readStream.schema("user_id bigint, ts string, value double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
        .withColumn("ts", F.to_timestamp("ts"))
    )
    q = (
        sessionize_state(stream, gap_seconds=1800, watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("sess_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.sum_value)
        for r in spark.sql("SELECT * FROM sess_t").collect()
    }

    def ms(s):
        import datetime as dt

        return int(
            dt.datetime.fromisoformat(s).replace(tzinfo=dt.timezone.utc).timestamp()
            * 1000
        )

    a_key = (1, ms("2024-01-01 10:00:00"), ms("2024-01-01 10:05:00"))
    b_key = (1, ms("2024-01-01 11:00:00"), ms("2024-01-01 11:00:00"))
    assert a_key in rows and rows[a_key] == (2, 3.0)
    assert b_key in rows and rows[b_key] == (1, 4.0)
