"""Per-query profiling harness for the optimization rounds (guide §1).

For each named query: run it to the noop sink N times (best-of), and
record wall seconds plus scheduler-level shape — number of Spark jobs,
stages, and tasks the query submits — via the status tracker.  Job count
is the fixed-overhead proxy: every eager materialization
(localCheckpoint, fit-sample collect, isEmpty probe) is its own job and
pays scheduling latency even when the data is tiny.

Optionally captures ``explain("formatted")`` into
``plans/$MRS_PLANS_ROUND/`` (default ``plans/r14/``).

Usage:
    python tools/profile_queries.py q1,q2,...   [--plans before|after]
    python tools/profile_queries.py --top 25    [--plans before]
    MRS_PROFILE_REPEAT=3 python tools/profile_queries.py ...

Writes one JSON line per query to stdout and a summary file
``/tmp/profile_<tag>.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from myrecommendsystem_spark.plans import registry  # noqa: E402
from myrecommendsystem_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("MRS_PROFILE_REPEAT", "2"))
    args = [a for a in sys.argv[1:]]
    plans_mode = None
    if "--plans" in args:
        i = args.index("--plans")
        plans_mode = args[i + 1]
        del args[i : i + 2]
    top_n = None
    if "--top" in args:
        i = args.index("--top")
        top_n = int(args[i + 1])
        del args[i : i + 2]

    all_q = registry.all_queries()
    if top_n:
        with open(
            os.path.join(
                HERE, os.environ.get("MRS_PROFILE_RECORD", "BENCH_DETAIL.json")
            )
        ) as f:
            rec = json.load(f)["queries"]
        names = [
            n
            for n, _ in sorted(rec.items(), key=lambda kv: -kv[1])[:top_n]
            if n in all_q
        ]
    else:
        names = [n for n in ",".join(args).split(",") if n]
        unknown = [n for n in names if n not in all_q]
        if unknown:
            raise SystemExit(f"unknown queries: {unknown}")

    spark = get_spark(app_name="mrs-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warmup (same as bench.py): parquet reader + shuffle + codegen +
    # the Python-worker/Arrow daemon across every task slot
    from myrecommendsystem_spark.io import readers as _r

    _r.events_as_ratings(spark, sf_dir).groupBy("productId").count().count()
    from pyspark.sql import functions as _F
    from pyspark.sql.functions import pandas_udf as _pudf

    _warm = _pudf(lambda s: s + 0, "long")
    n_slots = sc.defaultParallelism
    spark.range(0, 100 * n_slots, 1, n_slots).select(
        _F.sum(_warm("id"))
    ).count()

    results: dict[str, dict] = {}
    for name in names:
        sc.setJobDescription(f"profile:{name}")
        best = float("inf")
        jobs = stages = tasks = 0
        for it in range(repeat):
            group = f"prof-{name}-{it}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            df = all_q[name](spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            elapsed = time.perf_counter() - t0
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = n_tasks = 0
            for jid in job_ids:
                ji = tracker.getJobInfo(jid)
                if ji is None:
                    continue
                for sid in ji.stageIds:
                    si = tracker.getStageInfo(sid)
                    if si is not None and si.numTasks > 0 and si.numActiveTasks == 0:
                        # count only stages that actually ran (skipped
                        # stages report via numCompletedTasks == 0)
                        if si.numCompletedTasks > 0:
                            n_stages += 1
                            n_tasks += si.numCompletedTasks
            if elapsed < best:
                best = elapsed
                jobs, stages, tasks = len(job_ids), n_stages, n_tasks
            spark.catalog.clearCache()
        sc.setJobGroup("", "")
        rec = {
            "sec": round(best, 3),
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
        }
        results[name] = rec
        print(json.dumps({"query": name, **rec}), flush=True)
        if plans_mode:
            try:
                df = all_q[name](spark, sf_dir)
                txt = df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"
                )
            except Exception:
                from contextlib import redirect_stdout
                import io as _io

                buf = _io.StringIO()
                df = all_q[name](spark, sf_dir)
                with redirect_stdout(buf):
                    df.explain("formatted")
                txt = buf.getvalue()
            plans_dir = os.path.join(
                HERE, "plans", os.environ.get("MRS_PLANS_ROUND", "r14")
            )
            os.makedirs(plans_dir, exist_ok=True)
            out = os.path.join(plans_dir, f"{name}_{plans_mode}.txt")
            with open(out, "w") as f:
                f.write(txt)

    tag = plans_mode or "adhoc"
    with open(f"/tmp/profile_{tag}.json", "w") as f:
        json.dump(results, f, indent=1, sort_keys=True)
    print(
        json.dumps(
            {
                "total_sec": round(sum(r["sec"] for r in results.values()), 3),
                "total_jobs": sum(r["jobs"] for r in results.values()),
                "n": len(results),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
