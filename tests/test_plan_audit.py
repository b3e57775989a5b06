"""Fleet-wide physical-plan audit — opt-in (MRS_PLAN_AUDIT=1).

Executes EVERY registered query at sf0.001 and scans its final adaptive
plan for the duplicated-Python-kernel defect class: the same Arrow/
Pandas kernel signature appearing more than once in one plan means a
lazy expensive subtree was evaluated per consumer instead of being
materialized (the round-5 pagerank defect; fixed by localCheckpoint /
persist at the fan-out point).  At 100 TB a duplicated kernel doubles a
full corpus scan, so this is a plan property worth a standing audit —
but running 250 queries takes ~10 min, hence opt-in like MRS_FULL_GRID.

Round-5 and round-6 manual audits both came back clean (SCALE.md); this
test makes the audit a one-liner for future rounds:

    MRS_PLAN_AUDIT=1 python -m pytest tests/test_plan_audit.py -q
"""

from __future__ import annotations

import os
import re

import pytest

from myrecommendsystem_spark.plans import registry

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.environ.get("MRS_PLAN_AUDIT"),
    reason="fleet-wide plan audit is opt-in: set MRS_PLAN_AUDIT=1",
)

# Kernel pairs that legitimately repeat one signature: different inputs,
# both required (documented in SCALE.md's round-5 audit).
_ALLOWED = {
    "ann_topk_ivf",  # corpus-assign + query-assign MapInPandas pair
    "ann_topk_ivfpq",
    "ann_topk_ivfpq_search",
    "embedding_near_dup_ivf",
    "ann_topk_pca",
}


def test_no_duplicated_python_kernels(spark):
    flags = []
    for name, builder in registry.all_queries().items():
        if name in _ALLOWED:
            continue
        df = builder(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
        kerns = re.findall(
            r"(ArrowEvalPython \[[^\]]*\]|MapInPandas [^,\n]*)", plan
        )
        sigs: dict[str, int] = {}
        for k in kerns:
            sigs[k[:80]] = sigs.get(k[:80], 0) + 1
        if any(v > 1 for v in sigs.values()):
            flags.append((name, {k: v for k, v in sigs.items() if v > 1}))
        spark.catalog.clearCache()
    assert not flags, f"duplicated Python kernels: {flags}"
