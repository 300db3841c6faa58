#!/usr/bin/env python
"""Sweep EVERY registered query's physical plan for scale smells:

1. UNPARTITIONED windows — ``Window [...] windowspecdefinition(<order
   only>)``: the whole input moves to one task. The round-7 verdict
   found three of these by hand (q181/q227/q228, since fixed); this
   tool makes the check exhaustive and repeatable.
2. ``Exchange SinglePartition`` feeding anything OTHER than a global
   (keys=[]) aggregate or a global limit — a terminal 1-row agg is the
   legitimate use; a single-partition exchange under a sort, join, or
   window is a bottleneck.
3. ``CartesianProduct`` — a non-broadcast cross join (|L|×|R| work AND
   shuffle). BroadcastNestedLoopJoin is NOT flagged: the repo's
   1-row-stats scalar attaches (``crossJoin(broadcast(agg))``) compile
   to BNLJ with a 1-row build side by design; a plain CartesianProduct
   means Spark decided neither side was broadcastable — real risk.

Usage: python tools/plan_audit.py [sf_dir]   (default sf0.001 — plans,
not timings, are the object; queries that execute during construction
run at the smallest SF). Writes a per-query table to stdout and exits
non-zero if any NEW smell is found outside the documented allowlist.
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from public_projet_data_engineering_tarification_electrique_spark import get_spark
from public_projet_data_engineering_tarification_electrique_spark.plans import registry

#: queries whose single-partition window/exchange is STRUCTURALLY
#: bounded and accepted — every entry carries the bound. "k-bounded"
#: = the window runs AFTER a TakeOrdered/limit, so its input is the
#: constant k, not data; "dimension-bounded" = the input is a
#: dimension table (nations, sources, embedding dims); "grid-bounded"
#: = the input is a fixed rounding grid's histogram. Data-shaped
#: windows (users, score levels, value levels) are NEVER allowlisted —
#: they take the shards.py two-phase constructions instead (q72/q176/
#: q181/q224/q225/q227/q228 were all rewritten when this audit first
#: ran, round 8).
ALLOWED_UNPARTITIONED: dict[str, str] = {
    "q56_mixture_plan": "per-source quota table: |sources| rows, dimension-bounded",
    "q57_top_quality": "4-dp quality histogram: <= 10^4+1 levels, grid-bounded",
    "q87_distribution_windows": "25-row nation aggregate, dimension-bounded",
    "q130_bm25_topk": "rank window after TakeOrdered limit 20, k-bounded",
    "q145_bpe_pair_counts": "rank window after limit 20, k-bounded",
    "q152_rrf_hybrid": "composes q130's post-limit rank windows, k-bounded",
    "q204_dim_variance": "window over embedding dimensions, dim-bounded",
    "q205_zipf_slope": "rank window after TakeOrdered limit 100, k-bounded",
    "q260_spearman_rho": (
        "rank-map cumsum windows over margin LEVEL tables: quantity "
        "<= 50 levels, dollar prices <= ~1.05e5 levels — both bounded "
        "by the VALUE RANGE (fixed [900, 105000] at every SF), not "
        "the corpus; the unbounded-margin path (levels_bounded=False) "
        "uses shards.global_running_sums instead"
    ),
    "q277_water_filling": (
        "water-level prefix windows over the per-source ALLOCATION "
        "table: |sources| rows, dimension-bounded (the q56 contract "
        "— a corpus of any size aggregates to one row per source "
        "before the window runs)"
    ),
}


def unpartitioned_window_specs(plan: str) -> list[str]:
    """Return windowspecdefinition bodies that declare NO partition
    columns (every pre-frame argument is an ASC/DESC order key)."""
    bad = []
    for m in re.finditer(r"windowspecdefinition\(", plan):
        depth, i = 1, m.end()
        while i < len(plan) and depth:
            depth += plan[i] == "("
            depth -= plan[i] == ")"
            i += 1
        body = plan[m.end() : i - 1]
        head = body.split("specifiedwindowframe")[0]
        args = [a.strip() for a in head.split(",") if a.strip()]
        if args and all(" ASC" in a or " DESC" in a for a in args):
            bad.append(body[:160])
    return bad


def suspicious_single_partition(plan: str) -> list[str]:
    """SinglePartition exchanges whose CONSUMER (the plan line above)
    is not a global aggregate / global limit."""
    lines = plan.splitlines()
    bad = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        consumer = ""
        for j in range(i - 1, -1, -1):
            stripped = lines[j].strip().lstrip("+-*: ")
            if stripped:
                consumer = stripped
                break
        ok = (
            "keys=[]" in consumer  # global HashAggregate
            or "key=[]" in consumer  # global SortAggregate
            or consumer.startswith("GlobalLimit")
            or consumer.startswith("CollectLimit")
            or consumer.startswith("TakeOrderedAndProject")
            or ("AdaptiveSparkPlan" in consumer)
        )
        if not ok:
            bad.append(consumer[:120] or "<top>")
    return bad


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="plan-audit")
    findings: list[tuple[str, str, str]] = []
    n = 0
    for name, fn in registry.QUERIES_IMPL.items():
        n += 1
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:  # noqa: BLE001 — audit must not die mid-sweep
            findings.append((name, "ERROR", str(exc)[:120]))
            continue
        if name in ALLOWED_UNPARTITIONED:
            continue  # bound documented above — both checks waived
        for body in unpartitioned_window_specs(plan):
            findings.append((name, "UNPARTITIONED_WINDOW", body))
        for consumer in suspicious_single_partition(plan):
            findings.append((name, "SINGLE_PARTITION_FEEDS", consumer))
        if "CartesianProduct" in plan:
            findings.append((name, "CARTESIAN_PRODUCT", "non-broadcast cross join"))
    print(f"audited {n} queries")
    if not findings:
        print("CLEAN: no unpartitioned windows, no suspicious "
              "single-partition exchanges, no cartesian products")
        sys.exit(0)
    for name, kind, detail in findings:
        print(f"{name}\t{kind}\t{detail}")
    sys.exit(1)


if __name__ == "__main__":
    main()
