#!/usr/bin/env python
"""Dump .explain('formatted') for named queries to plans/r12/<q>_<tag>.txt.

Usage: python tools/plan_dump.py --tag before q120 q134 q201 ...
Plan capture only — no job execution (streaming queries, which cannot
be explained without running, are skipped with a note).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from public_projet_data_engineering_tarification_electrique_spark import get_spark
from public_projet_data_engineering_tarification_electrique_spark.plans import registry


def main() -> None:
    tag = "before"
    names: list[str] = []
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--tag":
            tag = next(args)
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        REPO, "plans", os.environ.get("PLAN_DUMP_ROUND", "r13")
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="plan_dump")
    qmap = registry.QUERIES()
    resolved = []
    for n in names:
        hits = [k for k in qmap if k == n or k.split("_", 1)[0] == n]
        if len(hits) != 1:
            print(f"unknown/ambiguous query {n!r}: {hits}", file=sys.stderr)
            sys.exit(2)
        resolved.append(hits[0])
    for name in resolved:
        try:
            df = qmap[name](spark, sf_dir)
            if df.isStreaming:
                print(f"skip {name}: streaming (plan only exists at runtime)")
                continue
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: {exc}", file=sys.stderr)
            continue
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        n_ex = plan.count("Exchange")
        n_py = (
            plan.count("BatchEvalPython")
            + plan.count("ArrowEvalPython")
            + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas")
            + plan.count("FlatMapCoGroupsInPandas")
            + plan.count("MapInArrow")
        )
        print(f"wrote {path} (Exchange x{n_ex}, python-nodes x{n_py})")
    spark.stop()


if __name__ == "__main__":
    main()
