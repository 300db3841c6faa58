#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is materialized with the noop sink (full execution, no
driver-side collect), timed after a warm-up of the session.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from public_projet_data_engineering_tarification_electrique_spark import get_spark
from public_projet_data_engineering_tarification_electrique_spark.plans import registry


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="bench")

    # Warm-up: JVM JIT + parquet footers (q04), the events read path (q01),
    # and the Python/Arrow worker pool (q20 uses mapInPandas) — so the
    # timed loop measures plan execution, not process spin-up.
    for warm in (
        registry.q04_filter_project,
        registry.q01_trailing_window_avg,
        registry.q20_multimodal_meta,
    ):
        warm(spark, sf_dir).write.format("noop").mode("overwrite").save()

    # Best-of-2 per query: the first execution of an operator family pays
    # one-time JVM JIT/classloading (MLlib, codegen shapes) that a long-
    # running cluster amortizes away; min-of-runs measures the plan.
    runs = int(os.environ.get("BENCH_RUNS", "2"))
    timings: dict[str, float] = {}
    for name, fn in registry.QUERIES().items():
        best = float("inf")
        for _ in range(runs):
            start = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 3)
        # a few operators persist() intermediates for intra-query reuse;
        # drop them so caches never accumulate across the 100+-query loop
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
