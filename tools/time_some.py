#!/usr/bin/env python
"""Isolated per-query timing: best-of-N noop-sink runs per query.

Usage: python tools/time_some.py [--runs 3] q201 q171 ...
Prints one line per query: name best median [all samples].
Same measurement methodology as bench.py (noop sink, clearCache +
gc.collect between runs) without the full-surface sweep.
"""

from __future__ import annotations

import gc
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from public_projet_data_engineering_tarification_electrique_spark import get_spark
from public_projet_data_engineering_tarification_electrique_spark.plans import registry


def main() -> None:
    runs = 3
    names: list[str] = []
    args = iter(sys.argv[1:])
    for a in args:
        if a == "--runs":
            runs = int(next(args))
        else:
            names.append(a)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time_some")
    qmap = registry.QUERIES()
    resolved = []
    for n in names:
        hits = [k for k in qmap if k == n or k.split("_", 1)[0] == n]
        if len(hits) != 1:
            print(f"unknown/ambiguous query {n!r}: {hits}", file=sys.stderr)
            sys.exit(2)
        resolved.append(hits[0])

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # warm-up (JIT, parquet footers, Python workers)
    noop(registry.q04_filter_project(spark, sf_dir))
    noop(registry.q01_trailing_window_avg(spark, sf_dir))
    noop(registry.q20_multimodal_meta(spark, sf_dir))

    for name in resolved:
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            noop(qmap[name](spark, sf_dir))
            samples.append(time.perf_counter() - t0)
            spark.catalog.clearCache()
            gc.collect()
        samples_s = sorted(samples)
        print(
            f"{name:42s} best {samples_s[0]:6.3f}  med {samples_s[len(samples_s)//2]:6.3f}"
            f"  all {[round(s,3) for s in samples]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
