"""Latency envelope retained from the reference (BASELINE.md): a single
estimation must complete well inside the 6 s SLA
(reference:tests/test_api.py:32,63). The flagship batch plan prices an
ENTIRE sf0.001 requests table in one shot — asserting it under the
single-request SLA keeps the envelope honest with huge headroom for
environment noise."""

from __future__ import annotations

import time

from public_projet_data_engineering_tarification_electrique_spark.plans import (
    registry,
)


def test_flagship_batch_scoring_under_single_request_sla(spark):
    # warm-up: JVM/codegen spin-up is amortized in any serving deployment
    registry.flagship(spark, "/root/testdata/sf0.001").count()
    start = time.perf_counter()
    n = registry.flagship(spark, "/root/testdata/sf0.001").count()
    elapsed = time.perf_counter() - start
    assert n > 0
    assert elapsed < 6.0, f"batch scoring took {elapsed:.2f}s (> 6s SLA)"
