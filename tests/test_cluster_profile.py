"""Streaming family under the CLUSTER deployment profile (VERDICT r11
item 8).

session.py's "cluster" profile pins the 100 TB streaming posture —
RocksDB state store with changelog checkpointing and a bounded shared
memory budget (session.py:77-92). PLANS.md records a manual run; this
test makes the posture CI-enforced so a conf rename or a provider
regression in a Spark upgrade can't silently rot it: the five stateful
queries the verdict names (q44 streaming dedup, q230/q232 landing
slices, q241 CDC merge feed, q303 streaming SRM) each execute under
``configure(spark, profile="cluster")`` and must return the same rows
they return under the local profile.

Width note: the cluster profile also sets shuffle.partitions=8000 (the
1000-executor starting width). Stateful streaming queries SNAPSHOT that
width into their state layout at first checkpoint, so running the full
width on local[32] at sf0.001 would spend the whole test scheduling
empty state partitions. The width is orthogonal to the posture under
test (provider class + changelog + memory bound), so the test clamps
partitions back to the test-box size AFTER the profile overlay — the
RocksDB pins stay.
"""

from __future__ import annotations

import pytest

from public_projet_data_engineering_tarification_electrique_spark.plans import registry
from public_projet_data_engineering_tarification_electrique_spark.session import (
    PROFILES,
    configure,
)

from .conftest import SF_SMOKE

STREAMING_QUERIES = (
    "q44_stream_dedup",
    "q230_stream_dedup",
    "q232_stream_dedup_watermarked",
    "q241_stream_cdc_feed",
    "q303_stream_srm",
)


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.cluster_profile
@pytest.mark.parametrize("name", STREAMING_QUERIES)
def test_streaming_query_under_cluster_profile(spark, name):
    qmap = registry.QUERIES()
    assert name in qmap, f"{name} not registered"
    baseline = _rows(qmap[name](spark, SF_SMOKE))

    # spark.task.maxFailures / spark.speculation are static core confs
    # — configure() tolerates the failed set on a live session, and the
    # save/restore here must do the same (only SQL confs round-trip)
    saved = {}
    for k in list(PROFILES["cluster"]) + ["spark.sql.shuffle.partitions"]:
        try:
            saved[k] = spark.conf.get(k, None)
        except Exception:
            pass
    try:
        configure(spark, profile="cluster")
        # see module docstring: clamp WIDTH, keep the RocksDB posture
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        # the posture actually under test must have landed
        assert "RocksDBStateStoreProvider" in spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
        assert (
            spark.conf.get(
                "spark.sql.streaming.stateStore.rocksdb"
                ".boundedMemoryUsage"
            )
            == "true"
        )
        got = _rows(qmap[name](spark, SF_SMOKE))
    finally:
        for k, v in saved.items():
            try:
                if v is None:
                    spark.conf.unset(k)
                else:
                    spark.conf.set(k, v)
            except Exception:
                pass
    assert got == baseline, (
        f"{name}: cluster-profile rows diverge from local-profile rows"
    )
