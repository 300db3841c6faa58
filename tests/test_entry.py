"""Smoke tests of the driver contract (__spark_entry__.py)."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "__spark_entry__",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "__spark_entry__.py"),
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "price" in df.columns


def test_queries_and_oracles_aligned(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)


def test_each_query_runs_on_smoke_sf(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_rotation_floats_unproven_queries_first():
    """The driver's correctness window replays queries() in iteration
    order and truncates at ~50 entries; the rotation must place every
    query lacking current driver evidence (stale FAIL, never sampled,
    or rewritten since its last row) inside that window."""
    from public_projet_data_engineering_tarification_electrique_spark.plans.registry import (
        _RESAMPLE_PRIORITY,
        _driver_verified,
    )

    verified, failed, rounds = _driver_verified()
    names = list(entry_mod.queries())
    window = {n.split("_", 1)[0] for n in names[:50]}
    all_ids = {n.split("_", 1)[0] for n in names}
    unproven = (
        set(failed)
        | (all_ids - set(verified))
        | {
            q
            for q, rewritten_in in _RESAMPLE_PRIORITY.items()
            if rounds.get(q, 0) < rewritten_in
        }
    )
    missing = (unproven & all_ids) - window
    # the window holds 50; if more than 50 queries lack evidence the
    # overflow is expected to wait for the NEXT round's rotation
    assert len(missing) == max(0, len(unproven & all_ids) - 50), (
        f"unproven queries left outside the driver window: {sorted(missing)}"
    )


def test_rotation_refreshes_stalest_green_evidence_first():
    """Within the already-verified tier the iteration order must be
    oldest-evidence-first, so the driver window's leftover slots
    re-prove the stalest green rows instead of re-burning slots on
    queries verified just last round."""
    from public_projet_data_engineering_tarification_electrique_spark.plans.registry import (
        _RESAMPLE_PRIORITY,
        _driver_verified,
    )

    verified, failed, rounds = _driver_verified()
    green_rounds = []
    for name in entry_mod.queries():
        qid = name.split("_", 1)[0]
        needs_resample = rounds.get(qid, 0) < _RESAMPLE_PRIORITY.get(qid, 0)
        if qid in verified and qid not in failed and not needs_resample:
            green_rounds.append(rounds.get(qid, 0))
    assert green_rounds == sorted(green_rounds), (
        "verified-tier iteration is not stalest-evidence-first"
    )


def test_cluster_profile_confs_apply(spark):
    """configure(spark, profile="cluster") must land the 100 TB posture
    as real runtime confs — AQE advisory size, scan split, broadcast
    threshold, RocksDB streaming state — and restore cleanly (the
    profile switch is VERDICT r9 item 8: runnable config, not prose)."""
    from public_projet_data_engineering_tarification_electrique_spark.session import (
        PROFILES,
        configure,
    )

    keys = list(PROFILES["cluster"])
    before = {}
    for k in keys:
        try:
            before[k] = spark.conf.get(k)
        except Exception:
            before[k] = None
    try:
        configure(spark, profile="cluster")
        assert spark.conf.get("spark.sql.shuffle.partitions") == "8000"
        assert (
            spark.conf.get(
                "spark.sql.adaptive.advisoryPartitionSizeInBytes"
            )
            == "128m"
        )
        assert spark.conf.get("spark.sql.files.maxPartitionBytes") == "256m"
        assert spark.conf.get(
            "spark.sql.autoBroadcastJoinThreshold"
        ) == str(256 * 1024 * 1024)
        assert "RocksDBStateStoreProvider" in spark.conf.get(
            "spark.sql.streaming.stateStore.providerClass"
        )
        import pytest

        with pytest.raises(ValueError):
            configure(spark, profile="nope")
    finally:
        # restore the shared test session's local sizing (static confs
        # like spark.task.maxFailures reject both set and unset)
        for k, v in before.items():
            try:
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    spark.conf.unset(k)
            except Exception:
                pass
        configure(spark, profile="local")


def test_streaming_family_green_under_rocksdb_state_store(spark):
    """The cluster profile's state-store posture must actually RUN:
    execute the stateful streaming dedup (cross-batch dropDuplicates
    state) with the RocksDB provider + changelog checkpointing +
    bounded memory pinned, and get the same result the default
    HDFS-backed provider produces (VERDICT r10 item 5 — the piece a
    100 TB streaming deployment trips on is state that outgrows the
    executor heap, which is exactly what the RocksDB provider is
    for)."""
    from public_projet_data_engineering_tarification_electrique_spark.plans import (
        registry,
    )
    from public_projet_data_engineering_tarification_electrique_spark.session import (
        PROFILES,
    )

    rocks_keys = {
        k: v
        for k, v in PROFILES["cluster"].items()
        if ".stateStore." in k
    }
    assert any("RocksDBStateStoreProvider" in v for v in rocks_keys.values())
    assert (
        rocks_keys[
            "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage"
        ]
        == "true"
    )
    sf_dir = "/root/testdata/sf0.001"
    baseline = {
        tuple(r) for r in registry.q230_stream_dedup(spark, sf_dir).collect()
    }
    before = {}
    for k in rocks_keys:
        try:
            before[k] = spark.conf.get(k)
        except Exception:
            before[k] = None
    try:
        for k, v in rocks_keys.items():
            spark.conf.set(k, v)
        got = {
            tuple(r)
            for r in registry.q230_stream_dedup(spark, sf_dir).collect()
        }
        got_wm = {
            tuple(r)
            for r in registry.q232_stream_dedup_watermarked(
                spark, sf_dir
            ).collect()
        }
    finally:
        for k, v in before.items():
            try:
                if v is not None:
                    spark.conf.set(k, v)
                else:
                    spark.conf.unset(k)
            except Exception:
                pass
    assert got == baseline
    assert len(got_wm) >= 1
