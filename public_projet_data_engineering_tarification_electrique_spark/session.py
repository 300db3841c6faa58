"""SparkSession factory and runtime configuration.

Design notes (100 TB posture):
- AQE on everywhere: runtime coalescing, skew-join splitting, and
  dynamic join-strategy switching replace hand-tuned partition counts
  when the real cluster sees real data volumes.
- ``spark.sql.shuffle.partitions`` defaults to the local core count for
  tests; on a real cluster this is sized so a shuffle partition is
  ~128-256 MB (AQE coalesces the rest).
- ``nanosAsLong``: the driver testdata's ``events.parquet`` carries
  TIMESTAMP(NANOS) which Spark's vectorized parquet reader rejects;
  reading nanos as LONG and normalizing to ``timestamp_ntz`` keeps the
  scan vectorized (see sources.tables.load_table).
- Arrow enabled for any pandas interchange (Pandas UDFs, toPandas).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that can be applied to an already-running session (runtime SQL
# confs). The driver harness creates its own SparkSession, so every
# entry point calls configure(spark) before reading testdata.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # events.parquet stores TIMESTAMP(NANOS); read as LONG, normalize later.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Push count/min/max straight into parquet footers when possible.
    "spark.sql.parquet.aggregatePushdown": "true",
    # Idempotent daily append: overwrite only the touched (date) partitions.
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
}


# Deployment profiles — the 100 TB posture as RUNNABLE config, not
# prose. Select with configure(spark, profile="cluster") or the
# SPARK_GRAFT_PROFILE env var; "local" (default) keeps the test-box
# sizing and overrides nothing beyond RUNTIME_CONFS.
#
# "cluster" sizing story (the docstring promise, made concrete):
# - shuffle.partitions: the STARTING width for a 1000-executor fleet.
#   AQE coalesces down to advisoryPartitionSizeInBytes, so the rule is
#   "start wide, let AQE shrink": 8000 initial partitions over a
#   ~1-2 TB shuffle → ~128-256 MB each post-coalesce; a 100 TB scan
#   rarely shuffles its full volume (pre-agg partials, broadcasts,
#   partition pruning land first).
# - advisoryPartitionSizeInBytes 128m: AQE's coalesce/skew-split
#   target — the per-task unit that fits executor memory with room
#   for sort spill headroom.
# - files.maxPartitionBytes 256m: scan-side split so a 100 TB parquet
#   read yields ~400k well-sized tasks instead of millions of tiny
#   ones (driver scheduling pressure) or thousands of 1 GB+ stragglers.
# - autoBroadcastJoinThreshold 256m: cluster executors (16-64 GB) can
#   hold a dimension an order larger than the 64 MB local default;
#   every broadcast is one avoided full shuffle of the fact side.
# - RocksDB state store: streaming state (dedup fingerprints, session
#   maps) spills to local disk and checkpoints incrementally — an
#   in-memory HashMap provider OOMs once keyed state outgrows the
#   executor heap.
# - maxFailures/speculation: at 1000 executors, hardware flakes are
#   routine; speculative re-attempts cut p99 stage tails caused by a
#   single slow node.
PROFILES: dict[str, dict[str, str]] = {
    "local": {},
    "cluster": {
        "spark.sql.shuffle.partitions": "8000",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "128m",
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum": "8000",
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.autoBroadcastJoinThreshold": str(256 * 1024 * 1024),
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider"
        ),
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing"
        ".enabled": "true",
        # bounded RocksDB memory: without it, every state store
        # instance on an executor sizes its own block cache + write
        # buffers independently and a wide stateful stage (200+ state
        # partitions per executor) OOMs the container from OUTSIDE the
        # JVM heap. One shared 2 GiB budget per executor, enforced by
        # RocksDB's write-buffer-manager.
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage": (
            "true"
        ),
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB": "2048",
        "spark.task.maxFailures": "4",
        "spark.speculation": "true",
    },
}


#: applicationIds whose executors already received our package zip
#: (id(sc) would collide when a stopped context's address is reused).
_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executor Python workers via ``addPyFile``.

    Pandas-UDF / applyInPandas functions defined at module scope are
    pickled BY REFERENCE, so the worker must be able to import the
    package. When the driver process runs outside the repo (the grading
    harness, a spark-submit from elsewhere), workers would fail with
    ModuleNotFoundError. Zipping the package once per context and
    distributing it through Spark's file server is the same mechanism
    ``--py-files`` uses on a real cluster — correct in local and
    cluster mode alike.
    """
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    pkg_name = os.path.basename(pkg_dir)
    zpath = os.path.join(
        tempfile.mkdtemp(prefix="pkgship_"), f"{pkg_name}.zip"
    )
    with zipfile.ZipFile(zpath, "w", zipfile.ZIP_STORED) as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            for fname in files:
                if not fname.endswith(".py"):
                    continue
                full = os.path.join(root, fname)
                rel = os.path.join(pkg_name, os.path.relpath(full, pkg_dir))
                zf.write(full, rel)
    sc.addPyFile(zpath)
    _SHIPPED.add(sc.applicationId)


def configure(
    spark: SparkSession, profile: str | None = None
) -> SparkSession:
    """Apply runtime confs to an existing session (driver-owned or ours).

    ``profile`` overlays a deployment profile from ``PROFILES`` on top
    of RUNTIME_CONFS; defaults to $SPARK_GRAFT_PROFILE, else "local"
    (no overlay). Unknown names raise — a typo'd profile silently
    running with test-box sizing on a 1000-executor fleet is exactly
    the failure this switch exists to prevent.
    """
    if profile is None:
        profile = os.environ.get("SPARK_GRAFT_PROFILE", "local")
    if profile not in PROFILES:
        raise ValueError(
            f"unknown profile {profile!r}; expected one of {sorted(PROFILES)}"
        )
    merged = {**RUNTIME_CONFS, **PROFILES[profile]}
    for k, v in merged.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Static conf on this build — only settable at session creation.
            pass
    try:
        _ship_package(spark)
    except Exception:
        # Never let code-shipping break a session that can already
        # import the package (e.g. driver cwd == repo root).
        pass
    return spark


def get_spark(
    app_name: str = "tarification-electrique-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a tuned SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores); on a real cluster pass ``None`` and submit with
    ``spark-submit --master yarn/k8s``.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    # local[N, 4]: the local scheduler IGNORES spark.task.maxFailures
    # (hardcoded single attempt) and only honors a retry count embedded
    # in the master string — without it the T4 retry contract would not
    # exist where this code actually runs.
    master = master or f"local[{cpus},4]"
    if shuffle_partitions is None:
        # size from the SAME source as the local master's core count —
        # a SPARK_GRAFT_CPUS-capped run must not inherit machine-wide
        # partition counts (48× cores of near-empty shuffle tasks)
        if cpus != "*" and cpus.isdigit():
            shuffle_partitions = int(cpus)
        else:
            shuffle_partitions = os.cpu_count() or 8

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Retry-on-failure (reference DAG retries=1,
        # reference:airflow/dags/insert_conso_jour_region_in_bq.py):
        # Spark retries at TASK granularity instead of whole-DAG-task.
        # The conf governs CLUSTER schedulers; the local master embeds
        # its own retry count in the master string above (the local
        # scheduler ignores this conf).
        .config("spark.task.maxFailures", "4")
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return configure(spark)
