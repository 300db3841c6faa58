"""Batch MERGE INTO — the Delta/Iceberg-style keyed upsert expressed
on plain DataFrames and bucket-pruned parquet (extension surface; the
idempotent keyed append the reference's WRITE_APPEND loop implies —
reference 0_insert_conso_an_ville_in_bq.py:100-113 re-appends blindly,
SURVEY §2.9 flags the idempotency gap; partition-overwrite backfill
(q118) covers whole-partition replacement, this covers KEYED upsert
with the full WHEN MATCHED / NOT MATCHED / DELETE clause set).

Two layers, mirroring streaming/upsert.py:

- :func:`merge_into` — the PLAN: one full-outer join on the merge key
  plus CASE projections implementing
  ``WHEN MATCHED [AND cond] THEN DELETE``,
  ``WHEN MATCHED THEN UPDATE SET ...``,
  ``WHEN NOT MATCHED [AND cond] THEN INSERT``.
  Exactly the logical plan Delta's MERGE compiles to, so it is
  SQL-expressible and oracle-checkable, and Catalyst is free to pick
  the physical join (AQE broadcasts a small CDC batch against a large
  target; at 100 TB both sides bucket-partition on the key and the
  join is co-located).

- :func:`merge_write` — the SINK: applies the merge against a
  bucket-partitioned parquet state dir and rewrites ONLY the buckets
  the source touches (static isin pruning from a ≤ n_buckets driver
  list + dynamic partition overwrite — the batch twin of
  streaming/upsert._merge_batch). The merge is a pure function of
  (state, batch), so a replay is idempotent exactly when the
  ``update_set`` is last-write-wins (columns taken from the source);
  an ADDITIVE update expression (e.g. ``n + src("n")``) re-applies on
  replay UNLESS the caller passes ``batch_id`` — the Delta-style txn
  ledger (``_merge_ledger.json``) then skips already-applied ids
  (tests/test_merge_streamdedup.py pins all three behaviours).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

#: prefix under which source value columns ride through the join
_SRC = "_src_"


def src(col: str) -> Column:
    """Reference a SOURCE column inside a ``merge_into`` update
    expression or condition (target columns are referenced by their
    plain name)."""
    return F.col(_SRC + col)


def _validated_update_set(
    target_cols: list[str],
    source_cols: list[str],
    keys: list[str],
    update_set: dict[str, Column] | None,
) -> dict[str, Column]:
    """Shared clause validation for the merge family (same error
    surface as always; factored so the plan, the changelog, and the
    fused sink validate identically)."""
    if not keys:
        raise ValueError("keys must be non-empty")
    missing = [c for c in target_cols if c not in source_cols]
    if missing:
        raise ValueError(f"source lacks target columns: {missing}")
    update_set = dict(update_set or {})
    unknown = [c for c in update_set if c not in target_cols or c in keys]
    if unknown:
        raise ValueError(f"update_set targets non-value columns: {unknown}")
    return update_set


def _merge_join(
    target: DataFrame, source: DataFrame, keys: list[str]
) -> DataFrame:
    """The ONE full-outer join every merge surface projects from:
    target columns by name, source value columns under the ``_src_``
    prefix, plus ``_t_present``/``_s_present`` match flags."""
    s = source.select(
        *[F.col(k) for k in keys],
        *[
            F.col(c).alias(_SRC + c)
            for c in source.columns
            if c not in keys
        ],
        F.lit(True).alias("_s_present"),
    )
    t = target.withColumn("_t_present", F.lit(True))
    return t.join(s, on=keys, how="full_outer")


class MergeProjections:
    """Prebuilt expression trees for the merge family — the
    construction-time memo for per-batch loops (guide §1.2 applied to
    the driver boundary): every Column here is a pure function of
    (state schema, keys, clause expressions), reusable verbatim across
    micro-batches because Columns are immutable unresolved trees.
    Rebuilding them per batch cost ~0.6 s of pure Py4J chatter per
    q241 CDC micro-batch (measured r13) — at ANY data scale.

    Build once per stream (source/target schemas fixed by the stream's
    contract), pass to :func:`merge_write_cdf`; the one-shot callers
    (:func:`merge_into`, :func:`merge_changes`) build it inline, so
    clause semantics live in exactly one place either way.
    """

    def __init__(
        self,
        state_cols: list[str],
        source_cols: list[str],
        keys: list[str],
        update_set: dict[str, Column] | None,
        delete_when: Column | None,
        insert_when: Column | None,
        include_preimages: bool = True,
    ) -> None:
        update_set = _validated_update_set(
            list(state_cols), list(source_cols), list(keys), update_set
        )
        self.state_cols = list(state_cols)
        self.keys = list(keys)
        self.include_preimages = include_preimages

        matched = (
            F.col("_t_present").isNotNull() & F.col("_s_present").isNotNull()
        )
        src_only = F.col("_t_present").isNull()

        # --- into (post-merge state) pieces ---
        keep = F.lit(True)
        if delete_when is not None:
            keep = keep & ~(matched & F.coalesce(delete_when, F.lit(False)))
        if insert_when is not None:
            keep = keep & ~(
                src_only & ~F.coalesce(insert_when, F.lit(False))
            )
        self._keep = keep
        self._into_cols = []
        for c in self.state_cols:
            if c in self.keys:
                self._into_cols.append(F.col(c))
            else:
                updated = update_set.get(c, src(c))
                self._into_cols.append(
                    F.when(matched, updated)
                    .when(src_only, src(c))
                    .otherwise(F.col(c))
                    .alias(c)
                )

        # --- changes (CDF row set) pieces ---
        deleted = matched & (
            F.coalesce(delete_when, F.lit(False))
            if delete_when is not None
            else F.lit(False)
        )
        inserted = src_only & (
            F.coalesce(insert_when, F.lit(True))
            if insert_when is not None
            else F.lit(True)
        )
        post_label = "update_postimage" if include_preimages else "update"
        self._change = (
            F.when(deleted, F.lit("delete"))
            .when(matched, F.lit(post_label))
            .when(inserted, F.lit("insert"))
        )
        self._changes_cols = []
        for c in self.state_cols:
            if c in self.keys:
                self._changes_cols.append(F.col(c))
            else:
                updated = update_set.get(c, src(c))
                self._changes_cols.append(
                    F.when(F.col("_change_type") == "delete", F.col(c))
                    .when(F.col("_change_type") == post_label, updated)
                    .otherwise(src(c))
                    .alias(c)
                )
        self._pre_filter = matched & ~deleted
        self._pre_cols = [F.col(c) for c in self.state_cols] + [
            F.lit("update_preimage").alias("_change_type")
        ]

    def into(self, joined: DataFrame) -> DataFrame:
        """merge_into's clause semantics as a pure projection of the
        :func:`_merge_join` frame."""
        return joined.filter(self._keep).select(*self._into_cols)

    def changes(self, joined: DataFrame) -> DataFrame:
        """merge_changes's CDF row set as a pure projection of the
        :func:`_merge_join` frame."""
        affected = joined.withColumn("_change_type", self._change).filter(
            F.col("_change_type").isNotNull()
        )
        out = affected.select(*self._changes_cols, "_change_type")
        if not self.include_preimages:
            return out
        # Delta CDF's update_preimage rows: the target's values BEFORE
        # the merge, for exactly the matched-and-updated keys. Same
        # joined frame, plain target-column projection — the shared
        # subplan means Catalyst computes the full-outer join once.
        pre = joined.filter(self._pre_filter).select(*self._pre_cols)
        return out.unionByName(pre)


def _into_projection(
    joined: DataFrame,
    target_cols: list[str],
    keys: list[str],
    update_set: dict[str, Column],
    delete_when: Column | None,
    insert_when: Column | None,
) -> DataFrame:
    """merge_into's clause semantics as a pure projection of the
    :func:`_merge_join` frame (so a caller holding a materialized
    joined frame can derive the post-merge state without re-joining).
    One-shot convenience over :class:`MergeProjections`; update_set
    must already be validated (it is re-validated trivially here via
    the shared constructor against target columns)."""
    return MergeProjections(
        target_cols, list(target_cols), keys, update_set,
        delete_when, insert_when,
    ).into(joined)


def _changes_projection(
    joined: DataFrame,
    target_cols: list[str],
    keys: list[str],
    update_set: dict[str, Column],
    delete_when: Column | None,
    insert_when: Column | None,
    include_preimages: bool,
) -> DataFrame:
    """merge_changes's CDF row set as a pure projection of the
    :func:`_merge_join` frame — same sharing rationale as
    :func:`_into_projection`."""
    return MergeProjections(
        target_cols, list(target_cols), keys, update_set,
        delete_when, insert_when, include_preimages,
    ).changes(joined)


def merge_into(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_set: dict[str, Column] | None = None,
    delete_when: Column | None = None,
    insert_when: Column | None = None,
) -> DataFrame:
    """MERGE ``source`` into ``target`` on ``keys``; returns the merged
    frame (same schema and column order as ``target``).

    Clause semantics (ANSI/Delta):

    - matched + ``delete_when`` true → row dropped;
    - matched otherwise → value columns from ``update_set`` (an
      expression per column, referencing target columns by name and
      source columns via :func:`src`); columns absent from
      ``update_set`` default to the source value (last-write-wins);
    - source-only + ``insert_when`` (default true) → inserted with the
      source's values; source-only rows failing ``insert_when`` are
      dropped (tombstones for keys that never existed);
    - target-only → kept unchanged.

    ``source`` must contain every ``target`` column; extra source
    columns (CDC op flags, batch ids) are visible to the conditions
    via :func:`src` but never emitted. Source keys must be unique
    (one CDC row per key — the caller's contract, as in Delta, where
    duplicate source keys make MERGE nondeterministic). NULL key
    values never match (SQL join equality, same as Delta/ANSI MERGE):
    a NULL-key source row is treated as not-matched even if a NULL-key
    target row exists.
    """
    update_set = _validated_update_set(
        target.columns, source.columns, keys, update_set
    )
    joined = _merge_join(target, source, keys)
    return _into_projection(
        joined, target.columns, keys, update_set, delete_when, insert_when
    )


def merge_changes(
    target: DataFrame,
    source: DataFrame,
    keys: list[str],
    update_set: dict[str, Column] | None = None,
    delete_when: Column | None = None,
    insert_when: Column | None = None,
    include_preimages: bool = False,
) -> DataFrame:
    """The CHANGE DATA FEED of a merge (Delta CDF's row-level
    changelog): instead of the post-merge state, emit one row per
    AFFECTED key — ``_change_type`` ∈ {'insert', 'update', 'delete'} —
    with the post-image values (the pre-merge target values for a
    delete, since there is no post-image). Unaffected target-only rows
    emit nothing; a matched non-delete row is always an 'update' (like
    Delta, no value-diff suppression — downstream consumers own
    no-op filtering). Same clause semantics, same caller contracts
    (unique source keys, NULL keys never match) as :func:`merge_into`.

    ``include_preimages=True`` switches to Delta CDF's FULL row set:
    updates emit TWO rows — ``update_preimage`` (the target's values
    before the merge) and ``update_postimage`` — exactly Delta's
    ``_change_type`` vocabulary. The pre-image rows are what make the
    feed RETRACTION-complete: a downstream aggregate can be maintained
    incrementally as ``+postimage − preimage`` without ever rereading
    the base table (q237). Plan: the post-image projection plus one
    extra projection of the SAME joined frame unioned in — Catalyst
    reuses the join via the shared subplan, no second shuffle of the
    inputs.

    This is what downstream incremental consumers subscribe to —
    cache invalidation, index refresh, replication — without diffing
    two 100 TB snapshots: the feed is bounded by the batch, not the
    table. Plan shape: the same single full-outer join, one CASE
    projection; Catalyst/AQE treat it exactly like merge_into.
    """
    update_set = _validated_update_set(
        target.columns, source.columns, keys, update_set
    )
    joined = _merge_join(target, source, keys)
    return _changes_projection(
        joined,
        target.columns,
        keys,
        update_set,
        delete_when,
        insert_when,
        include_preimages,
    )

def apply_changes(
    state: DataFrame,
    changes: DataFrame,
    keys: list[str],
) -> DataFrame:
    """Roll a snapshot FORWARD by one CDF batch — the consumer side of
    :func:`merge_changes`, and the replay step of changelog-based TIME
    TRAVEL (q236): ``state@v+1 = apply_changes(state@v, cdf@v+1)``.
    A reader reconstructs any historical version from the base
    snapshot plus the (bounded) changelogs, never diffing or copying
    full table snapshots.

    Semantics: keys present in ``changes`` take their post-image
    ('insert' / 'update' / 'update_postimage' rows); 'delete' (and
    'update_preimage') rows contribute no survivor; untouched state
    rows pass through. Plan: one left-anti join of state against the
    change keys + a union of the post-images — at 100 TB the anti join
    is key-bucketed and the union is scan-free; the changelog side is
    O(batch), and AQE broadcasts it when small.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    missing = [c for c in state.columns if c not in changes.columns]
    if missing:
        raise ValueError(f"changes lack state columns: {missing}")
    touched = changes.select(*keys).distinct()
    survivors = state.join(touched, on=keys, how="left_anti")
    post = changes.filter(
        F.col("_change_type").isin("insert", "update", "update_postimage")
    ).select(*state.columns)
    return survivors.unionByName(post)


def merge_write(
    spark: SparkSession,
    state_dir: str,
    source: DataFrame,
    keys: list[str],
    state_schema: str,
    n_buckets: int = 8,
    update_set: dict[str, Column] | None = None,
    delete_when: Column | None = None,
    insert_when: Column | None = None,
    batch_id: int | None = None,
) -> bool:
    """Apply one MERGE batch to a bucket-partitioned parquet state dir,
    rewriting only the buckets the source touches. Returns True if the
    batch was applied, False if it was skipped as an already-applied
    replay (see ``batch_id``).

    ``batch_id`` (optional, monotonically increasing — Structured
    Streaming's foreachBatch epoch id fits directly) makes REPLAYS of
    additive merges exactly-once: the Delta-style txn-ledger pattern.
    A ``_merge_ledger.json`` marker records the last applied id; a
    batch with ``batch_id <= last`` is skipped instead of re-applied —
    without it, an at-least-once upstream re-delivering a batch
    double-applies any additive ``update_set`` (n + src(n)); see the
    module docstring. The ledger is updated AFTER the data write, so
    the remaining at-least-once window is a crash between the two —
    one batch wide, same as any non-transactional sink. Passing
    batch_id=None keeps the unledgered behavior (correct for
    last-write-wins merges, which are naturally idempotent).

    Bucket = pmod(xxhash64(keys), n_buckets) — stable across runs, so
    a key always lives in the same file group and the per-batch scan
    is O(affected buckets), not O(table). ``state_schema`` is the DDL
    of the state WITHOUT the ``_bucket`` column (declared schema read,
    never inference — same discipline as streaming/upsert). The layout
    is self-describing: the first write persists (n_buckets, keys,
    hash fn) to a ``_bucket_layout.json`` marker and every later batch
    asserts against it — re-running with a different n_buckets raises
    instead of silently mis-pruning.
    """
    from .util import (
        bucket_layout_guard,
        hadoop_fs,
        read_json_marker,
        write_json_marker,
    )

    if batch_id is not None:
        ledger = read_json_marker(spark, state_dir, "_merge_ledger.json")
        if ledger is not None and batch_id <= ledger["last_batch_id"]:
            return False  # already-applied replay

    commit_layout = bucket_layout_guard(
        spark,
        state_dir,
        {
            "n_buckets": int(n_buckets),
            "keys": list(keys),
            "hash": "pmod(xxhash64(keys), n_buckets)",
        },
    )
    bucket = F.pmod(F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)).cast(
        "int"
    )
    new = source.withColumn("_bucket", bucket).persist()
    try:
        fs, hpath = hadoop_fs(spark, state_dir)
        affected: list[int] = []
        if fs.exists(hpath):
            affected = [
                r["_bucket"] for r in new.select("_bucket").distinct().collect()
            ]
            old = (
                spark.read.schema(state_schema + ", _bucket int")
                .parquet(state_dir)
                .filter(F.col("_bucket").isin(affected))
            )
            merged = merge_into(
                old,
                new,
                keys=keys,
                update_set=update_set,
                delete_when=delete_when,
                insert_when=insert_when,
            )
        else:
            # fresh state: insert-only path. insert_when references
            # source columns via src() — rename, filter, project down
            # to the declared state columns (+ _bucket).
            state_cols = spark.createDataFrame([], state_schema).columns
            ins = new.select(
                *[F.col(k) for k in keys],
                *[
                    F.col(c).alias(_SRC + c)
                    for c in new.columns
                    if c not in keys
                ],
            )
            if insert_when is not None:
                ins = ins.filter(F.coalesce(insert_when, F.lit(False)))
            merged = ins.select(
                *[
                    F.col(c if c in keys else _SRC + c).alias(c)
                    for c in state_cols
                ],
                F.col(_SRC + "_bucket").alias("_bucket"),
            )
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # Cluster on _bucket before the write: a partitionBy write
            # emits one file per (task, bucket) pair, so an unclustered
            # P-partition frame sprays up to P small files into EVERY
            # rewritten bucket dir — the small-files decay that kills
            # scan/list performance on big state tables. One shuffle of
            # the (bucket-count-sized) merge output keeps each bucket
            # at one file per rewrite (set
            # spark.sql.files.maxRecordsPerFile to re-split buckets
            # that outgrow a single task's write).
            n_out = max(len(affected) if affected else int(n_buckets), 1)
            merged = merged.repartition(n_out, "_bucket")
            # materialize before overwriting the dir being read
            merged = merged.localCheckpoint(eager=True)
            merged.write.mode("overwrite").partitionBy("_bucket").parquet(
                state_dir
            )
            commit_layout()
            # dynamic overwrite cannot DELETE a partition by writing
            # zero rows to it: an affected bucket whose every key was
            # deleted keeps its stale files unless dropped explicitly
            # (≤ n_buckets driver-side dirs — bounded).
            if affected:
                present = {
                    r["_bucket"]
                    for r in merged.select("_bucket").distinct().collect()
                }
                for b in affected:
                    if b not in present:
                        sub_fs, sub_path = hadoop_fs(
                            spark, os.path.join(state_dir, f"_bucket={b}")
                        )
                        sub_fs.delete(sub_path, True)
            if batch_id is not None:
                write_json_marker(
                    spark,
                    state_dir,
                    "_merge_ledger.json",
                    {"last_batch_id": int(batch_id)},
                )
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    finally:
        new.unpersist()
    return True


def merge_write_cdf(
    spark: SparkSession,
    state_dir: str,
    source: DataFrame,
    changelog_dir: str,
    keys: list[str],
    state_schema: str,
    n_buckets: int = 8,
    update_set: dict[str, Column] | None = None,
    delete_when: Column | None = None,
    insert_when: Column | None = None,
    batch_id: int | None = None,
    include_preimages: bool = True,
    projections: MergeProjections | None = None,
) -> bool:
    """:func:`merge_write` and :func:`merge_changes` FUSED for the
    streaming CDC loop: apply one MERGE batch to the bucketed state
    dir AND append its Delta-CDF row set (tagged ``_batch_id``) to
    ``changelog_dir`` — from ONE shared full-outer join per batch.

    ``projections``: the prebuilt :class:`MergeProjections` for this
    stream's (state schema, source schema, clauses). Per-batch loops
    SHOULD build it once and pass it here — rebuilding the expression
    trees per micro-batch costs ~0.6 s of driver-side Py4J work at any
    data size (measured r13, the q241 wall-clock driver). When None,
    it is built from the call's arguments (one-shot callers).

    Why a fused sink exists at all: run separately, every micro-batch
    pays the state scan and the merge join TWICE (once for the feed,
    once for the apply) plus a defensive checkpoint of the merged
    state because the apply reads the very files it overwrites. Here
    the joined frame — bounded by the batch plus the affected
    buckets' rows, never the table — is bucket-clustered and lazily
    ``localCheckpoint``-ed; the changelog append materializes it and
    the post-merge state is then a shuffle-free projection of those
    blocks, with the emptied-bucket check riding the write as an
    ``Observation``. Three jobs per batch — affected discovery,
    changelog write, state write — vs the ~six the unfused pair runs
    (the q241 SLA driver). Same bucket layout, ledger, and clause
    semantics as
    :func:`merge_write` — and strictly BETTER exactly-once: the
    ledger skip now guards the changelog append too, so an
    at-least-once replay can't double-feed downstream consumers.

    Returns True if applied, False for an already-applied replay.
    """
    from .util import (
        bucket_layout_guard,
        hadoop_fs,
        read_json_marker,
        write_json_marker,
    )

    if batch_id is not None:
        ledger = read_json_marker(spark, state_dir, "_merge_ledger.json")
        if ledger is not None and batch_id <= ledger["last_batch_id"]:
            return False  # already-applied replay

    if projections is None:
        projections = MergeProjections(
            spark.createDataFrame([], state_schema).columns,
            source.columns,
            keys,
            update_set,
            delete_when,
            insert_when,
            include_preimages,
        )
    commit_layout = bucket_layout_guard(
        spark,
        state_dir,
        {
            "n_buckets": int(n_buckets),
            "keys": list(keys),
            "hash": "pmod(xxhash64(keys), n_buckets)",
        },
    )
    bucket = F.pmod(
        F.xxhash64(*[F.col(k) for k in keys]), F.lit(n_buckets)
    ).cast("int")

    fs, hpath = hadoop_fs(spark, state_dir)
    # the batch feeds TWO consumers (affected-bucket discovery and the
    # merge join) — persist it once, the merge_write convention, so
    # neither pays a second scan of the batch's upstream lineage
    src_b = source.withColumn("_bucket", bucket).persist()
    try:
        if fs.exists(hpath):
            affected = [
                r["_bucket"]
                for r in src_b.select("_bucket").distinct().collect()
            ]
            target = (
                spark.read.schema(state_schema + ", _bucket int")
                .parquet(state_dir)
                .filter(F.col("_bucket").isin(affected))
                .drop("_bucket")
            )
        else:
            affected = []
            target = spark.createDataFrame([], state_schema)

        # ONE materialization per batch: the joined frame (affected
        # buckets + batch, never the table), already clustered on
        # _bucket so the state write below is shuffle-free and keeps the
        # one-file-per-bucket invariant. The checkpoint is LAZY — the
        # changelog append (the first action) materializes it as a side
        # effect, so the batch runs exactly three jobs: the affected-
        # bucket discovery, the changelog write, and the state write.
        n_out = max(len(affected) if affected else int(n_buckets), 1)
        joined = (
            _merge_join(target, src_b.drop("_bucket"), keys)
            .withColumn("_bucket", bucket)
            .repartition(n_out, "_bucket")
            .localCheckpoint(eager=False)
        )

        changes = projections.changes(joined)
        if batch_id is not None:
            changes = changes.withColumn(
                "_batch_id", F.lit(int(batch_id)).cast("int")
            )
        # the post/pre union doubles the partition count (2×n_out);
        # coalesce pairs them back without a shuffle — half the output
        # files and commit ops per batch, same parallelism as the state
        # write (the changelog is O(batch) rows by the CDC contract, so
        # n_out-sized files are the right grain at any scale)
        changes.coalesce(n_out).write.mode("append").parquet(changelog_dir)

        merged = projections.into(joined).withColumn("_bucket", bucket)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            # the frame is checkpoint-backed so the dynamic overwrite of
            # the dirs it came from is safe; an Observation on the write
            # job reports which buckets actually received rows — the
            # empties check below costs NO extra job.
            observation = Observation()
            merged = merged.observe(
                observation, F.collect_set("_bucket").alias("present")
            )
            merged.write.mode("overwrite").partitionBy("_bucket").parquet(
                state_dir
            )
            commit_layout()
            if affected:
                # dynamic overwrite cannot DELETE a partition by writing
                # zero rows to it: an affected bucket whose every key was
                # deleted keeps its stale files unless dropped explicitly
                # (≤ n_buckets driver-side dirs — bounded).
                present = set(observation.get["present"])
                for b in affected:
                    if b not in present:
                        sub_fs, sub_path = hadoop_fs(
                            spark, os.path.join(state_dir, f"_bucket={b}")
                        )
                        sub_fs.delete(sub_path, True)
            if batch_id is not None:
                write_json_marker(
                    spark,
                    state_dir,
                    "_merge_ledger.json",
                    {"last_batch_id": int(batch_id)},
                )
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
    finally:
        # unpersist on EVERY exit path: merge_write_cdf calls
        # this once per micro-batch, so a raise between the
        # persist and the old late try/finally would leak one
        # cached batch per failed batch (ADVICE r11)
        src_b.unpersist()
    return True


def compact_buckets(
    spark: SparkSession,
    state_dir: str,
    state_schema: str,
) -> dict[int, tuple[int, int]]:
    """OPTIMIZE/compaction pass over a ``_bucket=``-partitioned parquet
    state dir: rewrite every fragmented bucket to ONE file (per-bucket
    shuffle clustering, same discipline as merge_write's write path),
    preserving rows bit-for-bit. Returns ``{bucket: (files_before,
    files_after)}``.

    This is the maintenance job every long-lived keyed sink needs:
    each trigger/batch appends or rewrites files, and without periodic
    compaction the file count — not the data — becomes the scan/list
    bottleneck (the Delta OPTIMIZE / Iceberg rewrite_data_files job).
    Scale shape: the data moves through ONE hash exchange on _bucket
    (each bucket lands in a single task, so a single output file; set
    spark.sql.files.maxRecordsPerFile to re-split buckets that
    outgrow one file); the file listing is driver-side but bounded by
    n_buckets, never by rows. Already-compact buckets are skipped —
    cost ∝ fragmented buckets, like merge_write's touched-bucket
    pruning."""
    from .util import hadoop_fs

    fs, root = hadoop_fs(spark, state_dir)
    if not fs.exists(root):
        raise ValueError(f"no state dir at {state_dir}")

    def _bucket_files() -> dict[int, int]:
        out: dict[int, int] = {}
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not name.startswith("_bucket="):
                continue
            b = int(name.split("=", 1)[1])
            out[b] = sum(
                1
                for f in fs.listStatus(st.getPath())
                if f.getPath().getName().endswith(".parquet")
            )
        return out

    before = _bucket_files()
    fragmented = sorted(b for b, n in before.items() if n > 1)
    if fragmented:
        df = (
            spark.read.schema(state_schema + ", _bucket int")
            .parquet(state_dir)
            .filter(F.col("_bucket").isin(fragmented))
        )
        compacted = df.repartition(len(fragmented), "_bucket")
        # materialize before overwriting the dirs being read
        compacted = compacted.localCheckpoint(eager=True)
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", None)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            compacted.write.mode("overwrite").partitionBy("_bucket").parquet(
                state_dir
            )
        finally:
            if prev is None:
                spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
            else:
                spark.conf.set(
                    "spark.sql.sources.partitionOverwriteMode", prev
                )
    after = _bucket_files()
    return {b: (before[b], after[b]) for b in sorted(before)}
