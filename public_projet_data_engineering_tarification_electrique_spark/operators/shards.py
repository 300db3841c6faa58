"""Distributed global ordering: row numbers, prefix sums, and
size-capped sorted shards without a single-partition window (extension
surface, BASELINE.json north star — the sorted-export last mile of a
training pipeline).

The naive global rank — ``row_number() OVER (ORDER BY ...)`` with no
PARTITION BY — collapses the whole table into ONE task in Spark (the
window needs a total order, so the exchange is SinglePartition). Fine
at sf0.1, fatal at 100 TB. The scale-correct construction is the
classic two-phase distributed scan:

1. ``repartitionByRange`` on the sort key — partitions are
   range-disjoint and ordered, P-way parallel.
2. Partition-LOCAL ordering: ``sortWithinPartitions`` (no exchange)
   plus the ``monotonically_increasing_id`` record-number bits for row
   numbers — or, where a true running SUM is needed, a window
   partitioned by the physical partition id (that one costs a second
   hash exchange; the row-number path costs none).
3. A bounded driver collect of per-partition aggregates (exactly P
   rows — the only driver-side data, documented here as the bound)
   turns into broadcast prefix offsets; local result + offset = exact
   global result. The same machinery yields row numbers (offset =
   prefix COUNT) and running sums (offset = prefix SUM).

The ranged exchange is ``localCheckpoint``'d before step 2: Spark's
range partitioner SAMPLES the data to pick bounds, and a recomputed
exchange may sample differently between the offsets job and the final
job — pinning the shuffle output makes the partition→offset mapping
stable across both jobs (same reason dedup.py pins its CC iterations).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _resolve_partitions(df: DataFrame, num_partitions: int | None) -> int:
    spark = df.sparkSession
    if num_partitions is None:
        # spark.sql.shuffle.partitions can be non-numeric on some
        # platforms (e.g. "auto" under AQE-advisory configs) — fall
        # back to the cluster's default parallelism rather than crash.
        try:
            p = int(spark.conf.get("spark.sql.shuffle.partitions"))
        except ValueError:
            p = spark.sparkContext.defaultParallelism
    else:
        p = num_partitions
    if p < 1:
        raise ValueError(f"num_partitions must be positive, got {p}")
    return p


def _ranged_with_offsets(
    df: DataFrame,
    order_by: list[Column],
    per_partition_total: Column,
    num_partitions: int | None,
) -> tuple[DataFrame, DataFrame, int]:
    """Range-partition ``df`` on ``order_by`` (pinned), and build the
    broadcast (pid → prefix total) table from a P-row driver collect of
    ``per_partition_total`` per physical partition. Also returns the
    grand total (the same collect already knows it — callers like
    ``global_ntile`` need N without a second job)."""
    p = _resolve_partitions(df, num_partitions)
    # LAZY checkpoint: the offsets collect just below is the action
    # that materializes it — same pinning of the sampled range bounds,
    # one job instead of two.
    ranged = (
        df.repartitionByRange(p, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    # Bounded driver collect: exactly one row per partition (= p rows,
    # thousands at cluster scale, never data-sized).
    totals = {
        r["_pid"]: r["_t"]
        for r in ranged.groupBy("_pid")
        .agg(per_partition_total.alias("_t"))
        .collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    offsets_df = F.broadcast(
        df.sparkSession.createDataFrame(
            [(pid, off) for pid, off in offsets.items()] or [(0, 0)],
            "_pid INT, _offset LONG",
        )
    )
    return ranged, offsets_df, acc


#: monotonically_increasing_id packs (partition id << 33) | record
#: number — the record-number mask (documented Spark layout).
_MID_LOW33 = (1 << 33) - 1


def _local_row_number() -> Column:
    """1-based row number within the CURRENT partition, in pipeline
    order — the lower 33 bits of ``monotonically_increasing_id``
    (documented layout: upper 31 bits partition id, lower 33 record
    number). Evaluated directly above ``sortWithinPartitions``, this
    replaces ``row_number() OVER (PARTITION BY _pid ORDER BY …)``,
    whose hash exchange on ``_pid`` re-shuffles the ENTIRE frame a
    second time (Catalyst cannot see that a checkpointed frame is
    already pid-disjoint) — at 100 TB that exchange moves the corpus
    twice for nothing. mid is nondeterministic to the optimizer, so
    the projection is never pushed below the sort. Bound: < 2^33
    (8.6 B) rows per partition, far above any sane partition size.
    """
    return F.monotonically_increasing_id().bitwiseAND(F.lit(_MID_LOW33)) + 1


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    rank_col: str = "global_rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact global row numbers under a total order, P-way parallel.

    ``order_by`` must be a TOTAL order (include a unique tie-break
    column) — range partitioning only guarantees disjoint key ranges,
    so duplicate full keys could otherwise straddle a boundary and
    make the numbering partition-dependent.

    Cost: ONE parallel shuffle (the range exchange) + a partition-local
    sort + a P-row driver collect. The local row number comes from the
    mid bit layout (see ``_local_row_number``), not a window — so no
    second exchange on the partition id. The range exchange is
    skew-bounded by the partitioner's equi-depth sampling.
    """
    ranged, offsets_df, _ = _ranged_with_offsets(
        df, order_by, F.count("*"), num_partitions
    )
    return (
        ranged.sortWithinPartitions(*order_by)
        .withColumn("_lrn", _local_row_number())
        .join(offsets_df, on="_pid", how="left")
        .withColumn(
            rank_col,
            (F.col("_lrn") + F.coalesce("_offset", F.lit(0))).cast("long"),
        )
        .drop("_pid", "_offset", "_lrn")
    )


def global_ntile(
    df: DataFrame,
    order_by: list[Column],
    n_tiles: int,
    tile_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY <total order>)`` without a
    single-partition window, P-way parallel.

    ntile is a closed-form function of the global rank once N is
    known: the first ``N mod n`` tiles hold ``ceil(N/n)`` rows, the
    rest ``floor(N/n)`` (the ANSI/Spark/DuckDB tiling). So the
    two-phase distributed rank (``global_row_number``) plus one
    literal case-expression reproduces the unpartitioned window
    bit-for-bit — and N is free, the offsets collect already summed
    it. Same total-order requirement as ``global_row_number``.
    """
    if n_tiles <= 0:
        raise ValueError(f"n_tiles must be positive, got {n_tiles}")
    ranged, offsets_df, total = _ranged_with_offsets(
        df, order_by, F.count("*"), num_partitions
    )
    q, r = divmod(total, n_tiles)
    cut = r * (q + 1)  # ranks 1..cut live in the (q+1)-sized tiles
    qs = max(q, 1)  # q == 0 ⇒ every rank ≤ cut; keep the div legal
    return (
        ranged.sortWithinPartitions(*order_by)
        .withColumn("_lrn", _local_row_number())
        .join(offsets_df, on="_pid", how="left")
        .withColumn(
            "_grn",
            (F.col("_lrn") + F.coalesce("_offset", F.lit(0))).cast("long"),
        )
        .withColumn(
            tile_col,
            F.expr(
                f"cast(case when _grn <= {cut} "
                f"then (_grn - 1) div {q + 1} + 1 "
                f"else {r} + (_grn - 1 - {cut}) div {qs} + 1 end as int)"
            ),
        )
        .drop("_pid", "_offset", "_lrn", "_grn")
    )


def global_running_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    sum_col: str = "running_sum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive prefix sum of ``value_col`` under a total order
    (``SUM(v) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)``), P-way
    parallel — the distributed prefix-scan primitive behind byte-budget
    sharding, curriculum token budgets, and quota cutoffs. Same
    total-order requirement and two-shuffle cost as
    ``global_row_number``; ``value_col`` must be integral (the prefix
    offsets accumulate in exact long arithmetic — float prefix sums
    would be partitioning-dependent).
    """
    return global_running_sums(
        df, order_by, [value_col], [sum_col], num_partitions
    )


def global_running_max(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    max_col: str = "running_max",
    exclusive: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact running MAX of ``value_col`` under a total order, P-way
    parallel — the prefix-extreme twin of ``global_running_sum``
    (staircase skylines, high-water marks). ``exclusive=True`` takes
    the max over STRICTLY-preceding rows (NULL for the global first
    row) — the Pareto-staircase frame.

    Same two-phase construction: ranged exchange (pinned), a P-row
    driver collect of per-partition maxima folded into per-partition
    carry-ins (the max over all PRIOR partitions — direction-free,
    because a partition's max does not depend on the sort direction
    inside it), and a partition-local window merged null-safely with
    the carry.
    """
    p = _resolve_partitions(df, num_partitions)
    ranged = (
        df.repartitionByRange(p, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # the collect below materializes
    )
    rows = (
        ranged.groupBy("_pid").agg(F.max(value_col).alias("_t")).collect()
    )
    totals = {r["_pid"]: r["_t"] for r in rows}
    carry_rows = []
    acc = None
    for pid in sorted(totals):
        carry_rows.append((pid, acc))
        t = totals[pid]
        if acc is None:
            acc = t
        elif t is not None:
            # Spark's ordering (and therefore the partition-local
            # F.max window below) treats NaN as GREATER than every
            # double; Python's max() is argument-order-dependent on
            # NaN. Mirror Spark so the carry is partition-count
            # independent on NaN input.
            if t != t or acc != acc:  # either side NaN → NaN wins
                acc = t if t != t else acc
            else:
                acc = max(acc, t)
    vtype = df.schema[value_col].dataType.simpleString()
    offsets_df = F.broadcast(
        df.sparkSession.createDataFrame(
            carry_rows or [(0, None)], f"_pid INT, _carry {vtype}"
        )
    )
    frame_end = -1 if exclusive else 0
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, frame_end)
    )
    local = F.max(value_col).over(local_w)
    merged = (
        F.when(local.isNull(), F.col("_carry"))
        .when(F.col("_carry").isNull(), local)
        .otherwise(F.greatest(local, F.col("_carry")))
    )
    return (
        ranged.join(offsets_df, on="_pid", how="left")
        .withColumn(max_col, merged)
        .drop("_pid", "_carry")
    )


def global_running_sums(
    df: DataFrame,
    order_by: list[Column],
    value_cols: list[str],
    sum_cols: list[str] | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact inclusive prefix sums of SEVERAL integral columns under
    one total order, sharing a single ranged exchange and a single
    P-row driver collect — the multi-measure variant of
    ``global_running_sum`` (a cumulative-distribution table wants
    both a running count and a running positive-count; paying the
    two-shuffle construction once per measure would double the cost
    for no reason).

    Same contract as the single-column form: ``order_by`` must be a
    total order, values must be integral (offsets accumulate in exact
    long arithmetic), and the cost is two P-way-parallel shuffles —
    never a single-partition window.
    """
    if not value_cols:
        raise ValueError("value_cols must be non-empty")
    if sum_cols is None:
        sum_cols = [f"{c}_running_sum" for c in value_cols]
    if len(sum_cols) != len(value_cols):
        raise ValueError(
            f"sum_cols ({len(sum_cols)}) must match value_cols "
            f"({len(value_cols)})"
        )
    p = _resolve_partitions(df, num_partitions)
    ranged = (
        df.repartitionByRange(p, *order_by)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=False)  # the collect below materializes
    )
    # Bounded driver collect: one row per partition, all measures at
    # once (p rows × k longs — never data-sized).
    rows = (
        ranged.groupBy("_pid")
        .agg(
            *[
                F.sum(F.col(c).cast("long")).alias(f"_t{i}")
                for i, c in enumerate(value_cols)
            ]
        )
        .collect()
    )
    totals = {r["_pid"]: [r[f"_t{i}"] or 0 for i in range(len(value_cols))] for r in rows}
    offset_rows = []
    acc = [0] * len(value_cols)
    for pid in sorted(totals):
        offset_rows.append((pid, *acc))
        acc = [a + t for a, t in zip(acc, totals[pid])]
    off_names = [f"_off{i}" for i in range(len(value_cols))]
    offsets_df = F.broadcast(
        df.sparkSession.createDataFrame(
            offset_rows or [(0, *([0] * len(value_cols)))],
            "_pid INT, " + ", ".join(f"{n} LONG" for n in off_names),
        )
    )
    local_w = (
        Window.partitionBy("_pid")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged.join(offsets_df, on="_pid", how="left")
    for vc, sc, on in zip(value_cols, sum_cols, off_names):
        out = out.withColumn(
            sc,
            F.sum(F.col(vc).cast("long")).over(local_w)
            + F.coalesce(on, F.lit(0)),
        )
    return out.drop("_pid", *off_names)


def sorted_shards(
    df: DataFrame,
    order_by: list[Column],
    docs_per_shard: int,
    shard_col: str = "shard_id",
    rank_col: str = "global_rn",
) -> DataFrame:
    """Assign each row to a size-capped shard of the globally sorted
    order: shard i holds ranks [i*cap+1, (i+1)*cap] — the sorted-JSONL
    export layout (curriculum order, resumable by shard, every shard
    but the last exactly full)."""
    if docs_per_shard <= 0:
        raise ValueError(f"docs_per_shard must be positive, got {docs_per_shard}")
    ranked = global_row_number(df, order_by, rank_col=rank_col)
    # integer `div`, never float division: a double quotient can round
    # across the shard boundary at extreme ranks (> ~2^47·cap) — same
    # exact-integer-grid idiom as sampling.py / asof.py / bloom.py.
    return ranked.withColumn(
        shard_col,
        F.expr(f"cast(({rank_col} - 1) div {int(docs_per_shard)} as int)"),
    )


def byte_budget_shards(
    df: DataFrame,
    order_by: list[Column],
    size_col: str,
    budget: int,
    shard_col: str = "shard_id",
    sum_col: str = "running_bytes",
) -> DataFrame:
    """Assign each row to a BYTE-budgeted shard of the globally sorted
    order: row r (with exclusive prefix bytes c_r) lands in shard
    ⌊c_r / budget⌋ — the export layout when shards must bound VOLUME,
    not row count (uploader part-size limits, token budgets per
    training chunk). A shard may overflow by at most one document
    (standard first-fit-in-order semantics; documents are not split).
    All arithmetic is exact integer — shard membership is engine- and
    partitioning-independent.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    summed = global_running_sum(df, order_by, size_col, sum_col=sum_col)
    return summed.withColumn(
        shard_col,
        F.expr(
            f"cast(({sum_col} - cast({size_col} as long)) div {int(budget)} "
            "as int)"
        ),
    )


def zone_map_audit(
    df: DataFrame,
    sort_col: str,
    tiebreak_col: str,
    docs_per_shard: int,
    pred_lo: str,
    pred_hi: str,
) -> DataFrame:
    """Zone-map audit for a sort-clustered layout: shard the table in
    globally sorted order (`sorted_shards`), record each shard's
    min/max of the sort key, and mark which shards a range predicate
    [pred_lo, pred_hi] could PRUNE — the planning artifact behind
    every 100 TB layout decision (Delta/Iceberg file skipping, parquet
    row-group min/max, ZORDER): a predicate's I/O cost is the count of
    overlapping zones, and sorting by the filter column is what makes
    that count small.

    On a sort-clustered layout the overlap count is the audit's
    headline: contiguous ranks ⇒ contiguous key ranges ⇒ the predicate
    touches O(selectivity · n_shards) zones instead of all of them.

    Plan shape: one exact global ranking (range-partitioned prefix
    counts, see `global_row_number` — no single-partition window),
    then one hash agg per shard. Output: one row per shard
    (shard_id, n_rows, min_key, max_key, overlaps_predicate).
    """
    sharded = sorted_shards(
        df.select(
            F.col(sort_col).cast("string").alias("_k"),
            F.col(tiebreak_col).alias("_tb"),
        ),
        [F.asc("_k"), F.asc("_tb")],
        docs_per_shard=docs_per_shard,
    )
    return (
        sharded.groupBy("shard_id")
        .agg(
            F.count("*").cast("long").alias("n_rows"),
            F.min("_k").alias("min_key"),
            F.max("_k").alias("max_key"),
        )
        .select(
            "shard_id",
            "n_rows",
            "min_key",
            "max_key",
            (
                (F.col("min_key") <= F.lit(pred_hi))
                & (F.col("max_key") >= F.lit(pred_lo))
            ).alias("overlaps_predicate"),
        )
    )


def sorted_layout_audit(
    df: DataFrame,
    x_col: str,
    y_col: str,
    id_col: str,
    n_zones: int = 64,
    bits: int = 8,
    cell_bits: int = 5,
) -> DataFrame:
    """Z-order vs linear clustering: which 2-D file layout prunes
    better? The data-layout decision behind Delta/Iceberg ZORDER BY —
    ``zone_map_audit`` measures 1-D sort clustering; real workloads
    probe TWO dimensions, and a lexicographic (x, y) sort clusters only
    x (every x-slice spans all of y), while interleaving the bits of
    both keys (Morton/Z-order) gives every zone a bounded box in BOTH.

    Both columns must be integers (callers grid doubles first). They
    are normalized to a ``2^bits`` grid in exact integer arithmetic,
    the z-value interleaves the grid bits, and each layout is
    ``n_zones`` equal-count zones under the exact distributed ntile
    (``global_ntile`` — no single-partition window). The probe workload
    is data-derived and BOUNDED by construction: the distinct occupied
    ``2^cell_bits``-wide grid cells (≤ (2^(bits-cell_bits))² probes,
    64 at the defaults), each probing its own cell box. A probe
    touches a zone iff their grid boxes intersect — the I/O a zone-map
    scan planner cannot skip.

    Output: one row per layout — (layout, n_zones, n_probes,
    avg_zones_touched 4 dp). Lower = better pruning; z-order wins
    whenever the probe constrains both dimensions.

    Plan shape: one bounds agg (broadcast 1-row), two ranged exchanges
    (one exact ntile per layout — inherent: the audit IS about global
    order), two tiny per-zone hash aggs, and a ≤64-row broadcast probe
    join. Everything after the ntiles runs on zone/cell-level tables.
    """
    if bits <= 0 or cell_bits < 0 or cell_bits > bits:
        raise ValueError(f"need 0 <= cell_bits <= bits, got {bits=} {cell_bits=}")
    if n_zones <= 0:
        raise ValueError(f"n_zones must be positive, got {n_zones}")
    grid = 1 << bits
    cell = 1 << cell_bits
    base = df.select(
        F.col(x_col).cast("long").alias("_x"),
        F.col(y_col).cast("long").alias("_y"),
        F.col(id_col).alias("_id"),
    ).filter(F.col("_x").isNotNull() & F.col("_y").isNotNull())
    bounds = F.broadcast(
        base.agg(
            F.min("_x").alias("_xlo"),
            F.max("_x").alias("_xhi"),
            F.min("_y").alias("_ylo"),
            F.max("_y").alias("_yhi"),
        )
    )
    # exact integer normalization onto [0, grid): ((v - lo) * grid)
    # div (hi - lo + 1) — both engines truncate identically
    gridded = base.join(bounds).select(
        "_id",
        F.expr(f"((_x - _xlo) * {grid}) div (_xhi - _xlo + 1)").alias("_gx"),
        F.expr(f"((_y - _ylo) * {grid}) div (_yhi - _ylo + 1)").alias("_gy"),
    )
    # Morton interleave as ONE server-parsed expression: the former
    # per-bit Column loop crossed Py4J ~50 times per call (guide §1.2 —
    # constant driver work); the parsed tree and the z values are
    # identical (integer addition, any association).
    z = " + ".join(
        f"(shiftleft(shiftrightunsigned(_gx, {i}) & 1, {2 * i + 1})"
        f" + shiftleft(shiftrightunsigned(_gy, {i}) & 1, {2 * i}))"
        for i in range(bits)
    )
    gridded = gridded.withColumn("_z", F.expr(z))

    tiled = global_ntile(
        gridded, [F.asc("_gx"), F.asc("_gy"), F.asc("_id")], n_zones, "_zone_lin"
    )
    tiled = global_ntile(
        tiled, [F.asc("_z"), F.asc("_id")], n_zones, "_zone_z"
    ).localCheckpoint(eager=True)

    probes = (
        tiled.select(
            F.expr(f"_gx div {cell}").alias("_cx"),
            F.expr(f"_gy div {cell}").alias("_cy"),
        )
        .distinct()
        .select(
            (F.col("_cx") * cell).alias("_plo_x"),
            (F.col("_cx") * cell + (cell - 1)).alias("_phi_x"),
            (F.col("_cy") * cell).alias("_plo_y"),
            (F.col("_cy") * cell + (cell - 1)).alias("_phi_y"),
        )
        .localCheckpoint(eager=True)
    )

    def layout_row(zone_col: str, label: str) -> DataFrame:
        zones = tiled.groupBy(zone_col).agg(
            F.min("_gx").alias("_zlo_x"),
            F.max("_gx").alias("_zhi_x"),
            F.min("_gy").alias("_zlo_y"),
            F.max("_gy").alias("_zhi_y"),
        )
        touched = probes.join(
            F.broadcast(zones),
            (F.col("_zlo_x") <= F.col("_phi_x"))
            & (F.col("_zhi_x") >= F.col("_plo_x"))
            & (F.col("_zlo_y") <= F.col("_phi_y"))
            & (F.col("_zhi_y") >= F.col("_plo_y")),
        )
        per_probe = touched.groupBy(
            "_plo_x", "_plo_y"
        ).agg(F.count("*").alias("_nz"))
        return per_probe.agg(
            F.lit(label).alias("layout"),
            F.lit(n_zones).cast("int").alias("n_zones"),
            F.count("*").cast("long").alias("n_probes"),
            F.round(F.avg("_nz"), 4).alias("avg_zones_touched"),
        )

    return layout_row("_zone_lin", "linear_xy").unionByName(
        layout_row("_zone_z", "zorder")
    )


def consistent_hash_audit(
    df: DataFrame, key_col: str, n_shards: int = 8
) -> DataFrame:
    """Resharding-cost audit: when a shard is ADDED (n → n+1), what
    fraction of keys move under modulo placement vs a consistent-hash
    ring? (Mod moves ~n/(n+1) of ALL keys — a 100 TB re-layout; the
    ring moves only the keys the new shard captures, ~1/(n+1).) The
    table that justifies ring-based bucket layouts before the first
    100 TB write.

    Engine-exact: key and shard-point positions are 60-bit integers
    from md5 prefixes (the repo's one id-hash rule); ring assignment is
    "smallest point position ≥ key position, else wrap to the global
    smallest" — pure integer comparisons, so both engines agree
    bit-for-bit.

    Plan shape: the shard-point tables are n+1 rows built IN-PLAN from
    literals (md5 of 'shard-i' — constant-folded); keys cross-join the
    broadcast points and one hash agg per scheme computes the argmin
    via min(struct(pos, id)) — ≤ (n+1)·|keys| map-side rows, no
    data-sized shuffle beyond the per-key agg. Output:
    (scheme, n_keys, n_moved, moved_frac).
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")

    def _pos(col):
        return F.conv(
            F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
        ).cast("long")

    spark = df.sparkSession
    keys = df.select(F.col(key_col).alias("_k")).filter(
        F.col("_k").isNotNull()
    ).distinct().withColumn("_kh", _pos(F.col("_k")))

    def ring_assign(n_points: int, out: str) -> DataFrame:
        points = spark.range(n_points).select(
            F.col("id").cast("int").alias("_sid"),
            _pos(F.concat(F.lit("shard-"), F.col("id"))).alias("_ph"),
        )
        joined = keys.crossJoin(F.broadcast(points))
        return joined.groupBy("_k").agg(
            F.coalesce(
                F.min(
                    F.when(
                        F.col("_ph") >= F.col("_kh"),
                        F.struct(F.col("_ph"), F.col("_sid")),
                    )
                )["_sid"],
                F.min(F.struct(F.col("_ph"), F.col("_sid")))["_sid"],
            ).alias(out)
        )

    ring = ring_assign(n_shards, "_r0").join(
        ring_assign(n_shards + 1, "_r1"), on="_k"
    )
    ring_row = ring.agg(
        F.lit("ring").alias("scheme"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum(F.when(F.col("_r0") != F.col("_r1"), 1).otherwise(0))
        .cast("long")
        .alias("n_moved"),
    )
    mod_row = keys.agg(
        F.lit("mod").alias("scheme"),
        F.count("*").cast("long").alias("n_keys"),
        F.sum(
            F.when(
                F.pmod(F.col("_kh"), F.lit(n_shards))
                != F.pmod(F.col("_kh"), F.lit(n_shards + 1)),
                1,
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_moved"),
    )
    return ring_row.unionByName(mod_row).select(
        "scheme",
        "n_keys",
        "n_moved",
        F.round(F.col("n_moved") / F.col("n_keys").cast("double"), 6).alias(
            "moved_frac"
        ),
    )
