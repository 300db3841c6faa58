"""Gap-based sessionization over an event stream (extension surface).

The reference has no session concept (its incremental unit is a whole
day, reference:airflow/dags/insert_conso_jour_region_in_bq.py:44-61);
this is the standard analytic operator a training-data / clickstream
pipeline needs.

Scale design: one window shuffle on the entity key, then everything is
per-partition — lag for the gap test, a running sum of boundary flags
for the session index, and a single hash agg for the per-session
rollup. Both shuffles share the same key (user), so AQE coalesces them
into one exchange. Skewed users (bots) are bounded by the gap rule:
state per user is one row, not one session map — this is the batch
twin of Structured Streaming's session window
(F.session_window(ts, gap)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def assign_sessions(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    id_col: str = "event_id",
) -> DataFrame:
    """Attach the gap-rule ``session_id`` column (1..k per user in time
    order) — the session-ASSIGNMENT step shared by the rollup
    (``sessionize``) and downstream per-session analyses (the funnel):
    one user-key window shuffle, (ts, id)-ordered for a total order."""
    w = Window.partitionBy(user_col).orderBy(F.asc(ts_col), F.asc(id_col))
    boundary = (
        F.when(
            F.lag(ts_col).over(w).isNull()
            | ((F.col(ts_col) - F.lag(ts_col).over(w)) > gap_seconds),
            1,
        )
        .otherwise(0)
        .cast("long")
    )
    return events.withColumn(
        "session_id",
        F.sum(boundary).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Assign gap-based sessions and roll them up.

    A new session starts when the time since the user's previous event
    exceeds ``gap_seconds`` (or there is no previous event). ``ts_col``
    is epoch seconds (long) — callers convert from their native
    timestamp type so the operator is precision-agnostic.

    Output: (user_id, session_id, n_events, start_s, end_s, sum_value)
    with session_id numbered 1..k per user in time order.
    """
    with_session = assign_sessions(
        events,
        gap_seconds=gap_seconds,
        user_col=user_col,
        ts_col=ts_col,
        id_col=id_col,
    )
    # Exact-grid sum: round each value onto the 1e-4 integer grid and sum
    # longs, so per-session totals are independent of float summation
    # order (Spark vs DuckDB vs incremental streaming all agree exactly).
    # round(x*1e4, 0) at scale 0 is engine-portable: decimal HALF_UP and
    # binary round-half-away coincide for doubles below 2**51.
    grid = F.round(F.col(value_col) * F.lit(1e4), 0).cast("long")
    return with_session.groupBy(user_col, "session_id").agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_s"),
        F.max(ts_col).alias("end_s"),
        (F.sum(grid) / F.lit(1e4)).alias("sum_value"),
    )


def multitouch_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("click", "view"),
    lookback_s: int = 24 * 3600,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    channel_expr=None,
) -> DataFrame:
    """Linear multi-touch attribution: every conversion distributes ONE
    unit of credit equally across the same user's touch events inside
    the preceding lookback window — the marketing-analytics standard
    between last-touch (the as-of join, q24) and data-driven models.

    Exact-integer credit: 1 unit = 1 000 000 µ-credits; each of a
    conversion's n touches gets ``1000000 // n`` and the EARLIEST touch
    absorbs the remainder (deterministic tie-break by ts then event
    id), so the per-channel credit sums are exact BIGINTs — a float
    1/n would make the final sums depend on addition order and break
    engine parity. Credit conservation holds by construction: summed
    µ-credit = 1 000 000 × attributed conversions, which the output's
    single total row witnesses.

    Plan shape: conversions ⋈ touches is an equi-join on the user key
    with the window predicate as a join-time range filter (hash join +
    filter, co-located after one exchange; never a cross product); the
    per-conversion n/rank need one window over (conversion), whose
    partitioning the subsequent aggregate reuses. Conversions with no
    touch in-window produce no credit rows (reported via the totals
    row's n_conversions vs n_attributed).

    Output rows per channel: (channel, n_touches, credit_micro) plus
    one '_total' row (channel='_total', n_attributed_conversions,
    total_credit_micro).
    """
    if lookback_s <= 0:
        raise ValueError(f"lookback_s must be positive, got {lookback_s}")
    ch = (
        channel_expr
        if channel_expr is not None
        else F.concat(
            F.lit("ch"),
            (
                F.get_json_object(F.col("props"), "$.k").cast("long") % 5
            ).cast("string"),
        )
    )
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    conv = events.filter(F.col("event_type") == conversion_type).select(
        F.col(key_col).alias("_u"),
        F.col(id_col).alias("_cid"),
        us.alias("_cts"),
    )
    touch = events.filter(
        F.col("event_type").isin(*touch_types)
    ).select(
        F.col(key_col).alias("_u"),
        F.col(id_col).alias("_tid"),
        us.alias("_tts"),
        ch.alias("_chan"),
    )
    joined = conv.join(touch, on="_u").filter(
        (F.col("_tts") < F.col("_cts"))
        & (F.col("_tts") >= F.col("_cts") - F.lit(lookback_s * 1_000_000))
    )
    w = Window.partitionBy("_cid")
    wo = w.orderBy(F.asc("_tts"), F.asc("_tid"))
    credited = (
        joined.withColumn("_n", F.count("*").over(w))
        .withColumn("_rk", F.row_number().over(wo))
        .select(
            "_chan",
            "_cid",
            (
                (F.lit(1_000_000).cast("long") / F.col("_n")).cast("long")
                + F.when(
                    F.col("_rk") == 1,
                    F.lit(1_000_000).cast("long") % F.col("_n"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("_credit"),
        )
    )
    per_channel = credited.groupBy(F.col("_chan").alias("channel")).agg(
        F.count("*").cast("long").alias("n_touches"),
        F.sum("_credit").cast("long").alias("credit_micro"),
    )
    total = credited.agg(
        F.lit("_total").alias("channel"),
        F.count_distinct(F.col("_cid")).cast("long").alias("n_touches"),
        F.sum("_credit").cast("long").alias("credit_micro"),
    )
    return per_channel.unionByName(total)


def path_trigrams(
    events: DataFrame,
    k: int = 10,
    key_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Top-k 3-step behaviour paths: the most frequent consecutive
    (t1 → t2 → t3) event-type sequences across all user streams —
    the sequential-pattern rollup behind "what do users do before
    converting?" (q71's transition matrix is the order-1 version;
    this is order 2).

    Plan shape: two `lag`s over ONE (user) × (ts, id) window — same
    partitioning and sort, one exchange; the trigram space is bounded
    by |types|³, so the count agg is map-side combined into a tiny
    table and the final top-k is a TakeOrdered. No per-user arrays are
    materialized (a bot with 10M events costs window state of two
    rows, not a 10M-element collect_list).

    Output: (t1, t2, t3, n) — count-desc, lexicographic tie-break.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    tri = events.select(
        F.lag(type_col, 2).over(w).alias("t1"),
        F.lag(type_col, 1).over(w).alias("t2"),
        F.col(type_col).alias("t3"),
    ).filter(F.col("t1").isNotNull())
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.desc("n"), F.asc("t1"), F.asc("t2"), F.asc("t3"))
        .limit(k)
    )


def rfm_segments(
    events: DataFrame,
    conversion_type: str = "purchase",
    n_tiles: int = 5,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM (recency / frequency / monetary) segmentation — the classic
    customer-value grid: per user, days since last conversion,
    conversion count, and total conversion value, each cut into
    ``n_tiles`` quantile tiles; the segment label is the "R-F-M"
    digit triple.

    Determinism: tiles are exact NTILE over a TOTAL order (metric,
    then user id — ntile on a tied-but-unordered column is
    engine-dependent, with the tie-break it is exact); monetary sums
    are accumulated as exact integer cents before any division.
    Recency is measured against the stream's own max day (a job
    parameter in production), so the output is a pure function of the
    data.

    Plan shape: one hash agg to the per-user grain (map-side
    combined), then three DISTRIBUTED exact ntiles over that
    per-user table (`shards.global_ntile`: range-partitioned
    two-phase rank + the closed-form tile expression) — NEVER the
    naive `ntile() OVER (ORDER BY …)`, whose unpartitioned window
    funnels every user into one task (fine at sf0.1, the classic
    single-task bottleneck at billions of users). Each axis costs two
    P-way-parallel shuffles and a P-row driver collect; the tile
    values are bit-identical to the unpartitioned window's. Output:
    (segment, n_users, total_cents) per occupied segment cell.
    """
    if n_tiles <= 0:
        raise ValueError(f"n_tiles must be positive, got {n_tiles}")
    from .shards import global_ntile

    conv = events.filter(F.col("event_type") == conversion_type)
    per_user = conv.groupBy(F.col(key_col).alias("_u")).agg(
        F.max(F.to_date(ts_col)).alias("_last"),
        F.count("*").alias("_freq"),
        F.sum(F.round(F.col(value_col) * 100).cast("long")).alias("_cents"),
    )
    anchor = per_user.agg(F.max("_last").alias("_anchor"))
    scored = per_user.crossJoin(F.broadcast(anchor)).select(
        "_u",
        F.datediff("_anchor", "_last").alias("_rec"),
        "_freq",
        "_cents",
    )
    # lower recency = better -> ascending; higher freq/monetary = better.
    # The three axis rankings are INDEPENDENT of each other — each
    # global_ntile pays a range-sampling job plus a materialize+offsets
    # job at build time, so chaining them serializes ~6 driver-blocking
    # jobs. Build them concurrently (guide §2.6 — overlap independent
    # jobs; job submission is thread-safe) and join the per-axis tiles
    # back on the user key: values are identical (each ntile ranks the
    # same per-user frame), wall time is the max of the three instead
    # of the sum. scored is checkpointed first so the three branches
    # share one materialization instead of re-aggregating per axis.
    scored = scored.localCheckpoint(eager=True)
    axes = [
        ("_rt", [F.asc("_rec"), F.asc("_u")]),
        ("_ft", [F.desc("_freq"), F.asc("_u")]),
        ("_mt", [F.desc("_cents"), F.asc("_u")]),
    ]

    def _axis(tile_col: str, order: list) -> DataFrame:
        return global_ntile(scored, order, n_tiles, tile_col=tile_col).select(
            "_u", tile_col
        )

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(axes)) as pool:
        tiles = list(pool.map(lambda a: _axis(*a), axes))
    tiled = scored
    for t in tiles:
        tiled = tiled.join(t, on="_u")
    tiled = tiled.select(
        "_cents",
        F.concat_ws(
            "-",
            F.col("_rt").cast("string"),
            F.col("_ft").cast("string"),
            F.col("_mt").cast("string"),
        ).alias("segment"),
    )
    return tiled.groupBy("segment").agg(
        F.count("*").cast("long").alias("n_users"),
        F.sum("_cents").cast("long").alias("total_cents"),
    )


def activity_streaks(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    epoch: str = "2024-01-01",
) -> DataFrame:
    """Longest consecutive-day activity streak per user, rolled up to
    a streak-length distribution — the gaps-and-islands classic
    (engagement metric; also the shape behind "N consecutive days of
    data present" completeness checks).

    Islands via the rank-difference trick: over each user's DISTINCT
    active day indexes, day − row_number() is constant exactly within
    a run of consecutive days — one window, one groupBy, all integer
    (day index = days since an explicit epoch, no date-string or
    ISO-week ambiguity).

    Plan shape: distinct (user, day) collapses the event stream first
    (map-side partial distinct), so the window runs over ≤ users×days
    rows, keyed by user — the "aggregate first, rank the aggregate"
    rule. Output: (streak_days, n_users) — each user counted once at
    their LONGEST streak.
    """
    day = F.datediff(F.to_date(ts_col), F.to_date(F.lit(epoch)))
    days = events.select(
        F.col(key_col).alias("_u"), day.alias("_d")
    ).distinct()
    w = Window.partitionBy("_u").orderBy("_d")
    islands = days.select(
        "_u", (F.col("_d") - F.row_number().over(w)).alias("_isl")
    )
    runs = islands.groupBy("_u", "_isl").agg(F.count("*").alias("_len"))
    best = runs.groupBy("_u").agg(F.max("_len").alias("streak_days"))
    return best.groupBy(F.col("streak_days").cast("int").alias("streak_days")).agg(
        F.count("*").cast("long").alias("n_users")
    )


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    epoch: str = "2024-01-01",
) -> DataFrame:
    """Weekly cohort-retention triangle: users grouped by their FIRST
    active week (the cohort), counted distinct at each later week
    offset — the table behind every retention curve, and, for a data
    pipeline, the "contributor freshness" view of a crawl corpus.

    Week index = days-since-epoch DIV 7 against an explicit epoch (no
    ISO-week boundary or locale ambiguity); all outputs integers.

    Plan shape: distinct (user, week) collapses the event stream first
    (map-side partial distinct), so the per-user min-week window runs
    over the bounded ≤ users×weeks grid, not the raw events; the final
    count-distinct-users per (cohort, offset) is exact because
    (user, week) is already unique upstream, so it is a plain count.
    Output: (cohort_week, week_offset, n_users).
    """
    week = (
        F.datediff(F.to_date(ts_col), F.to_date(F.lit(epoch)))
        / F.lit(7)
    ).cast("int")
    weeks = events.select(
        F.col(key_col).alias("_u"), week.alias("_w")
    ).distinct()
    w = Window.partitionBy("_u")
    cohorted = weeks.select(
        "_u", "_w", F.min("_w").over(w).alias("_cw")
    )
    return (
        cohorted.groupBy(
            F.col("_cw").cast("int").alias("cohort_week"),
            (F.col("_w") - F.col("_cw")).cast("int").alias("week_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


def event_prefix_paths(
    events: DataFrame,
    n_steps: int = 3,
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    order_col: str = "event_id",
) -> DataFrame:
    """Onboarding-path distribution: each user's FIRST ``n_steps``
    events assembled, in time order, into one path string — the
    record-assembly shape behind SFT conversation building (gather a
    key's rows in order into one training example) applied to the
    classic "what do users do first" product question.

    Determinism: order is (ts, order_col) — a total order, so the
    prefix and its concatenation are exact. Assembly sorts an array of
    (rank, type) structs AFTER collect (array_sort on struct order),
    never relying on collect_list's arrival order, which is
    partition-race nondeterministic.

    Plan shape: one row_number window keyed by user cuts the prefix
    (at 100 TB this is the only full-events shuffle); the assembly agg
    then holds ≤ n_steps tiny structs per user — bounded state, unlike
    an unbounded collect_list over raw events. Output:
    (path, n_users).
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(order_col).asc()
    )
    prefix = (
        events.select(
            F.col(key_col).alias("_u"),
            F.col(type_col).alias("_et"),
            F.row_number().over(w).alias("_rn"),
        )
        .filter(F.col("_rn") <= n_steps)
    )
    assembled = prefix.groupBy("_u").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.array_sort(F.collect_list(F.struct("_rn", "_et"))),
                lambda s: s["_et"],
            ),
        ).alias("path")
    )
    return assembled.groupBy("path").agg(
        F.count("*").cast("long").alias("n_users")
    )


def session_duration_histogram(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts_s",
    id_col: str = "event_id",
) -> DataFrame:
    """Log2-binned session-duration distribution — the downstream twin
    of q203's gap histogram: gaps tune the session RULE, durations
    audit its OUTPUT (a spike of marathon sessions means the gap is
    too wide / a bot slipped through; a mass at zero means most
    "sessions" are single events and the gap is too tight).

    Bucket = length(bin(duration_s + 1)) — the engine-exact integer
    ⌊log2⌋+1 (duration 0 = single-event sessions land in bucket 1).

    Plan shape: reuses ``sessionize``'s one user-key window + session
    rollup (the session table is bounded by sessions, not events),
    then one ≤64-bucket hash agg. Output:
    (duration_bucket, n_sessions, min_s, max_s).
    """
    sessions = sessionize(
        events,
        gap_seconds=gap_seconds,
        user_col=user_col,
        ts_col=ts_col,
        id_col=id_col,
    ).select((F.col("end_s") - F.col("start_s")).alias("_dur"))
    bucket = F.length(F.bin(F.col("_dur") + 1)).cast("int")
    return sessions.groupBy(bucket.alias("duration_bucket")).agg(
        F.count("*").cast("long").alias("n_sessions"),
        F.min("_dur").cast("long").alias("min_s"),
        F.max("_dur").cast("long").alias("max_s"),
    )


def item_cooccurrence_topk(
    events: DataFrame,
    k: int = 20,
    min_cooc: int = 5,
    max_items_per_user: int = 200,
) -> DataFrame:
    """Item-item co-occurrence similarity from user interaction
    history — the collaborative-filtering primitive behind
    'users who touched X also touched Y' (Amazon item-to-item CF,
    IEEE Internet Computing '03): items co-engaged by the same user,
    scored by cosine = cooc / sqrt(freq_a · freq_b) over the binary
    user-item matrix.

    Item id = props.k (the JSON payload's item key), so the operator
    also exercises JSON extraction inside the scan. Pipeline: distinct
    (user, item) — one hash agg; per-user item sets CAPPED at
    ``max_items_per_user`` by (item) rank — the df-cap equivalent for
    users: a crawler/bot account touching everything would otherwise
    contribute |items|² pairs (same quadratic the dedup stack caps
    with max_df); pair generation via self-join on user (bounded by
    cap²·users); one (a, b) hash agg. Top-k by (cosine, pair) total
    order via TakeOrdered. min_cooc prunes the noise tail BEFORE the
    cosine projection.

    Cosine here is the one terminal division (4 dp) over exact integer
    counts — cross-engine exact. Output: (item_a, item_b, cooc,
    freq_a, freq_b, cosine), k rows.
    """
    if k <= 0 or min_cooc < 1 or max_items_per_user < 2:
        raise ValueError(
            f"bad params k={k} min_cooc={min_cooc} "
            f"max_items_per_user={max_items_per_user}"
        )
    ui = (
        events.select(
            F.col("user_id").alias("u"),
            F.get_json_object("props", "$.k").cast("int").alias("item"),
        )
        .filter(F.col("u").isNotNull() & F.col("item").isNotNull())
        .distinct()
    )
    w = Window.partitionBy("u").orderBy(F.asc("item"))
    capped = (
        ui.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= max_items_per_user)
        .drop("_rk")
        .localCheckpoint(eager=True)
    )
    freqs = capped.groupBy("item").agg(F.count("*").alias("freq"))
    pairs = (
        capped.select("u", F.col("item").alias("item_a"))
        .join(capped.select("u", F.col("item").alias("item_b")), on="u")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("cooc"))
        .filter(F.col("cooc") >= min_cooc)
    )
    scored = (
        pairs.join(
            freqs.select(
                F.col("item").alias("item_a"), F.col("freq").alias("freq_a")
            ),
            on="item_a",
        )
        .join(
            freqs.select(
                F.col("item").alias("item_b"), F.col("freq").alias("freq_b")
            ),
            on="item_b",
        )
        .select(
            "item_a",
            "item_b",
            F.col("cooc").cast("long").alias("cooc"),
            F.col("freq_a").cast("long").alias("freq_a"),
            F.col("freq_b").cast("long").alias("freq_b"),
            F.round(
                F.col("cooc")
                / F.sqrt(F.col("freq_a") * F.col("freq_b")).cast("double"),
                4,
            ).alias("cosine"),
        )
    )
    return scored.orderBy(
        F.desc("cosine"), F.asc("item_a"), F.asc("item_b")
    ).limit(k)


def markov_stationary(
    transitions: DataFrame,
    from_col: str = "from_type",
    to_col: str = "to_type",
    n_col: str = "n",
    iters: int = 6,
) -> DataFrame:
    """Stationary distribution of the behavior Markov chain — the
    steady-state answer to "where do users spend their time?" that a
    raw transition-count table (q71) only hints at: ``iters`` fixed
    power iterations π ← πP from the uniform start.

    The q134 PageRank determinism contract, reused exactly: the row-
    normalized transition probabilities live on a 1e-9 integer grid
    (one rounded double division per cell), every iteration's
    contribution is round(π_i · p_ij / 1e9) — a double product of
    exact integers snapped back to the grid — so the neighbor-sum is a
    sum of longs (order-free) and the oracle's unrolled CTEs replay
    the loop bit-for-bit. States missing an outgoing row keep mass
    only via incoming edges (the input table has no dangling states
    when built from lag pairs: every `to` also appears as a `from`
    except possibly each user's final event type — callers accept the
    small leak exactly as q134 accepts rounding drift, or pre-close
    the chain).

    Plan shape: the matrix is |states|² cells (dimension-bounded);
    each iteration is one join + one hash agg on the state key.
    Output: (state, pi_e9 exact long, pi), descending mass.
    """
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")
    # zero/negative-count rows would put a 0 row-total under the
    # normalizing division (ANSI raises); they carry no transition
    # mass, so dropping them is the identity on the chain
    transitions = transitions.filter(F.col(n_col) > 0)
    row_tot = transitions.groupBy(from_col).agg(
        F.sum(n_col).alias("_rt")
    )
    p = (
        transitions.join(row_tot, from_col)
        .select(
            F.col(from_col).alias("src"),
            F.col(to_col).alias("dst"),
            F.round(
                F.lit(1e9)
                * F.col(n_col).cast("double")
                / F.col("_rt").cast("double"),
                0,
            )
            .cast("long")
            .alias("p_e9"),
        )
        .localCheckpoint(eager=True)
    )
    states = (
        p.select(F.col("src").alias("state"))
        .union(p.select(F.col("dst").alias("state")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    k = states.count()
    pi = states.select(
        "state",
        F.round(F.lit(1e9) / F.lit(float(k)), 0).cast("long").alias("pi_e9"),
    )
    for _ in range(iters):
        pi = (
            pi.join(p, pi.state == p.src)
            .select(
                F.col("dst").alias("state"),
                F.round(
                    F.col("pi_e9").cast("double")
                    * F.col("p_e9").cast("double")
                    / F.lit(1e9),
                    0,
                )
                .cast("long")
                .alias("_m"),
            )
            .groupBy("state")
            .agg(F.sum("_m").cast("long").alias("pi_e9"))
        )
    return pi.select(
        "state",
        "pi_e9",
        F.round(F.col("pi_e9").cast("double") / F.lit(1e9), 6).alias("pi"),
    ).orderBy(F.desc("pi_e9"), F.asc("state"))
