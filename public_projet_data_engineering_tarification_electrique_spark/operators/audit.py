"""Data-quality constraint auditing: evaluate a set of named
violation predicates and return one small report row per rule —
the validation gate a pipeline runs before promoting a batch
(nulls in key columns, out-of-range measures, duplicate keys,
referential orphans).

Each rule is declared as the DataFrame of its VIOLATING rows; the
report is the union of their counts. Every count is an independent
aggregate that Catalyst collapses to a partial+final count over the
rule's own pushed-down scan — rules on the same table share the
parquet footer but prune to only the columns each predicate needs, so
at 100 TB the audit costs one column-pruned pass per rule, no wide
scan, no shuffle beyond the 1-row counts.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def constraint_report(rules: dict[str, DataFrame]) -> DataFrame:
    """(rule, n_violations) for each named violating-rows frame.

    A rule passes when its count is 0; the report keeps zero rows too
    so downstream alerting can distinguish "checked and clean" from
    "not checked".
    """
    if not rules:
        raise ValueError("constraint_report needs at least one rule")
    counts = [
        df.agg(F.count("*").alias("n_violations")).select(
            F.lit(name).alias("rule"), "n_violations"
        )
        for name, df in rules.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), counts)


def column_profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Per-column data profile: (col_name, n_nulls, n_distinct,
    min_val, max_val) — the dbt-docs/Deequ-style profiling pass a
    pipeline runs on every new source before trusting it.

    All stats are computed TYPED (min/max on the native type — not on
    a string rendering, which would order numerics lexicographically),
    then the single result row is unpivoted to long form with
    engine-pinned renderings (doubles rounded to 2 dp, timestamps via
    an explicit format).

    Scale/plan shape: TWO aggregations joined on their 1-row results —
    min/max/null-counts in one partial-aggregatable pass, the exact
    count_distincts in a second. Combining them in one agg makes
    Catalyst thread every plain agg buffer through the multi-distinct
    Expand (rows × (D+1) with the full buffer width on every copy) —
    measured 2.8-5.2 s vs 1.0-1.2 s for the split at sf0.1, and at
    100 TB the Expand's multiplied shuffle dwarfs the extra scan. The
    distinct pass still Expands, but carries only the distinct
    columns. Swap count_distinct for approx_count_distinct (the HLL
    path q29 pins) column-by-column without touching the shape.
    """
    from pyspark.sql.types import DoubleType, FloatType, TimestampType

    if cols is None:
        cols = list(df.columns)

    def render(c, name: str):
        dt = df.schema[name].dataType
        if isinstance(dt, (DoubleType, FloatType)):
            return F.round(c, 2).cast("string")
        if isinstance(dt, TimestampType):
            return F.date_format(c, "yyyy-MM-dd HH:mm:ss")
        return c.cast("string")

    plain = []
    for c in cols:
        plain += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_nn_{c}"),
            F.min(F.col(c)).alias(f"_mn_{c}"),
            F.max(F.col(c)).alias(f"_mx_{c}"),
        ]
    distincts = [F.count_distinct(F.col(c)).alias(f"_nd_{c}") for c in cols]
    row = df.agg(*plain).crossJoin(df.agg(*distincts))
    structs = [
        F.struct(
            F.lit(c).alias("col_name"),
            F.col(f"_nn_{c}").alias("n_nulls"),
            F.col(f"_nd_{c}").alias("n_distinct"),
            render(F.col(f"_mn_{c}"), c).alias("min_val"),
            render(F.col(f"_mx_{c}"), c).alias("max_val"),
        )
        for c in cols
    ]
    return row.select(F.explode(F.array(*structs)).alias("_p")).select("_p.*")


def join_cardinality_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    sample_row_expr=None,
    sample_pct: int = 10,
) -> DataFrame:
    """Sampling-based join-cardinality estimation, audited against the
    exact answer — the planner calculation ("how big will this join
    be?") made into a first-class, checkable operator. Both numbers
    come from per-key COUNT HISTOGRAMS, never from materializing the
    join: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k).

    The estimate samples LEFT's rows with the repo's deterministic
    md5-bucket rule (``sample_row_expr``'s md5 bucket < sample_pct,
    default: the key itself — callers pass a row-unique expr for
    row-level sampling) and scales by 100/pct. Exact integers
    throughout; the relative error is the single terminal division.

    Plan shape: two (key) hash aggs (map-side combined) + one equi-join
    on key between two count tables — each far smaller than the fact
    tables; the sampled histogram derives from the same scan via a
    conditional sum, so sampling costs no extra pass. Output: one row
    (actual_rows, estimated_rows, rel_err).
    """
    if not (0 < sample_pct <= 100):
        raise ValueError(f"sample_pct must be in (0, 100], got {sample_pct}")
    expr = (
        sample_row_expr if sample_row_expr is not None else F.col(left_key)
    )
    bucket = F.conv(
        F.substring(F.md5(expr.cast("string")), 1, 6), 16, 10
    ).cast("long") % 100
    la = left.groupBy(F.col(left_key).alias("_k")).agg(
        F.count("*").alias("_ca"),
        F.sum(F.when(bucket < sample_pct, 1).otherwise(0)).alias("_cs"),
    )
    rb = right.groupBy(F.col(right_key).alias("_k")).agg(
        F.count("*").alias("_cb")
    )
    joined = la.join(rb, on="_k")
    totals = joined.agg(
        F.sum(F.col("_ca") * F.col("_cb")).alias("_actual"),
        F.sum(F.col("_cs") * F.col("_cb")).alias("_sampled"),
    )
    est = F.col("_sampled") * F.lit(100) / F.lit(int(sample_pct))
    return totals.select(
        F.col("_actual").cast("long").alias("actual_rows"),
        est.cast("long").alias("estimated_rows"),
        F.when(
            F.col("_actual") > 0,
            F.round(
                F.abs(est - F.col("_actual")) / F.col("_actual").cast("double"),
                6,
            ),
        ).alias("rel_err"),
    )


#: One partitioned materialization per (sf_dir) per process — the
#: write is setup, not the measured query; re-running the query (bench
#: loops, parity gates) must not rewrite the fact table every call.
_DPP_FACT_CACHE: dict[str, str] = {}


def partition_pruned_revenue(spark, sf_dir: str) -> DataFrame:
    """Dynamic-partition-pruning audit: lineitem materialized
    partitioned by ship YEAR, then joined to a dimension of years
    derived from the data (orders ordered in 1997+) — the join's
    partition filter is only knowable at RUNTIME, which is exactly the
    case static pruning cannot help and Spark's DPP
    (`spark.sql.optimizer.dynamicPartitionPruning`, on by default)
    exists for: the dim side is broadcast first and its year set is
    pushed into the fact scan as a partition filter, so the scan reads
    ONLY the surviving year directories.

    At 100 TB the fact table is date-partitioned as a matter of course
    and virtually every BI join is this shape; without DPP the scan
    reads every partition and the join discards 80% of it. The plan is
    asserted in tests (`dynamicpruning#` subquery in the fact scan's
    PartitionFilters) — this query exists so the engine's
    partitioned-layout + runtime-pruning path has a value-gated,
    plan-audited exemplar.

    Output: (ship_year, n_items, revenue) for the dim-surviving years.
    """
    from ..sources.tables import load_table

    fact_path = _DPP_FACT_CACHE.get(sf_dir)
    if fact_path is None:
        from .util import scratch_dir

        fact_path = scratch_dir("dpp_fact_")
        (
            load_table(spark, sf_dir, "lineitem")
            # project to the queried columns BEFORE materializing: the
            # audit's fact table only needs the measure columns, and a
            # full-width copy would quadruple the one-time write (the
            # real 100 TB fact table is of course full-width — there
            # the write is the warehouse itself, not a query's setup)
            .select("l_extendedprice", "l_discount", "l_shipdate")
            .withColumn("ship_year", F.year("l_shipdate"))
            .write.mode("overwrite")
            .partitionBy("ship_year")
            .parquet(fact_path)
        )
        _DPP_FACT_CACHE[sf_dir] = fact_path
    fact = spark.read.parquet(fact_path)
    years = (
        load_table(spark, sf_dir, "orders")
        .select(F.year("o_orderdate").alias("ship_year"))
        .filter(F.col("ship_year") >= 1997)
        .distinct()
    )
    return (
        fact.join(F.broadcast(years), on="ship_year")
        .groupBy("ship_year")
        .agg(
            F.count("*").alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("revenue"),
        )
    )


def zorder_prune_audit(
    lineitem: DataFrame,
    bits: int = 8,
    n_files: int = 32,
    # default key space is 8-bit and the box sits in [0, 100) on y so
    # the predicate is non-vacuous at EVERY testdata SF (l_suppkey
    # tops out at ~SF·10000 — a 12-bit box above 1024 matches nothing
    # below sf1, which would make the audit trivially true)
    box: tuple[int, int, int, int] = (64, 127, 32, 63),
) -> DataFrame:
    """Z-order (Morton) clustering benefit audit — the storage-layout
    decision every 100 TB table owner makes: does interleaved-bit
    sorting on two query columns cut the files a 2-D box predicate
    must touch, versus the natural write order?

    Model: 2-D key (x, y) = (l_partkey, l_suppkey) mod 2^bits; the
    z-value interleaves their bits (pure shift/mask integer
    arithmetic, codegen, bit-identical in DuckDB). 'Files' are
    value-range buckets — natural layout buckets by l_orderkey range
    (arrival order), z layout by z range — computed with scalar
    max + integer division, NO global sort/window: one scan, two
    1-row broadcasts, then count-distinct aggs whose partial phase
    collapses to <= n_files ids per partition before any exchange
    (the Expand runs on box-filtered rows; the shuffles carry file
    ids, never data rows). A real OPTIMIZE ZORDER rewrite would pay
    the sort once at write time; this query only *measures* the
    benefit to justify that pay.

    Output: one row per layout — (layout, files_touched, n_match,
    prune_fraction vs n_files). The z row touching far fewer files
    than the natural row IS the measured benefit.
    """
    mask = (1 << bits) - 1
    x = (F.col("l_partkey") % (mask + 1)).alias("x")
    y = (F.col("l_suppkey") % (mask + 1)).alias("y")
    # Morton interleave as ONE server-parsed expression (same values;
    # the per-bit Column loop cost ~50 Py4J crossings per call)
    z = F.expr(
        " + ".join(
            f"((shiftright(x, {i}) & 1) * {1 << (2 * i)}"
            f" + (shiftright(y, {i}) & 1) * {1 << (2 * i + 1)})"
            for i in range(bits)
        )
    )
    keyed = lineitem.select(
        "l_orderkey", x, y
    ).withColumn("z", z.cast("long"))
    # scalar maxima as a 1-row broadcast (the repo-standard scalar
    # attach — never a driver collect)
    maxes = keyed.agg(
        F.max("l_orderkey").alias("kmax"), F.max("z").alias("zmax")
    )
    x_lo, x_hi, y_lo, y_hi = box
    hit = (
        (F.col("x") >= x_lo)
        & (F.col("x") <= x_hi)
        & (F.col("y") >= y_lo)
        & (F.col("y") <= y_hi)
    )
    tagged = (
        keyed.join(F.broadcast(maxes))
        .filter(hit)
        .select(
            F.expr(f"(l_orderkey * {n_files}) div (kmax + 1)").alias(
                "nat_file"
            ),
            F.expr(f"(z * {n_files}) div (zmax + 1)").alias("z_file"),
        )
    )
    per_layout = tagged.agg(
        F.countDistinct("nat_file").alias("nat_files"),
        F.countDistinct("z_file").alias("z_files"),
        F.count("*").alias("n_match"),
    )
    nat = per_layout.select(
        F.lit("natural").alias("layout"),
        F.col("nat_files").cast("long").alias("files_touched"),
        F.col("n_match").cast("long").alias("n_match"),
        F.round(1 - F.col("nat_files") / F.lit(float(n_files)), 4).alias(
            "prune_fraction"
        ),
    )
    zo = per_layout.select(
        F.lit("zorder").alias("layout"),
        F.col("z_files").cast("long").alias("files_touched"),
        F.col("n_match").cast("long").alias("n_match"),
        F.round(1 - F.col("z_files") / F.lit(float(n_files)), 4).alias(
            "prune_fraction"
        ),
    )
    return nat.unionByName(zo)


def delete_cascade_audit(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    key_pred,
) -> DataFrame:
    """Right-to-erasure (GDPR art. 17) blast-radius audit: given a
    delete predicate on the customer table, count the rows every
    downstream table must purge through the FK cascade — the
    compliance question asked BEFORE running a delete job on a 100 TB
    warehouse, because the answer decides between row-level deletes
    and partition rewrites.

    The cascade is pure semi-joins: customers→orders on custkey,
    orders→lineitem on orderkey — each a broadcast of the (small)
    delete frontier against one fact scan, no wide join output ever
    materialized. At real scale the frontier broadcast becomes the
    Bloom-filter probe (operators/bloom.py, q111) with an exact
    semi-join behind it — same plan family, same counts.

    Output: (entity, n_delete, n_total, delete_fraction 6 dp) — one
    row per cascade level.
    """
    targets = customer.filter(key_pred).select("c_custkey")
    orders_hit = orders.join(
        F.broadcast(targets),
        orders["o_custkey"] == targets["c_custkey"],
        "leftsemi",
    )
    li_hit = lineitem.join(
        F.broadcast(orders_hit.select("o_orderkey")),
        lineitem["l_orderkey"] == orders_hit["o_orderkey"],
        "leftsemi",
    )

    def level(name: str, hit: DataFrame, total: DataFrame) -> DataFrame:
        h = hit.agg(F.count("*").alias("n_delete"))
        t = total.agg(F.count("*").alias("n_total"))
        return (
            h.join(F.broadcast(t))
            .select(
                F.lit(name).alias("entity"),
                F.col("n_delete").cast("long").alias("n_delete"),
                F.col("n_total").cast("long").alias("n_total"),
                F.round(
                    F.col("n_delete") / F.col("n_total").cast("double"), 6
                ).alias("delete_fraction"),
            )
        )

    return (
        level("customer", targets, customer)
        .unionByName(level("orders", orders_hit, orders))
        .unionByName(level("lineitem", li_hit, lineitem))
    )


def benford_audit(
    df: DataFrame,
    amount_col: str,
    cents: bool = True,
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    classic fabricated-/truncated-data screen for financial or
    measurement columns (a synthetic generator, a capped extract, or a
    unit mix-up shows up immediately as a non-logarithmic digit
    profile).

    Engine-exactness: the leading digit is taken from the DECIMAL
    STRING of the exact integer cents (``round(amount·100)`` —
    ``cents=False`` skips the scaling for already-integer columns),
    never from ``floor(log10(x))`` whose float boundary at exact
    powers of ten differs across libms. Scaling by 100 preserves the
    leading significant digit. Non-positive amounts are excluded
    (Benford is defined on positive magnitudes).

    Output per digit 1–9: (digit, n, observed freq, Benford expected
    ln(1+1/d)/ln(10), signed gap), all 4-dp rounded. Plan: one
    projection + one ≤9-group hash agg (map-side combined) + the
    digit-grid expected column — scan-bound at any size.
    """
    amt = F.col(amount_col)
    magnitude = (
        F.round(amt * 100).cast("long") if cents else amt.cast("long")
    )
    digit = F.substring(magnitude.cast("string"), 1, 1).cast("int")
    counts = (
        df.filter(amt > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count("*").alias("_n"))
    )
    tot = counts.agg(F.sum("_n").alias("_tot"))
    expected = F.log(1.0 + 1.0 / F.col("digit")) / F.log(F.lit(10.0))
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.col("_n").cast("long").alias("n"),
            F.round(F.col("_n") / F.col("_tot") + 1e-9, 4).alias("freq"),
            F.round(expected + 1e-9, 4).alias("benford"),
            F.round(
                F.col("_n") / F.col("_tot") - expected + 1e-9, 4
            ).alias("gap"),
        )
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Per-group Gini coefficient of a nonnegative integer quantity —
    the CONCENTRATION audit for corpus curation: a source whose
    training tokens all sit in a handful of giant documents (G → 1)
    behaves very differently under dedup/sampling than one spread
    evenly (G → 0), and a mixture plan weighting sources by token
    count should know which it is.

    Exact-integer construction on the level table: per (group, value)
    counts, per-group cumulative counts over the value order (a
    group-partitioned window — levels per group are bounded by the
    VALUE RANGE, not the corpus, and groups are the partition key), and

        G = (2·Σᵢ i·x₍ᵢ₎ − (n+1)·Σx) / (n·Σx)

    where the doubled rank-weighted sum per level is the exact integer
    v·(2·c·K + c·(c+1)) (K = count strictly below the level). All
    sums decimal(38,0); ONE terminal division; NULL for groups with a
    zero total (Gini undefined). Negative inputs RAISE at runtime —
    the nonnegative contract is enforced, not assumed.

    Output: (grp, n, total, gini), 6-dp rounded.
    """
    # enforce the nonnegative contract at runtime (kcore_peel-style
    # explicit guard, but data-shaped, so per-row): a negative value
    # would yield a silently invalid Gini (can leave [0,1]) — raise
    # instead. The branch costs nothing on valid data and keeps the
    # plan fully codegen'd.
    v_checked = F.when(
        F.col(value_col) >= 0, F.col(value_col)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"gini_concentration: negative value in {value_col!r} "
                "violates the nonnegative-integer contract"
            )
        )
    )
    levels = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            F.col(group_col).alias("grp"),
            v_checked.cast("long").alias("v"),
        )
        .groupBy("grp", "v")
        .agg(F.count("*").alias("c"))
    )
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_k = levels.withColumn(
        "k", F.coalesce(F.sum("c").over(w), F.lit(0))
    )
    # per-level exact contributions, multiplied as decimal (v·c·K
    # overflows int64 once v·n² work crosses 9.2e18)
    v_d = F.col("v").cast("decimal(19,0)")
    c_d = F.col("c").cast("decimal(19,0)")
    k_d = F.col("k").cast("decimal(19,0)")
    agg = with_k.groupBy("grp").agg(
        F.sum("c").cast("long").alias("n"),
        F.sum((v_d * c_d).cast("decimal(38,0)")).alias("s"),
        F.sum(
            (
                v_d
                * (
                    F.lit(2).cast("decimal(19,0)") * c_d * k_d
                    + c_d * (c_d + F.lit(1).cast("decimal(19,0)"))
                )
            ).cast("decimal(38,0)")
        ).alias("t2"),
    )
    n_d = F.col("n").cast("double")
    s_d = F.col("s").cast("double")
    t2_d = F.col("t2").cast("double")
    gini = F.when(
        (F.col("s") > 0) & (F.col("n") > 0),
        (t2_d - (n_d + F.lit(1.0)) * s_d) / (n_d * s_d),
    )
    return agg.select(
        "grp",
        "n",
        F.col("s").cast("long").alias("total"),
        F.round(gini + 1e-9, 6).alias("gini"),
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination — the
    re-identification screen a governance pass runs BEFORE releasing
    a derived table (``pseudonymize`` hides direct identifiers; this
    measures whether the remaining quasi-identifier cells are small
    enough to single someone out). A row is AT RISK when its full
    quasi-identifier cell holds fewer than ``k`` rows.

    One hash agg to the cell table (map-side partials), one re-agg to
    the first quasi column's summary — cells never leave the
    executors, and the output is |distinct first-column| rows.

    Output per first-column value: (group, n_cells, n_small_cells,
    n_rows, n_rows_at_risk, risk_fraction 4-dp) — risk_fraction is
    the share of rows needing suppression or coarsening before a
    k-anonymous release.
    """
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    cells = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count("*").alias("_n")
    )
    head = quasi_cols[0]
    return (
        cells.groupBy(F.col(head).alias("grp"))
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum(F.when(F.col("_n") < k, 1).otherwise(0))
            .cast("long")
            .alias("n_small_cells"),
            F.sum("_n").cast("long").alias("n_rows"),
            F.sum(F.when(F.col("_n") < k, F.col("_n")).otherwise(0))
            .cast("long")
            .alias("n_rows_at_risk"),
        )
        .select(
            "grp",
            "n_cells",
            "n_small_cells",
            "n_rows",
            "n_rows_at_risk",
            F.round(
                F.col("n_rows_at_risk").cast("double")
                / F.col("n_rows").cast("double")
                + 1e-9,
                4,
            ).alias("risk_fraction"),
        )
    )


def l_diversity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    l: int = 2,
) -> DataFrame:
    """l-diversity audit — k-anonymity's stronger sibling: a
    quasi-identifier cell can hold ≥ k rows yet still leak the
    sensitive attribute if every row in it shares one sensitive value.
    A cell is DIVERSE when it contains at least ``l`` distinct
    sensitive values; rows in non-diverse cells are attribute-
    disclosure risks even after a k-anonymous release.

    Same two-agg shape as :func:`k_anonymity_audit`: one hash agg to
    the (cell × sensitive) level, one re-agg to cells (distinct
    sensitive count per cell falls out of the level table for free —
    never a countDistinct over raw rows), one re-agg to the
    first-quasi-column summary. Cells never leave the executors.

    Output per first-column value: (grp, n_cells, n_risky_cells,
    n_rows, n_rows_at_risk, risk_fraction 4-dp).
    """
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    if not quasi_cols:
        raise ValueError("quasi_cols must be non-empty")
    level = df.groupBy(
        *[F.col(c) for c in quasi_cols], F.col(sensitive_col)
    ).agg(F.count("*").alias("_n"))
    cells = level.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count("*").alias("_l"),  # distinct sensitive values
        F.sum("_n").alias("_rows"),
    )
    head = quasi_cols[0]
    return (
        cells.groupBy(F.col(head).alias("grp"))
        .agg(
            F.count("*").cast("long").alias("n_cells"),
            F.sum(F.when(F.col("_l") < l, 1).otherwise(0))
            .cast("long")
            .alias("n_risky_cells"),
            F.sum("_rows").cast("long").alias("n_rows"),
            F.sum(
                F.when(F.col("_l") < l, F.col("_rows")).otherwise(0)
            )
            .cast("long")
            .alias("n_rows_at_risk"),
        )
        .select(
            "grp",
            "n_cells",
            "n_risky_cells",
            "n_rows",
            "n_rows_at_risk",
            F.round(
                F.col("n_rows_at_risk").cast("double")
                / F.col("n_rows").cast("double")
                + 1e-9,
                4,
            ).alias("risk_fraction"),
        )
    )
