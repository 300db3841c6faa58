"""Sequence packing for training-data pipelines: lay documents end to
end (per shard, in stable id order) and cut fixed-capacity token
chunks — the concatenate-and-chunk construction of GPT-style
pretraining corpora, where every context window is exactly full and
documents may straddle chunk boundaries.

Spark shape: one windowed running sum per shard (the exclusive-prefix
token offset), pure arithmetic for the chunk span, explode over the
covered chunk ids, then a hash aggregation to chunk stats. The window
is PARTITIONED by the shard key — a single global ordering would
serialize the scan through one task at 100 TB, whereas per-shard
packing is how sharded training data is actually laid out (each shard
is packed independently; shard boundaries are chunk boundaries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import nonempty_tokens, tokens  # noqa: F401


def nonempty_token_count(text: Column) -> Column:
    """Whitespace token count, excluding empty strings (a blank doc has
    0 tokens, not 1) — delegates to the one shared
    ``functions.text.nonempty_tokens`` definition."""
    return F.size(nonempty_tokens(F.lower(text)))


def pack_chunks(
    docs: DataFrame,
    capacity: int = 512,
    shard_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Chunk statistics for concatenate-and-chunk packing.

    Within each shard, documents are concatenated in ``id_col`` order;
    chunk k covers token offsets [k·C, (k+1)·C). A document whose span
    crosses a boundary contributes to every chunk it overlaps. Output:
    one row per (shard, chunk_id) with the number of contributing
    documents and the token fill — every chunk except each shard's
    last is exactly full (the invariant the tests pin).

    All integer arithmetic end to end: offsets are exact, so the same
    construction in any engine produces identical chunk assignment.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cap = F.lit(capacity)
    n_tok = nonempty_token_count(F.col(text_col))
    spans = (
        docs.select(shard_col, id_col, n_tok.alias("n_tok"))
        .filter(F.col("n_tok") > 0)
        .withColumn("start", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
        .withColumn("end", F.col("start") + F.col("n_tok"))
    )
    covered = spans.withColumn(
        "chunk_id",
        F.explode(
            F.sequence(
                F.floor(F.col("start") / cap),
                F.floor((F.col("end") - 1) / cap),
            )
        ),
    )
    # chunk_id stays LONG through the fill arithmetic: casting to int
    # first made (chunk_id + 1) * cap int32 math, which overflows (ANSI:
    # hard job failure; legacy: silent negative fills) once a shard
    # passes 2^31 cumulative tokens (~4M chunks × 512) — exactly the
    # scale this operator exists for. The int cast happens only on the
    # OUTPUT column, whose 2^31-chunk bound (a terabyte-scale shard) is
    # the documented output-type trade-off.
    fill = F.least(F.col("end"), (F.col("chunk_id") + 1) * cap) - F.greatest(
        F.col("start"), F.col("chunk_id") * cap
    )
    return (
        covered.withColumn("fill", fill)
        .groupBy(shard_col, F.col("chunk_id").cast("int").alias("chunk_id"))
        .agg(
            F.count("*").cast("int").alias("n_docs"),
            F.sum("fill").cast("int").alias("n_tokens"),
        )
    )


def chunk_with_overlap(
    docs: DataFrame,
    size: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document sliding-window chunking with overlap — the
    RAG/long-context alternative to cross-document packing
    (``pack_chunks``): windows of ``size`` tokens starting every
    ``stride`` tokens (overlap = size − stride), final window
    truncated at the document end.

    Chunk identity is pure arithmetic — chunk k starts at 1 + k·stride
    — so the same construction in any engine yields identical chunk
    assignment; each chunk carries an md5 fingerprint of its joined
    tokens to pin content equality cross-engine, not just boundaries.

    Spark shape: tokenize once behind a Generate barrier (see
    textstats.repetition_stats — interpreted HOFs re-evaluate through
    ProjectCollapse), posexplode the start grid, slice per chunk. Zero
    shuffle; emitted rows are ~n_tokens/stride per document.
    """
    if not 0 < stride <= size:
        raise ValueError(f"stride must be in (0, size], got stride={stride}, size={size}")
    toks = nonempty_tokens(F.lower(F.col(text_col)))
    staged = (
        docs.select(id_col, F.explode(F.array(toks)).alias("_t"))
        .filter(F.size("_t") > 0)
    )
    # Stop the start grid once a window reaches the document end:
    # sequence up to n would emit a final window fully CONTAINED in the
    # previous one whenever the tail is shorter than the overlap —
    # pure-duplicate suffix chunks inflating the index. Bound
    # n − size + stride keeps coverage complete (last start L satisfies
    # L ≥ n − size + 1, so its window reaches token n) with no
    # subset windows.
    starts = F.sequence(
        F.lit(1),
        F.greatest(F.lit(1), F.size("_t") - size + stride),
        F.lit(stride),
    )
    chunks = staged.select(
        id_col, "_t", F.posexplode(starts).alias("chunk_id", "start_tok")
    )
    piece = F.slice("_t", F.col("start_tok"), size)
    return chunks.select(
        id_col,
        F.col("chunk_id").cast("int").alias("chunk_id"),
        "start_tok",
        F.size(piece).alias("chunk_tokens"),
        F.substring(F.md5(F.concat_ws(" ", piece)), 1, 8).alias("chunk_fp"),
    )


def token_budget_select(
    docs: DataFrame,
    budget_tokens: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy per-group corpus selection under a token budget: rank
    each group's docs by a deterministic quality key (longest-first,
    id tie-break), admit docs while the group's RUNNING token total
    stays within budget — the "fill each mixture component to its
    token quota" step every pre-training data recipe runs after
    weighting (the quota twin of `mixture_plan`, which computes the
    targets; this enforces them doc-by-doc).

    Greedy-prefix semantics: a doc is admitted iff the cumulative
    token count INCLUDING it is ≤ budget; the first overflowing doc
    and everything ranked below are dropped (prefix rule, so
    membership is reproducible — not best-fit bin packing, which is
    order-sensitive and NP-hard).

    Plan shape: token counts are one codegen'd projection
    (`nonempty_token_count`, no UDF); ranking + running sum share ONE
    window partitioning on the group key (one exchange, one sort); the
    summary is a hash agg over admitted rows. At 100 TB the window is
    per-group sequential by construction — groups parallelize, and a
    single giant group's running sum is the irreducible sequential
    dependency of the greedy-prefix rule itself (use range-partitioned
    prefix sums, cf. `shards.py`, if one group outgrows an executor).

    Output: (group, n_selected, n_candidates, tokens_used,
    budget_tokens) — one row per group.
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    toks = docs.select(
        F.col(group_col).alias("_g"),
        F.col(id_col).alias("_id"),
        nonempty_token_count(F.col(text_col)).alias("_tok"),
    )
    w = Window.partitionBy("_g").orderBy(
        F.desc("_tok"), F.asc("_id")
    ).rowsBetween(Window.unboundedPreceding, 0)
    running = toks.withColumn("_cum", F.sum("_tok").over(w))
    return (
        running.groupBy(F.col("_g").alias(group_col))
        .agg(
            F.sum(
                F.when(F.col("_cum") <= budget_tokens, 1).otherwise(0)
            ).cast("long").alias("n_selected"),
            F.count("*").cast("long").alias("n_candidates"),
            F.max(
                F.when(F.col("_cum") <= budget_tokens, F.col("_cum"))
            ).cast("long").alias("tokens_used"),
            F.lit(budget_tokens).cast("long").alias("budget_tokens"),
        )
    )


def padding_waste_audit(
    docs: DataFrame,
    seq_lens: tuple[int, ...] = (128, 256, 512),
    text_col: str = "text",
) -> DataFrame:
    """Padding-waste economics for the naive one-doc-per-sequence
    layout, at several candidate sequence lengths: each document is
    split into ceil(len/B) sequences and the last one is padded to B —
    the waste fraction this table reports is exactly the token budget
    the `pack_chunks` concatenate-and-chunk layout recovers, so this
    audit is the business case run BEFORE committing to packed
    pretraining shards (at 100 TB a 30% pad fraction is 30 TB of GPU
    time spent attending to padding).

    One scan computes the per-doc token count; each candidate B is a
    pure-arithmetic aggregate over that count (ceil via integer
    (len+B-1) div B) — no joins, no window, the |seq_lens| aggregates
    share the single pass and the exchange carries one partial row
    per B. Zero-token docs contribute no sequences (skipped exactly,
    not padded to a full empty sequence).

    Output: (seq_len, n_docs, n_sequences, total_tokens,
    padded_tokens, waste_fraction 4 dp), one row per candidate B.
    """
    if not seq_lens or any(b <= 0 for b in seq_lens):
        raise ValueError(f"seq_lens must be positive, got {seq_lens!r}")
    from ..functions.text import token_count

    lens = docs.select(token_count(F.col(text_col)).alias("n"))
    per_b = []
    for b in seq_lens:
        # integer ceil-division: expr-level `div` keeps it exact long
        n_seq = F.expr(
            f"CASE WHEN n > 0 THEN (n + {b - 1}) div {b} ELSE 0 END"
        )
        per_b.append(
            lens.agg(
                F.lit(b).cast("int").alias("seq_len"),
                F.count("*").alias("n_docs"),
                F.sum(n_seq).cast("long").alias("n_sequences"),
                F.sum("n").cast("long").alias("total_tokens"),
                (F.sum(n_seq) * b).cast("long").alias("padded_tokens"),
                # +1e-9 nudge: total/padded can be an exact dyadic tie
                # (e.g. 760/1280 = .40625) where JVM HALF_UP, DuckDB
                # and Python's banker's round disagree — the standard
                # repo idiom pushes every tie off the boundary
                F.round(
                    1
                    - F.sum("n")
                    / F.nullif((F.sum(n_seq) * b).cast("double"), F.lit(0.0))
                    + 1e-9,
                    4,
                ).alias("waste_fraction"),
            )
        )
    out = per_b[0]
    for nxt in per_b[1:]:
        out = out.unionByName(nxt)
    return out
