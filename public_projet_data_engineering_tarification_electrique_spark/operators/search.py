"""Search-engine operators over the documents table (extension
surface): positional inverted-index phrase matching and PMI-style
collocation mining. Pure DataFrame plans — the postings table is the
classic (token, doc, position) layout every search engine shards, so
all joins are equi-joins on token (+ position arithmetic), never
scans of the corpus per query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens
from .util import ensure_parallelism


def positional_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, token, pos) positional postings — one posexplode, no
    shuffle; the direct build of the layout an inverted index stores
    (at scale: write bucketed by token so phrase joins co-locate)."""
    return ensure_parallelism(docs).select(
        F.col(id_col),
        F.posexplode(tokens(F.lower(F.col(text_col)))).alias("pos", "token"),
    ).filter(F.col("token") != "")


def phrase_search(
    docs: DataFrame,
    phrase: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase matching via positional-postings adjacency joins:
    word i of the phrase must appear at ``pos + i`` in the same doc —
    the standard phrase-query plan over an inverted index (Lucene's
    exact PhraseQuery), expressed as n−1 equi-joins on
    (doc, adjusted position).

    Scale shape: each join side is the postings of ONE phrase word
    (|postings(wᵢ)| rows, not the corpus); joins are on (doc_id, pos)
    after the map-side ``pos − i`` shift, so Catalyst plans hash joins
    keyed on already-co-located data when the postings table is
    bucketed by token. Rarest-word-first ordering would shrink
    intermediates further; with equi-joins + AQE the join order is
    runtime-adapted anyway.

    Output: (doc_id, n_occurrences) for docs containing the phrase.
    """
    if len(phrase) < 1:
        raise ValueError("phrase must have at least one word")
    post = positional_postings(docs, text_col, id_col)
    # consumed once per phrase word — pin so the corpus tokenizes once
    post = post.localCheckpoint(eager=True)
    hits = None
    for i, w in enumerate(phrase):
        side = post.filter(F.col("token") == w.lower()).select(
            F.col(id_col),
            (F.col("pos") - F.lit(i)).alias("_start"),
        )
        hits = side if hits is None else hits.join(side, on=[id_col, "_start"])
    return hits.groupBy(id_col).agg(F.count("*").alias("n_occurrences"))


def pmi_collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Top-k adjacent-token collocations by PMI lift — the corpus
    phrase-mining pass (new-terminology discovery, tokenizer merge
    candidates). PMI = log lift where lift = P(ab)/(P(a)·P(b)) =
    joint·N / (fa·fb); log is monotone, so ranking by the RAW RATIO is
    PMI ranking without ever calling a transcendental — counts are
    exact integers, the ratio is one deterministic double division,
    and the oracle gate is bit-stable (no libm ulp drift).

    Scale shape: bigram + unigram counts are two map-side-combined
    hash aggs over one tokenization; unigram totals broadcast back
    onto the (vocabulary²-bounded, min_count-pruned) bigram table; N
    is a 1-row broadcast. Final top-k is a TakeOrdered, not a sort.

    Output: (tok_a, tok_b, joint, lift) — rounded lift, lexicographic
    tie-break.
    """
    # Adjacent pairs WITHIN a doc: zip the token array with its own
    # shift — map-side, no self-join, no positional shuffle.
    arr = ensure_parallelism(docs).select(
        F.filter(tokens(F.lower(F.col(text_col))), lambda t: t != "").alias(
            "_t"
        )
    )
    uni = (
        arr.select(F.explode("_t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("f"))
    )
    n_tokens = uni.agg(F.sum("f").alias("_n"))
    bi = (
        arr.select(
            F.explode(
                F.when(
                    F.size("_t") >= 2,
                    F.zip_with(
                        F.slice(F.col("_t"), 1, F.size("_t") - 1),
                        F.slice(F.col("_t"), 2, F.size("_t") - 1),
                        lambda a, b: F.struct(
                            a.alias("tok_a"), b.alias("tok_b")
                        ),
                    ),
                ).otherwise(F.array())
            ).alias("_p")
        )
        .select("_p.tok_a", "_p.tok_b")
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").alias("joint"))
        .filter(F.col("joint") >= min_count)
    )
    fa = uni.select(F.col("tok").alias("tok_a"), F.col("f").alias("_fa"))
    fb = uni.select(F.col("tok").alias("tok_b"), F.col("f").alias("_fb"))
    scored = (
        bi.join(fa, on="tok_a")
        .join(fb, on="tok_b")
        .crossJoin(F.broadcast(n_tokens))
        .select(
            "tok_a",
            "tok_b",
            "joint",
            # DOUBLE before multiplying: fa·fb as int64 overflows once
            # per-token counts pass ~3e9 (ANSI ARITHMETIC_OVERFLOW at
            # web scale); the double product is the same value both
            # engines compute, and the single rounded division is
            # deterministic.
            F.round(
                F.col("joint").cast("double") * F.col("_n").cast("double")
                / (F.col("_fa").cast("double") * F.col("_fb").cast("double")),
                4,
            ).alias("lift"),
        )
    )
    return (
        scored.orderBy(
            F.desc("lift"), F.asc("tok_a"), F.asc("tok_b")
        ).limit(k)
    )


def sparse_cosine_pairs(
    docs: DataFrame,
    threshold: float = 0.3,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Lexical (sparse TF-IDF) cosine similarity pairs over WORD-3-GRAM
    shingles — the bag-of-words twin of embedding_neardup: document
    pairs whose shingle tf-idf vectors' cosine clears ``threshold``.
    Catches near-dups and topical twins that embedding models smooth
    over (and vice versa — production curation runs both). The
    weighted upgrade of ngram_jaccard: repetition counts, rarity
    weighs.

    Vector space = shingles with document frequency ≤ ``max_df``: the
    same cap is the BLOCKING rule and the FEATURE rule, so scored
    cosine is exactly the cosine of the capped vectors — no
    silently-approximate dot product. (Shingles, not unigrams: a
    template-generated corpus can have a tiny unigram vocabulary where
    EVERY token is ubiquitous — measured on this testdata: 31 tokens,
    min df ≈ 0.78·N — which makes a unigram df cap hollow; 3-gram
    shingles stay discriminative, max df 25 at sf0.1.)

    Exactness: weights are tf·(ln((N+1)/(df+1))+1) rounded to 4 dp and
    lifted to INTEGER ten-thousandths; pair dots and norms are integer
    sums (order-free); cosine is one terminal division rounded to 6 dp.

    Plan shape (r12 posting-list restructure, guide §2.3/§2.4): one
    (doc, shingle) count shuffle → one shuffle by shingle where the
    window count IS the df table (no join back) and the surviving
    ≤``max_df`` (id, weight) posting list per shingle is collected —
    the ONLY materialized intermediate (one bounded row per shingle).
    Weighted pairs expand MAP-SIDE from each bounded list (the same
    Σ df² candidate work the former self-join did, without
    re-shuffling both postings sides or re-deriving the tokenize
    subtree per consumer); norms ride the same lists via one per-doc
    agg. Output: (id_a, id_b, cos) with cos ≥ threshold — identical
    values to the join formulation (same weights, same integer dot
    sums, same terminal division).
    """
    from pyspark.sql import Window

    from ..functions.text import word_shingles

    tf = (
        ensure_parallelism(docs)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(word_shingles(F.col(text_col))).alias("_tok"),
        )
        .groupBy("_id", "_tok")
        .agg(F.count("*").alias("_tf"))
    )
    capped = tf.withColumn(
        "_df", F.count("*").over(Window.partitionBy("_tok"))
    ).filter(F.col("_df") <= max_df)
    n_docs = docs.agg(F.count("*").alias("_n"))
    # weight = round(round(tf·(ln((N+1)/(df+1))+1), 4)·10⁴) as a long —
    # the identical double-op sequence the join formulation used,
    # applied per posting entry.
    postings = (
        capped.groupBy("_tok")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("_id"), F.col("_tf")))
            ).alias("_ps"),
            F.first("_df").alias("_df"),
        )
        .crossJoin(F.broadcast(n_docs))
        .select(
            F.expr(
                "transform(_ps, s -> struct(s._id as id, "
                "cast(round(round(s._tf * (ln((_n + 1.0) / (_df + 1.0)) "
                "+ 1.0), 4) * 10000) as bigint) as w))"
            ).alias("_pw")
        )
        .localCheckpoint(eager=False)
    )
    norms = (
        postings.select(F.explode("_pw").alias("_e"))
        .groupBy(F.col("_e.id").alias("_id"))
        .agg(F.sum(F.col("_e.w") * F.col("_e.w")).alias("_nn"))
    )
    dots = (
        postings.select(
            F.explode(
                F.expr(
                    "flatten(transform(_pw, (x, i) -> "
                    "transform(slice(_pw, i + 2, size(_pw)), "
                    "y -> struct(x.id as id_a, y.id as id_b, "
                    "x.w * y.w as p))))"
                )
            ).alias("_pair")
        )
        .groupBy("_pair.id_a", "_pair.id_b")
        .agg(F.sum("_pair.p").alias("_dot"))
    )
    na = norms.select(F.col("_id").alias("id_a"), F.col("_nn").alias("_na"))
    nb = norms.select(F.col("_id").alias("id_b"), F.col("_nn").alias("_nb"))
    return (
        dots.join(na, on="id_a")
        .join(nb, on="id_b")
        .filter((F.col("_na") > 0) & (F.col("_nb") > 0))
        .select(
            "id_a",
            "id_b",
            F.round(
                F.col("_dot")
                / (
                    F.sqrt(F.col("_na").cast("double"))
                    * F.sqrt(F.col("_nb").cast("double"))
                ),
                6,
            ).alias("cos"),
        )
        .filter(F.col("cos") >= threshold)
    )
