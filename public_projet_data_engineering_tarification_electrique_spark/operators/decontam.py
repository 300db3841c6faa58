"""Eval-set decontamination: flag val/test documents that share word
n-grams with the training split — the standard overlap check run
before training (a benchmark answer leaked into the training corpus
inflates eval scores; production pipelines drop or flag such docs).

Scale shape: shingles (k consecutive words, space-joined) are emitted
per doc, the train side reduces to DISTINCT shingles, and detection is
one shuffle semi-join on the shingle string — the eval side is tiny
relative to train, and only shingles (bytes, not documents) flow
through the exchange. At 100 TB the train shingle set is itself huge;
the production variant hashes shingles to 64-bit and bloom-filters the
eval probe — same plan shape, smaller exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import word_shingles
from .sampling import hash_split
from .util import ensure_parallelism


def contamination_report(
    docs: DataFrame,
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    split_col: str = "split",
) -> DataFrame:
    """Per-eval-split contamination counts against the train split.

    Splits come from ``hash_split`` (deterministic md5 buckets). A
    val/test document is contaminated when ANY of its k-word shingles
    appears in ANY train document. Output: (split, n_docs,
    n_contaminated) for the eval splits.
    """
    split = hash_split(ensure_parallelism(docs), id_col, split_col=split_col)
    # No distinct here: both consumers re-reduce anyway (train side
    # distincts on sh, eval side distincts on (split, id) after the
    # semi-join), so a 3-column distinct at this width would add a
    # full corpus-shingle exchange executed TWICE (once per consumer)
    # for zero semantic effect — the dominant cost at scale.
    shingled = split.select(
        id_col,
        split_col,
        F.explode(word_shingles(F.col(text_col), k=k)).alias("sh"),
    )
    train_sh = (
        shingled.filter(F.col(split_col) == "train").select("sh").distinct()
    )
    eval_sh = shingled.filter(F.col(split_col) != "train")
    contaminated = (
        eval_sh.join(train_sh, on="sh", how="left_semi")
        .select(split_col, id_col)
        .distinct()
        .groupBy(split_col)
        .agg(F.count("*").alias("n_contaminated"))
    )
    totals = (
        split.filter(F.col(split_col) != "train")
        .groupBy(split_col)
        .agg(F.count("*").alias("n_docs"))
    )
    return totals.join(contaminated, on=split_col, how="left").select(
        split_col,
        "n_docs",
        F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
    )
