"""Text analysis operators (extension surface): per-document quality
scoring and heuristic language ID. All built-in expressions — at 100 TB
these are a single codegen'd projection over the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import punct_ratio, stopword_ratio, token_count
from .util import ensure_parallelism


def quality_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality + heuristic language ID.

    - pred_lang: n-gram/stopword heuristic — a document whose stopword
      ratio clears a threshold is tagged English ('en'), else unknown
      ('unk'). (A real model slots in as a broadcast n-gram profile
      table; the operator shape — pure projection — is the point.)
    - quality: length-saturating token count × (1 − punctuation ratio),
      the standard cheap fluency proxy.
    """
    t = F.col(text_col)
    n_tokens = token_count(t)
    stop = stopword_ratio(t)
    return ensure_parallelism(docs).select(
        id_col,
        F.col("lang"),
        F.when(stop > 0.04, F.lit("en")).otherwise(F.lit("unk")).alias("pred_lang"),
        F.round(
            F.least(F.lit(1.0), n_tokens / F.lit(120.0)) * (F.lit(1.0) - punct_ratio(t)),
            4,
        ).alias("quality"),
    )
