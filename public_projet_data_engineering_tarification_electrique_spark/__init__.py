"""PySpark-native analytics engine with the query & data-processing
capabilities of the reference repo
``FrancLgd/PUBLIC-Projet-Data-Engineering-Tarification-Electrique``
(a French electricity-tariff estimation system), re-expressed
Spark-first (DataFrame/SQL/Catalyst/Structured Streaming) and extended
with LLM-data-pipeline operators (dedup, similarity search, text
analysis, multimodal columns) designed for 100 TB scale.

Layout
------
- ``session``    : tuned SparkSession factory + runtime conf.
- ``sources``    : schema-declared readers/writers (parquet/csv/json),
                   idempotent partition-overwrite sink, REST source.
- ``functions``  : column-expression helpers (pricing formulas, text
                   metrics, vector math) — all JVM-side, no Python UDFs
                   in the hot path.
- ``operators``  : composed dataflow operators (trailing-window agg,
                   lead-over-year ratio, per-group OLS forecast, batch
                   price scoring, dedup family, ANN similarity, text
                   stats, multimodal plumbing).
- ``plans``      : the query registry — every operator exposed as a
                   (spark_fn, oracle_sql) pair for the correctness gate.
- ``streaming``  : Structured Streaming flavors (availableNow daily
                   ingest, watermarked windowed aggregation).

Reference parity: see SURVEY.md §2 (operator inventory). Citations to
the reference (file:line) live in each operator's docstring.
"""

__version__ = "0.1.0"

from .session import get_spark, configure  # noqa: F401
