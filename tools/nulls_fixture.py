#!/usr/bin/env python
"""NULL-bearing parity fixture for the fingerprint/dedup family.

The NULL-text convention (streaming/dedup_stream.py: a document with
no text has no fingerprint, is never "kept", and still counts in
n_docs) is code- and unit-test-pinned, but the driver testdata
contains zero NULL-text rows, so the ORACLE gate never exercises it —
exactly the gate-blind class ADVICE r9 flagged. This builder derives a
small scratch SF dir from sf0.001 with the NULL/edge rows injected;
tools/parity_report.py (and tests) run the dedup-family queries with
their REGISTERED oracles over it, value-level.

Injected rows (deterministic, ids far above any real doc_id):
- documents: NULL text (with and without lang/n_chars), empty-string
  text, whitespace-only text (trims to the same md5('') fingerprint
  as empty — a real collision the convention must survive), a
  NULL-doc_id row whose text DUPLICATES an existing doc (no event
  time → never kept by the watermarked stream, but its fingerprint is
  still counted once via the original), and a plain duplicate-text
  row.
- events: one NULL event_id row (a NULL dedup key must pass through
  exactly once, not be silently dropped) and one NULL value row.
"""

from __future__ import annotations

import os

import duckdb

SRC_DEFAULT = "/root/testdata/sf0.001"

# queries whose registered oracles are exercised over the fixture
FAMILY = (
    "q11_dedup_exact",
    "q44_stream_dedup",
    "q230_stream_dedup",
    "q232_stream_dedup_watermarked",
)


def build_nulls_fixture(out_dir: str, src_dir: str = SRC_DEFAULT) -> str:
    """Write documents.parquet + events.parquet with NULL rows injected;
    returns ``out_dir``."""
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    docs_src = os.path.join(src_dir, "documents.parquet")
    events_src = os.path.join(src_dir, "events.parquet")

    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{docs_src}')
          UNION ALL
          SELECT * FROM (
            SELECT
              CAST(v.doc_id AS BIGINT) AS doc_id,
              CASE WHEN v.text_ref IS NOT NULL
                   THEN (SELECT d.text FROM read_parquet('{docs_src}') d
                         WHERE d.doc_id = v.text_ref)
                   ELSE v.text END AS text,
              v.lang, v.source,
              CAST(v.n_chars AS BIGINT) AS n_chars
            FROM (VALUES
              (10000, NULL,  NULL, 'en', 'synthetic', NULL),
              (10001, NULL,  NULL, NULL, 'synthetic', 0),
              (10002, '',    NULL, 'en', 'synthetic', 0),
              (10003, '   ', NULL, 'en', 'synthetic', 3),
              (NULL,  NULL,  0,    'en', 'synthetic', NULL),
              (10004, NULL,  1,    'en', 'synthetic', NULL)
            ) AS v(doc_id, text, text_ref, lang, source, n_chars)
          )
        ) TO '{os.path.join(out_dir, "documents.parquet")}'
          (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM read_parquet('{events_src}')
          UNION ALL
          SELECT * FROM (VALUES
            (NULL, TIMESTAMP '2024-06-01 12:00:00', CAST(1 AS BIGINT),
             'click', CAST(1.5 AS DOUBLE), NULL),
            (CAST(99000001 AS BIGINT), TIMESTAMP '2024-06-01 12:00:01',
             CAST(2 AS BIGINT), 'view', NULL, NULL)
          ) AS v(event_id, ts, user_id, event_type, value, props)
        ) TO '{os.path.join(out_dir, "events.parquet")}'
          (FORMAT PARQUET)
        """
    )
    con.close()
    return out_dir


if __name__ == "__main__":
    import sys

    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfnulls"
    print(build_nulls_fixture(out))
