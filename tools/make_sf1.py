#!/usr/bin/env python
"""Build the synthetic sf1 scale point: sf0.1 unioned 10× with disjoint
key offsets — the third data point for the scaling sweeps in PLANS.md
(§2v and the round-5 sweep).

Replication scheme:
- orders / lineitem / events / embeddings AND the customer / supplier /
  part dimensions: each replica i shifts the primary key and every
  replicated foreign key by i·10^8, so fact→dim joins stay consistent
  WITHIN a replica (no dangling FKs) and never match across replicas —
  the workload sees 10× more keys, not 10× hotter keys.
- region / nation: copied verbatim (their keys are never shifted, and
  c_nationkey / s_nationkey are left unshifted so the geography joins
  still resolve).
- documents: copied verbatim — text operators see a near-dup-heavy
  corpus, the adversarial case for df-capped blocking (PLANS.md §2v).

Usage: python tools/make_sf1.py [out_dir] [src_dir]
       (defaults: /tmp/sf1, /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

#: per-replica key shift — far above any real key in the testdata
OFFSET = 100_000_000

#: table -> (primary key, replicated foreign keys)
OFFSET_TABLES: dict[str, tuple[str, tuple[str, ...]]] = {
    "orders": ("o_orderkey", ("o_custkey",)),
    "lineitem": ("l_orderkey", ("l_suppkey", "l_partkey")),
    "customer": ("c_custkey", ()),
    "supplier": ("s_suppkey", ()),
    "part": ("p_partkey", ()),
    "events": ("event_id", ("user_id",)),
    "embeddings": ("vec_id", ()),
}

VERBATIM_TABLES = ("region", "nation", "documents")


def main() -> int:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t, (pk, fks) in OFFSET_TABLES.items():
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{src}/{t}.parquet')"
            ).fetchall()
        ]
        shifted = {pk, *fks}
        parts = []
        for i in range(10):
            sel = ", ".join(
                f"{c} + {i * OFFSET} AS {c}" if c in shifted else c
                for c in cols
            )
            parts.append(f"SELECT {sel} FROM read_parquet('{src}/{t}.parquet')")
        con.execute(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{out}/{t}.parquet' "
            "(FORMAT PARQUET, ROW_GROUP_SIZE 200000)"
        )
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{out}/{t}.parquet')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    for t in VERBATIM_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{out}/{t}.parquet")
        print(f"{t}: copied verbatim")
    print(f"sf1 at {out} — run e.g. SPARK_GRAFT_SF_DIR={out} python bench.py")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
