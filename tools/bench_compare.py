#!/usr/bin/env python
"""Normalized cross-round bench comparison.

Reads two BENCH_FULL*.json artifacts and compares per-query timings on
the PROBE-NORMALIZED series when both sides carry it (falls back to
raw otherwise, with a loud note). This is the comparison VERDICT r9
asked for: identical plans measured 1.15→10.98 s across sweeps under
co-tenant load, so raw cross-round deltas are noise unless both
probe spreads are ~1.

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]
Prints: totals (raw + normalized), probe spreads, and the top_n
biggest normalized movers in each direction with their raw twins.
"""

from __future__ import annotations

import json
import sys


def load(path: str):
    with open(path) as f:
        d = json.load(f)
    # a driver BENCH_r{N}.json wraps the compact line under "parsed"
    if "queries" not in d and isinstance(d.get("parsed"), dict):
        d = d["parsed"]
    if "queries" not in d:
        raise SystemExit(
            f"{path}: no per-query timings (unparsed driver record?) — "
            "use the BENCH_FULL_sf*.json artifact instead"
        )
    return d


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    def series(d):
        if "queries_normalized" in d:
            return d["queries_normalized"], d["queries"], True
        return d["queries"], d["queries"], False

    o_norm, o_raw, o_has = series(old)
    n_norm, n_raw, n_has = series(new)
    if not (o_has and n_has):
        print(
            "note: normalized series missing on one side — comparing RAW "
            "wall-clock; treat deltas under ~3x as ambient noise"
        )
    common = sorted(set(o_norm) & set(n_norm))
    o_tot = sum(o_norm[q] for q in common)
    n_tot = sum(n_norm[q] for q in common)
    print(f"common queries: {len(common)}")
    print(
        f"old: total={old.get('value')} norm={old.get('value_normalized')} "
        f"spread={old.get('probe', {}).get('spread')}"
    )
    print(
        f"new: total={new.get('value')} norm={new.get('value_normalized')} "
        f"spread={new.get('probe', {}).get('spread')}"
    )
    ratio = n_tot / o_tot if o_tot else float("nan")
    print(
        f"common-set comparison ({'normalized' if o_has and n_has else 'raw'}):"
        f" {o_tot:.1f}s -> {n_tot:.1f}s = {ratio:.3f}x"
    )
    movers = sorted(
        (
            (n_norm[q] / o_norm[q], q)
            for q in common
            if o_norm[q] >= 0.2  # sub-200ms queries are all jitter
        ),
        key=lambda t: t[0],
    )
    print(f"\nbiggest regressions (normalized, raw in parens):")
    for r, q in movers[-top_n:][::-1]:
        print(
            f"  {r:5.2f}x  {q}: {o_norm[q]:.2f}->{n_norm[q]:.2f} "
            f"(raw {o_raw.get(q):.2f}->{n_raw.get(q):.2f})"
        )
    print(f"\nbiggest improvements:")
    for r, q in movers[:top_n]:
        print(
            f"  {r:5.2f}x  {q}: {o_norm[q]:.2f}->{n_norm[q]:.2f} "
            f"(raw {o_raw.get(q):.2f}->{n_raw.get(q):.2f})"
        )


if __name__ == "__main__":
    main()
