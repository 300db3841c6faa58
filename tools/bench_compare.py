#!/usr/bin/env python
"""Normalized cross-round bench comparison.

Reads two BENCH_FULL*.json artifacts and compares per-query timings on
the PROBE-NORMALIZED series when both sides carry it (falls back to
raw otherwise, with a loud note). This is the comparison VERDICT r9
asked for: identical plans measured 1.15→10.98 s across sweeps under
co-tenant load, so raw cross-round deltas are noise unless both
probe spreads are ~1.

Usage: python tools/bench_compare.py OLD.json NEW.json [top_n]
         [--gate [RATIO]] [--markdown]
Prints: totals (raw + normalized), probe spreads, and the top_n
biggest normalized movers in each direction with their raw twins.

``--gate [RATIO]`` (default 1.5) is the committed cross-round
regression contract (VERDICT r10 item 3): after the report, exit
non-zero if any common query ≥200 ms grew more than RATIO× on BOTH
the normalized AND the raw series — the loud failure a silent perf
decay must hit before a round closes. (Two series because the old
artifact's probe spread deflates its normalized baselines: a query
measured under 10× load shows a phantom norm-only regression next
round even when its raw time improved; a genuine regression moves
both series. Norm-only movers print as a note.) RATIO must be
written with a decimal point (``--gate 2.0``) — a bare integer after
``--gate`` is taken as the positional top_n, not the ratio.
``--markdown`` appends a compact markdown ratio table (for PLANS.md
§2) after the plain report.
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
    argv = list(sys.argv[1:])
    gate_ratio = None
    if "--gate" in argv:
        i = argv.index("--gate")
        argv.pop(i)
        # only a dotted number is a ratio — a bare integer after
        # --gate is the positional top_n ("... 20 --gate" reordered),
        # and silently reading it as a 20x ratio would disable the
        # regression check without any warning
        if (
            i < len(argv)
            and "." in argv[i]
            and not argv[i].endswith(".json")
            and argv[i].replace(".", "", 1).isdigit()
        ):
            gate_ratio = float(argv.pop(i))
        else:
            gate_ratio = 1.5
            if (
                i < len(argv)
                and argv[i].isdigit()
                and not argv[i].endswith(".json")
            ):
                print(
                    f"note: '{argv[i]}' after --gate taken as top_n, "
                    "gate ratio defaulting to 1.5 — write --gate "
                    f"{argv[i]}.0 for a ratio"
                )
    markdown = "--markdown" in argv
    if markdown:
        argv.remove("--markdown")
    if len(argv) < 2:
        raise SystemExit(__doc__)
    old, new = load(argv[0]), load(argv[1])
    top_n = int(argv[2]) if len(argv) > 2 else 10

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

    if markdown:
        print(
            "\n| round pair | common | norm total old | norm total new "
            "| ratio | worst mover |"
        )
        print("|---|---|---|---|---|---|")
        worst = movers[-1] if movers else (float("nan"), "-")
        print(
            f"| {argv[0]} → {argv[1]} | {len(common)} | {o_tot:.1f}s "
            f"| {n_tot:.1f}s | {ratio:.3f}x | {worst[1]} "
            f"{worst[0]:.2f}x |"
        )

    if gate_ratio is not None:
        # A genuine regression grows on BOTH series. Normalization
        # error scales with the OLD artifact's probe spread: a query
        # measured during a 10x-loaded probe window gets its old
        # normalized value deflated ~10x, so the norm-only ratio
        # mis-fires as a phantom regression even when the raw reading
        # IMPROVED (seen r10→r11: 11 queries >1.5x normalized, every
        # raw twin flat-or-better, old spread 9.84). Requiring the raw
        # ratio to cross the gate too keeps the contract sensitive to
        # real decay (which moves both series) and immune to the
        # normalization artifact (which moves only one).
        offenders = [
            (r, q)
            for r, q in movers
            if r > gate_ratio
            and o_raw.get(q, 0) > 0
            and n_raw.get(q, 0) / o_raw[q] > gate_ratio
        ]
        norm_only = [
            (r, q)
            for r, q in movers
            if r > gate_ratio and (r, q) not in offenders
        ]
        if not (o_has and n_has):
            print(
                f"\nGATE SKIPPED: normalized series missing on one side — "
                "raw deltas cannot gate under co-tenant noise"
            )
        elif offenders:
            print(
                f"\nGATE FAIL (>{gate_ratio}x growth on BOTH series for "
                f"{len(offenders)} queries):"
            )
            for r, q in sorted(offenders, reverse=True):
                print(
                    f"  {r:5.2f}x  {q}: norm {o_norm[q]:.2f}->"
                    f"{n_norm[q]:.2f} raw {o_raw[q]:.2f}->{n_raw[q]:.2f}"
                )
            raise SystemExit(2)
        else:
            if norm_only:
                # print each raw ratio: "raw under the gate" spans
                # genuinely-flat (<=1.0x) and borderline growth
                # (1.0..gate) — a 1.4x raw mover at gate 1.5 is a real
                # borderline regression, not noise (ADVICE r11)
                print(
                    f"\ngate note: {len(norm_only)} queries grew "
                    f">{gate_ratio}x on the normalized series only "
                    "(raw under the gate — per-query raw ratios "
                    "below; >1.0x raw is borderline growth, not flat):"
                )
                for r, q in sorted(norm_only, reverse=True):
                    rr = (
                        n_raw.get(q, 0) / o_raw[q]
                        if o_raw.get(q)
                        else float("nan")
                    )
                    print(
                        f"  norm {r:5.2f}x raw {rr:5.2f}x  {q}: "
                        f"raw {o_raw.get(q, 0):.2f}->{n_raw.get(q, 0):.2f}"
                    )
            print(
                f"\nGATE PASS: no query grew >{gate_ratio}x on both "
                "raw and normalized series"
            )


if __name__ == "__main__":
    main()
