#!/usr/bin/env python
"""Diff two bench sidecars and print per-query ratios net of the
host-drift window.

The box's clock speed drifts between measurement hours (documented in
BENCH_DETAIL.json notes across rounds: identical code has measured
uniform x1.08-1.19 swings with load 0.0 both times). Raw per-query
ratios therefore conflate real regressions with the window. This script
recovers the window factor as the MEDIAN ratio over queries the caller
did NOT change (all queries by default; pass --changed to exclude the
ones touched this round) and reports each query's ratio net of it —
the computation the round judge otherwise redoes by hand.

Usage:
    python tools/bench_compare.py BENCH_r07.json BENCH_r08.json
    python tools/bench_compare.py OLD.json NEW.json --changed sampling_ops,llm_prep_ops
    python tools/bench_compare.py OLD.json NEW.json --flag 1.2

Accepts either sidecar shape: the driver's BENCH_r*.json wrapper
(queries under .parsed.queries) or bench.py's raw one-line JSON
(queries at top level). Exit code 1 when any net ratio exceeds --flag
(default 1.25), so it can gate CI.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    if "queries" in doc:
        return doc["queries"]
    if "parsed" in doc and "queries" in doc["parsed"]:
        return doc["parsed"]["queries"]
    raise SystemExit(f"{path}: no 'queries' map found (wrapper or raw)")


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("old", help="baseline sidecar (e.g. BENCH_r07.json)")
    ap.add_argument("new", help="candidate sidecar (e.g. BENCH_r08.json)")
    ap.add_argument(
        "--changed",
        default="",
        help="comma-separated queries changed this round (excluded from "
        "the window estimate)",
    )
    ap.add_argument(
        "--flag",
        type=float,
        default=1.25,
        help="net ratio above which a query is flagged (default 1.25)",
    )
    args = ap.parse_args()

    old = load_queries(args.old)
    new = load_queries(args.new)
    changed = {q for q in args.changed.split(",") if q}

    common = sorted(set(old) & set(new))
    if not common:
        raise SystemExit("no common queries between the two sidecars")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))

    ratios = {q: new[q] / old[q] if old[q] > 0 else float("inf") for q in common}
    window_basis = [r for q, r in ratios.items() if q not in changed]
    window = statistics.median(window_basis) if window_basis else 1.0

    print(f"window factor (median over {len(window_basis)} untouched "
          f"queries): x{window:.3f}")
    print(f"{'query':<32} {'old_s':>8} {'new_s':>8} {'ratio':>7} "
          f"{'net':>7}  note")
    flagged = []
    for q in sorted(common, key=lambda q: -(ratios[q] / window)):
        net = ratios[q] / window
        notes = []
        if q in changed:
            notes.append("changed")
        if abs(new[q] - old[q]) < 0.2:
            notes.append("jitter-band(<0.2s)")
        elif net > args.flag:
            notes.append(f"FLAG>{args.flag}")
            flagged.append(q)
        elif net < 1 / args.flag:
            notes.append("improved")
        print(f"{q:<32} {old[q]:>8.3f} {new[q]:>8.3f} {ratios[q]:>7.2f} "
              f"{net:>7.2f}  {' '.join(notes)}")

    tot_old, tot_new = sum(old[q] for q in common), sum(new[q] for q in common)
    print(f"{'TOTAL(common)':<32} {tot_old:>8.3f} {tot_new:>8.3f} "
          f"{tot_new / tot_old:>7.2f} {tot_new / tot_old / window:>7.2f}")
    for q in only_old:
        print(f"only in {args.old}: {q} ({old[q]:.3f}s)")
    for q in only_new:
        print(f"only in {args.new}: {q} ({new[q]:.3f}s)")
    if flagged:
        print(f"flagged: {','.join(flagged)}")
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
