#!/usr/bin/env python
"""Fold multiple scaling-leg JSON files (same engine!) into both estimators.

Usage:
  python tools/fold_scaling_legs.py BENCH/scaling_r5_local1.json BENCH/scaling_r5b_local1.json -- \
         BENCH/scaling_r5_local4.json BENCH/scaling_r5b_local4.json

Files before `--` are the low-parallelism legs, after it the high legs.
Prints per-query rep lists, per-leg minima, and min-combined efficiency.
Refuses nothing — combining legs from DIFFERENT engines is the caller's
mistake; keep rounds in separate invocations.
"""

from __future__ import annotations

import json
import sys


def _reps(paths: list[str]) -> dict[str, list[float]]:
    out: dict[str, list[float]] = {}
    for p in paths:
        d = json.load(open(p))
        for rep in d.get("repeats", [d["min_combined"]]):
            for q, t in rep["queries"].items():
                out.setdefault(q, []).append(t)
    return out


def main() -> None:
    args = sys.argv[1:]
    split = args.index("--")
    lo, hi = _reps(args[:split]), _reps(args[split + 1 :])
    factor = 4.0
    print(f"{'query':24} {'lo reps':>30} {'hi reps':>30}  lo_min  hi_min   eff")
    for q in lo:
        lmin, hmin = min(lo[q]), min(hi[q])
        eff = (lmin / hmin) / factor
        print(
            f"{q:24} {str(sorted(lo[q])):>30} {str(sorted(hi[q])):>30} "
            f"{lmin:7.1f} {hmin:7.1f} {eff:6.3f}"
        )


if __name__ == "__main__":
    main()
