"""Noise-aware bench comparison: diff two BENCH_r{N}.json (or
bench_full.json) files and flag only per-query deltas that exceed the
measured same-code noise envelope (BENCH_VARIANCE.json, round 8) — so a
round's verdict doesn't re-litigate host noise as plan regressions
(round 7 spent a task proving a "regression" was environmental; round 8
measured same-code spreads up to ~96% per query, SCALE.md §3.11).

Usage:  python tools/compare_bench.py OLD.json NEW.json

A query is flagged only if BOTH hold:
  - its delta exceeds max(its recorded same-code spread, 25%) — the
    4-run envelope in BENCH_VARIANCE.json UNDERSAMPLES per-query variance
    (cross-box draws add their own term: keep_best measured an 8% 4-run
    spread locally but drew 3.8–9.3 s across driver rounds), so 25% is
    the flagging floor; 50% is used when a query is unrecorded, AND
  - the absolute delta is >= 1.0 s (sub-second moves are scheduling jitter
    at any percentage).
Exit 0 always (informational tool).
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def qmap(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    # Driver BENCH_r{N}.json wraps the bench stdout under "parsed".
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d.get("queries", d)


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    old, new = qmap(sys.argv[1]), qmap(sys.argv[2])
    try:
        with open(os.path.join(REPO, "BENCH_VARIANCE.json")) as fh:
            env = json.load(fh)["queries"]
    except OSError:
        env = {}

    common = sorted(set(old) & set(new))
    tot_old = sum(old[q] for q in common)
    tot_new = sum(new[q] for q in common)
    print(
        f"common set: {len(common)} queries, {tot_old:.1f}s -> {tot_new:.1f}s "
        f"({tot_new / max(tot_old, 1e-9):.2f}x)"
    )
    flagged = []
    for q in common:
        a, b = old[q], new[q]
        if abs(b - a) < 1.0:
            continue
        allowed = max(env.get(q, {}).get("spread_pct", 50), 25) / 100.0
        if abs(b - a) / max(min(a, b), 1e-9) > allowed:
            flagged.append((abs(b - a), q, a, b, allowed))
    if not flagged:
        print("no per-query delta exceeds the measured noise envelope")
    for d, q, a, b, allowed in sorted(flagged, reverse=True):
        print(
            f"  OUTSIDE ENVELOPE: {q} {a:.2f}s -> {b:.2f}s "
            f"(same-code spread allows {allowed:.0%})"
        )
    only_new = sorted(set(new) - set(old))
    if only_new:
        head = ", ".join(only_new[:8])
        more = f" (+{len(only_new) - 8} more)" if len(only_new) > 8 else ""
        print(f"new-only queries ({len(only_new)}): {head}{more}")


if __name__ == "__main__":
    main()
