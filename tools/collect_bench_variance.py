"""Regenerate BENCH_VARIANCE.json: run the full bench N times on an idle
box (same code, same SF) and record each query's min/median/max/spread —
the noise envelope tools/compare_bench.py (and bench.py's per-run
bench_diff.json) adjudicate per-query deltas against.

POLICY (round 9, see CLAUDE.md): any round that changes a declared
query's PLAN must re-run this tool before trusting compare_bench output —
the envelope is a property of the code tree, and stale rows make the tool
flag (or absolve) with the wrong spread. Rounds that only add queries or
touch docs/tests can keep the prior envelope; new queries fall back to
the 50% unrecorded default until measured.

Usage:  python tools/collect_bench_variance.py [--runs 4]
            [--families substr1,substr2]

--families merges a targeted re-measure into the EXISTING envelope: only
queries whose name contains one of the substrings are re-recorded (the
bench still runs whole — per-query timing context is the suite, matching
how BENCH_r{N} draws are produced — but untouched families keep their
prior rows and the top-level totals are only replaced on a full
regeneration).
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "BENCH_VARIANCE.json")
FULL = os.path.join(REPO, "bench_full.json")


def one_run(i: int, n: int) -> dict:
    print(f"[variance] bench run {i + 1}/{n} ...", file=sys.stderr, flush=True)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        cwd=REPO,
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        check=False,
    )
    if proc.returncode != 0:
        raise RuntimeError(f"bench run {i + 1} exited rc={proc.returncode}")
    with open(FULL) as fh:
        d = json.load(fh)
    if d.get("errors"):
        raise RuntimeError(f"bench run {i + 1} had errors: {list(d['errors'])[:5]}")
    print(
        f"[variance] run {i + 1}: total {d['total_sec']}s", file=sys.stderr, flush=True
    )
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=4)
    ap.add_argument(
        "--families",
        default="",
        help="comma-separated name substrings: merge-update only matching queries",
    )
    args = ap.parse_args()
    fams = [f for f in args.families.split(",") if f]

    runs = [one_run(i, args.runs) for i in range(args.runs)]
    per_q: dict[str, list[float]] = {}
    for d in runs:
        for q, s in d["queries"].items():
            per_q.setdefault(q, []).append(s)

    rows = {
        q: {
            "min": round(min(v), 3),
            "median": round(statistics.median(v), 3),
            "max": round(max(v), 3),
            "spread_pct": int(round((max(v) - min(v)) / max(min(v), 1e-9) * 100)),
        }
        for q, v in sorted(per_q.items())
        if len(v) == args.runs
    }

    if fams:
        with open(OUT) as fh:
            doc = json.load(fh)
        updated = {q: r for q, r in rows.items() if any(f in q for f in fams)}
        doc["queries"].update(updated)
        doc["what"] += f" | families {args.families} re-measured ({args.runs} runs)"
        # doc["runs"] (full-regeneration per-run maps) now PREDATES the
        # re-measured family rows — keep the new draws under a separate key
        # so a later fold can't silently mix stale family draws (ADVICE r9).
        doc.setdefault("family_runs", []).append(
            {
                "families": fams,
                "runs": [
                    {
                        q: s
                        for q, s in d["queries"].items()
                        if any(f in q for f in fams)
                    }
                    for d in runs
                ],
            }
        )
        doc["runs_note"] = (
            "doc['runs'] predates the most recent --families re-measure; "
            "re-measured family draws live under doc['family_runs']"
        )
        print(
            f"[variance] merged {len(updated)} family rows into existing envelope",
            file=sys.stderr,
        )
    else:
        doc = {
            "what": (
                f"per-query min/median/max over {args.runs} same-code bench runs "
                "(idle box) - use to separate host noise from real plan "
                "regressions before re-litigating any BENCH_r{N} per-query "
                "delta; regenerate after any round that changes declared plans "
                "(tools/collect_bench_variance.py)"
            ),
            "sf": runs[0].get("sf"),
            "totals_sec": [d["total_sec"] for d in runs],
            # full per-run maps: lets a later session FOLD additional draws
            # (e.g. a hotter batch) into the envelope without re-running
            "runs": [d["queries"] for d in runs],
            "queries": rows,
        }
    with open(OUT, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(f"[variance] wrote {OUT} ({len(doc['queries'])} queries)", file=sys.stderr)


if __name__ == "__main__":
    main()
