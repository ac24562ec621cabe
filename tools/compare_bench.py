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

Since round 9, bench.py imports :func:`compute_diff` and writes the same
adjudicated diff to ``bench_diff.json`` on every run (vs the latest
BENCH_r{N}.json), so the round-open ritual reads adjudicated deltas
instead of raw pairs.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Round-16 (VERDICT r15 task 4): the envelope's 4 draws are fresh-JVM
#: subprocesses but run BACK-TO-BACK, so draws 2-4 ride a warm OS page
#: cache / CPU state — the driver's single cold-box draw sits above the
#: warm-session envelope max for cheap queries (q_dq_constraints drew
#: 1.40 and 1.65 s across two driver rounds vs envelope max 1.29 —
#: inflation 1.09x/1.28x on an UNTOUCHED plan). A driver draw within
#: COLD_DRAW_MULTIPLIER x the envelope max is cold-draw-consistent and is
#: not flagged as outside-envelope (the 1.0 s absolute floor still
#: applies, so a real multi-second regression on a heavy query is never
#: absolved by this rule — at 1.35x it would need to be inside a 35%
#: window of a warm max, which the per-query spread term already covers).
COLD_DRAW_MULTIPLIER = 1.35


def qmap(path: str) -> dict[str, float]:
    with open(path) as fh:
        d = json.load(fh)
    # Driver BENCH_r{N}.json wraps the bench stdout under "parsed".
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d.get("queries", d)


def load_envelope() -> dict:
    try:
        with open(os.path.join(REPO, "BENCH_VARIANCE.json")) as fh:
            return json.load(fh)["queries"]
    except (OSError, KeyError, ValueError):
        return {}


def load_envelope_totals() -> list[float]:
    try:
        with open(os.path.join(REPO, "BENCH_VARIANCE.json")) as fh:
            return json.load(fh).get("totals_sec", [])
    except (OSError, ValueError):
        return []


def adjudicate_total(
    new: dict[str, float], env: dict, env_totals: list[float]
) -> dict:
    """Classify a suite TOTAL against the same-code envelope (round 13,
    VERDICT r12 task 2): the host's own noise floor moves between sessions
    (same-code totals spanned 227.6-343.9 s), so a total breach alone must
    not read as a plan regression.

    Both sides of the comparison come from the ENVELOPE — the only
    complete per-query baseline (the recorded BENCH_r{N}.json payloads are
    stdout-truncated to the ~60 most expensive queries, so an old-vs-new
    common set would be blind to regressions in the other ~170; round-13
    review finding). Verdicts:

    - ``within_envelope``   — total <= max same-code total; nothing to explain.
    - ``code_regression_suspected`` — total exceeds the envelope max AND at
      least half the excess is CONCENTRATED in queries individually
      drawing > 2x their own envelope median (the same suspect rule the
      redraw stage uses) — localized slowdowns noise can't absolve.
    - ``hot_session_suspected``     — the excess is DIFFUSE (sub-2x
      inflation across many queries) — the uniform-inflation signature of
      a hot session (SCALE §3.11/§3.16), not a plan change.

    ``unrecorded_sec`` reports time spent in queries with no envelope row
    (new queries on an add-only round): that time inflates the total but
    can never be attributed, so a large value means "regenerate the
    envelope before trusting this verdict".

    KNOWN LIMIT (round-13 review): very hot sessions also produce
    LOCALIZED >2x-median spikes (round 12 measured 10x single-query
    inflations), and the redraw stage debiases at most 8 of them — so a
    pathologically hot run with many residual spikes can still read as
    code_regression_suspected. That is why the verdict says *suspected*:
    per SCALE §3.17, a conviction requires a cool-session reproduction;
    ``n_concentrated`` is emitted so a reader can spot the
    many-small-contributors signature of that case.
    """
    if not env_totals:
        return {"verdict": "no_envelope"}
    total = round(sum(new.values()), 3)
    out: dict = {"new_total_sec": total, "envelope_max_sec": max(env_totals)}
    if total <= max(env_totals):
        out["verdict"] = "within_envelope"
        return out
    excess = total - max(env_totals)
    # presence test, not truthiness (ADVICE r13): a recorded median of 0.0
    # is a real envelope row — truthiness exempted such queries from
    # attribution and miscounted them into unrecorded_sec. The median is
    # FLOORED at 0.05 s in the suspect rule (ADVICE r14): a
    # sub-rounding-resolution envelope row (median exactly 0.0) would
    # otherwise satisfy t > 2*0.0 unconditionally and count its full draw
    # as concentrated excess — tipping a breached total toward
    # code_regression_suspected on noise alone.
    hot_rows = {
        q: t - env[q]["median"]
        for q, t in new.items()
        if env.get(q, {}).get("median") is not None
        and t > 2.0 * max(env[q]["median"], 0.05)
    }
    concentrated = sum(hot_rows.values())
    out["excess_sec"] = round(excess, 3)
    out["concentrated_excess_sec"] = round(concentrated, 3)
    out["n_concentrated"] = len(hot_rows)
    out["unrecorded_sec"] = round(
        sum(
            t
            for q, t in new.items()
            if env.get(q, {}).get("median") is None
        ),
        3,
    )
    out["verdict"] = (
        "code_regression_suspected"
        if concentrated >= 0.5 * excess
        else "hot_session_suspected"
    )
    return out


def compute_diff(
    old: dict[str, float],
    new: dict[str, float],
    env: dict | None = None,
    env_totals: list[float] | None = None,
) -> dict:
    """The adjudicated diff as data: common-set totals plus only the
    per-query rows that clear BOTH the envelope percentage and the 1 s
    absolute floor. Pure function so bench.py can emit it per-run."""
    if env is None:
        env = load_envelope()
    if env_totals is None:
        env_totals = load_envelope_totals()
    common = sorted(set(old) & set(new))
    tot_old = round(sum(old[q] for q in common), 3)
    tot_new = round(sum(new[q] for q in common), 3)
    flagged = []
    for q in common:
        a, b = old[q], new[q]
        if abs(b - a) < 1.0:
            continue
        allowed = max(env.get(q, {}).get("spread_pct", 50), 25) / 100.0
        if abs(b - a) / max(min(a, b), 1e-9) > allowed:
            env_max = env.get(q, {}).get("max")
            # cold-draw allowance (see COLD_DRAW_MULTIPLIER): a slower NEW
            # draw still within the multiplier of the warm envelope max is
            # consistent with a cold box, not a plan regression. Only
            # applies to regressions (b > a) — improvements always report.
            if (
                env_max is not None
                and b > a
                and b <= COLD_DRAW_MULTIPLIER * env_max
            ):
                continue
            flagged.append(
                {
                    "query": q,
                    "old_sec": a,
                    "new_sec": b,
                    "allowed_spread_pct": int(allowed * 100),
                    "envelope_max_sec": env_max,
                }
            )
    flagged.sort(key=lambda r: abs(r["new_sec"] - r["old_sec"]), reverse=True)
    adjudication = adjudicate_total(new, env, env_totals)
    return {
        "n_common": len(common),
        "common_total_old_sec": tot_old,
        "common_total_new_sec": tot_new,
        "ratio": round(tot_new / max(tot_old, 1e-9), 3),
        "outside_envelope": flagged,
        "new_only": sorted(set(new) - set(old)),
        "dropped": sorted(set(old) - set(new)),
        "new_total_sec": round(sum(new.values()), 3),
        "envelope_totals_sec": env_totals,
        "total_adjudication": adjudication["verdict"],
        "total_adjudication_detail": adjudication,
    }


def main() -> None:
    if len(sys.argv) != 3:
        print(__doc__, file=sys.stderr)
        sys.exit(2)
    d = compute_diff(qmap(sys.argv[1]), qmap(sys.argv[2]))
    print(
        f"common set: {d['n_common']} queries, "
        f"{d['common_total_old_sec']:.1f}s -> {d['common_total_new_sec']:.1f}s "
        f"({d['ratio']:.2f}x)"
    )
    print(
        f"total adjudication: {d['total_adjudication']} "
        f"(new total {d['new_total_sec']:.1f}s vs same-code envelope "
        f"{d['envelope_totals_sec']})"
    )
    if not d["outside_envelope"]:
        print("no per-query delta exceeds the measured noise envelope")
    for r in d["outside_envelope"]:
        print(
            f"  OUTSIDE ENVELOPE: {r['query']} {r['old_sec']:.2f}s -> "
            f"{r['new_sec']:.2f}s (same-code spread allows "
            f"{r['allowed_spread_pct']}%)"
        )
    if d["new_only"]:
        head = ", ".join(d["new_only"][:8])
        more = (
            f" (+{len(d['new_only']) - 8} more)" if len(d["new_only"]) > 8 else ""
        )
        print(f"new-only queries ({len(d['new_only'])}): {head}{more}")


if __name__ == "__main__":
    main()
