"""Generate the next round's DRIVER_PRIORITY from the CORRECTNESS_r*.json
artifacts: oldest-driver-proof-first, with never-proven (new/re-declared)
queries at the very front.

The driver consumes a ~50-entry prefix of the registry per round, so the
rotation rule is mechanical: any query without a driver-green row yet goes
first (new code needs the hard check most), then everything else sorted by
ascending latest-green round (name-ordered within a round) so each round's
prefix always lands on the stalest proofs. Round 8 hand-derived exactly
this ordering; this tool makes it reproducible and mistake-proof.

Usage:  python tools/rotate_driver_priority.py            # print the tuple
        python tools/rotate_driver_priority.py --write    # rewrite
                                                          # registry.py's
                                                          # DRIVER_PRIORITY
                                                          # in place
        ... --reprove q_a,q_b    treat the named queries as never-proven
                                 (front of the order) — REQUIRED whenever a
                                 round changes an already-green query's plan
                                 or oracle, since its latest CORRECTNESS row
                                 proves the OLD plan (round-10 lesson: the
                                 gray-zone margin upgrade would otherwise
                                 ride a stale r9 proof at the tail)

After --write: update the head comment in registry.py (it narrates WHY the
current head is what it is — the tool does not write prose), re-run
`pytest tests/test_plans.py tests/test_round4_ops.py -q` (registry gates),
and eyeball `git diff`.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def latest_green_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"r(\d+)", os.path.basename(f))
        if not m:
            continue
        rnd = int(m.group(1))
        with open(f) as fh:
            d = json.load(fh)
        for q, v in d.items():
            if (
                isinstance(v, dict)
                and v.get("hash_match")
                and v.get("rows_match")
                and v.get("schema_match")
            ):
                latest[q] = max(latest.get(q, 0), rnd)
    return latest


def rotated_order(reprove: frozenset[str] = frozenset()) -> list[str]:
    from join_example_spark.registry import load_all

    latest = latest_green_rounds()
    names = list(load_all().keys())
    # never-proven first (round 0; --reprove names are demoted to round 0
    # too — their green rows prove a superseded plan), then ascending
    # latest-green, then name
    return sorted(
        names, key=lambda n: (0 if n in reprove else latest.get(n, 0), n)
    )


MARKER = "#: BEGIN AUTO-ROTATION"


def generated_block(
    order: list[str],
    latest: dict[str, int],
    reprove: frozenset[str] = frozenset(),
) -> str:
    """The sentinel comment + narrative + tuple, regenerated as one unit so
    the head comment can never go stale relative to the ordering (the
    round-8 verdict's recurring gap #1)."""
    from collections import Counter

    latest = {n: r for n, r in latest.items() if n not in reprove}
    new = [n for n in order if n not in latest]
    hist = Counter(latest[n] for n in order if n in latest)
    hist_s = ", ".join(f"r{r}x{c}" for r, c in sorted(hist.items()))
    head = order[:50]
    head_hist = Counter(
        f"r{latest[n]}" if n in latest else "new" for n in head
    )
    head_s = ", ".join(f"{k}x{c}" for k, c in sorted(head_hist.items()))
    rounds = sorted({r for r in latest.values()})
    src_s = f"CORRECTNESS_r{{{rounds[0]}..{rounds[-1]}}}" if rounds else "none"
    lines = [
        MARKER,
        "#: (rewritten by tools/rotate_driver_priority.py --write — do not",
        "#: hand-edit; the tool regenerates comment AND tuple together)",
        f"#: Ordering: never-proven/replanned first ({len(new)}: "
        + (", ".join(new) if new else "none")
        + "),",
        "#: then ascending latest-driver-green round, name-ordered within a",
        f"#: round. Latest-green histogram: {hist_s}.",
        f"#: Head-50 composition: {head_s}. Derived from {src_s}.json.",
    ]
    body = "\n".join(f'    "{n}",' for n in order)
    return (
        "\n".join(lines)
        + "\nDRIVER_PRIORITY: tuple[str, ...] = (\n"
        + body
        + "\n)\n"
    )


def main() -> None:
    reprove: frozenset[str] = frozenset()
    if "--reprove" in sys.argv:
        idx = sys.argv.index("--reprove")
        if idx + 1 >= len(sys.argv) or sys.argv[idx + 1].startswith("--"):
            raise SystemExit(
                "usage: --reprove q_name1,q_name2 (a comma-separated value "
                "must follow --reprove; it may not start with '--')"
            )
        reprove = frozenset(sys.argv[idx + 1].split(","))
    order = rotated_order(reprove)
    latest = latest_green_rounds()
    unknown = reprove - set(order)
    if unknown:
        raise SystemExit(f"--reprove names not in registry: {sorted(unknown)}")
    if "--write" in sys.argv:
        path = os.path.join(REPO, "join_example_spark", "registry.py")
        with open(path) as fh:
            src = fh.read()
        # Replace from the sentinel marker through the tuple's closing
        # paren at column 0 — comment and tuple are regenerated together,
        # so the narrative can never describe a previous round's ordering.
        start = src.index(MARKER)
        end = src.index("\n)\n", start) + 3
        src = src[:start] + generated_block(order, latest, reprove) + src[end:]
        with open(path, "w") as fh:
            fh.write(src)
        print(f"wrote {len(order)} names to {path}", file=sys.stderr)
        print(
            "now: run the registry gate tests and review git diff",
            file=sys.stderr,
        )
    else:
        for n in order[:50]:
            print(f"{n}  (latest green: r{latest.get(n, 0) or '—'})")
        print(f"... {len(order)} total", file=sys.stderr)


if __name__ == "__main__":
    main()
