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


def rotated_order() -> list[str]:
    from join_example_spark.registry import load_all

    latest = latest_green_rounds()
    names = list(load_all().keys())
    # never-proven first (round 0), then ascending latest-green, then name
    return sorted(names, key=lambda n: (latest.get(n, 0), n))


def main() -> None:
    order = rotated_order()
    latest = latest_green_rounds()
    if "--write" in sys.argv:
        path = os.path.join(REPO, "join_example_spark", "registry.py")
        with open(path) as fh:
            src = fh.read()
        start = src.index("DRIVER_PRIORITY: tuple[str, ...] = (")
        # Anchor the tuple's end at a close-paren on column 0 — an inline
        # comment ending in ')' inside the tuple must not terminate the splice.
        end = src.index("\n)\n", start) + 3
        body = "\n".join(f'    "{n}",' for n in order)
        src = (
            src[:start]
            + "DRIVER_PRIORITY: tuple[str, ...] = (\n"
            + body
            + "\n)\n"
            + src[end:]
        )
        with open(path, "w") as fh:
            fh.write(src)
        print(f"wrote {len(order)} names to {path}", file=sys.stderr)
        print(
            "now: update the head comment, run the registry gate tests, "
            "review git diff",
            file=sys.stderr,
        )
    else:
        for n in order[:50]:
            print(f"{n}  (latest green: r{latest.get(n, 0) or '—'})")
        print(f"... {len(order)} total", file=sys.stderr)


if __name__ == "__main__":
    main()
