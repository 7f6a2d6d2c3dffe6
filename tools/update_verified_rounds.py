"""Regenerate catalog.py's ``_VERIFIED_ROUND`` map from the driver's
CORRECTNESS_r*.json records.

The external gate samples the first 50 catalog entries in emission
order; emission is staleness-ordered off this map, so it must be
refreshed at the START of each round (after the driver drops the
previous round's CORRECTNESS file) or the sample re-proves the wrong
cohort.

Default: rewrite the map in place in catalog.py (idempotent — run it,
eyeball ``git diff``, commit).  ``--print`` only prints the dict body.
Entries whose semantics changed since their last green row should be
REMOVED from the map after regeneration (back to tier 0 so the gate
re-proves them first) — list them with ``--demote name1 name2``.

Usage:
    python tools/update_verified_rounds.py [--print] [--demote N ...]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

MAP_RE = re.compile(
    r"(_VERIFIED_ROUND: dict\[str, int\] = \{\n)(.*?)(\n\})", re.DOTALL
)


def latest_green(repo: str) -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(path)).group(1))
        for name, row in json.load(open(path)).items():
            if row.get("hash_match") or row.get("err") == "no_oracle":
                latest[name] = rnd
            else:
                # A LATER red row demotes the entry back to tier 0 (it
                # must be re-proven first), even if an earlier round was
                # green — dropping it from the map does exactly that.
                latest.pop(name, None)
    return latest


def render(latest: dict[str, int]) -> str:
    by_round: dict[int, list[str]] = {}
    for name, rnd in latest.items():
        by_round.setdefault(rnd, []).append(name)
    lines = []
    for rnd in sorted(by_round):
        lines.append(f"    # r{rnd} cohort")
        for name in sorted(by_round[rnd]):
            lines.append(f'    "{name}": {rnd},')
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--print", action="store_true", dest="print_only")
    ap.add_argument("--demote", nargs="*", default=[],
                    help="entries to drop to tier 0 (semantics changed)")
    ap.add_argument("repo", nargs="?", default=os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()

    latest = latest_green(args.repo)
    for name in args.demote:
        latest.pop(name, None)
    body = render(latest)
    if args.print_only:
        print(body)
        return 0

    cat = os.path.join(
        args.repo, "graphdatabases_spark", "relational", "catalog.py"
    )
    src = open(cat).read()
    m = MAP_RE.search(src)
    if not m:
        print("catalog.py _VERIFIED_ROUND map not found", file=sys.stderr)
        return 2
    new_src = src[: m.start(2)] + body + src[m.end(2):]
    if new_src == src:
        print("map already up to date")
        return 0
    open(cat, "w").write(new_src)
    print(f"rewrote {cat}: {len(latest)} entries "
          f"({len(args.demote)} demoted)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
