"""Regenerate catalog.py's ``_VERIFIED_ROUND`` map from the driver's
CORRECTNESS_r*.json records.

Prints the dict body (round = latest round whose external row was green:
hash_match, or rows-only where no oracle existed at the time).  Entries
whose semantics changed since their last green row must be REMOVED from
the printed map by hand (they go back to tier 0 so the external gate
re-proves them first).  Usage:

    python tools/update_verified_rounds.py [repo_dir]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys


def main(repo: str) -> None:
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
    by_round: dict[int, list[str]] = {}
    for name, rnd in latest.items():
        by_round.setdefault(rnd, []).append(name)
    for rnd in sorted(by_round):
        print(f"    # r{rnd} cohort")
        for name in sorted(by_round[rnd]):
            print(f'    "{name}": {rnd},')


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
