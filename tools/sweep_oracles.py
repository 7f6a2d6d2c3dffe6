"""Round-close ritual: every catalog differential at every scale factor.

The per-pytest differential runs at sf0.001 and the external gate at
sf0.01; scale-dependent float/semantics hazards can hide above both
(round 4's one-off sf0.1 sweep caught two real bugs: a DuckDB
hugeint->double double-rounding divergence past 2^53 and a
catastrophic-cancellation variance blowup).  This tool generalizes that
ritual: all catalog entries x all scale factors in one invocation, with
a summary and non-zero exit on any mismatch.

Usage:
    python tools/sweep_oracles.py                 # all entries, all sfs
    python tools/sweep_oracles.py --sf 0.1        # one sf
    python tools/sweep_oracles.py name1 name2     # subset of entries

Record the sweep's outcome in COVERAGE.md when run at round close.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphdatabases_spark.relational import REGISTRY, queries
from graphdatabases_spark.session import get_spark

from tests.oracle_utils import run_differential

SF_DIRS = {
    "0.001": "/root/testdata/sf0.001",
    "0.01": "/root/testdata/sf0.01",
    "0.1": "/root/testdata/sf0.1",
    # Derived 10x scale (tools/make_sf1.py; generated on demand) — not
    # part of the default sweep; request with --sf 1.
    "1": os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".data", "sf1",
    ),
}
DEFAULT_SFS = ["0.001", "0.01", "0.1"]

# Oracles pinned to a literal directory (duckdb read_blob can't use the
# pre-registered views) only hold at that sf — same exclusion as
# tests/test_oracle_catalog.py:17.
PINNED_SF = {"source_binary_listing": "0.01"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", help="catalog entries (default: all)")
    ap.add_argument(
        "--sf", action="append", choices=sorted(SF_DIRS), default=None,
        help="scale factor(s) to sweep (default: all three)",
    )
    args = ap.parse_args()

    queries()  # populate REGISTRY
    names = args.names or [n for n, q in REGISTRY.items() if q.oracle is not None]
    unknown = [n for n in names if n not in REGISTRY]
    if unknown:
        print(f"unknown entries: {unknown}", file=sys.stderr)
        return 2
    sfs = args.sf or DEFAULT_SFS

    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    failures: list[tuple[str, str, str]] = []
    total_attempted = 0
    t_start = time.time()
    for sf in sfs:
        sf_dir = SF_DIRS[sf]
        if sf == "1" and not os.path.isdir(sf_dir):
            import importlib.util

            spec = importlib.util.spec_from_file_location(
                "make_sf1",
                os.path.join(os.path.dirname(os.path.abspath(__file__)), "make_sf1.py"),
            )
            mod = importlib.util.module_from_spec(spec)
            spec.loader.exec_module(mod)
            sf_dir = mod.main()
        t0 = time.time()
        ok = attempted = 0
        for name in names:
            q = REGISTRY[name]
            if q.oracle is None or PINNED_SF.get(name, sf) != sf:
                continue
            tq = time.time()
            try:
                (verdict, detail), nrows = run_differential(
                    spark, sf_dir, name, q.fn, q.oracle
                )
            except Exception as e:  # keep sweeping; report at the end
                verdict, detail, nrows = "ERROR", repr(e)[:200], -1
            dt = time.time() - tq
            if dt > 20:
                print(f"  slow sf{sf} {name}: {dt:.0f}s")
            attempted += 1
            if verdict == "MATCH":
                ok += 1
            else:
                failures.append((sf, name, f"{verdict} {detail or ''}"))
                print(f"  FAIL sf{sf} {name}: {verdict} {detail or ''} ({nrows} rows)")
        total_attempted += attempted
        print(f"sf{sf}: {ok}/{attempted} MATCH in {time.time() - t0:.0f}s")
    print(
        f"sweep: {total_attempted - len(failures)}/{total_attempted} "
        f"MATCH in {time.time() - t_start:.0f}s"
    )
    for sf, name, msg in failures:
        print(f"FAIL sf{sf} {name}: {msg}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
