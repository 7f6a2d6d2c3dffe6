"""Run the local differential for named catalog entries at sf0.01 —
the driver's gate scale — so semantics changes are proven at the same
data the external gate uses.  Usage:

    python tools/check_sf001.py orders_rfm_segments graph_kcore_entity
"""

from __future__ import annotations

import sys

from graphdatabases_spark.relational import REGISTRY, queries
from graphdatabases_spark.session import get_spark

from tests.oracle_utils import run_differential

SF_DIR = "/root/testdata/sf0.01"


def main(names: list[str]) -> int:
    queries()
    spark = get_spark()
    bad = 0
    for name in names:
        q = REGISTRY[name]
        if q.oracle is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        (verdict, detail), nrows = run_differential(
            spark, SF_DIR, name, q.fn, q.oracle
        )
        print(f"{name}: {verdict} {detail or ''} ({nrows} rows)")
        bad += verdict != "MATCH"
    return bad


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
