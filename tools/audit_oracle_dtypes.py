"""Audit pandas-dtype parity between every catalog query and its oracle.

The external correctness driver hashes materialized values; round 1's
``q12_priority_by_month`` failure showed the hash is sensitive to the
*frame dtype*, not just the value: DuckDB ``sum(CASE...)`` is HUGEINT,
which ``.df()`` lands as float64, so ``277`` hashed as ``277.0`` against
Spark's int64 ``277``.  The local replica (tests/oracle_utils.py)
compares with ``float(a) == float(b)`` and cannot see that class of
break.  This audit compares the *dtypes* of both frames column by
column and flags any integer-vs-float (or bool-vs-int) divergence —
exactly the class the driver's hash punishes.

Usage: python tools/audit_oracle_dtypes.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from graphdatabases_spark import get_spark
from graphdatabases_spark.relational import REGISTRY, queries
from tests.oracle_utils import dtype_kind, duckdb_connection


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    queries()
    con = duckdb_connection(sf_dir)
    flagged: list[str] = []
    for name in sorted(REGISTRY):
        q = REGISTRY[name]
        if q.oracle is None:
            continue
        try:
            spdf = q.fn(spark, sf_dir).toPandas()
            opdf = con.execute(q.oracle).df()
        except Exception as ex:  # noqa: BLE001 — audit must visit all
            flagged.append(name)
            print(f"{name}: ERR {type(ex).__name__}: {str(ex)[:120]}")
            continue
        cols_s, cols_o = sorted(spdf.columns), sorted(opdf.columns)
        if cols_s != cols_o:
            flagged.append(name)
            print(f"{name}: COLS spark={cols_s} oracle={cols_o}")
            continue
        for c in cols_s:
            ks = dtype_kind(spdf[c].dtype, spdf[c])
            ko = dtype_kind(opdf[c].dtype, opdf[c])
            # int-vs-float (either direction) and bool-vs-int are the
            # str()-visible breaks; decimal-vs-float is value-identical
            # only when the decimal is exact — flag it too.
            if ks != ko and {ks, ko} != {"datelike"}:
                flagged.append(name)
                print(
                    f"{name}: DTYPE col={c} spark={spdf[c].dtype}/{ks} "
                    f"oracle={opdf[c].dtype}/{ko}"
                )
    con.close()
    print(f"audited {sum(1 for q in REGISTRY.values() if q.oracle)} oracles; "
          f"flagged: {sorted(set(flagged))}")
    return 1 if flagged else 0


if __name__ == "__main__":
    raise SystemExit(main())
