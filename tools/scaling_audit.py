"""Round-close scaling audit: Spark-side wall time AND shuffle-write
bytes per catalog entry at sf0.1 vs the derived sf1 (10× the rows),
flagging superlinear entries on either axis.

The oracle sweep proves VALUES at every sf; this tool probes the other
scale axis: does each entry's runtime grow ~linearly with input? A
ratio far above 10 means some per-row cost grew with corpus size — the
class of bug that is invisible at bench scale (the round-5 tokenizer
re-inlining made docs_decontaminate_ngrams 271 s at sf1 while every
smaller sf stayed under 2 s).

Method: per entry per sf, one warm run (codegen compile, adjacency
caches, shuffle files), then one timed ``fn(spark, sf_dir).count()`` —
Spark-side only, no oracle; a 20× threshold doesn't need min-of-N
noise discipline. Sub-second sf0.1 times are floored at 0.15 s for the
ratio so fixed per-stage overhead doesn't mark a 40 ms query
"superlinear" when it reaches 1 s at sf1. Results stream one line per
entry so a chunked/interrupted audit loses nothing.

Shuffle bytes (VERDICT r5 #5): wall time can stay linear while shuffle
volume grows superlinearly (hidden re-expansion before an exchange, a
join key losing selectivity at scale) — the round-5 tokenizer
re-inlining was caught by wall-time luck. The audit therefore also
records the delta of the status store's cumulative executor
``totalShuffleWrite`` around each timed run and flags entries whose
shuffle grows more than ``threshold``× over the 10× step (1 MiB floor
on the denominator — KB-scale shuffles are all fixed overhead).

KNOWN BLIND SPOT (measured, round 7): shuffles executed while
materializing a NESTED broadcast build side (a broadcast exchange
whose subtree itself contains a broadcast join, e.g.
``docs_substring_strip``'s df>=2 posting list) do not reach the
executor summary's ``totalShuffleWrite`` even though the stages run —
a minimal two-level-broadcast repro reads 0 bytes while the identical
subtree driven standalone writes 16 MB. Entries whose exchanges all
sit under such builds therefore read ~0 here; audit them by driving
the inner aggregate standalone (docs_substring_strip's posting-list
distinct: 2.74 MB at sf0.1 → 27.08 MB at sf1, exactly the 10× row
growth — recorded in SCALE.md).

Usage:
    python tools/scaling_audit.py                # all entries
    python tools/scaling_audit.py name1 name2    # subset
    python tools/scaling_audit.py --threshold 25 # custom flag ratio

Exit 1 if any entry exceeds the threshold. Record flagged entries (or
the all-clear) in SCALE.md at round close.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphdatabases_spark.relational import REGISTRY, queries
from graphdatabases_spark.session import get_spark

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"
SF1 = os.path.join(REPO, ".data", "sf1")

# Oracles/readers pinned to one directory (tests/test_oracle_catalog.py).
SKIP = {"source_binary_listing"}

# Fixed-cost floor for the ratio denominator: below this, sf0.1 time is
# dominated by per-stage scheduling overhead, not data.
FLOOR_S = 0.15


SHUFFLE_FLOOR_B = 1024 * 1024


def _shuffle_write_total(spark) -> int:
    """Cumulative shuffle-write bytes across executors (status store);
    per-run bytes are the delta around a run. The listener bus updates
    the store asynchronously — drain it first so the delta is exact."""
    sc = spark.sparkContext._jsc.sc()
    try:
        sc.listenerBus().waitUntilEmpty(10_000)
    except Exception:
        time.sleep(0.3)  # older/newer signature: settle heuristically
    it = sc.statusStore().executorList(False).iterator()
    total = 0
    while it.hasNext():
        total += it.next().totalShuffleWrite()
    return total


def _time(fn, spark, sf_dir: str) -> tuple[float, int]:
    fn(spark, sf_dir).count()  # warm
    b0 = _shuffle_write_total(spark)
    t0 = time.perf_counter()
    fn(spark, sf_dir).count()
    dt = time.perf_counter() - t0
    return dt, _shuffle_write_total(spark) - b0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--threshold", type=float, default=20.0,
                    help="flag ratio sf1/max(sf0.1, floor) above this "
                    "(10 = linear for a 10x derivation)")
    args = ap.parse_args()

    if not os.path.isdir(SF1):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "make_sf1", os.path.join(REPO, "tools", "make_sf1.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        mod.main()

    qs = queries()
    names = args.names or [n for n in qs if n not in SKIP]
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    print(
        f"{'ratio':>7}  {'sf0.1':>7}  {'sf1':>7}  "
        f"{'shB0.1':>9}  {'shB1':>9}  {'shR':>6}  entry",
        flush=True,
    )
    for name in names:
        fn = REGISTRY[name].fn
        try:
            t01, b01 = _time(fn, spark, SF01)
            t1, b1 = _time(fn, spark, SF1)
        except Exception as e:  # keep auditing; report at the end
            rows.append((float("inf"), float("inf"), name, -1.0, -1.0,
                         -1, -1, repr(e)[:120]))
            print(f"{'ERR':>7}  {name}: {rows[-1][7]}", flush=True)
            continue
        ratio = t1 / max(t01, FLOOR_S)
        sh_ratio = b1 / max(b01, SHUFFLE_FLOOR_B)
        rows.append((ratio, sh_ratio, name, t01, t1, b01, b1, ""))
        mark = ""
        if ratio > args.threshold:
            mark = " <-- SUPERLINEAR (time)"
        elif sh_ratio > args.threshold:
            mark = " <-- SUPERLINEAR (shuffle)"
        print(
            f"{ratio:7.1f}  {t01:6.2f}s  {t1:6.2f}s  "
            f"{b01/1e6:8.1f}M  {b1/1e6:8.1f}M  {sh_ratio:6.1f}  "
            f"{name}{mark}",
            flush=True,
        )

    flagged = [
        r for r in rows if r[0] > args.threshold or r[1] > args.threshold
    ]
    print(
        f"audit: {len(rows)} entries, {len(flagged)} above "
        f"threshold {args.threshold} (10 = linear)",
        flush=True,
    )
    spark.stop()
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(main())
