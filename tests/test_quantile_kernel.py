"""Unit tests for the shared two-pass exact-quantile kernel.

operators/quantile.py is the scale-safe replacement for exact
``F.percentile`` (round-9 verdict's only ``weak`` class) — these tests
pin its semantics against a brute-force Python reference: type-7
``quantile_cont`` rationals on groups covering odd/even n, n == 1,
heavy ties, values spanning many buckets, and a per-row bucket-width
column.  The catalog entries routed through it (``agg_percentile``,
``orders_mad_outliers``, ``orders_rfm_segments``) are value-hash-pinned
by their DuckDB oracles; this file covers the kernel's contract
directly so a future edit can't silently shift a rank.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from graphdatabases_spark.operators.quantile import (
    exact_values_at_ranks,
    quantile_cont_vden,
    weighted_values_at_ranks,
)


def _brute_vden(sorted_vals, num, den):
    """Type-7 quantile_cont * den, as an exact int."""
    n = len(sorted_vals)
    t = (n - 1) * num
    lo = t // den  # 0-based
    rem = t % den
    v_lo = sorted_vals[lo]
    v_hi = sorted_vals[lo + 1] if rem > 0 else v_lo
    return den * v_lo + rem * (v_hi - v_lo)


def _groups():
    rng = random.Random(104729)
    groups = {
        "odd": [rng.randrange(0, 3_000_000) for _ in range(101)],
        "even": [rng.randrange(0, 3_000_000) for _ in range(100)],
        "single": [42],
        "pair": [7, 1_999_999],
        "ties": [500_000] * 40 + [500_001] * 3 + [0, 2_999_999],
        "dense": [rng.randrange(0, 50) for _ in range(97)],
    }
    return groups


def test_exact_values_at_ranks_matches_sorted_index(spark):
    groups = _groups()
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    vals = spark.createDataFrame(rows, "g string, v long")
    rng = random.Random(7919)
    wanted = []
    for g, vs in groups.items():
        n = len(vs)
        picks = {1, n, max(1, n // 2)}
        picks |= {rng.randrange(1, n + 1) for _ in range(3)}
        wanted += [(g, r) for r in picks]
    ranks = spark.createDataFrame(wanted, "g string, rank long")
    got = {
        (r["g"], r["rank"]): r["v"]
        for r in exact_values_at_ranks(
            vals, ["g"], ranks, bucket_width=65536
        ).collect()
    }
    assert len(got) == len(wanted)
    for g, r in wanted:
        assert got[(g, r)] == sorted(groups[g])[r - 1], (g, r)


def test_quantile_cont_vden_matches_brute_rational(spark):
    groups = _groups()
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    vals = spark.createDataFrame(rows, "g string, v long")
    qs = [("p25", 1, 4), ("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)]
    out = quantile_cont_vden(spark, vals, ["g"], qs, bucket_width=65536)
    got = {(r["g"], r["q_label"]): r for r in out.collect()}
    assert len(got) == len(groups) * len(qs)
    for g, vs in groups.items():
        sv = sorted(vs)
        for lab, num, den in qs:
            row = got[(g, lab)]
            assert row["n"] == len(vs)
            assert row["vden"] == _brute_vden(sv, num, den), (g, lab)
            # v_lo <= quantile <= v_hi bracketing invariant
            assert row["den"] * row["v_lo"] <= row["vden"] <= (
                row["den"] * row["v_hi"]
            )


def test_per_row_bucket_width_column(spark):
    """Melted multi-axis form: width carried as a column ('w') gives
    identical answers to per-axis int widths — and keeps a micro-scaled
    axis's bucket list bounded while a small-domain axis still
    resolves."""
    rng = random.Random(86028157)
    axes = {
        "days": ([rng.randrange(8000, 12000) for _ in range(301)], 64),
        "money": (
            [rng.randrange(0, 10**11) for _ in range(301)],
            2**22,
        ),
    }
    rows = [(a, v, w) for a, (vs, w) in axes.items() for v in vs]
    vals = spark.createDataFrame(rows, "axis string, v long, w long")
    qs = [("q1", 1, 4), ("q3", 3, 4)]
    melted = {
        (r["axis"], r["q_label"]): r["vden"]
        for r in quantile_cont_vden(
            spark, vals, ["axis"], qs, bucket_width="w"
        ).collect()
    }
    for a, (vs, w) in axes.items():
        solo = {
            r["q_label"]: r["vden"]
            for r in quantile_cont_vden(
                spark,
                vals.filter(F.col("axis") == a).select("axis", "v"),
                ["axis"],
                qs,
                bucket_width=w,
            ).collect()
        }
        sv = sorted(vs)
        for lab, num, den in qs:
            assert melted[(a, lab)] == solo[lab] == _brute_vden(
                sv, num, den
            ), (a, lab)


def _brute_weighted_rank(pairs, rank):
    """Smallest v whose cumulative weight over value-sorted order
    reaches ``rank`` (type-1 weighted quantile)."""
    cum = 0
    for v, w in sorted(pairs):
        cum += w
        if cum >= rank:
            return v
    raise AssertionError("rank exceeds total weight")


def test_weighted_values_at_ranks_matches_brute(spark):
    """Pin weighted_values_at_ranks against a brute cumulative-weight
    scan: w=0 rows (must never satisfy a rank on their own), heavy ties
    split across rows (tie-order independence), single-row groups,
    boundary ranks 1 and sum(w), and a per-row width column."""
    rng = random.Random(6700417)
    groups = {
        # ties: the same v appears in MULTIPLE rows whose weights must
        # combine before the rank comparison.
        "ties": [(500_000, 3), (500_000, 5), (500_001, 2), (0, 1),
                 (2_999_999, 4)],
        # zeros: w=0 rows interleaved — they carry no rank mass.
        "zeros": [(10, 0), (10, 2), (20, 0), (30, 5), (40, 0), (40, 1)],
        "single": [(42, 7)],
        "wide": [(rng.randrange(0, 3_000_000), rng.randrange(0, 6))
                 for _ in range(97)],
    }
    # guarantee positive total weight for every group
    assert all(sum(w for _, w in ps) > 0 for ps in groups.values())
    rows = [(g, v, w) for g, ps in groups.items() for v, w in ps]
    vals = spark.createDataFrame(rows, "g string, v long, w long")
    rng2 = random.Random(1299709)
    wanted = []
    for g, ps in groups.items():
        tot = sum(w for _, w in ps)
        picks = {1, tot, max(1, tot // 2)}
        picks |= {rng2.randrange(1, tot + 1) for _ in range(3)}
        wanted += [(g, r) for r in picks]
    ranks = spark.createDataFrame(wanted, "g string, rank long")
    for bw in (65536, 16):
        got = {
            (r["g"], r["rank"]): r["v"]
            for r in weighted_values_at_ranks(
                vals, ["g"], ranks, bucket_width=bw
            ).collect()
        }
        assert len(got) == len(wanted)
        for g, r in wanted:
            assert got[(g, r)] == _brute_weighted_rank(groups[g], r), (
                g, r, bw,
            )


def test_weighted_values_at_ranks_width_column(spark):
    """Per-row width column gives the same answers as an int width."""
    pairs = [(v, (v % 4)) for v in range(200, 1200, 7)]
    rows = [("a", v, w, 16) for v, w in pairs]
    vals = spark.createDataFrame(rows, "g string, v long, w long, bw long")
    tot = sum(w for _, w in pairs)
    ranks = spark.createDataFrame(
        [("a", r) for r in (1, tot // 3, tot)], "g string, rank long"
    )
    via_col = {
        r["rank"]: r["v"]
        for r in weighted_values_at_ranks(
            vals, ["g"], ranks, bucket_width="bw"
        ).collect()
    }
    via_int = {
        r["rank"]: r["v"]
        for r in weighted_values_at_ranks(
            vals.select("g", "v", "w"), ["g"], ranks, bucket_width=16
        ).collect()
    }
    assert via_col == via_int
    for r, v in via_col.items():
        assert v == _brute_weighted_rank(pairs, r)
