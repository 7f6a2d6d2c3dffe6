"""Round-13 ops pins: the Holt / Holt-Winters recursive folds and the
persisted-KLL-store re-plan.

The DuckDB oracles hash-check the values at the gate; these pin the
SEMANTICS with independent pure-Python integer replays (the
events_ewma_hourly discipline), plus the drift behavior the replan
entry exists to expose (the stale plan's tail range overloads after
the skewed append; the re-plan rebalances).
"""

from __future__ import annotations

import duckdb
import pytest

from graphdatabases_spark.relational import queries


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // b
    return q if a >= 0 else -q


def _hours(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT date_trunc('hour', ts) AS h, count(*) AS n
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY h ORDER BY h
        """
    ).fetchall()
    con.close()
    return rows


class TestHoltHourly:
    def test_python_replay_bit_exact(self, spark, sf_dir):
        A, B, SC = 4, 4, 1_000_000
        hrs = _hours(sf_dir)
        expect = {}
        lv = tr = None
        for h, n in hrs:
            if lv is None:
                lv, tr = n * SC, 0
                continue
            fc_prev = lv + tr
            l_new = _tdiv(n * SC + (A - 1) * (lv + tr), A)
            t_new = _tdiv(l_new - lv + (B - 1) * tr, B)
            lv, tr = l_new, t_new
            expect[str(h)] = (
                n, l_new, t_new, l_new + t_new,
                n * SC - fc_prev, t_new > 0,
            )
        got = {
            str(r["hour_ts"]): (
                r["n_events"], r["level_units"], r["trend_units"],
                r["forecast_units"], r["miss_units"], r["trend_up"],
            )
            for r in queries()["events_holt_hourly"](spark, sf_dir).collect()
        }
        assert got == expect
        # the trend component is actually exercised: both signs occur
        signs = {v[5] for v in got.values()}
        assert signs == {True, False}


class TestHoltWintersHourly:
    def test_python_replay_bit_exact(self, spark, sf_dir):
        A, B, G = 8, 16, 4
        M, SC = 24, 1_000_000
        hrs = _hours(sf_dir)
        expect = {}
        lv = tr = None
        ss = [0] * M
        for h, n in hrs:
            if lv is None:
                lv, tr = n * SC, 0
                continue
            sm = ss[0]
            fc = lv + tr + sm
            l_new = _tdiv(n * SC - sm + (A - 1) * (lv + tr), A)
            t_new = _tdiv(l_new - lv + (B - 1) * tr, B)
            s_new = _tdiv(n * SC - l_new + (G - 1) * sm, G)
            ss = ss[1:] + [s_new]
            lv, tr = l_new, t_new
            expect[str(h)] = (
                n, l_new, t_new, s_new, fc, n * SC - fc,
            )
        got = {
            str(r["hour_ts"]): (
                r["n_events"], r["level_units"], r["trend_units"],
                r["seasonal_units"], r["forecast_units"], r["miss_units"],
            )
            for r in queries()["events_holt_winters_hourly"](
                spark, sf_dir
            ).collect()
        }
        assert got == expect

    def test_seasonal_forecast_beats_holt_on_periodic_series(self, spark):
        """On a synthetic daily-periodic series the HW forecast-miss
        magnitude must undercut plain Holt's once the seasonal window
        has seen two full periods — the operational reason the entry
        exists.  Pure-Python comparison, Holt at ITS entry's rates
        (1/4, 1/4), HW at its stability-tuned rates (1/8, 1/16,
        1/4)."""
        A, B, G = 8, 16, 4
        HA = HB = 4
        M, SC = 24, 1_000_000
        series = [100 + (50 if (i % 24) in range(8, 18) else 0)
                  for i in range(24 * 10)]
        # Holt
        lv = tr = None
        holt_miss = []
        for i, n in enumerate(series):
            if lv is None:
                lv, tr = n * SC, 0
                continue
            holt_miss.append(abs(n * SC - (lv + tr)))
            l_new = _tdiv(n * SC + (HA - 1) * (lv + tr), HA)
            tr = _tdiv(l_new - lv + (HB - 1) * tr, HB)
            lv = l_new
        # Holt-Winters
        lv = tr = None
        ss = [0] * M
        hw_miss = []
        for i, n in enumerate(series):
            if lv is None:
                lv, tr = n * SC, 0
                continue
            sm = ss[0]
            hw_miss.append(abs(n * SC - (lv + tr + sm)))
            l_new = _tdiv(n * SC - sm + (A - 1) * (lv + tr), A)
            t_new = _tdiv(l_new - lv + (B - 1) * tr, B)
            s_new = _tdiv(n * SC - l_new + (G - 1) * sm, G)
            ss = ss[1:] + [s_new]
            lv, tr = l_new, t_new
        tail_h = holt_miss[-24 * 4:]
        tail_hw = hw_miss[-24 * 4:]
        assert sum(tail_hw) < 0.5 * sum(tail_h)


class TestKllStoreReplan:
    def test_stale_overloads_replan_rebalances(self, spark, sf_dir):
        rows = {
            (r["plan"], r["pid"]): r
            for r in queries()["docs_tok_kll_store_replan"](
                spark, sf_dir
            ).collect()
        }
        assert len(rows) == 8
        # every doc lands in exactly one range per plan
        n_stale = sum(r["n_part"] for (p, _), r in rows.items() if p == "stale")
        n_replan = sum(
            r["n_part"] for (p, _), r in rows.items() if p == "replan"
        )
        assert n_stale == n_replan > 0
        # the appended x4-value shard overloads the stale plan's TAIL
        # range; the re-planned boundaries spread it back out
        stale_max = max(
            r["load_x100"] for (p, _), r in rows.items() if p == "stale"
        )
        replan_max = max(
            r["load_x100"] for (p, _), r in rows.items() if p == "replan"
        )
        assert stale_max > replan_max
        assert rows[("stale", 4)]["load_x100"] == stale_max
