"""Time-series smoothing / recursive-fold queries (SURVEY §2.2
analytics family).

New module (round 12): analytics_stats_queries.py sits at ~1.9k lines
(project 2k bar). Home of the RECURSIVE-fold series shapes — kernels
whose value at t depends on the value at t-1, the one dependence
structure plain windows cannot express — evaluated JVM-side as an
exact-integer expression fold over the value-bounded hourly horizon
(<= 720 buckets by fixture construction, the events_cusum_hourly
boundedness argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.relational.catalog import register, table

# EWMA smoothing factor alpha = 1/_EWMA_A (exact rational); values are
# scaled to integer micro-units so the recurrence is pure integer
# arithmetic with truncating division — bit-identical across engines.
_EWMA_A = 8
_EWMA_SCALE = 1_000_000
_EWMA_SPIKE_NUM = 2  # spike iff x_t * SCALE >= 2 * s_{t-1}


@register(
    "events_ewma_hourly",
    oracle=f"""
    WITH RECURSIVE hr AS (
      SELECT date_trunc('hour', ts) AS hour_ts,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY hour_ts
    ),
    rk AS (
      SELECT hour_ts, n,
        CAST(row_number() OVER (ORDER BY hour_ts) AS BIGINT) AS rn
      FROM hr
    ),
    ew(rn, s) AS (
      SELECT rn, n * {_EWMA_SCALE} FROM rk WHERE rn = 1
      UNION ALL
      SELECT r.rn,
        (r.n * {_EWMA_SCALE} + {_EWMA_A - 1} * e.s) // {_EWMA_A}
      FROM ew e JOIN rk r ON r.rn = e.rn + 1
    )
    SELECT r.hour_ts, r.n AS n_events,
      CAST(e.s AS BIGINT) AS ewma_units,
      CAST(p.s AS BIGINT) AS ewma_prev_units,
      r.n * {_EWMA_SCALE} >= {_EWMA_SPIKE_NUM} * p.s AS spike
    FROM rk r
    JOIN ew e ON e.rn = r.rn
    LEFT JOIN ew p ON p.rn = r.rn - 1
    WHERE r.rn > 1
    ORDER BY r.hour_ts
    """,
    doc="EXPONENTIAL MOVING AVERAGE over the hourly event series — the "
    "RECURSIVE-fold kernel the time-series family was missing "
    "(events_cusum_hourly resets on a threshold, autocorr is a "
    "self-join; EWMA's s_t = alpha*x_t + (1-alpha)*s_(t-1) depends on "
    "its own previous OUTPUT, which no window function expresses). "
    f"Exact integer recurrence: alpha = 1/{_EWMA_A}, counts scaled to "
    f"{_EWMA_SCALE} micro-units, s_t = (x_t*SCALE + "
    f"{_EWMA_A - 1}*s_(t-1)) div {_EWMA_A} with truncating division — "
    "a pure integer function of the series, bit-identical across "
    "engines (a float EWMA would accumulate last-ulp divergence over "
    "720 steps). Spark evaluates the whole recurrence as ONE "
    "JVM-side expression fold (F.aggregate over the hour-sorted "
    "struct array — state (s, emitted array), then posexplode), the "
    "DuckDB oracle as a linear recursive CTE marching the hour rank; "
    "each hour also serves the operational spike flag "
    f"x_t*SCALE >= {_EWMA_SPIKE_NUM}*s_(t-1) (current >= "
    f"{_EWMA_SPIKE_NUM}x the smoothed baseline). The horizon is "
    "VALUE-bounded (<= 720 hourly buckets over the fixture's 30-day "
    "span — the events_cusum_hourly boundedness argument), so the "
    "collect-to-array fold is a bounded serving-side step over a "
    "pre-aggregated relation; the hourly agg itself is a combinable "
    "keyed count at any scale.",
)
def events_ewma_hourly(spark: SparkSession, sf: str) -> DataFrame:
    hr = (
        table(spark, sf, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def snew(acc, x):
        a = x["n"] * _EWMA_SCALE + (_EWMA_A - 1) * acc["s"]
        return (
            F.when(acc["s"] < 0, x["n"] * _EWMA_SCALE)
            .otherwise(((a - a % _EWMA_A) / _EWMA_A).cast("long"))
            .cast("long")
        )

    # Bounded serving fold: pack the <=720-row hourly relation into one
    # hour-sorted array, run the exact-integer recurrence as a single
    # JVM expression fold, re-explode. No driver collect, no Python
    # UDF; (a - a%8)/8 is an exact multiple divided in double, exact
    # for the bounded magnitudes here (documented ceiling 2^53).
    init = F.struct(
        F.lit(-1).cast("long").alias("s"),
        F.array()
        .cast(
            "array<struct<hour_ts:timestamp,n:bigint,s:bigint,sprev:bigint>>"
        )
        .alias("out"),
    )
    folded = (
        hr.agg(
            F.sort_array(F.collect_list(F.struct("hour_ts", "n"))).alias("xs")
        )
        .select(
            F.aggregate(
                F.col("xs"),
                init,
                lambda acc, x: F.struct(
                    snew(acc, x).alias("s"),
                    F.concat(
                        acc["out"],
                        F.array(
                            F.struct(
                                x["hour_ts"].alias("hour_ts"),
                                x["n"].alias("n"),
                                snew(acc, x).alias("s"),
                                acc["s"].alias("sprev"),
                            )
                        ),
                    ).alias("out"),
                ),
            )["out"].alias("rows")
        )
    )
    r = folded.select(F.explode("rows").alias("r")).select(
        F.col("r.hour_ts").alias("hour_ts"),
        F.col("r.n").alias("n_events"),
        F.col("r.s").alias("ewma_units"),
        F.col("r.sprev").alias("ewma_prev_units"),
    )
    return (
        r.filter(F.col("ewma_prev_units") >= 0)
        .withColumn(
            "spike",
            F.col("n_events") * _EWMA_SCALE
            >= _EWMA_SPIKE_NUM * F.col("ewma_prev_units"),
        )
        .orderBy("hour_ts")
    )


# ---------------------------------------------------------------------------
# Holt linear smoothing (level + trend double exponential)
# ---------------------------------------------------------------------------

# alpha = 1/_HOLT_A (level), beta = 1/_HOLT_B (trend), counts scaled to
# micro-units; all divisions truncate toward zero, which Spark's `div`
# and DuckDB's `//` agree on for BOTH signs (verified: -7//4 == -1 on
# both engines), so the trend — which CAN go negative — stays exact.
_HOLT_A = 4
_HOLT_B = 4
_HOLT_SCALE = 1_000_000


@register(
    "events_holt_hourly",
    oracle=f"""
    WITH RECURSIVE hr AS (
      SELECT date_trunc('hour', ts) AS hour_ts,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY hour_ts
    ),
    rk AS (
      SELECT hour_ts, n,
        CAST(row_number() OVER (ORDER BY hour_ts) AS BIGINT) AS rn
      FROM hr
    ),
    ho(rn, l, t) AS (
      SELECT rn, n * {_HOLT_SCALE}, CAST(0 AS BIGINT) FROM rk WHERE rn = 1
      UNION ALL
      SELECT r.rn,
        (r.n * {_HOLT_SCALE} + {_HOLT_A - 1} * (h.l + h.t)) // {_HOLT_A},
        (((r.n * {_HOLT_SCALE} + {_HOLT_A - 1} * (h.l + h.t)) // {_HOLT_A})
          - h.l + {_HOLT_B - 1} * h.t) // {_HOLT_B}
      FROM ho h JOIN rk r ON r.rn = h.rn + 1
    )
    SELECT r.hour_ts, r.n AS n_events,
      CAST(e.l AS BIGINT) AS level_units,
      CAST(e.t AS BIGINT) AS trend_units,
      CAST(e.l + e.t AS BIGINT) AS forecast_units,
      CAST(r.n * {_HOLT_SCALE} - (p.l + p.t) AS BIGINT) AS miss_units,
      e.t > 0 AS trend_up
    FROM rk r
    JOIN ho e ON e.rn = r.rn
    JOIN ho p ON p.rn = r.rn - 1
    WHERE r.rn > 1
    ORDER BY r.hour_ts
    """,
    doc="HOLT LINEAR (double-exponential) SMOOTHING over the hourly "
    "event series — events_ewma_hourly's level+trend extension, the "
    "second member of the recursive-fold family: l_t = alpha*x_t + "
    "(1-alpha)*(l_(t-1) + t_(t-1)), t_t = beta*(l_t - l_(t-1)) + "
    f"(1-beta)*t_(t-1) with alpha = 1/{_HOLT_A}, beta = 1/{_HOLT_B}, "
    f"counts in {_HOLT_SCALE} micro-units. Both recurrences are pure "
    "integer arithmetic with toward-zero truncating division — "
    "Spark's div and DuckDB's // agree on both signs, so the trend "
    "component (which goes negative on decays, unlike the EWMA "
    "baseline) is bit-identical across engines; a float Holt would "
    "drift over 720 coupled steps. Spark evaluates both recurrences "
    "in ONE JVM expression fold over the hour-sorted struct array "
    "(state (l, t) + emitted rows, then posexplode); the oracle is a "
    "linear recursive CTE marching the hour rank. Each row serves the "
    "level, the trend, the one-step-ahead forecast l + t, and the "
    "forecast miss x_t*SCALE - forecast_(t-1) — the anomaly signal a "
    "trend-aware monitor pages on (the EWMA spike flag fires on every "
    "steady ramp; the Holt miss does not). Same scale shape as the "
    "EWMA: combinable hourly count at any scale, value-bounded "
    "(<= 720 buckets) serving-side fold, no driver collect, no "
    "Python UDF.",
)
def events_holt_hourly(spark: SparkSession, sf: str) -> DataFrame:
    hr = (
        table(spark, sf, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def tdiv(a, b):
        # toward-zero integer division as an exact JVM expression:
        # a - a%b is an exact multiple of b, and the division runs in
        # decimal(38,0) (not double), so the fold stays bit-exact over
        # the FULL long range — the earlier double path silently lost
        # exactness above 2^53 (advice r13), which micro-unit-scaled
        # hourly counts can reach at extreme corpus sizes.
        return ((a - a % b).cast("decimal(38,0)") / b).cast("long")

    def lnew(acc, x):
        return tdiv(
            x["n"] * _HOLT_SCALE + (_HOLT_A - 1) * (acc["l"] + acc["t"]),
            _HOLT_A,
        )

    def tnew(acc, x):
        return tdiv(
            lnew(acc, x) - acc["l"] + (_HOLT_B - 1) * acc["t"], _HOLT_B
        )

    init = F.struct(
        F.lit(False).alias("started"),
        F.lit(0).cast("long").alias("l"),
        F.lit(0).cast("long").alias("t"),
        F.array()
        .cast(
            "array<struct<hour_ts:timestamp,n:bigint,l:bigint,t:bigint,"
            "fc:bigint,miss:bigint>>"
        )
        .alias("out"),
    )

    def step(acc, x):
        first_l = x["n"] * F.lit(_HOLT_SCALE).cast("long")
        return F.struct(
            F.lit(True).alias("started"),
            F.when(~acc["started"], first_l)
            .otherwise(lnew(acc, x))
            .alias("l"),
            F.when(~acc["started"], F.lit(0).cast("long"))
            .otherwise(tnew(acc, x))
            .alias("t"),
            F.when(~acc["started"], acc["out"])
            .otherwise(
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            x["hour_ts"].alias("hour_ts"),
                            x["n"].alias("n"),
                            lnew(acc, x).alias("l"),
                            tnew(acc, x).alias("t"),
                            (lnew(acc, x) + tnew(acc, x)).alias("fc"),
                            (
                                x["n"] * _HOLT_SCALE
                                - (acc["l"] + acc["t"])
                            ).alias("miss"),
                        )
                    ),
                )
            )
            .alias("out"),
        )

    folded = hr.agg(
        F.sort_array(F.collect_list(F.struct("hour_ts", "n"))).alias("xs")
    ).select(F.aggregate(F.col("xs"), init, step)["out"].alias("rows"))
    return (
        folded.select(F.explode("rows").alias("r"))
        .select(
            F.col("r.hour_ts").alias("hour_ts"),
            F.col("r.n").alias("n_events"),
            F.col("r.l").alias("level_units"),
            F.col("r.t").alias("trend_units"),
            F.col("r.fc").alias("forecast_units"),
            F.col("r.miss").alias("miss_units"),
            (F.col("r.t") > 0).alias("trend_up"),
        )
        .orderBy("hour_ts")
    )


# ---------------------------------------------------------------------------
# Holt-Winters additive seasonal smoothing (level + trend + 24h season)
# ---------------------------------------------------------------------------

_HW_M = 24  # season period: hour-of-day over the hourly series
# Power-of-two smoothing rates, STABILITY-TUNED on a synthetic square
# wave (tests/test_round13_ops.py): beta = alpha = gamma = 1/4 makes
# the coupled level-trend pair resonate (level swung 18..225 on an
# amplitude-50 signal); beta an order below alpha damps it, and the
# tuned triple beats plain Holt's forecast miss 6x after 10 periods.
_HW_A = 8   # alpha = 1/8 (level)
_HW_B = 16  # beta = 1/16 (trend)
_HW_G = 4   # gamma = 1/4 (season)
_HW_SCALE = 1_000_000
_HW_ZEROS = "[" + ", ".join(["CAST(0 AS BIGINT)"] * _HW_M) + "]"


@register(
    "events_holt_winters_hourly",
    oracle=f"""
    WITH RECURSIVE hr AS (
      SELECT date_trunc('hour', ts) AS hour_ts,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY hour_ts
    ),
    rk AS (
      SELECT hour_ts, n,
        CAST(row_number() OVER (ORDER BY hour_ts) AS BIGINT) AS rn
      FROM hr
    ),
    hw(rn, l, t, ss) AS (
      SELECT rn, n * {_HW_SCALE}, CAST(0 AS BIGINT),
             {_HW_ZEROS}
      FROM rk WHERE rn = 1
      UNION ALL
      SELECT rn, l2,
        (l2 - l + {_HW_B - 1} * t) // {_HW_B},
        ss[2:] || [(nsc - l2 + {_HW_G - 1} * sm) // {_HW_G}]
      FROM (
        SELECT r.rn AS rn, h.l AS l, h.t AS t, h.ss AS ss,
               h.ss[1] AS sm, r.n * {_HW_SCALE} AS nsc,
               (r.n * {_HW_SCALE} - h.ss[1]
                 + {_HW_A - 1} * (h.l + h.t)) // {_HW_A} AS l2
        FROM hw h JOIN rk r ON r.rn = h.rn + 1
      )
    )
    SELECT r.hour_ts, r.n AS n_events,
      CAST(e.l AS BIGINT) AS level_units,
      CAST(e.t AS BIGINT) AS trend_units,
      CAST(e.ss[{_HW_M}] AS BIGINT) AS seasonal_units,
      CAST(p.l + p.t + p.ss[1] AS BIGINT) AS forecast_units,
      CAST(r.n * {_HW_SCALE} - (p.l + p.t + p.ss[1]) AS BIGINT)
        AS miss_units
    FROM rk r
    JOIN hw e ON e.rn = r.rn
    JOIN hw p ON p.rn = r.rn - 1
    WHERE r.rn > 1
    ORDER BY r.hour_ts
    """,
    doc="HOLT-WINTERS ADDITIVE SEASONAL SMOOTHING over the hourly "
    "event series — the third member of the recursive-fold family "
    "(EWMA: level; Holt: level+trend; this: level + trend + a "
    f"{_HW_M}-slot hour-of-day seasonal): l_t = alpha*(x_t - "
    "s_(t-m)) + (1-alpha)*(l_(t-1) + t_(t-1)), t_t = beta*(l_t - "
    "l_(t-1)) + (1-beta)*t_(t-1), s_t = gamma*(x_t - l_t) + "
    f"(1-gamma)*s_(t-m), alpha = 1/{_HW_A}, beta = 1/{_HW_B}, gamma "
    f"= 1/{_HW_G} (stability-tuned on a square wave — equal rates "
    "resonate the level-trend pair; see the constants' note), counts in "
    f"{_HW_SCALE} micro-units, deterministic zero-seasonal cold "
    "start. The fold STATE carries the rolling m-slot seasonal "
    "window as an array (slide-one-append per step) alongside (l, t) "
    "— the shape a plain window function cannot express twice over "
    "(the recurrence consumes its own output at lag 1 AND lag m). "
    "All three recurrences are toward-zero integer division "
    "(Spark div == DuckDB //, both signs), so the coupled 720-step "
    "chain is bit-identical across engines. Spark evaluates it as "
    "ONE JVM expression fold over the hour-sorted array (array state "
    "via slice+concat); the oracle is a linear recursive CTE whose "
    "LIST column carries the same window. Each row serves level, "
    "trend, the updated seasonal, the season-aware one-step forecast "
    "l + t + s_(t-m), and the forecast miss — the anomaly signal "
    "that stays quiet on daily-periodic load where the Holt miss "
    "pages every morning ramp. Scale shape: combinable hourly count "
    "at any scale, value-bounded (<= 720 buckets) serving-side fold, "
    "state O(m) integers, no driver collect, no Python UDF.",
)
def events_holt_winters_hourly(spark: SparkSession, sf: str) -> DataFrame:
    hr = (
        table(spark, sf, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("hour_ts"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )

    def tdiv(a, b):
        # decimal(38,0) integral division — exact over the full long
        # range (see events_holt_hourly's tdiv).
        return ((a - a % b).cast("decimal(38,0)") / b).cast("long")

    def step_exprs(acc, x):
        nsc = x["n"] * F.lit(_HW_SCALE).cast("long")
        sm = F.element_at(acc["ss"], 1)
        lnew = tdiv(nsc - sm + (_HW_A - 1) * (acc["l"] + acc["t"]), _HW_A)
        tnew = tdiv(lnew - acc["l"] + (_HW_B - 1) * acc["t"], _HW_B)
        snew = tdiv(nsc - lnew + (_HW_G - 1) * sm, _HW_G)
        fc = acc["l"] + acc["t"] + sm
        return nsc, sm, lnew, tnew, snew, fc

    init = F.struct(
        F.lit(False).alias("started"),
        F.lit(0).cast("long").alias("l"),
        F.lit(0).cast("long").alias("t"),
        F.array_repeat(F.lit(0).cast("long"), _HW_M).alias("ss"),
        F.array()
        .cast(
            "array<struct<hour_ts:timestamp,n:bigint,l:bigint,t:bigint,"
            "s:bigint,fc:bigint,miss:bigint>>"
        )
        .alias("out"),
    )

    def step(acc, x):
        nsc, sm, lnew, tnew, snew, fc = step_exprs(acc, x)
        first_l = nsc
        return F.struct(
            F.lit(True).alias("started"),
            F.when(~acc["started"], first_l).otherwise(lnew).alias("l"),
            F.when(~acc["started"], F.lit(0).cast("long"))
            .otherwise(tnew)
            .alias("t"),
            F.when(~acc["started"], acc["ss"])
            .otherwise(
                F.concat(F.slice(acc["ss"], 2, _HW_M - 1), F.array(snew))
            )
            .alias("ss"),
            F.when(~acc["started"], acc["out"])
            .otherwise(
                F.concat(
                    acc["out"],
                    F.array(
                        F.struct(
                            x["hour_ts"].alias("hour_ts"),
                            x["n"].alias("n"),
                            lnew.alias("l"),
                            tnew.alias("t"),
                            snew.alias("s"),
                            fc.alias("fc"),
                            (nsc - fc).alias("miss"),
                        )
                    ),
                )
            )
            .alias("out"),
        )

    folded = hr.agg(
        F.sort_array(F.collect_list(F.struct("hour_ts", "n"))).alias("xs")
    ).select(F.aggregate(F.col("xs"), init, step)["out"].alias("rows"))
    return (
        folded.select(F.explode("rows").alias("r"))
        .select(
            F.col("r.hour_ts").alias("hour_ts"),
            F.col("r.n").alias("n_events"),
            F.col("r.l").alias("level_units"),
            F.col("r.t").alias("trend_units"),
            F.col("r.s").alias("seasonal_units"),
            F.col("r.fc").alias("forecast_units"),
            F.col("r.miss").alias("miss_units"),
        )
        .orderBy("hour_ts")
    )
