"""Batch sessionization — gap-based session assignment over an event log.

The streaming surface already has ``session_window`` (streaming/
windows.py); this is the batch replay of the same semantics for bounded
history, the shape every training-data pipeline uses to turn raw event
logs into per-session examples.

Plan shape (the 100-TB-safe one): ONE shuffle on the entity key, then
two window passes over the same ``(key, order)`` sort — ``lag`` to mark
gap starts, running ``sum`` to number sessions.  Catalyst executes both
windows in a single Exchange + Sort because the partitioning/ordering
specs match, so the whole operator costs one shuffle of the event table
and no joins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def sessionize(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    order_tie_break: str | None = None,
) -> DataFrame:
    """Assign ``session_seq`` (1-based, per key) to each event row.

    A new session starts when the gap to the previous event of the same
    key exceeds ``gap_minutes``.  ``order_tie_break`` (e.g. an event id)
    makes the within-timestamp order — and therefore the session
    numbering — fully deterministic when timestamps collide.
    """
    order_cols: list[Column] = [F.col(ts)]
    if order_tie_break is not None:
        order_cols.append(F.col(order_tie_break))
    w = Window.partitionBy(key).orderBy(*order_cols)
    prev_ts = F.lag(ts).over(w)
    # cast → no-op for TIMESTAMP, NTZ-tolerant for TIMESTAMP_NTZ parquet
    # (unix_micros rejects NTZ); any session-tz offset cancels in the gap
    gap_us = F.unix_micros(F.col(ts).cast("timestamp")) - F.unix_micros(
        prev_ts.cast("timestamp")
    )
    is_new = F.when(
        prev_ts.isNull() | (gap_us > gap_minutes * 60 * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy(key).orderBy(*order_cols).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return df.withColumn("session_seq", F.sum(is_new).over(running))


def session_summary(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_minutes: int = 30,
    order_tie_break: str | None = None,
) -> DataFrame:
    """One row per (key, session): event count, start/end, duration.

    Timestamps are rendered ``yyyy-MM-dd HH:mm:ss`` and the duration as
    whole seconds (integer microsecond arithmetic) per the catalog's
    determinism discipline.
    """
    s = sessionize(df, key, ts, gap_minutes, order_tie_break)
    return s.groupBy(key, "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.date_format(F.min(ts), "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
        F.date_format(F.max(ts), "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
        F.expr(
            f"(unix_micros(cast(max({ts}) as timestamp))"
            f" - unix_micros(cast(min({ts}) as timestamp))) div 1000000"
        ).alias("duration_sec"),
    )
