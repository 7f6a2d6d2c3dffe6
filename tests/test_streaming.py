"""Streaming replay tests: stream output ≡ batch output (SURVEY §5.2.4).

Runs the real Structured Streaming engine (file source, availableNow
micro-batches, memory/foreachBatch sinks) against the batch form of the
same expression tree, plus a watermark late-data-drop scenario built
from ordered micro-batch files.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from graphdatabases_spark.streaming.windows import (
    read_events_stream,
    run_stream_to_memory,
    streaming_dedup,
    tumbling_window_counts,
    session_window_stats,
    write_stream_foreach_batch,
)


@pytest.fixture(scope="module")
def events_dir(spark, sf_dir, tmp_path_factory):
    """Copy events into a stream-source directory, split into 4 files
    ordered by ts (deterministic micro-batch replay order)."""
    out = str(tmp_path_factory.mktemp("events_stream"))
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    # ts arrives as nanos-long here (no catalog loader): convert.
    if dict(ev.dtypes)["ts"] == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    ev.orderBy("ts").coalesce(1).write.mode("overwrite").parquet(out)
    return out


def _canon(df):
    pdf = df.toPandas()
    return pdf.sort_values(by=list(sorted(pdf.columns)), kind="mergesort")[
        sorted(pdf.columns)
    ].reset_index(drop=True)


def _final_watermark(df, delay="10 minutes"):
    """Final global watermark = max event time *of this exact input* minus
    the delay. Must be computed over the same filtered subset the stream
    sees — the watermark tracks post-filter event time."""
    return (
        df.agg(
            F.date_format(F.max("ts") - F.expr(f"INTERVAL {delay}"), "yyyy-MM-dd HH:mm:ss")
        ).collect()[0][0]
    )


class TestStreamBatchEquivalence:
    def test_tumbling_counts(self, spark, events_dir):
        """Append-mode stream output == batch output restricted to
        watermark-finalized windows (FIXTURES §C: post-watermark only)."""
        stream = read_events_stream(spark, events_dir)
        got = run_stream_to_memory(
            tumbling_window_counts(stream, "1 hour"), "t_tumbling", "append"
        )
        wm = _final_watermark(spark.read.parquet(events_dir))
        batch = tumbling_window_counts(
            spark.read.parquet(events_dir), "1 hour"
        ).filter(
            F.to_timestamp("win_start") + F.expr("INTERVAL 1 HOUR")
            <= F.lit(wm).cast("timestamp")
        )
        assert _canon(got).equals(_canon(batch))

    def test_session_windows(self, spark, events_dir):
        ev = read_events_stream(spark, events_dir).filter(F.col("user_id") < 5)
        got = run_stream_to_memory(
            session_window_stats(ev, "5 minutes"), "t_sessions", "append"
        )
        # The emit-or-not decision at the exact watermark instant depends on
        # sub-second precision the formatted strings can't see; compare both
        # sides strictly below a 1-minute guard band under the watermark.
        filtered = spark.read.parquet(events_dir).filter(F.col("user_id") < 5)
        cutoff = _final_watermark(filtered, delay="11 minutes")
        got = got.filter(F.col("sess_end") < cutoff)
        batch = session_window_stats(filtered, "5 minutes").filter(
            F.col("sess_end") < cutoff
        )
        assert _canon(got).equals(_canon(batch))

    def test_stream_static_enrichment(self, spark, events_dir):
        """Stream-static dimension join: streamed enrichment must equal
        the batch join, and invalid (static-driven) join types are
        rejected up front."""
        import pytest

        from graphdatabases_spark.streaming.windows import enrich_with_dimension

        dim = spark.range(10).select(
            F.col("id").alias("user_id"),
            F.concat(F.lit("tier-"), (F.col("id") % 3).cast("string")).alias("tier"),
        )
        stream = read_events_stream(spark, events_dir).filter(F.col("user_id") < 20)
        enriched = enrich_with_dimension(
            stream, dim, on="user_id", how="left"
        ).select(
            "event_id",
            "user_id",
            "tier",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
        got = run_stream_to_memory(enriched, "t_enrich", "append")
        batch = enrich_with_dimension(
            spark.read.parquet(events_dir).filter(F.col("user_id") < 20),
            dim,
            on="user_id",
            how="left",
        ).select(
            "event_id",
            "user_id",
            "tier",
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        )
        assert _canon(got).equals(_canon(batch))
        with pytest.raises(ValueError):
            enrich_with_dimension(stream, dim, on="user_id", how="right")

    def test_sliding_counts(self, spark, events_dir):
        """Sliding 10m/5m windows in append mode: each event lands in two
        overlapping windows; finalized windows must equal the batch form."""
        from graphdatabases_spark.streaming.windows import sliding_window_counts

        stream = read_events_stream(spark, events_dir)
        got = run_stream_to_memory(
            sliding_window_counts(stream, "10 minutes", "5 minutes"),
            "t_sliding",
            "append",
        )
        wm = _final_watermark(spark.read.parquet(events_dir))
        batch = sliding_window_counts(
            spark.read.parquet(events_dir), "10 minutes", "5 minutes"
        ).filter(
            F.to_timestamp("win_start") + F.expr("INTERVAL 10 MINUTES")
            <= F.lit(wm).cast("timestamp")
        )
        assert _canon(got).equals(_canon(batch))

    def test_streaming_dedup(self, spark, events_dir):
        stream = streaming_dedup(read_events_stream(spark, events_dir)).select(
            "event_id"
        )
        got = run_stream_to_memory(stream, "t_dedup", "append")
        n_stream = got.count()
        n_batch = (
            spark.read.parquet(events_dir).select("event_id").distinct().count()
        )
        assert n_stream == n_batch

    def test_foreach_batch_sink(self, spark, events_dir, tmp_path):
        out = str(tmp_path / "sink")
        stream = read_events_stream(spark, events_dir).select("event_id", "ts")
        write_stream_foreach_batch(stream, out)
        written = spark.read.parquet(out)
        assert written.count() == spark.read.parquet(events_dir).count()
        assert "batch_id" in written.columns


class TestWatermarkLateData:
    def test_late_rows_dropped_after_watermark(self, spark, tmp_path):
        """Ordered micro-batch files; the last contains an event older
        than the advanced watermark → it must NOT appear in the finalized
        (append-mode) windowed counts. Note Spark ≥3.4 filters late rows
        against the PREVIOUS batch's watermark (watermarkForLateEvents),
        so an extra batch is interposed between the watermark-advancing
        event and the late one."""
        src = tmp_path / "late_src"
        src.mkdir()

        def write_file(name, rows):
            pdf = pd.DataFrame(
                rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
            )
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            sdf = spark.createDataFrame(pdf)
            sdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp1"))
            import shutil, glob, os

            part = glob.glob(str(tmp_path / "tmp1" / "part-*.parquet"))[0]
            shutil.copy(part, str(src / name))

        # Batch 1: two events in window [00:00, 00:10).
        write_file("f1.parquet", [
            (1, "2024-01-01 00:01:00", 1, "click", 1.0, "{}"),
            (2, "2024-01-01 00:05:00", 1, "click", 1.0, "{}"),
        ])
        # Batch 2: event at 00:40 → watermark advances to 00:30.
        write_file("f2.parquet", [
            (3, "2024-01-01 00:40:00", 1, "click", 1.0, "{}"),
        ])
        # Batch 3: propagation batch so the 00:30 watermark becomes the
        # late-events watermark of the NEXT batch.
        write_file("f3.parquet", [
            (4, "2024-01-01 00:50:00", 1, "click", 1.0, "{}"),
        ])
        # Batch 4: late event at 00:02, behind the watermark → dropped.
        write_file("f4.parquet", [
            (5, "2024-01-01 00:02:00", 1, "click", 1.0, "{}"),
        ])

        stream = read_events_stream(spark, str(src), max_files_per_trigger=1)
        windowed = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "10 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.date_format("w.start", "HH:mm").alias("win"), "n"
            )
        )
        q = (
            windowed.writeStream.format("memory")
            .queryName("t_late")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dropped = sum(
            s.get("numRowsDroppedByWatermark", 0)
            for p in q.recentProgress
            for s in p["stateOperators"]
        )
        rows = {r["win"]: r["n"] for r in spark.table("t_late").collect()}
        # Window 00:00 was finalized with 2 events; the late 5th was
        # dropped by the watermark and never counted.
        assert dropped == 1
        assert rows.get("00:00") == 2


class TestStreamStreamJoin:
    def test_attribution_pairs_cross_micro_batches(self, spark, tmp_path):
        """STREAM-STREAM join state must survive micro-batch boundaries:
        a click buffered in batch 1 must still pair with a purchase
        arriving in batch 2 (within the 30-minute gap), while a
        purchase 45 minutes after its click must never pair. One file
        per trigger forces three separate batches."""
        from graphdatabases_spark.streaming.windows import attribution_join

        src = tmp_path / "attrib_src"
        src.mkdir()

        def write_file(name, rows):
            pdf = pd.DataFrame(
                rows,
                columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
            )
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            sdf = spark.createDataFrame(pdf)
            sdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp_a"))
            import glob
            import shutil

            part = glob.glob(str(tmp_path / "tmp_a" / "part-*.parquet"))[0]
            shutil.copy(part, str(src / name))

        # Batch 1: clicks 1 (user 1) and 2 (user 2); purchase 101 pairs
        # with click 1 inside the same batch (20-minute gap).
        write_file("f1.parquet", [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
            (2, "2024-01-01 10:05:00", 2, "click", 0.0, "{}"),
            (101, "2024-01-01 10:20:00", 1, "purchase", 10.0, "{}"),
        ])
        # Batch 2: purchase 102 pairs with click 1 ACROSS the batch
        # boundary (25-minute gap — the buffered-state assertion);
        # purchase 103 is 45 minutes after click 2 → out of gap.
        write_file("f2.parquet", [
            (102, "2024-01-01 10:25:00", 1, "purchase", 20.0, "{}"),
            (103, "2024-01-01 10:50:00", 2, "purchase", 30.0, "{}"),
        ])
        # Batch 3: in-batch pair for user 3, and advances the watermark.
        write_file("f3.parquet", [
            (3, "2024-01-01 11:30:00", 3, "click", 0.0, "{}"),
            (104, "2024-01-01 11:31:00", 3, "purchase", 40.0, "{}"),
        ])

        ev = read_events_stream(spark, str(src), max_files_per_trigger=1)
        joined = attribution_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
            max_gap="30 minutes",
            watermark="40 minutes",
        )
        got = run_stream_to_memory(joined, "t_attrib_mb", "append")
        pairs = {
            (r["click_id"], r["purchase_id"]): r["purchase_value"]
            for r in got.collect()
        }
        assert pairs == {(1, 101): 10.0, (1, 102): 20.0, (3, 104): 40.0}

    def test_full_outer_emits_each_side_at_most_once(self, spark):
        """FULL OUTER stream-stream join (events_stream_attrib_full):
        each click appears either in matched rows OR in exactly one
        null-purchase row (never both), each purchase in matched rows
        OR exactly one null-click row, every row carries a non-null
        coalesced user_id, and the two null shapes respect their
        measured eviction boundaries (click: ts + gap < wm; purchase:
        ts < wm — the no-offset side, since the p.ts >= c.ts
        constraint leaves any purchase above the watermark matchable
        by a future click)."""
        from graphdatabases_spark.relational.streaming_queries import (
            _stage_events_micro,
        )
        from graphdatabases_spark.streaming.windows import attribution_join

        staged, tag = _stage_events_micro(spark, "/root/testdata/sf0.001")
        ev = read_events_stream(spark, staged)
        joined = attribution_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
            max_gap="30 minutes",
            how="full_outer",
        )
        got = run_stream_to_memory(
            joined, f"t_attrib_full_{tag}", "append"
        ).toPandas()
        assert got["user_id"].notna().all()
        matched = got[got.click_id.notna() & got.purchase_id.notna()]
        null_p = got[got.purchase_id.isna()]
        null_c = got[got.click_id.isna()]
        # XOR per side: no id appears both matched and null-emitted,
        # and null emissions are unique per id.
        assert not (set(null_p.click_id) & set(matched.click_id))
        assert not (set(null_c.purchase_id) & set(matched.purchase_id))
        assert null_p.click_id.is_unique
        assert null_c.purchase_id.is_unique
        # Eviction boundaries against the batch-computed watermark.
        raw = spark.read.parquet(staged).toPandas()
        clicks = raw[raw.event_type == "click"]
        purch = raw[raw.event_type == "purchase"]
        wm = min(clicks.ts.max(), purch.ts.max()) - pd.Timedelta(minutes=10)
        gap = pd.Timedelta(minutes=30)
        assert (null_p.click_ts + gap < wm).all()
        assert (null_c.purchase_ts < wm).all()
        # Completeness below the boundary: every unmatched purchase
        # older than the watermark DID null-emit.
        orphan_expected = purch[
            ~purch.event_id.isin(set(matched.purchase_id))
            & (purch.ts < wm)
        ]
        assert set(orphan_expected.event_id) == set(null_c.purchase_id)


class TestStatefulOperator:
    def test_running_totals_across_batches(self, spark, events_dir, tmp_path):
        """applyInPandasWithState keyed state must survive micro-batch
        boundaries: split the events into 3 files, stream with one file
        per trigger, and check (a) at least one user was updated in
        multiple batches, (b) each user's final running row equals the
        batch groupBy aggregate."""
        from graphdatabases_spark.streaming.stateful import running_user_totals

        src = str(tmp_path / "split")
        ev = spark.read.parquet(events_dir).filter(F.col("user_id") < 8)
        ev.repartitionByRange(3, "ts").write.parquet(src)

        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        got = run_stream_to_memory(
            running_user_totals(stream.filter(F.col("user_id") < 8)),
            "t_stateful",
            "update",
        ).toPandas()

        # (a) state crossed batches: some user emitted >1 running row.
        assert (got.groupby("user_id").size() > 1).any()

        final = got.sort_values("n").groupby("user_id").last().reset_index()
        expect = (
            ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 6).alias("total"),
            )
            .toPandas()
        )
        merged = final.merge(expect, on="user_id", suffixes=("_got", "_exp"))
        assert len(merged) == len(expect)
        assert (merged["n_got"] == merged["n_exp"]).all()
        assert (abs(merged["total_got"] - merged["total_exp"]) < 1e-4).all()


class TestProcessingTimeTrigger:
    """The one unexercised trigger mode (round-10 verdict item 6): a
    wall-clock ``Trigger.ProcessingTime`` run with MID-STREAM state
    inspection. Batch boundaries under wall-clock triggers are
    timing-dependent, so the honest pin is semantic: (a) the progress
    API exposes the stateful operator's in-flight state while the
    query is live, (b) the state store itself is QUERYABLE via the
    ``statestore`` reader and decodes to exactly the batch aggregate,
    and (c) the final table equals the batch oracle no matter how the
    wall clock sliced the input into micro-batches."""

    def test_processing_time_trigger_state_inspection(self, spark, tmp_path):
        import time as _time

        from graphdatabases_spark.streaming.stateful import (
            running_user_totals,
        )

        src = str(tmp_path / "pt_src")
        ckpt = str(tmp_path / "pt_ckpt")
        ev = spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        )
        if dict(ev.dtypes)["ts"] == "bigint":
            ev = ev.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        ev = ev.filter(F.col("user_id") < 8)
        ev.repartitionByRange(3, "ts").write.parquet(src)

        stream = read_events_stream(spark, src, max_files_per_trigger=1)
        q = (
            running_user_totals(stream.filter(F.col("user_id") < 8))
            .writeStream.format("memory")
            .queryName("pt_totals")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="500 milliseconds")
            .start()
        )
        snaps = []
        try:
            deadline = _time.time() + 180
            drained = False
            while _time.time() < deadline and not drained:
                p = q.lastProgress
                if p and p.get("stateOperators"):
                    so = p["stateOperators"][0]
                    snaps.append(
                        (p["batchId"], so.get("numRowsTotal", 0))
                    )
                # All 3 files consumed once a trigger fires on an
                # empty source (numInputRows == 0 after batch >= 2).
                drained = any(
                    rp.get("batchId", 0) >= 2
                    and rp.get("sources")
                    and rp["sources"][0].get("numInputRows") == 0
                    for rp in q.recentProgress
                )
                _time.sleep(0.2)
            assert drained, "wall-clock triggers never drained the source"
        finally:
            q.stop()
            q.awaitTermination()

        # (a) in-flight state was visible through the progress API
        # while the query ran — including before the last data batch.
        assert snaps, "no stateOperators progress observed mid-stream"
        assert any(total > 0 and bid < 2 for bid, total in snaps), snaps

        expect = (
            ev.groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 6).alias("total"),
            )
            .toPandas()
            .set_index("user_id")
            .sort_index()
        )

        # (c) final table == batch oracle regardless of how wall-clock
        # triggers sliced the files into micro-batches.
        got = spark.table("pt_totals").toPandas()
        final = (
            got.sort_values("n").groupby("user_id").last().sort_index()
        )
        assert (final["n"] == expect["n"]).all()
        assert (abs(final["total"] - expect["total"]) < 1e-4).all()

        # (b) the committed state store is queryable and holds exactly
        # the batch aggregate: one state row per user, (n, total)
        # equal to the groupBy result.
        st = (
            spark.read.format("statestore")
            .load(ckpt)
            .select(
                F.col("key.user_id").alias("user_id"),
                F.col("value.groupState.n").alias("n"),
                F.col("value.groupState.total").alias("total"),
            )
            .toPandas()
            .set_index("user_id")
            .sort_index()
        )
        assert list(st.index) == list(expect.index)
        assert (st["n"] == expect["n"]).all()
        assert (abs(st["total"] - expect["total"]) < 1e-4).all()


class TestCheckpointRestart:
    """Stop a query mid-stream, restart from the same checkpointLocation
    with a freshly built plan, and prove operator state was recovered
    from the state store (not rebuilt) — the production fault-tolerance
    path.  Phase boundaries are deterministic: phase 1's source dir
    holds only the first file(s) and runs availableNow to completion
    (checkpoint commits them); the remaining files are added before
    phase 2 restarts."""

    @staticmethod
    def _write_events(spark, tmp_path, src, name, rows):
        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / "tmp_ckpt")
        )
        import glob
        import shutil

        part = glob.glob(str(tmp_path / "tmp_ckpt" / "part-*.parquet"))[0]
        shutil.copy(part, str(src / name))

    def test_stateful_totals_restart_recovers_state(self, spark, tmp_path):
        """applyInPandasWithState keyed state must survive a full query
        stop/restart: phase 2's running totals must INCLUDE phase 1's
        rows (a lost state store would restart every user's count at
        its phase-2 row count)."""
        from graphdatabases_spark.streaming.stateful import running_user_totals
        from graphdatabases_spark.streaming.windows import run_stream_checkpointed

        src = tmp_path / "ckpt_src"
        src.mkdir()
        out = str(tmp_path / "ckpt_out")
        ckpt = str(tmp_path / "ckpt_state")

        self._write_events(spark, tmp_path, src, "f1.parquet", [
            (1, "2024-01-01 09:00:00", 1, "view", 10.0, "{}"),
            (2, "2024-01-01 09:01:00", 1, "view", 5.0, "{}"),
            (3, "2024-01-01 09:02:00", 2, "click", 7.0, "{}"),
        ])
        run_stream_checkpointed(
            running_user_totals(read_events_stream(spark, str(src))),
            out, ckpt, "update",
        )

        # Phase 2: new files appear; a FRESH identical plan restarts
        # from the same checkpoint.
        self._write_events(spark, tmp_path, src, "f2.parquet", [
            (4, "2024-01-01 09:10:00", 1, "view", 2.0, "{}"),
            (5, "2024-01-01 09:11:00", 3, "view", 1.0, "{}"),
        ])
        run_stream_checkpointed(
            running_user_totals(read_events_stream(spark, str(src))),
            out, ckpt, "update",
        )

        got = spark.read.parquet(out).toPandas()
        # Source files were not reprocessed: user 1 has exactly two
        # running rows (one per phase), not three.
        assert len(got) == 4, got
        final = got.sort_values("n").groupby("user_id").last()
        # User 1's phase-2 row folds phase-1 state: n=3, total=17
        # (state lost => n=1, total=2).
        assert final.loc[1, "n"] == 3 and final.loc[1, "total"] == 17.0
        assert final.loc[2, "n"] == 1 and final.loc[2, "total"] == 7.0
        assert final.loc[3, "n"] == 1 and final.loc[3, "total"] == 1.0

    def test_attribution_join_restart_recovers_buffered_side(self, spark, tmp_path):
        """Stream-stream join buffers must survive restart: a click
        consumed before the stop must still pair with a purchase that
        only arrives after the restart (lost buffers => no pair, since
        the click's file is never re-read)."""
        from graphdatabases_spark.streaming.windows import (
            attribution_join,
            run_stream_checkpointed,
        )

        src = tmp_path / "ckpt_attr_src"
        src.mkdir()
        out = str(tmp_path / "ckpt_attr_out")
        ckpt = str(tmp_path / "ckpt_attr_state")

        def pipeline():
            ev = read_events_stream(spark, str(src))
            return attribution_join(
                ev.filter(F.col("event_type") == "click"),
                ev.filter(F.col("event_type") == "purchase"),
                max_gap="30 minutes",
                watermark="40 minutes",
            )

        # Phase 1: clicks only — zero pairs, clicks enter join state.
        self._write_events(spark, tmp_path, src, "f1.parquet", [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
            (2, "2024-01-01 10:05:00", 2, "click", 0.0, "{}"),
        ])
        run_stream_checkpointed(pipeline(), out, ckpt, "append")

        # Phase 2 (fresh plan, same checkpoint): purchase 101 pairs
        # with buffered click 1 (20-min gap); purchase 103 is 45 min
        # after click 2 — outside the gap even with recovered state.
        self._write_events(spark, tmp_path, src, "f2.parquet", [
            (101, "2024-01-01 10:20:00", 1, "purchase", 10.0, "{}"),
            (103, "2024-01-01 10:50:00", 2, "purchase", 30.0, "{}"),
        ])
        run_stream_checkpointed(pipeline(), out, ckpt, "append")

        got = spark.read.parquet(out)
        pairs = {
            (r["click_id"], r["purchase_id"]): r["purchase_value"]
            for r in got.collect()
        }
        assert pairs == {(1, 101): 10.0}


class TestExactlyOnceSink:
    """foreachBatch is at-least-once: Spark writes ``<ckpt>/commits/
    <epoch>`` only AFTER the sink returns, so a crash in the window
    between sink success and commit re-delivers the same batch_id (with
    identical offsets) on restart. Inject that fault deterministically:
    run an availableNow query to completion, delete the newest commits
    file — exactly the on-disk state such a crash leaves — and restart
    the identical plan."""

    _ROWS = [
        (1, "2024-01-01 09:00:00", 1, "view", 10.0, "{}"),
        (2, "2024-01-01 09:01:00", 1, "view", 5.0, "{}"),
        (3, "2024-01-01 09:02:00", 2, "click", 7.0, "{}"),
    ]

    @staticmethod
    def _inject_replay(ckpt: str) -> None:
        import glob
        import os

        commits = sorted(
            glob.glob(os.path.join(ckpt, "commits", "*")),
            key=lambda p: (
                int(os.path.basename(p))
                if os.path.basename(p).isdigit()
                else -1
            ),
        )
        assert commits, "no committed epoch to replay"
        os.remove(commits[-1])
        # The local Hadoop ChecksumFileSystem keeps a .N.crc sidecar;
        # leaving it behind makes the replay's commit re-write fail as a
        # spurious concurrent-modification (stale checksum), which a
        # real crash would never leave either (the commit file and its
        # crc are renamed into place together).
        crc = os.path.join(
            ckpt, "commits", f".{os.path.basename(commits[-1])}.crc"
        )
        if os.path.exists(crc):
            os.remove(crc)

    def _run(self, spark, tmp_path, runner):
        src = tmp_path / "eo_src"
        if not src.exists():
            src.mkdir()
            TestCheckpointRestart._write_events(
                spark, tmp_path, src, "f1.parquet", self._ROWS
            )
        out = str(tmp_path / "eo_out")
        ckpt = str(tmp_path / "eo_ckpt")
        stream = read_events_stream(spark, str(src)).select(
            "event_id", "ts", "user_id"
        )
        runner(stream, out, ckpt, "append")
        return out, ckpt

    def test_plain_append_sink_duplicates_on_replay(self, spark, tmp_path):
        """The hazard is real: the at-least-once append sink duplicates
        the replayed batch's rows."""
        from graphdatabases_spark.streaming.windows import run_stream_checkpointed

        out, ckpt = self._run(spark, tmp_path, run_stream_checkpointed)
        assert spark.read.parquet(out).count() == 3
        self._inject_replay(ckpt)
        out, _ = self._run(spark, tmp_path, run_stream_checkpointed)
        got = spark.read.parquet(out)
        assert got.count() == 6, "replayed batch should have appended twice"

    def test_exactly_once_sink_survives_replay(self, spark, tmp_path):
        """The idempotent per-batch_id sink must absorb the replay: the
        _COMMITTED marker short-circuits the rewrite."""
        from graphdatabases_spark.streaming.windows import run_stream_exactly_once

        out, ckpt = self._run(spark, tmp_path, run_stream_exactly_once)
        assert spark.read.parquet(out).count() == 3
        self._inject_replay(ckpt)
        out, _ = self._run(spark, tmp_path, run_stream_exactly_once)
        got = spark.read.parquet(out)
        assert got.count() == 3
        assert {r["event_id"] for r in got.collect()} == {1, 2, 3}
        assert "batch_id" in got.columns  # partition column surfaces

    def test_exactly_once_sink_heals_torn_write(self, spark, tmp_path):
        """Crash MID-sink (partial parquet, no marker): the replay's
        scoped overwrite must clobber the torn attempt, not append."""
        import glob
        import os

        from graphdatabases_spark.streaming.windows import run_stream_exactly_once

        out, ckpt = self._run(spark, tmp_path, run_stream_exactly_once)
        self._inject_replay(ckpt)
        # Simulate the torn first attempt: marker gone, a stray partial
        # part-file present.
        batch_dir = glob.glob(os.path.join(out, "batch_id=*"))[0]
        os.remove(os.path.join(batch_dir, "_COMMITTED"))
        part = glob.glob(os.path.join(batch_dir, "part-*"))[0]
        with open(os.path.join(batch_dir, "part-torn.parquet"), "wb") as fh:
            fh.write(open(part, "rb").read()[: 100])
        out, _ = self._run(spark, tmp_path, run_stream_exactly_once)
        got = spark.read.parquet(out)
        assert got.count() == 3
        assert {r["event_id"] for r in got.collect()} == {1, 2, 3}
        assert not glob.glob(os.path.join(out, "*", "part-torn*")), (
            "overwrite must have removed the torn part-file"
        )


class TestStreamingDedupState:
    """dropDuplicates keyed state must survive a full query restart:
    a duplicate arriving AFTER the restart must still be suppressed
    (lost state would re-admit every key at its phase-2 first sight)."""

    def test_dedup_state_survives_restart(self, spark, tmp_path):
        import pandas as pd

        src = tmp_path / "dd_src"
        src.mkdir()
        out = str(tmp_path / "dd_out")
        ckpt = str(tmp_path / "dd_ckpt")

        def write_docs(name, rows):
            pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
            tmp = tmp_path / "dd_stage"
            spark.createDataFrame(pdf).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(tmp))
            import glob
            import shutil

            part = glob.glob(str(tmp / "part-*.parquet"))[0]
            shutil.copy(part, str(src / name))

        def run():
            from graphdatabases_spark.functions import text as T
            from graphdatabases_spark.streaming.windows import (
                run_stream_checkpointed,
            )

            stream = (
                spark.readStream.schema("doc_id long, text string")
                .parquet(str(src))
                .withColumn("fp", T.fingerprint(F.col("text")))
                .dropDuplicates(["fp"])
            )
            run_stream_checkpointed(stream, out, ckpt, "append")

        write_docs("f1.parquet", [(1, "alpha beta gamma"), (2, "delta eps")])
        run()
        got = spark.read.parquet(out)
        assert got.count() == 2
        # Phase 2: one true duplicate (same token set, reordered — the
        # canonical fingerprint collapses it) + one new doc.
        write_docs("f2.parquet", [(3, "gamma beta alpha"), (4, "zeta eta")])
        run()
        got = spark.read.parquet(out).collect()
        assert len(got) == 3, "restarted state must suppress the reordered dup"
        assert {r["doc_id"] for r in got} == {1, 2, 4}


class TestExactlyOnceConsumers:
    """The consumer half of the exactly-once contract (ADVICE r5 +
    VERDICT r5 #4): committed-only reads during faults, and small-files
    compaction of the per-epoch sink layout."""

    _F1 = [
        (1, "2024-01-01 09:00:00", 1, "view", 10.0, "{}"),
        (2, "2024-01-01 09:01:00", 1, "view", 5.0, "{}"),
        (3, "2024-01-01 09:02:00", 2, "click", 7.0, "{}"),
    ]
    _F2 = [
        (4, "2024-01-01 09:03:00", 2, "view", 2.0, "{}"),
        (5, "2024-01-01 09:04:00", 3, "purchase", 99.0, "{}"),
    ]

    def _two_epochs(self, spark, tmp_path):
        """Run the exactly-once sink twice over a growing source dir so
        out_dir holds two committed batch_id= epochs."""
        from graphdatabases_spark.streaming.windows import run_stream_exactly_once

        src = tmp_path / "eoc_src"
        src.mkdir()
        out = str(tmp_path / "eoc_out")
        ckpt = str(tmp_path / "eoc_ckpt")
        for name, rows in (("f1.parquet", self._F1), ("f2.parquet", self._F2)):
            TestCheckpointRestart._write_events(spark, tmp_path, src, name, rows)
            stream = read_events_stream(spark, str(src)).select(
                "event_id", "ts", "user_id"
            )
            run_stream_exactly_once(stream, out, ckpt, "append")
        return out

    def test_committed_reader_skips_inflight_epochs(self, spark, tmp_path):
        """read_committed_stream_output must see exactly the committed
        epochs even when a torn, marker-less epoch dir sits alongside
        them (the state a mid-sink crash leaves)."""
        import glob
        import os

        from graphdatabases_spark.streaming.windows import (
            read_committed_stream_output,
        )

        out = self._two_epochs(spark, tmp_path)
        dirs = sorted(glob.glob(os.path.join(out, "batch_id=*")))
        assert len(dirs) == 2
        # Tear the newest epoch: marker gone, truncated part-file left.
        torn = dirs[-1]
        os.remove(os.path.join(torn, "_COMMITTED"))
        part = glob.glob(os.path.join(torn, "part-*"))[0]
        with open(os.path.join(torn, "part-torn.parquet"), "wb") as fh:
            fh.write(open(part, "rb").read()[:100])
        got = read_committed_stream_output(spark, out)
        assert "batch_id" in got.columns
        assert {r["event_id"] for r in got.collect()} == {1, 2, 3}

    def test_committed_reader_raises_before_first_commit(self, spark, tmp_path):
        import pytest

        from graphdatabases_spark.streaming.windows import (
            read_committed_stream_output,
        )

        empty = tmp_path / "eoc_empty"
        empty.mkdir()
        with pytest.raises(FileNotFoundError):
            read_committed_stream_output(spark, str(empty))

    def test_compaction_behind_exactly_once_sink(self, spark, tmp_path):
        """VERDICT r5 #4: epoch dirs -> compact_parquet -> reader
        equivalence. The per-epoch layout is exactly the small-files
        shape compaction exists for; the compacted dataset must be
        row-identical (batch_id carried as a data column) and collapse
        to the byte-derived file count."""
        import glob
        import os

        from graphdatabases_spark.sources.writers import compact_parquet

        out = self._two_epochs(spark, tmp_path)
        compacted = str(tmp_path / "eoc_compact")
        n_before = len(glob.glob(os.path.join(out, "batch_id=*", "part-*")))
        assert n_before >= 2
        written = compact_parquet(spark, out, compacted)
        assert written == 1  # 5 tiny rows << default 128 MiB target
        assert len(glob.glob(os.path.join(compacted, "part-*.parquet"))) == 1
        a = {
            tuple(r)
            for r in spark.read.parquet(out)
            .select("event_id", "user_id", "batch_id")
            .collect()
        }
        b = {
            tuple(r)
            for r in spark.read.parquet(compacted)
            .select("event_id", "user_id", "batch_id")
            .collect()
        }
        assert a == b and len(a) == 5


class TestRateSource:
    def test_rate_stream_schema_and_rows(self, spark, tmp_path):
        """The rate generator must match the events schema so every
        windowed operator runs unchanged against it."""
        from graphdatabases_spark.streaming.windows import (
            EVENTS_SCHEMA,
            read_rate_stream,
        )

        stream = read_rate_stream(spark, rows_per_second=500, partitions=1)
        assert stream.isStreaming
        expected = spark.createDataFrame([], EVENTS_SCHEMA).schema
        got = {f.name: f.dataType.simpleString() for f in stream.schema.fields}
        want = {f.name: f.dataType.simpleString() for f in expected.fields}
        assert got == want
        q = (
            stream.writeStream.format("memory")
            .queryName("rate_probe")
            .trigger(processingTime="200 milliseconds")
            .start()
        )
        try:
            import time

            deadline = time.time() + 20
            while time.time() < deadline:
                if spark.sql("SELECT count(*) n FROM rate_probe").collect()[0]["n"] > 0:
                    break
                time.sleep(0.5)
            rows = spark.sql(
                "SELECT * FROM rate_probe ORDER BY event_id LIMIT 3"
            ).collect()
            assert rows, "rate source produced no rows in 20s"
            assert rows[0]["event_type"] in ("view", "click", "purchase")
        finally:
            q.stop()


class TestBoundedDedupEviction:
    """streaming_dedup_bounded's state-eviction contract — the bounded-
    state dedup an unbounded 100-TB feed actually deploys: duplicates
    arriving within the watermark delay of their key's first sighting
    are suppressed, and a duplicate whose key state was already evicted
    (watermark passed first_seen + delay) is RE-ADMITTED.  Both sides
    of the trade pinned, across a checkpoint restart."""

    def test_within_delay_suppressed_past_watermark_readmitted(
        self, spark, tmp_path
    ):
        from graphdatabases_spark.functions import text as T
        from graphdatabases_spark.streaming.windows import (
            run_stream_checkpointed,
            streaming_dedup_bounded,
        )

        src = tmp_path / "bd_src"
        src.mkdir()
        out = str(tmp_path / "bd_out")
        ckpt = str(tmp_path / "bd_ckpt")

        def write_docs(name, rows):
            pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            stage = tmp_path / "bd_stage"
            spark.createDataFrame(pdf).coalesce(1).write.mode(
                "overwrite"
            ).parquet(str(stage))
            import glob
            import shutil

            shutil.copy(
                glob.glob(str(stage / "part-*.parquet"))[0], str(src / name)
            )

        def run():
            stream = (
                spark.readStream.schema("doc_id long, ts timestamp, text string")
                .parquet(str(src))
                .withColumn("fp", T.fingerprint(F.col("text")))
            )
            dd = streaming_dedup_bounded(
                stream, ["fp"], watermark="10 minutes"
            )
            run_stream_checkpointed(dd, out, ckpt, "append")

        # Batch 1: doc 1 at 09:00; doc 2 at 12:00 advances the
        # watermark to 11:50 at batch end, evicting doc 1's key state
        # (held only until 09:00 + 10 min).
        write_docs(
            "f1.parquet",
            [
                (1, "2024-01-01 09:00:00", "alpha beta gamma"),
                (2, "2024-01-01 12:00:00", "delta epsilon zeta"),
            ],
        )
        run()
        assert spark.read.parquet(out).count() == 2
        # Batch 2: doc 3 is a fingerprint-dup of doc 2 INSIDE the delay
        # (state alive until 12:10 > watermark 11:50) -> suppressed;
        # doc 4 duplicates doc 1 AFTER its state eviction -> re-admitted.
        write_docs(
            "f2.parquet",
            [
                (3, "2024-01-01 12:01:00", "zeta delta epsilon"),
                (4, "2024-01-01 12:05:00", "gamma alpha beta"),
            ],
        )
        run()
        got = spark.read.parquet(out).collect()
        assert {r["doc_id"] for r in got} == {1, 2, 4}, (
            "bounded dedup must suppress the in-delay dup (3) and "
            "re-admit the post-eviction dup (4): got "
            f"{sorted(r['doc_id'] for r in got)}"
        )


class TestConcurrentCommittedReader:
    """A reader polling read_committed_stream_output WHILE the
    exactly-once sink writes epochs (the staged round-7 hardening item):
    every observation must be a union of FULLY committed batches —
    no torn part-file read, no uncommitted rows, monotone growth."""

    def test_reader_races_writer_sees_only_committed_prefixes(
        self, spark, tmp_path
    ):
        import threading

        from graphdatabases_spark.streaming.windows import (
            read_committed_stream_output,
            read_events_stream,
            run_stream_exactly_once,
        )

        src = tmp_path / "race_src"
        src.mkdir()
        out = str(tmp_path / "race_out")
        ckpt = str(tmp_path / "race_ckpt")
        batches = {}
        for k in range(10):
            rows = [
                (10 * k + j, f"2024-01-01 09:{k:02d}:00", k, "view", 1.0, "{}")
                for j in range(3)
            ]
            batches[k] = frozenset(10 * k + j for j in range(3))
            TestCheckpointRestart._write_events(
                spark, tmp_path, src, f"f{k}.parquet", rows
            )

        snapshots: list[frozenset] = []
        errors: list[str] = []
        stop = threading.Event()

        def reader():
            while not stop.is_set():
                try:
                    ids = frozenset(
                        r["event_id"]
                        for r in read_committed_stream_output(
                            spark, out
                        ).collect()
                    )
                    snapshots.append(ids)
                except FileNotFoundError:
                    snapshots.append(frozenset())  # before first commit
                except Exception as e:  # torn read = contract violation
                    errors.append(repr(e))
                    break

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        try:
            stream = read_events_stream(
                spark, str(src), max_files_per_trigger=1
            ).select("event_id", "ts", "user_id")
            run_stream_exactly_once(stream, out, ckpt, "append")
        finally:
            stop.set()
            t.join(timeout=60)

        assert not errors, errors
        assert snapshots
        # Only committed rows, at batch granularity: each source batch is
        # either fully visible or fully absent in every observation.
        for ids in snapshots:
            for k, bs in batches.items():
                inter = ids & bs
                assert inter in (frozenset(), bs), (
                    f"partial batch {k} observed: {sorted(inter)}"
                )
        # Commits only add epochs: observations grow monotonically.
        for a, b in zip(snapshots, snapshots[1:]):
            assert a <= b, "non-monotone committed view"
        final = frozenset(
            r["event_id"]
            for r in read_committed_stream_output(spark, out).collect()
        )
        assert final == frozenset().union(*batches.values())
        # The race was real: the reader saw at least one pre-final state
        # (its first poll starts before the writer's first commit).
        assert any(s != final for s in snapshots)


class TestStreamingSessionMerge:
    """events_stream_sessions: session-window state must MERGE across
    micro-batch boundaries — one file per trigger, every session still
    equal to the batch gaps-and-islands answer."""

    def test_single_file_triggers_equal_batch_sessions(self, spark):
        from graphdatabases_spark.relational import queries
        from graphdatabases_spark.relational.streaming_queries import (
            _stage_events_micro,
        )
        from graphdatabases_spark.streaming.windows import (
            read_events_stream,
            session_window_stats,
        )

        sf_dir = "/root/testdata/sf0.001"
        staged, tag = _stage_events_micro(spark, sf_dir)
        # Re-shard into 4 HASH-shuffled files: each micro-batch then
        # carries an arbitrary time-interleaved slice, so sessions can
        # only come out right if the engine MERGES window state across
        # batches (and tolerates out-of-order arrival).
        import os
        import tempfile

        sharded = os.path.join(
            tempfile.gettempdir(), f"sess_shards_{tag}"
        )
        spark.read.parquet(staged).repartition(4).write.mode(
            "overwrite"
        ).parquet(sharded)
        n_files = len(
            [f for f in os.listdir(sharded) if f.endswith(".parquet")]
        )
        assert n_files >= 2, "need multiple files to prove cross-batch merge"
        stream = read_events_stream(spark, sharded, max_files_per_trigger=1)
        sess = session_window_stats(
            stream.filter(F.col("user_id") < 10),
            "5 minutes",
            watermark="3650 days",
        )
        sink = f"sess_merge_{tag}"
        q = (
            sess.writeStream.format("memory")
            .queryName(sink)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert len(q.recentProgress) >= 2, "replay must span >1 micro-batch"
        got = sorted(
            tuple(r)
            for r in spark.table(sink)
            .select("user_id", "sess_start", "sess_end", "n")
            .collect()
        )
        want = sorted(
            tuple(r)
            for r in queries()["events_session_windows"](
                spark, sf_dir
            ).collect()
        )
        assert got == want and len(want) > 0


class TestBoundedSessionWindows:
    """The production (append + watermark) form of streaming session
    windows — the bounded-state contract events_stream_sessions's
    complete-mode replay deliberately sidesteps: finalized sessions
    are emitted exactly once, a late event behind the watermark is
    DROPPED (batch would have merged it), and a still-open session is
    withheld at stream end."""

    def test_finalized_emit_late_drop_open_withheld(self, spark, tmp_path):
        import glob
        import os
        import shutil

        from pyspark.sql.types import (
            LongType,
            StructField,
            StructType,
            TimestampType,
        )

        from graphdatabases_spark.streaming.windows import (
            session_window_stats,
        )

        schema = StructType(
            [
                StructField("user_id", LongType()),
                StructField("ts", TimestampType()),
            ]
        )
        base = 1_700_000_000

        def mk(rows):
            import datetime as dt

            return [
                (u, dt.datetime.fromtimestamp(base + m * 60, dt.timezone.utc)
                 .replace(tzinfo=None))
                for u, m in rows
            ]

        # The engine's watermark visibly lags one batch (the same
        # lagging-eviction semantics docs_stream_dedup_bounded measured
        # for dropDuplicates state): the filter applied to batch N uses
        # the watermark derived from batch N-1's inputs, so the advance
        # needs one extra epoch to take effect before the late arrival.
        epochs = [
            mk([(1, 0), (1, 2)]),   # user 1: session [00, 02]
            mk([(2, 60)]),          # advances event time to 60 min
            mk([(3, 65)]),          # watermark 50 now in force; -> 55
            mk([(1, 4)]),           # LATE for user 1 (behind watermark)
        ]
        src = str(tmp_path / "sess_epochs")
        os.makedirs(src)
        for e, rows in enumerate(epochs):
            tmp = str(tmp_path / f"_t{e}")
            spark.createDataFrame(rows, schema).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            dst = os.path.join(src, f"e{e}.parquet")
            shutil.move(glob.glob(f"{tmp}/part-*.parquet")[0], dst)
            shutil.rmtree(tmp)
            os.utime(dst, (base + e, base + e))

        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        sess = session_window_stats(stream, "5 minutes", watermark="10 minutes")
        sink = "bounded_sessions_pin"
        (
            sess.writeStream.format("memory")
            .queryName(sink)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        got = [
            (r.user_id, r.n) for r in spark.table(sink).collect()
        ]
        # Exactly ONE emission: user 1's finalized 2-event session.
        # The late t=4min event (which batch sessionization would merge
        # into a 3-event session) is dropped, and user 2's / user 3's
        # still-open sessions are withheld at stream end.
        assert got == [(1, 2)], got

        # The batch oracle over the SAME rows disagrees by exactly the
        # late row — that delta IS the bounded-state contract.
        batch = session_window_stats(
            spark.read.parquet(src), "5 minutes"
        ).collect()
        batch_u1 = [r.n for r in batch if r.user_id == 1]
        assert batch_u1 == [3]


class TestStreamStreamOuterJoin:
    """Left-outer attribution join: the null-emission boundary pinned
    per click on a controlled fixture (the catalog entry
    events_stream_attrib_outer pins the same rule via its oracle)."""

    def test_null_emission_respects_global_watermark(self, spark, tmp_path):
        from graphdatabases_spark.streaming.windows import (
            attribution_join,
            read_events_stream,
            run_stream_to_memory,
        )

        src = tmp_path / "outer_src"
        src.mkdir()
        # One file -> one batch. gap=30m, watermark=10m.
        # max click ts = 11:50, max purchase ts = 12:30
        #   -> global watermark = min(11:50, 12:30) - 10m = 11:40.
        TestCheckpointRestart._write_events(spark, tmp_path, src, "f1.parquet", [
            # A: matched inside the gap -> emits as a pair.
            (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
            (101, "2024-01-01 10:10:00", 1, "purchase", 10.0, "{}"),
            # B: unmatched, 10:05 + 30m = 10:35 < 11:40 -> null-emits.
            (2, "2024-01-01 10:05:00", 2, "click", 0.0, "{}"),
            # D: matched ABOVE the boundary (11:45 + 30m > 11:40):
            # inner results emit immediately regardless of watermark.
            (4, "2024-01-01 11:45:00", 4, "click", 0.0, "{}"),
            (104, "2024-01-01 11:46:00", 4, "purchase", 40.0, "{}"),
            # C: unmatched, 11:50 + 30m = 12:20 > 11:40 -> WITHHELD.
            (3, "2024-01-01 11:50:00", 3, "click", 0.0, "{}"),
            # Far-future purchase advances the purchase-side max ts so
            # the global watermark is governed by the click side.
            (199, "2024-01-01 12:30:00", 9, "purchase", 1.0, "{}"),
        ])
        ev = read_events_stream(spark, str(src))
        joined = attribution_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
            max_gap="30 minutes",
            watermark="10 minutes",
            how="left_outer",
        )
        got = run_stream_to_memory(joined, "t_attrib_outer_pin", "append")
        rows = got.collect()
        by_click: dict[int, list] = {}
        for r in rows:
            by_click.setdefault(r["click_id"], []).append(r["purchase_id"])
        # Each click emits at most once — matched XOR null.
        assert all(len(v) == 1 for v in by_click.values()), by_click
        assert by_click[1] == [101]     # matched pair
        assert by_click[4] == [104]     # matched above the boundary
        assert by_click[2] == [None]    # unmatched, boundary passed
        assert 3 not in by_click        # unmatched, still buffered


class TestAppendTumblingFinalization:
    """Append-mode tumbling agg: the watermark-tie boundary, pinned on
    a controlled fixture (the catalog entry encodes the same rule)."""

    def test_window_emits_at_exact_watermark_tie(self, spark, tmp_path):
        from graphdatabases_spark.streaming.windows import read_events_stream

        src = tmp_path / "tumb_tie_src"
        src.mkdir()
        # Watermark = 07:00 - 1h = 06:00 == end of [00:00, 06:00):
        # the tie must EMIT (rule: end <= watermark). The second
        # purchase's own window [06:00, 12:00) is open and withheld.
        TestCheckpointRestart._write_events(spark, tmp_path, src, "f1.parquet", [
            (1, "2024-01-01 01:00:00", 1, "purchase", 5.0, "{}"),
            (2, "2024-01-01 07:00:00", 1, "purchase", 7.0, "{}"),
        ])
        s = (
            read_events_stream(spark, str(src))
            .filter(F.col("event_type") == "purchase")
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "6 hours").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        (
            s.writeStream.format("memory")
            .queryName("t_tumb_tie")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
            .awaitTermination()
        )
        rows = spark.table("t_tumb_tie").collect()
        got = {(str(r["w"].start), str(r["w"].end), r["n"]) for r in rows}
        assert got == {("2024-01-01 00:00:00", "2024-01-01 06:00:00", 1)}


class TestChainedStatefulOperators:
    """Multi-stateful-operator pipeline (Spark 3.5+ / SPARK-42376):
    stream-stream attribution join FEEDING a tumbling windowed count —
    every stateful operator is pinned individually elsewhere in this
    file; this pins the COMPOSITION: the join's emitted pairs flow into
    the downstream agg's state within the same query, cross micro-batch
    boundaries in BOTH operators, and windows finalize against the
    propagated (join-delayed) watermark."""

    def _write_file(self, spark, tmp_path, src, name, rows):
        import glob
        import shutil

        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp_c"))
        part = glob.glob(str(tmp_path / "tmp_c" / "part-*.parquet"))[0]
        shutil.copy(part, str(src / name))

    def _stage(self, spark, tmp_path):
        src = tmp_path / "chain_src"
        src.mkdir()

        def write_file(name, rows):
            self._write_file(spark, tmp_path, src, name, rows)

        # Batch 1: click 1 + purchase 101 pair in-batch (window 10:00).
        write_file("f1.parquet", [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
            (101, "2024-01-01 10:10:00", 1, "purchase", 10.0, "{}"),
        ])
        # Batch 2: purchase 102 pairs with click 1 ACROSS the join's
        # batch boundary AND lands in window 10:00, whose partial count
        # (n=1 from batch 1) must still be open in the AGG's state —
        # cross-batch state in both operators at once. Click 2/purchase
        # 103 start window 11:00.
        write_file("f2.parquet", [
            (102, "2024-01-01 10:20:00", 1, "purchase", 20.0, "{}"),
            (2, "2024-01-01 11:05:00", 2, "click", 0.0, "{}"),
            (103, "2024-01-01 11:10:00", 2, "purchase", 40.0, "{}"),
        ])
        # Batch 3: a far-future in-gap pair advances the global
        # watermark to 13:51, finalizing windows 10:00 and 11:00; its
        # own window 14:00 stays OPEN and must be withheld in append
        # mode.
        write_file("f3.parquet", [
            (3, "2024-01-01 14:00:00", 3, "click", 0.0, "{}"),
            (104, "2024-01-01 14:01:00", 3, "purchase", 5.0, "{}"),
        ])
        return src

    def _chained(self, spark, src):
        from graphdatabases_spark.streaming.windows import attribution_join

        ev = read_events_stream(spark, str(src), max_files_per_trigger=1)
        pairs = attribution_join(
            ev.filter(F.col("event_type") == "click"),
            ev.filter(F.col("event_type") == "purchase"),
            max_gap="30 minutes",
            watermark="10 minutes",
        )
        return (
            pairs.groupBy(F.window("purchase_ts", "1 hour").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum("purchase_value").alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                "n_pairs",
                "total_value",
            )
        )

    def test_join_feeding_windowed_agg_replay_equals_batch(
        self, spark, tmp_path
    ):
        src = self._stage(spark, tmp_path)
        got = run_stream_to_memory(
            self._chained(spark, src), "t_chain_agg", "append"
        )
        emitted = {
            str(r["window_start"]): (r["n_pairs"], r["total_value"])
            for r in got.collect()
        }

        # Batch oracle: the same range join + hourly rollup, restricted
        # to windows the final propagated watermark can finalize.
        ev = spark.read.parquet(str(src))
        c = ev.filter(F.col("event_type") == "click").alias("c")
        p = ev.filter(F.col("event_type") == "purchase").alias("p")
        batch = (
            c.join(
                p,
                F.expr(
                    "c.user_id = p.user_id AND p.ts >= c.ts "
                    "AND p.ts <= c.ts + interval 30 minutes"
                ),
            )
            .groupBy(F.window(F.col("p.ts"), "1 hour").alias("w"))
            .agg(
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(F.col("p.value")).alias("total_value"),
            )
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "n_pairs",
                "total_value",
            )
        )
        # Same finalization rule as the catalog oracle for
        # events_stream_attrib_hourly: window_end < wm - max_gap
        # STRICTLY (wm = min input max ts - 10 min = 13:50, max_gap
        # 30 min, threshold 13:20) — the boundary itself is pinned by
        # test_finalization_boundary_wm_minus_gap below.
        final_wm = "2024-01-01 13:50:00"  # min(max c.ts, max p.ts) - 10 min
        expect = {
            str(r["window_start"]): (r["n_pairs"], r["total_value"])
            for r in batch.filter(
                F.col("window_end")
                < F.lit(final_wm).cast("timestamp")
                - F.expr("interval 30 minutes")
            ).collect()
        }
        # The finalized prefix equals the batch rollup EXACTLY — pair
        # 101 (batch 1) and pair 102 (batch 2) merged into one window
        # row, so both the join's buffered click AND the agg's open
        # window crossed micro-batch boundaries.
        assert emitted == expect
        assert emitted == {
            "2024-01-01 10:00:00": (2, 30.0),
            "2024-01-01 11:00:00": (1, 40.0),
        }
        # The open window (14:00, holding the watermark-advancing pair)
        # is withheld in append mode — finalization, not truncation:
        # the batch rollup WITHOUT the watermark filter has it.
        assert "2024-01-01 14:00:00" not in emitted
        assert {str(r["window_start"]) for r in batch.collect()} == set(
            emitted
        ) | {"2024-01-01 14:00:00"}

    @pytest.mark.parametrize(
        "tag,probe_ts,expect_emitted",
        [
            # wm = 11:40 - 10 min = 11:30; wm - max_gap == 11:00 lands
            # EXACTLY on the window end → withheld (strict <).
            ("at", "2024-01-01 11:40:00", False),
            # one minute later: wm - max_gap = 11:01 > 11:00 → emitted.
            ("past", "2024-01-01 11:41:00", True),
        ],
    )
    def test_finalization_boundary_wm_minus_gap(
        self, spark, tmp_path, tag, probe_ts, expect_emitted
    ):
        """Boundary probes for the composition's finalization rule —
        the rule the catalog oracle for events_stream_attrib_hourly
        encodes (window_end < global_wm - max_gap STRICTLY, the join
        delaying the agg's watermark by the gap). The sibling replay
        test's windows sit far from the boundary and pass under both
        <= wm and < wm - gap; these two probes sit ON it."""
        src = tmp_path / f"chain_bnd_{tag}"
        src.mkdir()
        self._write_file(spark, tmp_path, src, "f1.parquet", [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
            (101, "2024-01-01 10:10:00", 1, "purchase", 10.0, "{}"),
        ])
        # The probe pair advances BOTH filtered inputs' max event time
        # to probe_ts (global wm = min over inputs = probe_ts - 10 min);
        # its own window stays open and is never emitted here.
        self._write_file(spark, tmp_path, src, "f2.parquet", [
            (2, probe_ts, 9, "click", 0.0, "{}"),
            (102, probe_ts, 9, "purchase", 1.0, "{}"),
        ])
        got = run_stream_to_memory(
            self._chained(spark, src), f"t_chain_bnd_{tag}", "append"
        )
        emitted = {str(r["window_start"]) for r in got.collect()}
        if expect_emitted:
            assert emitted == {"2024-01-01 10:00:00"}
        else:
            assert emitted == set()


class TestChainedDedupWindow:
    def test_bounded_dedup_feeding_windowed_agg(self, spark, tmp_path):
        """Second multi-stateful pair (the chained matrix's dedup axis):
        dropDuplicatesWithinWatermark FEEDING a tumbling count in one
        query. A duplicate event_id arriving in a LATER micro-batch with
        a DIFFERENT timestamp (within the delay) must be suppressed
        before the window agg sees it — the window holds the
        first-occurrence count, not the multiset's."""
        import glob
        import shutil

        from graphdatabases_spark.streaming.windows import (
            streaming_dedup_bounded,
        )

        src = tmp_path / "ddw_src"
        src.mkdir()

        def write_file(name, rows):
            pdf = pd.DataFrame(
                rows,
                columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
            )
            pdf["ts"] = pd.to_datetime(pdf["ts"])
            sdf = spark.createDataFrame(pdf)
            sdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp_d"))
            part = glob.glob(str(tmp_path / "tmp_d" / "part-*.parquet"))[0]
            shutil.copy(part, str(src / name))

        write_file("f1.parquet", [
            (101, "2024-01-01 10:10:00", 1, "purchase", 10.0, "{}"),
            (102, "2024-01-01 10:20:00", 1, "purchase", 20.0, "{}"),
        ])
        # 101 again, different ts, within the 10-minute delay, across
        # the batch boundary — dedup state must survive the boundary
        # and the agg must never see the copy.
        write_file("f2.parquet", [
            (101, "2024-01-01 10:12:00", 1, "purchase", 10.0, "{}"),
            (103, "2024-01-01 11:10:00", 2, "purchase", 40.0, "{}"),
        ])
        # Advances the watermark far past both windows; its own window
        # stays open and is withheld.
        write_file("f3.parquet", [
            (104, "2024-01-01 14:00:00", 3, "purchase", 5.0, "{}"),
        ])

        ev = read_events_stream(
            spark, str(src), max_files_per_trigger=1
        ).filter(F.col("event_type") == "purchase")
        dd = streaming_dedup_bounded(
            ev, keys=["event_id"], watermark="10 minutes"
        )
        agg = dd.groupBy(F.window("ts", "1 hour").alias("w")).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("tv"),
        )
        got = run_stream_to_memory(agg, "t_dd_window_chain", "append")
        rows = {
            str(r["w"].start): (r["n"], r["tv"]) for r in got.collect()
        }
        assert rows == {
            "2024-01-01 10:00:00": (2, 30.0),  # 101 once + 102, NOT 3/40
            "2024-01-01 11:00:00": (1, 40.0),
        }
        assert "2024-01-01 14:00:00" not in rows  # open window withheld


class TestChainedSessionHourly:
    """Round-12 probe of the session-window → tumbling-aggregate chain
    (builder queue #4). pyspark 4.1.2 status, measured:

    * append mode RUNS (the UnsupportedOperationChecker no longer
      rejects it — new since the round-11 probe) via
      ``F.window(session_struct, "1 hour")``; the session is assigned
      to the hour containing its EXTENT END (probe: session
      [10:50, 11:35) → hour 11:00), finalization is window_end < wm
      strictly;
    * complete and update modes are REJECTED (multi-stateful
      late-rows correctness checker);
    * the availableNow EMISSION SET is batch-schedule-dependent: the
      same fixture emits different finalized prefixes across runs
      (the no-data flush micro-batch is best-effort), so the chain is
      NOT value-hash-stable and stays out of the catalog — recorded
      in COVERAGE.md.

    What IS deterministic, pinned here: every row the chain does emit
    carries values identical to the batch sessionize+rollup for that
    hour, and a window the watermark can never pass is never emitted.
    """

    def _write_file(self, spark, tmp_path, src, name, rows):
        import glob
        import shutil

        pdf = pd.DataFrame(
            rows,
            columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
        )
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        sdf = spark.createDataFrame(pdf)
        sdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "tmp_s"))
        part = glob.glob(str(tmp_path / "tmp_s" / "part-*.parquet"))[0]
        shutil.copy(part, str(src / name))

    def test_append_runs_and_emitted_values_match_batch(
        self, spark, tmp_path
    ):
        src = tmp_path / "sess_chain"
        src.mkdir()
        self._write_file(spark, tmp_path, src, "f1.parquet", [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
            (2, "2024-01-01 10:05:00", 1, "click", 0.0, "{}"),
        ])
        self._write_file(spark, tmp_path, src, "f2.parquet", [
            (3, "2024-01-01 11:50:00", 2, "click", 0.0, "{}"),
        ])
        self._write_file(spark, tmp_path, src, "f3.parquet", [
            (9, "2024-01-01 20:00:00", 9, "click", 0.0, "{}"),
        ])
        ev = read_events_stream(
            spark, str(src), max_files_per_trigger=1
        ).withWatermark("ts", "10 minutes")
        sess = ev.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        ).agg(F.count(F.lit(1)).alias("n"))
        ch = sess.groupBy(F.window(F.col("w"), "1 hour").alias("h")).agg(
            F.sum("n").alias("events"),
            F.count(F.lit(1)).alias("sessions"),
        )
        got = run_stream_to_memory(ch, "t_sess_chain", "append")
        emitted = {
            str(r["h"]["start"]): (r["events"], r["sessions"])
            for r in got.collect()
        }
        # Batch truth: sessions [10:00,10:35)→hour 10, [11:50,12:20)→
        # hour 12, [20:00,20:30)→hour 20 (open forever: wm tops out at
        # 19:50 < 21:00).
        batch = {
            "2024-01-01 10:00:00": (2, 1),
            "2024-01-01 12:00:00": (1, 1),
            "2024-01-01 20:00:00": (1, 1),
        }
        assert "2024-01-01 20:00:00" not in emitted
        for h, v in emitted.items():
            assert batch[h] == v

    def test_complete_and_update_rejected(self, spark, tmp_path):
        src = tmp_path / "sess_chain_rej"
        src.mkdir()
        self._write_file(spark, tmp_path, src, "f1.parquet", [
            (1, "2024-01-01 10:00:00", 1, "click", 0.0, "{}"),
        ])
        for mode in ("complete", "update"):
            ev = read_events_stream(spark, str(src)).withWatermark(
                "ts", "10 minutes"
            )
            sess = ev.groupBy(
                F.session_window("ts", "30 minutes").alias("w"), "user_id"
            ).agg(F.count(F.lit(1)).alias("n"))
            ch = sess.groupBy(
                F.window(F.col("w"), "1 hour").alias("h")
            ).agg(F.sum("n").alias("events"))
            with pytest.raises(Exception):
                run_stream_to_memory(ch, f"t_sess_rej_{mode}", mode)
