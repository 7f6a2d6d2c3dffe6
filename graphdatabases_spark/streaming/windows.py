"""Structured Streaming surface: event-time windows, watermarks, dedup.

The reference is batch-only; this is the north-star streaming extension
(SURVEY §2.2 "Streaming") over the ``events`` fixture (event-time =
``ts``). Every operator is expressed so the SAME expression tree runs in
a batch replay — the oracle strategy (FIXTURES §C): run the stream with
``availableNow`` micro-batches, run the identical batch query, compare
post-watermark output.

Scale notes: windowed aggs shuffle on (window, keys) with map-side
partials; watermark state is bounded by (keys × open windows);
``dropDuplicatesWithinWatermark`` state is bounded by the watermark
horizon. These are the knobs that keep state finite on an unbounded
100 TB/day stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(
    spark: SparkSession,
    path: str,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-based streaming source over parquet events (micro-batch replay)."""
    reader = spark.readStream.schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def tumbling_window_counts(
    events: DataFrame, window: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Tumbling event-time window counts per event_type.

    Works identically on a stream (with watermark-bounded state) and on
    a batch DataFrame (watermark is a no-op in batch — that equivalence
    IS the correctness oracle).
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def sliding_window_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("win_start"),
            "n",
        )
    )


def session_window_stats(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Session windows per user: a session closes after ``gap`` of
    inactivity; end = last event + gap (Spark session_window semantics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("sess_start"),
            F.date_format(F.col("w.end"), "yyyy-MM-dd HH:mm:ss").alias("sess_end"),
            "n",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Drop duplicate event_ids within the watermark horizon — bounded
    state; the batch equivalent keeps the first occurrence per id."""
    return events.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def streaming_dedup_bounded(
    stream: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermark-BOUNDED streaming dedup — the state-eviction contract
    the 100-TB unbounded-feed claim depends on (the catalog's
    ``docs_stream_dedup`` deliberately retains all keys so its
    availableNow replay equals the batch oracle; this is the form a
    forever-running feed deploys).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until
    the watermark passes ``first_seen_ts + delay``: duplicates arriving
    within the delay of the first occurrence are suppressed; a
    duplicate arriving AFTER its key's state was evicted is re-admitted
    as a fresh row.  That trade — bounded state for exactly-once-per-
    key — is deliberate and testable
    (tests/test_streaming.py::TestBoundedDedupEviction pins both the
    suppression and the re-admission sides).  Unlike
    ``dropDuplicates(keys + [ts])``, the event-time column is NOT part
    of the key, so a duplicate with a different timestamp still dedups.
    """
    return stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        keys
    )


def enrich_with_dimension(
    stream: DataFrame,
    dim: DataFrame,
    on: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment join — the training-data-pipeline shape
    (attach user/document/source attributes to an event stream).

    The static side is re-planned per micro-batch (so a dim-table
    refresh is picked up) and broadcast when small; no watermark is
    needed because the static side never grows state. Only the stream
    side may drive rows (inner/left), which keeps the join stateless —
    right/full would need the unmatched static rows to wait for stream
    end, which never comes.
    """
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"stream-static join must be stream-driven (inner/left/semi/anti), got {how!r}"
        )
    return stream.join(F.broadcast(dim), on, how)


def attribution_join(
    clicks: DataFrame,
    purchases: DataFrame,
    max_gap: str = "30 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """STREAM-STREAM join: purchases attributed to any preceding
    click by the same user within ``max_gap`` — the online attribution
    operator (the batch as-of/range join's streaming sibling).

    Both sides carry watermarks and the join condition bounds event
    time on both ends, so each side's buffered state is evicted once
    the other side's watermark passes ``ts + max_gap`` — the
    requirement that keeps stream-stream join state finite on an
    unbounded stream. Inner join in append mode: every matched pair
    emits exactly once regardless of micro-batching (late rows beyond
    the watermark would drop; the catalog replay runs availableNow
    with all files in ONE batch, so the batch oracle equality is
    exact).

    ``how='left_outer'`` additionally emits each UNCONVERTED click
    once, with null purchase columns — but only when the engine can
    PROVE no match can still arrive: the click's state is evicted and
    null-emitted when the global watermark (min over both inputs of
    max-seen event time, minus the watermark delay) passes
    ``click_ts + max_gap``. Clicks newer than that stay buffered and
    emit nothing (measured; pinned in tests/test_streaming.py and in
    the catalog oracle of events_stream_attrib_outer).

    ``how='full_outer'`` ALSO emits each ORPHAN purchase (no click in
    the preceding ``max_gap``) once, with null click columns, under
    the symmetric proof: the join constraint ``p.ts >= c.ts`` means a
    future click (ts above the global watermark) could still match
    any purchase with ``purchase_ts >= watermark``, so a purchase's
    state is evicted and null-emitted only when the global watermark
    passes ``purchase_ts`` itself — no ``+ max_gap`` offset on this
    side (measured; pinned in the events_stream_attrib_full oracle).
    ``user_id`` is coalesced across sides so both null shapes roll up.
    """
    c = clicks.withWatermark("ts", watermark).alias("c")
    p = purchases.withWatermark("ts", watermark).alias("p")
    uid = (
        F.coalesce(F.col("c.user_id"), F.col("p.user_id"))
        if how == "full_outer"
        else F.col("c.user_id")
    )
    return c.join(
        p,
        F.expr(
            "c.user_id = p.user_id AND "
            "p.ts >= c.ts AND "
            f"p.ts <= c.ts + interval {max_gap}"
        ),
        how,
    ).select(
        uid.alias("user_id"),
        F.col("c.event_id").alias("click_id"),
        F.col("c.ts").alias("click_ts"),
        F.col("p.event_id").alias("purchase_id"),
        F.col("p.ts").alias("purchase_ts"),
        F.col("p.value").alias("purchase_value"),
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "append"
) -> DataFrame:
    """Execute a streaming query to completion (availableNow) into an
    in-memory table; returns the materialized result as a DataFrame."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(query_name)


def run_stream_checkpointed(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """Run a streaming query to completion (availableNow) with a durable
    checkpoint, appending every micro-batch's output to ``out_dir``
    parquet via foreachBatch (the sink shape that supports any output
    mode).

    The fault-tolerance contract this enables: a SECOND invocation with
    the same ``checkpoint_dir`` (even from a freshly built, identical
    plan) resumes exactly where the first stopped — consumed source
    files are not reprocessed and keyed operator state (stateful
    aggregations, stream-stream join buffers) is restored from the
    state store, not rebuilt. That recovery path is what breaks first
    in production and is pinned by tests/test_streaming.py's
    TestCheckpointRestart.
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(out_dir)

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_stream_exactly_once(
    stream_df: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
) -> None:
    """``run_stream_checkpointed`` with an EXACTLY-ONCE parquet sink.

    foreachBatch alone is at-least-once: Spark writes the epoch's commit
    marker (``<checkpoint>/commits/<epoch>``) only AFTER the sink
    returns, so a crash between the two replays the same batch_id on
    restart — and a plain append sink then duplicates every row of that
    batch. Exactly-once needs the sink itself to be idempotent per
    batch_id (Structured Streaming's documented contract for custom
    sinks); here each micro-batch owns the Hive-style partition
    directory ``batch_id=<id>`` under ``out_dir``:

    - ``mode("overwrite")`` scoped to that directory makes a replayed
      write self-healing (a torn first attempt is clobbered, never
      appended to), and
    - a ``_COMMITTED`` marker written after the parquet commit lets a
      replay skip the rewrite entirely and doubles as the consumer
      contract (a dir without the marker is in-flight garbage).

    After the query TERMINATES cleanly, ``spark.read.parquet(out_dir)``
    is safe (``batch_id`` surfaces as a partition column) — every dir
    is then committed.  While the query runs (or after a crash), a
    naive recursive read can hit a torn in-flight part-file or see
    uncommitted rows; concurrent/post-crash readers must use
    ``read_committed_stream_output``, which scans ONLY ``batch_id=``
    dirs carrying the ``_COMMITTED`` marker (ADVICE r5).  The replay
    path (kill after sink success but before the epoch commit, restart,
    same batch_id re-delivered with identical offsets) is pinned by
    tests/test_streaming.py::TestExactlyOnceSink, alongside a contrast
    test showing the plain append sink really does duplicate under the
    same fault. The marker
    check/write runs driver-side (foreachBatch bodies execute on the
    driver; only the parquet write itself is distributed), so plain
    file I/O is correct wherever the driver can reach ``out_dir`` — on
    an object store, swap the two ``os`` calls for the Hadoop FS client
    bound to the same path.
    """
    import os

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        dest = os.path.join(out_dir, f"batch_id={batch_id}")
        marker = os.path.join(dest, "_COMMITTED")
        if os.path.exists(marker):
            return  # replayed epoch: first attempt fully committed
        batch_df.write.mode("overwrite").parquet(dest)
        with open(marker, "w") as fh:
            fh.write("")

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_committed_stream_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read an exactly-once sink's output safely DURING the query or
    after a crash: only ``batch_id=<id>`` directories carrying the
    ``_COMMITTED`` marker are scanned, so torn in-flight part-files and
    uncommitted rows are invisible (the consumer half of
    ``run_stream_exactly_once``'s contract).

    ``basePath`` keeps ``batch_id`` as a partition column, so the frame
    is schema-identical to a naive post-termination read.  Raises
    ``FileNotFoundError`` when no epoch has committed yet — callers
    distinguish "no output yet" from "empty output" explicitly.
    """
    import os

    committed = sorted(
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("batch_id=")
        and os.path.exists(os.path.join(out_dir, d, "_COMMITTED"))
    )
    if not committed:
        raise FileNotFoundError(
            f"no committed batch_id= directories under {out_dir!r}"
        )
    return spark.read.option("basePath", out_dir).parquet(*committed)


def write_stream_foreach_batch(stream_df: DataFrame, out_dir: str) -> None:
    """foreachBatch parquet sink: per-micro-batch custom write — the
    pattern for idempotent upserts / multi-sink fan-out at scale."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            out_dir
        )

    q = (
        stream_df.writeStream.foreachBatch(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_rate_stream(
    spark: SparkSession, rows_per_second: int = 100, partitions: int | None = None
) -> DataFrame:
    """Built-in rate source shaped like the ``events`` schema — a
    self-contained generator for soak/latency testing when no file
    stream exists (SURVEY §2.2 'rate/file streaming source'). Emits
    (event_id, ts, user_id, event_type, value, props)."""
    reader = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    )
    if partitions is not None:
        reader = reader.option("numPartitions", partitions)
    raw = reader.load()  # (timestamp, value)
    return raw.select(
        F.col("value").alias("event_id"),
        F.col("timestamp").alias("ts"),
        (F.col("value") % 97).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("value") % 3 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("value") % 1000 / 10.0).alias("value"),
        F.to_json(F.struct(F.col("value").alias("seq"))).alias("props"),
    )
