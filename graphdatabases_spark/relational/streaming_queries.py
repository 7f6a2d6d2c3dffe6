"""Batch-equivalent catalog entries for the streaming surface.

Each streaming operator (streaming/windows.py) is declared here as its
batch replay over the ``events`` table, with a DuckDB oracle — the
time_bucket / gaps-and-islands SQL formulations. The stream-vs-batch
equivalence itself (watermarks, micro-batch replay, late-data drop) is
exercised in tests/test_streaming.py, which the SQL oracle cannot see.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphdatabases_spark.relational.catalog import register, stage_derived, table
from graphdatabases_spark.streaming.windows import (
    session_window_stats,
    sliding_window_counts,
    tumbling_window_counts,
)


@register(
    "events_tumbling_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
           event_type,
           count(*) AS n,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    ORDER BY win_start, event_type
    """,
    doc="Tumbling 1-hour event-time windows per event_type — the batch "
    "replay of the streaming windowed agg (same expression tree).",
)
def events_tumbling_hourly(spark: SparkSession, sf: str) -> DataFrame:
    return tumbling_window_counts(table(spark, sf, "events"), "1 hour").orderBy(
        "win_start", "event_type"
    )


@register(
    "events_sliding_10m5m",
    oracle="""
    WITH shifted AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) - (k * INTERVAL '5 minutes') AS win_start
      FROM events, generate_series(0, 1) s(k)
    )
    SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start, count(*) AS n
    FROM shifted
    GROUP BY 1
    ORDER BY win_start
    """,
    doc="Sliding 10-min windows every 5 min (each event in 2 windows) — "
    "oracle enumerates the two shifted buckets per event.",
)
def events_sliding_10m5m(spark: SparkSession, sf: str) -> DataFrame:
    return sliding_window_counts(
        table(spark, sf, "events"), "10 minutes", "5 minutes"
    ).orderBy("win_start")


@register(
    "events_session_windows",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '5 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WHERE user_id < 10
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
           strftime(max(ts) + INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S') AS sess_end,
           count(*) AS n
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, sess_start
    """,
    doc="Session windows (5-min gap) per user — oracle is the classic "
    "gaps-and-islands lag/cumsum formulation; end = last event + gap.",
)
def events_session_windows(spark: SparkSession, sf: str) -> DataFrame:
    ev = table(spark, sf, "events").filter(F.col("user_id") < 10)
    return session_window_stats(ev, "5 minutes").orderBy("user_id", "sess_start")


@register(
    "events_dedup_first",
    oracle="""
    WITH ranked AS (
      SELECT user_id, event_type, ts, event_id,
             row_number() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events WHERE user_id < 20
    )
    SELECT user_id, event_type, event_id AS first_event,
           strftime(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM ranked WHERE rn = 1
    ORDER BY user_id, event_type
    """,
    doc="First-occurrence dedup per (user, event_type) — the batch "
    "equivalent of streaming dropDuplicates state semantics.",
)
def events_dedup_first(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    ev = table(spark, sf, "events").filter(F.col("user_id") < 20)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("event_id").alias("first_event"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("first_ts"),
        )
        .orderBy("user_id", "event_type")
    )


def _stage_table_for_stream(
    spark: SparkSession, sf: str, name: str
) -> tuple[str, str]:
    """Stage a parquet copy of a testdata table for the file-stream
    source (for ``events`` this also normalizes TIMESTAMP(NANOS) to
    microseconds via ``table()``; file-stream sources cannot read a
    bare single-file path the way batch scans can).

    ONE staging dir per (table, source path) — so regenerating the
    source never accumulates orphaned copies in the temp dir; a
    ``_SIG`` marker stores a CONTENT signature of the source — per-file
    (name, size, mtime) — and a mismatch triggers an overwrite
    re-stage, so a regenerated source parquet at the same location
    never silently replays stale data.  Returns (staged_path, tag) —
    the tag (keyed on path + signature) also namespaces each caller's
    memory sink.
    """
    # Parallel write — a coalesce(1) here would funnel the whole stage
    # through one task; downstream consumers re-key anyway, so the file
    # count doesn't affect results.
    return stage_derived(
        sf,
        name,
        "stream",
        lambda out: table(spark, sf, name)
        .write.mode("overwrite")
        .parquet(out),
    )


def _stage_events_micro(spark: SparkSession, sf: str) -> tuple[str, str]:
    """Backward-compatible alias: stage ``events`` (micro-ts copy)."""
    return _stage_table_for_stream(spark, sf, "events")


@register(
    "events_stateful_running_totals",
    oracle="""
    SELECT user_id, count(*) AS n,
           round(sum(value), 6) AS total
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
    doc="Runs the REAL Structured Streaming engine: per-user running "
    "totals in applyInPandasWithState keyed state (availableNow "
    "micro-batch replay, update mode); the final state per user must "
    "equal the batch aggregate — which is exactly the SQL oracle.",
)
def events_stateful_running_totals(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql.window import Window

    from graphdatabases_spark.streaming.stateful import running_user_totals
    from graphdatabases_spark.streaming.windows import read_events_stream

    staged, tag = _stage_events_micro(spark, sf)
    stream = running_user_totals(read_events_stream(spark, staged))
    sink = f"stateful_totals_{tag}"
    (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    updates = spark.table(sink)
    # One update row per user per micro-batch; the final state row is
    # the one with the highest running n.
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc())
    return (
        updates.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("user_id", "n", F.round("total", 6).alias("total"))
        .orderBy("user_id")
    )


@register(
    "events_stream_click_attribution",
    oracle="""
    WITH c AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    pairs AS (
      SELECT p.user_id, p.value
      FROM c JOIN p
        ON p.user_id = c.user_id
       AND p.ts >= c.ts
       AND p.ts <= c.ts + INTERVAL 30 MINUTE
    )
    SELECT user_id,
           count(*) AS n_pairs,
           CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM pairs
    GROUP BY user_id ORDER BY user_id
    """,
    doc="Runs the REAL Structured Streaming engine: STREAM-STREAM inner "
    "join — purchases attributed to preceding same-user clicks within "
    "30 minutes, both sides watermarked so join state is evicted as "
    "event time advances (streaming/windows.py attribution_join). The "
    "availableNow replay processes all files in one batch, so the "
    "emitted pair set must equal the batch range join — the memory "
    "sink is then batch-aggregated per user, which is exactly the SQL "
    "oracle.",
)
def events_stream_click_attribution(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.streaming.windows import (
        attribution_join,
        read_events_stream,
    )

    staged, tag = _stage_events_micro(spark, sf)
    clicks = read_events_stream(spark, staged).filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, staged).filter(
        F.col("event_type") == "purchase"
    )
    pairs = attribution_join(clicks, purchases, max_gap="30 minutes")
    sink = f"stream_attrib_{tag}"
    (
        pairs.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.sum(F.col("purchase_value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_stream_enriched_nation",
    oracle="""
    SELECT coalesce(n.n_name, 'UNKNOWN') AS nation,
           count(*) AS n,
           CAST(round(sum(CAST(e.value AS DECIMAL(18,4))), 2) AS DOUBLE)
             AS total_value
    FROM events e
    LEFT JOIN customer c ON c.c_custkey = e.user_id
    LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY 1 ORDER BY 1
    """,
    doc="Runs the REAL Structured Streaming engine: stream-static "
    "dimension enrichment (events stream ⟕ broadcast customer→nation "
    "dim, stateless — streaming/windows.py enrich_with_dimension) "
    "feeding a complete-mode per-nation aggregate over availableNow "
    "micro-batches; the final table must equal the batch join+agg, "
    "which is exactly the SQL oracle.",
)
def events_stream_enriched_nation(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.streaming.windows import (
        enrich_with_dimension,
        read_events_stream,
    )

    staged, tag = _stage_events_micro(spark, sf)
    dim = (
        table(spark, sf, "customer")
        .join(
            table(spark, sf, "nation"),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left",
        )
        .select(F.col("c_custkey").alias("user_id"), "n_name")
    )
    stream = read_events_stream(spark, staged)
    enriched = enrich_with_dimension(stream, dim, on="user_id", how="left")
    agg = (
        enriched.groupBy(
            F.coalesce("n_name", F.lit("UNKNOWN")).alias("nation")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
    sink = f"stream_enriched_{tag}"
    (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(sink).orderBy("nation")


@register(
    "docs_stream_dedup",
    oracle="""
    WITH fp AS (
      SELECT source,
        md5(array_to_string(list_sort(list_distinct(
          list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),
                      x -> x <> ''))), ' ')) AS fp
      FROM documents
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT fp) AS BIGINT) AS n_kept,
           CAST(count(*) - count(DISTINCT fp) AS BIGINT) AS n_dropped
    FROM fp GROUP BY source ORDER BY source
    """,
    doc="Runs the REAL Structured Streaming engine: exact streaming "
    "dedup — the ingest-time shape that keeps a crawl feed clean "
    "WITHOUT re-scanning the corpus. Documents arrive as a file "
    "stream; dropDuplicates on (source, canonical fingerprint) holds "
    "the seen-key set in keyed state store and emits only first "
    "arrivals (availableNow micro-batch replay, append mode). WHICH "
    "duplicate survives is arrival-order-dependent, so the entry "
    "reports the deterministic quantity: per-source input/kept/"
    "dropped counts, where kept = distinct fingerprints — exactly the "
    "batch SQL oracle. Unbounded streams bound this state with a "
    "watermark on arrival time; the availableNow replay here "
    "deliberately retains all keys so the count contract is exact.",
)
def docs_stream_dedup(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions import text as T

    staged, tag = _stage_table_for_stream(spark, sf, "documents")
    schema = spark.read.parquet(staged).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(staged)
        .withColumn("fp", T.fingerprint(F.col("text")))
        .dropDuplicates(["source", "fp"])
    )
    sink = f"docs_stream_dedup_{tag}"
    (
        stream.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    kept = (
        spark.table(sink)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )
    return (
        table(spark, sf, "documents")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.col("n_docs") - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_dropped"),
        )
        .orderBy("source")
    )


_BD_EPOCHS = 4
_BD_EPOCH_MINUTES = 30
_BD_DELAY_MINUTES = 8
_BD_BASE_EPOCH = 1704067200  # 2024-01-01 00:00:00 UTC


def _stage_docs_epochs(spark: SparkSession, sf: str) -> tuple[str, str]:
    """Arrival-order-PINNED file sequence for the bounded-dedup replay:
    one parquet file per arrival epoch (epoch = doc_id % 4), each
    carrying a constant event ts of base + epoch·10 min, with strictly
    increasing file mtimes so the file-stream source (sorted by mod
    time, maxFilesPerTrigger=1) replays them as four micro-batches in
    epoch order on every run."""

    def write(out: str) -> None:
        import glob
        import os
        import shutil

        os.makedirs(out, exist_ok=True)
        for old in glob.glob(os.path.join(out, "e*.parquet")):
            os.remove(old)
        docs = table(spark, sf, "documents").select("doc_id", "source", "text")
        for e in range(_BD_EPOCHS):
            part = docs.filter(F.col("doc_id") % _BD_EPOCHS == e).withColumn(
                "ts",
                F.timestamp_seconds(
                    F.lit(_BD_BASE_EPOCH + e * _BD_EPOCH_MINUTES * 60)
                ),
            )
            tmp = os.path.join(out, f"_tmp_e{e}")
            part.coalesce(1).write.mode("overwrite").parquet(tmp)
            dst = os.path.join(out, f"e{e}.parquet")
            shutil.move(glob.glob(os.path.join(tmp, "part-*.parquet"))[0], dst)
            shutil.rmtree(tmp)
            os.utime(dst, (_BD_BASE_EPOCH + e, _BD_BASE_EPOCH + e))
        open(os.path.join(out, "_SUCCESS"), "w").close()

    # The epoch spacing is part of the staged CONTENT (it becomes the
    # event ts), so it keys the staging dir — changing it must re-stage.
    return stage_derived(
        sf, "documents", f"bdedup_epochs_{_BD_EPOCH_MINUTES}m", write
    )


@register(
    "docs_stream_dedup_bounded",
    oracle="""
    WITH fp AS (
      SELECT doc_id % 4 AS epoch,
        md5(array_to_string(list_sort(list_distinct(
          list_filter(regexp_split_to_array(lower(trim(text)), '[^a-z0-9]+'),
                      x -> x <> ''))), ' ')) AS fp
      FROM documents
    ),
    keys AS (
      SELECT fp, min(epoch) AS e0,
             max(CASE WHEN epoch = 3 THEN 1 ELSE 0 END) AS in3
      FROM fp GROUP BY fp
    ),
    arr AS (
      SELECT epoch, CAST(count(*) AS BIGINT) AS n_arrivals
      FROM fp GROUP BY epoch
    ),
    adm AS (
      SELECT e0 AS epoch, CAST(count(*) AS BIGINT) AS n_first
      FROM keys GROUP BY e0
    ),
    re AS (
      SELECT CAST(sum(CASE WHEN e0 = 0 AND in3 = 1 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n
      FROM keys
    )
    SELECT CAST(a.epoch AS BIGINT) AS epoch, n_arrivals,
      coalesce(n_first, 0)
        + CASE WHEN a.epoch = 3 THEN re.n ELSE 0 END AS n_admitted,
      n_arrivals - coalesce(n_first, 0)
        - CASE WHEN a.epoch = 3 THEN re.n ELSE 0 END AS n_suppressed,
      CASE WHEN a.epoch = 3 THEN re.n ELSE CAST(0 AS BIGINT) END
        AS n_readmitted
    FROM arr a LEFT JOIN adm ON adm.epoch = a.epoch CROSS JOIN re
    ORDER BY a.epoch
    """,
    doc="Runs the REAL Structured Streaming engine: watermark-BOUNDED "
    "streaming dedup (dropDuplicatesWithinWatermark via "
    "streaming_dedup_bounded, keyed on the global fingerprint) over an "
    "arrival-order-PINNED file sequence — four epoch files (epoch = "
    "doc_id % 4, event ts = base + epoch·30 min), replayed one file "
    "per micro-batch in mtime order under availableNow. With an "
    "8-minute delay the state machine is exactly solvable, which is "
    "what makes the ENGINE's eviction behavior SQL-oracle-checkable. "
    "Measured semantics (probed, then pinned by this differential): "
    "expiry is first-seen + 8 min (duplicates do NOT refresh it), and "
    "state cleanup at the end of batch e uses that batch's OPERATIVE "
    "watermark max_ts(<=e-1) - 8 — i.e. eviction LAGS one batch "
    "behind the freshly computed watermark. Epoch-0 state (expiry +8) "
    "is therefore evicted at the end of batch 2 (operative wm +22) "
    "while epoch-1 state (expiry +38) survives through batch 3 — an "
    "epoch-3 duplicate of an epoch-0 key is the ONLY possible "
    "re-admission (nonzero at every fixture sf, so the pin is not "
    "vacuous; a 10-min epoch spacing yields zero evictions in-run, "
    "which is how the lag was measured). WHICH same-key row survives "
    "inside a batch is engine-arbitrary, so the entry reports the "
    "per-EPOCH deterministic quantities: arrivals, admissions (keys "
    "first seen at e, plus the epoch-3 re-admits), suppressions, "
    "re-admissions — the closed form the oracle computes from the "
    "batch table. The bounded-state trade this pins is the 100-TB "
    "contract: an unbounded feed holds each key for delay-bounded "
    "time, not forever (docs_stream_dedup is the retain-all sibling).",
)
def docs_stream_dedup_bounded(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.functions import text as T
    from graphdatabases_spark.streaming.windows import streaming_dedup_bounded

    staged, tag = _stage_docs_epochs(spark, sf)
    schema = spark.read.parquet(staged).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(staged)
        .withColumn("fp", T.fingerprint(F.col("text")))
    )
    dd = streaming_dedup_bounded(
        stream,
        ["fp"],
        ts_col="ts",
        watermark=f"{_BD_DELAY_MINUTES} minutes",
    )
    sink = f"docs_bdedup_{tag}"
    (
        dd.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    epoch_of = (
        (F.unix_timestamp("ts") - F.lit(_BD_BASE_EPOCH))
        / F.lit(_BD_EPOCH_MINUTES * 60)
    ).cast("long")
    admitted = (
        spark.table(sink)
        .groupBy(epoch_of.alias("epoch"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_admitted"))
    )
    # Re-admissions are the only way one key yields two kept rows, and
    # the second is always the epoch-3 one.
    readmits = (
        spark.table(sink)
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 1)
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    arrivals = (
        spark.read.parquet(staged)
        .groupBy(
            (
                (F.unix_timestamp("ts") - F.lit(_BD_BASE_EPOCH))
                / F.lit(_BD_EPOCH_MINUTES * 60)
            )
            .cast("long")
            .alias("epoch")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_arrivals"))
    )
    re_n = F.when(
        F.col("epoch") == _BD_EPOCHS - 1, F.col("n")
    ).otherwise(F.lit(0))
    return (
        arrivals.join(admitted, "epoch", "left")
        .crossJoin(F.broadcast(readmits))
        .select(
            "epoch",
            "n_arrivals",
            F.coalesce("n_admitted", F.lit(0)).cast("long").alias("n_admitted"),
            (F.col("n_arrivals") - F.coalesce("n_admitted", F.lit(0)))
            .cast("long")
            .alias("n_suppressed"),
            re_n.cast("long").alias("n_readmitted"),
        )
        .orderBy("epoch")
    )


@register(
    "events_stream_sessions",
    oracle="""
    WITH marked AS (
      SELECT user_id, ts,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       > INTERVAL '5 minutes'
                  OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WHERE user_id < 10
    ),
    sess AS (
      SELECT user_id, ts,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM marked
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
           strftime(max(ts) + INTERVAL '5 minutes', '%Y-%m-%d %H:%M:%S') AS sess_end,
           count(*) AS n
    FROM sess
    GROUP BY user_id, sid
    ORDER BY user_id, sess_start
    """,
    doc="Runs the REAL Structured Streaming engine: per-user SESSION "
    "WINDOWS (5-min inactivity gap) built incrementally across "
    "micro-batches — maxFilesPerTrigger=2 forces a multi-batch "
    "availableNow replay, so sessions MERGE across batch boundaries "
    "in the engine's session-window state store (the semantics batch "
    "gaps-and-islands gets for free and a stream must earn); the "
    "final complete-mode emission must equal events_session_windows' "
    "batch oracle exactly. The replay uses an effectively-unbounded "
    "watermark so no out-of-order file is late — complete mode keeps "
    "all session state; the production 100-TB deployment runs "
    "append+watermark instead, trading exact replay equality for "
    "bounded state exactly as docs_stream_dedup_bounded documents "
    "for dedup state.",
)
def events_stream_sessions(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.streaming.windows import (
        read_events_stream,
        session_window_stats,
    )

    staged, tag = _stage_events_micro(spark, sf)
    stream = read_events_stream(spark, staged, max_files_per_trigger=2)
    sess = session_window_stats(
        stream.filter(F.col("user_id") < 10),
        "5 minutes",
        watermark="3650 days",
    )
    sink = f"stream_sessions_{tag}"
    (
        sess.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return spark.table(sink).orderBy("user_id", "sess_start")


@register(
    "events_stream_attrib_outer",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    wm AS (
      SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
             - INTERVAL 10 MINUTE AS w
    ),
    m AS (
      SELECT c.user_id, c.event_id AS click_id, p.value
      FROM c JOIN p
        ON p.user_id = c.user_id
       AND p.ts >= c.ts
       AND p.ts <= c.ts + INTERVAL 30 MINUTE
    ),
    u AS (
      SELECT c.user_id, c.event_id
      FROM c, wm
      WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.event_id)
        AND c.ts + INTERVAL 30 MINUTE < wm.w
    ),
    allrows AS (
      SELECT user_id, 1 AS matched, CAST(value AS DECIMAL(18,4)) AS v FROM m
      UNION ALL
      SELECT user_id, 0, NULL FROM u
    )
    SELECT user_id,
      CAST(sum(matched) AS BIGINT) AS n_matched,
      CAST(sum(1 - matched) AS BIGINT) AS n_unconverted,
      CAST(round(coalesce(sum(CASE WHEN matched = 1 THEN v END), 0), 2)
           AS DOUBLE) AS matched_value
    FROM allrows GROUP BY user_id ORDER BY user_id
    """,
    doc="Runs the REAL Structured Streaming engine: STREAM-STREAM LEFT "
    "OUTER join — the attribution join that ALSO reports unconverted "
    "clicks, the semantics production funnels need. Matched "
    "(click, purchase) pairs emit immediately, exactly like the inner "
    "entry; an UNMATCHED click emits once with null purchase columns "
    "only when the engine can PROVE no match can still arrive — its "
    "state is evicted when the GLOBAL watermark (min over both "
    "inputs' max-seen event time, minus the 10-minute delay) passes "
    "click_ts + the 30-minute gap. Clicks newer than that boundary "
    "stay buffered and emit NOTHING before the query ends — the "
    "oracle encodes the measured rule exactly (unmatched AND "
    "ts + 30min < least(max_click_ts, max_purchase_ts) - 10min), so "
    "this entry pins the state-eviction contract the 100-TB "
    "unbounded-stream claim depends on, the outer-join sibling of "
    "docs_stream_dedup_bounded's eviction pin. Each click emits at "
    "most once (matched XOR null — pinned per-click in "
    "tests/test_streaming.py). The per-user rollup counts matched / "
    "unconverted emissions and DECIMAL-sums matched value.",
)
def events_stream_attrib_outer(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.streaming.windows import (
        attribution_join,
        read_events_stream,
    )

    staged, tag = _stage_events_micro(spark, sf)
    clicks = read_events_stream(spark, staged).filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, staged).filter(
        F.col("event_type") == "purchase"
    )
    pairs = attribution_join(
        clicks, purchases, max_gap="30 minutes", how="left_outer"
    )
    sink = f"stream_attrib_outer_{tag}"
    (
        pairs.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    matched = F.col("purchase_id").isNotNull()
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(matched, 1).otherwise(0))
            .cast("long")
            .alias("n_matched"),
            F.sum(F.when(matched, 0).otherwise(1))
            .cast("long")
            .alias("n_unconverted"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(
                            matched,
                            F.col("purchase_value").cast("decimal(18,4)"),
                        )
                    ),
                    F.lit(0).cast("decimal(18,4)"),
                ),
                2,
            )
            .cast("double")
            .alias("matched_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_stream_attrib_full",
    oracle="""
    WITH c AS (
      SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, event_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ),
    wm AS (
      SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
             - INTERVAL 10 MINUTE AS w
    ),
    m AS (
      SELECT c.user_id, c.event_id AS click_id, p.event_id AS purch_id,
             p.value
      FROM c JOIN p
        ON p.user_id = c.user_id
       AND p.ts >= c.ts
       AND p.ts <= c.ts + INTERVAL 30 MINUTE
    ),
    u AS (
      SELECT c.user_id
      FROM c, wm
      WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.click_id = c.event_id)
        AND c.ts + INTERVAL 30 MINUTE < wm.w
    ),
    o AS (
      SELECT p.user_id
      FROM p, wm
      WHERE NOT EXISTS (SELECT 1 FROM m WHERE m.purch_id = p.event_id)
        AND p.ts < wm.w
    ),
    allrows AS (
      SELECT user_id, 1 AS matched, 0 AS orphan,
             CAST(value AS DECIMAL(18,4)) AS v FROM m
      UNION ALL SELECT user_id, 0, 0, NULL FROM u
      UNION ALL SELECT user_id, 0, 1, NULL FROM o
    )
    SELECT user_id,
      CAST(sum(matched) AS BIGINT) AS n_matched,
      CAST(sum(CASE WHEN matched = 0 AND orphan = 0 THEN 1 ELSE 0 END)
           AS BIGINT) AS n_unconverted,
      CAST(sum(orphan) AS BIGINT) AS n_orphan_purchases,
      CAST(round(coalesce(sum(CASE WHEN matched = 1 THEN v END), 0), 2)
           AS DOUBLE) AS matched_value
    FROM allrows GROUP BY user_id ORDER BY user_id
    """,
    doc="Runs the REAL Structured Streaming engine: STREAM-STREAM FULL "
    "OUTER join — the last join mode in the streaming matrix (inner "
    "pairs, LEFT OUTER unconverted clicks, and now ORPHAN purchases "
    "with no preceding click, the funnel's 'dark conversions' the "
    "production attribution table must also report). Matched pairs "
    "emit immediately; an unmatched click null-emits when the global "
    "watermark passes click_ts + the 30-minute gap (the attrib_outer "
    "rule); an unmatched purchase null-emits under the SYMMETRIC "
    "proof with NO +gap offset — the join constraint p.ts >= c.ts "
    "means a future click above the watermark could still match any "
    "purchase with ts >= watermark, so purchase state is evicted "
    "exactly when the global watermark passes purchase_ts itself. "
    "Both measured rules are encoded literally in the oracle "
    "(u: ts + 30min < wm; o: ts < wm, wm = least(max_c, max_p) − "
    "10min), so this entry pins BOTH sides' state-eviction contracts "
    "— the full bounded-state story for outer stream-stream joins on "
    "an unbounded stream. user_id is coalesced across sides so both "
    "null shapes roll up into one per-user funnel row.",
)
def events_stream_attrib_full(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.streaming.windows import (
        attribution_join,
        read_events_stream,
    )

    staged, tag = _stage_events_micro(spark, sf)
    clicks = read_events_stream(spark, staged).filter(
        F.col("event_type") == "click"
    )
    purchases = read_events_stream(spark, staged).filter(
        F.col("event_type") == "purchase"
    )
    pairs = attribution_join(
        clicks, purchases, max_gap="30 minutes", how="full_outer"
    )
    sink = f"stream_attrib_full_{tag}"
    (
        pairs.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    matched = F.col("purchase_id").isNotNull() & F.col("click_id").isNotNull()
    orphan = F.col("click_id").isNull()
    return (
        spark.table(sink)
        .groupBy("user_id")
        .agg(
            F.sum(F.when(matched, 1).otherwise(0))
            .cast("long")
            .alias("n_matched"),
            F.sum(
                F.when(F.col("purchase_id").isNull(), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_unconverted"),
            F.sum(F.when(orphan, 1).otherwise(0))
            .cast("long")
            .alias("n_orphan_purchases"),
            F.round(
                F.coalesce(
                    F.sum(
                        F.when(
                            matched,
                            F.col("purchase_value").cast("decimal(18,4)"),
                        )
                    ),
                    F.lit(0).cast("decimal(18,4)"),
                ),
                2,
            )
            .cast("double")
            .alias("matched_value"),
        )
        .orderBy("user_id")
    )


@register(
    "events_stream_tumbling_append",
    oracle="""
    WITH p AS (
      SELECT ts, CAST(value AS DECIMAL(18,4)) AS v FROM events
      WHERE event_type = 'purchase'
    ),
    wm AS (SELECT max(ts) - INTERVAL 1 HOUR AS w FROM p),
    agg AS (
      SELECT time_bucket(INTERVAL 6 HOUR, ts) AS win_start,
        CAST(count(*) AS BIGINT) AS n_purchases,
        CAST(round(sum(v), 2) AS DOUBLE) AS total_value
      FROM p GROUP BY win_start
    )
    SELECT win_start, win_start + INTERVAL 6 HOUR AS win_end,
      n_purchases, total_value
    FROM agg, wm
    WHERE win_start + INTERVAL 6 HOUR <= wm.w
    ORDER BY win_start
    """,
    doc="Runs the REAL Structured Streaming engine: APPEND-mode "
    "tumbling aggregation with WATERMARK FINALIZATION — the canonical "
    "streaming-agg semantics (each window emits exactly once, only "
    "after the engine can prove it complete). 6-hour purchase windows "
    "with a 1-hour watermark replayed via availableNow; the engine "
    "emits a window iff window_end <= final watermark (= max event "
    "time - 1 h) — MEASURED at the exact tie: a watermark landing "
    "precisely ON a window end still emits it (controlled probe "
    "pinned in tests/test_streaming.py), so the oracle encodes <=, "
    "not <. The still-open tail window is withheld — the same "
    "lagging-finalization family as docs_stream_dedup_bounded and "
    "events_stream_attrib_outer, completing the matrix: dedup "
    "eviction, outer-join null emission, and now windowed-agg "
    "finalization all pinned against the batch oracle. Value sums "
    "are DECIMAL(18,4) (order-invariant), rounded once at the "
    "decimal level. At 100 TB this entry's shape IS the streaming "
    "warehouse rollup: bounded state (open windows only), "
    "exactly-once emission per window.",
)
def events_stream_tumbling_append(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.streaming.windows import read_events_stream

    staged, tag = _stage_events_micro(spark, sf)
    s = (
        read_events_stream(spark, staged)
        .filter(F.col("event_type") == "purchase")
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "6 hours").alias("w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.round(F.sum(F.col("value").cast("decimal(18,4)")), 2)
            .cast("double")
            .alias("total_value"),
        )
    )
    sink = f"stream_tumb_append_{tag}"
    (
        s.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.table(sink)
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_purchases",
            "total_value",
        )
        .orderBy("win_start")
    )


@register(
    "events_stream_attrib_hourly",
    oracle="""
    WITH c AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT user_id, ts, CAST(value AS DECIMAL(18,4)) AS v FROM events
      WHERE event_type = 'purchase'
    ),
    wm AS (
      SELECT least((SELECT max(ts) FROM c), (SELECT max(ts) FROM p))
             - INTERVAL 10 MINUTE AS w
    ),
    pairs AS (
      SELECT p.ts, p.v
      FROM c JOIN p
        ON p.user_id = c.user_id
       AND p.ts >= c.ts
       AND p.ts <= c.ts + INTERVAL 30 MINUTE
    ),
    agg AS (
      SELECT time_bucket(INTERVAL 1 HOUR, ts) AS win_start,
        CAST(count(*) AS BIGINT) AS n_pairs,
        CAST(round(sum(v), 2) AS DOUBLE) AS total_value
      FROM pairs GROUP BY win_start
    )
    SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end,
      n_pairs, total_value
    FROM agg, wm
    WHERE win_start + INTERVAL 1 HOUR < wm.w - INTERVAL 30 MINUTE
    ORDER BY win_start
    """,
    doc="Runs the REAL Structured Streaming engine: CHAINED "
    "multi-stateful pipeline (Spark 3.5+/SPARK-42376) — the "
    "stream-stream attribution join FEEDING an append-mode hourly "
    "windowed aggregate inside ONE streaming query. Every stateful "
    "operator in the catalog is pinned individually; this entry pins "
    "the COMPOSITION's finalization rule, MEASURED with boundary "
    "probes then encoded: a window emits iff window_end < "
    "global_watermark - max_gap STRICTLY (the join holds click state "
    "up to click_ts + 30 min, so the watermark reaching the "
    "downstream agg is DELAYED by the gap — probes at wm-gap == "
    "window_end withhold, one minute past emits; contrast the plain "
    "single-operator agg of events_stream_tumbling_append, whose tie "
    "EMITS on <=). Global watermark = min over BOTH filtered inputs "
    "of max event time, minus the 10-minute delay. The availableNow "
    "replay processes all staged files in one batch; the emitted "
    "finalized prefix must equal the batch range join + hourly "
    "rollup under that filter, which is exactly the SQL oracle. "
    "Value sums are DECIMAL(18,4) (order-invariant). Cross-batch "
    "state in both operators at once is pinned in "
    "tests/test_streaming.py::TestChainedStatefulOperators. At "
    "100 TB this is the online-attribution warehouse rollup: join "
    "state bounded by the gap, agg state bounded by open windows, "
    "each window emitted exactly once.",
)
def events_stream_attrib_hourly(spark: SparkSession, sf: str) -> DataFrame:
    from graphdatabases_spark.streaming.windows import (
        attribution_join,
        read_events_stream,
    )

    staged, tag = _stage_events_micro(spark, sf)
    pairs = attribution_join(
        read_events_stream(spark, staged).filter(
            F.col("event_type") == "click"
        ),
        read_events_stream(spark, staged).filter(
            F.col("event_type") == "purchase"
        ),
        max_gap="30 minutes",
    )
    s = pairs.groupBy(F.window("purchase_ts", "1 hour").alias("w")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.sum(F.col("purchase_value").cast("decimal(18,4)")), 2)
        .cast("double")
        .alias("total_value"),
    )
    sink = f"stream_attrib_hourly_{tag}"
    (
        s.writeStream.format("memory")
        .queryName(sink)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
    return (
        spark.table(sink)
        .select(
            F.col("w.start").alias("win_start"),
            F.col("w.end").alias("win_end"),
            "n_pairs",
            "total_value",
        )
        .orderBy("win_start")
    )
