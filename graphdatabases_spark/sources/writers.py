"""Sinks: parquet (partitioned/bucketed), CSV, JSON lines.

The write side of SURVEY §2.2. Layout policy is the scale lever here:
``write_parquet`` exposes ``partition_by`` (partition pruning for
low-cardinality keys like date/region) and ``write_bucketed`` exposes
bucketing (shuffle-free joins on high-cardinality keys like edge
``src`` — the §4.3.2 edge-layout strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_parquet(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    *,
    buckets: int,
    bucket_by: list[str],
    sort_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: co-locates rows by hash(bucket_by) so
    equi-joins/aggs on those keys skip the shuffle. Bucketing requires
    ``saveAsTable`` (the metastore records the layout)."""
    w = df.write.mode(mode).bucketBy(buckets, *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    w.format("parquet").saveAsTable(table)


def write_csv(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    header: bool = True,
    sep: str = ",",
    single_file: bool = False,
) -> None:
    """CSV sink (O13's tabular results). ``single_file`` coalesces to
    one partition — only for small result sets (it serializes the
    write); large extracts keep one file per partition."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", header).option("sep", sep).csv(path)


def write_jsonl(df: DataFrame, path: str, *, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_orc(
    df: DataFrame,
    path: str,
    *,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """ORC sink with the same partition-pruning lever as parquet."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.orc(path)


def write_range_sorted(
    df: DataFrame,
    path: str,
    sort_by: list[str],
    *,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered sorted parquet: repartitionByRange + sort within
    partitions, so each output file covers a disjoint key range and every
    row group carries tight min/max statistics. Selective scans on the
    sort key then skip whole files/row groups (zone-map pruning) — the
    layout lever for time-series and id-range queries at 100 TB, where
    partitionBy would create too many directories."""
    parted = (
        df.repartitionByRange(num_files, *sort_by)
        if num_files
        else df.repartitionByRange(*sort_by)
    )
    parted.sortWithinPartitions(*sort_by).write.mode(mode).parquet(path)


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    *,
    num_files: int = 8,
    bits: int = 16,
    mode: str = "overwrite",
) -> None:
    """Z-order (Morton-curve) clustered parquet: multi-column locality
    in ONE file layout.

    ``write_range_sorted`` gives tight zone maps on its leading sort
    key only — a filter on the second column still touches every file.
    Z-ordering interleaves the bits of each column's ``bits``-bit
    quantized value (computed from a one-pass min/max, nulls low), so
    files cover compact HYPER-RECTANGLES of the key space and min/max
    footer stats prune scans filtered on ANY of the clustered columns —
    the standard lakehouse layout for two-to-four-dimension selective
    access at 100 TB (the same trick Delta/Iceberg OPTIMIZE ZORDER
    applies; here it is ~20 lines of JVM-side bit arithmetic).

    Cost: one extra aggregate pass for the per-column min/max (a 1-row
    collect) plus the range shuffle the sorted layout needs anyway.
    The Morton key is a derived column dropped before write; data bytes
    are unchanged (row-count/value equality is pinned in tests).

    File boundaries are ALIGNED to curve tiles: the range partitioning
    key is ONLY the Morton key's top floor(log2(num_files)) bits (the
    tile id, a discrete column with ~num_files distinct values) — the
    sampler's bounds then land exactly ON tile values and a file never
    straddles a major curve boundary. Range-partitioning the raw
    Morton key instead puts sampled bounds mid-tile, and one
    straddling file unions opposite regions of the space (the z = 1/2
    boundary flips every dimension's high bit), destroying exactly the
    locality the layout exists for — measured: mid-key bounds left
    per-file spans at ~the full range on every dimension. Use a
    power-of-two ``num_files`` for exact tile:file alignment; a skewed
    tile yields a bigger file, never a misaligned one.
    """
    if len(cols) < 2:
        raise ValueError("write_zordered needs >= 2 columns (else use "
                         "write_range_sorted)")
    if bits * len(cols) > 63:
        raise ValueError(f"bits={bits} x {len(cols)} cols exceeds a "
                         "63-bit Morton key")
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"mn_{c}") for c in cols],
        *[F.max(c).cast("double").alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    top = (1 << bits) - 1
    k = len(cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        rng = (mx - mn) if (mx is not None and mn is not None and mx > mn) else 1.0
        q = F.floor(
            (F.coalesce(F.col(c).cast("double"), F.lit(mn or 0.0)) - F.lit(mn or 0.0))
            * (float(top) / rng)
        ).cast("long")
        q = F.least(F.greatest(q, F.lit(0)), F.lit(top))  # clamp fp edges
        for j in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(q, j).bitwiseAND(F.lit(1)), j * k + i)
            )
    fbits = max(num_files.bit_length() - 1, 0)
    (
        df.withColumn("_zorder", z)
        .withColumn(
            "_zfile", F.shiftright(F.col("_zorder"), bits * k - fbits)
        )
        .repartitionByRange(num_files, "_zfile")
        .sortWithinPartitions("_zfile", "_zorder")
        .drop("_zorder", "_zfile")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    in_path: str,
    out_path: str,
    *,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_by: list[str] | None = None,
) -> int:
    """Compact a small-files parquet directory into ~``target_file_bytes``
    files; returns the file count written.

    The small-files problem is the dominant sink pathology at scale:
    streaming micro-batches and over-parallel writers leave thousands of
    KB-sized files per partition, and every later scan pays open/footer
    overhead per file while the driver's file index bloats. Compaction
    is one narrow job: size the target file count from the directory's
    ACTUAL bytes (Hadoop listing, so it sees exactly what a scan would),
    then rewrite through ``coalesce`` — which merges read-side splits
    WITHOUT a shuffle; only when ``sort_by`` asks for re-clustering does
    it pay a ``repartitionByRange`` exchange instead (same zone-map
    layout as ``write_range_sorted``).

    Parquet re-encodes on write, so compacted bytes usually shrink as
    well (bigger row groups → better dictionary/RLE runs).

    Returns the ACTUAL part-file count written (listed from
    ``out_path`` after the write), which can be below the byte-derived
    target: ``coalesce(n)`` cannot increase partition count, and Spark
    writes no part-file for an empty planned partition (ADVICE r5).
    Raises ``ValueError`` when ``in_path`` resolves to ``out_path`` —
    mode("overwrite") would delete the source under the reader.
    """
    import os

    if os.path.abspath(in_path) == os.path.abspath(out_path):
        raise ValueError(
            f"compact_parquet: in_path == out_path ({in_path!r}) — "
            "overwrite would destroy the source mid-read; compact into "
            "a sibling directory and swap"
        )
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(in_path)
    fs = p.getFileSystem(conf)
    total = fs.getContentSummary(p).getLength()
    n = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(in_path)
    if sort_by:
        (
            df.repartitionByRange(n, *sort_by)
            .sortWithinPartitions(*sort_by)
            .write.mode("overwrite")
            .parquet(out_path)
        )
    else:
        df.coalesce(n).write.mode("overwrite").parquet(out_path)
    out = jvm.org.apache.hadoop.fs.Path(out_path)
    out_fs = out.getFileSystem(conf)
    written = 0
    for status in out_fs.listStatus(out):
        name = status.getPath().getName()
        if name.startswith("part-"):
            written += 1
    return written
