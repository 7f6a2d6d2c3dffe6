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
    mins = [stats[f"mn_{c}"] for c in cols]
    maxs = [stats[f"mx_{c}"] for c in cols]
    z = _morton_expr(cols, bits, mins, maxs)
    k = len(cols)
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
    # Layout sidecar: the quantization bounds ARE the layout — an
    # incremental maintenance pass must tile NEW batches with the
    # ORIGINAL bounds or every tile id shifts (the Delta/Iceberg
    # analogue is clustering metadata in the table log). Underscore
    # prefix keeps it invisible to parquet readers, like _SUCCESS.
    _write_sidecar(
        df.sparkSession,
        f"{path}/{ZORDER_SIDECAR}",
        {
            "cols": list(cols),
            "bits": bits,
            "num_files": num_files,
            "mins": mins,
            "maxs": maxs,
        },
    )


ZORDER_SIDECAR = "_zorder_layout.json"


def _morton_expr(cols: list[str], bits: int, mins: list, maxs: list):
    """Morton key expression from SAVED quantization bounds (values
    outside [mn, mx] clamp to the boundary tiles)."""
    top = (1 << bits) - 1
    k = len(cols)
    z = F.lit(0).cast("long")
    for i, c in enumerate(cols):
        mn, mx = mins[i], maxs[i]
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
    return z


def _write_sidecar(spark, path: str, payload: dict) -> None:
    import json

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    try:
        out.write(bytearray(json.dumps(payload).encode("utf-8")))
    finally:
        out.close()


def _read_sidecar(spark, path: str) -> dict:
    import json

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        raise FileNotFoundError(
            f"{path}: no Z-order layout sidecar — the table was not "
            "written by write_zordered"
        )
    stream = fs.open(p)
    try:
        # py4j passes byte[] buffers by value, so a read-into-buffer
        # loop mutates a JVM copy; commons-io (on Spark's classpath)
        # drains the stream JVM-side and returns the string whole.
        text = jvm.org.apache.commons.io.IOUtils.toString(
            stream, "UTF-8"
        )
    finally:
        stream.close()
    return json.loads(text)


def _tile_rects(cols: list[str], bits: int, fbits: int) -> list[dict]:
    """Per-tile hyper-rectangles in QUANTIZED space.

    Tile id = the Morton key's top ``fbits`` bits. Morton bit position
    p = j*k + i (column i's bit j), so each tile bit fixes one high
    bit of one column; the tile's rectangle per column is
    [base, base | free_mask] where base carries the fixed bits and
    free_mask the remaining lower bits.
    """
    k = len(cols)
    rects = []
    for t in range(1 << fbits):
        base = [0] * k
        fixed_mask = [0] * k
        for b in range(fbits):  # b indexes tile bits, LSB first
            p = bits * k - fbits + b
            i, j = p % k, p // k
            fixed_mask[i] |= 1 << j
            if (t >> b) & 1:
                base[i] |= 1 << j
        top = (1 << bits) - 1
        rects.append(
            {
                "tile": t,
                "lo": base,
                "hi": [base[i] | (top & ~fixed_mask[i]) for i in range(k)],
            }
        )
    return rects


def compact_zordered_incremental(
    spark,
    path: str,
    batch: DataFrame,
) -> dict:
    """Fold a new batch into a Z-order-clustered table, re-clustering
    ONLY the files whose curve tiles the batch touches — the
    continuous-ingest maintenance loop (Delta/Iceberg OPTIMIZE ZORDER
    restricted to affected files, the only affordable form at 100 TB
    where a full rewrite of the table per batch is out of the
    question).

    Mechanics: (1) the layout sidecar restores the ORIGINAL
    quantization bounds (re-deriving them from old∪batch would shift
    every tile id and force a full rewrite; out-of-range batch values
    clamp into the boundary tiles); (2) the batch's touched tile set
    is one small distinct over the batch; (3) each existing file's
    parquet-footer min/max rectangle is intersected with the tile
    rectangles — a FOOTER-ONLY read, the manifest scan, no data read
    for untouched files. Because the writer aligns file boundaries to
    tiles, the rectangle-overlap test is conservative: it may rewrite
    a neighboring file, never miss an affected one; (4) affected files
    ∪ batch re-cluster through the same tile-aligned range shuffle and
    land as new part files; old affected files are deleted and kept
    files are NOT rewritten (byte-identical — pinned in
    tests/test_sources.py).

    Returns {"files_total", "files_rewritten", "files_kept",
    "tiles_touched", "rows_added"}.
    """
    import posixpath
    import uuid

    layout = _read_sidecar(spark, f"{path}/{ZORDER_SIDECAR}")
    cols, bits = layout["cols"], layout["bits"]
    mins, maxs = layout["mins"], layout["maxs"]
    num_files = layout["num_files"]
    k = len(cols)
    fbits = max(int(num_files).bit_length() - 1, 0)
    z = _morton_expr(cols, bits, mins, maxs)
    tile_of = F.shiftright(z, bits * k - fbits)

    batch_tiles = sorted(
        r[0]
        for r in batch.select(tile_of.alias("_tile")).distinct().collect()
    )
    top = (1 << bits) - 1

    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(conf)
    part_files = [
        str(st.getPath())
        for st in fs.listStatus(root)
        if st.getPath().getName().startswith("part-")
    ]

    # Footer-only affected-file selection.
    import pyarrow.parquet as pq

    rects = [r for r in _tile_rects(cols, bits, fbits) if r["tile"] in set(batch_tiles)]

    def quantize(v: float, i: int) -> int:
        mn, mx = mins[i], maxs[i]
        rng = (mx - mn) if (mx is not None and mn is not None and mx > mn) else 1.0
        q = int(((v if v is not None else (mn or 0.0)) - (mn or 0.0)) * (top / rng))
        return min(max(q, 0), top)

    def _footer_rect(f: str) -> tuple[list[int], list[int]] | None:
        """Quantized (lo, hi) rect of one part file from its footer
        row-group min/max stats; None = UNKNOWN (non-local scheme or a
        clustering column without min/max stats), which the selection
        below treats as affected — conservative: the file is rewritten,
        never wrongly skipped.  Footers are read via pyarrow on local
        paths; object-store schemes (s3://, hdfs://) have no local path
        for pyarrow's default filesystem, so they fall through to the
        conservative rewrite rather than crashing the sweep."""
        if f.startswith("file:"):
            local = f[len("file:"):]
        elif "://" not in f:
            local = f
        else:
            return None
        try:
            md = pq.ParquetFile(local).metadata
        except Exception:
            return None
        names = [md.schema.column(ci).name for ci in range(md.num_columns)]
        rect_lo: list[int] = []
        rect_hi: list[int] = []
        for c in cols:
            ci = names.index(c)
            st = [
                md.row_group(rg).column(ci).statistics
                for rg in range(md.num_row_groups)
            ]
            if not st or any(s is None or not s.has_min_max for s in st):
                return None
            rect_lo.append(quantize(min(s.min for s in st), len(rect_lo)))
            rect_hi.append(quantize(max(s.max for s in st), len(rect_hi)))
        return rect_lo, rect_hi

    affected, kept = [], []
    for f in part_files:
        rect = _footer_rect(f)
        if rect is None:
            affected.append(f)
            continue
        rect_lo, rect_hi = rect
        hit = any(
            all(
                rect_lo[i] <= r["hi"][i] and r["lo"][i] <= rect_hi[i]
                for i in range(k)
            )
            for r in rects
        )
        (affected if hit else kept).append(f)

    rows_added = batch.count()
    if affected or rows_added:
        to_cluster = batch.select(*spark.read.parquet(path).columns)
        if affected:
            to_cluster = spark.read.parquet(*affected).unionByName(to_cluster)
        tmp = posixpath.join(path, f"_compact_tmp_{uuid.uuid4().hex}")
        n_out = max(len(batch_tiles) + len(affected), 1)
        (
            to_cluster.withColumn("_zorder", z)
            .withColumn("_zfile", F.shiftright(F.col("_zorder"), bits * k - fbits))
            .repartitionByRange(n_out, "_zfile")
            .sortWithinPartitions("_zfile", "_zorder")
            .drop("_zorder", "_zfile")
            .write.mode("overwrite")
            .parquet(tmp)
        )
        # Swap: new part files in (write-UUID names are collision-free),
        # old affected files out, tmp dir gone.
        tmp_path = jvm.org.apache.hadoop.fs.Path(tmp)
        for st in fs.listStatus(tmp_path):
            name = st.getPath().getName()
            if name.startswith("part-"):
                fs.rename(
                    st.getPath(),
                    jvm.org.apache.hadoop.fs.Path(posixpath.join(path, name)),
                )
        for f in affected:
            fs.delete(jvm.org.apache.hadoop.fs.Path(f), False)
        fs.delete(tmp_path, True)
    return {
        "files_total": len(part_files),
        "files_rewritten": len(affected),
        "files_kept": len(kept),
        "tiles_touched": len(batch_tiles),
        "rows_added": rows_added,
    }


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


ZORDER_POINTER = "_current"


def _pointer_path(root: str) -> str:
    import posixpath

    return posixpath.join(root, ZORDER_POINTER)


def write_zordered_versioned(
    df: DataFrame,
    root: str,
    cols: list[str],
    *,
    num_files: int = 8,
    bits: int = 16,
) -> str:
    """Create version ``v0`` of a VERSIONED z-ordered table: the layout
    that supports atomic clustering EVOLUTION (``evolve_zordered``)
    under concurrent readers. ``root`` holds immutable version
    directories (``v0``, ``v1``, …) plus a one-line ``_current``
    pointer file; ``read_zordered_current`` resolves the pointer then
    scans only that version. Returns the created version name."""
    import posixpath

    write_zordered(
        df, posixpath.join(root, "v0"), cols, num_files=num_files, bits=bits
    )
    _write_sidecar_text(df.sparkSession, _pointer_path(root), "v0")
    return "v0"


def evolve_zordered(
    spark,
    root: str,
    cols: list[str],
    *,
    num_files: int = 8,
    bits: int = 16,
) -> str:
    """Re-cluster a versioned z-ordered table onto NEW columns/bounds —
    the full-rewrite path of the layout maintenance loop (the
    incremental compactor handles same-layout batches; this handles
    layout CHANGES: new clustering columns, new quantization bounds
    after drift, new file budget).

    The new version directory is written COMPLETELY (data + its own
    ``_zorder_layout.json`` sidecar) before one atomic pointer rename
    flips ``_current`` — a concurrent reader resolving the pointer
    therefore sees entirely the old version or entirely the new one,
    never a mix (pinned under a racing reader thread in
    tests/test_sources.py). Old versions stay on disk for in-flight
    readers; a retention sweep can drop them once no reader can hold
    the old pointer (the Delta/Iceberg VACUUM analogue).

    Returns the new version name.
    """
    import posixpath

    current = _read_sidecar_text(spark, _pointer_path(root)).strip()
    nxt = f"v{int(current[1:]) + 1}"
    df = spark.read.parquet(posixpath.join(root, current))
    write_zordered(
        df, posixpath.join(root, nxt), cols, num_files=num_files, bits=bits
    )
    _write_sidecar_text(spark, _pointer_path(root), nxt)
    return nxt


def read_zordered_current(spark, root: str) -> DataFrame:
    """Resolve ``_current`` and scan exactly that version directory."""
    import posixpath

    v = _read_sidecar_text(spark, _pointer_path(root)).strip()
    return spark.read.parquet(posixpath.join(root, v))


def _write_sidecar_text(spark, path: str, text: str) -> None:
    """Atomic small-file publish: write ``path.tmp`` fully, then rename
    over ``path`` — rename is atomic on POSIX and HDFS, so a reader
    sees the old pointer or the new one, never a torn write."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    tmp = jvm.org.apache.hadoop.fs.Path(path + ".tmp")
    dst = jvm.org.apache.hadoop.fs.Path(path)
    fs = dst.getFileSystem(conf)
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(text.encode("utf-8")))
    finally:
        out.close()
    if fs.exists(dst):
        fs.delete(dst, False)
    fs.rename(tmp, dst)


def _read_sidecar_text(spark, path: str) -> str:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        raise FileNotFoundError(f"{path}: no version pointer — not a "
                                "versioned z-ordered table")
    stream = fs.open(p)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def vacuum_zordered(spark, root: str, *, keep: int = 2) -> list[str]:
    """Retention sweep for a VERSIONED z-ordered table: drop all but
    the newest ``keep`` version directories — the VACUUM analogue that
    bounds storage under continuous ``evolve_zordered`` churn.

    The pointer's CURRENT version is never dropped regardless of
    ``keep`` (clamped to >= 1), and versions newer than the pointer
    (a concurrent evolution mid-publish) are also retained — the sweep
    only removes versions strictly older than the retention window, so
    a reader that resolved the pointer before the sweep can still be
    scanning at most ``keep - 1`` versions back. The caller chooses
    ``keep`` to cover its longest in-flight read (the same grace
    contract Delta's VACUUM retention hours express).

    Returns the removed version names (sorted).
    """
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    rootp = jvm.org.apache.hadoop.fs.Path(root)
    fs = rootp.getFileSystem(conf)
    current = _read_sidecar_text(spark, _pointer_path(root)).strip()
    cur_n = int(current[1:])
    keep = max(1, keep)
    # Strict v<digits> match: a sibling directory that merely starts
    # with "v" ("versions/", "v_old", a crashed evolve's "v3.bak") must
    # be SKIPPED, not int()-parsed — one stray name would otherwise
    # abort the whole retention sweep with ValueError.
    import re as _re

    versions = sorted(
        int(st.getPath().getName()[1:])
        for st in fs.listStatus(rootp)
        if st.isDirectory() and _re.fullmatch(r"v\d+", st.getPath().getName())
    )
    cutoff = cur_n - keep + 1
    removed = []
    for v in versions:
        if v < cutoff and v != cur_n:
            fs.delete(
                jvm.org.apache.hadoop.fs.Path(f"{root}/v{v}"), True
            )
            removed.append(f"v{v}")
    return removed


def overwrite_partitions(
    df: DataFrame, path: str, partition_by: list[str]
) -> None:
    """DYNAMIC partition overwrite: replace ONLY the partitions present
    in ``df``, leaving every other partition's files untouched — the
    idempotent-backfill primitive (re-running one day's pipeline must
    never clobber the rest of the table). Spark's default ("static")
    overwrite would truncate the whole table first; the dynamic mode is
    scoped to this write and restored afterwards.

    Byte-level no-touch of sibling partitions is pinned in
    tests/test_sources.py::TestDynamicPartitionOverwrite.
    """
    spark = df.sparkSession
    key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(key, None)
    spark.conf.set(key, "dynamic")
    try:
        df.write.mode("overwrite").partitionBy(*partition_by).parquet(path)
    finally:
        if prev is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, prev)
