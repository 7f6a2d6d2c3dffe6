"""Source/sink round-trips (SURVEY §2.2 scans/sinks)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from graphdatabases_spark.sources import (
    parse_json_column,
    read_csv,
    read_jsonl,
    read_orc,
    read_tsv_edges,
    write_csv,
    write_jsonl,
    write_orc,
    write_parquet,
    write_range_sorted,
)


class TestReaders:
    def test_tsv_edges_with_comments(self, spark, tmp_path):
        p = tmp_path / "edges.tsv"
        p.write_text("# comment line\n1\t2\n2\t3\n# another\n3\t1\n")
        df = read_tsv_edges(spark, str(p))
        assert df.count() == 3
        assert df.schema.simpleString() == "struct<src:bigint,dst:bigint>"

    def test_csv_with_header_and_schema(self, spark, tmp_path):
        p = tmp_path / "t.csv"
        p.write_text("a,b\n1,x\n2,y\n")
        df = read_csv(spark, str(p), "a INT, b STRING", header=True)
        assert [tuple(r) for r in df.orderBy("a").collect()] == [(1, "x"), (2, "y")]

    def test_jsonl_and_json_column(self, spark, tmp_path):
        p = tmp_path / "d.jsonl"
        p.write_text('{"id": 1, "props": "{\\"k\\": \\"v\\"}"}\n{"id": 2, "props": "{\\"k\\": \\"w\\"}"}\n')
        df = read_jsonl(spark, str(p), "id LONG, props STRING")
        parsed = parse_json_column(df, "props", "k STRING", out="p")
        got = {r["id"]: r["p"]["k"] for r in parsed.collect()}
        assert got == {1: "v", 2: "w"}


class TestSchemaEvolutionAndCorruption:
    def test_merge_schema_unions_evolved_columns(self, spark, tmp_path):
        """A table that gained a column mid-life must read as the union
        schema with nulls for pre-evolution files — and WITHOUT
        merge_schema the first-footer schema silently wins (why the
        option exists)."""
        from graphdatabases_spark.sources.readers import read_parquet

        d = str(tmp_path / "evolve")
        spark.range(3).selectExpr("id", "id * 2 AS old_col").write.parquet(d)
        spark.range(3, 6).selectExpr(
            "id", "id * 2 AS old_col", "id * 10 AS new_col"
        ).write.mode("append").parquet(d)

        merged = read_parquet(spark, d, merge_schema=True)
        assert set(merged.columns) == {"id", "old_col", "new_col"}
        rows = {r["id"]: r["new_col"] for r in merged.collect()}
        assert rows[0] is None and rows[5] == 50
        assert merged.count() == 6

    def test_ignore_corrupt_skips_torn_file(self, spark, tmp_path):
        """One torn upload in a directory must not kill the scan when
        ignore_corrupt is on — and must keep failing loudly when off."""
        from graphdatabases_spark.sources.readers import read_parquet

        d = str(tmp_path / "corrupt")
        spark.range(10).coalesce(1).write.parquet(d)
        import glob

        good = glob.glob(f"{d}/part-*.parquet")[0]
        torn = good.replace("part-", "part-torn-")
        with open(torn, "wb") as fh:
            fh.write(open(good, "rb").read()[:50])  # no footer

        with pytest.raises(Exception):
            read_parquet(spark, d).count()
        assert read_parquet(spark, d, ignore_corrupt=True).count() == 10


class TestWriters:
    def test_parquet_partitioned_layout(self, spark, tmp_path):
        out = str(tmp_path / "part")
        df = spark.range(10).withColumn("bucket", (F.col("id") % 2).cast("int"))
        write_parquet(df, out, partition_by=["bucket"])
        # Partition pruning depends on this physical directory layout.
        assert os.path.isdir(f"{out}/bucket=0") and os.path.isdir(f"{out}/bucket=1")
        pruned = spark.read.parquet(out).filter(F.col("bucket") == 1)
        assert pruned.count() == 5
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [isnotnull(bucket" in plan

    def test_csv_single_file(self, spark, tmp_path):
        out = str(tmp_path / "csv")
        write_csv(spark.range(5).selectExpr("id", "id*2 AS dbl"), out, single_file=True)
        files = glob.glob(f"{out}/part-*.csv")
        assert len(files) == 1
        assert open(files[0]).readline().strip() == "id,dbl"

    def test_jsonl_round_trip(self, spark, tmp_path):
        out = str(tmp_path / "jl")
        write_jsonl(spark.range(3).withColumn("s", F.lit("x")), out)
        back = read_jsonl(spark, out, "id LONG, s STRING")
        assert back.count() == 3

    def test_range_sorted_layout_has_disjoint_file_ranges(self, spark, tmp_path):
        """write_range_sorted's zone-map contract, checked at the parquet
        metadata level: every file's [min, max] of the sort key must be
        disjoint from every other file's, so a selective scan can skip
        all but one file. (A plain shuffled write interleaves ranges and
        min/max stats prune nothing.)"""
        import glob

        import pyarrow.parquet as pq

        out = str(tmp_path / "rs")
        df = spark.range(10_000).select(
            (F.col("id") * 7919 % 10_000).alias("k"), F.col("id").alias("v")
        )
        write_range_sorted(df, out, ["k"], num_files=4)
        files = sorted(glob.glob(f"{out}/part-*.parquet"))
        assert len(files) == 4
        ranges = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(0).statistics
                mins.append(st.min)
                maxs.append(st.max)
            ranges.append((min(mins), max(maxs)))
        ranges.sort()
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi < lo, f"overlapping file ranges: {ranges}"
        # Round trip intact.
        assert spark.read.parquet(out).count() == 10_000

    def test_zordered_layout_localizes_both_dimensions(self, spark, tmp_path):
        """write_zordered's contract: with 16 files over a 2-D key
        space, EVERY clustered column's per-file min/max span shrinks
        to a fraction of the global span (files cover compact
        hyper-rectangles of the Morton curve), so a point filter on
        EITHER column prunes most files by footer stats — where the
        lexicographic write_range_sorted layout localizes only its
        leading key and a second-column filter touches every file."""
        import glob

        import pyarrow.parquet as pq

        from graphdatabases_spark.sources.writers import write_zordered

        n = 40_000
        df = spark.range(n).select(
            ((F.col("id") * 7919) % 1000).alias("x"),
            ((F.col("id") * 104729) % 1000).alias("y"),
            F.col("id").alias("v"),
        )
        out = str(tmp_path / "zo")
        write_zordered(df, out, ["x", "y"], num_files=16)
        files = sorted(glob.glob(f"{out}/part-*.parquet"))
        # Sampled bounds land ON tile values, but a tile pair can merge
        # when the sampler misses one bound — never a mid-tile straddle.
        assert 15 <= len(files) <= 16

        def file_range(path, colidx):
            md = pq.ParquetFile(path).metadata
            mins, maxs = [], []
            for rg in range(md.num_row_groups):
                st = md.row_group(rg).column(colidx).statistics
                mins.append(st.min)
                maxs.append(st.max)
            return min(mins), max(maxs)

        for colidx, name in ((0, "x"), (1, "y")):
            spans, prunable = [], 0
            for f in files:
                lo, hi = file_range(f, colidx)
                spans.append(hi - lo)
                if not (lo <= 100 <= hi):
                    prunable += 1
            # Ideal 16-file Morton tiling is 4x4 -> per-dim span ~1/4
            # of the 0..999 space; assert a generous 1/2.
            assert sum(spans) / len(spans) <= 0.5 * 999, (name, spans)
            # A point predicate on either column must prune most files.
            assert prunable >= len(files) // 2, (name, prunable)

        back = spark.read.parquet(out)
        assert back.count() == n
        assert back.agg(F.sum("v")).collect()[0][0] == n * (n - 1) // 2

    def test_zordered_three_columns(self, spark, tmp_path):
        """3-column Morton clustering (16 bits x 3 = 48 <= 63): every
        clustered dimension's per-file span still shrinks well below
        the global span, and the round trip is exact."""
        import glob

        import pyarrow.parquet as pq

        from graphdatabases_spark.sources.writers import write_zordered

        n = 40_000
        df = spark.range(n).select(
            ((F.col("id") * 7919) % 1000).alias("x"),
            ((F.col("id") * 104729) % 1000).alias("y"),
            ((F.col("id") * 15485863) % 1000).alias("z"),
        )
        out = str(tmp_path / "zo3")
        write_zordered(df, out, ["x", "y", "z"], num_files=8)
        files = sorted(glob.glob(f"{out}/part-*.parquet"))
        assert 7 <= len(files) <= 8
        for colidx, name in ((0, "x"), (1, "y"), (2, "z")):
            spans = []
            for f in files:
                md = pq.ParquetFile(f).metadata
                lo = min(
                    md.row_group(rg).column(colidx).statistics.min
                    for rg in range(md.num_row_groups)
                )
                hi = max(
                    md.row_group(rg).column(colidx).statistics.max
                    for rg in range(md.num_row_groups)
                )
                spans.append(hi - lo)
            # 8 files over 3-D Morton = 2x2x2 tiles ideally (span ~1/2);
            # assert below 0.8 of the global span on every dimension —
            # an unclustered layout sits at ~1.0 on all of them.
            assert sum(spans) / len(spans) <= 0.8 * 999, (name, spans)
        assert spark.read.parquet(out).count() == n

    def test_zordered_rejects_bad_args(self, spark, tmp_path):
        import pytest

        from graphdatabases_spark.sources.writers import write_zordered

        df = spark.range(10).select(F.col("id").alias("x"), F.col("id").alias("y"))
        with pytest.raises(ValueError, match=">= 2 columns"):
            write_zordered(df, str(tmp_path / "z1"), ["x"])
        with pytest.raises(ValueError, match="63-bit"):
            write_zordered(df, str(tmp_path / "z2"), ["x", "y"], bits=32)

    def test_compaction_merges_small_files(self, spark, tmp_path):
        """compact_parquet must collapse a fragmented directory to the
        byte-sized target count, preserve the rows exactly, and merge
        WITHOUT a shuffle (coalesce path)."""
        import glob

        from graphdatabases_spark.sources.writers import compact_parquet

        frag = str(tmp_path / "frag")
        out = str(tmp_path / "compact")
        df = spark.range(20_000).select(
            F.col("id"), (F.col("id") % 97).alias("k")
        )
        df.repartition(64).write.parquet(frag)
        assert len(glob.glob(f"{frag}/part-*.parquet")) == 64

        # Size the target so the byte-derived count lands between 1 and
        # 64 — proves the ceil math reads actual directory bytes.
        total = sum(
            __import__("os").path.getsize(f)
            for f in glob.glob(f"{frag}/part-*.parquet")
        )
        n = compact_parquet(
            spark, frag, out, target_file_bytes=max(1, total // 3)
        )
        files = glob.glob(f"{out}/part-*.parquet")
        assert len(files) == n
        assert 1 < n < 64
        got = spark.read.parquet(out)
        assert got.count() == 20_000
        assert got.agg(F.sum("id")).collect()[0][0] == 20_000 * 19_999 // 2
        # coalesce path: no exchange in the rewrite plan
        from graphdatabases_spark.plans.inspect import executed_plan

        plan = executed_plan(spark.read.parquet(frag).coalesce(n))
        assert "Exchange" not in plan

    def test_compaction_rejects_in_place_overwrite(self, spark, tmp_path):
        """in_path == out_path would have mode('overwrite') delete the
        source under its own reader (ADVICE r5)."""
        import pytest

        from graphdatabases_spark.sources.writers import compact_parquet

        p = str(tmp_path / "inplace")
        spark.range(10).write.parquet(p)
        with pytest.raises(ValueError, match="in_path == out_path"):
            compact_parquet(spark, p, p)

    def test_compaction_returns_actual_file_count(self, spark, tmp_path):
        """coalesce(n) cannot INCREASE partition count: with a target
        far below file size, the return value must be the files really
        written (the input's partition count), not the byte-derived
        target (ADVICE r5)."""
        import glob

        from graphdatabases_spark.sources.writers import compact_parquet

        frag = str(tmp_path / "frag_two")
        out = str(tmp_path / "compact_two")
        spark.range(1000).repartition(2).write.parquet(frag)
        n = compact_parquet(spark, frag, out, target_file_bytes=1)
        assert n == len(glob.glob(f"{out}/part-*.parquet")) == 2

    def test_compaction_with_sort_reclusters_ranges(self, spark, tmp_path):
        """sort_by compaction must leave disjoint per-file key ranges
        (the write_range_sorted zone-map contract) on previously
        interleaved data."""
        import glob

        import pyarrow.parquet as pq

        from graphdatabases_spark.sources.writers import compact_parquet

        frag = str(tmp_path / "frag_s")
        out = str(tmp_path / "compact_s")
        df = spark.range(10_000).select(
            (F.col("id") * 7919 % 10_000).alias("k"), F.col("id").alias("v")
        )
        df.repartition(32).write.parquet(frag)
        total = sum(
            __import__("os").path.getsize(f)
            for f in glob.glob(f"{frag}/part-*.parquet")
        )
        compact_parquet(
            spark, frag, out,
            target_file_bytes=max(1, total // 3), sort_by=["k"],
        )
        files = sorted(glob.glob(f"{out}/part-*.parquet"))
        assert len(files) > 1
        ranges = []
        for f in files:
            md = pq.ParquetFile(f).metadata
            stats = [
                md.row_group(rg).column(0).statistics
                for rg in range(md.num_row_groups)
            ]
            ranges.append((min(s.min for s in stats), max(s.max for s in stats)))
        ranges.sort()
        for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
            assert hi < lo, f"overlapping file ranges: {ranges}"
        assert spark.read.parquet(out).count() == 10_000

    def test_bucketed_join_skips_shuffle(self, spark):
        """The point of write_bucketed: two tables bucketed on the join
        key must sort-merge join with NO Exchange on either side — the
        §4.3.2 co-located-join layout that saves the dominant shuffle of
        a fact⋈fact join at 100 TB."""
        from graphdatabases_spark.sources import write_bucketed

        a = spark.range(1000).withColumn("va", F.col("id") * 2)
        b = spark.range(1000).withColumn("vb", F.col("id") * 3)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")
        try:
            write_bucketed(a, "bkt_a", buckets=4, bucket_by=["id"], sort_by=["id"])
            write_bucketed(b, "bkt_b", buckets=4, bucket_by=["id"], sort_by=["id"])
            # The planner's heuristics don't apply at toy size (bucketed
            # scan off, broadcast join on); pin both so the test observes
            # the layout's effect as a real fact⋈fact join would — at
            # 100 TB neither side broadcasts and bucketing is the only
            # thing standing between this join and a full shuffle.
            spark.conf.set(
                "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
            )
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
            assert joined.count() == 1000
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            # Bucket metadata must reach the scan.
            assert "Bucketed: true" in plan or "SelectedBucketsCount" in plan, plan
        finally:
            spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
            spark.sql("DROP TABLE IF EXISTS bkt_a")
            spark.sql("DROP TABLE IF EXISTS bkt_b")

    def test_orc_round_trip_partitioned_with_pushdown(self, spark, tmp_path):
        out = str(tmp_path / "orc")
        df = spark.range(10).withColumn("bucket", (F.col("id") % 2).cast("int"))
        write_orc(df, out, partition_by=["bucket"])
        assert os.path.isdir(f"{out}/bucket=0") and os.path.isdir(f"{out}/bucket=1")
        pruned = read_orc(spark, out).filter(F.col("bucket") == 1).select("id")
        assert pruned.count() == 5
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        # Partition pruning + column pruning must reach the ORC scan.
        assert "PartitionFilters: [isnotnull(bucket" in plan
        assert "ReadSchema: struct<id:bigint>" in plan


class TestSaltedJoin:
    """operators/skew.py: salted join ≡ plain join, fact spread verified."""

    def test_inner_matches_plain_join(self, spark, sf_dir):
        from graphdatabases_spark.operators import salted_join

        l = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
            "l_returnflag", "l_orderkey"
        )
        dim = l.select("l_returnflag").distinct()
        plain = l.join(dim, "l_returnflag").orderBy("l_orderkey", "l_returnflag")
        salted = salted_join(l, dim, "l_returnflag").orderBy(
            "l_orderkey", "l_returnflag"
        )
        assert plain.exceptAll(salted).count() == 0
        assert salted.exceptAll(plain).count() == 0

    def test_left_preserves_unmatched(self, spark):
        from graphdatabases_spark.operators import salted_join
        import pandas as pd

        fact = spark.createDataFrame(pd.DataFrame({"k": [1, 2, 3], "v": [10, 20, 30]}))
        dim = spark.createDataFrame(pd.DataFrame({"k": [1], "w": [100]}))
        out = salted_join(fact, dim, "k", how="left").orderBy("k").collect()
        assert [r["k"] for r in out] == [1, 2, 3]
        assert out[1]["w"] is None and out[0]["w"] == 100

    def test_rejects_outer(self, spark):
        from graphdatabases_spark.operators import salted_join
        import pytest as _pytest

        with _pytest.raises(ValueError):
            salted_join(None, None, "k", how="full")

    def test_salt_spreads_rows(self, spark):
        """Every salt bucket should receive some of the hot key's rows."""
        from graphdatabases_spark.operators.skew import SALT_COL
        from pyspark.sql import functions as F

        fact = spark.range(2000).select(F.lit("hot").alias("k"), F.col("id"))
        salted = fact.withColumn(
            SALT_COL, F.pmod(F.xxhash64("k", "id"), F.lit(8)).cast("int")
        )
        n_buckets = salted.select(SALT_COL).distinct().count()
        assert n_buckets == 8


class TestIntervalJoin:
    """Bucketed interval join (operators/interval.py): correctness at
    the exact tolerance boundary, left semantics, and the no-dup
    guarantee (each qualifying pair meets in exactly one bucket)."""

    def _frames(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        probe = spark.createDataFrame(
            [
                (1, base),
                (2, base + dt.timedelta(minutes=30)),
                (3, base + dt.timedelta(hours=5)),  # matches nothing
            ],
            "pid bigint, p_ts timestamp",
        )
        build = spark.createDataFrame(
            [
                (10, base + dt.timedelta(seconds=300)),  # exactly tol from 1
                (11, base + dt.timedelta(seconds=300, microseconds=1)),  # 1us over
                (12, base + dt.timedelta(minutes=30, seconds=-299)),  # in for 2
                (13, base + dt.timedelta(minutes=30, seconds=299)),  # in for 2
            ],
            "bid bigint, b_ts timestamp",
        )
        return probe, build

    def test_inner_boundary_exact_to_the_microsecond(self, spark):
        from graphdatabases_spark.operators.interval import interval_join

        probe, build = self._frames(spark)
        got = {
            (r["pid"], r["bid"])
            for r in interval_join(probe, build, "p_ts", "b_ts", 300).collect()
        }
        # bid 10 is exactly 300s from pid 1 (inclusive); bid 11 is 1 us
        # beyond and must NOT pair — unix_timestamp()'s second
        # truncation would have admitted it.
        assert got == {(1, 10), (2, 12), (2, 13)}

    def test_left_keeps_unmatched_probes_once(self, spark):
        from pyspark.sql import functions as F

        from graphdatabases_spark.operators.interval import interval_join

        probe, build = self._frames(spark)
        got = interval_join(probe, build, "p_ts", "b_ts", 300, how="left")
        per_probe = {
            r["pid"]: r["n"]
            for r in got.groupBy("pid").agg(F.count("bid").alias("n")).collect()
        }
        assert per_probe == {1: 1, 2: 2, 3: 0}
        # the unmatched probe appears exactly once (null-extended)
        assert got.filter(F.col("pid") == 3).count() == 1

    def test_matches_naive_theta_join_on_random_data(self, spark):
        """Differential vs the O(n*m) formulation on seeded random
        timestamps — including fractional-second boundary cases."""
        import random

        from pyspark.sql import functions as F

        from graphdatabases_spark.operators.interval import interval_join

        rng = random.Random(99)
        probe = spark.createDataFrame(
            [(i, 1_700_000_000 + rng.randrange(0, 7200) * 1_000_000 + rng.randrange(10**6))
             for i in range(80)],
            "pid bigint, us bigint",
        ).select("pid", F.timestamp_micros(F.col("us")).alias("p_ts"))
        build = spark.createDataFrame(
            [(i, 1_700_000_000 + rng.randrange(0, 7200) * 1_000_000 + rng.randrange(10**6))
             for i in range(80)],
            "bid bigint, us bigint",
        ).select("bid", F.timestamp_micros(F.col("us")).alias("b_ts"))
        tol = 600
        fast = {
            (r["pid"], r["bid"])
            for r in interval_join(probe, build, "p_ts", "b_ts", tol).collect()
        }
        naive = {
            (r["pid"], r["bid"])
            for r in probe.join(
                build,
                F.abs(
                    F.unix_micros(F.col("b_ts")) - F.unix_micros(F.col("p_ts"))
                )
                <= tol * 1_000_000,
            ).collect()
        }
        assert fast == naive and len(fast) > 0


class TestIncrementalZorderCompaction:
    """compact_zordered_incremental: untouched files stay byte-identical,
    content is old ∪ batch, the re-clustered region stays tile-aligned."""

    def _table(self, spark, tmp_path):
        from graphdatabases_spark.sources.writers import write_zordered

        n = 40_000
        df = spark.range(n).select(
            ((F.col("id") * 7919) % 1000).alias("x"),
            ((F.col("id") * 104729) % 1000).alias("y"),
            F.col("id").alias("v"),
        )
        out = str(tmp_path / "zi")
        write_zordered(df, out, ["x", "y"], num_files=16)
        return out, n

    @staticmethod
    def _file_md5s(out):
        import glob
        import hashlib

        return {
            f: hashlib.md5(open(f, "rb").read()).hexdigest()
            for f in glob.glob(f"{out}/part-*.parquet")
        }

    def test_corner_batch_rewrites_only_nearby_files(self, spark, tmp_path):
        from graphdatabases_spark.sources.writers import (
            compact_zordered_incremental,
        )

        out, n = self._table(spark, tmp_path)
        before = self._file_md5s(out)
        # Batch confined to the low-x/low-y corner -> tile 0's region.
        batch = spark.range(500).select(
            (F.col("id") % 50).alias("x"),
            ((F.col("id") * 3) % 50).alias("y"),
            (F.col("id") + 10_000_000).alias("v"),
        )
        stats = compact_zordered_incremental(spark, out, batch)
        assert stats["files_total"] == len(before)
        assert stats["rows_added"] == 500
        # A corner batch touches few tiles: most files survive untouched.
        assert stats["files_rewritten"] <= stats["files_total"] // 2
        assert stats["files_kept"] >= stats["files_total"] // 2
        after = self._file_md5s(out)
        kept = {f: h for f, h in before.items() if f in after}
        assert len(kept) == stats["files_kept"]
        for f, h in kept.items():
            assert after[f] == h, f"kept file rewritten: {f}"
        back = spark.read.parquet(out)
        assert back.count() == n + 500
        exp = n * (n - 1) // 2 + sum(i + 10_000_000 for i in range(500))
        assert back.agg(F.sum("v")).collect()[0][0] == exp
        # Batch rows are queryable through the clustered layout.
        assert (
            back.filter((F.col("x") < 50) & (F.col("y") < 50))
            .filter(F.col("v") >= 10_000_000)
            .count()
            == 500
        )

    def test_layout_still_prunes_after_compaction(self, spark, tmp_path):
        import glob

        import pyarrow.parquet as pq

        from graphdatabases_spark.sources.writers import (
            compact_zordered_incremental,
        )

        out, n = self._table(spark, tmp_path)
        batch = spark.range(300).select(
            (F.col("id") % 40).alias("x"),
            ((F.col("id") * 7) % 40).alias("y"),
            (F.col("id") + 20_000_000).alias("v"),
        )
        compact_zordered_incremental(spark, out, batch)
        files = sorted(glob.glob(f"{out}/part-*.parquet"))
        for colidx_name in ((0, "x"), (1, "y")):
            colidx, name = colidx_name
            prunable = 0
            for f in files:
                md = pq.ParquetFile(f).metadata
                names = [md.schema.column(ci).name for ci in range(md.num_columns)]
                ci = names.index(name)
                lo = min(
                    md.row_group(rg).column(ci).statistics.min
                    for rg in range(md.num_row_groups)
                )
                hi = max(
                    md.row_group(rg).column(ci).statistics.max
                    for rg in range(md.num_row_groups)
                )
                if not (lo <= 900 <= hi):
                    prunable += 1
            # A far-corner point filter still prunes most files.
            assert prunable >= len(files) // 2, (name, prunable)

    def test_out_of_bounds_batch_clamps_into_boundary_tiles(
        self, spark, tmp_path
    ):
        from graphdatabases_spark.sources.writers import (
            compact_zordered_incremental,
        )

        out, n = self._table(spark, tmp_path)
        batch = spark.range(100).select(
            (F.col("id") + 5000).alias("x"),  # beyond the 0..999 bounds
            (F.col("id") + 5000).alias("y"),
            (F.col("id") + 30_000_000).alias("v"),
        )
        stats = compact_zordered_incremental(spark, out, batch)
        assert stats["tiles_touched"] == 1  # clamps to the top tile
        back = spark.read.parquet(out)
        assert back.count() == n + 100
        assert back.filter(F.col("x") >= 5000).count() == 100

    def test_second_increment_composes(self, spark, tmp_path):
        from graphdatabases_spark.sources.writers import (
            compact_zordered_incremental,
        )

        out, n = self._table(spark, tmp_path)
        b1 = spark.range(200).select(
            (F.col("id") % 30).alias("x"),
            (F.col("id") % 30).alias("y"),
            (F.col("id") + 40_000_000).alias("v"),
        )
        b2 = spark.range(200).select(
            (900 + F.col("id") % 30).alias("x"),
            (900 + F.col("id") % 30).alias("y"),
            (F.col("id") + 50_000_000).alias("v"),
        )
        s1 = compact_zordered_incremental(spark, out, b1)
        s2 = compact_zordered_incremental(spark, out, b2)
        assert s1["rows_added"] == s2["rows_added"] == 200
        assert spark.read.parquet(out).count() == n + 400

    def test_missing_sidecar_rejected(self, spark, tmp_path):
        import pytest

        from graphdatabases_spark.sources.writers import (
            compact_zordered_incremental,
        )

        out = str(tmp_path / "plain")
        spark.range(100).select(
            F.col("id").alias("x"), F.col("id").alias("y")
        ).write.parquet(out)
        with pytest.raises(FileNotFoundError, match="sidecar"):
            compact_zordered_incremental(spark, out, spark.range(1).select(
                F.col("id").alias("x"), F.col("id").alias("y")
            ))


class TestVersionedZorderEvolution:
    """evolve_zordered: a layout change (new clustering columns/bounds)
    publishes a complete new version behind one atomic pointer rename —
    a racing reader sees entirely-old or entirely-new, never a mix."""

    def test_evolution_preserves_content_and_changes_layout(
        self, spark, tmp_path
    ):
        import json

        from graphdatabases_spark.sources.writers import (
            ZORDER_SIDECAR,
            evolve_zordered,
            read_zordered_current,
            write_zordered_versioned,
        )

        n = 20_000
        df = spark.range(n).select(
            ((F.col("id") * 7919) % 1000).alias("x"),
            ((F.col("id") * 104729) % 1000).alias("y"),
            ((F.col("id") * 15485863) % 1000).alias("z"),
            F.col("id").alias("v"),
        )
        root = str(tmp_path / "zv")
        assert write_zordered_versioned(df, root, ["x", "y"], num_files=8) == "v0"
        assert read_zordered_current(spark, root).count() == n
        new = evolve_zordered(spark, root, ["y", "z"], num_files=8)
        assert new == "v1"
        back = read_zordered_current(spark, root)
        assert back.count() == n
        assert back.agg(F.sum("v")).collect()[0][0] == n * (n - 1) // 2
        # The new version carries its OWN clustering metadata.
        lay = json.loads(open(f"{root}/v1/{ZORDER_SIDECAR}").read())
        assert lay["cols"] == ["y", "z"]
        # The old version stays for in-flight readers.
        assert spark.read.parquet(f"{root}/v0").count() == n

    def test_racing_reader_never_sees_a_torn_version(self, spark, tmp_path):
        import threading

        from graphdatabases_spark.sources.writers import (
            evolve_zordered,
            read_zordered_current,
            write_zordered_versioned,
        )

        n = 5_000
        df = spark.range(n).select(
            ((F.col("id") * 7919) % 500).alias("x"),
            ((F.col("id") * 104729) % 500).alias("y"),
            ((F.col("id") * 15485863) % 500).alias("z"),
            F.col("id").alias("v"),
        )
        root = str(tmp_path / "zr")
        write_zordered_versioned(df, root, ["x", "y"], num_files=4)
        expect = n * (n - 1) // 2
        errors: list = []
        stop = threading.Event()

        def reader():
            while not stop.is_set():
                try:
                    got = read_zordered_current(spark, root)
                    cnt = got.count()
                    s = got.agg(F.sum("v")).collect()[0][0]
                    if cnt != n or s != expect:
                        errors.append((cnt, s))
                except Exception as e:  # a torn swap would surface here
                    errors.append(repr(e))

        t = threading.Thread(target=reader, daemon=True)
        t.start()
        try:
            for cols in (["y", "z"], ["x", "z"], ["x", "y"]):
                evolve_zordered(spark, root, cols, num_files=4)
        finally:
            stop.set()
            t.join(timeout=60)
        assert not errors, errors[:3]
        assert read_zordered_current(spark, root).count() == n

    def test_vacuum_drops_only_expired_versions(self, spark, tmp_path):
        from graphdatabases_spark.sources.writers import (
            evolve_zordered,
            read_zordered_current,
            vacuum_zordered,
            write_zordered_versioned,
        )

        n = 2_000
        df = spark.range(n).select(
            ((F.col("id") * 7) % 100).alias("x"),
            ((F.col("id") * 13) % 100).alias("y"),
            ((F.col("id") * 31) % 100).alias("z"),
            F.col("id").alias("v"),
        )
        root = str(tmp_path / "zvac")
        write_zordered_versioned(df, root, ["x", "y"], num_files=4)
        for cols in (["y", "z"], ["x", "z"], ["x", "y"]):
            evolve_zordered(spark, root, cols, num_files=4)
        import os

        assert sorted(
            d for d in os.listdir(root) if d.startswith("v")
        ) == ["v0", "v1", "v2", "v3"]
        # Stray sibling dirs that merely start with "v" (a crashed
        # evolve's backup, a tooling dir) must be SKIPPED by the sweep,
        # not int()-parsed into a ValueError abort.
        os.makedirs(os.path.join(root, "v1.bak"))
        os.makedirs(os.path.join(root, "versions"))
        removed = vacuum_zordered(spark, root, keep=2)
        assert removed == ["v0", "v1"]
        assert os.path.isdir(os.path.join(root, "v1.bak"))
        assert os.path.isdir(os.path.join(root, "versions"))
        import re

        assert sorted(
            d for d in os.listdir(root) if re.fullmatch(r"v\d+", d)
        ) == ["v2", "v3"]
        assert read_zordered_current(spark, root).count() == n
        # keep=0 clamps: the current version always survives.
        assert vacuum_zordered(spark, root, keep=0) == ["v2"]
        assert read_zordered_current(spark, root).count() == n


class TestDynamicPartitionOverwrite:
    """overwrite_partitions: the idempotent-backfill contract — only
    the partitions present in the incoming frame are replaced, sibling
    partitions stay BYTE-IDENTICAL on disk."""

    def test_backfill_touches_only_its_partition(self, spark, tmp_path):
        import glob
        import hashlib
        import os

        from graphdatabases_spark.sources.writers import (
            overwrite_partitions,
            write_parquet,
        )

        path = str(tmp_path / "dyn_part")
        base = spark.createDataFrame(
            [(d, i, float(i)) for d in ("d1", "d2", "d3") for i in range(5)],
            "day string, k int, v double",
        )
        write_parquet(base, path, partition_by=["day"])

        def files_with_hashes(day):
            out = {}
            for f in glob.glob(f"{path}/day={day}/*.parquet"):
                with open(f, "rb") as fh:
                    out[os.path.basename(f)] = hashlib.md5(
                        fh.read()
                    ).hexdigest()
            return out

        before_d1 = files_with_hashes("d1")
        before_d3 = files_with_hashes("d3")
        assert before_d1 and before_d3

        # Backfill d2 only, with CHANGED values and a different row count.
        fix = spark.createDataFrame(
            [("d2", i, float(100 + i)) for i in range(3)],
            "day string, k int, v double",
        )
        overwrite_partitions(fix, path, ["day"])

        # Sibling partitions byte-identical; reader sees the new d2.
        assert files_with_hashes("d1") == before_d1
        assert files_with_hashes("d3") == before_d3
        got = spark.read.parquet(path)
        assert got.filter("day = 'd2'").count() == 3
        assert got.filter("day = 'd2' and v >= 100").count() == 3
        assert got.filter("day = 'd1'").count() == 5
        # Re-running the same backfill is idempotent for the reader.
        overwrite_partitions(fix, path, ["day"])
        assert spark.read.parquet(path).count() == 13
        # The scoped conf did not leak into the session.
        assert (
            spark.conf.get(
                "spark.sql.sources.partitionOverwriteMode", "STATIC"
            ).lower()
            == "static"
        )
