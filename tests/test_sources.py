"""Source/sink round-trips (SURVEY §2.2 scans/sinks)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from graphdatabases_spark.sources import (
    parse_json_column,
    read_csv,
    read_jsonl,
    read_tsv_edges,
    write_csv,
    write_jsonl,
    write_parquet,
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
