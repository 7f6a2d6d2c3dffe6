"""Differential + invariant tests for the staged batch-2 pipeline queries.

pipeline_queries is not yet imported by catalog._load_all (see its module
docstring for the driver-window staging rationale), so this module
imports it directly and runs the same DuckDB differential the rest of
the catalog gets from tests/test_oracle_catalog.py.
"""

from __future__ import annotations

import pytest

from graphdatabases_spark.relational import pipeline_queries  # noqa: F401 — registers
from graphdatabases_spark.relational.catalog import REGISTRY

from tests.oracle_utils import run_differential

PIPELINE_NAMES = sorted(
    n
    for n, q in REGISTRY.items()
    if q.fn.__module__ == "graphdatabases_spark.relational.pipeline_queries"
)

WITH_ORACLE = [
    n
    for n in PIPELINE_NAMES
    if REGISTRY[n].oracle is not None and n != "source_binary_listing"
]


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_pipeline_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    (verdict, detail), nrows = run_differential(spark, sf_dir, name, q.fn, q.oracle)
    assert verdict == "MATCH", f"{name}: {verdict} — {detail} ({nrows} rows)"


def test_binary_listing_matches_oracle_at_sf001(spark):
    # Its oracle pins the gate's sf0.01 directory (read_blob needs a
    # literal path), so the differential must run there too.
    q = REGISTRY["source_binary_listing"]
    (verdict, detail), nrows = run_differential(
        spark, "/root/testdata/sf0.01", "source_binary_listing", q.fn, q.oracle
    )
    assert verdict == "MATCH", f"{verdict} — {detail}"
    assert nrows == 10  # one row per fixture table


def test_kmeans_partitions_input_and_reduces_inertia(spark, sf_dir):
    from graphdatabases_spark.functions.clustering import kmeans_summary
    from graphdatabases_spark.relational.catalog import table

    emb = table(spark, sf_dir, "embeddings")
    total = emb.count()
    one = kmeans_summary(emb, k=8, iters=1).collect()
    five = kmeans_summary(emb, k=8, iters=5).collect()
    # Partition of the input: cluster sizes sum to the corpus size.
    assert sum(r["n"] for r in five) == total
    assert {r["cluster"] for r in five} <= set(range(8))
    # Lloyd's never increases inertia.
    assert sum(r["inertia"] for r in five) <= sum(r["inertia"] for r in one) + 1e-6


def test_kmeans_clusters_align_with_labels(spark, sf_dir):
    """The fixture embeddings carry ground-truth labels; a correct
    k-means should beat random assignment by a wide margin (majority-
    label purity over clusters)."""
    from graphdatabases_spark.functions.clustering import _assign, kmeans_fit
    from graphdatabases_spark.relational.catalog import table

    import pyspark.sql.functions as F

    emb = table(spark, sf_dir, "embeddings")
    cents = kmeans_fit(emb, k=8, iters=5)
    assigned = _assign(emb, cents)
    counts = (
        assigned.groupBy("cluster", "label").count().collect()
    )
    by_cluster: dict[int, list[int]] = {}
    for r in counts:
        by_cluster.setdefault(r["cluster"], []).append(r["count"])
    purity = sum(max(v) for v in by_cluster.values()) / emb.count()
    n_labels = emb.select(F.count_distinct("label")).collect()[0][0]
    assert purity > 1.5 / n_labels, f"purity {purity:.3f} vs {n_labels} labels"


def test_session_stats_covers_all_events(spark, sf_dir):
    from graphdatabases_spark.relational.catalog import table

    ev = table(spark, sf_dir, "events")
    res = pipeline_queries.events_session_stats(spark, sf_dir)
    rows = res.collect()
    assert sum(r["n_events"] for r in rows) == ev.count()
    # Session numbering is 1-based and dense per user.
    by_user: dict[int, list[int]] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["session_seq"])
    for seqs in by_user.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))


def test_funnel_is_monotone(spark, sf_dir):
    row = pipeline_queries.events_funnel_conversion(spark, sf_dir).collect()[0]
    assert row["n_view_users"] >= row["n_click_users"] >= row["n_purchase_users"]
    assert row["n_view_users"] > 0


def test_zorder_catalog_scan_prunes_both_dimensions(spark):
    """`lineitem_zorder_scan`'s staged layout must actually deliver
    what the entry's doc claims: parquet footer min/max stats over the
    staged 16-file copy exclude files for EACH of the two clustered
    columns independently, and the 2-D conjunction touches at most a
    quarter of the files.  (A leading-key range sort would pass the
    l_partkey assertion and fail the l_suppkey one — this pin is what
    separates Z-order from write_range_sorted in the query surface.)
    """
    import glob
    import os

    import pyarrow.parquet as pq

    from graphdatabases_spark.relational.pipeline_queries import (
        _stage_lineitem_zordered,
    )

    staged = _stage_lineitem_zordered(spark, "/root/testdata/sf0.01")
    files = sorted(glob.glob(os.path.join(staged, "*.parquet")))
    assert len(files) >= 8, "expected a multi-file clustered layout"

    def col_range(path: str, col: str) -> tuple[int, int]:
        md = pq.ParquetFile(path).metadata
        idx = md.schema.to_arrow_schema().names.index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        return min(los), max(his)

    def hits(col: str, lo: int, hi: int) -> set[str]:
        out = set()
        for f in files:
            fmin, fmax = col_range(f, col)
            if fmin <= hi and fmax >= lo:
                out.add(f)
        return out

    hit_p = hits("l_partkey", 1, 200)   # 10% of the key space at sf0.01
    hit_s = hits("l_suppkey", 1, 10)    # 10% of the key space at sf0.01
    assert len(hit_p) < len(files), "l_partkey stats prune nothing"
    assert len(hit_s) < len(files), "l_suppkey stats prune nothing"
    both = hit_p & hit_s
    assert len(both) <= len(files) // 4, (
        f"2-D conjunction should touch ≤ 1/4 of files, got "
        f"{len(both)}/{len(files)}"
    )


def test_zorder_incremental_staging_is_a_partial_rewrite(spark, tmp_path):
    """`lineitem_zorder_incremental_scan`'s staging claim, reproduced
    in isolation: building the same base + low-suppkey batch through
    the maintenance loop rewrites only a strict subset of the base's
    files (footer-selected), while total content equals base ∪ batch."""
    from pyspark.sql import functions as F

    from graphdatabases_spark.relational.catalog import table
    from graphdatabases_spark.sources.writers import (
        compact_zordered_incremental,
        write_zordered,
    )

    sf = "/root/testdata/sf0.01"
    li = table(spark, sf, "lineitem")
    out = str(tmp_path / "zi_li")
    write_zordered(
        li.filter(F.col("l_suppkey") > 2),
        out,
        ["l_partkey", "l_suppkey"],
        num_files=16,
    )
    stats = compact_zordered_incremental(
        spark, out, li.filter(F.col("l_suppkey") <= 2)
    )
    assert stats["rows_added"] == li.filter(F.col("l_suppkey") <= 2).count()
    # The low-suppkey stripe clamps below the base's bounds: only the
    # low-suppkey boundary tiles' files rewrite.
    assert 0 < stats["files_rewritten"] < stats["files_total"]
    assert stats["files_kept"] >= stats["files_total"] // 2
    assert spark.read.parquet(out).count() == li.count()
