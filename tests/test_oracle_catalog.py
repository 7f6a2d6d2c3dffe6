"""Differential correctness: every catalog query vs its DuckDB oracle.

This is the local replica of the driver's t2 gate, run at sf0.001 for
speed (the driver runs sf0.01).
"""

from __future__ import annotations

import pytest

from graphdatabases_spark.relational import REGISTRY, queries, oracle_sql

from tests.oracle_utils import run_differential

queries()  # populate REGISTRY

# source_binary_listing's oracle pins the gate's sf0.01 directory
# (read_blob needs a literal path) — its differential runs there in
# tests/test_pipeline_queries.py::test_binary_listing_matches_oracle_at_sf001.
WITH_ORACLE = sorted(
    n
    for n, q in REGISTRY.items()
    if q.oracle is not None and n != "source_binary_listing"
)
NO_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    (verdict, detail), nrows = run_differential(spark, sf_dir, name, q.fn, q.oracle)
    assert verdict == "MATCH", f"{name}: {verdict} — {detail} ({nrows} rows)"


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs_without_oracle(spark, sf_dir, name):
    q = REGISTRY[name]
    df = q.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
