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


def test_table_pins_session_confs_for_external_sessions(spark, sf_dir):
    """The driver's gate passes ITS OWN SparkSession; table() must pin
    the two confs catalog semantics depend on (UTC rendering, nanos-as-
    long parquet reads) rather than assume our get_spark built the
    session. A subprocess probe against a session built with
    America/New_York confirmed the timestamp entries still MATCH; this
    pin keeps the repair in place."""
    from graphdatabases_spark.relational.catalog import table

    saved = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert (
            spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        )
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


class TestOracleSelfConsistency:
    """Pins on the oracle TEXTS themselves (ADVICE r4): hazards that
    would otherwise surface only as an opaque hash mismatch."""

    def test_no_oracle_emits_hugeint(self, sf_dir):
        """Catalog-wide type gate (VERDICT r5 #1): an uncast DuckDB
        integer ``sum()`` types its output column HUGEINT (int128),
        which the external driver's hasher renders differently from
        Spark's BIGINT — rows+schema pass, hash fails, and the local
        float-coercing comparator can't see it. Round 5 shipped exactly
        two such columns (docs_pack_chunks.tok_total,
        docs_mixture_weights.n_tokens); this DESCRIBE sweep over every
        oracle keeps the class extinct. DESCRIBE only binds the query
        (no execution), so the whole catalog gates in seconds."""
        from tests.oracle_utils import duckdb_connection

        con = duckdb_connection(sf_dir)
        offenders = []
        try:
            for name in sorted(REGISTRY):
                oracle = REGISTRY[name].oracle
                if oracle is None:
                    continue
                cols = con.execute(f"DESCRIBE {oracle}").fetchall()
                for col in cols:
                    cname, ctype = col[0], col[1]
                    if "HUGEINT" in ctype.upper():
                        offenders.append(f"{name}.{cname}: {ctype}")
        finally:
            con.close()
        assert not offenders, (
            "oracle columns typed HUGEINT/UHUGEINT (driver hash hazard "
            "— add CAST(... AS BIGINT)): " + "; ".join(offenders)
        )

    @pytest.mark.parametrize(
        "sf_dir2", ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    )
    def test_kcore_oracle_unroll_reaches_fixpoint(self, sf_dir2):
        """graph_kcore_entity's oracle unrolls exactly 4 peel rounds; the
        Spark side iterates to fixpoint. Assert round-idempotence d3==d4
        so an insufficient unroll (fixture/sf change deepening the peel)
        fails HERE with a clear message, not as a generic hash
        mismatch."""
        from tests.oracle_utils import duckdb_connection

        oracle = REGISTRY["graph_kcore_entity"].oracle
        head = oracle[: oracle.rindex("SELECT CAST(src AS BIGINT)")]
        # MATERIALIZED: the probe references d3 AND d4; with DuckDB's
        # default CTE inlining each reference re-evaluates the whole
        # chained peel (exponential — minutes at sf0.1, seconds here).
        head = head.replace(" AS (", " AS MATERIALIZED (")
        probe = head + """
        SELECT count(*) AS diff FROM (
          (SELECT src, deg FROM d3 EXCEPT SELECT src, deg FROM d4)
          UNION ALL
          (SELECT src, deg FROM d4 EXCEPT SELECT src, deg FROM d3)
        )
        """
        con = duckdb_connection(sf_dir2)
        try:
            diff = con.execute(probe).fetchone()[0]
        finally:
            con.close()
        assert diff == 0, (
            f"kcore oracle's 4-round unroll has not reached the peel "
            f"fixpoint at {sf_dir2} ({diff} degree rows still changing) "
            "— add more _KCORE_ROUND unrolls in graph_queries.py"
        )

    @pytest.mark.parametrize(
        "sf_dir2",
        [
            "/root/testdata/sf0.001",
            "/root/testdata/sf0.01",
            "/root/testdata/sf0.1",
        ],
    )
    def test_fixture_embedding_dim_pins_oracle_constant(self, sf_dir2):
        """The k-means/IVF oracles unroll EMBEDDING_DIM per-dimension
        terms and the LSH oracle inlines EMBEDDING_DIM-length hyperplane
        sign rows; the Spark side derives dim from the data. This pin
        makes a fixture dim change fail loudly instead of desyncing
        them."""
        import duckdb

        from graphdatabases_spark.functions.similarity import EMBEDDING_DIM

        con = duckdb.connect()
        try:
            dims = con.execute(
                f"SELECT DISTINCT len(embedding) FROM "
                f"read_parquet('{sf_dir2}/embeddings.parquet')"
            ).fetchall()
        finally:
            con.close()
        assert dims == [(EMBEDDING_DIM,)], (
            f"fixture embedding dim {dims} != shared constant "
            f"{EMBEDDING_DIM} (functions/similarity.py) — update the "
            "constant so the SQL oracles follow"
        )

    def test_kmeans_ignores_null_embedding_rows(self, spark, sf_dir):
        """kmeans_fit/kmeans_summary drop null-embedding rows up front
        (ADVICE r4): results must equal the clean-input run, not NULL-
        cluster rows or a shifted init."""
        from pyspark.sql import functions as F

        from graphdatabases_spark.functions.clustering import kmeans_summary

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").filter(
            F.col("vec_id") < 64
        )
        with_null = emb.unionByName(
            spark.createDataFrame(
                [(10_000, None, 0)],
                "vec_id bigint, embedding array<float>, label int",
            )
        )
        clean = [tuple(r) for r in kmeans_summary(emb, k=4, iters=2).collect()]
        nulled = [
            tuple(r) for r in kmeans_summary(with_null, k=4, iters=2).collect()
        ]
        assert clean == nulled
        assert all(c is not None for c, _, _ in nulled)
