"""Engine-side invariants for the round-9 entries (values are
separately hash-matched against the DuckDB oracles by
test_oracle_catalog.py)."""

from __future__ import annotations

from pyspark.sql import functions as F


class TestPrefixZipfBound:
    """dedup_prefix_zipf: the AllPairs prefix-filter candidate bound,
    demonstrated on the staged Zipfian-vocabulary corpus — the claim
    dedup_prefix_jaccard could only adjudicate (the fixture's uniform
    vocabulary degenerates the filter toward all-pairs; 604 s at sf0.1,
    measured round 8).  Measured here: candidates ≤ 0.1% of all-pairs
    at every sf (actual: 77 ppm at sf0.001, 9 ppm at sf0.1, 22 ppm at
    the derived sf1) with every planted twin recovered."""

    def _row(self, spark, sf_dir):
        from graphdatabases_spark.relational.dedup_queries import (
            dedup_prefix_zipf,
        )

        return dedup_prefix_zipf(spark, sf_dir).collect()[0]

    def test_candidates_far_below_allpairs(self, spark, sf_dir):
        r = self._row(spark, sf_dir)
        assert r.allpairs == r.n_docs * (r.n_docs - 1) // 2
        # The bound: prefix-token collisions generate < 0.1% of the
        # n·(n−1)/2 pairs a naive all-pairs join would score.
        assert 0 < r.cand_pairs < r.allpairs // 1000
        assert r.cand_ppm < 1000

    def test_planted_twins_recovered_exactly(self, spark, sf_dir):
        r = self._row(spark, sf_dir)
        assert r.n_planted > 0
        # 22/24 shared draw seeds ⇒ Jaccard ≈ 0.85 ≥ the 0.8 gate for
        # every twin; the exact verification join must find them all,
        # and every hit must be within the candidate set (hits ≤ cand).
        assert r.planted_recovered == r.n_planted
        assert r.n_hits <= r.cand_pairs

    def test_staged_corpus_is_reused(self, spark, sf_dir):
        """Second call must read the already-staged parquet (same
        path, same _SIG) — not re-materialize."""
        import os

        from graphdatabases_spark.relational.dedup_queries import (
            _stage_zipf_corpus,
        )

        p1 = _stage_zipf_corpus(spark, sf_dir)
        sig1 = open(os.path.join(p1, "_SIG")).read()
        mtime1 = os.path.getmtime(p1)
        p2 = _stage_zipf_corpus(spark, sf_dir)
        assert p2 == p1
        assert open(os.path.join(p2, "_SIG")).read() == sig1
        assert os.path.getmtime(p2) == mtime1

    def test_zipf_marginals(self, spark, sf_dir):
        """The generator is exactly Zipf(1)-by-octave: octave counts
        over the raw draws are uniform (each octave = 1/20 of draws),
        so token probability within octave l is 2^-l — P(rank r) ∝ 1/r.
        Checked on the staged corpus via the rank's bit length."""
        from graphdatabases_spark.relational.dedup_queries import (
            _ZIPF_OCTAVES,
            _stage_zipf_corpus,
        )

        toks = spark.read.parquet(_stage_zipf_corpus(spark, sf_dir))
        octaves = (
            toks.select(
                F.expr(
                    "CAST(log2(CAST(substr(tok, 2) AS BIGINT)) AS INT)"
                ).alias("octave")
            )
            .groupBy("octave")
            .count()
            .collect()
        )
        seen = {r.octave for r in octaves}
        assert seen == set(range(_ZIPF_OCTAVES))
        # Deep octaves have ~no within-octave collisions, so their
        # distinct-token counts stay near the raw draw rate; shallow
        # octaves collapse (octave 0 is a single token).  Monotone
        # sanity: the deepest octave carries more distinct tokens than
        # octave 0.
        counts = {r.octave: r["count"] for r in octaves}
        assert counts[_ZIPF_OCTAVES - 1] > counts[0]
