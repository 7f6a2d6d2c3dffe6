"""Engine-internal invariants for the batch-6 training-pipeline ops
(round 5): banded SRP near-dup recall, repetition-metric bounds,
decontamination set hygiene, packing conservation, mixture-weight
normalization. Value-level correctness is separately proven by the
DuckDB differentials (tests/test_oracle_catalog.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdatabases_spark.functions.similarity import (
    srp_band_pairs,
    threshold_pairs,
)
from graphdatabases_spark.relational import REGISTRY, queries

queries()  # populate REGISTRY


def _planted_corpus(spark, sf_dir):
    """The dup-injected corpus the catalog entry derives (original
    vectors + deterministic ±1%%-perturbed twins at id + 1e6)."""
    from graphdatabases_spark.relational.dedup_queries import _PLANT_OFFSET

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    planted = emb.select(
        (F.col("vec_id") + _PLANT_OFFSET).alias("vec_id"),
        F.transform(
            F.col("embedding"),
            lambda x, i: x.cast("double")
            * (F.lit(1.0) + F.lit(0.01) * ((i % 7) - 3) / F.lit(3.0)),
        ).alias("embedding"),
    )
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    return base.unionByName(planted), _PLANT_OFFSET


def test_srp_band_pairs_subset_and_recall(spark, sf_dir):
    """Banded SRP near-dup must be a SUBSET of the exact threshold
    pairs (its cosine filter is exact — only candidate generation is
    approximate) and must recover essentially every planted twin
    (4 x 12-bit bands at cos ~0.99996: per-pair miss ~1e-7)."""
    corpus, offset = _planted_corpus(spark, sf_dir)
    n = corpus.count() // 2
    exact = {
        (r.id_a, r.id_b)
        for r in threshold_pairs(corpus, threshold=0.99).collect()
    }
    approx = {(r.id_a, r.id_b) for r in srp_band_pairs(corpus, 0.99).collect()}
    assert approx <= exact
    planted = {(i, i + offset) for i in range(n)}
    assert planted <= exact  # every twin really is a near-dup
    assert len(approx & planted) / n >= 0.99


class TestSrpBandPlan:
    """srp_band_plan computes the S-curve operating point so callers
    don't hand-tune into the measured 3-bit cliff (VERDICT r5 #8)."""

    def test_near_dup_plan_is_wide_banded(self):
        from graphdatabases_spark.functions.similarity import srp_band_plan

        plan = srp_band_plan(0.99)
        assert plan["recall"] >= 0.99
        # Well clear of the 3-4 bit cliff: background collision stays
        # selective only with wide bands.
        assert plan["planes_per_band"] >= 8
        assert plan["background_rate"] < 0.05
        assert plan["num_bands"] * plan["planes_per_band"] <= 64

    def test_recall_math_matches_brute_force(self):
        import math

        from graphdatabases_spark.functions.similarity import srp_band_plan

        plan = srp_band_plan(0.95, target_recall=0.9, max_planes=48)
        p1 = 1.0 - math.acos(0.95) / math.pi
        r, b = plan["planes_per_band"], plan["num_bands"]
        assert abs(plan["recall"] - (1 - (1 - p1**r) ** b)) < 1e-12
        assert plan["recall"] >= 0.9

    def test_lower_threshold_narrows_bands(self):
        """A looser similarity target needs higher per-band collision,
        i.e. fewer planes per band — monotone in the threshold."""
        from graphdatabases_spark.functions.similarity import srp_band_plan

        loose = srp_band_plan(0.7)
        tight = srp_band_plan(0.999)
        assert loose["planes_per_band"] <= tight["planes_per_band"]

    def test_infeasible_plan_raises(self):
        import pytest

        from graphdatabases_spark.functions.similarity import srp_band_plan

        with pytest.raises(ValueError, match="no .* plan"):
            srp_band_plan(0.3, target_recall=0.999, max_planes=4)
        with pytest.raises(ValueError, match="background_cos"):
            srp_band_plan(0.5, background_cos=0.6)

    def test_planned_params_recover_planted_pairs(self, spark, sf_dir):
        """End to end: the helper's plan, fed to srp_band_pairs, must
        recover the planted twins like the hand-tuned (4, 12) does."""
        from graphdatabases_spark.functions.similarity import srp_band_plan

        corpus, offset = _planted_corpus(spark, sf_dir)
        n = corpus.count() // 2
        plan = srp_band_plan(0.99)
        got = {
            (r.id_a, r.id_b)
            for r in srp_band_pairs(
                corpus,
                0.99,
                num_bands=plan["num_bands"],
                planes_per_band=plan["planes_per_band"],
            ).collect()
        }
        planted = {(i, i + offset) for i in range(n)}
        assert len(got & planted) / n >= 0.99


def test_srp_band_pairs_no_self_or_reversed(spark, sf_dir):
    corpus, _ = _planted_corpus(spark, sf_dir)
    rows = srp_band_pairs(corpus, 0.99).collect()
    assert rows
    assert all(r.id_a < r.id_b for r in rows)
    assert len({(r.id_a, r.id_b) for r in rows}) == len(rows)


def test_repetition_metrics_bounded(spark, sf_dir):
    rows = REGISTRY["text_repetition_score"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0.0 < r.top_tok_frac <= 1.0
        assert 0.0 <= r.dup_bigram_frac < 1.0
        assert r.flagged == (
            r.top_tok_frac > 0.125 or r.dup_bigram_frac > 0.05
        )
    flagged = sum(r.flagged for r in rows)
    assert 0 < flagged < len(rows)  # thresholds actually split the corpus


def test_decontamination_excludes_eval_docs(spark, sf_dir):
    rows = REGISTRY["docs_decontaminate_ngrams"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.doc_id % 97 != 0  # eval members never self-report
        assert 0 < r.n_overlap <= r.n_grams
        assert 0.0 < r.contamination <= 1.0


def test_pack_chunks_conserves_tokens_and_docs(spark, sf_dir):
    from graphdatabases_spark.functions import text as T
    from graphdatabases_spark.relational.catalog import table

    packed = REGISTRY["docs_pack_chunks"].fn(spark, sf_dir).collect()
    docs = table(spark, sf_dir, "documents").select(
        F.size(T.tokens(F.col("text"))).alias("n")
    )
    tot = docs.filter(F.col("n") > 0).agg(
        F.sum("n").alias("toks"), F.count(F.lit(1)).alias("docs")
    ).collect()[0]
    assert sum(r.tok_total for r in packed) == tot.toks
    assert sum(r.n_docs for r in packed) == tot.docs
    # chunks are contiguous per shard: ids 0..max with no gaps
    by_shard: dict[int, list[int]] = {}
    for r in packed:
        by_shard.setdefault(r.shard, []).append(r.chunk)
    for shard, chunks in by_shard.items():
        assert sorted(chunks) == list(range(len(chunks))), shard


def test_mixture_weights_normalized(spark, sf_dir):
    rows = REGISTRY["docs_mixture_weights"].fn(spark, sf_dir).collect()
    assert len(rows) == 20
    assert all(r.weight > 0 for r in rows)
    assert abs(sum(r.weight for r in rows) - 1.0) < 1e-4  # 6-dp rounding x20
