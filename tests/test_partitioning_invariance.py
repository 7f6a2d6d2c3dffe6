"""Partitioning-invariance gate: results must not depend on the plan's
physical parallelism.

SCALE.md claims every catalog entry is deterministic under re-partitioning
(order-free DECIMAL accumulators, 6-dp rounding anchors, tie-broken
sorts). At 100 TB the partition count is whatever AQE / the cluster
picks that day, so "same answer under a different partitioning" is the
distributed-correctness property — a float sum whose value shifts with
the reduce-side partition count WILL flip a rounded digit eventually and
fail the driver's exact value-hash gate non-reproducibly.

This test enforces the claim on the entries whose accumulation order is
most at the mercy of partitioning (floating aggregates, pandas
GROUPED_AGG folds, tf-idf logs, iterative PageRank, decimal moments):
each is computed under the session's defaults (8 shuffle partitions,
128 MiB splits, AQE on) and again under TWO adversarial layouts (see
VARIANTS: the combined worst case, and a scan-split-only sweep that
isolates spark.sql.files.maxPartitionBytes) — every run must be
EXACTLY equal to the baseline (compare_frames MATCH; NEAR's 1e-9
tolerance is a failure here because the driver hashes exact values).

Scale factor: sf0.01, not the usual sf0.001 — at sf0.001 every file fits
one 16 KiB split and the scan-side reorder would be vacuous.
"""

from __future__ import annotations

import pytest

from graphdatabases_spark.relational import queries

from tests.oracle_utils import compare_frames

SF_DIR = "/root/testdata/sf0.01"

# Entries with order-sensitive accumulation if implemented naively.
ENTRIES = [
    "q1_pricing_summary",        # sum/avg over the biggest fact table
    "agg_stats",                 # avg/stddev moments
    "agg_percentile",            # exact percentiles need a global view
    "udaf_priority_geomean",     # pandas GROUPED_AGG log-space fold
    "window_running_sum",        # frame order under re-partitioned input
    "text_tfidf_topterms",       # log-idf floats + top-k ties
    "embedding_norm_outliers",   # decimal-exact moments claim
    "docs_mixture_weights",      # DECIMAL(28,15) order-free normalizer claim
    "text_repetition_score",     # per-row folds (should be trivially stable)
    "similarity_cosine_topk",    # float dot products + top-k ties
    "udf_embedding_l2norm",      # pandas scalar UDF over re-batched input
    "copurchase_lift",           # ratio-of-counts floats
    "graph_pagerank",            # iterative float mass-passing
    "dedup_minhash_signatures",  # per-doc min-folds over exploded shingles
    "dedup_simhash",             # conditional-sum wide agg
    "docs_pack_chunks",          # shard-partitioned running-sum window
    "kmeans_embeddings",         # 5-round float fit + assignment
    "graph_connected_components",  # iterative min-propagation fixpoint
    # round-6 curation additions
    "docs_select_budget",        # quality-ranked window, ties by doc_id
    "docs_unigram_surprise",     # vocab join + per-doc integer sums
    "docs_substring_dedup",      # posting-list df join over exploded grams
    # round-7 curation additions
    "docs_substring_strip",      # dup-position collect_set + rebuild fold
    "docs_bm25_topk",            # decimal term sums + exact top-k cutoff
    "graph_ppr_grid",            # iterative float mass-passing (teleport)
    "orders_quantile_histogram",  # two-pass rank selection across buckets
    # round-7 continuation-3 additions
    "graph_anf_hyperball",       # DECIMAL(28,6)-summed per-node HLL estimates
    "graph_harmonic_centrality",  # integer micro-unit shells + top-k ties
    "events_cuped_adjustment",   # decimal moments -> closed-form doubles
    "similarity_truncation_recall",  # float dots + per-dims top-k ties
    # round-11 additions
    "graph_pagerank_incremental",  # fixed-point integer warm-start ranks
    "graph_random_walks",          # hash-pick chain over ranked adjacency
    "graph_temporal_latest_dep",   # delta-frontier MAX relaxation + top-k
    # round-12 additions
    "graph_node2vec_walks",        # second-order class-weighted hash picks
    "graph_cc_incremental",        # quotient-contraction warm-start labels
    "docs_tok_kll_quantiles",      # two-level rank-sampled sketch serving
    "graph_mis_luby",              # fixed-priority parallel symmetry breaking
    "graph_matching_greedy",       # argmin-edge parallel matching rounds
    "events_ewma_hourly",          # 719-step integer recurrence fold
]

# Two adversarial layouts, exercised separately so a failure localizes
# to the knob that caused it:
#   all-knobs — tiny reduce side (3 shuffle partitions), 16 KiB scan
#     splits, AQE off: the combined worst case.
#   scan-splits-only — ONLY spark.sql.files.maxPartitionBytes dropped to
#     64 KiB, AQE and reduce parallelism left at session defaults: the
#     pure map-side re-split a 100 TB scan sees when the cluster's split
#     sizing changes, with AQE free to re-coalesce (the regime the
#     all-knobs variant disables).
VARIANTS = {
    "all-knobs": {
        "spark.sql.shuffle.partitions": "3",
        "spark.sql.files.maxPartitionBytes": str(16 * 1024),
        "spark.sql.adaptive.enabled": "false",
    },
    "scan-splits-only": {
        "spark.sql.files.maxPartitionBytes": str(64 * 1024),
    },
}


@pytest.fixture(scope="module")
def qs():
    return queries()


_BASELINES: dict[str, object] = {}


def _baseline(spark, fn, name):
    if name not in _BASELINES:
        _BASELINES[name] = fn(spark, SF_DIR).toPandas()
    return _BASELINES[name]


@pytest.mark.parametrize("variant", sorted(VARIANTS))
@pytest.mark.parametrize("name", ENTRIES)
def test_result_invariant_to_partitioning(spark, qs, name, variant):
    fn = qs[name]
    baseline = _baseline(spark, fn, name)

    confs = VARIANTS[variant]
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        reshaped = fn(spark, SF_DIR).toPandas()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    verdict, detail = compare_frames(baseline, reshaped)
    assert verdict == "MATCH", (
        f"{name} not partitioning-invariant under {variant} "
        f"({verdict}): {detail} — an accumulation order leaked into "
        "the result; anchor it (DECIMAL accumulator or round() before "
        "compare/sort)."
    )
