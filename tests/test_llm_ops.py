"""Engine-internal checks for the LLM-pipeline ops that have no SQL
oracle: ANN recall vs brute force, multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdatabases_spark.functions.multimodal import (
    attach_binary_payload,
    decode_stub,
    extract_features,
)
from graphdatabases_spark.functions.similarity import ann_cosine_topk, cosine_topk


def test_ann_recall_vs_brute_force(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 20)
    exact = cosine_topk(q, emb, k=5).collect()
    approx = ann_cosine_topk(q, emb, k=5, num_planes=4).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    # SRP-LSH with 4 planes on 64-dim random vectors: recall is modest but
    # must be clearly above chance (chance ≈ k/n ≈ 1%).
    hits = total = 0
    for qid, ex in exact_sets.items():
        total += len(ex)
        hits += len(ex & approx_sets.get(qid, set()))
    recall = hits / total
    assert recall >= 0.15, f"ANN recall vs brute force too low: {recall:.2f}"


def test_ann_results_are_subset_quality(spark, sf_dir):
    # Every ANN neighbor's cosine must be a real cosine from the corpus
    # (sanity: the bucket join never fabricates pairs).
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 3)
    rows = ann_cosine_topk(q, emb, k=3, num_planes=4).collect()
    for r in rows:
        assert r["query_id"] != r["neighbor_id"]
        assert -1.0 <= r["cos"] <= 1.0


class TestMultimodal:
    def test_attach_payload_metadata(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
        out = attach_binary_payload(docs, "text", "text-blob").collect()
        for r in out:
            assert r["meta"]["modality"] == "text-blob"
            assert r["meta"]["byte_len"] == len(bytes(r["payload"]))
            assert len(r["meta"]["content_sha256"]) == 64

    def test_decode_stub_raises_without_fake(self):
        with pytest.raises(NotImplementedError):
            decode_stub(b"bytes")

    def test_extract_features_mapinpandas(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(10)
        df = attach_binary_payload(docs, "text", "text-blob").select(
            "doc_id", "payload"
        )
        feats = extract_features(df, fake=True)
        rows = feats.collect()
        assert len(rows) == 10
        for r in rows:
            assert len(r["features"]) == 8
            assert all(0.0 <= v <= 1.0 for v in r["features"])
        # Deterministic: same payload → same features.
        again = {r["doc_id"]: r["features"] for r in feats.collect()}
        for r in rows:
            assert again[r["doc_id"]] == r["features"]
