"""Engine-internal checks for the LLM-pipeline ops that have no SQL
oracle: ANN recall vs brute force, multimodal mapInPandas plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphdatabases_spark.functions.multimodal import (
    attach_binary_payload,
    decode_stub,
    extract_features,
    frame_sample_stub,
    resize_images,
    resize_stub,
    sample_frames,
)
from graphdatabases_spark.functions.similarity import (
    ann_cosine_topk,
    cosine_topk,
    ivf_ann_topk,
    ivf_train,
)


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


class TestIvfAnn:
    def test_ivf_recall_vs_brute_force(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 20)
        exact = cosine_topk(q, emb, k=5).collect()
        approx = ivf_ann_topk(q, emb, k=5, num_clusters=8, nprobe=2).collect()
        exact_sets, approx_sets = {}, {}
        for r in exact:
            exact_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        for r in approx:
            approx_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        hits = total = 0
        for qid, ex in exact_sets.items():
            total += len(ex)
            hits += len(ex & approx_sets.get(qid, set()))
        recall = hits / total
        # nprobe=2 of 8 clusters covers 1/4 of the corpus around the
        # query — recall must beat that coverage baseline clearly.
        assert recall >= 0.3, f"IVF recall vs brute force too low: {recall:.2f}"

    def test_ivf_deterministic(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 3)
        a = ivf_ann_topk(q, emb, k=3, num_clusters=4).orderBy("query_id", "rank").collect()
        b = ivf_ann_topk(q, emb, k=3, num_clusters=4).orderBy("query_id", "rank").collect()
        assert a == b and len(a) > 0

    def test_ivf_train_shapes(self, spark, sf_dir):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        cents = ivf_train(emb, num_clusters=4, lloyd_iters=1).collect()
        assert sorted(r["cid"] for r in cents) == [0, 1, 2, 3]
        dim = len(emb.select("embedding").first()[0])
        for r in cents:
            assert len(r["c_vec"]) == dim
            assert r["c_norm"] > 0


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

    def test_resize_stub_contracts(self):
        with pytest.raises(NotImplementedError):
            resize_stub(b"img", 8, 8)
        t = resize_stub(b"img", 8, 8, fake=True)
        assert len(t) == 64 and t == resize_stub(b"img", 8, 8, fake=True)

    def test_resize_images_mapinpandas(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(6)
        df = attach_binary_payload(docs, "text", "image").select("doc_id", "payload")
        rows = resize_images(df, width=4, height=4).collect()
        assert len(rows) == 6
        for r in rows:
            assert len(bytes(r["thumb"])) == 16  # exact w*h size contract
            assert (r["thumb_w"], r["thumb_h"]) == (4, 4)

    def test_frame_sample_stub_contracts(self):
        with pytest.raises(NotImplementedError):
            frame_sample_stub(b"vid", 3)
        frames = frame_sample_stub(b"vid", 3, fake=True)
        assert len(frames) == 3 and len(set(frames)) == 3  # distinct frames

    def test_sample_frames_fanout(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
        df = attach_binary_payload(docs, "text", "video").select("doc_id", "payload")
        rows = sample_frames(df, num_frames=4).collect()
        assert len(rows) == 5 * 4  # 1→N fan-out inside the Arrow batch
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
        for idxs in by_doc.values():
            assert sorted(idxs) == [0, 1, 2, 3]


class TestHllCardinality:
    """dedup_hll_cardinality estimator sanity (values are separately
    hash-matched against the DuckDB oracle): both branches engage at
    the fixture scales and the m=64 sketch stays within sane error."""

    def test_estimator_behaves(self, spark, sf_dir):
        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = REGISTRY["dedup_hll_cardinality"].fn(spark, sf_dir).collect()
        assert {r["shard"] for r in rows} == {0, 1, 2, 3}
        for r in rows:
            assert r["exact_distinct"] <= r["n_rows"]
            assert 0 <= r["n_zero_registers"] <= 64
            # m=64 -> sigma ~ 1.04/8 = 13%; 50% is a hard sanity wall.
            assert r["rel_err"] < 0.5, r
            assert r["hll_estimate"] > 0


class TestCmsHeavyHitters:
    def test_one_sided_guarantee(self, spark, sf_dir):
        """CMS never underestimates (min over d hashed counters each
        >= the true count); with w=256 >> top-20 load, most heavy
        hitters should estimate exactly."""
        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = REGISTRY["text_cms_heavy_hitters"].fn(spark, sf_dir).collect()
        assert len(rows) == 20
        assert all(r["overestimate"] >= 0 for r in rows)
        exact_hits = sum(1 for r in rows if r["overestimate"] == 0)
        assert exact_hits >= 10, [
            (r["tok"], r["overestimate"]) for r in rows
        ]


class TestSketchMergeability:
    """dedup_hll_merge / text_cms_merge: the merge-tree property itself
    (values are separately hash-matched against the DuckDB oracles)."""

    def test_hll_merge_equals_whole_and_estimates_agree(self, spark, sf_dir):
        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = REGISTRY["dedup_hll_merge"].fn(spark, sf_dir).collect()
        assert 1 <= len(rows) <= 64
        assert all(r["registers_equal"] for r in rows)
        assert all(1 <= r["n_shards_present"] <= 8 for r in rows)

        # The estimator over merged registers IS the whole-corpus
        # estimator — same harmonic sum, same zero-register count.
        def estimate(regs: dict[int, int]) -> float:
            import math

            s = sum(2 ** (50 - m) for m in regs.values())
            zeros = 64 - len(regs)
            raw = 0.709 * 4096.0 * (2**50 / float(s + zeros * 2**50))
            if raw <= 160.0 and zeros > 0:
                return 64.0 * round(math.log(64.0 / zeros), 9)
            return raw

        merged = estimate({r["j"]: r["m_merged"] for r in rows})
        whole = estimate({r["j"]: r["m_whole"] for r in rows})
        assert merged == whole

    def test_hll_merge_is_idempotent_and_order_free(self, spark, sf_dir):
        """Register MAX tolerates re-delivery and any tree shape: fold
        the shard sketches twice over (and in reverse), same registers."""
        from graphdatabases_spark.functions import text as T
        from pyspark.sql import functions as F

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        hh = T.portable_hash64(T.fingerprint(F.col("text")))
        rk = docs.select(
            (F.col("doc_id") % 8).alias("shard"),
            (hh % 64).alias("j"),
            F.when(F.shiftright(hh, 6) == 0, F.lit(43))
            .otherwise(F.lit(43) - F.length(F.bin(F.shiftright(hh, 6))))
            .alias("rank"),
        )
        shard_regs = [
            {
                (r["j"]): r["m"]
                for r in rk.filter(F.col("shard") == s)
                .groupBy("j")
                .agg(F.max("rank").alias("m"))
                .collect()
            }
            for s in range(8)
        ]

        def merge(a, b):
            out = dict(a)
            for j, m in b.items():
                out[j] = max(out.get(j, -1), m)
            return out

        fwd: dict = {}
        for s in shard_regs:
            fwd = merge(fwd, s)
        rev: dict = {}
        for s in reversed(shard_regs):
            rev = merge(rev, s)
            rev = merge(rev, s)  # duplicated delivery
        assert fwd == rev

    def test_cms_merge_equals_whole(self, spark, sf_dir):
        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = REGISTRY["text_cms_merge"].fn(spark, sf_dir).collect()
        assert 4 <= len(rows) <= 4 * 256
        assert {r["r"] for r in rows} == {0, 1, 2, 3}
        assert all(r["cells_equal"] for r in rows)
        assert all(0 <= r["bucket"] < 256 for r in rows)
        # Fixed-size sketch: per-row cell count bounded by width.
        from collections import Counter

        per_row = Counter(r["r"] for r in rows)
        assert all(c <= 256 for c in per_row.values())


class TestIvfRecallCurve:
    """similarity_ivf_recall: the operating-curve shape itself (values
    are separately hash-matched against the DuckDB oracle)."""

    def test_recall_monotone_in_nprobe(self, spark, sf_dir):
        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["nprobe"]: r
            for r in REGISTRY["similarity_ivf_recall"].fn(spark, sf_dir).collect()
        }
        assert sorted(rows) == [1, 2, 4]
        k, nq = 5, 20
        prev = -1.0
        for p in (1, 2, 4):
            r = rows[p]
            assert r["n_queries"] == nq
            assert 0 < r["n_results"] <= k * nq
            assert 0 <= r["n_hits"] <= r["n_results"]
            # Probing a superset of cells can only add candidates, and
            # top-k over a candidate superset never loses true hits
            # ranked above the cutoff — recall is nondecreasing.
            assert r["recall_at_k"] >= prev, (p, rows)
            prev = r["recall_at_k"]
        # Probing half the 8 cells must do clearly better than chance.
        assert rows[4]["recall_at_k"] >= 0.5


class TestIvfPersistence:
    """ivf_write / ivf_load / ivf_query_disk: the serving split — probe
    a persisted index reading ONLY the probed cells' partitions."""

    def test_disk_probe_equals_memory_and_prunes_partitions(
        self, spark, sf_dir, tmp_path
    ):
        from graphdatabases_spark.functions.similarity import (
            ivf_build,
            ivf_load,
            ivf_query,
            ivf_query_disk,
            ivf_write,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5)
        index = ivf_build(emb, num_clusters=8, lloyd_iters=1)
        path = str(tmp_path / "ivf")
        ivf_write(index, path)

        mem = sorted(
            tuple(r) for r in ivf_query(index, q, k=3, nprobe=2).collect()
        )
        loaded = sorted(
            tuple(r)
            for r in ivf_query(ivf_load(spark, path), q, k=3, nprobe=2)
            .select("query_id", "neighbor_id", "cos", "rank")
            .collect()
        )
        disk_df = ivf_query_disk(spark, path, q, k=3, nprobe=2)
        disk = sorted(tuple(r) for r in disk_df.collect())
        mem_rows = [
            (r[0], r[1], r[2], r[3])
            for r in mem
        ]
        assert loaded == disk == sorted(mem_rows)

        # Partition pruning: with 5 queries x nprobe=2 over 8 cells, at
        # least one cell is unprobed, and the scan's input files must
        # come ONLY from probed cid= directories.
        cents = ivf_load(spark, path)[0]
        from graphdatabases_spark.functions.similarity import (
            _nearest_centroids,
            with_norm,
        )

        qn = with_norm(q, "embedding").select(
            F.col("vec_id").alias("query_id"), "_vec", "_norm"
        )
        probed = {
            r["cid"]
            for r in _nearest_centroids(qn, cents, 2, "query_id")
            .select("cid")
            .distinct()
            .collect()
        }
        assert len(probed) < 8, "fixture probes every cell; widen clusters"
        # inputFiles() lists the relation's files BEFORE pruning; the
        # plan's PartitionFilters show what the scan actually reads.
        plan = disk_df._jdf.queryExecution().executedPlan().toString()
        pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "cid" in pf, plan
        import re as _re

        m = _re.search(r"IN \(([^)]*)\)", pf)
        assert m, pf
        plan_cids = {int(x) for x in m.group(1).split(",")}
        assert plan_cids == probed, (plan_cids, probed)


class TestQuantizedRecallCurve:
    """similarity_quantized_recall: curve shape (values are separately
    hash-matched against the DuckDB oracle at four scale factors)."""

    def test_error_shrinks_and_recall_holds_as_bits_grow(self, spark, sf_dir):
        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["bits"]: r
            for r in REGISTRY["similarity_quantized_recall"]
            .fn(spark, sf_dir)
            .collect()
        }
        assert sorted(rows) == [4, 6, 8]
        k, nq = 5, 20
        for b in (4, 6, 8):
            r = rows[b]
            assert r["n_queries"] == nq
            assert r["n_results"] == k * nq
            assert 0 <= r["n_hits"] <= r["n_results"]
            assert abs(r["bytes_ratio"] - b / 32.0) < 1e-9
        # Finer grids approximate every coordinate at least as well;
        # the aggregate |cos error| must drop as bits grow.
        assert (
            rows[4]["mean_abs_err"]
            > rows[6]["mean_abs_err"]
            > rows[8]["mean_abs_err"]
        )
        # 8-bit quantization is the production operating point: it must
        # recover nearly all fp neighbors, and clearly beat 4-bit.
        assert rows[8]["recall_at_k"] >= 0.9
        assert rows[8]["recall_at_k"] >= rows[4]["recall_at_k"]


class TestIvfIncrementalAppend:
    """ivf_append: new batch lands ONLY in its receiving cells, every
    resident file stays byte-identical, and a disk probe afterwards
    equals an in-memory query over the union corpus assigned to the
    SAME (untouched) centroids."""

    def test_append_is_incremental_and_query_equivalent(
        self, spark, sf_dir, tmp_path
    ):
        import hashlib
        import os

        from graphdatabases_spark.functions.similarity import (
            ivf_append,
            ivf_build,
            ivf_query,
            ivf_query_disk,
            ivf_write,
            with_norm,
            _nearest_centroids,
        )

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        base = emb.filter(F.col("vec_id") % 3 != 0)
        batch = emb.filter(F.col("vec_id") % 3 == 0)
        assert batch.count() > 0

        path = str(tmp_path / "ivf")
        cents, _ = index = ivf_build(base, num_clusters=8, lloyd_iters=1)
        ivf_write(index, path)

        def file_hashes(root):
            out = {}
            for dirpath, _, files in os.walk(f"{root}/corpus"):
                for f in files:
                    if f.endswith(".parquet"):
                        p = os.path.join(dirpath, f)
                        out[p] = hashlib.md5(open(p, "rb").read()).hexdigest()
            return out

        before = file_hashes(path)
        touched = ivf_append(spark, path, batch)
        after = file_hashes(path)

        # Every resident file survives byte-identical; new files appear
        # only under the touched cells' directories.
        assert set(before) <= set(after)
        assert all(after[p] == h for p, h in before.items())
        new_files = set(after) - set(before)
        assert new_files
        for p in new_files:
            cid = int(p.split("cid=")[1].split("/")[0])
            assert cid in touched, (p, touched)

        # Probing the appended index == in-memory query over the union
        # corpus assigned to the SAME centroids (no re-train).
        q = emb.filter(F.col("vec_id") < 5)
        u = with_norm(emb).select(
            F.col("vec_id").alias("neighbor_id"), "_vec", "_norm"
        )
        union_idx = _nearest_centroids(
            u, cents, nprobe=1, id_name="neighbor_id"
        ).select(
            "cid",
            "neighbor_id",
            F.col("_vec").alias("c_vec2"),
            F.col("_norm").alias("c_norm2"),
        )
        want = sorted(
            tuple(r)
            for r in ivf_query((cents, union_idx), q, k=3, nprobe=2).collect()
        )
        got = sorted(
            tuple(r)
            for r in ivf_query_disk(spark, path, q, k=3, nprobe=2).collect()
        )
        assert got == want and len(got) > 0


class TestMinhashRecallCurve:
    """dedup_minhash_recall: banding S-curve shape (values are
    separately hash-matched against the DuckDB oracle)."""

    def test_recall_monotone_in_band_count(self, spark, sf_dir):
        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["bands"]: r
            for r in REGISTRY["dedup_minhash_recall"].fn(spark, sf_dir).collect()
        }
        assert sorted(rows) == [2, 4, 8]
        truth = {r["n_truth"] for r in rows.values()}
        assert len(truth) == 1 and truth.pop() > 0
        for r in rows.values():
            assert r["bands"] * r["rows_per_band"] == 16
            assert 0 <= r["n_hit"] <= min(r["n_candidates"], r["n_truth"])
            assert 0.0 <= r["recall"] <= 1.0
            assert 0.0 <= r["precision"] <= 1.0
        # More bands of fewer rows = strictly more permissive: every
        # (2x8) candidate band match implies a (4x4) match on each
        # half, and so on — candidates and recall are nondecreasing.
        assert rows[2]["n_candidates"] <= rows[4]["n_candidates"] <= rows[8]["n_candidates"]
        assert rows[2]["recall"] <= rows[4]["recall"] <= rows[8]["recall"]
        # The permissive end must actually catch near-everything at
        # Jaccard >= 0.5 (16-hash, 2-row bands sit far up the S-curve).
        assert rows[8]["recall"] >= 0.9


class TestSelfJoinSizeSketch:
    """join_selfjoin_size_cms: the AMS sign sketch must be an accurate
    unbiased F2 estimate (values are oracle-hash-matched separately)."""

    def test_rows_estimate_f2_accurately(self, spark, sf_dir):
        import statistics

        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = REGISTRY["join_selfjoin_size_cms"].fn(spark, sf_dir).collect()
        assert [r["r"] for r in rows] == [0, 1, 2, 3]
        exact = {r["exact_pairs"] for r in rows}
        assert len(exact) == 1
        exact = exact.pop()
        # Replay exact F2 in Python.
        from collections import Counter

        f = Counter(
            r.l_partkey
            for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .select("l_partkey")
            .collect()
        )
        assert exact == sum(v * v for v in f.values())
        # w=256 -> rel std ~ sqrt(2/256) ~ 8.8%; allow 5 sigma per row
        # and 3 sigma on the median of the 4 independent rows.
        for r in rows:
            assert r["row_estimate"] > 0
            assert abs(r["row_estimate"] - exact) / exact < 0.45, r
            assert r["err_ppm"] == (1000000 * r["row_estimate"]) // exact - 1000000
        med = statistics.median(r["row_estimate"] for r in rows)
        assert abs(med - exact) / exact < 0.27


class TestTruncationRecallCurve:
    """similarity_truncation_recall: curve shape (values are separately
    hash-matched against the DuckDB oracle)."""

    def test_identity_anchor_and_monotonicity(self, spark, sf_dir):
        from graphdatabases_spark.functions.similarity import EMBEDDING_DIM
        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["dims"]: r
            for r in REGISTRY["similarity_truncation_recall"]
            .fn(spark, sf_dir)
            .collect()
        }
        assert sorted(rows) == [16, 32, 64]
        for d, r in rows.items():
            assert r["n_queries"] == 20
            assert r["n_results"] == 100
            assert 0 <= r["n_hits"] <= 100
            assert abs(r["bytes_ratio"] - d / EMBEDDING_DIM) < 1e-9
        # Full width IS the exact ranking: the anchor must be perfect.
        assert rows[EMBEDDING_DIM]["recall_at_k"] == 1.0
        # More prefix dimensions never hurt on this isotropic fixture.
        assert rows[16]["recall_at_k"] <= rows[32]["recall_at_k"] <= 1.0


class TestEmbeddingSourceDrift:
    """embedding_source_drift: Python replay of the centroid algebra."""

    def test_centroids_replay(self, spark, sf_dir):
        import math
        from collections import defaultdict

        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["source"]: r
            for r in REGISTRY["embedding_source_drift"].fn(spark, sf_dir).collect()
        }
        src_of = {
            d.doc_id: d.source
            for d in spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "source")
            .collect()
        }
        sums = defaultdict(lambda: [0.0] * 64)
        cnt = defaultdict(int)
        gsum = [0.0] * 64
        gn = 0
        for e in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect():
            s = src_of[e.vec_id]
            cnt[s] += 1
            gn += 1
            for i, x in enumerate(e.embedding):
                sums[s][i] += x
                gsum[i] += x
        gc = [v / gn for v in gsum]
        assert set(rows) == set(cnt)
        for s, r in rows.items():
            c = [v / cnt[s] for v in sums[s]]
            l2 = math.sqrt(sum((a - b) ** 2 for a, b in zip(c, gc)))
            dot = sum(a * b for a, b in zip(c, gc))
            cos = dot / max(
                math.sqrt(sum(a * a for a in c))
                * math.sqrt(sum(b * b for b in gc)),
                1e-30,
            )
            assert r["n_vecs"] == cnt[s]
            assert abs(r["l2_drift"] - l2) < 1e-6
            assert abs(r["cos_global"] - cos) < 1e-6
            assert -1.0 - 1e-9 <= r["cos_global"] <= 1.0 + 1e-9


class TestRakeKeywords:
    """text_rake_keywords: Python replay of islands + degree/freq."""

    def test_rake_replay(self, spark, sf_dir):
        import re
        from collections import Counter

        from graphdatabases_spark.functions.text import LANG_STOPWORDS
        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = REGISTRY["text_rake_keywords"].fn(spark, sf_dir).collect()
        assert 1 <= len(rows) <= 20
        keys = [(-r["score_ppm"], r["phrase"]) for r in rows]
        assert keys == sorted(keys)

        stops = {w for ws in LANG_STOPWORDS.values() for w in ws}
        phrases: Counter[tuple] = Counter()
        for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
            toks = [
                t
                for t in re.split(r"[^a-z0-9]+", d.text.lower().strip())
                if t
            ]
            run: list[str] = []
            for t in toks + ["<stop>"]:
                if t in stops or t == "<stop>":
                    if run:
                        phrases[tuple(run)] += 1
                    run = []
                else:
                    run.append(t)
        freq: Counter[str] = Counter()
        degree: Counter[str] = Counter()
        for p, c in phrases.items():
            for w in p:
                freq[w] += c
                degree[w] += c * len(p)
        scored = {
            " ".join(p): (
                len(p),
                c,
                sum((1000000 * degree[w]) // freq[w] for w in p),
            )
            for p, c in phrases.items()
        }
        want = sorted(scored.items(), key=lambda kv: (-kv[1][2], kv[0]))[:20]
        got = [(r["phrase"], (r["n_words"], r["freq"], r["score_ppm"])) for r in rows]
        assert got == want


class TestSemanticSemdedup:
    """dedup_semantic_semdedup: planted-near-dup recovery invariant +
    the PQ-ADC curve's shape law (more subspaces never hurt recall of
    the planted structure here — the curve itself is oracle-checked)."""

    def test_planted_twin_recovery(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from graphdatabases_spark.functions import similarity as S
        from graphdatabases_spark.relational.dedup_queries import (
            _PLANT_OFFSET,
            dedup_semantic_semdedup,
        )

        rows = dedup_semantic_semdedup(spark, sf_dir).collect()
        n_emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
        assert rows, "no near-dups recovered"
        # The greedy keep-best rule must NEVER drop an original: twins
        # inherit their document's quality, so the id tiebreak always
        # keeps the lower (original) id.
        assert all(r["dropped_id"] >= _PLANT_OFFSET for r in rows)
        assert all(
            r["kept_id"] == r["dropped_id"] - _PLANT_OFFSET for r in rows
        )
        assert all(r["cos"] >= 0.99 for r in rows)
        # Recovery is bounded by the cell assignment (a twin can stray
        # across a k-means cell boundary — SemDeDup's documented recall
        # limitation); measured 497/500 at sf0.001, 498/500 at sf0.01.
        recovered = len(rows) / n_emb
        assert recovered >= 0.98, f"recovery {recovered:.3f} < 0.98"

        # Every MISSED twin must be explained by a cell split — same
        # corpus, same deterministic build, twin's cid != original's.
        missed = set(range(n_emb)) - {
            r["dropped_id"] - _PLANT_OFFSET for r in rows
        }
        if missed:
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
            corpus = emb.select(
                "vec_id",
                F.transform(
                    F.col("embedding"), lambda x: x.cast("double")
                ).alias("embedding"),
            ).unionByName(planted)
            _, cidx = S.ivf_build(corpus, num_clusters=8, lloyd_iters=1)
            cid_of = {
                r["neighbor_id"]: r["cid"]
                for r in cidx.select("neighbor_id", "cid").collect()
            }
            for orig in missed:
                assert cid_of[orig] != cid_of[orig + _PLANT_OFFSET], (
                    f"vec {orig}'s twin shares its cell yet was not dropped"
                )
