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
        path, same _SIG) — not re-materialize.  Reuse is pinned on the
        _SIG file's inode+mtime: a re-stage writes a fresh tmp dir and
        renames it into place, which replaces the file.  The staging
        DIRECTORY's mtime is deliberately NOT a reuse proxy anymore —
        the round-9 ADVICE GC fix refreshes it on every successful
        resolve so the lazy-GC grace period measures time since last
        use."""
        import os

        from graphdatabases_spark.relational.dedup_queries import (
            _stage_zipf_corpus,
        )

        p1 = _stage_zipf_corpus(spark, sf_dir)
        sig1 = open(os.path.join(p1, "_SIG")).read()
        st1 = os.stat(os.path.join(p1, "_SIG"))
        dir_mtime1 = os.path.getmtime(p1)
        p2 = _stage_zipf_corpus(spark, sf_dir)
        assert p2 == p1
        assert open(os.path.join(p2, "_SIG")).read() == sig1
        st2 = os.stat(os.path.join(p2, "_SIG"))
        assert (st2.st_ino, st2.st_mtime_ns) == (st1.st_ino, st1.st_mtime_ns)
        # The use-time refresh itself: the directory reads as touched
        # no earlier than the first resolve.
        assert os.path.getmtime(p2) >= dir_mtime1

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


class TestModularityReplay:
    """graph_modularity: pure-Python replay of LPA + exact modularity on
    the collected co-purchase edges (the graph_betweenness_sampled
    pattern — values are independently hash-matched vs DuckDB; this
    pins the SPARK kernel against a from-scratch implementation)."""

    def _edges(self, spark, sf_dir):
        import pyspark.sql.functions as F

        l = (
            spark.read.parquet(f"{sf_dir}/lineitem.parquet")
            .filter(F.col("l_orderkey") % 4 == 0)
            .select("l_orderkey", "l_partkey")
        )
        return (
            l.alias("a")
            .join(
                l.alias("b"),
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"),
            )
            .distinct()
            .collect()
        )

    def test_python_replay_matches(self, spark, sf_dir):
        from collections import Counter, defaultdict

        from graphdatabases_spark.relational.graph_centrality_queries import (
            graph_modularity,
        )

        edges = [(r.src, r.dst) for r in self._edges(spark, sf_dir)]
        nbrs = defaultdict(list)
        for u, v in edges:
            nbrs[u].append(v)
            nbrs[v].append(u)
        labels = {v: v for v in nbrs}
        for _ in range(3):  # synchronous, max count then min label
            nxt = {}
            for v in nbrs:
                cnt = Counter(labels[u] for u in nbrs[v])
                best = min(((-c, lbl) for lbl, c in cnt.items()))[1]
                nxt[v] = best
            labels = nxt
        m = len(edges)
        deg = {v: len(nbrs[v]) for v in nbrs}
        d_c = Counter()
        n_c = Counter()
        for v, lbl in labels.items():
            d_c[lbl] += deg[v]
            n_c[lbl] += 1
        intra = sum(1 for u, v in edges if labels[u] == labels[v])
        sum_d2 = sum(d * d for d in d_c.values())
        q_ppm = (
            1_000_000 * (4 * m * m + 4 * m * intra - sum_d2)
        ) // (4 * m * m) - 1_000_000

        row = graph_modularity(spark, sf_dir).collect()[0]
        assert row.n_nodes == len(nbrs)
        assert row.n_edges == m
        assert row.n_communities == len(n_c)
        assert row.top_comm_nodes == max(n_c.values())
        assert row.intra_edges == intra
        assert row.q_ppm == q_ppm


class TestPhashNearDup:
    """multimodal_phash_neardup: planted-duplicate recovery through the
    REAL BMP encode→decode round-trip, and the pigeonhole band
    guarantee (≤2 flipped dHash bits can break at most 2 of 4 bands)."""

    def test_every_planted_twin_recovered(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from graphdatabases_spark.relational.llm_queries import (
            _PH_OFFSET,
            _PH_TWIN_EVERY,
            multimodal_phash_neardup,
        )

        rows = multimodal_phash_neardup(spark, sf_dir).collect()
        n_planted = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .filter(F.col("doc_id") % _PH_TWIN_EVERY == 0)
            .count()
        )
        twins = {
            (r.doc_a, r.doc_b)
            for r in rows
            if r.doc_b == r.doc_a + _PH_OFFSET
        }
        assert len(twins) == n_planted > 0
        # A twin differs in <= 2 adjacent-gradient comparisons.
        for r in rows:
            if r.doc_b == r.doc_a + _PH_OFFSET:
                assert r.ham_d <= 2

    def test_byte_contract_is_the_real_encoder(self, spark, sf_dir):
        """The sha in the output is the REAL bmp_encode payload's —
        re-derive one doc's BMP outside Spark and match it."""
        import hashlib

        import numpy as np

        from graphdatabases_spark.functions.bmp_codec import bmp_encode
        from graphdatabases_spark.relational.llm_queries import (
            _PH_H,
            _PH_W,
            multimodal_phash_neardup,
        )

        rows = multimodal_phash_neardup(spark, sf_dir).collect()
        assert rows
        doc = rows[0].doc_a
        raw = b"".join(
            hashlib.md5(f"img:{doc}:{k}".encode()).digest() for k in range(5)
        )[: _PH_W * _PH_H]
        luma = np.frombuffer(raw, np.uint8).reshape(_PH_H, _PH_W)
        want = hashlib.sha256(bmp_encode(luma).hex().encode()).hexdigest()
        assert rows[0].sha_a == want


class TestDsirWeights:
    """docs_dsir_weights: the importance weights must separate the
    target domain (en) from the rest, and the selection must be
    leakage-safe (fit on train only) and target-precise."""

    def test_target_domain_scores_highest(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from graphdatabases_spark.relational.curation_selection_queries import (
            docs_dsir_weights,
        )

        w = docs_dsir_weights(spark, sf_dir)
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "lang"
        )
        by_lang = {
            r.lang: r.avg_w
            for r in w.join(docs, "doc_id")
            .groupBy("lang")
            .agg(F.avg("w_milli").alias("avg_w"))
            .collect()
        }
        others = [v for k, v in by_lang.items() if k != "en"]
        assert by_lang["en"] > max(others)

    def test_selection_is_train_only_and_target_precise(self, spark, sf_dir):
        import pyspark.sql.functions as F

        from graphdatabases_spark.relational.curation_selection_queries import (
            docs_dsir_weights,
        )

        w = docs_dsir_weights(spark, sf_dir)
        assert w.filter(
            F.col("selected") & (F.col("split") != "train")
        ).count() == 0
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            "doc_id", "lang"
        )
        sel = w.filter(F.col("selected")).join(docs, "doc_id")
        n_sel = sel.count()
        n_en = sel.filter(F.col("lang") == "en").count()
        assert n_sel > 0
        # Majority of selected docs must actually be the target domain.
        assert n_en * 2 > n_sel


class TestRetrievalMetrics:
    """retrieval_ndcg_mrr: metric-level invariants beyond the value
    hash — the exact run pins the ceiling, and more probes never hurt
    the IVF ordering quality."""

    def test_ceiling_and_probe_monotonicity(self, spark, sf_dir):
        from graphdatabases_spark.relational.retrieval_queries import (
            retrieval_ndcg_mrr,
        )

        rows = {r.system: r for r in retrieval_ndcg_mrr(spark, sf_dir).collect()}
        assert rows["exact"].ndcg_ppm == 1_000_000
        assert rows["exact"].mrr_ppm == 1_000_000
        assert (
            rows["ivf_np1"].ndcg_ppm
            <= rows["ivf_np2"].ndcg_ppm
            <= rows["ivf_np4"].ndcg_ppm
            <= 1_000_000
        )
        for r in rows.values():
            assert 0 <= r.ndcg_ppm <= 1_000_000
            assert 0 <= r.mrr_ppm <= 1_000_000
