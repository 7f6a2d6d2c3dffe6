"""Engine-side invariants for the round-7 batch-10 curation entries
(values are separately hash-matched against the DuckDB oracles)."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphdatabases_spark.functions import text as T
from graphdatabases_spark.relational import REGISTRY, queries


class TestSplitManifest:
    def _assignment(self, spark, sf_dir):
        b = (
            T.portable_hash64(
                F.concat(F.lit("splt"), F.col("doc_id").cast("string"))
            )
            % 10
        )
        split = (
            F.when(b < 8, F.lit("train"))
            .when(b == 8, F.lit("val"))
            .otherwise(F.lit("test"))
        )
        return (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", split.alias("split"))
        )

    def test_no_doc_in_two_splits(self, spark, sf_dir):
        """Leakage check: pairwise split intersections are EMPTY."""
        a = self._assignment(spark, sf_dir)
        for s1, s2 in [("train", "val"), ("train", "test"), ("val", "test")]:
            leaked = (
                a.filter(F.col("split") == s1)
                .select("doc_id")
                .join(
                    a.filter(F.col("split") == s2).select("doc_id"), "doc_id"
                )
                .count()
            )
            assert leaked == 0, (s1, s2)

    def test_splits_partition_every_stratum(self, spark, sf_dir):
        """Per-stratum split counts sum to the stratum size, and the
        manifest covers every document exactly once."""
        queries()
        rows = REGISTRY["docs_split_manifest"].fn(spark, sf_dir).collect()
        total_docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        )
        assert sum(r["n_docs"] for r in rows) == total_docs
        from collections import defaultdict

        per_stratum = defaultdict(int)
        for r in rows:
            per_stratum[(r["source"], r["lang"])] += r["n_docs"]
            assert r["n_docs"] <= r["stratum_docs"]
        for r in rows:
            assert per_stratum[(r["source"], r["lang"])] == r["stratum_docs"]

    def test_realized_fractions_track_8_1_1(self, spark, sf_dir):
        """Global realized fractions sit near the configured 80/10/10
        (md5 buckets are uniform; wide tolerance for small strata)."""
        queries()
        rows = REGISTRY["docs_split_manifest"].fn(spark, sf_dir).collect()
        from collections import Counter

        n = Counter()
        for r in rows:
            n[r["split"]] += r["n_docs"]
        total = sum(n.values())
        assert 0.70 <= n["train"] / total <= 0.90
        assert 0.03 <= n["val"] / total <= 0.20
        assert 0.03 <= n["test"] / total <= 0.20

    def test_assignment_is_repartition_invariant(self, spark, sf_dir):
        """The draw depends only on doc_id: reshuffling the input
        produces the identical manifest."""
        queries()
        base = REGISTRY["docs_split_manifest"].fn(spark, sf_dir).collect()
        fn = REGISTRY["docs_split_manifest"].fn
        import graphdatabases_spark.relational.catalog as C

        orig = C.table

        def shuffled(spark_, sf_, name):
            df = orig(spark_, sf_, name)
            return df.repartition(7) if name == "documents" else df

        C.table = shuffled
        try:
            import graphdatabases_spark.relational.curation_queries as CQ

            CQ.table = shuffled
            again = fn(spark, sf_dir).collect()
        finally:
            C.table = orig
            CQ.table = orig
        assert [tuple(r) for r in base] == [tuple(r) for r in again]


class TestSplitContamination:
    def test_matrix_shape_and_bounds(self, spark, sf_dir):
        queries()
        rows = REGISTRY["docs_split_contamination"].fn(spark, sf_dir).collect()
        pairs = {(r["split_a"], r["split_b"]) for r in rows}
        assert pairs <= {("test", "train"), ("test", "val"), ("train", "val")}
        assert len(rows) >= 1
        for r in rows:
            assert r["split_a"] < r["split_b"]
            assert 0 < r["n_shared"] <= min(r["n_grams_a"], r["n_grams_b"])
            assert 0.0 < r["containment"] <= 1.0

    def test_shared_counts_match_python_replay(self, spark, sf_dir):
        """Whole-matrix replay: per-split distinct 3-gram sets built in
        Python must reproduce every pairwise intersection size."""
        from graphdatabases_spark.functions import text as T
        from pyspark.sql import functions as F

        b = (
            T.portable_hash64(
                F.concat(F.lit("splt"), F.col("doc_id").cast("string"))
            )
            % 10
        )
        split = (
            F.when(b < 8, F.lit("train"))
            .when(b == 8, F.lit("val"))
            .otherwise(F.lit("test"))
        )
        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(split.alias("split"), "text")
            .collect()
        )
        import re as _re

        sets: dict = {}
        for r in docs:
            toks = [t for t in _re.split(r"[^a-z0-9]+", r["text"].strip().lower()) if t]
            if len(toks) < 3:
                continue
            grams = {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            }
            sets.setdefault(r["split"], set()).update(grams)
        queries()
        rows = REGISTRY["docs_split_contamination"].fn(spark, sf_dir).collect()
        for r in rows:
            expect = len(sets[r["split_a"]] & sets[r["split_b"]])
            assert r["n_shared"] == expect, (r, expect)
            assert r["n_grams_a"] == len(sets[r["split_a"]])
            assert r["n_grams_b"] == len(sets[r["split_b"]])


class TestSplitRebalance:
    """Water-filling quota invariants for ``docs_split_rebalance``."""

    def _frame(self, spark, sf_dir):
        return queries()["docs_split_rebalance"](spark, sf_dir).collect()

    def test_budget_exhausted_exactly(self, spark, sf_dir):
        """sum(quota) == floor(0.6 * train tokens) EXACTLY whenever at
        least one stratum is capped (the remainder distribution closes
        the integer-division gap); if nothing is capped the whole train
        corpus fit inside the budget."""
        rows = self._frame(spark, sf_dir)
        total = sum(r.stratum_toks for r in rows)
        budget = (total * 3) // 5
        alloc = sum(r.quota_toks for r in rows)
        if any(r.capped for r in rows):
            assert alloc == budget
        else:
            assert alloc == total <= budget

    def test_quota_never_exceeds_stratum(self, spark, sf_dir):
        for r in self._frame(spark, sf_dir):
            assert 0 <= r.quota_toks <= r.stratum_toks
            assert (r.capped == 0) == (r.quota_toks == r.stratum_toks) or (
                # a capped stratum may coincidentally equal the level
                r.capped == 1 and r.quota_toks <= r.stratum_toks
            )

    def test_water_level_is_flat(self, spark, sf_dir):
        """All capped strata sit within one token of a single level,
        and every uncapped stratum is no larger than that level — the
        defining property of water-filling."""
        rows = self._frame(spark, sf_dir)
        capped = [r.quota_toks for r in rows if r.capped]
        if not capped:
            return
        lo, hi = min(capped), max(capped)
        assert hi - lo <= 1
        for r in rows:
            if not r.capped:
                assert r.stratum_toks <= hi


class TestRebalanceSelect:
    """Quota-application invariants for ``docs_rebalance_select``."""

    def test_selection_respects_every_quota(self, spark, sf_dir):
        sel = {
            (r.source, r.lang): r
            for r in queries()["docs_rebalance_select"](
                spark, sf_dir
            ).collect()
        }
        quo = {
            (r.source, r.lang): r
            for r in queries()["docs_split_rebalance"](
                spark, sf_dir
            ).collect()
        }
        assert set(sel) == set(quo)
        for key, r in sel.items():
            q = quo[key]
            assert r.quota_toks == q.quota_toks
            assert 0 <= r.tok_selected <= r.quota_toks
            assert 0 <= r.n_selected <= q.n_docs
            assert r.quota_util <= 1.0
            # An uncapped stratum's quota equals its full size, so
            # greedy whole-document packing fills it exactly.
            if not q.capped:
                assert r.tok_selected == q.stratum_toks == r.quota_toks


class TestBigramLmScore:
    """Python replay of the stupid-backoff bigram LM at sf0.001 —
    proves the engine's conditional-surprise arithmetic and that only
    TRAIN-split counts ever reach the model (no eval leakage)."""

    def test_matches_pure_python_replay(self, spark, sf_dir):
        import hashlib
        import re
        from collections import Counter

        docs = (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text")
            .collect()
        )

        def toks(text):
            return [
                t
                for t in re.split(r"[^a-z0-9]+", text.strip().lower())
                if t
            ]

        def bucket(doc_id):
            h = hashlib.md5(f"splt{doc_id}".encode()).hexdigest()[:12]
            return int(h, 16) % 10

        uni, bi = Counter(), Counter()
        val = {}
        for r in docs:
            ts = toks(r.text)
            b = bucket(r.doc_id)
            if b < 8:
                uni.update(ts)
                bi.update(zip(ts, ts[1:]))
            elif b == 8 and len(ts) >= 2:
                val[r.doc_id] = ts
        n_total = sum(uni.values())
        bits = lambda x: x.bit_length() - 1  # noqa: E731

        expect = {}
        for doc_id, ts in val.items():
            s = nb = no = 0
            pairs = list(zip(ts, ts[1:]))
            for w1, w2 in pairs:
                if (w1, w2) in bi:
                    s += bits(uni[w1] // bi[(w1, w2)])
                elif w2 in uni:
                    s += 4 + bits(n_total // uni[w2])
                    nb += 1
                else:
                    s += 8 + bits(n_total)
                    no += 1
            expect[doc_id] = (len(pairs), nb, no, s)

        got = {
            r.doc_id: (r.n_bigrams, r.n_backoff, r.n_oov, r.sum_surprise)
            for r in queries()["docs_bigram_lm_score"](
                spark, sf_dir
            ).collect()
        }
        assert got == expect and len(got) > 0


class TestBloomPrefilter:
    """join_bloom_prefilter: the no-false-negative contract and the
    theoretical false-positive envelope (values are separately
    hash-matched against the DuckDB oracle at four scale factors)."""

    def test_never_false_negative_and_fp_within_theory(self, spark, sf_dir):
        import math

        rows = queries()["join_bloom_prefilter"](spark, sf_dir).collect()
        assert rows
        m, k = 65536, 3
        for r in rows:
            # Every true match must survive the filter.
            assert r.n_candidates >= r.n_true_matches
            assert r.n_false_pos == r.n_candidates - r.n_true_matches
            assert r.n_bits_set <= min(k * r.n_build, m)
            # Realized fp rate should sit near (1 - e^(-kn/m))^k; allow
            # a generous band (small-sample noise at tiny SFs).
            theory = (1.0 - math.exp(-k * r.n_build / m)) ** k
            assert r.fp_rate <= max(3 * theory, 0.003), (r.fp_rate, theory)


class TestShardRebalance:
    """docs_shard_rebalance: the rendezvous minimal-movement law."""

    def test_hrw_moves_only_to_the_new_shard_and_less_than_modulo(
        self, spark, sf_dir
    ):
        rows = queries()["docs_shard_rebalance"](spark, sf_dir).collect()
        assert rows
        tot = sum(r.n_docs for r in rows)
        hrw = sum(r.moved_hrw for r in rows)
        mod = sum(r.moved_mod for r in rows)
        for r in rows:
            # THE rendezvous property: a key never moves between two
            # OLD shards — every move is a claim by the new shard.
            assert r.moved_to_new == r.moved_hrw
            assert 0 <= r.moved_hrw <= r.n_docs
        # Corpus-wide: HRW ~ 1/11 moved, modulo ~ 10/11 — the two must
        # be separated by a wide margin at any scale factor.
        assert hrw / tot < 0.25
        assert mod / tot > 0.75
        assert hrw < mod


class TestRebalanceQuality:
    """docs_rebalance_quality: water-filling invariants over quality
    mass, plus a per-document Python replay of the integer rubric."""

    def _frame(self, spark, sf_dir):
        return queries()["docs_rebalance_quality"](spark, sf_dir).collect()

    def test_budget_exhausted_exactly(self, spark, sf_dir):
        rows = self._frame(spark, sf_dir)
        total = sum(r.stratum_qmass for r in rows)
        budget = (total * 3) // 5
        alloc = sum(r.quota_qmass for r in rows)
        if any(r.capped for r in rows):
            assert alloc == budget
        else:
            assert alloc == total <= budget

    def test_water_level_is_flat(self, spark, sf_dir):
        rows = self._frame(spark, sf_dir)
        capped = [r.quota_qmass for r in rows if r.capped]
        if not capped:
            return
        lo, hi = min(capped), max(capped)
        assert hi - lo <= 1
        for r in rows:
            assert 0 <= r.quota_qmass <= r.stratum_qmass
            if not r.capped:
                assert r.stratum_qmass <= hi

    def test_qmass_replays_integer_rubric(self, spark, sf_dir):
        """Per-stratum quality mass == sum over train docs of
        n_toks * (band + cleanliness + diversity), all integer."""
        import hashlib
        import re
        from collections import defaultdict

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        want_mass: dict[tuple, int] = defaultdict(int)
        want_toks: dict[tuple, int] = defaultdict(int)
        for d in docs:
            h = int(
                hashlib.md5(f"splt{d.doc_id}".encode()).hexdigest()[:12], 16
            )
            if h % 10 >= 8:
                continue
            toks = [
                t
                for t in re.split(r"[^a-z0-9]+", d.text.lower().strip())
                if t
            ]
            low = d.text.lower()
            n_punct = len(low) - len(re.sub(r"[^a-z0-9 ]", "", low))
            band = 4000 if 10 <= len(toks) <= 1000 else 2000
            clean = 3000 - (3000 * n_punct) // max(len(low), 1)
            div = (3000 * len(set(toks))) // max(len(toks), 1)
            key = (d.source, d.lang)
            want_mass[key] += len(toks) * (band + clean + div)
            want_toks[key] += len(toks)
        rows = self._frame(spark, sf_dir)
        assert {(r.source, r.lang) for r in rows} == set(want_mass)
        for r in rows:
            key = (r.source, r.lang)
            assert r.stratum_qmass == want_mass[key], key
            assert r.stratum_toks == want_toks[key], key
            assert r.avg_q_bp == want_mass[key] // max(want_toks[key], 1)


class TestFilterFunnel:
    """docs_filter_funnel: per-document first-failure attribution
    replayed in Python; funnel accounting closes exactly."""

    def test_funnel_replays_and_closes(self, spark, sf_dir):
        import re

        from graphdatabases_spark.functions.text import LANG_STOPWORDS

        stops = {w for ws in LANG_STOPWORDS.values() for w in ws}
        email = re.compile(r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}")
        phone = re.compile(r"\b555-[0-9]{4}\b")
        ip = re.compile(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b")

        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        want_docs = {s: 0 for s in range(1, 7)}
        want_toks = {s: 0 for s in range(1, 7)}
        for d in docs:
            t = d.text
            if d.doc_id % 7 == 0:
                t += f" contact user{d.doc_id}@example.com now"
            if d.doc_id % 11 == 0:
                t += f" call 555-{1000 + d.doc_id % 9000} today"
            if d.doc_id % 13 == 0:
                t += (
                    f" from 10.{d.doc_id % 256}.{(d.doc_id * 7) % 256}"
                    f".{(d.doc_id * 13) % 256}"
                )
            toks = [
                x for x in re.split(r"[^a-z0-9]+", t.lower().strip()) if x
            ]
            low = t.lower()
            n_punct = len(low) - len(re.sub(r"[^a-z0-9 ]", "", low))
            pii = len(email.findall(t)) + len(phone.findall(t)) + len(
                ip.findall(t)
            )
            if not 10 <= len(toks) <= 1000:
                s = 1
            elif not (set(toks) & stops):
                s = 2
            elif (10000 * n_punct) // max(len(low), 1) >= 2000:
                s = 3
            elif (10000 * len(set(toks))) // max(len(toks), 1) < 3000:
                s = 4
            elif pii > 0:
                s = 5
            else:
                s = 6
            want_docs[s] += 1
            want_toks[s] += len(toks)

        rows = {
            r["stage"]: r
            for r in queries()["docs_filter_funnel"](spark, sf_dir).collect()
        }
        assert sorted(rows) == [1, 2, 3, 4, 5, 6]
        total = len(docs)
        surv = total
        for s in range(1, 7):
            r = rows[s]
            assert r["n_docs"] == want_docs[s], s
            assert r["n_toks"] == want_toks[s], s
            assert r["share_ppm"] == (1000000 * want_docs[s]) // total
            if s <= 5:
                surv -= want_docs[s]
            assert r["surviving_docs"] == surv, s
        # The funnel closes: the pass row IS the final survivor count.
        assert rows[6]["n_docs"] == rows[6]["surviving_docs"] == surv


class TestValNovelty:
    """docs_val_novelty: Python replay of the unseen-gram probe."""

    def test_novelty_replay(self, spark, sf_dir):
        import hashlib
        import re
        from collections import defaultdict

        rows = {
            r["source"]: r
            for r in queries()["docs_val_novelty"](spark, sf_dir).collect()
        }
        train_grams: set[str] = set()
        val_docs = []
        for d in spark.read.parquet(f"{sf_dir}/documents.parquet").collect():
            toks = [
                t
                for t in re.split(r"[^a-z0-9]+", d.text.lower().strip())
                if t
            ]
            if len(toks) < 3:
                continue
            grams = {
                " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)
            }
            b = int(
                hashlib.md5(f"splt{d.doc_id}".encode()).hexdigest()[:12], 16
            ) % 10
            if b < 8:
                train_grams |= grams
            elif b == 8:
                val_docs.append((d.source, grams))
        want = defaultdict(lambda: [0, 0, 0, 0])  # docs, grams, unseen, full
        for src, grams in val_docs:
            unseen = len(grams - train_grams)
            w = want[src]
            w[0] += 1
            w[1] += len(grams)
            w[2] += unseen
            w[3] += int(unseen == len(grams))
        assert set(rows) == set(want)
        for src, r in rows.items():
            d, g, u, fn = want[src]
            assert r["n_docs"] == d
            assert r["n_grams"] == g
            assert r["n_unseen"] == u
            assert r["novelty_ppm"] == (1000000 * u) // g
            assert r["docs_fully_novel"] == fn
            assert 0 <= r["novelty_ppm"] <= 1000000
