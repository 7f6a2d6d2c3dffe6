"""Round-12 ops: KLL-lite mergeable quantile sketch.

Pins for ``docs_tok_kll_quantiles`` (its DuckDB oracle hash-checks the
values at the gate; these check the SEMANTICS):

* a pure-Python integer replay of the whole two-level pipeline —
  per-shard sorted rank sampling with telescoped exact weights, the
  weighted-rank grid recompaction, type-1 rank serving — reproduces
  the Spark entry's rows bit-for-bit at sf0.001 and sf0.01;
* MERGEABILITY (shard-merge == whole-corpus serving): the level-1
  compactors are built per shard in ISOLATION and merged in any
  order/grouping; the level-2 recompaction and every served value are
  invariant to the merge order — the property that lets per-executor
  sketches roll up in any tree shape at 100 TB;
* the additive rank-error bound is non-vacuous: with a deliberately
  tiny K1 on synthetic data the sketch actually errs, and the realized
  rank error stays within sum_s(step_s-1) + step2;
* rank_ok and sketch_bounded hold on every emitted row.
"""

from __future__ import annotations

import random
from collections import defaultdict

import duckdb
import pytest

from graphdatabases_spark.relational import queries

_S = 8
_K1 = 64
_K2 = 64
_QS = (50, 90, 99)


def _docs(sf_dir: str):
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT doc_id, source,
          CAST(len(list_filter(regexp_split_to_array(lower(trim(
            coalesce(text, ''))), '[^a-z0-9]+'), x -> x <> '')) AS BIGINT)
        FROM read_parquet('{sf_dir}/documents.parquet')
        """
    ).fetchall()
    con.close()
    return [(int(i), s, int(v)) for i, s, v in rows]


def _l1_compact(shard_items, k1):
    """One isolated level-1 compactor: shard_items = [(v, doc_id)].
    Returns (kept [(v, doc_id, weight)], step_s)."""
    sh = sorted(shard_items)
    n_s = len(sh)
    step = (n_s + k1 - 1) // k1
    kept, prev = [], 0
    for r in range(1, n_s + 1):
        if r % step == 0 or r == n_s:
            v, i = sh[r - 1]
            kept.append((v, i, r - prev))
            prev = r
    return kept, step


def _l2_serve(l1_union, n, k2, qs, all_items):
    """Level-2 recompaction + serving. l1_union = [(v, doc_id, weight)]
    in ANY order; all_items = [(v, doc_id)] full data for exact/ranks."""
    step2 = (n + k2 - 1) // k2
    cw, l2 = 0, []
    for v, i, w in sorted(l1_union):
        pcw = cw
        cw += w
        if cw // step2 > pcw // step2 or cw == n:
            l2.append((v, i, cw))
    svals = sorted(all_items)
    out = []
    for q in qs:
        t = ((n - 1) * q) // 100 + 1
        v_kll = next(v for v, _, c in l2 if c >= t)
        v_exact = svals[t - 1][0]
        rank_lo = sum(1 for v, _ in all_items if v < v_kll)
        rank_hi = sum(1 for v, _ in all_items if v <= v_kll)
        out.append(
            (q, t, v_kll, v_exact, rank_lo, rank_hi, step2, len(l2))
        )
    return out


def _replay(docs, s=_S, k1=_K1, k2=_K2, qs=_QS, shard_order=None):
    """Full replay; returns {(source, q): row-tuple}. shard_order, if
    given, permutes the merge order of the per-shard compactors."""
    by_source = defaultdict(list)
    for i, src, v in docs:
        by_source[src].append((i, v))
    rows = {}
    for src, items in by_source.items():
        shards = defaultdict(list)
        for i, v in items:
            shards[i % s].append((v, i))
        keys = sorted(shards)
        if shard_order is not None:
            keys = shard_order(keys)
        l1_union, b1 = [], 0
        for sk in keys:
            kept, step = _l1_compact(shards[sk], k1)
            l1_union.extend(kept)
            b1 += step - 1
        n = len(items)
        all_items = [(v, i) for i, v in items]
        for q, t, v_kll, v_exact, rank_lo, rank_hi, step2, l2n in _l2_serve(
            l1_union, n, k2, qs, all_items
        ):
            bound = b1 + step2
            rows[(src, q)] = (
                n, t, v_kll, v_exact, rank_lo, rank_hi, bound,
                rank_lo + 1 <= t + bound and rank_hi >= t - bound,
                l2n, l2n <= k2 + 1,
            )
    return rows


class TestKllQuantiles:
    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    def test_python_replay_bit_exact(self, spark, sf):
        got = {
            (r["source"], r["q_pct"]): (
                r["n_docs"], r["rank"], r["v_kll"], r["v_exact"],
                r["rank_lo"], r["rank_hi"], r["err_bound"], r["rank_ok"],
                r["l2_items"], r["sketch_bounded"],
            )
            for r in queries()["docs_tok_kll_quantiles"](spark, sf).collect()
        }
        expect = _replay(_docs(sf))
        assert got == expect

    def test_rank_ok_and_bounded_everywhere(self, spark, sf_dir):
        rows = queries()["docs_tok_kll_quantiles"](spark, sf_dir).collect()
        assert rows
        assert all(r["rank_ok"] for r in rows)
        assert all(r["sketch_bounded"] for r in rows)

    def test_merge_order_invariance(self):
        """Shard-merge == whole: per-shard compactors built in isolation
        merge to the identical sketch and served values under any merge
        permutation — the associative-union contract."""
        rng = random.Random(7)
        docs = [
            (i, "s", (i * 2654435761) % 10_000) for i in range(5_000)
        ]
        base = _replay(docs)
        for seed in range(5):
            r = random.Random(seed)
            perm = _replay(
                docs, shard_order=lambda ks, r=r: r.sample(ks, len(ks))
            )
            assert perm == base
        # and a two-level merge tree: pre-merging shard subgroups is the
        # same union, so serving is unchanged (associativity)
        grouped = _replay(
            docs, shard_order=lambda ks: ks[1::2] + ks[0::2]
        )
        assert grouped == base
        assert rng  # silence lint on unused guard rng

    def test_bound_is_non_vacuous(self):
        """With a tiny K1 the sketch must actually approximate (some
        served value differs from exact) while every realized rank
        error stays within the additive bound."""
        docs = [
            (i, "s", (i * 1103515245 + 12345) % 100_000)
            for i in range(20_000)
        ]
        rows = _replay(docs, k1=4, k2=8)
        assert any(v_kll != v_exact for (_, _, v_kll, v_exact, *_ ) in rows.values())
        for (n, t, v_kll, v_exact, rank_lo, rank_hi, bound, ok, *_both) in rows.values():
            assert ok
            # the served value's occupied rank interval really is
            # within the bound of the target
            assert rank_lo + 1 <= t + bound and rank_hi >= t - bound
            assert bound < n  # a useful bound, not the trivial n


class TestMultiprobeRecall:
    """Pins for ``similarity_multiprobe_recall`` beyond the value-hash
    oracle: the monotonicity the operating curve exists for, and the
    candidate-nesting that guarantees it."""

    def test_recall_monotone_in_probes(self, spark, sf_dir):
        rows = sorted(
            queries()["similarity_multiprobe_recall"](spark, sf_dir).collect(),
            key=lambda r: r["probes"],
        )
        assert [r["probes"] for r in rows] == [1, 2, 4]
        hits = [r["n_hits"] for r in rows]
        results = [r["n_results"] for r in rows]
        assert hits == sorted(hits)
        assert results == sorted(results)

    def test_candidates_nest(self, spark, sf_dir):
        """probes=T's probed buckets are a prefix-superset of T-1's, so
        the raw candidate (query, neighbor) set must nest."""
        from graphdatabases_spark.functions import similarity as S
        from pyspark.sql import functions as F

        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        q = emb.filter(F.col("vec_id") < 5)
        index = S.lsh_build(emb, num_planes=8)
        sets = {}
        for t in (1, 2, 4):
            got = S.lsh_query_multiprobe(
                index, q, k=10**6, probes=t, num_planes=8
            )
            sets[t] = {
                (r["query_id"], r["neighbor_id"]) for r in got.collect()
            }
        assert sets[1] <= sets[2] <= sets[4]


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters (docs_token_mg_hitters)
# ---------------------------------------------------------------------------

_MG_S, _MG_K, _MG_TOP = 4, 8, 12


def _mg_tokens(sf_dir):
    import hashlib

    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT doc_id % {_MG_S},
          unnest(list_filter(regexp_split_to_array(lower(trim(text)),
            '[^a-z0-9]+'), x -> x <> ''))
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE text IS NOT NULL
        """
    ).fetchall()
    con.close()

    def w(tok):
        h = int(hashlib.md5(tok.encode()).hexdigest()[:12], 16)
        return 32 if h % 8 == 0 else 1

    return [(int(s), t, w(t)) for s, t in rows]


def _mg_replay(toks, shard_order=None):
    shards = defaultdict(lambda: defaultdict(int))
    truth = defaultdict(int)
    for s, t, w in toks:
        shards[s][t] += w
        truth[t] += w
    keys = sorted(shards)
    if shard_order is not None:
        keys = shard_order(keys)
    merged, bound = defaultdict(int), 0
    for s in keys:
        ranked = sorted(shards[s].items(), key=lambda kv: (-kv[1], kv[0]))
        thr = ranked[_MG_K][1] if len(ranked) > _MG_K else 0
        bound += thr
        for t, f in ranked[:_MG_K]:
            if f - thr > 0:
                merged[t] += f - thr
    served = sorted(merged.items(), key=lambda kv: (-kv[1], kv[0]))[:_MG_TOP]
    return {
        t: (i + 1, est, truth[t], bound,
            est <= truth[t] and truth[t] - est <= bound)
        for i, (t, est) in enumerate(served)
    }


class TestMgHitters:
    def test_python_replay_bit_exact(self, spark, sf_dir):
        got = {
            r["token"]: (r["pos"], r["est"], r["true_cnt"], r["err_bound"],
                         r["within_bound"])
            for r in queries()["docs_token_mg_hitters"](spark, sf_dir).collect()
        }
        assert got == _mg_replay(_mg_tokens(sf_dir))

    def test_merge_order_invariance_and_bound(self, spark, sf_dir):
        toks = _mg_tokens(sf_dir)
        base = _mg_replay(toks)
        for seed in range(4):
            r = random.Random(seed)
            assert _mg_replay(
                toks, shard_order=lambda ks, r=r: r.sample(ks, len(ks))
            ) == base
        # the bound is live, not vacuous: compression really happened
        # and every row honors est <= true <= est + B
        rows = list(base.values())
        assert all(ok for (_, _, _, _, ok) in rows)
        assert any(est < true for (_, est, true, _, _) in rows)
        assert all(b > 0 for (_, _, _, b, _) in rows)
        # hitters (the 32x-weighted 1/8 of the vocab) rank first and
        # their mass dwarfs the bound
        _, est0, true0, b0, _ = rows[0]
        assert true0 > 10 * b0


# ---------------------------------------------------------------------------
# Integer EWMA (events_ewma_hourly)
# ---------------------------------------------------------------------------


class TestEwmaHourly:
    def test_python_replay_bit_exact(self, spark, sf_dir):
        con = duckdb.connect()
        hrs = con.execute(
            f"""
            SELECT date_trunc('hour', ts) AS h, count(*) AS n
            FROM read_parquet('{sf_dir}/events.parquet')
            GROUP BY h ORDER BY h
            """
        ).fetchall()
        con.close()
        A, SCALE = 8, 1_000_000
        s, expect = None, {}
        for h, n in hrs:
            prev = s
            s = n * SCALE if s is None else (n * SCALE + (A - 1) * s) // A
            if prev is not None:
                expect[str(h)] = (n, s, prev, n * SCALE >= 2 * prev)
        got = {
            str(r["hour_ts"]): (
                r["n_events"], r["ewma_units"], r["ewma_prev_units"],
                r["spike"],
            )
            for r in queries()["events_ewma_hourly"](spark, sf_dir).collect()
        }
        assert got == expect
        # the recurrence actually smooths: ewma varies less than raw
        ns = [v[0] for v in got.values()]
        ss = [v[1] / 1_000_000 for v in got.values()]
        assert max(ss) - min(ss) < max(ns) - min(ns)


# ---------------------------------------------------------------------------
# Range-partition planner (docs_tok_range_partition_plan)
# ---------------------------------------------------------------------------


class TestRangePartitionPlan:
    def test_python_replay_and_coverage(self, spark, sf_dir):
        docs = _docs(sf_dir)  # (doc_id, source, v) with coalesced text
        vs = sorted(v for _, _, v in docs)
        W, P = 8, 8
        hist = defaultdict(int)
        for v in vs:
            hist[v // W] += 1
        n = len(vs)
        target = (n + P - 1) // P
        max_c = max(hist.values())
        cw, parts = 0, defaultdict(lambda: [None, None, 0])
        for b in sorted(hist):
            cw += hist[b]
            pid = min(P, (cw + target - 1) // target)
            p = parts[pid]
            p[0] = b if p[0] is None else min(p[0], b)
            p[1] = b if p[1] is None else max(p[1], b)
            p[2] += hist[b]
        expect = {
            pid: (lo * W, (hi + 1) * W, c, target, max_c,
                  c <= target + max_c - 1)
            for pid, (lo, hi, c) in parts.items()
        }
        got = {
            r["pid"]: (r["lo_v"], r["hi_v"], r["n_docs_part"], r["target"],
                       r["slack"], r["within_bound"])
            for r in queries()["docs_tok_range_partition_plan"](
                spark, sf_dir
            ).collect()
        }
        assert got == expect
        # the plan covers every doc exactly once and every row honors
        # the structural depth bound
        assert sum(v[2] for v in got.values()) == n
        assert all(v[5] for v in got.values())


# ---------------------------------------------------------------------------
# Persisted KLL store: save / append / serve (operators/kll.py)
# ---------------------------------------------------------------------------


class TestKllStore:
    def _docs_df(self, spark, sf_dir):
        from pyspark.sql import functions as F
        from graphdatabases_spark.functions import text as T

        return (
            spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select(
                F.col("source").alias("group"),
                (F.col("doc_id") % 8).alias("shard"),
                F.col("doc_id").alias("tie"),
                F.size(T.tokens(F.coalesce(F.col("text"), F.lit(""))))
                .cast("long")
                .alias("v"),
            )
        )

    def test_append_serve_equals_scratch_and_files_untouched(
        self, spark, sf_dir, tmp_path
    ):
        """ivf_append's contract on the quantile axis: save shards
        0..6, append shard 7 — the serve equals the all-at-once build
        (L2 merge is a pure function of the compactor multiset), and
        every pre-existing file is byte-identical after the append."""
        import glob
        import hashlib
        import os

        from graphdatabases_spark.operators.kll import (
            kll_append,
            kll_build,
            kll_save,
            kll_serve,
        )

        d = self._docs_df(spark, sf_dir)
        p_all = str(tmp_path / "kll_all")
        p_inc = str(tmp_path / "kll_inc")
        kll_save(kll_build(d), p_all)
        kll_save(kll_build(d.filter("shard < 7")), p_inc)

        def digest(path):
            out = {}
            for f in glob.glob(f"{path}/**/*.parquet", recursive=True):
                out[os.path.relpath(f, path)] = hashlib.md5(
                    open(f, "rb").read()
                ).hexdigest()
            return out

        before = digest(p_inc)
        kll_append(spark, p_inc, d.filter("shard = 7"))
        after = digest(p_inc)
        # resident files byte-identical; only shard=7 files are new
        assert all(after[k] == v for k, v in before.items())
        assert all(k.startswith("shard=7") for k in set(after) - set(before))
        assert set(after) - set(before)

        rows_all = sorted(
            (r["group"], r["q_pct"], r["v_kll"])
            for r in kll_serve(spark, p_all).collect()
        )
        rows_inc = sorted(
            (r["group"], r["q_pct"], r["v_kll"])
            for r in kll_serve(spark, p_inc).collect()
        )
        assert rows_all == rows_inc

    def test_disk_serve_equals_catalog_entry(self, spark, sf_dir, tmp_path):
        """A serve from the persisted store is bit-equal to the
        catalog entry's v_kll column on the same corpus — the operator
        and the in-plan sketch share one arithmetic."""
        from graphdatabases_spark.operators.kll import (
            kll_build,
            kll_save,
            kll_serve,
        )

        p = str(tmp_path / "kll_ent")
        kll_save(kll_build(self._docs_df(spark, sf_dir)), p)
        got = {
            (r["group"], r["q_pct"]): r["v_kll"]
            for r in kll_serve(spark, p).collect()
        }
        expect = {
            (r["source"], r["q_pct"]): r["v_kll"]
            for r in queries()["docs_tok_kll_quantiles"](spark, sf_dir).collect()
        }
        assert got == expect


# ---------------------------------------------------------------------------
# Plan drift audit (docs_tok_partition_plan_drift)
# ---------------------------------------------------------------------------


class TestPlanDrift:
    def test_replay_and_replan_helps(self, spark, sf_dir):
        """Python replay of the stale-route vs re-plan audit; the
        re-plan's skew must never exceed the stale plan's, and both
        route every row exactly once."""
        docs = _docs(sf_dir)
        W, P = 8, 8
        base = [v for _, _, v in docs]
        batch = [v * 4 for i, _, v in docs if i % 10 == 0]
        new = base + batch

        def plan(vs):
            hist = defaultdict(int)
            for v in vs:
                hist[v // W] += 1
            n = len(vs)
            target = (n + P - 1) // P
            cw, parts = 0, {}
            for b in sorted(hist):
                cw += hist[b]
                pid = min(P, (cw + target - 1) // target)
                lo, hi, c = parts.get(pid, (b, b, 0))
                parts[pid] = (min(lo, b), max(hi, b), c + hist[b])
            return parts, target

        oparts, _ = plan(base)
        nparts, target_new = plan(new)
        bounds = sorted(
            (hi + 1) * W for pid, (lo, hi, c) in oparts.items() if pid < P
        )
        old_route = defaultdict(int)
        for v in new:
            old_route[1 + sum(1 for b in bounds if v >= b)] += 1
        mx_old, mx_new = max(old_route.values()), max(
            c for _, _, c in nparts.values()
        )
        rows = queries()["docs_tok_partition_plan_drift"](
            spark, sf_dir
        ).collect()
        got = {r["pid"]: (r["n_old_route"], r["n_new_route"]) for r in rows}
        expect = {
            pid: (old_route.get(pid, 0),
                  nparts.get(pid, (0, 0, 0))[2])
            for pid in range(1, P + 1)
        }
        assert got == expect
        r0 = rows[0]
        assert r0["target_new"] == target_new
        assert r0["skew_old_ppm"] == mx_old * 1_000_000 // target_new
        assert r0["skew_new_ppm"] == mx_new * 1_000_000 // target_new
        assert r0["skew_new_ppm"] <= r0["skew_old_ppm"]
        assert sum(v[0] for v in got.values()) == len(new)
        assert sum(v[1] for v in got.values()) == len(new)
        assert any(r["boundary_moved"] for r in rows)
