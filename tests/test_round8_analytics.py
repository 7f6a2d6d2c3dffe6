"""Engine-internal invariants for the round-8 analytics ops, starting
with the portable t-digest sketch: value-level correctness is proven by
the DuckDB differential (tests/test_oracle_catalog.py); here we pin the
properties that make the digest a USABLE quantile sketch — contiguous
tiling of the sorted key range, the t-digest tail-resolution shape, and
the bounded-error containment law (the exact rank-r value lies inside
the covering centroid's [lo, hi] range)."""

from __future__ import annotations

import math

from graphdatabases_spark.relational import REGISTRY, queries

queries()  # populate REGISTRY

_QS = (0.01, 0.05, 0.10, 0.25, 0.50, 0.75, 0.90, 0.95, 0.99)


def _digest(spark, sf_dir):
    rows = REGISTRY["orders_tdigest_sketch"].fn(spark, sf_dir).collect()
    by_pri: dict[str, list] = {}
    for r in rows:
        by_pri.setdefault(r["o_orderpriority"], []).append(r)
    for cs in by_pri.values():
        cs.sort(key=lambda r: r["centroid"])
    return by_pri


def _exact(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    by_pri: dict[str, list] = {}
    for r in rows:
        by_pri.setdefault(r["o_orderpriority"], []).append(
            math.floor(r["o_totalprice"] * 100)
        )
    for v in by_pri.values():
        v.sort()
    return by_pri


class TestTDigestSketch:
    def test_centroids_tile_key_range_contiguously(self, spark, sf_dir):
        """Monotonic q -> centroid assignment means centroid value
        ranges must be disjoint and ordered: hi of centroid i < lo of
        centroid i+1 (buckets are wholly assigned, so ranges cannot
        interleave)."""
        for pri, cs in _digest(spark, sf_dir).items():
            assert cs, pri
            for lo_c, hi_c in zip(cs, cs[1:]):
                assert lo_c["hi_value"] <= hi_c["lo_value"], (
                    pri,
                    lo_c["centroid"],
                )
                assert lo_c["lo_value"] <= lo_c["mean_value"] / 1 + 1e-6
                assert lo_c["mean_value"] <= lo_c["hi_value"] + 1e-6

    def test_rank_containment_bounded_error(self, spark, sf_dir):
        """THE sketch guarantee: for each target quantile q, walk the
        digest's cumulative weights to the covering centroid; the exact
        rank-ceil(q*n) value must lie inside that centroid's
        [lo, hi] — so a digest-interpolated estimate is never off by
        more than one centroid's key range."""
        digest = _digest(spark, sf_dir)
        exact = _exact(spark, sf_dir)
        assert set(digest) == set(exact)
        checked = 0
        for pri, cs in digest.items():
            vals = exact[pri]
            n = len(vals)
            assert sum(c["weight"] for c in cs) == n
            for q in _QS:
                rank = max(1, math.ceil(q * n))  # type-1 lower quantile
                true_val = vals[rank - 1] / 100.0
                cum = 0
                cover = None
                for c in cs:
                    cum += c["weight"]
                    if rank <= cum:
                        cover = c
                        break
                assert cover is not None
                assert cover["lo_value"] - 0.01 <= true_val, (pri, q)
                assert true_val <= cover["hi_value"] + 0.01, (pri, q)
                checked += 1
        assert checked >= len(digest) * len(_QS)

    def test_tail_resolution_exceeds_middle(self, spark, sf_dir):
        """t-digest's defining shape: q-space centroid width shrinks
        toward the tails.  With k(q) = 16*(u|u| + 1) the two middle
        centroids (15, 16) each span 12.5% of the mass while the two
        edge centroids span ~2.6% — assert edge weights are strictly
        smaller than middle weights wherever both exist."""
        for pri, cs in _digest(spark, sf_dir).items():
            by_id = {c["centroid"]: c["weight"] for c in cs}
            n = sum(by_id.values())
            if n < 200:  # too small for the shape to be meaningful
                continue
            mid = max(
                by_id.get(15, 0),
                by_id.get(16, 0),
            )
            edge = max(by_id.get(0, 0), by_id.get(31, 0))
            assert edge < mid, pri

    def test_centroid_budget_respected(self, spark, sf_dir):
        for pri, cs in _digest(spark, sf_dir).items():
            assert len(cs) <= 32, pri
            assert all(0 <= c["centroid"] <= 31 for c in cs), pri


class TestTdigestMerge:
    """orders_tdigest_merge: shard histograms merged as data, then
    clustered, equal the single-pass digest — and the merge is not
    vacuous (buckets straddle shards)."""

    def test_merge_equals_single_pass(self, spark, sf_dir):
        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        merged = REGISTRY["orders_tdigest_merge"].fn(spark, sf_dir).collect()
        single = REGISTRY["orders_tdigest_sketch"].fn(spark, sf_dir).collect()
        strip = lambda rows: [
            (
                r["o_orderpriority"],
                r["centroid"],
                r["weight"],
                r["lo_value"],
                r["hi_value"],
                r["mean_value"],
            )
            for r in rows
        ]
        assert strip(merged) == strip(single)
        # Non-vacuous: at least one histogram bucket received rows from
        # multiple shards, so the merge really combined cross-shard
        # state (all 4 collide at sf>=0.01; the sf0.001 fixture's 1.5k
        # orders spread thinner).
        assert max(r["max_bucket_shards"] for r in merged) >= 2


class TestCupedAdjustment:
    """events_cuped_adjustment: per-user Python replay; the CUPED
    pooled-variance guarantee holds."""

    def test_replay_and_pooled_variance_reduction(self, spark, sf_dir):
        import hashlib
        from collections import defaultdict
        from datetime import datetime
        from decimal import Decimal

        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["arm"]: r
            for r in REGISTRY["events_cuped_adjustment"].fn(spark, sf_dir).collect()
        }
        assert sorted(rows) == [0, 1]

        split = datetime(2024, 1, 16)
        X: dict[int, Decimal] = defaultdict(lambda: Decimal(0))
        Y: dict[int, Decimal] = defaultdict(lambda: Decimal(0))
        users = set()
        for e in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
            users.add(e.user_id)
            if e.event_type != "purchase":
                continue
            v = Decimal(str(round(e.value, 4)))
            if e.ts < split:
                X[e.user_id] += v
            else:
                Y[e.user_id] += v
        xs = {u: float(X[u]) for u in users}
        ys = {u: float(Y[u]) for u in users}
        n = len(users)
        mx = sum(xs.values()) / n
        my = sum(ys.values()) / n
        var_x = sum((v - mx) ** 2 for v in xs.values()) / n
        cov = sum((xs[u] - mx) * (ys[u] - my) for u in users) / n
        theta = cov / var_x if var_x > 0 else 0.0
        adj = {u: ys[u] - theta * (xs[u] - mx) for u in users}

        arm = {
            u: int(hashlib.md5(f"cuped{u}".encode()).hexdigest()[:12], 16) % 2
            for u in users
        }
        for a in (0, 1):
            ua = [u for u in users if arm[u] == a]
            r = rows[a]
            assert r["n_users"] == len(ua)
            m_y = sum(ys[u] for u in ua) / len(ua)
            m_adj = sum(adj[u] for u in ua) / len(ua)
            v_y = sum((ys[u] - m_y) ** 2 for u in ua) / len(ua)
            v_adj = sum((adj[u] - m_adj) ** 2 for u in ua) / len(ua)
            assert abs(r["mean_y"] - m_y) < 1e-6 * max(abs(m_y), 1)
            assert abs(r["mean_y_adj"] - m_adj) < 1e-6 * max(abs(m_adj), 1)
            assert abs(r["var_y"] - v_y) < 1e-6 * max(v_y, 1)
            assert abs(r["var_y_adj"] - v_adj) < 1e-6 * max(v_adj, 1)

        # The guarantee is POOLED (about the global mean), not per-arm.
        pooled_y = sum((ys[u] - my) ** 2 for u in users) / n
        madj = sum(adj.values()) / n
        pooled_adj = sum((v - madj) ** 2 for v in adj.values()) / n
        assert pooled_adj <= pooled_y + 1e-9


class TestNextMatchVeto:
    """events_next_match_veto: per-click Python replay of the
    first-match-with-veto classification."""

    def test_classification_replay(self, spark, sf_dir):
        from collections import defaultdict
        from datetime import timedelta

        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["user_id"]: r
            for r in REGISTRY["events_next_match_veto"].fn(spark, sf_dir).collect()
        }
        by_user = defaultdict(list)
        for e in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
            by_user[e.user_id].append(e)
        want = {}
        for u, evs in by_user.items():
            evs.sort(key=lambda e: (e.ts, e.event_id))
            cnt = {"clean": 0, "vetoed": 0, "expired": 0}
            for i, e in enumerate(evs):
                if e.event_type != "click":
                    continue
                np_ = next(
                    (x.ts for x in evs[i + 1:] if x.event_type == "purchase"),
                    None,
                )
                ne = next(
                    (x.ts for x in evs[i + 1:] if x.event_type == "error"),
                    None,
                )
                if np_ is None or np_ > e.ts + timedelta(hours=24):
                    cnt["expired"] += 1
                elif ne is not None and ne < np_:
                    cnt["vetoed"] += 1
                else:
                    cnt["clean"] += 1
            want[u] = cnt
        assert set(rows) == {u for u, c in want.items() if sum(c.values())}
        total_veto = 0
        for u, r in rows.items():
            c = want[u]
            assert r["n_clean"] == c["clean"], u
            assert r["n_vetoed"] == c["vetoed"], u
            assert r["n_expired"] == c["expired"], u
            assert r["n_clicks"] == sum(c.values())
            total_veto += r["n_vetoed"]
        # The veto branch must actually fire on the fixture.
        assert total_veto > 0


class TestKAnonAudit:
    """customer_kanon_audit: replayed class sizes and monotone ks."""

    def test_replay_and_monotonicity(self, spark, sf_dir):
        from collections import Counter

        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["k"]: r
            for r in REGISTRY["customer_kanon_audit"].fn(spark, sf_dir).collect()
        }
        assert sorted(rows) == [2, 5, 10]
        sizes = Counter(
            (c.c_nationkey, c.c_mktsegment)
            for c in spark.read.parquet(f"{sf_dir}/customer.parquet").collect()
        )
        n_rows = sum(sizes.values())
        for k, r in rows.items():
            gb = sum(1 for v in sizes.values() if v < k)
            rb = sum(v for v in sizes.values() if v < k)
            assert r["n_groups"] == len(sizes)
            assert r["n_rows"] == n_rows
            assert r["groups_below"] == gb
            assert r["rows_below"] == rb
            assert r["rows_below_ppm"] == (1000000 * rb) // n_rows
        # Raising k can only grow the below-k population.
        assert rows[2]["rows_below"] <= rows[5]["rows_below"] <= rows[10]["rows_below"]


class TestTrimmedMean:
    """orders_trimmed_mean: Python replay of the exact rank trim."""

    def test_trim_replay(self, spark, sf_dir):
        from collections import defaultdict
        from decimal import Decimal

        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["priority"]: r
            for r in REGISTRY["orders_trimmed_mean"].fn(spark, sf_dir).collect()
        }
        groups = defaultdict(list)
        for o in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
            groups[o.o_orderpriority].append(
                (Decimal(str(round(o.o_totalprice, 4))), o.o_orderkey)
            )
        assert set(rows) == set(groups)
        for pr, vals in groups.items():
            vals.sort()
            n = len(vals)
            cut = n // 10
            kept = vals[cut: n - cut]
            r = rows[pr]
            assert r["n_orders"] == n
            assert r["n_kept"] == n - 2 * cut == len(kept)
            raw = sum(v for v, _ in vals) / n
            trm = sum(v for v, _ in kept) / len(kept)
            assert abs(Decimal(str(r["mean_raw"])) - raw) <= Decimal("0.0001")
            assert abs(Decimal(str(r["mean_trimmed"])) - trm) <= Decimal(
                "0.0001"
            )
            # Trimming changes the mean only within the clipped tails'
            # envelope: the trimmed mean sits inside [min, max].
            assert vals[0][0] <= Decimal(str(r["mean_trimmed"])) <= vals[-1][0]


class TestSessionGapCurve:
    """events_session_gap_curve: replay via per-user sorted gaps."""

    def test_curve_replay_and_monotone(self, spark, sf_dir):
        from collections import defaultdict

        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["gap_minutes"]: r
            for r in REGISTRY["events_session_gap_curve"].fn(spark, sf_dir).collect()
        }
        assert sorted(rows) == [5, 30, 120]
        by_user = defaultdict(list)
        for e in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
            by_user[e.user_id].append((e.ts, e.event_id))
        import math

        for m, r in rows.items():
            n_sessions = 0
            for evs in by_user.values():
                evs.sort()
                n_sessions += 1
                for (a, _), (b, _) in zip(evs, evs[1:]):
                    gap_s = math.floor(b.timestamp()) - math.floor(
                        a.timestamp()
                    )
                    if gap_s > m * 60:
                        n_sessions += 1
            assert r["n_users"] == len(by_user)
            assert r["n_sessions"] == n_sessions, m
            assert r["sessions_per_user_ppm"] == (
                1000000 * n_sessions
            ) // len(by_user)
        # Larger inactivity gap merges sessions — never splits them.
        assert (
            rows[5]["n_sessions"]
            >= rows[30]["n_sessions"]
            >= rows[120]["n_sessions"]
            >= rows[5]["n_users"]
        )


class TestConversionLatencyQuantiles:
    """events_conversion_latency_quantiles: brute-sort replay — the
    two-pass bucket selection must equal exact order statistics."""

    def test_exact_order_statistics(self, spark, sf_dir):
        import math
        from collections import defaultdict

        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["q_label"]: r
            for r in REGISTRY["events_conversion_latency_quantiles"]
            .fn(spark, sf_dir)
            .collect()
        }
        assert sorted(rows) == ["p50", "p90", "p99"]
        by_user = defaultdict(list)
        for e in spark.read.parquet(f"{sf_dir}/events.parquet").collect():
            by_user[e.user_id].append(e)
        lats = []
        for evs in by_user.values():
            evs.sort(key=lambda e: (e.ts, e.event_id))
            for i, e in enumerate(evs):
                if e.event_type != "click":
                    continue
                np_ = next(
                    (x.ts for x in evs[i + 1:] if x.event_type == "purchase"),
                    None,
                )
                if np_ is not None and (np_ - e.ts).total_seconds() <= 86400:
                    lats.append(
                        math.floor(np_.timestamp())
                        - math.floor(e.ts.timestamp())
                    )
        lats.sort()
        n = len(lats)
        for label, num, den in (("p50", 1, 2), ("p90", 9, 10), ("p99", 99, 100)):
            rank = (num * n + den - 1) // den
            r = rows[label]
            assert r["n_conversions"] == n
            assert r["rank"] == rank
            assert r["latency_s"] == lats[rank - 1], label


class TestParetoShare:
    """orders_pareto_share: brute top-k replay; tie-closure identity."""

    def test_topk_share_replay(self, spark, sf_dir):
        from collections import defaultdict

        from graphdatabases_spark.relational import REGISTRY, queries

        queries()
        rows = {
            r["p_pct"]: r
            for r in REGISTRY["orders_pareto_share"].fn(spark, sf_dir).collect()
        }
        assert sorted(rows) == [1, 10, 50]
        rev = defaultdict(int)
        for o in spark.read.parquet(f"{sf_dir}/orders.parquet").collect():
            rev[o.o_custkey] += int(o.o_totalprice * 100 // 1)
        vals = sorted(rev.items(), key=lambda kv: (-kv[1], kv[0]))
        n = len(vals)
        total = sum(v for _, v in vals)
        prev_share = 0
        for p in (1, 10, 50):
            k = (p * n + 99) // 100
            top = sum(v for _, v in vals[:k])
            r = rows[p]
            assert r["n_customers"] == n
            assert r["k_top"] == k
            assert r["top_cents"] == top, p
            assert r["total_cents"] == total
            assert r["share_ppm"] == (1000000 * top) // total
            # Concentration: share grows with p, and the top p% always
            # holds at least p% of revenue (sorted-desc prefix).
            assert r["share_ppm"] >= prev_share
            assert r["share_ppm"] >= (1000000 * k) // n - 1
            prev_share = r["share_ppm"]
