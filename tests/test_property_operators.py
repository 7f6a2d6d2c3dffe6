"""Property-based differentials for the custom operators.

The catalog entries prove each operator on the fixture tables; these
tests prove the OPERATOR over seeded random inputs (SURVEY §5.2.5's
model, extended from the graph kernels to the operator layer): small
adversarial domains (few keys → many multi-matches, colliding
timestamps, hot keys) checked against brute-force Python oracles that
restate the contract independently of the Spark formulation.

Determinism contracts exercised on purpose:
- asof_join tie_break: colliding right timestamps must resolve to the
  LARGEST tie_break value, inner and left.
- interval_join: the ±tolerance boundary is inclusive on both ends and
  every qualifying pair appears exactly once (the bucketed rewrite's
  no-dedup claim).
- salted_join: result multiset is EXACTLY the plain equi-join's,
  regardless of salt fan-out, inner and left.
- sessionize: session numbering depends only on (ts, tie_break) order,
  with the >gap (strict) boundary.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta

import pytest

from pyspark.sql import functions as F

BASE = datetime(2024, 1, 1)


def _ts(seconds: int) -> datetime:
    return BASE + timedelta(seconds=seconds)


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------


def _asof_fixture(seed: int):
    rng = random.Random(seed)
    left = [
        (rng.randrange(6), rng.randrange(100), i)  # key, lts, lid
        for i in range(120)
    ]
    right = [
        (rng.randrange(6), rng.randrange(100), i, rng.randrange(1000))
        for i in range(80)  # key, rts, rid, rval — rts collisions likely
    ]
    return left, right


def _asof_oracle(left, right, how: str):
    out = {}
    for key, lts, lid in left:
        cands = [r for r in right if r[0] == key and r[1] <= lts]
        if cands:
            # winner: most recent rts, ties by largest rid (tie_break)
            _, rts, rid, rval = max(cands, key=lambda r: (r[1], r[2]))
            out[lid] = (rts, rid, rval)
        elif how == "left":
            out[lid] = (None, None, None)
    return out


@pytest.mark.parametrize("seed", [11, 12, 13])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_asof_join_matches_bruteforce(spark, seed, how):
    from graphdatabases_spark.operators.asof import asof_join

    left, right = _asof_fixture(seed)
    ldf = spark.createDataFrame(left, "key int, lts int, lid int")
    rdf = spark.createDataFrame(right, "key int, rts int, rid int, rval int")
    got = {
        r["lid"]: (r["rts"], r["rid"], r["rval"])
        for r in asof_join(
            ldf, rdf, "lts", "rts", by="key", tie_break="rid", how=how
        ).collect()
    }
    assert got == _asof_oracle(left, right, how), f"seed={seed} how={how}"


# ---------------------------------------------------------------------------
# interval_join
# ---------------------------------------------------------------------------


def _interval_fixture(seed: int):
    rng = random.Random(seed)
    tol = 30
    # timestamps clustered so boundary pairs (gap exactly == tol) occur
    probe = [(i, rng.randrange(0, 300, 5)) for i in range(90)]
    build = [(j, rng.randrange(0, 300, 5)) for j in range(70)]
    return probe, build, tol


def _interval_oracle(probe, build, tol: int, how: str):
    pairs = set()
    for pid, pt in probe:
        matched = False
        for bid, bt in build:
            if abs(bt - pt) <= tol:
                pairs.add((pid, bid))
                matched = True
        if how == "left" and not matched:
            pairs.add((pid, None))
    return pairs


@pytest.mark.parametrize("seed", [21, 22, 23])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_interval_join_matches_bruteforce(spark, seed, how):
    from graphdatabases_spark.operators.interval import interval_join

    probe, build, tol = _interval_fixture(seed)
    pdf = spark.createDataFrame(
        [(pid, _ts(t)) for pid, t in probe], "pid int, pts timestamp"
    )
    bdf = spark.createDataFrame(
        [(bid, _ts(t)) for bid, t in build], "bid int, bts timestamp"
    )
    rows = interval_join(pdf, bdf, "pts", "bts", tol, how=how).collect()
    got = {(r["pid"], r["bid"]) for r in rows}
    # exactly-once: no qualifying pair may surface twice via two buckets
    assert len(rows) == len(got), f"seed={seed} how={how}: duplicate pairs"
    assert got == _interval_oracle(probe, build, tol, how), (
        f"seed={seed} how={how}"
    )


# ---------------------------------------------------------------------------
# salted_join
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", [31, 32, 33])
@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain_join(spark, seed, how):
    from graphdatabases_spark.operators.skew import salted_join

    rng = random.Random(seed)
    # 70% of fact rows on one hot key — the case the salt exists for
    fact = [
        (0 if rng.random() < 0.7 else rng.randrange(8), i) for i in range(300)
    ]
    dim = [(k, f"d{k}") for k in range(6)]  # keys 6,7 dangle on purpose
    fdf = spark.createDataFrame(fact, "k int, fid int")
    ddf = spark.createDataFrame(dim, "k int, dval string")

    def multiset(df):
        out = {}
        for r in df.collect():
            t = (r["k"], r["fid"], r["dval"])
            out[t] = out.get(t, 0) + 1
        return out

    for salt in (1, 4, 16):
        got = multiset(salted_join(fdf, ddf, "k", how=how, salt=salt))
        want = multiset(fdf.join(ddf, "k", how))
        assert got == want, f"seed={seed} how={how} salt={salt}"


# ---------------------------------------------------------------------------
# sessionize
# ---------------------------------------------------------------------------


def _session_oracle(events, gap_s: int):
    by_user: dict[int, list[tuple[int, int]]] = {}
    for user, t, eid in events:
        by_user.setdefault(user, []).append((t, eid))
    out = {}
    for user, rows in by_user.items():
        rows.sort()  # (ts, eid) — the tie_break order
        seq, prev = 0, None
        for t, eid in rows:
            if prev is None or t - prev > gap_s:  # strict > gap
                seq += 1
            out[(user, eid)] = seq
            prev = t
    return out


@pytest.mark.parametrize("seed", [41, 42, 43])
def test_sessionize_matches_bruteforce(spark, seed):
    from graphdatabases_spark.operators.sessionize import sessionize

    rng = random.Random(seed)
    gap_minutes = 2
    # step sizes straddle the 120 s gap; duplicate timestamps per user
    events = []
    for user in range(5):
        t = 0
        for eid in range(60):
            t += rng.choice([0, 30, 90, 120, 121, 200])
            events.append((user, t, user * 1000 + eid))
    df = spark.createDataFrame(
        [(u, _ts(t), e) for u, t, e in events], "user_id int, ts timestamp, eid int"
    )
    got = {
        (r["user_id"], r["eid"]): r["session_seq"]
        for r in sessionize(
            df, key="user_id", ts="ts", gap_minutes=gap_minutes,
            order_tie_break="eid",
        ).collect()
    }
    assert got == _session_oracle(events, gap_minutes * 60), f"seed={seed}"
