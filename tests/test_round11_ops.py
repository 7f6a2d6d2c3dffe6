"""Round-11 ops: priority sampling (Duffield–Lund–Thorup).

Pins for ``docs_priority_sample`` (its DuckDB oracle hash-checks the
values; these check the SEMANTICS):

* a pure-Python integer replay of the key arithmetic reproduces the
  Spark entry's rows bit-for-bit;
* MERGEABILITY — the property the entry exists for: per-source
  bottom-(k+1) candidate lists merged then re-ranked equal the direct
  whole-corpus sample (top-k by a deterministic key is associative);
* the DLT threshold estimator, evaluated in EXACT rational arithmetic
  (Fraction — no float carries the check), lands near the true corpus
  token total at both fixture scales (unbiased in expectation; these
  are single deterministic draws, so the bound is the measured one).
"""

from __future__ import annotations

import hashlib
from fractions import Fraction

import duckdb
import pytest

from graphdatabases_spark.relational import queries

_K = 20
_SCALE = 32768


def _docs(sf_dir: str) -> list[tuple[int, str, int]]:
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT doc_id, source,
          CAST(len(list_filter(regexp_split_to_array(lower(trim(text)),
               '[^a-z0-9]+'), x -> x <> '')) AS BIGINT) AS n_tok
        FROM read_parquet('{sf_dir}/documents.parquet')
        WHERE text IS NOT NULL
        """
    ).fetchall()
    con.close()
    return [(int(i), s, int(w)) for i, s, w in rows if w and w >= 1]


def _h48(doc_id: int) -> int:
    return int(hashlib.md5(f"prio{doc_id}".encode()).hexdigest()[:12], 16)


def _keyed(docs):
    return sorted(
        ((_h48(i) * _SCALE) // w, i, s, w) for i, s, w in docs
    )


class TestPrioritySample:
    def test_spark_entry_matches_python_replay(self, spark, sf_dir):
        docs = _docs(sf_dir)
        ranked = _keyed(docs)
        tau_key = ranked[_K][0]
        expect = [
            (pos + 1, i, s, w, key, tau_key)
            for pos, (key, i, s, w) in enumerate(ranked[:_K])
        ]
        got = [
            (r["pos"], r["doc_id"], r["source"], r["n_tok"], r["key"],
             r["tau_key"])
            for r in queries()["docs_priority_sample"](spark, sf_dir)
            .orderBy("pos")
            .collect()
        ]
        assert got == expect

    @pytest.mark.parametrize(
        "sf", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
    )
    def test_shard_merge_equals_whole_corpus(self, sf):
        docs = _docs(sf)
        direct = _keyed(docs)[: _K + 1]
        # shard by source: each shard ships only its bottom-(k+1)
        merged = sorted(
            row
            for src in {s for _, s, _ in docs}
            for row in _keyed([d for d in docs if d[1] == src])[: _K + 1]
        )[: _K + 1]
        assert merged == direct

    @pytest.mark.parametrize(
        "sf,lo,hi",
        [
            ("/root/testdata/sf0.001", 0.85, 1.15),
            ("/root/testdata/sf0.1", 0.70, 1.10),
        ],
    )
    def test_dlt_estimator_exact_rational(self, sf, lo, hi):
        docs = _docs(sf)
        ranked = _keyed(docs)
        total = sum(w for _, _, w in docs)
        # exact (k+1)-th priority: q = w * 2^48 / h (u = h/2^48)
        _, i1, _, w1 = ranked[_K]
        tau = Fraction(w1 * (1 << 48), _h48(i1))
        est = sum(max(Fraction(w), tau) for _, _, _, w in ranked[:_K])
        assert lo <= est / total <= hi, float(est / total)
