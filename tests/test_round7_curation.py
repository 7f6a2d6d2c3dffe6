"""Engine-internal invariants for the round-7 curation ops: the
within-document repeated-n-gram scrub, cross-document duplicated-span
removal, and BPE application.  Each is replayed independently in plain
Python (different code path from both the Spark program AND its DuckDB
oracle, which share the injection derivation) and checked for its
conservation / consistency laws.  Value-level correctness is separately
proven by the DuckDB differentials (tests/test_oracle_catalog.py)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

from graphdatabases_spark.relational import REGISTRY, queries

queries()  # populate REGISTRY

TOKEN_RE = re.compile("[^a-z0-9]+")


def _py_tokens(text: str) -> list[str]:
    return [t for t in TOKEN_RE.split(text.lower().strip()) if t]


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _scrub_py(toks: list[str], k: int, dup: list[bool]) -> list[str]:
    """Coverage-removal replay shared by both removal entries: ``dup``
    marks gram start positions; a token survives iff no marked gram
    covers it."""
    n, ng = len(toks), len(toks) - k + 1
    return [
        toks[p]
        for p in range(n)
        if not any(dup[i] for i in range(max(0, p - k + 1), min(p, ng - 1) + 1))
    ]


class TestIntradocDedup:
    def test_python_replay(self, spark, sf_dir):
        """Full independent replay: injection, first-occurrence gram
        marking, coverage removal, reconstruction."""
        rows = {
            r["doc_id"]: r
            for r in REGISTRY["docs_intradoc_dedup"].fn(spark, sf_dir).collect()
        }
        docs = _docs(spark, sf_dir).collect()
        assert docs
        checked = 0
        for d in docs:
            toks = _py_tokens(d["text"])
            if d["doc_id"] % 6 == 0 and len(toks) >= 10:
                toks = toks + toks[2:10]
            if len(toks) < 4:
                assert d["doc_id"] not in rows
                continue
            grams = [" ".join(toks[i : i + 4]) for i in range(len(toks) - 3)]
            first: dict[str, int] = {}
            dup = []
            for i, g in enumerate(grams):
                dup.append(g in first)
                first.setdefault(g, i)
            kept = _scrub_py(toks, 4, dup)
            row = rows[d["doc_id"]]
            assert row["n_toks_before"] == len(toks), d["doc_id"]
            assert row["n_removed"] == len(toks) - len(kept), d["doc_id"]
            assert row["n_toks_after"] == len(kept), d["doc_id"]
            assert row["text_fp"] == _md5(" ".join(kept)), d["doc_id"]
            checked += 1
        assert checked == len(rows)

    def test_injected_tail_scrubbed_first_occurrence_survives(
        self, spark, sf_dir
    ):
        """The re-appended tokens 3..10 are always removed (>= 8
        tokens), while a doc with no repeats reconstructs to its own
        original text (first occurrences survive untouched)."""
        rows = REGISTRY["docs_intradoc_dedup"].fn(spark, sf_dir).collect()
        injected = [r for r in rows if r["doc_id"] % 6 == 0]
        assert injected
        for r in injected:
            if r["n_toks_before"] >= 18:  # n0 >= 10 -> injection happened
                assert r["n_removed"] >= 8, r["doc_id"]
        clean = [
            r
            for r in rows
            if r["doc_id"] % 6 != 0 and r["n_removed"] == 0
        ]
        assert clean, "expected some repeat-free documents"
        originals = {
            d["doc_id"]: _md5(" ".join(_py_tokens(d["text"])))
            for d in _docs(spark, sf_dir).collect()
        }
        for r in clean:
            assert r["text_fp"] == originals[r["doc_id"]], r["doc_id"]


class TestSubstringStrip:
    def _replay(self, spark, sf_dir):
        corp: dict[int, list[str]] = {}
        for d in _docs(spark, sf_dir).collect():
            toks = _py_tokens(d["text"])
            if d["doc_id"] % 41 == 0 and len(toks) >= 12:
                cid = d["doc_id"] + 1000000
                corp[cid] = toks[4:] + [f"zz{cid}"]
            if len(toks) >= 8:
                corp[d["doc_id"]] = toks
        docs_per_gram: dict[str, set[int]] = defaultdict(set)
        for did, toks in corp.items():
            for i in range(len(toks) - 7):
                docs_per_gram[" ".join(toks[i : i + 8])].add(did)
        out = {}
        for did, toks in corp.items():
            dup = [
                len(docs_per_gram[" ".join(toks[i : i + 8])]) >= 2
                for i in range(len(toks) - 7)
            ]
            kept = _scrub_py(toks, 8, dup)
            out[did] = (len(toks), len(kept), _md5(" ".join(kept)))
        return out

    def test_python_replay(self, spark, sf_dir):
        """Whole-corpus replay (document-frequency over raw gram
        strings — the 48-bit engine hash is collision-free at any
        plausible corpus, and a collision would fail here loudly)."""
        rows = {
            r["doc_id"]: r
            for r in REGISTRY["docs_substring_strip"]
            .fn(spark, sf_dir)
            .collect()
        }
        expect = self._replay(spark, sf_dir)
        assert set(rows) == set(expect)
        for did, (n, n_after, fp) in expect.items():
            row = rows[did]
            assert row["n_toks_before"] == n, did
            assert row["n_toks_after"] == n_after, did
            assert row["n_removed"] == n - n_after, did
            assert row["text_fp"] == fp, did

    def test_consistent_with_detector_and_symmetric(self, spark, sf_dir):
        """Strip and the docs_substring_dedup detector share the df>=2
        marking: a document loses tokens iff the detector counts at
        least one duplicated gram in it — and both injected partners
        (original + suffix copy) lose their shared span."""
        strip = {
            r["doc_id"]: r
            for r in REGISTRY["docs_substring_strip"]
            .fn(spark, sf_dir)
            .collect()
        }
        det = {
            r["doc_id"]: r
            for r in REGISTRY["docs_substring_dedup"].fn(spark, sf_dir).collect()
        }
        assert set(strip) == set(det)
        for did, row in strip.items():
            assert (row["n_removed"] > 0) == (det[did]["n_dup"] > 0), did
        pairs = [did for did in strip if did >= 1000000]
        assert pairs, "expected injected suffix copies"
        for cid in pairs:
            assert strip[cid]["n_removed"] > 0, cid
            assert strip[cid - 1000000]["n_removed"] > 0, cid


class TestBpeApply:
    def test_python_replay(self, spark, sf_dir):
        """Replay the 5 greedy merge rounds (corpus-weighted pair
        counts, (count DESC, pair ASC) argmax, disjoint left-to-right
        replacement on the boundary-marked form) and the per-source
        rollup."""
        vocab: Counter[str] = Counter()
        occ: Counter[tuple[str, str]] = Counter()
        for d in _docs(spark, sf_dir).collect():
            for t in _py_tokens(d["text"]):
                vocab[t] += 1
                occ[(d["source"], t)] += 1
        seqs = {tok: "".join(f"|{c} " for c in tok) for tok in vocab}
        for _ in range(5):
            pc: Counter[str] = Counter()
            for tok, f in vocab.items():
                sy = re.findall(r"\|([^ ]+) ", seqs[tok])
                for a, b in zip(sy, sy[1:]):
                    pc[f"|{a} |{b} "] += f
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merged = best.replace("|", "").replace(" ", "")
            for tok in seqs:
                seqs[tok] = seqs[tok].replace(best, f"|{merged} ")
        n_sym = {
            tok: len(re.findall(r"\|([^ ]+) ", seq))
            for tok, seq in seqs.items()
        }
        want: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
        for (src, tok), cnt in occ.items():
            w = want[src]
            w[0] += cnt
            w[1] += cnt * len(tok)
            w[2] += cnt * n_sym[tok]
        rows = REGISTRY["docs_bpe_apply"].fn(spark, sf_dir).collect()
        assert {r["source"] for r in rows} == set(want)
        for r in rows:
            toks, chars, syms = want[r["source"]]
            assert r["n_toks"] == toks, r["source"]
            assert r["n_chars"] == chars, r["source"]
            assert r["n_bpe_symbols"] == syms, r["source"]
            assert abs(r["compression_ratio"] - chars / syms) < 1e-6
            assert abs(r["avg_symbols_per_token"] - syms / toks) < 1e-6

    def test_merges_compress(self, spark, sf_dir):
        """Encoding bounds: every token is >= 1 symbol, every symbol
        >= 1 char, and 5 real merges must have fused something."""
        rows = REGISTRY["docs_bpe_apply"].fn(spark, sf_dir).collect()
        total_chars = sum(r["n_chars"] for r in rows)
        total_syms = sum(r["n_bpe_symbols"] for r in rows)
        total_toks = sum(r["n_toks"] for r in rows)
        assert total_toks <= total_syms < total_chars


class TestSubstringSpans:
    def test_conservation_vs_strip_and_span_geometry(self, spark, sf_dir):
        """Provenance closure: per document, the span table's lengths
        sum exactly to the strip entry's n_removed; spans are disjoint,
        ordered, and in-bounds."""
        spans: dict[int, list] = {}
        for r in REGISTRY["docs_substring_spans"].fn(spark, sf_dir).collect():
            spans.setdefault(r["doc_id"], []).append(
                (r["span_start"], r["span_len"])
            )
        strip = {
            r["doc_id"]: r
            for r in REGISTRY["docs_substring_strip"]
            .fn(spark, sf_dir)
            .collect()
        }
        assert spans, "expected removed spans in the dup-injected corpus"
        for did, row in strip.items():
            got = sorted(spans.get(did, []))
            assert sum(ln for _, ln in got) == row["n_removed"], did
            prev_end = 0
            for start, ln in got:
                assert ln >= 8, (did, got)  # a span covers >= one 8-gram
                assert start > prev_end + 1 or prev_end == 0, (did, got)
                prev_end = start + ln - 1
            assert prev_end <= row["n_toks_before"], did
        # Every doc with spans is exactly the set strip removed from.
        assert set(spans) == {
            d for d, r in strip.items() if r["n_removed"] > 0
        }


class TestBpeSubword:
    """docs_bpe_subword: the word-boundary marker is a base symbol —
    merges may absorb it at position 0 and nowhere else, and the merge
    procedure itself must agree with a Python replay."""

    def test_marker_placement_and_replay(self, spark, sf_dir):
        rows = REGISTRY["docs_bpe_subword"].fn(spark, sf_dir).collect()
        assert [r["round"] for r in rows] == [1, 2, 3, 4, 5]
        for r in rows:
            assert r["n"] >= 1
            assert len(r["merged"]) >= 2
            # marker only ever at position 0 (it is each sequence's
            # first base symbol, so no pair puts it mid-merge)
            assert "_" not in r["merged"][1:]
            assert r["is_word_initial"] == int(r["merged"].startswith("_"))
        # The boundary symbol aggregates whole word-onset frequency —
        # the corpus's top merge is word-initial at every fixture SF.
        assert any(r["is_word_initial"] == 1 for r in rows)

        # Python replay of the 5 greedy rounds over the vocab.
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
        vocab: Counter[str] = Counter()
        for d in docs:
            vocab.update(
                t
                for t in re.split(r"[^a-z0-9]+", d.text.lower().strip())
                if t
            )
        seqs = {
            tok: "|_ " + "".join(f"|{c} " for c in tok) for tok in vocab
        }
        for rnd in range(1, 6):
            pc: Counter[str] = Counter()
            for tok, seq in seqs.items():
                sy = re.findall(r"\|([^ ]+) ", seq)
                f = vocab[tok]
                for a, b in zip(sy, sy[1:]):
                    pc[f"|{a} |{b} "] += f
            best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
            merged = best.replace("|", "").replace(" ", "")
            assert rows[rnd - 1]["merged"] == merged
            assert rows[rnd - 1]["n"] == pc[best]
            for tok in seqs:
                seqs[tok] = seqs[tok].replace(best, f"|{merged} ")
