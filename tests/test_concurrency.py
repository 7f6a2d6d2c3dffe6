"""Concurrent-execution determinism.

The external gate runs catalog entries sequentially, but a production
session serves many queries at once (Spark explicitly supports
concurrent actions on one SparkSession). The hazards are OURS, not
Spark's: the traversal adjacency cache, the streaming staging cache,
and any shared driver-side state must be safe under simultaneous
first-touch from multiple threads.

The test computes canonical value-hashes for a cross-section of entries
(graph kernels with their adjacency cache cleared so threads race the
fill, eager streaming replays racing the staging cache, joins, text,
similarity) sequentially and then again from an 8-thread pool, and
requires identical hashes.
"""

from __future__ import annotations

import hashlib
from concurrent.futures import ThreadPoolExecutor

from graphdatabases_spark.relational import queries

SF_DIR = "/root/testdata/sf0.01"

NAMES = [
    "graph_khop_entity",             # adjacency-cache fill race
    "graph_pagerank",                # iterative kernel
    "events_tumbling_hourly",        # streaming staging-cache race
    "events_stateful_running_totals",  # real-engine streaming replay
    "text_tfidf_topterms",
    "dedup_lsh_candidates",
    "q1_pricing_summary",
    "similarity_cosine_topk",
    # round-6 additions: the streaming-dedup memory-sink tag reuse and
    # the posting-list dedup under concurrent execution.
    "docs_stream_dedup",
    "docs_substring_dedup",
    # round-7 additions: span removal's collect_set + rebuild under
    # concurrency, the BM25 top-k cutoff, and the two-pass quantile
    # rank selection.
    "docs_substring_strip",
    "docs_bm25_topk",
    "orders_quantile_histogram",
    # late round-7 additions: the t-digest's per-partition clustering
    # under thread-shared session state, and the BPE fertility rollup
    # racing the shared unrolled-merge fit.
    "orders_tdigest_sketch",
    "docs_bpe_fertility",
    # round-7 continuation: the bounded-dedup replay's memory-sink tag
    # reuse and epoch staging under concurrent execution.
    "docs_stream_dedup_bounded",
]


def _canonical_hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)]
    pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(
        drop=True
    )
    return hashlib.md5(pdf.to_csv(index=False).encode()).hexdigest()


def test_concurrent_queries_match_sequential(spark):
    qs = queries()

    def run(name: str) -> str:
        return _canonical_hash(qs[name](spark, SF_DIR).toPandas())

    sequential = {n: run(n) for n in NAMES}

    # Make the caches cold again so the concurrent pass races the fills.
    from graphdatabases_spark.graph.traversal import _ADJ_CACHE

    _ADJ_CACHE.clear()

    with ThreadPoolExecutor(max_workers=8) as ex:
        concurrent = dict(zip(NAMES, ex.map(run, NAMES)))

    mismatched = [n for n in NAMES if sequential[n] != concurrent[n]]
    assert not mismatched, (
        f"concurrent execution diverged for {mismatched} — a shared "
        "driver-side cache is not thread-safe"
    )


def test_stage_derived_concurrent_stagers_serialize(tmp_path):
    """ADVICE r7: stage_derived's check-then-write raced — two sessions
    staging the same (table, kind) could interleave, one reading the
    shared dir mid-overwrite.  Now the stage runs under a file lock and
    publishes via write-to-unique-tmp + rename, so N simultaneous
    first-touch stagers produce exactly ONE materialization each time
    the signature changes, and every reader sees a complete dir."""
    import os
    import threading

    from graphdatabases_spark.relational.catalog import stage_derived

    src_dir = tmp_path / "sfX"
    src_dir.mkdir()
    # stage_derived signatures the SOURCE parquet path's stat() — a
    # plain file is enough (content is irrelevant to the staging logic).
    (src_dir / "documents.parquet").write_text("v1")

    writes = []
    write_lock = threading.Lock()

    def writer(out_path: str) -> None:
        os.makedirs(out_path)
        with open(os.path.join(out_path, "part-0"), "w") as fh:
            fh.write("payload")
        with open(os.path.join(out_path, "_SUCCESS"), "w") as fh:
            fh.write("")
        with write_lock:
            writes.append(out_path)

    results: list[tuple[str, str]] = []
    errors: list[BaseException] = []

    def stage() -> None:
        try:
            results.append(
                stage_derived(str(src_dir), "documents", "ctest", writer)
            )
        except BaseException as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=stage) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors, errors[:3]
    # One materialization, all callers converge on the same published
    # path+tag, and the published dir is complete (_SUCCESS + _SIG).
    assert len(writes) == 1
    assert len(set(results)) == 1
    staged, _tag = results[0]
    assert os.path.exists(os.path.join(staged, "_SUCCESS"))
    assert os.path.exists(os.path.join(staged, "_SIG"))

    # Source regeneration (new mtime/size) re-stages exactly once more —
    # into a NEW content-addressed directory (ADVICE r8: a published
    # signature dir is never deleted in place, so a reader holding the
    # old path is not rmtree'd mid-scan; old sigs are GC'd lazily after
    # an age grace period).
    (src_dir / "documents.parquet").write_text("v2-regenerated")
    staged2, tag2 = stage_derived(str(src_dir), "documents", "ctest", writer)
    assert len(writes) == 2
    assert staged2 != staged and tag2 != results[0][1]
    # The superseded publication is still readable (grace period).
    assert os.path.exists(os.path.join(staged, "_SUCCESS"))
