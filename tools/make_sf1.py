"""Generate an sf1 dataset (10x sf0.1) for scale benchmarking.

/root/testdata is read-only and stops at sf0.1; the scale story (AQE
skew splits, shuffles that actually spill) needs a bigger input.  This
tool derives sf1 deterministically from sf0.1 by 10-copy key-offset
replication — same schemas, same per-key distributions, consistent
foreign keys (every key offset by copy_index * table_cardinality).

Two columns need more than an offset to avoid benchmark artifacts:

* ``documents.text`` — verbatim copies would make every doc an exact
  near-dup of its 9 replicas, turning the LSH candidate-pair output
  quadratic in the copy count (45 cross-copy pairs per doc) instead of
  linear in rows.  Every word in copy i>0 gets a one-letter suffix, so
  cross-copy token sets are fully disjoint (Jaccard exactly 0) and the
  within-copy dup structure replicates the original — candidate pairs
  scale exactly 10x.
* ``embeddings.embedding`` — verbatim copies would make cosine top-k
  an all-ties problem and give the IVF quantizer 10-fold degenerate
  points.  Copy i>0 adds small deterministic sinusoidal noise, keeping
  the distribution shape while making every vector distinct.

Output: ``<repo>/.data/sf1/*.parquet`` (gitignored; ~170 MB).
Usage: ``python tools/make_sf1.py [out_dir]``  (idempotent, ~10 s).
"""

from __future__ import annotations

import os
import sys

SRC = "/root/testdata/sf0.1"
COPIES = 10

# table -> {column: cardinality_stride}
OFFSETS = {
    "customer": {"c_custkey": 15_000},
    "supplier": {"s_suppkey": 1_000},
    "part": {"p_partkey": 20_000},
    "orders": {"o_orderkey": 150_000, "o_custkey": 15_000},
    "lineitem": {
        "l_orderkey": 150_000,
        "l_partkey": 20_000,
        "l_suppkey": 1_000,
    },
    "events": {"event_id": 100_000, "user_id": 1_500},
    "documents": {"doc_id": 5_000},
}
VERBATIM = ["region", "nation"]


# Big fact tables are written as multi-file directories: a single
# ~100 MiB file gives Spark one input split (one scan task) under the
# default 128 MiB maxPartitionBytes — a layout artifact no real large
# table has. 16 files ≈ the file-per-task layout a cluster writer
# produces.
MULTI_FILE = {"lineitem", "orders", "events"}


def _replicate_sql(con, table: str, out: str) -> None:
    offs = OFFSETS[table]
    cols = [
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{table}.parquet')"
        ).fetchall()
    ]
    sel = []
    for c in cols:
        if c in offs:
            sel.append(f"({c} + i * {offs[c]})::BIGINT AS {c}")
        elif table == "documents" and c == "text":
            # copy 0 verbatim; copies 1..9 suffix every word so token
            # sets are disjoint across copies (see module docstring).
            sel.append(
                "CASE WHEN i = 0 THEN text ELSE "
                "regexp_replace(text, '(\\S+)', '\\1' || chr((97 + i)::INTEGER), 'g') "
                "END AS text"
            )
        else:
            sel.append(c)
    if table not in MULTI_FILE:
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{SRC}/{table}.parquet') "
            f"CROSS JOIN (SELECT unnest(range({COPIES})) AS i) "
            f"ORDER BY i) TO '{out}/{table}.parquet' (FORMAT PARQUET)"
        )
        return
    # One file per replica copy (a file-per-writer layout, like a
    # cluster job's output); each COPY scans only the 10 MiB source.
    os.makedirs(f"{out}/{table}.parquet", exist_ok=True)
    for i in range(COPIES):
        con.execute(
            f"COPY (SELECT {', '.join(sel)} "
            f"FROM read_parquet('{SRC}/{table}.parquet') "
            f"CROSS JOIN (SELECT {i} AS i)) "
            f"TO '{out}/{table}.parquet/part-{i:05d}.parquet' "
            f"(FORMAT PARQUET)"
        )


def _replicate_embeddings(out: str) -> None:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{SRC}/embeddings.parquet")
    vec_id = tbl.column("vec_id").to_numpy()
    label = tbl.column("label").to_numpy()
    emb = np.asarray(tbl.column("embedding").to_pylist(), dtype=np.float32)
    n, dim = emb.shape
    ids, labels, vecs = [], [], []
    j = np.arange(dim, dtype=np.float32)
    for i in range(COPIES):
        ids.append(vec_id + i * 2_000)
        labels.append(label)
        if i == 0:
            vecs.append(emb)
        else:
            noise = 0.03 * np.sin(
                vec_id[:, None] * 7.1 + j[None, :] * 1.3 + i * 2.7
            ).astype(np.float32)
            vecs.append(emb + noise)
    out_tbl = pa.table(
        {
            "vec_id": np.concatenate(ids),
            "embedding": pa.array(
                np.concatenate(vecs).tolist(), pa.list_(pa.float32())
            ),
            "label": np.concatenate(labels).astype(np.int32),
        }
    )
    pq.write_table(out_tbl, f"{out}/embeddings.parquet")


def main(out_dir: str | None = None) -> str:
    import duckdb

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = out_dir or os.path.join(repo, ".data", "sf1")
    marker = os.path.join(out, "_COMPLETE")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in VERBATIM:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    for t in OFFSETS:
        _replicate_sql(con, t, out)
    _replicate_embeddings(out)
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


if __name__ == "__main__":
    print(main(sys.argv[1] if len(sys.argv) > 1 else None))
