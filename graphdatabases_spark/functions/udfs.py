"""Arrow-vectorized Python UDF surface (SURVEY §2.2 "UDF / UDAF / UDTF").

One exemplar per UDF flavor, each used by a real oracle-checked catalog
query (relational/udf_queries.py):

- scalar ``pandas_udf``      → vectorized L2 norm over embedding arrays
- ``GROUPED_AGG`` pandas UDAF → geometric mean
- ``applyInPandas``          → per-group z-score (grouped map)
- ``mapInPandas``            → bigram expansion (UDTF-style 1→N rows)

These are the SLOW path by design policy — everything expressible with
built-in ``pyspark.sql.functions`` stays JVM-side (the rest of the
catalog). The flavors here exist for semantics Catalyst can't express
(arbitrary numpy/pandas per batch/group) and are Arrow-batched, never
row-at-a-time (~10-100× the throughput of classic Python UDFs).
"""

from __future__ import annotations

import math
from collections.abc import Iterable

import numpy as np
import pandas as pd

from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


# pandas_udf() resolves its return type against the active SparkSession,
# so the wrappers are built lazily (first use), not at import time.
_CACHE: dict[str, object] = {}


def l2_norm():
    """Scalar pandas UDF: vectorized L2 norm of an array<float> column.
    Arrow hands the whole batch as a Series of numpy arrays; one numpy
    reduction per row in C, no per-row Python interpretation."""
    if "l2_norm" not in _CACHE:

        @pandas_udf("double")
        def _l2_norm(vecs: pd.Series) -> pd.Series:
            return vecs.map(
                lambda v: float(np.sqrt(np.dot(np.asarray(v, dtype="float64"),
                                               np.asarray(v, dtype="float64"))))
                if v is not None
                else None
            )

        _CACHE["l2_norm"] = _l2_norm
    return _CACHE["l2_norm"]


def geo_mean():
    """GROUPED_AGG pandas UDAF: geometric mean (exp of the mean log) —
    no Catalyst builtin. Partial aggregation does NOT apply to pandas
    UDAFs: the whole group's column ships to one worker, so group
    cardinality must be bounded (fine for per-brand/priority groups;
    for 10^9-row groups decompose into sum(log)/count built-ins)."""
    if "geo_mean" not in _CACHE:

        @pandas_udf("double")
        def _geo_mean(x: pd.Series) -> float:
            return float(np.exp(np.log(x[x > 0]).mean()))

        _CACHE["geo_mean"] = _geo_mean
    return _CACHE["geo_mean"]


# --- grouped map (applyInPandas) ------------------------------------------
ZSCORE_SCHEMA = "o_orderkey BIGINT, o_orderpriority STRING, zscore DOUBLE"


def zscore_per_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Population z-score of o_totalprice within one priority group.
    Grouped-map semantics: each group becomes one pandas frame on one
    worker — the operator the reference-class engines run as a window;
    here it demonstrates arbitrary per-group pandas math.

    Exactness discipline: prices carry ≤2 decimals, so the mean and
    variance are derived from EXACT integer sums of cent values
    (arbitrary-precision Python ints — float partial sums would depend
    on the row order Arrow hands us, and a last-ulp drift flips rounded
    boundary values against the SQL oracle).  The final double
    arithmetic then mirrors the oracle expression op-for-op, giving
    bit-identical zscores on any partitioning of the group."""
    x = pdf["o_totalprice"].to_numpy()
    cents = np.floor(x * 100.0 + 0.5)  # exact integer-valued doubles
    ints = [int(v) for v in cents]
    n = len(ints)
    sx = sum(ints)
    sxx = sum(v * v for v in ints)
    mean = float(sx) / n
    var = float(sxx) / n - mean * mean
    z = (cents - mean) / math.sqrt(var) if var > 0 else cents * 0.0
    return pd.DataFrame(
        {
            "o_orderkey": pdf["o_orderkey"],
            "o_orderpriority": pdf["o_orderpriority"],
            "zscore": z,
        }
    )


# --- mapInPandas (UDTF-style) ---------------------------------------------
BIGRAM_SCHEMA = "doc_id BIGINT, bigram STRING"


def expand_bigrams(batches: Iterable[pd.DataFrame]) -> Iterable[pd.DataFrame]:
    """1→N row expansion: lowercase word bigrams per document. Streams
    Arrow batches in and out — memory stays bounded by batch size, the
    UDTF pattern for decode/expand stages in a data pipeline."""
    for pdf in batches:
        ids: list[int] = []
        grams: list[str] = []
        for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
            toks = [t for t in _tokenize(text) if t]
            ids.extend([doc_id] * max(len(toks) - 1, 0))
            grams.extend(f"{a} {b}" for a, b in zip(toks, toks[1:]))
        yield pd.DataFrame({"doc_id": ids, "bigram": grams})


def _tokenize(text: str) -> list[str]:
    import re

    return re.split(r"\W+", (text or "").lower())
