"""Exact distributed quantiles with BOUNDED aggregation state.

Spark's exact ``F.percentile`` buffers a value->count map per group;
on a continuous-domain column that state grows with the number of
distinct values per group, so the final-merge task OOMs long before
100 TB.  This module is the scale-safe replacement: the two-pass
histogram-refinement algorithm proven by the
``orders_quantile_histogram`` catalog entry
(relational/analytics_stats_queries.py), extracted as a shared kernel
so every exact-quantile call site routes through bounded plans.

Algorithm (per group):

* **Pass 1** buckets values into fixed-width ranges and histograms
  them — ONE combinable keyed aggregation whose state is bounded by
  ``value_range / bucket_width`` (independent of row count).  A
  cumulative window over the bounded bucket list locates, for each
  requested rank, the single bucket containing it.
* **Pass 2** joins the target buckets back (a broadcast — there are at
  most ``|groups| * |ranks|`` of them) and sorts ONLY those buckets'
  rows: a window partitioned per ``(group, rank)`` over roughly
  ``1 / n_buckets`` of the data picks the in-bucket rank.

Determinism discipline (see the catalog entry's docstring): callers
pre-scale values to nonnegative BIGINTs (cents, micro-units, days) so
every rank and every interpolation weight is pure integer arithmetic —
no ``0.9 * n`` float whose 1-ulp error could shift a rank, and equal
values land in the same bucket so in-bucket ``row_number`` ties cannot
change the selected VALUE.

Two entry points:

* :func:`exact_values_at_ranks` — the primitive: fetch the exact value
  at arbitrary 1-based per-group sorted ranks.
* :func:`quantile_cont_vden` — DuckDB/PostgreSQL ``quantile_cont``
  (type-7 linearly-interpolated quantile) as an EXACT RATIONAL: for
  q = num/den it returns ``vden = den*v_lo + rem*(v_hi - v_lo)`` where
  ``h = (n-1)*num/den``, ``v_lo/v_hi`` bracket ``h``, and
  ``rem = (n-1)*num mod den`` — i.e. ``quantile * den`` as a BIGINT.
  Callers compare ``den * x > vden`` (pure integers) or divide once at
  render time; either way the interpolated quantile never exists as an
  inexact float inside the pipeline.
"""

from __future__ import annotations

from typing import Iterable, Sequence, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

__all__ = [
    "exact_values_at_ranks",
    "quantile_cont_vden",
    "weighted_values_at_ranks",
]

#: Default pass-1 histogram bucket width, in caller units.  65,536
#: cents keeps the per-group bucket list at ``range/64Ki`` entries
#: (a few hundred to a few tens of thousands for money-like domains)
#: while pass 2 touches only ``|ranks|`` buckets.
DEFAULT_BUCKET_WIDTH = 65536


def exact_values_at_ranks(
    vals: DataFrame,
    group_cols: Sequence[str],
    ranks: DataFrame,
    bucket_width: "int | str" = DEFAULT_BUCKET_WIDTH,
) -> DataFrame:
    """Exact value at each requested per-group sorted rank.

    Parameters
    ----------
    vals
        ``[*group_cols, v: BIGINT]`` — values pre-scaled to NONNEGATIVE
        integers (``div`` bucketing assumes ``v >= 0``; shift first if
        a domain can go negative).
    group_cols
        At least one grouping column (a literal constant column is fine
        for a global quantile — it also keeps the pass-1 window
        partitioned, which the plan gate requires).
    ranks
        ``[*group_cols, rank: BIGINT]`` — distinct per group, with
        ``1 <= rank <= n_group`` (caller-guaranteed; out-of-range ranks
        silently produce no row).
    bucket_width
        Either a positive int, or the NAME of a BIGINT column in
        ``vals`` holding a per-row width (constant within each group —
        melted multi-axis callers pick a width per axis so a
        days-scaled axis and a micro-money axis both histogram into a
        bounded bucket list).

    Returns ``[*group_cols, rank, v]``.
    """
    g = list(group_cols)
    w = (
        str(bucket_width)
        if isinstance(bucket_width, str)
        else int(bucket_width)
    )
    b = vals.withColumn("_bkt", F.expr(f"v div {w}").cast("long"))
    hist = b.groupBy(*g, "_bkt").agg(F.count(F.lit(1)).alias("_c"))
    wc = (
        Window.partitionBy(*g)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(wc)).withColumn(
        "_prev", F.col("_cum") - F.col("_c")
    )
    targets = ranks.join(cum, g).filter(
        (F.col("_prev") < F.col("rank")) & (F.col("rank") <= F.col("_cum"))
    )
    cand = b.join(
        F.broadcast(targets.select(*g, "_bkt", "rank", "_prev")),
        g + ["_bkt"],
    )
    wv = Window.partitionBy(*(g + ["rank"])).orderBy("v")
    return (
        cand.withColumn("_rn", F.row_number().over(wv))
        .filter(F.col("_rn") == F.col("rank") - F.col("_prev"))
        .select(*g, "rank", "v")
    )


def quantile_cont_vden(
    spark: SparkSession,
    vals: DataFrame,
    group_cols: Sequence[str],
    quantiles: Iterable[Tuple[str, int, int]],
    bucket_width: "int | str" = DEFAULT_BUCKET_WIDTH,
) -> DataFrame:
    """Interpolated quantile ``num/den`` per group, as an exact rational.

    ``quantiles`` is ``[(q_label, num, den), ...]`` with
    ``0 <= num <= den`` (e.g. ``("p50", 1, 2)``).  Returns
    ``[*group_cols, q_label, n, den, rem, v_lo, v_hi, vden]`` where
    ``vden / den`` is exactly DuckDB's ``quantile_cont(v, num/den)``:
    with ``t = (n-1)*num``, ``lo = t div den + 1``, ``rem = t mod den``,
    the quantile is ``v_lo + (rem/den)*(v_hi - v_lo)`` and
    ``vden = den*v_lo + rem*(v_hi - v_lo)`` (BIGINT — callers keep
    ``v * den`` under 2^63).

    The rank arithmetic is all-integer in BOTH engines (the DuckDB
    oracle mirrors it with ``row_number`` over a brute sort — different
    algorithm, identical exact answer), so a 1-ulp float error can
    never shift a rank or an interpolation weight.
    """
    g = list(group_cols)
    n = vals.groupBy(*g).agg(F.count(F.lit(1)).cast("long").alias("n"))
    qdf = spark.createDataFrame(
        [(lab, int(nu), int(de)) for lab, nu, de in quantiles],
        "q_label string, num long, den long",
    )
    t = (
        n.crossJoin(F.broadcast(qdf))
        .withColumn("lo", F.expr("((n - 1) * num) div den") + F.lit(1))
        .withColumn("rem", F.expr("((n - 1) * num) % den"))
    )
    reqs = t.select(
        *g,
        F.explode(
            F.when(
                F.col("rem") > 0,
                F.array(F.col("lo"), F.col("lo") + F.lit(1)),
            ).otherwise(F.array(F.col("lo")))
        ).alias("rank"),
    ).distinct()
    got = exact_values_at_ranks(vals, g, reqs, bucket_width)
    lo_v = got.select(*g, F.col("rank").alias("lo"), F.col("v").alias("v_lo"))
    hi_v = got.select(
        *g, (F.col("rank") - 1).alias("lo"), F.col("v").alias("_vh")
    )
    out = (
        t.join(lo_v, g + ["lo"])
        .join(hi_v, g + ["lo"], "left")
        .withColumn(
            "v_hi",
            F.when(F.col("rem") > 0, F.col("_vh")).otherwise(F.col("v_lo")),
        )
        .withColumn(
            "vden",
            F.col("den") * F.col("v_lo")
            + F.col("rem") * (F.col("v_hi") - F.col("v_lo")),
        )
    )
    return out.select(
        *g, "q_label", "n", "den", "rem", "v_lo", "v_hi", "vden"
    )


def weighted_values_at_ranks(
    vals: DataFrame,
    group_cols: Sequence[str],
    ranks: DataFrame,
    bucket_width: "int | str" = DEFAULT_BUCKET_WIDTH,
) -> DataFrame:
    """WEIGHTED type-1 quantile primitive: the smallest ``v`` whose
    cumulative weight (over the per-group value-sorted order) reaches
    each requested weighted rank.

    ``vals`` is ``[*group_cols, v: BIGINT, w: BIGINT]`` with integer
    weights ``w >= 0`` (each unit of weight counts as one observation
    — the quantity-weighted/token-weighted quantile of a pretraining
    pipeline); ``ranks`` is ``[*group_cols, rank: BIGINT]`` with
    ``1 <= rank <= sum(w)`` per group.  Same two-pass shape as
    :func:`exact_values_at_ranks` — pass 1 histograms WEIGHT per
    bucket (combinable sum agg, state bounded by range/width), pass 2
    aggregates weight per DISTINCT value inside only the target
    buckets, so the answer is independent of row order among equal
    values and every comparison is BIGINT.  Returns
    ``[*group_cols, rank, v]``.
    """
    g = list(group_cols)
    w = (
        str(bucket_width)
        if isinstance(bucket_width, str)
        else int(bucket_width)
    )
    b = vals.withColumn("_bkt", F.expr(f"v div {w}").cast("long"))
    hist = b.groupBy(*g, "_bkt").agg(F.sum("w").cast("long").alias("_c"))
    wc = (
        Window.partitionBy(*g)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("_cum", F.sum("_c").over(wc)).withColumn(
        "_prev", F.col("_cum") - F.col("_c")
    )
    targets = ranks.join(cum, g).filter(
        (F.col("_prev") < F.col("rank")) & (F.col("rank") <= F.col("_cum"))
    )
    cand = b.join(
        F.broadcast(targets.select(*g, "_bkt", "rank", "_prev")),
        g + ["_bkt"],
    )
    # Aggregate per distinct value first: the in-bucket cumulative is
    # then tie-order-independent by construction.
    per_v = cand.groupBy(*g, "rank", "_prev", "v").agg(
        F.sum("w").cast("long").alias("_wv")
    )
    wv = (
        Window.partitionBy(*(g + ["rank"]))
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hit = per_v.withColumn("_cw", F.sum("_wv").over(wv)).filter(
        F.col("_prev") + F.col("_cw") >= F.col("rank")
    )
    first = Window.partitionBy(*(g + ["rank"])).orderBy("v")
    return (
        hit.withColumn("_rn", F.row_number().over(first))
        .filter(F.col("_rn") == 1)
        .select(*g, "rank", "v")
    )
