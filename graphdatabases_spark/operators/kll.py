"""Persisted mergeable quantile-sketch store (KLL-lite compactors).

The disk-serving counterpart of ``docs_tok_kll_quantiles``'s in-plan
sketch — the FAISS-``add``-after-``train`` contract on the quantile
axis (the ``ivf_append`` pattern): level-1 compactors persist
partitioned by shard, a new shard APPENDS its own files without
touching resident bytes (concurrent serves of other shards are never
disturbed), and serving reads the compactor union and recompacts —
which equals the built-from-scratch serve EXACTLY, because the level-2
merge is a pure function of the compactor multiset (merge-order
invariance pinned in tests/test_round12_ops.py).

Same integer arithmetic as the catalog entry throughout: per-shard
sorted rank sampling at step ceil(n_s/k1) with telescoped exact
weights, weighted-rank grid recompaction at ceil(n/k2), type-1 rank
serving — so a serve from disk is pinned bit-equal to the entry's
``v_kll`` column on the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_K1 = 64
DEFAULT_K2 = 64


def kll_build(
    d: DataFrame,
    k1: int = DEFAULT_K1,
) -> DataFrame:
    """Level-1 compactors for ``d[group, shard, tie, v]`` — one bounded
    (<= k1 + 1 items) weighted summary per (group, shard). ``tie`` is
    the deterministic within-value tiebreak (e.g. doc_id)."""
    wr = Window.partitionBy("group", "shard").orderBy("v", "tie")
    wn = Window.partitionBy("group", "shard")
    stepped = (
        d.withColumn("r", F.row_number().over(wr).cast("long"))
        .withColumn("n_s", F.count(F.lit(1)).over(wn).cast("long"))
        .withColumn("step_s", F.expr(f"(n_s + {k1} - 1) div {k1}"))
    )
    wl = Window.partitionBy("group", "shard").orderBy("r")
    return (
        stepped.filter(
            (F.col("r") % F.col("step_s") == 0) | (F.col("r") == F.col("n_s"))
        )
        .withColumn(
            "weight", F.col("r") - F.coalesce(F.lag("r").over(wl), F.lit(0))
        )
        .select("group", "shard", "v", "tie", "weight")
    )


def kll_save(compactors: DataFrame, path: str) -> None:
    """Persist compactors partitioned by shard — each shard owns its
    ``shard=`` directory, so appends never rewrite resident files."""
    compactors.write.partitionBy("shard").mode("overwrite").parquet(path)


def kll_append(
    spark: SparkSession,
    path: str,
    new_shard: DataFrame,
    k1: int = DEFAULT_K1,
) -> None:
    """Compact ONE new shard and append its files into the store.
    Ingest cost is one bounded window pass over the new shard only;
    every pre-existing file stays byte-identical (pinned)."""
    kll_build(new_shard, k1=k1).write.partitionBy("shard").mode(
        "append"
    ).parquet(path)


def kll_serve(
    spark: SparkSession,
    path: str,
    q_pcts: tuple[int, ...] = (50, 90, 99),
    k2: int = DEFAULT_K2,
) -> DataFrame:
    """Serve from the persisted store at ``path`` (see kll_serve_df)."""
    return kll_serve_df(spark.read.parquet(path), q_pcts=q_pcts, k2=k2)


def kll_serve_df(
    l1: DataFrame,
    q_pcts: tuple[int, ...] = (50, 90, 99),
    k2: int = DEFAULT_K2,
) -> DataFrame:
    """Serve type-1-rank quantiles per group from the persisted
    compactor union: weighted-rank grid recompaction to <= k2 + 1
    items, then v = arg-min-cw over kept rows with cw >= target.

    The recompaction windows order by (v, tie, shard): ``tie`` need not
    be globally unique across shards — the shard key makes the
    cumulative-weight order (and hence the serve) deterministic even
    when (group, v, tie) repeats in two shards' compactors."""
    wcum = (
        Window.partitionBy("group")
        .orderBy("v", "tie", "shard")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wlag = Window.partitionBy("group").orderBy("v", "tie", "shard")
    ntot = l1.groupBy("group").agg(F.sum("weight").cast("long").alias("n"))
    l1cw = (
        l1.withColumn("cw", F.sum("weight").over(wcum).cast("long"))
        .withColumn(
            "pcw", F.coalesce(F.lag("cw").over(wlag), F.lit(0)).cast("long")
        )
        .join(ntot, "group")
        .withColumn("step2", F.expr(f"(n + {k2} - 1) div {k2}"))
    )
    l2 = l1cw.filter(
        (F.expr("cw div step2") > F.expr("pcw div step2"))
        | (F.col("cw") == F.col("n"))
    ).select("group", "v", "cw")
    targets = None
    for q in q_pcts:
        t = ntot.select(
            "group",
            F.lit(q).cast("int").alias("q_pct"),
            (F.expr(f"((n - 1) * {q}) div 100") + 1).cast("long").alias("t"),
        )
        targets = t if targets is None else targets.unionByName(t)
    return (
        targets.join(l2, "group")
        .filter(F.col("cw") >= F.col("t"))
        .groupBy("group", "q_pct")
        .agg(F.min_by("v", "cw").alias("v_kll"))
        .orderBy("group", "q_pct")
    )
