"""As-of join — composed from union + window, no native Spark operator.

OSS Spark has no DataFrame as-of join (SURVEY §4.3.3), and the naive
``join on key + ts <= ts`` explodes when a key has many matches (the
intermediate is |matches| rows per left row before the window prunes).
The union-sort formulation here is the 100-TB-safe shape:

1. union the left and right rows, tagged, into one event stream per key
2. one window sort per key over (ts, side, tie_break)
3. each left row picks up the most recent right values via
   ``last(col, ignorenulls=True)`` over an unbounded-preceding frame

Cost: ONE shuffle of |L|+|R| rows on the key + a per-partition sort —
linear, no join blowup, skew handled by AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: str | list[str],
    tie_break: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right[right_on] <= left[left_on]`` within the same ``by`` key
    (backward as-of). Right value columns (everything except ``by``)
    are appended to the left row.

    ``tie_break``: right column ordering the winner among right rows
    sharing the same timestamp (largest wins). ``how='inner'`` drops
    left rows with no prior right row; ``'left'`` keeps them with nulls.
    """
    by_cols = [by] if isinstance(by, str) else list(by)
    right_vals = [c for c in right.columns if c not in by_cols]

    l2 = left.withColumn("_ts", F.col(left_on)).withColumn("_is_left", F.lit(1))
    r2 = right.withColumn("_ts", F.col(right_on)).withColumn("_is_left", F.lit(0))
    unioned = l2.unionByName(r2, allowMissingColumns=True)

    order = [F.col("_ts"), F.col("_is_left")]
    if tie_break is not None:
        order.append(F.col(tie_break).asc_nulls_first())
    w = (
        Window.partitionBy(*by_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    filled = unioned
    for c in right_vals:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = filled.filter(F.col("_is_left") == 1).drop("_ts", "_is_left")
    if how == "inner":
        # Matched iff the as-of timestamp column resolved.
        out = out.filter(F.col(right_on).isNotNull())
    return out
