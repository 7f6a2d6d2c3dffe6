"""Custom stateful streaming operator via applyInPandasWithState.

SURVEY §2.2 "Streaming" mandates a custom stateful operator beyond the
built-in windowed aggregations. This one maintains per-user running
totals across micro-batches — arbitrary keyed state the built-in agg
can't express in append mode (it re-emits an updated row per batch,
i.e. a change-log of the running aggregate).

Scale notes: state lives in the executor state store partitioned by the
group key, so state size is O(distinct users), not O(events); each
micro-batch shuffles only that batch's rows to their key partitions.
The Arrow/pandas hop is per-group-per-batch, amortized over batch size.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id BIGINT, batch_rows BIGINT, n BIGINT, total DOUBLE"
STATE_SCHEMA = "n BIGINT, total DOUBLE"


def _update_user_totals(
    key: tuple,
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    """Fold this batch's rows for one user into (n, total) state and
    emit the updated running aggregate."""
    (user_id,) = key
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    batch_rows = 0
    for pdf in pdfs:
        batch_rows += len(pdf)
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, round(total, 6)))
    yield pd.DataFrame(
        [
            {
                "user_id": user_id,
                "batch_rows": batch_rows,
                "n": n,
                "total": round(total, 6),
            }
        ]
    )


def running_user_totals(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Per-user running (count, sum(value)) maintained in keyed state;
    emits one updated row per user per micro-batch the user appears in.
    The final row per user equals the batch groupBy aggregate — that
    equivalence is the test oracle."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
