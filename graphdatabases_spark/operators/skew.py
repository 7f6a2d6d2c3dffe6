"""Skew-mitigating salted equi-join.

When a join key is heavily skewed (a handful of hot keys own most rows),
the hash shuffle sends every hot-key row to one reducer and the stage
runs at the speed of its slowest task. AQE's skew-join splitting handles
the sort-merge case at runtime; this operator is the *explicit* form for
when the dim side is too big to broadcast but small enough to replicate:

- fact side: deterministic salt in [0, salt) per row (xxhash64 of the
  whole row — no RNG, so plans stay reproducible and retries are safe)
- dim side: each row replicated ``salt`` times (explode of a sequence)
- join on (key, salt): every hot key now spreads over ``salt`` reducers

Cost model: dim shuffle volume × salt in exchange for fact-side balance;
pick ``salt`` ≈ executor-count / distinct-hot-keys. Semantics are
EXACTLY those of the plain equi-join (verified by the DuckDB oracle on
the catalog entry ``join_salted_skew``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join with the fact side salted across ``salt`` sub-keys.

    ``on`` columns must exist on both sides (joined with USING
    semantics: one output column per key). Supported ``how``: inner /
    left — the replicated-dim construction cannot express right/full
    outer (a dim row with no fact match would surface ``salt`` times).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    fact_s = fact.withColumn(
        SALT_COL,
        F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt)).cast("int"),
    )
    dim_s = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return fact_s.join(dim_s, keys + [SALT_COL], how).drop(SALT_COL)
