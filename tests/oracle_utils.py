"""Local replica of the driver's duckdb-oracle differential gate.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet, canonicalizes both (columns sorted by name, rows sorted by all
columns), and compares values. Float comparison is exact-first with a
1e-9 tolerance fallback that reports NEAR (the driver hashes exact
values, so NEAR means "tighten the query's rounding discipline").
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from graphdatabases_spark.relational.catalog import TABLES


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import os

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        # Multi-file tables (the sf1 derivation writes fact tables as
        # file-per-copy directories, like a cluster writer) need a glob.
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )
    return con


def dtype_kind(dtype, series: pd.Series) -> str:
    """Coarse hash-relevant dtype kind: int / float / bool / datelike /
    decimal / other.  The external driver hashes engine-native value
    RENDERINGS, so int-vs-float (``277`` vs ``277.0``), bool-vs-int and
    decimal-vs-float divergences fail its gate even when the numeric
    comparator below says equal — round 1's ``q12`` and round 5's two
    HUGEINT columns were exactly this class.  object columns are
    classified by their first non-null value (pandas lands Spark dates
    and DuckDB HUGEINTs in object columns depending on version).

    Shared by ``compare_frames`` (every pytest differential) and
    ``tools/audit_oracle_dtypes.py`` (the standalone sweep).
    """
    import datetime
    import decimal

    import numpy as np

    if pd.api.types.is_bool_dtype(dtype):
        return "bool"
    if pd.api.types.is_integer_dtype(dtype):
        return "int"
    if pd.api.types.is_float_dtype(dtype):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(dtype):
        return "datelike"
    if dtype == object:
        non_null = series.dropna()
        if len(non_null):
            v = non_null.iloc[0]
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, (int, np.integer)):
                return "int"
            if isinstance(v, (float, np.floating)):
                return "float"
            if isinstance(v, (datetime.date, datetime.datetime)):
                return "datelike"
            if isinstance(v, decimal.Decimal):
                return "decimal"
        return "other"
    return str(dtype)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def _values_equal(a, b) -> tuple[bool, bool]:
    """(equal, near) — near means |a-b| <= 1e-9 but not exactly equal."""
    a_nan = a is None or (isinstance(a, float) and math.isnan(a))
    b_nan = b is None or (isinstance(b, float) and math.isnan(b))
    if a_nan or b_nan:
        return (a_nan and b_nan, False)
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        if float(a) == float(b):
            return (True, False)
        denom = max(abs(float(a)), abs(float(b)), 1.0)
        return (False, abs(float(a) - float(b)) / denom <= 1e-9)
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        a_l, b_l = list(a), list(b)
        if len(a_l) != len(b_l):
            return (False, False)
        eq = near = True
        for x, y in zip(a_l, b_l):
            e, n = _values_equal(x, y)
            if not e:
                eq = False
                if not n:
                    near = False
        return (eq, (not eq) and near)
    return (a == b, False)


def compare_frames(
    spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame
) -> tuple[str, str]:
    """Returns (verdict, detail); verdict in {MATCH, NEAR, MISMATCH}."""
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    if list(a.columns) != list(b.columns):
        return ("MISMATCH", f"columns differ: spark={list(a.columns)} oracle={list(b.columns)}")
    if len(a) != len(b):
        return ("MISMATCH", f"row count differs: spark={len(a)} oracle={len(b)}")
    # Hash-relevant dtype parity (VERDICT r5 #7): equal VALUES under a
    # diverging kind (int vs float, bool vs int, decimal vs float)
    # still fail the driver's rendering hash.  Empty frames are skipped
    # — classification needs a value and an empty hash matches anyway.
    if len(a):
        for col in a.columns:
            ka = dtype_kind(a[col].dtype, a[col])
            kb = dtype_kind(b[col].dtype, b[col])
            if ka != kb:
                return (
                    "MISMATCH",
                    f"col {col} dtype kind differs: spark={a[col].dtype}/"
                    f"{ka} oracle={b[col].dtype}/{kb} (driver hash hazard)",
                )
    any_near = False
    for col in a.columns:
        av, bv = a[col].tolist(), b[col].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            eq, near = _values_equal(x, y)
            if eq:
                continue
            if near:
                any_near = True
                continue
            return (
                "MISMATCH",
                f"col {col} row {i}: spark={x!r} oracle={y!r}",
            )
    return ("NEAR", "float drift <=1e-9") if any_near else ("MATCH", "")


def run_differential(spark, sf_dir: str, name: str, fn, oracle: str):
    spark_pdf = fn(spark, sf_dir).toPandas()
    con = duckdb_connection(sf_dir)
    try:
        oracle_pdf = con.execute(oracle).df()
    finally:
        con.close()
    return compare_frames(spark_pdf, oracle_pdf), len(spark_pdf)
