"""Physical-plan inspection utilities (the engine's plan-quality lens).

The reference has no optimizer of its own — its "plans" are backend
query strings (SURVEY §4.1) — so plan quality here means: did Catalyst
produce the plan a 1000-executor cluster needs? These helpers turn the
executed-plan string into checkable facts (pushed filters, scan schema,
join strategy, codegen spans) and are the foundation of the
``tests/test_plans.py`` quality gates. Use them interactively too::

    from graphdatabases_spark.plans import pushed_filters, explain_formatted
    print(explain_formatted(df))
    assert pushed_filters(df), "filter did not reach the scan"
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame, finalize: bool = False) -> str:
    """Physical-plan tree string. ``finalize=True`` triggers an action
    first so AQE's final (re-optimized) plan is returned instead of the
    initial one — join-strategy checks should finalize."""
    if finalize:
        df.count()
    return df._jdf.queryExecution().executedPlan().toString()


def explain_formatted(df: DataFrame) -> str:
    """The ``explain('formatted')`` text, captured instead of printed."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """Predicates that reached a file scan, across all scans in the plan."""
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        body = m.group(1).strip()
        if body:
            # Split on predicate boundaries, not commas inside them
            # (e.g. "GreaterThan(l_quantity,40.0), IsNotNull(x)").
            out.extend(
                p.strip() for p in re.split(r",\s*(?=[A-Z][A-Za-z]*\()", body)
            )
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each file scan (pruning check)."""
    plan = executed_plan(df)
    scans = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":", 1)[0].strip() for c in m.group(1).split(",") if c]
        scans.append(cols)
    return scans


def has_broadcast_join(df: DataFrame, at_least: int = 1) -> bool:
    return executed_plan(df).count("BroadcastHashJoin") >= at_least


def whole_stage_codegen_spans(df: DataFrame) -> int:
    """Number of distinct WholeStageCodegen spans (``*(n)`` prefixes) —
    wider spans = fewer interpreted boundaries in the hot path."""
    plan = executed_plan(df)
    return len(set(re.findall(r"\*\((\d+)\)", plan)))


def aqe_skew_join_engaged(df: DataFrame) -> bool:
    """True if the FINAL adaptive plan actually split a skewed partition
    — ``SortMergeJoin(skew=true)`` / ``ShuffledHashJoin(skew=true)`` or
    an ``AQEShuffleRead … skewed`` reader.  Call AFTER an action (the
    initial plan never carries the markers); this is the runtime
    evidence behind SCALE.md's "AQE skew-split handles residual hot
    keys" claim."""
    plan = executed_plan(df)
    return "skew=true" in plan or "and skewed" in plan
