"""Benchmark harness: the reference's workload/timing semantics (O9-O24)."""

from graphdatabases_spark.harness.profiler import (
    Profiler,
    executor_metrics,
    find_engine_pids,
)
from graphdatabases_spark.harness.runner import (
    BenchResult,
    TIMESERIES_HEADER,
    iter_header,
    iterate_bench,
    perform_bench,
    read_bench,
    save_data,
    sweep_values,
)
from graphdatabases_spark.harness.workloads import WORKLOADS

__all__ = [
    "Profiler",
    "executor_metrics",
    "find_engine_pids",
    "BenchResult",
    "TIMESERIES_HEADER",
    "iter_header",
    "iterate_bench",
    "perform_bench",
    "read_bench",
    "save_data",
    "sweep_values",
    "WORKLOADS",
]
