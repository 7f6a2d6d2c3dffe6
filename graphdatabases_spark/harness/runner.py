"""Benchmark runner: calibrated timing, parameter sweeps, .bench CSV.

Re-expresses the reference pipeline (``benchmark.py:203-281``):

- ``perform_bench`` = (1) calibrate: run the workload once suppressed so
  every engine action short-circuits, yielding pure client-loop overhead
  (``benchmark.py:214-219``); (2) profile + execute the real workload;
  (3) report ``duration = end - start - overhead`` (``benchmark.py:227``)
  — **clamped at 0**, fixing the reference's observed negative idle
  durations (SURVEY §2.1 quirk 5).
- ``iterate_bench`` = parameter sweep: exactly one list-valued kwarg is
  iterated while the rest stay fixed, collecting
  ``(value, cpu, mem, time)`` per step (``benchmark.py:238-263``).
- ``save_data`` / ``read_bench`` = the ``.bench`` CSV contract
  (``benchmark.py:266-281`` ↔ ``visualizer.py:11-26``): header row with
  the x-axis column marked by a ``_`` prefix, float data rows with a
  trailing comma.

For Spark workloads, "suppressed" means the DataFrame plan is still
built (and can be explained) but no action fires — the exact analog of
the reference's dry-run query short-circuit (``databases.py:68-78``).
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable, Sequence
from dataclasses import dataclass, field
from datetime import datetime

from graphdatabases_spark.harness.profiler import Profiler, find_engine_pids


@dataclass
class BenchResult:
    name: str
    duration: float
    overhead: float
    mean_cpu: float
    mean_mem: float
    samples: list[tuple[float, float, float]] = field(default_factory=list)


def perform_bench(
    workload: Callable[..., object],
    *,
    engine=None,
    name: str | None = None,
    calibrate: bool = True,
    profile: bool = True,
    sample_interval: float = 0.1,
    **kwargs,
) -> BenchResult:
    """Calibrated, profiled single run of ``workload(engine, **kwargs)``.

    ``engine`` is anything exposing ``suppress()`` (GraphEngine does);
    pass ``engine=None`` for workloads that don't need one (calibration
    is skipped since there is nothing to suppress).
    """
    bench_name = name or getattr(workload, "__name__", "workload")

    overhead = 0.0
    if calibrate and engine is not None and hasattr(engine, "suppress"):
        t0 = time.perf_counter()
        with engine.suppress():
            workload(engine, **kwargs)
        overhead = time.perf_counter() - t0

    prof = Profiler(find_engine_pids(), interval=sample_interval) if profile else None
    if prof:
        prof.start()
    t0 = time.perf_counter()
    if engine is not None:
        workload(engine, **kwargs)
    else:
        workload(**kwargs)
    elapsed = time.perf_counter() - t0
    if prof:
        prof.stop()

    return BenchResult(
        name=bench_name,
        duration=max(elapsed - overhead, 0.0),  # clamp (quirk 5)
        overhead=overhead,
        mean_cpu=prof.mean_cpu() if prof else 0.0,
        mean_mem=prof.mean_mem() if prof else 0.0,
        samples=list(prof.samples) if prof else [],
    )


def sweep_values(steps: int, factor: int) -> list[int]:
    """The reference's sweep list: ``[i*factor for i in 1..steps]``
    (``benchmark.py:379``)."""
    return [i * factor for i in range(1, steps + 1)]


def iterate_bench(
    workload: Callable[..., object],
    *,
    engine=None,
    name: str | None = None,
    **kwargs,
) -> tuple[str, list[list[float]]]:
    """Sweep the single list-valued kwarg; returns (param_name, rows)
    where each row is ``[value, cpu_pct, mem_mb, time_s]`` — the
    reference's iter-result schema (``benchmark.py:262-263``)."""
    iter_keys = [k for k, v in kwargs.items() if isinstance(v, (list, tuple))]
    if len(iter_keys) != 1:
        raise ValueError(
            f"iterate_bench needs exactly one list-valued kwarg, got {iter_keys}"
        )
    key = iter_keys[0]
    fixed = {k: v for k, v in kwargs.items() if k != key}
    rows: list[list[float]] = []
    for value in kwargs[key]:
        res = perform_bench(
            workload, engine=engine, name=name, **fixed, **{key: value}
        )
        rows.append([float(value), res.mean_cpu, res.mean_mem, res.duration])
    return key, rows


# --- .bench CSV contract ---------------------------------------------------


def save_data(
    out_dir: str,
    bench_name: str,
    engine_name: str,
    header: Sequence[str],
    rows: Sequence[Sequence[float]],
    *,
    timestamp: datetime | None = None,
) -> str:
    """Write a ``.bench`` CSV. Contract (``benchmark.py:266-281``):
    first header column carries a ``_`` prefix marking the x-axis; data
    rows are comma-joined floats with a trailing comma. File name =
    ``<bench>_<engine>_<YYYY-MM-DD_HH-MM-SS>.bench``."""
    os.makedirs(out_dir, exist_ok=True)
    ts = (timestamp or datetime.now()).strftime("%Y-%m-%d_%H-%M-%S")
    path = os.path.join(out_dir, f"{bench_name}_{engine_name}_{ts}.bench")
    head = list(header)
    if not head[0].startswith("_"):
        head[0] = "_" + head[0]
    with open(path, "w", encoding="utf-8") as f:
        f.write(",".join(head) + "\n")
        for row in rows:
            f.write(",".join(str(float(v)) for v in row) + ",\n")
    return path


def read_bench(path: str) -> tuple[list[str], int, list[list[float]]]:
    """Read a ``.bench`` CSV back: (columns, x_axis_index, rows) — the
    visualizer's parse (``visualizer.py:11-26``): `_` marks the x-axis
    column (stripped on return), trailing empty cells tolerated."""
    with open(path, encoding="utf-8") as f:
        lines = [ln.rstrip("\n") for ln in f if ln.strip()]
    header = [c for c in lines[0].split(",") if c != ""]
    x_idx = next((i for i, c in enumerate(header) if c.startswith("_")), 0)
    cols = [c.lstrip("_") for c in header]
    rows = [
        [float(v) for v in ln.split(",") if v != ""] for ln in lines[1:]
    ]
    return cols, x_idx, rows


# Result-row schemas, kept byte-identical to the reference
# (``benchmark.py:231-233, 262-263``).
TIMESERIES_HEADER = ("_Time [s]", "CPU [%]", "MEM [MB]")


def iter_header(param: str) -> tuple[str, str, str, str]:
    return (f"_{param}", "CPU [%]", "MEM [MB]", "TIME [s]")
