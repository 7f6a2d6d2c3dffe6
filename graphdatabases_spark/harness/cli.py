"""CLI launcher replacing the reference's Tkinter GUI (O24).

The reference selects (workload, backends, iterate?, steps, factor,
clear?) via ``selection_window()`` (``benchmark.py:284-338``) and
dispatches through ``globals()[bench_name]`` (``benchmark.py:379-381``).
Same knobs, argparse instead of a GUI, one Spark engine instead of
three backend servers::

    python -m graphdatabases_spark.harness.cli bench_traversal \
        --iterate --steps 3 --factor 100 --out Results/traverse
"""

from __future__ import annotations

import argparse

from graphdatabases_spark.graph.api import GraphEngine
from graphdatabases_spark.harness.runner import (
    TIMESERIES_HEADER,
    iter_header,
    iterate_bench,
    perform_bench,
    save_data,
    sweep_values,
)
from graphdatabases_spark.harness.workloads import WORKLOADS, create_grid_graph
from graphdatabases_spark.session import get_spark

ENGINE_NAME = "Spark"

# Workloads that sweep a parameter under --iterate, and which one.
SWEEP_PARAM = {
    "bench_add_single_node": "size",
    "bench_add_single_edge": "size",
    "bench_get_single_node": "size",
    "bench_traversal": "size",
    "bench_spp": "size",
}
# Workloads that need a pre-built 150-grid (reference runs them after
# create_gird_graph).
NEEDS_GRID = {"bench_traversal", "bench_spp"}


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("workload", choices=sorted(WORKLOADS))
    p.add_argument("--iterate", action="store_true", help="parameter sweep")
    p.add_argument("--steps", type=int, default=3)
    p.add_argument("--factor", type=int, default=100)
    p.add_argument("--size", type=int, default=None, help="single-run size")
    p.add_argument("--nodes", help="node file for bench_add_database")
    p.add_argument("--edges", help="edge TSV for bench_add_database")
    p.add_argument("--duration", type=float, default=10.0)
    p.add_argument("--out", default="Results")
    p.add_argument("--clear", action="store_true", help="clear graph first")
    p.add_argument("--cpus", type=int, default=None)
    p.add_argument(
        "--plot",
        action="store_true",
        help="emit a plot of the written .bench file (reference "
        "benchmark→visualizer workflow in one command)",
    )
    args = p.parse_args(argv)

    spark = get_spark(app_name=f"bench-{args.workload}")
    engine = GraphEngine(spark)
    if args.clear:
        engine.clear()
    if args.workload in NEEDS_GRID:
        create_grid_graph(engine, 150)

    workload = WORKLOADS[args.workload]
    kwargs: dict = {}
    if args.workload == "bench_add_database":
        kwargs = {"path_nodes": args.nodes, "path_edges": args.edges}
    elif args.workload == "bench_idle_usage":
        kwargs = {"duration": args.duration}
    elif args.size is not None:
        kwargs = {"size": args.size}

    if args.iterate:
        param = SWEEP_PARAM.get(args.workload, "size")
        kwargs[param] = sweep_values(args.steps, args.factor)
        key, rows = iterate_bench(workload, engine=engine, **kwargs)
        path = save_data(
            args.out, args.workload + "_iter", ENGINE_NAME, iter_header(key), rows
        )
        for row in rows:
            print(f"{key}={row[0]:.0f}: {row[3]:.3f} s (cpu {row[1]:.0f}%, mem {row[2]:.0f} MB)")
    else:
        res = perform_bench(workload, engine=engine, **kwargs)
        path = save_data(
            args.out,
            args.workload,
            ENGINE_NAME,
            TIMESERIES_HEADER,
            [[t, c, m] for t, c, m in res.samples],
        )
        print(f"{res.name}: {res.duration:.3f} s (overhead {res.overhead:.3f} s)")
    print(f"wrote {path}")
    if args.plot:
        from graphdatabases_spark.harness.visualizer import show_single_bench

        print(f"plotted {show_single_bench(path)}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
