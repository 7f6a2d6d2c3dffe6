"""Benchmark plot emission (O22, second half).

Rebuilds the reference's ``visualizer.py:5-65`` — single-benchmark line
plots (``show_single_bench``), multi-benchmark comparison lines and
average bar charts (``show_multiple_bench``) over ``.bench`` CSVs — as
file-emitting functions: the reference pops interactive Tk/matplotlib
windows; a cluster-side harness writes plot files instead.

Backends: matplotlib (PNG) when importable, else a built-in
dependency-free SVG renderer — this container ships no plotting libs,
and the plots a bench harness needs (lines + bars + legend + axes) fit
in a page of SVG. The data preparation (x-axis discovery via the ``_``
header prefix, column selection, per-file averaging, backend-name
ordering) mirrors the reference exactly and is backend-independent.

Column selection is CLI flags (``--show``), replacing the reference's
Tk checkbox window (``visualizer.py:68-88``)::

    python -m graphdatabases_spark.harness.visualizer \
        Results/bench_traversal_Spark_*.bench --show "TIME [s]" --out plot.svg
"""

from __future__ import annotations

import argparse
import os
from collections.abc import Sequence

from graphdatabases_spark.harness.runner import read_bench

try:  # pragma: no cover - not installed in the test container
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _HAVE_MPL = True
except ImportError:
    _HAVE_MPL = False

# The reference compares fixed backends and orders series by these names
# in the file path (visualizer.py:40-47); Spark is ours.
KNOWN_ENGINES = ("Orient", "Arango", "NEO4j", "Spark")

_PALETTE = ("#4269d0", "#efb118", "#ff725c", "#6cc5b0", "#a463f2", "#97bbf5")


def series_label(path: str) -> str:
    """Engine label for a ``.bench`` file: the known-engine name in the
    path if any (reference behavior), else the ``<engine>`` segment of
    the ``<bench>_<engine>_<ts>.bench`` contract."""
    for name in KNOWN_ENGINES:
        if name in os.path.basename(path):
            return name
    parts = os.path.basename(path).rsplit(".", 1)[0].split("_")
    return parts[-3] if len(parts) >= 3 else parts[0]


def load_series(path: str, to_show: Sequence[str]):
    """(x_name, x_values, {column: values}) for the selected columns."""
    cols, x_idx, rows = read_bench(path)
    x_name = cols[x_idx]
    xs = [r[x_idx] for r in rows]
    data = {
        c: [r[i] for r in rows]
        for i, c in enumerate(cols)
        if i != x_idx and (not to_show or c in to_show)
    }
    return x_name, xs, data


# ---------------------------------------------------------------------------
# built-in SVG backend
# ---------------------------------------------------------------------------

_W, _H, _ML, _MR, _MT, _MB = 640, 420, 64, 16, 24, 48


def _scale(vals: list[float], lo_px: float, hi_px: float):
    vmin, vmax = min(vals), max(vals)
    if vmax == vmin:
        vmax = vmin + 1.0
    span = vmax - vmin
    return lambda v: lo_px + (v - vmin) / span * (hi_px - lo_px), vmin, vmax


def _svg_doc(body: list[str]) -> str:
    return (
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" height="{_H}" '
        f'font-family="sans-serif" font-size="12">\n'
        f'<rect width="{_W}" height="{_H}" fill="white"/>\n'
        + "\n".join(body)
        + "\n</svg>\n"
    )


def _axes(xlabel: str, ylabel: str, xmin, xmax, ymin, ymax) -> list[str]:
    x0, x1, y0, y1 = _ML, _W - _MR, _H - _MB, _MT
    return [
        f'<line x1="{x0}" y1="{y0}" x2="{x1}" y2="{y0}" stroke="black"/>',
        f'<line x1="{x0}" y1="{y0}" x2="{x0}" y2="{y1}" stroke="black"/>',
        f'<text x="{(x0 + x1) / 2}" y="{_H - 10}" text-anchor="middle">{xlabel}</text>',
        f'<text x="14" y="{(y0 + y1) / 2}" text-anchor="middle" '
        f'transform="rotate(-90 14 {(y0 + y1) / 2})">{ylabel}</text>',
        f'<text x="{x0}" y="{y0 + 16}" text-anchor="middle">{xmin:g}</text>',
        f'<text x="{x1}" y="{y0 + 16}" text-anchor="middle">{xmax:g}</text>',
        f'<text x="{x0 - 6}" y="{y0 + 4}" text-anchor="end">{ymin:g}</text>',
        f'<text x="{x0 - 6}" y="{y1 + 4}" text-anchor="end">{ymax:g}</text>',
    ]


def _svg_lines(
    series: dict[str, tuple[list[float], list[float]]], xlabel: str, ylabel: str
) -> str:
    all_x = [v for xs, _ in series.values() for v in xs]
    all_y = [v for _, ys in series.values() for v in ys]
    sx, xmin, xmax = _scale(all_x, _ML, _W - _MR)
    sy, ymin, ymax = _scale(all_y, _H - _MB, _MT)
    body = _axes(xlabel, ylabel, xmin, xmax, ymin, ymax)
    for i, (label, (xs, ys)) in enumerate(series.items()):
        color = _PALETTE[i % len(_PALETTE)]
        pts = " ".join(f"{sx(x):.1f},{sy(y):.1f}" for x, y in zip(xs, ys))
        body.append(
            f'<polyline points="{pts}" fill="none" stroke="{color}" stroke-width="2"/>'
        )
        ly = _MT + 16 * i
        body.append(f'<line x1="{_W - 150}" y1="{ly}" x2="{_W - 130}" y2="{ly}" stroke="{color}" stroke-width="2"/>')
        body.append(f'<text x="{_W - 124}" y="{ly + 4}">{label}</text>')
    return _svg_doc(body)


def _svg_bars(bars: dict[str, float], ylabel: str) -> str:
    sy, ymin, ymax = _scale([0.0, *bars.values()], _H - _MB, _MT)
    y0 = _H - _MB
    n = len(bars)
    slot = (_W - _ML - _MR) / max(n, 1)
    body = _axes("", ylabel, 0, n, min(0.0, *bars.values()), ymax)
    for i, (label, v) in enumerate(bars.items()):
        color = _PALETTE[i % len(_PALETTE)]
        x = _ML + slot * i + slot * 0.2
        body.append(
            f'<rect x="{x:.1f}" y="{sy(v):.1f}" width="{slot * 0.6:.1f}" '
            f'height="{abs(y0 - sy(v)):.1f}" fill="{color}"/>'
        )
        body.append(
            f'<text x="{x + slot * 0.3:.1f}" y="{y0 + 16}" text-anchor="middle">{label}</text>'
        )
        body.append(
            f'<text x="{x + slot * 0.3:.1f}" y="{sy(v) - 4:.1f}" text-anchor="middle">{v:g}</text>'
        )
    return _svg_doc(body)


def _emit(render_svg, render_mpl, out: str) -> str:
    if _HAVE_MPL:  # pragma: no cover - not installed in the test container
        render_mpl()
        plt.savefig(out)
        plt.close()
    else:
        if out.endswith(".png"):
            out = out[:-4] + ".svg"
        with open(out, "w", encoding="utf-8") as f:
            f.write(render_svg())
    return out


# ---------------------------------------------------------------------------
# reference API (file-emitting)
# ---------------------------------------------------------------------------


def show_single_bench(
    path: str, to_show: Sequence[str] = (), out: str | None = None
) -> str:
    """One benchmark, selected columns as lines over the x-axis column
    (reference ``visualizer.py:5-27``). Returns the written plot path."""
    x_name, xs, data = load_series(path, to_show)
    out = out or os.path.splitext(path)[0] + ".svg"
    series = {c: (xs, ys) for c, ys in data.items()}

    def mpl():  # pragma: no cover
        for c, (xs_, ys) in series.items():
            plt.plot(xs_, ys, label=c)
        plt.xlabel(x_name)
        plt.legend()

    return _emit(lambda: _svg_lines(series, x_name, ""), mpl, out)


def show_multiple_bench(
    paths: Sequence[str],
    to_show: Sequence[str],
    use_avg: bool = False,
    out_dir: str | None = None,
) -> list[str]:
    """Compare engines: one plot PER selected column across files
    (reference ``visualizer.py:30-65``) — lines over the shared x-axis,
    or per-engine average bars with ``use_avg``. Returns written paths.

    Files are ordered by known engine name like the reference; unknown
    engines keep their input order instead of being dropped.
    """
    ordered = [p for name in KNOWN_ENGINES for p in paths if series_label(p) == name]
    ordered += [p for p in paths if p not in ordered]
    out_dir = out_dir or os.path.dirname(ordered[0]) or "."
    written = []
    for col in to_show:
        series: dict[str, tuple[list[float], list[float]]] = {}
        for p in ordered:
            x_name, xs, data = load_series(p, [col])
            if col in data:
                series[series_label(p)] = (xs, data[col])
        if not series:
            continue
        slug = "".join(ch if ch.isalnum() else "_" for ch in col).strip("_")
        out = os.path.join(out_dir, f"compare_{slug}{'_avg' if use_avg else ''}.svg")
        if use_avg:
            bars = {k: sum(ys) / len(ys) for k, (_, ys) in series.items() if ys}

            def mpl():  # pragma: no cover
                plt.bar(list(bars), list(bars.values()))
                plt.ylabel(col)

            written.append(_emit(lambda: _svg_bars(bars, col), mpl, out))
        else:

            def mpl():  # pragma: no cover
                for label, (xs, ys) in series.items():
                    plt.plot(xs, ys, label=label)
                plt.xlabel(x_name)
                plt.ylabel(col)
                plt.legend()

            written.append(_emit(lambda: _svg_lines(series, x_name, col), mpl, out))
    return written


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("paths", nargs="+", help=".bench files")
    p.add_argument(
        "--show", nargs="*", default=[], help="columns to plot (default: all)"
    )
    p.add_argument("--avg", action="store_true", help="average bars (multi-file)")
    p.add_argument("--out", help="output file (single) or directory (multi)")
    args = p.parse_args(argv)
    if len(args.paths) == 1 and not args.avg:
        print(show_single_bench(args.paths[0], args.show, args.out))
    else:
        to_show = args.show
        if not to_show:  # default: every non-x column of the first file
            cols, x_idx, _ = read_bench(args.paths[0])
            to_show = [c for i, c in enumerate(cols) if i != x_idx]
        for path in show_multiple_bench(args.paths, to_show, args.avg, args.out):
            print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
