"""Figure generation — the reference's matplotlib figure set re-expressed
as dependency-free SVG (this container has no matplotlib; SVG is plain
text, renders everywhere, and diffs cleanly in review).

Reference parity (the reference's largest user-facing surface):

- ref:snowav/plotting/swe_volume.py — per-basin volume by elevation band
  → :func:`grouped_bar_chart`
- ref:snowav/plotting/basin_total.py — basin totals over the water year
  → :func:`line_chart`
- ref:snowav/plotting/swe_difference.py — gridded change map
  → :func:`heatmap` fed by :func:`block_mean_grid` (the Spark-side
  downsample: the full grid never reaches the driver)

Charts are driver-side because report frames are small by construction
(bands × basins, days × basins); the ONLY distributed step is the
heatmap's block-mean aggregation.  Geometry is computed with plain
arithmetic and emitted as SVG primitives — no plotting library to port,
nothing to pin but the math, which the tests do exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# a small colorblind-safe categorical cycle (Okabe–Ito)
PALETTE = (
    "#0072B2",
    "#E69F00",
    "#009E73",
    "#CC79A7",
    "#56B4E9",
    "#D55E00",
    "#F0E442",
    "#000000",
)

_W, _H = 640, 360
_ML, _MR, _MT, _MB = 56, 16, 28, 44  # margins: left/right/top/bottom


def _esc(s: str) -> str:
    return (
        str(s).replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    )


def _fmt(v: float) -> str:
    return f"{v:g}"


def _ticks(lo: float, hi: float, n: int = 5) -> list[float]:
    """n 'nice' axis ticks covering [lo, hi] — 1/2/5×10^k steps."""
    if hi <= lo:
        return [lo]
    raw = (hi - lo) / max(n - 1, 1)
    mag = 10 ** len(str(int(abs(raw)))) / 10 if raw >= 1 else 1.0
    while mag > raw:
        mag /= 10
    step = next(s * mag for s in (1, 2, 5, 10) if s * mag >= raw)
    t0 = int(lo / step) * step
    out = []
    t = t0
    while t <= hi + step * 1e-9:
        if t >= lo - step * 1e-9:
            out.append(round(t, 10))
        t += step
    return out or [lo]


def _frame(title: str) -> list[str]:
    return [
        f'<svg xmlns="http://www.w3.org/2000/svg" width="{_W}" '
        f'height="{_H}" viewBox="0 0 {_W} {_H}" '
        f'font-family="sans-serif" font-size="11">',
        f'<rect width="{_W}" height="{_H}" fill="white"/>',
        f'<text x="{_W / 2:g}" y="16" text-anchor="middle" '
        f'font-size="13" font-weight="bold">{_esc(title)}</text>',
    ]


def _legend(names: list[str]) -> list[str]:
    out = []
    x = _ML
    for i, name in enumerate(names):
        c = PALETTE[i % len(PALETTE)]
        out.append(
            f'<rect x="{x}" y="{_H - 14}" width="10" height="10" fill="{c}"/>'
        )
        out.append(
            f'<text x="{x + 13}" y="{_H - 5}">{_esc(name)}</text>'
        )
        x += 13 + 7 * len(str(name)) + 18
    return out


def _y_axis(lo: float, hi: float, plot_h: float) -> tuple[list[str], float, float]:
    """Gridlines + labels; returns (svg, lo, hi) with lo/hi snapped to
    the tick range so bars/lines fill the frame."""
    ticks = _ticks(lo, hi)
    lo, hi = min(lo, ticks[0]), max(hi, ticks[-1])
    span = (hi - lo) or 1.0
    out = []
    for t in ticks:
        y = _MT + plot_h * (1 - (t - lo) / span)
        out.append(
            f'<line x1="{_ML}" y1="{y:.1f}" x2="{_W - _MR}" y2="{y:.1f}" '
            f'stroke="#ddd"/>'
        )
        out.append(
            f'<text x="{_ML - 6}" y="{y + 4:.1f}" '
            f'text-anchor="end">{_fmt(t)}</text>'
        )
    return out, lo, hi


def line_chart(
    series: dict[str, list[tuple[str, float]]],
    title: str = "",
    y_label: str = "",
) -> str:
    """Multi-series line chart: ``series[name] = [(x_label, y), ...]``.
    The basin-totals-over-time figure (ref:snowav/plotting/
    basin_total.py) — one polyline per basin, shared x domain."""
    xs: list[str] = []
    for pts in series.values():
        for x, _ in pts:
            if x not in xs:
                xs.append(x)
    xs.sort()
    ys = [y for pts in series.values() for _, y in pts if y == y]
    lo, hi = (min(ys), max(ys)) if ys else (0.0, 1.0)
    if lo == hi:
        lo, hi = lo - 1, hi + 1
    plot_w, plot_h = _W - _ML - _MR, _H - _MT - _MB
    svg = _frame(title)
    grid, lo, hi = _y_axis(lo, hi, plot_h)
    svg += grid
    span = (hi - lo) or 1.0

    def px(i: int) -> float:
        return _ML + (plot_w * i / max(len(xs) - 1, 1))

    def py(v: float) -> float:
        return _MT + plot_h * (1 - (v - lo) / span)

    # x labels: first / middle / last to stay readable at any density
    # (an all-empty series set yields xs == [] — emit an axis-less
    # empty chart rather than indexing into nothing)
    for i in {0, len(xs) // 2, len(xs) - 1} if xs else ():
        svg.append(
            f'<text x="{px(i):.1f}" y="{_H - _MB + 14}" '
            f'text-anchor="middle">{_esc(xs[i])}</text>'
        )
    if y_label:
        svg.append(
            f'<text x="14" y="{_MT - 8}" text-anchor="start">'
            f"{_esc(y_label)}</text>"
        )
    idx = {x: i for i, x in enumerate(xs)}
    for si, (name, pts) in enumerate(series.items()):
        c = PALETTE[si % len(PALETTE)]
        coords = " ".join(
            f"{px(idx[x]):.1f},{py(y):.1f}"
            for x, y in sorted(pts)
            if y == y
        )
        svg.append(
            f'<polyline points="{coords}" fill="none" stroke="{c}" '
            f'stroke-width="1.8"/>'
        )
    svg += _legend(list(series))
    svg.append("</svg>")
    return "\n".join(svg)


def grouped_bar_chart(
    categories: list[str],
    series: dict[str, list[float]],
    title: str = "",
    y_label: str = "",
) -> str:
    """Grouped bars: one group per category (elevation band), one bar per
    series (basin) — the SWE-volume-by-band figure (ref:snowav/plotting/
    swe_volume.py).  ``series[name][i]`` pairs with ``categories[i]``;
    NaN renders as a missing bar."""
    vals = [v for vs in series.values() for v in vs if v == v]
    lo = min(0.0, min(vals)) if vals else 0.0
    hi = max(vals) if vals else 1.0
    if lo == hi:
        hi = lo + 1
    plot_w, plot_h = _W - _ML - _MR, _H - _MT - _MB
    svg = _frame(title)
    grid, lo, hi = _y_axis(lo, hi, plot_h)
    svg += grid
    span = (hi - lo) or 1.0
    n_cat, n_ser = len(categories), max(len(series), 1)
    group_w = plot_w / max(n_cat, 1)
    bar_w = group_w * 0.8 / n_ser
    y0 = _MT + plot_h * (1 - (0 - lo) / span)  # baseline at value 0
    for ci, cat in enumerate(categories):
        gx = _ML + group_w * ci
        svg.append(
            f'<text x="{gx + group_w / 2:.1f}" y="{_H - _MB + 14}" '
            f'text-anchor="middle">{_esc(cat)}</text>'
        )
        for si, (name, vs) in enumerate(series.items()):
            v = vs[ci] if ci < len(vs) else float("nan")
            if v != v:
                continue
            y = _MT + plot_h * (1 - (v - lo) / span)
            top, h = (y, y0 - y) if v >= 0 else (y0, y - y0)
            svg.append(
                f'<rect x="{gx + group_w * 0.1 + bar_w * si:.1f}" '
                f'y="{top:.1f}" width="{bar_w:.1f}" height="{abs(h):.1f}" '
                f'fill="{PALETTE[si % len(PALETTE)]}"/>'
            )
    if y_label:
        svg.append(
            f'<text x="14" y="{_MT - 8}" text-anchor="start">'
            f"{_esc(y_label)}</text>"
        )
    svg += _legend(list(series))
    svg.append("</svg>")
    return "\n".join(svg)


def block_mean_grid(
    raster: DataFrame, max_cells: int = 128
) -> list[list[float]]:
    """Spark-side downsample for :func:`heatmap`: block-mean a tall
    (y, x, value) frame so at most ``max_cells`` cells per axis reach the
    driver — the full grid NEVER collects (a 100 TB map becomes one
    map-side-combined aggregate of ≤ max_cells² rows)."""
    ny, nx = raster.agg(
        F.max("y").alias("ny"), F.max("x").alias("nx")
    ).collect()[0]
    ky = max((int(ny) + 1 + max_cells - 1) // max_cells, 1)
    kx = max((int(nx) + 1 + max_cells - 1) // max_cells, 1)
    rows = (
        raster.groupBy(
            (F.col("y") / ky).cast("int").alias("by"),
            (F.col("x") / kx).cast("int").alias("bx"),
        )
        .agg(F.avg("value").alias("v"))
        .collect()
    )
    h = max(r.by for r in rows) + 1
    w = max(r.bx for r in rows) + 1
    grid = [[float("nan")] * w for _ in range(h)]
    for r in rows:
        grid[r.by][r.bx] = r.v
    return grid


def heatmap(grid: list[list[float]], title: str = "") -> str:
    """Diverging change map (ref:snowav/plotting/swe_difference.py): blue
    = loss, white = no change, red = gain, symmetric around zero.  Feed
    from :func:`block_mean_grid`; cells are SVG rects."""
    vals = [v for row in grid for v in row if v == v]
    amp = max((abs(v) for v in vals), default=1.0) or 1.0
    h, w = len(grid), max((len(r) for r in grid), default=1)
    plot_w, plot_h = _W - _ML - _MR, _H - _MT - _MB
    cw, ch = plot_w / w, plot_h / h
    svg = _frame(title)
    for yi, row in enumerate(grid):
        for xi, v in enumerate(row):
            if v != v:
                continue
            t = max(-1.0, min(1.0, v / amp))
            if t >= 0:  # white → red
                r, g, b = 255, int(255 * (1 - t)), int(255 * (1 - t))
            else:  # white → blue
                r, g, b = int(255 * (1 + t)), int(255 * (1 + t)), 255
            svg.append(
                f'<rect x="{_ML + cw * xi:.1f}" y="{_MT + ch * yi:.1f}" '
                f'width="{cw + 0.5:.1f}" height="{ch + 0.5:.1f}" '
                f'fill="rgb({r},{g},{b})"/>'
            )
    svg.append(
        f'<text x="{_ML}" y="{_H - 8}">-{_fmt(amp)}</text>'
    )
    svg.append(
        f'<text x="{_W - _MR}" y="{_H - 8}" text-anchor="end">'
        f"+{_fmt(amp)}</text>"
    )
    svg.append("</svg>")
    return "\n".join(svg)
