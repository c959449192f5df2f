"""Report generation — the reference's LaTeX report re-expressed as
markdown (no TeX toolchain needed; the table content is the parity point).

Reference parity: ref:snowav/report/report.py fills a LaTeX template with
per-basin/per-band tables from ``database.collect()`` frames and shells
out to pdflatex.  Here the same frames (bands × basins pivots from the
ResultsStore) render as markdown sections; the writer is driver-side
because report frames are small by construction.
"""

from __future__ import annotations

import datetime

from snowav_spark.metadata import DEFAULT_UNITS
from snowav_spark.pipeline import PipelineSpec
from snowav_spark.sinks import ResultsStore

_UNIT = {v: u for v, u, _ in DEFAULT_UNITS}


def band_label(band: int, edges: list[float]) -> str:
    """Human band label: '-1' is the reference's synthetic 'total' row."""
    if band == -1:
        return "total"
    lo = edges[band]
    hi = edges[band + 1] if band + 1 < len(edges) else None
    return f"{lo:g}–{hi:g}" if hi is not None else f"≥{lo:g}"


def build_report(
    store: ResultsStore,
    spec: PipelineSpec,
    start: datetime.date,
    end: datetime.date,
    variables: list[str] | None = None,
) -> str:
    """Render the run report: one markdown table per variable, rows =
    elevation bands (+ total), columns = basins."""
    variables = list(variables or spec.variables)
    lines = [
        f"# snowav_spark report — run `{spec.run_id}`",
        "",
        f"Period: {start} → {end}.  Basins: {', '.join(spec.basins)}.",
        f"Elevation band edges: {', '.join(f'{e:g}' for e in spec.edges)}.",
        "",
    ]
    for var in variables:
        frame = store.collect_frame(spec.run_id, var, spec.basins, start, end)
        if frame.empty:
            continue
        unit = _UNIT.get(var, "")
        lines.append(f"## {var}" + (f" ({unit})" if unit else ""))
        lines.append("")
        header = ["band"] + spec.basins
        lines.append("| " + " | ".join(header) + " |")
        lines.append("|" + "---|" * len(header))
        for _, row in frame.sort_values("band").iterrows():
            cells = [band_label(int(row["band"]), spec.edges)] + [
                f"{row[b]:g}" if row[b] == row[b] else "—" for b in spec.basins
            ]
            lines.append("| " + " | ".join(cells) + " |")
        lines.append("")
    return "\n".join(lines)


def write_report(
    store: ResultsStore,
    spec: PipelineSpec,
    start: datetime.date,
    end: datetime.date,
    path: str,
    figs_dir: str | None = None,
) -> str:
    md = build_report(store, spec, start, end)
    if figs_dir:
        import os

        names = write_figures(store, spec, start, end, figs_dir)
        rel = [os.path.relpath(os.path.join(figs_dir, n),
                               os.path.dirname(path) or ".") for n in names]
        md += "\n## Figures\n\n" + "\n".join(
            f"![{n}]({r})" for n, r in zip(names, rel)
        ) + "\n"
    with open(path, "w") as f:
        f.write(md)
    return path


def build_latex(
    store: ResultsStore,
    spec: PipelineSpec,
    start: datetime.date,
    end: datetime.date,
    variables: list[str] | None = None,
    fig_names: list[str] | None = None,
) -> str:
    """The reference's LaTeX template fill (ref:snowav/report/report.py
    renders snowav_report.tex via jinja and shells out to pdflatex).
    This emits the same artifact — a compilable .tex with one booktabs
    table per variable and \\includegraphics hooks for the SVG figures —
    minus the pdflatex subprocess (no TeX toolchain in this container;
    the table content, the parity point, is identical to the markdown
    report's)."""
    variables = list(variables or spec.variables)

    def esc(s: str) -> str:
        for a, b in (
            ("\\", r"\textbackslash{}"), ("&", r"\&"), ("%", r"\%"),
            ("#", r"\#"), ("_", r"\_"), ("$", r"\$"),
        ):
            s = s.replace(a, b)
        return s

    lines = [
        r"\documentclass{article}",
        r"\usepackage{booktabs}",
        r"\usepackage{graphicx}",
        r"\begin{document}",
        r"\section*{snowav\_spark report --- run \texttt{%s}}"
        % esc(spec.run_id),
        r"Period: %s -- %s.  Basins: %s."
        % (start, end, esc(", ".join(spec.basins))),
        "",
    ]
    for var in variables:
        frame = store.collect_frame(spec.run_id, var, spec.basins, start, end)
        if frame.empty:
            continue
        unit = _UNIT.get(var, "")
        cols = "l" + "r" * len(spec.basins)
        lines += [
            r"\subsection*{%s%s}"
            % (esc(var), f" ({esc(unit)})" if unit else ""),
            r"\begin{tabular}{%s}" % cols,
            r"\toprule",
            "band & " + " & ".join(esc(b) for b in spec.basins) + r" \\",
            r"\midrule",
        ]
        for _, row in frame.sort_values("band").iterrows():
            cells = [esc(band_label(int(row["band"]), spec.edges))] + [
                f"{row[b]:g}" if row[b] == row[b] else "---"
                for b in spec.basins
            ]
            lines.append(" & ".join(cells) + r" \\")
        lines += [r"\bottomrule", r"\end{tabular}", ""]
    for name in fig_names or []:
        lines.append(r"\includegraphics[width=\textwidth]{%s}" % name)
    lines.append(r"\end{document}")
    return "\n".join(lines)


def write_latex(
    store: ResultsStore,
    spec: PipelineSpec,
    start: datetime.date,
    end: datetime.date,
    path: str,
    figs_dir: str | None = None,
) -> str:
    fig_names = None
    if figs_dir:
        fig_names = write_figures(store, spec, start, end, figs_dir)
    tex = build_latex(store, spec, start, end, fig_names=fig_names)
    with open(path, "w") as f:
        f.write(tex)
    return path


def write_figures(
    store: ResultsStore,
    spec: PipelineSpec,
    start: datetime.date,
    end: datetime.date,
    figs_dir: str,
    variables: list[str] | None = None,
) -> list[str]:
    """The reference's figure set (ref:snowav/plotting/swe_volume.py,
    basin_total.py) as dependency-free SVG: per variable, a
    volume-by-band grouped bar chart and a basin-totals time series.
    Data comes from the same driver-sized store frames as the tables;
    only filenames are returned so callers control linking."""
    import os

    from pyspark.sql import functions as F

    from snowav_spark import figures

    os.makedirs(figs_dir, exist_ok=True)
    names: list[str] = []
    for var in list(variables or spec.variables):
        frame = store.collect_frame(spec.run_id, var, spec.basins, start, end)
        unit = _UNIT.get(var, "")
        if not frame.empty:
            bands = sorted(int(b) for b in frame["band"] if b != -1)
            cats = [band_label(b, spec.edges) for b in bands]
            by_band = frame.set_index("band")
            series = {
                b: [float(by_band.loc[band, b]) for band in bands]
                for b in spec.basins
            }
            name = f"swe_volume_{var}.svg"
            with open(os.path.join(figs_dir, name), "w") as f:
                f.write(
                    figures.grouped_bar_chart(
                        cats, series, title=f"{var} by band", y_label=unit
                    )
                )
            names.append(name)
        rows = (
            store.read()
            .filter(
                (F.col("run_id") == spec.run_id)
                & (F.col("variable") == var)
                & (F.col("band") == -1)
                & (F.col("date") >= F.lit(start))
                & (F.col("date") < F.lit(end))
            )
            .groupBy("date", "basin_id")
            .agg(F.round(F.sum("value"), 6).alias("v"))
            .collect()
        )
        if rows:
            series_t: dict[str, list[tuple[str, float]]] = {
                b: [] for b in spec.basins
            }
            for r in rows:
                if r.basin_id in series_t:
                    series_t[r.basin_id].append((str(r.date), r.v))
            name = f"basin_total_{var}.svg"
            with open(os.path.join(figs_dir, name), "w") as f:
                f.write(
                    figures.line_chart(
                        series_t, title=f"{var} basin total", y_label=unit
                    )
                )
            names.append(name)
    return names
