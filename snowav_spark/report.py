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


def _frames(
    store: ResultsStore,
    spec: PipelineSpec,
    start: datetime.date,
    end: datetime.date,
    variables: list[str] | None = None,
) -> dict:
    """One collect_frame per variable, computed ONCE — write_report /
    write_latex pass the same dict to the table renderer AND the figure
    writer, so the store is scanned once per variable, not twice."""
    return {
        var: store.collect_frame(spec.run_id, var, spec.basins, start, end)
        for var in list(variables or spec.variables)
    }


def _table_rows(frame, spec: PipelineSpec):
    """Shared row extraction for the markdown and LaTeX renderers:
    (band label, per-basin value-or-None) in band order — ONE place for
    the sort / NaN / band-label conventions."""
    for _, row in frame.sort_values("band").iterrows():
        label = band_label(int(row["band"]), spec.edges)
        yield label, [
            float(row[b]) if row[b] == row[b] else None for b in spec.basins
        ]


def build_report(
    store: ResultsStore,
    spec: PipelineSpec,
    start: datetime.date,
    end: datetime.date,
    variables: list[str] | None = None,
    frames: dict | None = None,
) -> str:
    """Render the run report: one markdown table per variable, rows =
    elevation bands (+ total), columns = basins."""
    frames = frames or _frames(store, spec, start, end, variables)
    lines = [
        f"# snowav_spark report — run `{spec.run_id}`",
        "",
        f"Period: {start} → {end}.  Basins: {', '.join(spec.basins)}.",
        f"Elevation band edges: {', '.join(f'{e:g}' for e in spec.edges)}.",
        "",
    ]
    for var, frame in frames.items():
        if frame.empty:
            continue
        unit = _UNIT.get(var, "")
        lines.append(f"## {var}" + (f" ({unit})" if unit else ""))
        lines.append("")
        header = ["band"] + spec.basins
        lines.append("| " + " | ".join(header) + " |")
        lines.append("|" + "---|" * len(header))
        for label, vals in _table_rows(frame, spec):
            cells = [label] + [
                f"{v:g}" if v is not None else "—" for v in vals
            ]
            lines.append("| " + " | ".join(cells) + " |")
        lines.append("")
    return "\n".join(lines)


def _rel_figs(names: list[str], figs_dir: str, doc_path: str) -> list[str]:
    """Figure paths RELATIVE to the document that references them — a
    bare basename only resolves when figs_dir == the document's own
    directory (the round-7 review caught the .tex emitting bare stems
    that pdflatex could never find under the documented INI layout)."""
    import os

    return [
        os.path.relpath(
            os.path.join(figs_dir, n), os.path.dirname(doc_path) or "."
        )
        for n in names
    ]


def write_report(
    store: ResultsStore,
    spec: PipelineSpec,
    start: datetime.date,
    end: datetime.date,
    path: str,
    figs_dir: str | None = None,
    frames: dict | None = None,
    fig_names: list[str] | None = None,
) -> str:
    """``frames`` / ``fig_names`` let a caller that renders BOTH report
    formats (cli.py) collect the store and render the SVGs once instead
    of once per format."""
    frames = frames or _frames(store, spec, start, end)
    md = build_report(store, spec, start, end, frames=frames)
    if figs_dir:
        names = (
            fig_names
            if fig_names is not None
            else write_figures(store, spec, start, end, figs_dir, frames=frames)
        )
        rel = _rel_figs(names, figs_dir, path)
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
    frames: dict | None = None,
) -> str:
    """The reference's LaTeX template fill (ref:snowav/report/report.py
    renders snowav_report.tex via jinja and shells out to pdflatex).
    This emits the same artifact — a compilable .tex with one booktabs
    table per variable and \\includegraphics hooks for the SVG figures —
    minus the pdflatex subprocess (no TeX toolchain in this container;
    the table content, the parity point, is identical to the markdown
    report's — both renderers consume the SAME _table_rows extraction)."""
    frames = frames or _frames(store, spec, start, end, variables)

    tex = {
        "\\": r"\textbackslash{}", "{": r"\{", "}": r"\}",
        "&": r"\&", "%": r"\%", "#": r"\#", "_": r"\_",
        "$": r"\$", "^": r"\^{}", "~": r"\~{}",
    }

    def esc(s: str) -> str:
        # single-pass character map (sequential .replace would re-escape
        # the braces that \textbackslash{} itself introduces); ^ matters
        # in practice — DEFAULT_UNITS has kg/m^3, which unescaped breaks
        # compilation with 'Missing $ inserted'
        return "".join(tex.get(ch, ch) for ch in s)

    lines = [
        r"\documentclass{article}",
        r"\usepackage{booktabs}",
        # figures are SVG (dependency-free on OUR side); pdflatex includes
        # them through the svg package (inkscape-backed, needs
        # -shell-escape) — \includegraphics cannot take .svg directly
        *([r"\usepackage{svg}"] if fig_names else []),
        r"\begin{document}",
        r"\section*{snowav\_spark report --- run \texttt{%s}}"
        % esc(spec.run_id),
        r"Period: %s -- %s.  Basins: %s."
        % (start, end, esc(", ".join(spec.basins))),
        "",
    ]
    for var, frame in frames.items():
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
        for label, vals in _table_rows(frame, spec):
            cells = [esc(label)] + [
                f"{v:g}" if v is not None else "---" for v in vals
            ]
            lines.append(" & ".join(cells) + r" \\")
        lines += [r"\bottomrule", r"\end{tabular}", ""]
    for name in fig_names or []:
        stem = name[:-4] if name.endswith(".svg") else name
        lines.append(r"\includesvg[width=\textwidth]{%s}" % stem)
    lines.append(r"\end{document}")
    return "\n".join(lines)


def write_latex(
    store: ResultsStore,
    spec: PipelineSpec,
    start: datetime.date,
    end: datetime.date,
    path: str,
    figs_dir: str | None = None,
    frames: dict | None = None,
    fig_names: list[str] | None = None,
) -> str:
    frames = frames or _frames(store, spec, start, end)
    rel = None
    if figs_dir:
        names = (
            fig_names
            if fig_names is not None
            else write_figures(store, spec, start, end, figs_dir, frames=frames)
        )
        rel = _rel_figs(names, figs_dir, path)
    tex = build_latex(store, spec, start, end, fig_names=rel, frames=frames)
    with open(path, "w") as f:
        f.write(tex)
    return path


def compile_pdf(tex_path: str) -> str | None:
    """Finish the reference's chain (ref:snowav/report/report.py shells
    out to pdflatex) when a TeX toolchain exists on this host: run
    ``pdflatex -interaction=nonstopmode -shell-escape`` (shell-escape for
    the svg package's inkscape conversion) in the .tex's directory.
    Returns the PDF path, or None when pdflatex is absent — this
    container ships none, so the CLI prints the one-command finish step
    instead."""
    import os
    import shutil
    import subprocess

    if shutil.which("pdflatex") is None:
        return None
    d = os.path.dirname(os.path.abspath(tex_path)) or "."
    proc = subprocess.run(
        [
            "pdflatex",
            "-interaction=nonstopmode",
            "-shell-escape",
            os.path.basename(tex_path),
        ],
        cwd=d,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        # a partial TeX install (no svg.sty / no inkscape) must not crash
        # the CLI after every report was already written — surface the
        # log tail and fall back to the manual-finish message
        tail = "\n".join((proc.stdout or proc.stderr or "").splitlines()[-15:])
        print(f"pdflatex failed (exit {proc.returncode}); log tail:\n{tail}")
        return None
    return os.path.splitext(tex_path)[0] + ".pdf"


def write_figures(
    store: ResultsStore,
    spec: PipelineSpec,
    start: datetime.date,
    end: datetime.date,
    figs_dir: str,
    variables: list[str] | None = None,
    frames: dict | None = None,
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
    frames = frames or _frames(store, spec, start, end, variables)
    names: list[str] = []
    for var, frame in frames.items():
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
