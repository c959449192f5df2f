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
) -> str:
    md = build_report(store, spec, start, end)
    with open(path, "w") as f:
        f.write(md)
    return path
