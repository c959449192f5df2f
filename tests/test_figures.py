"""SVG figure generation (figures.py) + report integration — the
reference's plotting surface (ref:snowav/plotting/swe_volume.py,
basin_total.py, swe_difference.py) adapted to a matplotlib-less
container.  Geometry is plain arithmetic, so the tests pin it exactly;
every chart must also be well-formed XML."""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import functions as F

from snowav_spark import figures


def _parse(svg: str) -> ET.Element:
    return ET.fromstring(svg)


def test_line_chart_polylines_and_scaling():
    svg = figures.line_chart(
        {
            "basin_A": [("2024-01-01", 0.0), ("2024-01-02", 10.0)],
            "basin_B": [("2024-01-01", 5.0), ("2024-01-02", 5.0)],
        },
        title="totals",
        y_label="in",
    )
    root = _parse(svg)
    ns = "{http://www.w3.org/2000/svg}"
    lines = root.findall(f"{ns}polyline")
    assert len(lines) == 2
    # basin_A spans the full y range: first point at the bottom (max y
    # pixel), second at the top (min y pixel) of the two
    pts = [
        tuple(map(float, p.split(",")))
        for p in lines[0].attrib["points"].split()
    ]
    assert pts[0][1] > pts[1][1]
    # flat series renders a horizontal line
    pts_b = [
        tuple(map(float, p.split(",")))
        for p in lines[1].attrib["points"].split()
    ]
    assert pts_b[0][1] == pts_b[1][1]
    assert "totals" in svg and "basin_B" in svg and "in" in svg


def test_bar_chart_heights_proportional():
    svg = figures.grouped_bar_chart(
        ["0–10", "10–20"],
        {"basin_A": [10.0, 20.0]},
        title="by band",
    )
    root = _parse(svg)
    ns = "{http://www.w3.org/2000/svg}"
    bars = [
        r
        for r in root.findall(f"{ns}rect")
        if r.attrib.get("fill", "").startswith("#")
        and float(r.attrib["width"]) > 20  # excludes the legend swatch
    ]
    assert len(bars) == 2
    h1, h2 = (float(b.attrib["height"]) for b in bars)
    assert abs(h2 / h1 - 2.0) < 0.01  # value 20 draws twice as tall as 10


def test_bar_chart_nan_is_missing_bar():
    svg = figures.grouped_bar_chart(
        ["a", "b"], {"x": [1.0, float("nan")]}
    )
    root = _parse(svg)
    ns = "{http://www.w3.org/2000/svg}"
    bars = [
        r
        for r in root.findall(f"{ns}rect")
        if r.attrib.get("fill", "") in figures.PALETTE
        and float(r.attrib["width"]) > 20  # excludes the legend swatch
    ]
    assert len(bars) == 1


def test_heatmap_diverging_colors():
    svg = figures.heatmap([[-2.0, 0.0, 2.0]], title="change")
    assert "rgb(0,0,255)" in svg  # full loss → blue
    assert "rgb(255,255,255)" in svg  # zero → white
    assert "rgb(255,0,0)" in svg  # full gain → red
    _parse(svg)  # well-formed


def test_block_mean_grid_downsamples_on_spark(spark):
    # 8×8 grid with value = y — block-mean to ≤4 cells/axis → 2×2 blocks
    rows = [(y, x, float(y)) for y in range(8) for x in range(8)]
    df = spark.createDataFrame(rows, ["y", "x", "value"])
    grid = figures.block_mean_grid(df, max_cells=4)
    assert len(grid) == 4 and len(grid[0]) == 4
    # block rows average their two source rows: (0+1)/2, (2+3)/2, ...
    assert [row[0] for row in grid] == [0.5, 2.5, 4.5, 6.5]


def test_write_figures_and_report_links(spark, tmp_path):
    import datetime

    from snowav_spark import pipeline, report, sinks

    spec = pipeline.PipelineSpec(
        run_id="figs_run",
        edges=[0, 10, 20],
        basins=["basin_A", "basin_B"],
        store_path=str(tmp_path / "store"),
        variables=("swe_mm",),
    )
    rows = []
    for d in (datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)):
        for b in spec.basins:
            for band, v in ((-1, 30.0), (0, 10.0), (1, 20.0)):
                rows.append(("figs_run", d, b, "swe_mm", band, v))
    df = spark.createDataFrame(
        rows, ["run_id", "date", "basin_id", "variable", "band", "value"]
    )
    store = sinks.ResultsStore(spark, spec.store_path)
    store.write(df)
    start, end = datetime.date(2024, 1, 1), datetime.date(2024, 1, 3)
    figs = tmp_path / "figs"
    md_path = tmp_path / "report.md"
    report.write_report(
        store, spec, start, end, str(md_path), figs_dir=str(figs)
    )
    names = sorted(p.name for p in figs.iterdir())
    assert names == ["basin_total_swe_mm.svg", "swe_volume_swe_mm.svg"]
    for p in figs.iterdir():
        _parse(p.read_text())
    md = md_path.read_text()
    assert "## Figures" in md
    assert "figs/swe_volume_swe_mm.svg" in md


def test_latex_report_structure(spark, tmp_path):
    """build_latex fills the reference's report template shape: preamble,
    one booktabs table per variable with escaped cells, figure hooks,
    balanced environments."""
    import datetime

    from snowav_spark import pipeline, report, sinks

    spec = pipeline.PipelineSpec(
        run_id="tex_run",
        edges=[0, 10, 20],
        basins=["basin_A", "basin_B"],
        store_path=str(tmp_path / "store"),
        variables=("swe_mm",),
    )
    rows = [
        ("tex_run", datetime.date(2024, 1, 1), b, "swe_mm", band, v)
        for b in spec.basins
        for band, v in ((-1, 30.0), (0, 10.0), (1, 20.0))
    ]
    store = sinks.ResultsStore(spark, spec.store_path)
    store.write(
        spark.createDataFrame(
            rows,
            ["run_id", "date", "basin_id", "variable", "band", "value"],
        )
    )
    out = tmp_path / "report.tex"
    report.write_latex(
        store,
        spec,
        datetime.date(2024, 1, 1),
        datetime.date(2024, 1, 2),
        str(out),
        figs_dir=str(tmp_path / "figs"),
    )
    tex = out.read_text()
    assert tex.startswith(r"\documentclass")
    assert tex.count(r"\begin{tabular}") == tex.count(r"\end{tabular}") == 1
    assert r"\toprule" in tex and r"\bottomrule" in tex
    assert r"swe\_mm" in tex  # underscore escaped
    assert "band & basin\\_A & basin\\_B" in tex
    assert tex.count(r"\includesvg") == 2  # bar + line figure (svg pkg)
    assert r"\usepackage{svg}" in tex  # pdflatex cannot take .svg raw
    assert tex.rstrip().endswith(r"\end{document}")
