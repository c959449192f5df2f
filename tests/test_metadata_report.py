"""RunMetadata/VariableUnits side tables and the markdown report."""

from __future__ import annotations

import datetime

from snowav_spark import ingest, metadata, pipeline, report


def test_run_metadata_roundtrip(spark, tmp_path):
    store = metadata.RunMetadataStore(spark, str(tmp_path / "runs"))
    store.record("r1", "wy2024", {"edges": [1, 2]}, now=datetime.datetime(2024, 1, 1))
    store.record("r2", "wy2024", {"edges": [1, 2, 3]}, now=datetime.datetime(2024, 2, 1))
    store.record("r3", "other", {}, now=datetime.datetime(2024, 3, 1))
    assert store.runs().count() == 3
    latest = store.latest("wy2024")
    assert latest[0].run_id == "r2"


def test_variable_units_dim(spark):
    vu = metadata.variable_units(spark)
    rows = {r.variable: r.unit for r in vu.collect()}
    assert rows["swe_vol"] == "TAF"
    assert rows["swe_mm"] == "in"


def test_markdown_report(spark, tmp_path):
    edges = [1000.0, 1500.0, 2000.0, 2500.0, 3000.0]
    dates = [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]
    spec = pipeline.PipelineSpec(
        run_id="rep_run",
        edges=edges,
        basins=["basin_A", "basin_B"],
        store_path=str(tmp_path / "store"),
    )
    raster = ingest.synthetic_raster(spark, 10, 10, dates, ["swe_mm", "swi_mm"])
    topo = ingest.synthetic_topo(spark, 10, 10, edges)
    store = pipeline.run(spark, spec, raster, topo)
    out = report.write_report(
        store, spec, dates[0], dates[-1] + datetime.timedelta(days=1),
        str(tmp_path / "report.md"),
    )
    md = open(out).read()
    assert "# snowav_spark report — run `rep_run`" in md
    assert "## swe_mm (in)" in md
    assert "| total |" in md  # synthetic total band labeled
    assert "1000–1500" in md  # band edge labels
    assert "basin_A | basin_B" in md.replace("| basin_A | basin_B |", "basin_A | basin_B")
