"""Golden end-to-end: the flagship pipeline (CLI run → ResultsStore →
markdown report) against a COMMITTED golden parquet + report.

This is the reference's own test strategy (SURVEY §5.1: gold files for
the full `snowav -f config.ini` run): any semantic drift in the raster
source, topo join, banding, rollup, unit conversion, store layout, or
report formatting fails here even if every unit test still passes.

The input grid is synthesized deterministically by THIS test (values are
exact multiples of 0.25, so every sum is an exact double and round(,6)
is a no-op — the golden cannot rot from float noise), not read from
/root/testdata, because the driver regenerates those fixtures between
rounds while a golden must outlive them.
"""

from __future__ import annotations

import datetime
import os

import pandas as pd
import pytest

GOLD_DIR = os.path.join(os.path.dirname(__file__), "golden")
GOLD_STORE = os.path.join(GOLD_DIR, "flagship_store.parquet")
GOLD_REPORT = os.path.join(GOLD_DIR, "flagship_report.md")
GOLD_TEX = os.path.join(GOLD_DIR, "flagship_report.tex")
GOLD_SVG = os.path.join(GOLD_DIR, "flagship_swe_volume.svg")

N_DAYS = 15
NY, NX = 40, 50
VARS = ("swe_mm", "depth_m")


def make_grids(root) -> str:
    d = root / "golden_grids"
    d.mkdir()
    for day_idx in range(N_DAYS):
        day = (datetime.date(2024, 2, 1) + datetime.timedelta(days=day_idx)).isoformat()
        for vi, var in enumerate(VARS):
            rows = []
            for y in range(NY):
                rows.append(
                    ",".join(
                        str(10.0 + ((y * 7 + x * 3 + day_idx * 5 + vi * 11) % 40) * 0.25)
                        for x in range(NX)
                    )
                )
            (d / f"{var}_{day}.csv").write_text("\n".join(rows) + "\n")
    return str(d)


def run_flagship(spark, tmp_path) -> tuple[pd.DataFrame, str, str, dict]:
    """ONE CLI run yields store + .md (figures linked) + .tex + .svg —
    the reference's full report chain from a single config."""
    from snowav_spark import cli

    grid_dir = make_grids(tmp_path)
    ini = tmp_path / "run.ini"
    store = tmp_path / "store"
    report_md = tmp_path / "report.md"
    report_tex = tmp_path / "report.tex"
    figs = tmp_path / "figs"
    ini.write_text(
        "[snowav]\n"
        "run_id = golden_run\n"
        "edges = 0, 10, 20, 30\n"
        "basins = basin_A, basin_B\n"
        f"grid_dir = {grid_dir}\n"
        f"store_path = {store}\n"
        f"report_md = {report_md}\n"
        f"report_tex = {report_tex}\n"
        f"report_figs_dir = {figs}\n"
    )
    rc = cli.main(["-f", str(ini)])
    assert rc == 0
    got = (
        spark.read.parquet(str(store))
        .toPandas()
        .sort_values(["date", "basin_id", "variable", "band"])
        .reset_index(drop=True)
    )
    # normalize partition-discovery column order/types for the compare
    got = got[["run_id", "date", "basin_id", "variable", "band", "value"]]
    got["date"] = pd.to_datetime(got["date"]).dt.date.astype(str)
    got["run_id"] = got["run_id"].astype(str)
    got["band"] = got["band"].astype("int64")
    svgs = {
        n: (figs / n).read_text() for n in sorted(os.listdir(figs))
    }
    return got, report_md.read_text(), report_tex.read_text(), svgs


@pytest.fixture(scope="module")
def flagship(spark, tmp_path_factory):
    return run_flagship(spark, tmp_path_factory.mktemp("golden_e2e"))


def test_store_matches_golden_parquet(flagship):
    got = flagship[0]
    assert os.path.exists(GOLD_STORE), (
        "golden missing — regenerate with tools/make_golden.py"
    )
    want = pd.read_parquet(GOLD_STORE)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want), (len(got), len(want))
    pd.testing.assert_frame_equal(got, want, check_exact=True)


def test_report_matches_golden_md(flagship):
    md = flagship[1]
    want = open(GOLD_REPORT).read()
    assert md == want


def test_report_matches_golden_tex(flagship):
    """The .tex tables are the reference's actual artifact
    (ref:snowav/report/report.py) — pin them bit-for-bit like the md."""
    tex = flagship[2]
    want = open(GOLD_TEX).read()
    assert tex == want


def test_figures_match_golden_svg(flagship):
    svgs = flagship[3]
    assert set(svgs) == {
        "swe_volume_swe_mm.svg",
        "swe_volume_depth_m.svg",
        "basin_total_swe_mm.svg",
        "basin_total_depth_m.svg",
    }
    for body in svgs.values():
        assert body.lstrip().startswith("<svg")
    want = open(GOLD_SVG).read()
    assert svgs["swe_volume_swe_mm.svg"] == want
