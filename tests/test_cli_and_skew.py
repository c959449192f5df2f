"""CLI (EP1 surface) and skew-handling helpers."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from snowav_spark.ops import skew


@pytest.fixture(scope="module")
def grid_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_grids")
    for day in ("2024-03-01", "2024-03-02"):
        for var in ("swe_mm", "swi_mm"):
            rows = [",".join(str(10.0 + y + x) for x in range(4)) for y in range(3)]
            (d / f"{var}_{day}.csv").write_text("\n".join(rows) + "\n")
    return d


def test_cli_end_to_end(spark, grid_dir, tmp_path):
    """Drive cli.main exactly as `python -m snowav_spark -f run.ini` would
    (same process so the test session is reused)."""
    from snowav_spark import cli

    ini = tmp_path / "run.ini"
    report = tmp_path / "report.csv"
    store = tmp_path / "store"
    ini.write_text(
        "[snowav]\n"
        "run_id = cli_run\n"
        "edges = 0, 10, 20, 30\n"
        "basins = basin_A, basin_B\n"
        f"grid_dir = {grid_dir}\n"
        f"store_path = {store}\n"
        "report_variable = swe_mm\n"
        f"report_csv = {report}\n"
    )
    rc = cli.main(["-f", str(ini)])
    assert rc == 0
    frame = pd.read_csv(report)
    assert list(frame.columns) == ["band", "basin_A", "basin_B"]
    assert len(frame) > 0


def test_sqlite_export_roundtrip(spark, tmp_path):
    """export_sqlite → plain sqlite3 SQL → read_sqlite: values, dates,
    NULLs, and append mode survive; fact-sized frames are refused."""
    import datetime
    import sqlite3

    from snowav_spark import sinks

    df = spark.createDataFrame(
        [
            ("r1", datetime.date(2024, 3, 1), "basin_A", 0, 12.5),
            ("r1", datetime.date(2024, 3, 2), "basin_B", 1, None),
        ],
        ["run_id", "date", "basin_id", "band", "value"],
    )
    db = str(tmp_path / "results.db")
    assert sinks.export_sqlite(df, db, "results") == 2
    con = sqlite3.connect(db)
    rows = con.execute(
        "SELECT run_id, date, basin_id, band, value FROM results ORDER BY date"
    ).fetchall()
    con.close()
    assert rows == [
        ("r1", "2024-03-01", "basin_A", 0, 12.5),
        ("r1", "2024-03-02", "basin_B", 1, None),
    ]
    # append doubles, replace resets
    assert sinks.export_sqlite(df, db, "results", mode="append") == 2
    back = sinks.read_sqlite(
        spark, db, "SELECT count(*) AS n FROM results"
    ).collect()
    assert back[0].n == 4
    sinks.export_sqlite(df, db, "results", mode="replace")
    assert (
        sinks.read_sqlite(spark, db, "SELECT count(*) AS n FROM results")
        .collect()[0]
        .n
        == 2
    )
    with pytest.raises(ValueError, match="max_rows"):
        sinks.export_sqlite(df, db, "results", max_rows=1)
    # empty result sets come back as an empty frame, not a crash
    empty = sinks.read_sqlite(
        spark, db, "SELECT * FROM results WHERE band = 999"
    )
    assert empty.count() == 0 and empty.columns[0] == "run_id"


def test_cli_netcdf_run_dir(spark, tmp_path):
    """`nc_dir` in the INI drives the whole pipeline from REAL NetCDF
    model output (one classic file + one NetCDF-4 file) through the
    snowav_netcdf DataSource — the reference's run_dirs workflow
    (ref:snowav/framework/outputs.py) with zero native deps."""
    import numpy as np

    from snowav_spark import cli
    from snowav_spark.sources import hdf5, netcdf3

    ncdir = tmp_path / "run_dir"
    ncdir.mkdir()
    for f, writer in ((0, netcdf3.write), (1, hdf5.write)):
        grid = np.full((1, 3, 4), 12.0 + f)
        writer(
            str(ncdir / f"snow_{f}.nc"),
            dims={"time": 1, "y": 3, "x": 4},
            variables={
                "time": (["time"], np.array([f], dtype=np.float64),
                         {"units": "days since 2024-03-01"}),
                "swe_mm": (["time", "y", "x"], grid, {}),
            },
        )
    ini = tmp_path / "nc_run.ini"
    report = tmp_path / "nc_report.csv"
    ini.write_text(
        "[snowav]\n"
        "run_id = nc_run\n"
        "edges = 0, 10, 20, 30\n"
        "basins = basin_A, basin_B\n"
        f"nc_dir = {ncdir}\n"
        "nc_variables = swe_mm\n"
        f"store_path = {tmp_path / 'nc_store'}\n"
        "report_variable = swe_mm\n"
        f"report_csv = {report}\n"
        f"results_db = {tmp_path / 'results.db'}\n"
    )
    rc = cli.main(["-f", str(ini)])
    assert rc == 0
    # summary-database artifact written alongside the parquet store
    import sqlite3

    con = sqlite3.connect(str(tmp_path / "results.db"))
    (n_db,) = con.execute("SELECT count(*) FROM results").fetchone()
    con.close()
    assert n_db > 0
    frame = pd.read_csv(report).set_index("band")
    assert list(frame.columns) == ["basin_A", "basin_B"]
    # the -1 'total' rollup row equals the sum of the elevation bands,
    # and totals carry both files' grids (uniform 12 + 13 over 2 dates)
    for basin in ("basin_A", "basin_B"):
        bands = frame.loc[frame.index >= 0, basin]
        assert frame.loc[-1, basin] == pytest.approx(bands.sum())
        assert frame.loc[-1, basin] > 0

    # reference-style `run_dirs =` pointing at the SAME NetCDF directory
    # must sniff and route to the snowav_netcdf source, not CSV parsing
    ini2 = tmp_path / "nc_run2.ini"
    report2 = tmp_path / "nc_report2.csv"
    ini2.write_text(
        "[snowav]\n"
        "run_name = nc_run2\n"
        "edges = 0, 10, 20, 30\n"
        "plotorder = basin_A, basin_B\n"
        f"run_dirs = {ncdir}\n"
        "nc_variables = swe_mm\n"
        f"store_path = {tmp_path / 'nc_store2'}\n"
        "report_variable = swe_mm\n"
        f"report_csv = {report2}\n"
    )
    assert cli.main(["-f", str(ini2)]) == 0
    frame2 = pd.read_csv(report2).set_index("band")
    assert frame2.loc[-1, "basin_A"] == pytest.approx(frame.loc[-1, "basin_A"])


def test_cli_zarr_run_dir(spark, tmp_path):
    """`zarr_dir` in the INI drives the whole EP1 pipeline from a Zarr
    v2 group (chunked (t, y, x) variables + a CF time member) — and the
    run is numerically IDENTICAL to the same grids fed through the
    NetCDF path, proving the container-agnostic tall schema."""
    import numpy as np

    from snowav_spark import cli
    from snowav_spark.sources import netcdf3
    from snowav_spark.sources import zarr as zmod

    grids = np.stack(
        [np.full((3, 4), 12.0), np.full((3, 4), 13.0)]
    )  # (t, y, x)
    zdir = tmp_path / "zarr_run"
    zmod.write_group(
        str(zdir),
        {"swe_mm": grids},
        chunks=(1, 2, 3),  # exercises edge chunks in every dim
    )
    # time member with CF units (written separately: 1-D + attrs)
    zmod.write_array(
        str(zdir / "time"),
        np.array([0.0, 1.0]),
        (2,),
        attrs={"units": "days since 2024-03-01"},
    )
    ini = tmp_path / "z_run.ini"
    report = tmp_path / "z_report.csv"
    ini.write_text(
        "[snowav]\n"
        "run_id = z_run\n"
        "edges = 0, 10, 20, 30\n"
        "basins = basin_A, basin_B\n"
        f"zarr_dir = {zdir}\n"
        f"store_path = {tmp_path / 'z_store'}\n"
        "report_variable = swe_mm\n"
        f"report_csv = {report}\n"
    )
    assert cli.main(["-f", str(ini)]) == 0
    zframe = pd.read_csv(report).set_index("band")

    # identical grids through the NetCDF path -> identical report
    ncdir = tmp_path / "nc_twin"
    ncdir.mkdir()
    netcdf3.write(
        str(ncdir / "snow.nc"),
        dims={"time": 2, "y": 3, "x": 4},
        variables={
            "time": (["time"], np.array([0.0, 1.0]),
                     {"units": "days since 2024-03-01"}),
            "swe_mm": (["time", "y", "x"], grids, {}),
        },
    )
    ini2 = tmp_path / "nc_twin.ini"
    report2 = tmp_path / "nc_twin_report.csv"
    ini2.write_text(
        "[snowav]\n"
        "run_id = nc_twin\n"
        "edges = 0, 10, 20, 30\n"
        "basins = basin_A, basin_B\n"
        f"nc_dir = {ncdir}\n"
        "nc_variables = swe_mm\n"
        f"store_path = {tmp_path / 'nc_twin_store'}\n"
        "report_variable = swe_mm\n"
        f"report_csv = {report2}\n"
    )
    assert cli.main(["-f", str(ini2)]) == 0
    nframe = pd.read_csv(report2).set_index("band")
    pd.testing.assert_frame_equal(zframe, nframe)


def test_cli_sql_adhoc(spark, sf_dir, tmp_path, capsys):
    """`sql` subcommand: fixture tables register as views, results print
    as JSON lines or land as CSV, and --explain prints a plan without
    executing."""
    import json as _json
    import os

    from snowav_spark import cli

    rc = cli.main(
        [
            "sql", "--tables", sf_dir, "-e",
            "SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n "
            "FROM lineitem GROUP BY 1 ORDER BY 1",
        ]
    )
    assert rc == 0
    lines = [
        _json.loads(ln)
        for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ]
    got = {d["l_returnflag"]: d["n"] for d in lines}
    want = {
        r.l_returnflag: r.n
        for r in spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count("*").cast("bigint").alias("n"))
        .collect()
    }
    assert got == want

    out = str(tmp_path / "sqlout")
    rc = cli.main(
        [
            "sql", "--tables", sf_dir, "--output", out, "--format", "csv",
            "-e", "SELECT r_regionkey, r_name FROM region",
        ]
    )
    assert rc == 0
    frame = pd.concat(
        pd.read_csv(os.path.join(out, f))
        for f in os.listdir(out)
        if f.endswith(".csv")
    )
    assert len(frame) == 5

    rc = cli.main(
        ["sql", "--tables", sf_dir, "--explain", "-e",
         "SELECT count(*) FROM orders"]
    )
    assert rc == 0
    assert "AdaptiveSparkPlan" in capsys.readouterr().out


def test_cli_convert_formats(spark, sf_dir, tmp_path, capsys):
    """`convert` lands zarr and arrow inputs as parquet (values exact),
    jsonl quarantines corrupt lines, and --zorder produces the
    clustered layout."""
    import json as _json
    import os

    import numpy as np
    import pyarrow as pa

    from snowav_spark import cli
    from snowav_spark.sources import zarr as zmod

    # zarr -> parquet
    z = str(tmp_path / "zin")
    arr = np.arange(12, dtype="<f8").reshape(3, 4)
    zmod.write_array(z, arr, (2, 2))
    zp = str(tmp_path / "zout")
    assert cli.main(
        ["convert", "--from", "zarr", "--input", z, "--output", zp]
    ) == 0
    got = {
        (r.y, r.x): r.value for r in spark.read.parquet(zp).collect()
    }
    assert len(got) == 12 and got[(2, 3)] == 11.0

    # arrow -> parquet with --zorder
    a = str(tmp_path / "ain")
    os.makedirs(a)
    t = pa.table(
        {"k": pa.array(range(100), pa.int64()),
         "v": pa.array(range(100), pa.int64())}
    )
    with pa.ipc.new_file(os.path.join(a, "t.arrow"), t.schema) as w:
        w.write_table(t)
    azp = str(tmp_path / "aout")
    assert cli.main(
        ["convert", "--from", "arrow", "--input", a, "--output", azp,
         "--zorder", "k,v", "--n-files", "4"]
    ) == 0
    assert spark.read.parquet(azp).count() == 100

    # jsonl -> parquet + quarantine
    j = str(tmp_path / "jin")
    os.makedirs(j)
    with open(os.path.join(j, "d.jsonl"), "w") as f:
        f.write('{"doc_id": 1, "text": "good line"}\n')
        f.write("this is not json\n")
    jp = str(tmp_path / "jout")
    assert cli.main(
        ["convert", "--from", "jsonl", "--input", j, "--output", jp]
    ) == 0
    assert spark.read.parquet(jp).filter("doc_id = 1").count() == 1
    quarantined = spark.read.json(jp + ".quarantine")
    assert quarantined.count() == 1


def test_cli_missing_config():
    from snowav_spark import cli

    with pytest.raises(FileNotFoundError):
        cli.parse_spec("/nonexistent/run.ini")


def test_salted_agg_matches_plain(spark, sf_dir):
    from snowav_spark.io import load_table

    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r.event_type): (r.s, r.n)
        for r in ev.groupBy("event_type")
        .agg(F.round(F.sum("value"), 6).alias("s"), F.count("*").alias("n"))
        .collect()
    }
    salted = {
        (r.event_type): (r.s, r.n)
        for r in skew.salted_agg(
            ev,
            ["event_type"],
            aggs={"ps": F.sum("value"), "pn": F.count("*")},
            finals={"s": F.round(F.sum("ps"), 6), "n": F.sum("pn")},
            salt_n=16,
            salt_src="event_id",
        ).collect()
    }
    assert plain == salted


def test_salted_join_matches_plain(spark, sf_dir):
    from snowav_spark.io import load_table

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    plain = (
        li.join(orders, "o_orderkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    salted = (
        skew.salted_join(li, orders, "o_orderkey", salt_n=4, salt_src="l_partkey")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_cli_curate_end_to_end(spark, sf_dir, tmp_path):
    """Drive `python -m snowav_spark curate` over the documents fixture
    and verify the three persisted outputs."""
    from snowav_spark import cli

    out = str(tmp_path / "curated")
    rc = cli.main(
        [
            "curate",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", out,
            "--jaccard", "0.1",
            "--capacity", "256",
            "--shards", "4",
            "--stats",
        ]
    )
    assert rc == 0
    corpus = spark.read.parquet(f"{out}/corpus")
    packed = spark.read.parquet(f"{out}/packed")
    survivors = spark.read.parquet(f"{out}/survivors")
    n_corpus = corpus.count()
    assert 0 < n_corpus <= 500
    # every curated doc packed exactly once; packed is shard-partitioned
    assert packed.count() == n_corpus
    assert packed.select("doc_id").distinct().count() == n_corpus
    assert "shard" in packed.columns
    # survivor map only references docs that had a near-dup pair
    assert survivors.count() >= 0
    losers = survivors.filter("doc_id != canonical_id").count()
    # dropped near-dups are exactly the loser set (after exact dedup)
    assert corpus.select("doc_id").join(
        survivors.filter("doc_id != canonical_id"), "doc_id"
    ).count() == 0 and losers >= 0


def test_cli_curate_stats_observed(spark, sf_dir, tmp_path, capsys):
    """--stats rides the corpus write via observe(): the printed stage
    counts are real (raw = fixture size, monotone non-increasing through
    the gates) without any extra count() scans."""
    import json as _json

    from snowav_spark import cli

    out = str(tmp_path / "curated_stats")
    rc = cli.main(
        [
            "curate", "--input", f"{sf_dir}/documents.parquet",
            "--output", out, "--jaccard", "0.1", "--shards", "2",
            "--stats",
        ]
    )
    assert rc == 0
    line = [
        ln for ln in capsys.readouterr().out.splitlines()
        if ln.startswith("{")
    ][-1]
    stages = _json.loads(line)["stages"]
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert stages["raw"] == n_docs
    assert stages["cleaned"] <= stages["raw"]
    assert stages["near_deduped"] <= stages["exact_deduped"]
    assert stages["near_deduped"] == spark.read.parquet(
        f"{out}/corpus"
    ).count()


def test_cli_curate_jsonl_corpus(spark, sf_dir, tmp_path):
    from snowav_spark import cli

    out = str(tmp_path / "curated_jsonl")
    rc = cli.main(
        [
            "curate",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", out,
            "--corpus-format", "jsonl",
            "--shards", "2",
        ]
    )
    assert rc == 0
    corpus = spark.read.json(f"{out}/corpus")
    assert corpus.count() > 0 and "doc_id" in corpus.columns


def test_cli_explain(spark, sf_dir, capsys):
    """`explain` prints the physical plan for a contract key; unknown
    keys exit 2 with the known-key list on stderr."""
    from snowav_spark import cli

    rc = cli.main(["explain", "q_join_dim", "--sf-dir", sf_dir])
    assert rc == 0
    out = capsys.readouterr().out
    assert "=== q_join_dim ===" in out
    assert "Physical Plan" in out
    assert "BroadcastHashJoin" in out

    rc = cli.main(["explain", "q_nope", "--sf-dir", sf_dir])
    assert rc == 2
    err = capsys.readouterr().err
    assert "unknown key" in err and "q_join_dim" in err


def test_cli_compact(spark, sf_dir, tmp_path):
    """`compact` subcommand rewrites a fragmented dataset in place."""
    import json as _json
    import os

    from snowav_spark import cli
    from snowav_spark.io import load_table

    path = str(tmp_path / "frag")
    load_table(spark, sf_dir, "region").repartition(8).write.parquet(path)
    n_before = sum(
        1 for f in os.listdir(path) if f.endswith(".parquet")
    )
    assert n_before > 1  # fragmented (empty partitions may skip files)
    rc = cli.main(["compact", "--path", path, "--target-rows", "1000000"])
    assert rc == 0
    n_after = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert n_after == 1
    assert spark.read.parquet(path).count() == load_table(
        spark, sf_dir, "region"
    ).count()


def test_cli_query_only_mode(spark, tmp_path):
    """EP3 (SURVEY §3): a [query] INI section reads the existing store
    without reprocessing — the reference's database.collect() path with
    all four methods."""
    import datetime

    from snowav_spark import cli
    from snowav_spark.sinks import ResultsStore

    store_path = str(tmp_path / "store")
    rows = []
    for i, d in enumerate(
        (datetime.date(2024, 1, 1), datetime.date(2024, 1, 2))
    ):
        for b in ("basin_A", "basin_B"):
            for band, v in ((-1, 30.0 + i), (0, 10.0 + i), (1, 20.0)):
                rows.append(("r1", d, b, "swe_mm", band, v))
    df = spark.createDataFrame(
        rows, ["run_id", "date", "basin_id", "variable", "band", "value"]
    )
    ResultsStore(spark, store_path).write(df)

    def run(method):
        out = tmp_path / f"q_{method}.csv"
        ini = tmp_path / f"q_{method}.ini"
        ini.write_text(
            "[query]\n"
            f"store_path = {store_path}\n"
            "run_id = r1\n"
            "variable = swe_mm\n"
            "basins = basin_A, basin_B\n"
            "start_date = 2024-01-01\n"
            "end_date = 2024-01-03\n"
            f"method = {method}\n"
            f"output_csv = {out}\n"
        )
        assert cli.main(["-f", str(ini)]) == 0
        return pd.read_csv(out)

    end = run("end").set_index("band")
    assert end.loc[-1, "basin_A"] == 31.0  # latest date's value
    total = run("sum").set_index("band")
    assert total.loc[0, "basin_B"] == 21.0  # 10 + 11
    diff = run("difference").set_index("band")
    assert diff.loc[-1, "basin_A"] == 1.0 and diff.loc[1, "basin_A"] == 0.0
    daily = run("daily")
    assert list(daily.columns) == ["day", "basin_A", "basin_B"]
    assert len(daily) == 2 and daily["basin_A"].tolist() == [30.0, 31.0]


def test_cli_reference_ini_aliases(spark, grid_dir, tmp_path):
    """A reference-style CoreConfig.ini (run_name / plotorder / run_dirs)
    ports with zero key renames."""
    from snowav_spark import cli

    ini = tmp_path / "ref_style.ini"
    report = tmp_path / "r.csv"
    ini.write_text(
        "[snowav]\n"
        "run_name = ref_run\n"
        "edges = 0, 10, 20, 30\n"
        "plotorder = basin_A, basin_B\n"
        f"run_dirs = {grid_dir}\n"
        f"store_path = {tmp_path / 'store'}\n"
        "report_variable = swe_mm\n"
        f"report_csv = {report}\n"
    )
    assert cli.main(["-f", str(ini)]) == 0
    frame = pd.read_csv(report)
    assert list(frame.columns) == ["band", "basin_A", "basin_B"]


def test_write_jdbc_shape_and_gating(spark):
    """No JDBC driver ships in this container, so the e2e write is
    import-gated; the call SHAPE (mode validation, connection-bounding
    repartition) is always tested."""
    import pytest

    from snowav_spark import sinks

    df = spark.range(10).withColumnRenamed("id", "run_id")
    with pytest.raises(ValueError, match="overwrite|append"):
        sinks.write_jdbc(df, "jdbc:mysql://h/db", "t", mode="replace")
    # driver absent: Spark raises a classloader/driver error, never a
    # silent no-op — prove the call reaches the JDBC writer
    with pytest.raises(Exception, match="(?i)driver|No suitable|ClassNotFound"):
        sinks.write_jdbc(
            df, "jdbc:mysql://localhost:1/db", "t",
            properties={"driver": "com.mysql.cj.jdbc.Driver"},
        )


def test_cli_index_build_search_compact(spark, sf_dir, tmp_path, capsys):
    """The `index` subcommand drives both persisted retrieval layouts
    end-to-end: build → search (pruned) → compact, shell-only."""
    from snowav_spark import cli

    tix = str(tmp_path / "tix")
    rc = cli.main(
        [
            "index", "build-text", "--index", tix,
            "--source", f"{sf_dir}/documents.parquet",
            "--id-col", "doc_id", "--n-buckets", "8",
        ]
    )
    assert rc == 0
    rc = cli.main(
        ["index", "search-text", "--index", tix, "--terms",
         "join,vector,scan", "--k", "3"]
    )
    assert rc == 0
    lines = [
        ln for ln in capsys.readouterr().out.splitlines() if ln.startswith("{")
    ]
    import json as _json

    hits = [_json.loads(ln) for ln in lines if "bm25" in ln]
    assert len(hits) == 3 and all("doc_id" in h for h in hits)

    ann = str(tmp_path / "ann")
    rc = cli.main(
        [
            "index", "build-ann", "--index", ann,
            "--source", f"{sf_dir}/embeddings.parquet",
            "--n-cells", "4", "--k-codes", "4",
        ]
    )
    assert rc == 0
    rc = cli.main(
        [
            "index", "search-ann", "--index", ann,
            "--source", f"{sf_dir}/embeddings.parquet",
            "--query-id", "0", "--k", "3", "--rerank",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    top = _json.loads(
        [ln for ln in out.splitlines() if ln.startswith("{")][-3]
    )
    assert top["vec_id"] == 0 and top["cos_sim"] == 1.0

    # delete: tombstone an id, search excludes it, compact folds it away
    rc = cli.main(["index", "delete-ann", "--index", ann, "--ids", "0"])
    assert rc == 0
    rc = cli.main(
        [
            "index", "search-ann", "--index", ann,
            "--source", f"{sf_dir}/embeddings.parquet",
            "--query-id", "0", "--k", "3", "--rerank",
        ]
    )
    assert rc == 0
    out = capsys.readouterr().out
    hits = [
        _json.loads(ln) for ln in out.splitlines()
        if ln.startswith("{") and "cos_sim" in ln
    ]
    assert hits and all(h["vec_id"] != 0 for h in hits)

    assert cli.main(["index", "compact-text", "--index", tix]) == 0
    assert cli.main(["index", "compact-ann", "--index", ann]) == 0
    import os

    assert not os.path.isdir(ann + "/_tombstones")


def test_cli_index_filtered_search(spark, sf_dir, tmp_path, capsys):
    """--metadata at build + --where at search: both index families
    serve the filtered production query from the shell."""
    import json as _json

    from snowav_spark import cli

    ann = str(tmp_path / "fann")
    assert cli.main(
        [
            "index", "build-ann", "--index", ann,
            "--source", f"{sf_dir}/embeddings.parquet",
            "--n-cells", "4", "--k-codes", "4", "--metadata", "label",
        ]
    ) == 0
    assert cli.main(
        [
            "index", "search-ann", "--index", ann,
            "--source", f"{sf_dir}/embeddings.parquet",
            "--query-id", "0", "--k", "5", "--rerank",
            "--where", "label = 2",
        ]
    ) == 0
    out = capsys.readouterr().out
    hits = [
        _json.loads(ln) for ln in out.splitlines()
        if ln.startswith("{") and "cos_sim" in ln
    ]
    labels = {
        r.vec_id: r.label
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect()
    }
    assert hits and all(labels[h["vec_id"]] == 2 for h in hits)

    tix = str(tmp_path / "ftix")
    assert cli.main(
        [
            "index", "build-text", "--index", tix,
            "--source", f"{sf_dir}/documents.parquet",
            "--id-col", "doc_id", "--n-buckets", "8",
            "--metadata", "lang,source",
        ]
    ) == 0
    assert cli.main(
        ["index", "search-text", "--index", tix, "--terms", "join,scan",
         "--k", "5", "--where", "lang = 'en'"]
    ) == 0
    out = capsys.readouterr().out
    hits = [
        _json.loads(ln) for ln in out.splitlines()
        if ln.startswith("{") and "bm25" in ln
    ]
    langs = {
        r.doc_id: r.lang
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    }
    assert hits and all(langs[h["doc_id"]] == "en" for h in hits)


def test_cli_curate_arrow_input(spark, sf_dir, tmp_path):
    """--input-format arrow: a Feather-delivered corpus curates
    identically to the same rows via parquet."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from snowav_spark import cli

    table = pq.read_table(f"{sf_dir}/documents.parquet")
    adir = str(tmp_path / "arrow_in")
    os.makedirs(adir)
    with pa.ipc.new_file(os.path.join(adir, "docs.arrow"), table.schema) as w:
        w.write_table(table)

    out_a = str(tmp_path / "cur_a")
    out_p = str(tmp_path / "cur_p")
    common = ["--jaccard", "0.1", "--shards", "2"]
    assert cli.main(
        ["curate", "--input", adir, "--input-format", "arrow",
         "--output", out_a, *common]
    ) == 0
    assert cli.main(
        ["curate", "--input", f"{sf_dir}/documents.parquet",
         "--output", out_p, *common]
    ) == 0
    a = {r.doc_id for r in spark.read.parquet(f"{out_a}/corpus").collect()}
    p = {r.doc_id for r in spark.read.parquet(f"{out_p}/corpus").collect()}
    assert a == p and len(a) > 0


def test_cli_curate_builds_text_index(spark, sf_dir, tmp_path):
    """--text-index makes one curate run emit a retrieval-ready inverted
    index over the curated corpus: searches return only surviving docs
    and scores match the ad-hoc scorer on the corpus."""
    from snowav_spark import cli
    from snowav_spark.ops import text as t

    out = str(tmp_path / "curated")
    rc = cli.main(
        [
            "curate",
            "--input", f"{sf_dir}/documents.parquet",
            "--output", out,
            "--jaccard", "0.1",
            "--capacity", "256",
            "--shards", "4",
            "--text-index",
            "--index-buckets", "8",
        ]
    )
    assert rc == 0
    corpus = spark.read.parquet(f"{out}/corpus")
    got = {
        r.doc_id: r.bm25
        for r in t.search_text_index(
            spark, f"{out}/text_index", ["join", "vector"], k=1000
        ).collect()
    }
    adhoc = {
        r.doc_id: r.bm25
        for r in t.bm25_scores(
            corpus, "doc_id", "text", ["join", "vector"]
        ).collect()
    }
    assert got == adhoc and len(got) > 0
    corpus_ids = {r.doc_id for r in corpus.select("doc_id").collect()}
    assert set(got) <= corpus_ids


def test_index_cli_dedup_lifecycle(spark, tmp_path, capsys):
    """The dedup-index family from the shell — build over a corpus,
    ingest a new batch (exact twin + near twin rejected, fresh content
    admitted, survivors written, index grown), takedown-delete an id
    (its content re-enters), compact (tombstones folded, layout keeps
    its band partitioning so further ingests still read)."""
    import json as _json
    import os

    from snowav_spark import cli

    base = "the quick brown fox jumps over the lazy dog by the river"
    corpus = spark.createDataFrame(
        [(1, base), (2, "completely different content about ducks")],
        ["doc_id", "text"],
    )
    src0 = str(tmp_path / "corpus0")
    corpus.write.parquet(src0)
    idx = str(tmp_path / "dedup_idx")
    assert cli.main([
        "index", "build-dedup", "--index", idx, "--source", src0,
        "--id-col", "doc_id",
    ]) == 0
    assert any(n.startswith("band=") for n in os.listdir(idx))

    batch = spark.createDataFrame(
        [
            (10, base),                               # exact twin
            (11, base.replace("lazy", "sleepy")),     # near twin
            (12, "entirely novel words nothing shared here at all"),
        ],
        ["doc_id", "text"],
    )
    src1 = str(tmp_path / "batch1")
    batch.write.parquet(src1)
    out1 = str(tmp_path / "admitted1")
    assert cli.main([
        "index", "ingest-dedup", "--index", idx, "--source", src1,
        "--output", out1, "--id-col", "doc_id",
        "--est-threshold", "0.5",
    ]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["admitted"] == 1 and res["rejected"] == 2
    admitted = {r.doc_id for r in spark.read.parquet(out1).collect()}
    assert admitted == {12}

    # RETRY after unacknowledged success: re-running the same ingest
    # must converge — identical survivors at --output (not an empty
    # clobber) and no duplicate index rows
    out1b = str(tmp_path / "admitted1_retry")
    assert cli.main([
        "index", "ingest-dedup", "--index", idx, "--source", src1,
        "--output", out1b, "--id-col", "doc_id",
        "--est-threshold", "0.5",
    ]) == 0
    res = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert res["admitted"] == 1 and res["rejected"] == 2
    assert {r.doc_id for r in spark.read.parquet(out1b).collect()} == {12}
    assert spark.read.parquet(idx).filter("doc_id = 12").count() == 8  # one row per band, NO duplicates from the retry

    # takedown doc 1: its content may legitimately re-enter
    assert cli.main([
        "index", "delete-dedup", "--index", idx, "--ids", "1",
    ]) == 0
    src2 = str(tmp_path / "batch2")
    spark.createDataFrame([(20, base)], ["doc_id", "text"]).write.parquet(
        src2
    )
    out2 = str(tmp_path / "admitted2")
    assert cli.main([
        "index", "ingest-dedup", "--index", idx, "--source", src2,
        "--output", out2, "--id-col", "doc_id",
        "--est-threshold", "0.5",
    ]) == 0
    assert {r.doc_id for r in spark.read.parquet(out2).collect()} == {20}

    # compact folds tombstones away and KEEPS the band partitioning
    assert cli.main(["index", "compact-dedup", "--index", idx]) == 0
    assert not os.path.isdir(idx + "/_tombstones")
    assert any(n.startswith("band=") for n in os.listdir(idx))
    ids = {r.doc_id for r in spark.read.parquet(idx).select(
        "doc_id").distinct().collect()}
    assert 1 not in ids and {2, 12, 20} <= ids

    # post-compact ingest still reads/appends the same layout
    src3 = str(tmp_path / "batch3")
    spark.createDataFrame(
        [(30, "yet another brand new document body")],
        ["doc_id", "text"],
    ).write.parquet(src3)
    out3 = str(tmp_path / "admitted3")
    assert cli.main([
        "index", "ingest-dedup", "--index", idx, "--source", src3,
        "--output", out3, "--id-col", "doc_id",
    ]) == 0
    assert {r.doc_id for r in spark.read.parquet(out3).collect()} == {30}
