"""Round-11 ADVICE/VERDICT closures (regression tests).

Covers: the idempotent-append legacy-digest sweep (ADVICE r10 low), the
bench blessed-baseline SF gate (ADVICE r10 low), the recall-ppm integer
rounding (ADVICE r10 low), and the session runtime-conf debug logging
(VERDICT r10 item 6).
"""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# idempotent_append: legacy single-sum digest files are swept on retry


def test_idempotent_append_sweeps_legacy_digest_files(spark, tmp_path):
    """A batch committed under the pre-r11 digest format (bare sum hex)
    left ``append-<sum>-<seq>.parquet`` files; a retry under today's
    ``<sum>-<xor>-<n>`` digest must sweep them (same content, same sum
    field) or the batch is silently duplicated — while a new-format
    file of a DIFFERENT digest that merely shares the sum field must
    survive the sweep."""
    from snowav_spark import sinks

    root = str(tmp_path / "ds")
    base = spark.range(8).select(
        F.col("id"), (F.col("id") % 3).alias("part")
    )
    base.write.partitionBy("part").parquet(root)
    batch = spark.range(100, 124).select(
        F.col("id"), (F.col("id") % 3).alias("part")
    )
    digest = sinks.content_digest(batch, "id", "part")
    assert digest.count("-") == 2  # sum-xor-count format
    legacy = digest.split("-", 1)[0]

    # simulate the pre-r11 commit: same files, legacy names
    sinks.idempotent_append(batch, root, digest, partition_by=("part",))
    legacy_files, bystanders = [], []
    for dirpath, dirnames, files in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for i, f in enumerate(sorted(files)):
            if f.startswith(f"append-{digest}-"):
                old = os.path.join(dirpath, f"append-{legacy}-{i}.parquet")
                os.rename(os.path.join(dirpath, f), old)
                legacy_files.append(old)
                # a different new-format digest sharing the sum field:
                # must NOT be swept (only sum-collides, not same batch)
                other = os.path.join(
                    dirpath, f"append-{legacy}-deadbeef-7-{i}.parquet"
                )
                shutil.copy(old, other)
                bystanders.append(other)
    assert legacy_files, "setup produced no legacy-named files"

    # the retried append (new digest) must converge: legacy files gone,
    # exactly one copy of the batch present, bystanders untouched
    sinks.idempotent_append(batch, root, digest, partition_by=("part",))
    for old in legacy_files:
        assert not os.path.exists(old), f"legacy file survived: {old}"
    for other in bystanders:
        assert os.path.exists(other), f"bystander swept: {other}"
        os.remove(other)  # so the row-count check below is clean
    got = sorted(r.id for r in spark.read.parquet(root).collect())
    assert got == sorted(list(range(8)) + list(range(100, 124)))


# ---------------------------------------------------------------------------
# bench: blessed baseline applies only at its own scale factor


def test_blessed_baseline_skipped_on_sf_mismatch(tmp_path):
    import bench

    repo = str(tmp_path)
    with open(os.path.join(repo, "BASELINE_KEYS.json"), "w") as f:
        json.dump({"sf": 0.1, "keys": {"q_topk": 0.06}}, f)
    assert bench._blessed_baseline(repo, 0.1) == {"q_topk": 0.06}
    # an sf0.01 run must NOT be measured against sf0.1 medians
    assert bench._blessed_baseline(repo, 0.01) == {}
    # legacy blessed file without an sf field: keep the old behavior
    with open(os.path.join(repo, "BASELINE_KEYS.json"), "w") as f:
        json.dump({"keys": {"q_topk": 0.06}}, f)
    assert bench._blessed_baseline(repo, 0.01) == {"q_topk": 0.06}
    # and the BASELINE.md rows carry their own sf pin
    assert bench.BASELINE_MD_SF == 0.1


# ---------------------------------------------------------------------------
# scale_probe: ppm rounding happens once, in integer space


def test_recall_ppm_rounds_once():
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "tools",
        ),
    )
    from scale_probe import _ppm

    # the ADVICE r10 example: 0.9955 must be 995500, not 995499
    assert _ppm(1991, 2000) == 995500
    assert _ppm(0, 0) == 0
    assert _ppm(5, 5) == 1_000_000
    # truncation-prone fractions across the range
    for found, expected in [(1, 3), (2, 3), (999, 1000), (333, 10007)]:
        exact = found / expected * 1_000_000
        assert abs(_ppm(found, expected) - exact) <= 0.5


# ---------------------------------------------------------------------------
# session: runtime-conf failures are named in the debug log


def test_runtime_conf_failures_logged(caplog):
    from snowav_spark import session as sess

    class _Conf:
        def set(self, k, v):
            if k == "spark.sql.adaptive.enabled":
                raise RuntimeError("static conf on a live session")

    class _FakeSession:
        conf = _Conf()

    with caplog.at_level("DEBUG", logger="snowav_spark.session"):
        out = sess._apply_runtime_conf(_FakeSession())
    assert isinstance(out, _FakeSession)
    msgs = [r.getMessage() for r in caplog.records]
    assert any("spark.sql.adaptive.enabled" in m for m in msgs), msgs


def test_runtime_conf_all_applied_logs_nothing(caplog):
    from snowav_spark import session as sess

    class _Conf:
        def set(self, k, v):
            pass

    class _FakeSession:
        conf = _Conf()

    with caplog.at_level("DEBUG", logger="snowav_spark.session"):
        sess._apply_runtime_conf(_FakeSession())
    assert not [r for r in caplog.records if "not applied" in r.getMessage()]


# ---------------------------------------------------------------------------
# r11 oracle promotions: the generated DuckDB twins must share the Spark
# plan's exact hyperplane literals (a drifted seed or RNG would silently
# re-bucket one engine and fail the hash gate only at check time)


def test_ann_lsh_sql_embeds_spark_planes():
    """_ann_lsh_sql inlines the same 4x64 fixed-seed plane set the Spark
    key passes to ann_lsh_topk, at full repr precision (shortest repr
    round-trips each double exactly, so DuckDB parses the identical
    IEEE value)."""
    from snowav_spark import contract

    planes = contract._ann_lsh_planes()
    assert len(planes) == 4 and all(len(p) == 64 for p in planes)
    # regenerating must be bit-stable (fresh PRNG per call)
    again = contract._ann_lsh_planes()
    assert planes == again
    sql = contract._ann_lsh_sql()
    for hp in planes:
        assert repr(float(hp[0])) in sql
        assert repr(float(hp[-1])) in sql
    # bit weights 1,2,4,8 — one CASE per plane
    for w in (1, 2, 4, 8):
        assert f"THEN {w} ELSE 0 END" in sql
    assert contract.ORACLE["q_ann_lsh"] == sql


def test_embed_lsh_sql_embeds_spark_planes():
    """_embed_lsh_sql inlines random_hyperplanes(10, 3, 64, 42) — the
    identical fixed-seed float64 set dedup_pairs_lsh builds its bucket
    matmul from — and keys candidates on the same (table, bucket)
    equi-join."""
    from snowav_spark import contract
    from snowav_spark.ops import similarity

    hps = similarity.random_hyperplanes(10, 3, 64, 42)
    sql = contract._embed_lsh_sql(10, 3, 64, 42, 0.4)
    for t in (0, 9):
        for b in (0, 2):
            assert repr(float(hps[t][b][0])) in sql
            assert repr(float(hps[t][b][-1])) in sql
    for t in range(10):
        assert f"struct_pack(t := {t}," in sql
    assert "a.k.t = c.k.t AND a.k.bk = c.k.bk" in sql
    assert "cos_sim >= 0.4" in sql
    assert contract.ORACLE["q_dedup_embed_lsh"] == sql


# ---------------------------------------------------------------------------
# io.read_pruned_partitions: index-serving reads list O(probed) dirs


def test_read_pruned_partitions_matches_root_read(spark, tmp_path):
    """Explicit partition-dir read returns the same rows/schema as the
    root read + isin filter (including the partition column), skips
    values with no directory, and falls back cleanly when none exist."""
    from pyspark.sql import functions as F

    from snowav_spark.io import read_pruned_partitions

    root = str(tmp_path / "idx")
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 8).alias("bucket")
    )
    df.write.partitionBy("bucket").parquet(root)

    want = [3, 5]
    got = read_pruned_partitions(spark, root, "bucket", want + [99]).filter(
        F.col("bucket").isin(want)
    )
    ref = spark.read.parquet(root).filter(F.col("bucket").isin(want))
    assert sorted(got.columns) == sorted(ref.columns)
    assert sorted(r.id for r in got.collect()) == sorted(
        r.id for r in ref.collect()
    )
    # value with no directory on disk → skipped, not an error
    only_missing = read_pruned_partitions(
        spark, root, "bucket", [42, 99]
    ).filter(F.col("bucket").isin([42, 99]))
    assert only_missing.count() == 0


def test_read_pruned_partitions_streaming_layout(spark, tmp_path):
    """Two-level (bucket, _batch) streaming layouts keep BOTH partition
    columns through the explicit-path read (basePath recovers them)."""
    from pyspark.sql import functions as F

    from snowav_spark.io import read_pruned_partitions

    root = str(tmp_path / "sidx")
    df = spark.range(40).select(
        F.col("id"),
        (F.col("id") % 4).alias("bucket"),
        ((F.col("id") / 4).cast("int") % 2).alias("_batch"),
    )
    df.write.partitionBy("bucket", "_batch").parquet(root)
    got = read_pruned_partitions(spark, root, "bucket", [1])
    assert "_batch" in got.columns and "bucket" in got.columns
    rows = got.collect()
    assert {r.bucket for r in rows} == {1}
    assert {r._batch for r in rows} == {0, 1}
    assert len(rows) == 10


def test_blessed_baseline_skipped_on_cpus_mismatch(tmp_path):
    import bench

    repo = str(tmp_path)
    with open(os.path.join(repo, "BASELINE_KEYS.json"), "w") as f:
        json.dump({"sf": 0.1, "cpus": 32, "keys": {"q_topk": 0.06}}, f)
    # same sf, same cores: bars apply
    assert bench._blessed_baseline(repo, 0.1, 32) == {"q_topk": 0.06}
    # the driver's lower-core scaling run must NOT be measured against
    # 32-core medians (it would breach every parallel-heavy key)
    assert bench._blessed_baseline(repo, 0.1, 8) == {}
    # caller that doesn't know its core count: keep the old behavior
    assert bench._blessed_baseline(repo, 0.1) == {"q_topk": 0.06}
    # legacy blessed file without a cpus field: keep the old behavior
    with open(os.path.join(repo, "BASELINE_KEYS.json"), "w") as f:
        json.dump({"sf": 0.1, "keys": {"q_topk": 0.06}}, f)
    assert bench._blessed_baseline(repo, 0.1, 8) == {"q_topk": 0.06}


def test_blessed_baseline_by_cpus_sections(tmp_path):
    """r12 (VERDICT r11 item 7): a blessed file may carry per-core-count
    bar sections so the driver's lower-core scaling run gets its OWN
    drift bars instead of skipping the gate; files without the section
    keep the exact skip-on-mismatch behavior pinned above."""
    import bench

    repo = str(tmp_path)
    with open(os.path.join(repo, "BASELINE_KEYS.json"), "w") as f:
        json.dump(
            {
                "sf": 0.1,
                "cpus": 32,
                "keys": {"q_topk": 0.06},
                "by_cpus": {
                    "32": {"keys": {"q_topk": 0.06}},
                    "8": {"keys": {"q_topk": 0.11}},
                },
            },
            f,
        )
    # each core count resolves its own section
    assert bench._blessed_baseline(repo, 0.1, 32) == {"q_topk": 0.06}
    assert bench._blessed_baseline(repo, 0.1, 8) == {"q_topk": 0.11}
    # an un-blessed core count still skips (falls through to the
    # top-level cpus mismatch rule)
    assert bench._blessed_baseline(repo, 0.1, 4) == {}
    # sf mismatch still disables everything
    assert bench._blessed_baseline(repo, 0.01, 8) == {}
    # caller without a core count keeps the top-level (newest) bars
    assert bench._blessed_baseline(repo, 0.1) == {"q_topk": 0.06}
