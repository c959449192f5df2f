"""Property-based tests (hypothesis) for operator semantics.

Each property generates one batch of data per example and runs a single
Spark job over it (per-row examples would pay Spark's job latency per
case).  Examples are capped — these guard invariants, not performance."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from snowav_spark.ops import banded, dedup, windows

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    edges=st.lists(
        st.floats(-1e6, 1e6, allow_nan=False), min_size=2, max_size=8, unique=True
    ).map(sorted),
    vals=st.lists(st.floats(-1e7, 1e7, allow_nan=False), min_size=1, max_size=200),
)
@SET
def test_digitize_always_matches_numpy(spark, edges, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], ["x"])
    got = [
        r.band
        for r in df.select(banded.digitize(F.col("x"), edges).alias("band"))
        .collect()
    ]
    want = list(np.clip(np.digitize(vals, edges) - 1, 0, len(edges) - 2))
    assert got == want


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40), min_size=1, max_size=30
    )
)
@SET
def test_jaccard_pairs_bounded_and_symmetric_input_order(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    pairs = dedup.jaccard_pairs(df, "doc_id", "text", n=2).collect()
    for r in pairs:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.doc_a < r.doc_b


@given(
    gaps=st.lists(st.integers(1, 120), min_size=1, max_size=50),
    gap_minutes=st.integers(5, 60),
)
@SET
def test_sessionize_counts_gaps(spark, gaps, gap_minutes):
    """Session count == 1 + number of inter-event gaps > timeout."""
    import datetime

    t = datetime.datetime(2024, 1, 1)
    rows, expected_sessions = [], 1
    for i, g in enumerate(gaps):
        if i > 0:
            t = t + datetime.timedelta(minutes=g)
            if g > gap_minutes:
                expected_sessions += 1
        rows.append((1, t, i))
    df = spark.createDataFrame(rows, ["user_id", "ts", "event_id"])
    out = windows.sessionize(
        df, "user_id", "ts", gap_minutes=gap_minutes, tiebreak="event_id"
    )
    got = out.agg(F.max("session_id")).collect()[0][0]
    assert got == expected_sessions


@given(
    vals=st.lists(
        st.floats(0, 1e6, allow_nan=False), min_size=2, max_size=100
    )
)
@SET
def test_rollup_total_equals_sum_of_bands(spark, vals):
    df = spark.createDataFrame(
        [("z", float(v)) for v in vals], ["zone", "v"]
    ).withColumn("band", banded.digitize_uniform(F.col("v"), 1e5, 10))
    out = banded.zonal_stats(
        df, "zone", "band", {"s": F.round(F.sum("v"), 4)}, rollup=True
    ).collect()
    per_band = sum(r.s for r in out if r.band is not None and r.zone is not None)
    total = [r.s for r in out if r.zone is not None and r.band is None][0]
    assert total == pytest.approx(per_band, abs=1e-3)


@given(
    pairs=st.lists(
        st.tuples(
            st.integers(1, 5_000_000_000), st.integers(1, 5_000_000_000)
        ),
        min_size=1,
        max_size=12,
    )
)
@SET
def test_endpoint_assortativity_matches_python_bigints(spark, pairs):
    """The decimal(38,0) moment kernel must equal exact Python bigint
    arithmetic for ANY degree magnitude — including ~5e9 degrees whose
    squared moments wrap int64 many times over (the overflow class
    VERDICT r7 item 2 closed)."""
    import math

    from snowav_spark.ops import graph

    sym = pairs + [(y, x) for x, y in pairs]
    ep = spark.createDataFrame(sym, "x long, y long")
    row = graph.endpoint_assortativity(ep).collect()[0]
    m = len(sym)
    sx = sum(x for x, _ in sym)
    sy = sum(y for _, y in sym)
    sxy = sum(x * y for x, y in sym)
    sxx = sum(x * x for x, _ in sym)
    syy = sum(y * y for _, y in sym)
    vx = m * sxx - sx * sx
    vy = m * syy - sy * sy
    if vx == 0 or vy == 0:
        want = 0.0
    else:
        want = round(
            float(m * sxy - sx * sy)
            / math.sqrt(float(vx))
            / math.sqrt(float(vy)),
            6,
        )
    assert row.n_endpoints == m
    assert row.assortativity == want


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 40), st.integers(0, 40)),
        min_size=1,
        max_size=60,
    )
)
@SET
def test_connected_components_matches_union_find(spark, edges):
    """Distributed hash-min label propagation must agree with a
    sequential union-find on any random graph (self-loops included)."""
    from snowav_spark.ops import graph

    parent = list(range(41))

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    nodes = set()
    for a, b in edges:
        nodes |= {a, b}
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {n: find(n) for n in nodes}

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], ["id_a", "id_b"]
    )
    got = {
        r.node: r.label for r in graph.connected_components(df).collect()
    }
    assert got == want


@given(
    lens=st.lists(st.integers(0, 700), min_size=1, max_size=120),
    capacity=st.integers(64, 512),
)
@SET
def test_packing_invariants(spark, lens, capacity):
    """Every doc placed exactly once; no bin exceeds capacity unless it
    holds a single oversized doc; offsets are disjoint."""
    from snowav_spark.ops import packing

    df = spark.createDataFrame(
        [(i, ln) for i, ln in enumerate(lens)], ["doc_id", "n_tokens"]
    )
    pdf = packing.pack_sequences(
        df, "doc_id", "n_tokens", capacity, n_shards=3
    ).toPandas()
    assert sorted(pdf["doc_id"]) == list(range(len(lens)))
    for (_, _), grp in pdf.groupby(["shard", "bin"]):
        total = grp["n_tokens"].sum()
        # a bin may exceed capacity only via a single oversized doc
        # (zero-length docs may share it — they consume no tokens)
        assert total <= capacity or (
            (grp["n_tokens"] > capacity).sum() == 1
            and total == grp["n_tokens"].max()
        )
        grp = grp.sort_values("offset")
        end = (grp["offset"] + grp["n_tokens"]).to_numpy()
        assert (grp["offset"].to_numpy()[1:] >= end[:-1]).all()


@given(
    n_tokens=st.lists(st.integers(min_value=0, max_value=130), min_size=1, max_size=12),
    size=st.integers(min_value=2, max_value=60),
)
@SET
def test_chunk_docs_covers_every_token_in_order(spark, n_tokens, size):
    """Every token appears in some chunk; concatenating each doc's chunk
    starts reconstructs the original order; chunk count matches the
    ceil((n-size)/stride)+1 formula."""
    from snowav_spark.ops import text as text_ops

    stride = max(size // 2, 1)
    docs = [
        (i, " ".join(f"t{i}_{j}" for j in range(n)) if n else "")
        for i, n in enumerate(n_tokens)
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = text_ops.chunk_docs(df, "doc_id", "text", size=size, stride=stride)
    rows = sorted(
        ((r.doc_id, r.chunk_id, r.chunk_text, r.n_tokens) for r in out.collect())
    )
    by_doc: dict[int, list] = {}
    for doc_id, chunk_id, chunk_text, nt in rows:
        by_doc.setdefault(doc_id, []).append((chunk_id, chunk_text, nt))
    for i, n in enumerate(n_tokens):
        toks = docs[i][1].split(" ")  # note: "" splits to [''] — 1 token
        n_eff = len(toks)
        expected_chunks = max(-(-(max(n_eff - size, 0)) // stride) + 1, 1)
        chunks = by_doc[i]
        assert len(chunks) == expected_chunks
        covered = []
        for k, (chunk_id, chunk_text, nt) in enumerate(sorted(chunks)):
            assert chunk_id == k
            got = chunk_text.split(" ")
            assert got == toks[k * stride : k * stride + size]
            assert nt == len(got)
            covered.extend(got)
        assert set(covered) == set(toks)


@given(
    vals=st.lists(
        st.floats(min_value=-1e9, max_value=1e9, allow_nan=False),
        min_size=1,
        max_size=40,
    )
)
@SET
def test_msum_matches_exact_fixed_point(spark, vals):
    """msum equals the Python-exact micro-unit sum for any magnitudes and
    partition counts (order independence is the whole point)."""
    import math

    from snowav_spark.contract import msum

    df = spark.createDataFrame([(v,) for v in vals], ["x"]).repartition(7)
    got = df.agg(msum(F.col("x")).alias("s")).collect()[0].s
    exact = sum(math.floor(v * 1_000_000) for v in vals)
    assert got == float(exact) / 1_000_000.0


@given(
    anchors=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20_000_000)),  # (user, ms)
        min_size=1,
        max_size=25,
    ),
    lookups=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 20_000_000)),
        min_size=0,
        max_size=40,
    ),
    window=st.sampled_from([60, 3600, 7200]),
)
@SET
def test_lookback_count_matches_bruteforce(spark, anchors, lookups, window):
    """The band join must agree with the O(n·m) definition: count lookups
    with the same key in [t−window, t) — for every window size, any
    bucket alignment, and SUB-SECOND timestamps (millisecond precision —
    a second-truncating implementation miscounts boundary rows; found in
    review)."""
    import datetime as dt

    from snowav_spark.ops import joins

    base = dt.datetime(2024, 1, 1)
    a_df = spark.createDataFrame(
        [
            (i, u, base + dt.timedelta(milliseconds=ms))
            for i, (u, ms) in enumerate(anchors)
        ],
        "event_id long, user_id long, ts timestamp_ntz",
    )
    l_df = spark.createDataFrame(
        [(u, base + dt.timedelta(milliseconds=ms)) for u, ms in lookups],
        "user_id long, ts timestamp_ntz",
    ) if lookups else spark.createDataFrame([], "user_id long, ts timestamp_ntz")
    got = {
        r.event_id: r.n_in_window
        for r in joins.lookback_count(
            a_df, l_df, ["user_id"], "ts", "ts", window, ["event_id"]
        ).collect()
    }
    w_ms = window * 1000
    want = {
        i: sum(
            1
            for (lu, lms) in lookups
            if lu == u and ms - w_ms <= lms < ms
        )
        for i, (u, ms) in enumerate(anchors)
    }
    assert got == want


@given(
    activity=st.lists(
        st.tuples(st.integers(0, 6), st.integers(1, 20)),  # (user, day)
        min_size=1,
        max_size=60,
    ),
    days=st.integers(1, 9),
)
@SET
def test_rolling_active_matches_bruteforce(spark, activity, days):
    import datetime

    rows = [
        (u, datetime.datetime(2024, 1, d, 12)) for u, d in activity
    ]
    df = spark.createDataFrame(rows, ["user_id", "ts"])
    got = {
        r["day"].day: r["active_users"]
        for r in windows.rolling_active(df, "ts", "user_id", days=days).collect()
    }
    obs = sorted({d for _, d in activity})
    want = {
        d: len({u for u, ud in activity if d - days < ud <= d}) for d in obs
    }
    assert got == want


@given(
    vals=st.lists(st.integers(0, 50), min_size=1, max_size=120),
    q=st.integers(2, 10),
)
@SET
def test_global_decile_matches_sorted_reference(spark, vals, q):
    """tile assignment must equal the brute-force definition: sort the
    values, cut at ceil(k·N/q) positions, boundary ties to the lower
    tile (strict < against the cut values)."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)], ["i", "v"])
    from snowav_spark.ops import sampling

    got = {
        r.i: r.tile
        for r in sampling.global_decile_assign(df, "v", q=q).collect()
    }
    s = sorted(vals)
    n = len(s)
    cuts = [s[-(-k * n // q) - 1] for k in range(1, q)]  # ceil(k n / q)-th
    want = {i: 1 + sum(1 for c in cuts if c < v) for i, v in enumerate(vals)}
    assert got == want


@given(
    activity=st.lists(
        st.tuples(st.integers(0, 6), st.integers(1, 20)),  # (user, day)
        min_size=1,
        max_size=60,
    )
)
@SET
def test_growth_churn_match_bruteforce_and_identity(spark, activity, tmp_path):
    """q_growth_accounting and q_churn must match the set-based
    brute-force definitions on arbitrary activity patterns, and the
    growth identity DAU_t − DAU_{t−1} = new + resurrected − churned
    must hold exactly on every interior day."""
    import datetime

    from snowav_spark import io as sio
    from snowav_spark.contract import QUERIES

    rows = [(u, datetime.datetime(2024, 1, d, 12)) for u, d in activity]
    spark.createDataFrame(rows, ["user_id", "ts"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    sio.clear_cache()  # same path, new files: drop the cached frame

    days = {}
    for u, d in activity:
        days.setdefault(u, set()).add(d)
    max_day = max(d for _, d in activity)
    obs = sorted({d for _, d in activity})
    want_growth = {
        t: (
            sum(1 for s in days.values() if min(s) == t),
            sum(1 for s in days.values() if t in s and t - 1 in s),
            sum(
                1
                for s in days.values()
                if t in s and t - 1 not in s and min(s) < t
            ),
        )
        for t in obs
    }
    want_churn = {
        t: n
        for t in range(2, max_day + 1)
        if (
            n := sum(
                1 for s in days.values() if t - 1 in s and t not in s
            )
        )
    }
    got_growth = {
        r.day.day: (r.n_new, r.n_retained, r.n_resurrected)
        for r in QUERIES["q_growth_accounting"](
            spark, str(tmp_path)
        ).collect()
    }
    got_churn = {
        r.day.day: r.n_churned
        for r in QUERIES["q_churn"](spark, str(tmp_path)).collect()
    }
    assert got_growth == want_growth
    assert got_churn == want_churn
    dau = {t: sum(1 for s in days.values() if t in s) for t in obs}
    for t in range(min(obs) + 1, max_day + 1):
        nn, _, ns = got_growth.get(t, (0, 0, 0))
        assert dau.get(t, 0) - dau.get(t - 1, 0) == nn + ns - got_churn.get(
            t, 0
        )


@given(
    activity=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 2879)),  # (user, minute)
        min_size=1,
        max_size=50,
    )
)
@SET
def test_peak_concurrency_matches_bruteforce(spark, activity, tmp_path):
    """The sweep-line must equal the brute-force definition on arbitrary
    2-day event patterns: sessionize (30-min gap), clip each session to
    the days it touches, and per day the peak is the max number of
    clipped intervals covering any single instant (inclusive endpoints —
    touching intervals overlap)."""
    import datetime
    from collections import defaultdict

    from snowav_spark import io as sio
    from snowav_spark.contract import QUERIES

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (u, t0 + datetime.timedelta(minutes=m), i)
        for i, (u, m) in enumerate(activity)
    ]
    spark.createDataFrame(rows, ["user_id", "ts", "event_id"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    sio.clear_cache()

    by_user = defaultdict(list)
    for u, ts, _ in rows:
        by_user[u].append(ts)
    gap = datetime.timedelta(minutes=30)
    sess = []
    for ts_list in by_user.values():
        ts_list.sort()
        cur = [ts_list[0], ts_list[0]]
        for t in ts_list[1:]:
            if t - cur[1] > gap:
                sess.append(tuple(cur))
                cur = [t, t]
            else:
                cur[1] = t
        sess.append(tuple(cur))
    per_day = defaultdict(list)
    for s, e in sess:
        d = s.date()
        while d <= e.date():
            ds = datetime.datetime.combine(d, datetime.time.min)
            de = ds + datetime.timedelta(days=1, microseconds=-1)
            per_day[d].append((max(s, ds), min(e, de)))
            d += datetime.timedelta(days=1)
    want = {
        d.day: (
            len(iv),
            max(
                sum(1 for cs, ce in iv if cs <= t <= ce)
                for t, _ in iv
            ),
        )
        for d, iv in per_day.items()
    }
    got = {
        r.day.day: (r.n_sessions, r.peak_concurrency)
        for r in QUERIES["q_peak_concurrency"](
            spark, str(tmp_path)
        ).collect()
    }
    assert got == want


@given(
    orders=st.lists(
        st.tuples(
            st.integers(0, 9),  # customer
            st.integers(1, 10_000),  # order total in cents
        ),
        min_size=1,
        max_size=60,
    )
)
@SET
def test_top_share_matches_numpy_quantile(spark, orders, tmp_path):
    """q_top_share must equal the numpy reference: per-customer totals,
    linear-interpolated p99 (numpy 'linear' == Spark percentile ==
    DuckDB quantile_cont), r6-rounded cut, inclusive >= membership."""
    from collections import defaultdict

    from snowav_spark import io as sio
    from snowav_spark.contract import QUERIES

    rows = [(c, cents / 100.0) for c, cents in orders]
    spark.createDataFrame(rows, ["o_custkey", "o_totalprice"]).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    custs = sorted({c for c, _ in orders})
    spark.createDataFrame(
        [(c, "s" + str(c % 2)) for c in custs],
        ["c_custkey", "c_mktsegment"],
    ).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    sio.clear_cache()

    tot = defaultdict(int)
    for c, cents in orders:
        # micro-units of cents/100: floor((cents/100)*1e6) — cents are
        # exact in double so this is cents·10_000 exactly
        tot[c] += cents * 10_000
    by_seg = defaultdict(list)
    for c, t in tot.items():
        by_seg["s" + str(c % 2)].append(t)
    want = {}
    for seg, ts in by_seg.items():
        cut = round(float(np.quantile(ts, 0.99, method="linear")), 6)
        top = [t for t in ts if t >= cut]
        want[seg] = (len(top), round(sum(top) / sum(ts), 6))
    got = {
        r.segment: (r.n_top, r.share)
        for r in QUERIES["q_top_share"](spark, str(tmp_path)).collect()
    }
    assert got == want


def test_crc32c_known_vectors():
    """The hand-rolled CRC-32C against the published check value
    (crc32c("123456789") = 0xE3069283) and basic identities — a wrong
    polynomial/reflection would pass round-trip tests (writer and
    reader share the bug) but fail interop with real stores."""
    from snowav_spark.sources.zarr import _crc32c

    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"") == 0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA  # published vector


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    shape=st.tuples(
        st.integers(1, 9), st.integers(1, 9)
    ),
    inner=st.tuples(st.integers(1, 3), st.integers(1, 3)),
    mult=st.tuples(st.integers(1, 3), st.integers(1, 3)),
    loc=st.sampled_from(["start", "end"]),
    crc=st.booleans(),
    sparse=st.booleans(),
)
def test_sharded_roundtrip_any_geometry(
    tmp_path_factory, shape, inner, mult, loc, crc, sparse
):
    """Property: ANY (array shape × inner chunk × shard multiple ×
    index location × checksum × sparsity) combination round-trips
    exactly — edge shards trim, missing inner chunks read as fill."""
    from snowav_spark.sources import zarr

    rng = np.random.RandomState(
        hash((shape, inner, mult, loc, crc, sparse)) & 0xFFFF
    )
    arr = rng.rand(*shape)
    if sparse:
        arr[arr < 0.5] = -9.0
    shard = tuple(i * m for i, m in zip(inner, mult))
    p = str(tmp_path_factory.mktemp("shprop") / "arr")
    zarr.write_array_v3_sharded(
        p, arr, shard, inner,
        fill_value=-9.0 if sparse else None,
        skip_fill_chunks=sparse,
        index_location=loc, index_crc32c=crc,
    )
    np.testing.assert_array_equal(zarr.read_array(p), arr)


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(drop_mask=st.integers(0, 255), double=st.booleans())
def test_idempotent_append_converges_from_any_crash_shape(
    spark, tmp_path_factory, drop_mask, double
):
    """Property: after an append attempt loses ANY subset of its
    committed files (simulating a crash at an arbitrary point of the
    move phase), one retry restores the dataset to exactly the
    single-shot result — and a gratuitous extra retry (``double``)
    changes nothing."""
    import os

    from pyspark.sql import functions as F

    from snowav_spark import sinks

    root = str(tmp_path_factory.mktemp("idem") / "ds")
    base = spark.range(8).select(
        F.col("id"), (F.col("id") % 3).alias("part")
    )
    base.write.partitionBy("part").parquet(root)
    batch = spark.range(100, 124).select(
        F.col("id"), (F.col("id") % 3).alias("part")
    )
    digest = sinks.content_digest(batch, "id", "part")
    sinks.idempotent_append(
        batch, root, digest, partition_by=("part",)
    )
    # crash simulation: drop an arbitrary subset of the batch's files
    victims = []
    for dirpath, dirnames, files in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(("_", "."))]
        for f in sorted(files):
            if f.startswith(f"append-{digest}-"):
                victims.append(os.path.join(dirpath, f))
    for i, v in enumerate(victims):
        if drop_mask & (1 << (i % 8)):
            os.remove(v)
    # retry (and optionally retry once more)
    for _ in range(2 if double else 1):
        sinks.idempotent_append(
            batch, root, digest, partition_by=("part",)
        )
    got = sorted(r.id for r in spark.read.parquet(root).collect())
    assert got == sorted(
        list(range(8)) + list(range(100, 124))
    )


# ---------------------------------------------------------------------------
# Codec properties (round 10): pure-Python LZ4 / Blosc round-trips hold
# for arbitrary byte strings, not just the fixture shapes.  No Spark —
# these run plain Python, so examples are cheap and plentiful.


@given(data=st.binary(max_size=20_000))
@settings(max_examples=200, deadline=None)
def test_lz4_roundtrip_property(data):
    from snowav_spark.sources.lz4 import lz4_compress, lz4_decompress

    assert lz4_decompress(lz4_compress(data), len(data)) == data


@given(
    data=st.binary(max_size=20_000),
    typesize=st.sampled_from([1, 2, 4, 8, 16, 32]),
    codec=st.sampled_from(["lz4", "zlib"]),
    shuffle=st.booleans(),
)
@settings(max_examples=100, deadline=None)
def test_blosc_roundtrip_property(data, typesize, codec, shuffle):
    from snowav_spark.sources.blosc import blosc_compress, blosc_decompress

    chunk = blosc_compress(
        data, typesize=typesize, codec=codec, shuffle=shuffle
    )
    assert blosc_decompress(chunk) == data


@given(
    # repetitive inputs force real matches (including overlaps) through
    # the decoder, not just literal runs
    word=st.binary(min_size=1, max_size=9),
    reps=st.integers(1, 4000),
    tail=st.binary(max_size=20),
)
@settings(max_examples=100, deadline=None)
def test_lz4_roundtrip_repetitive_property(word, reps, tail):
    from snowav_spark.sources.lz4 import lz4_compress, lz4_decompress

    data = word * reps + tail
    comp = lz4_compress(data)
    assert lz4_decompress(comp, len(data)) == data
    if len(data) > 1000 and len(set(word)) <= 2:
        assert len(comp) < len(data)  # matches actually engage


@given(junk=st.binary(min_size=1, max_size=300), size=st.integers(0, 400))
@settings(max_examples=150, deadline=None)
def test_lz4_arbitrary_bytes_never_silently_misdecodes(junk, size):
    """Fuzz the decoder with non-LZ4 bytes: it must either raise
    LZ4BlockError or return EXACTLY size bytes — never crash with a
    foreign exception, never return a wrong-length buffer."""
    from snowav_spark.sources.lz4 import LZ4BlockError, lz4_decompress

    try:
        out = lz4_decompress(junk, size)
    except LZ4BlockError:
        return
    assert len(out) == size
