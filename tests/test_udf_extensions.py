"""The §2.8 UDF extension surface: pandas_udf cold-content masking and
applyInPandas per-basin summaries."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from snowav_spark import ingest
from snowav_spark.ops import udf


def test_available_swe_pandas_udf(spark):
    df = spark.createDataFrame(
        [(100.0, 0.0), (200.0, -10.0), (50.0, -5.0), (80.0, -4.9)],
        ["swe_mm", "coldcont"],
    )
    got = [r.av for r in df.select(udf.available_swe("swe_mm", "coldcont").alias("av")).collect()]
    # threshold -5.0: >= keeps, < zeroes
    assert got == [100.0, 0.0, 50.0, 80.0]


def test_band_legend_udtf_lateral(spark):
    """UDTF surface: direct call expands an edge array into legend
    rows; registered + LATERAL, each run drives its own expansion
    (variable-length, NULL edges emit nothing)."""
    import pytest

    if not udf.HAS_UDTF:
        pytest.skip("Spark runtime lacks Python UDTFs")
    direct = udf.BandLegendUDTF(
        F.array(F.lit(0.0), F.lit(5.0), F.lit(10.0))
    ).collect()
    assert [tuple(r) for r in direct] == [(0, 0.0, 5.0), (1, 5.0, 10.0)]

    spark.udtf.register("band_legend", udf.BandLegendUDTF)
    spark.createDataFrame(
        [("r1", [1000.0, 2000.0, 3000.0]), ("r2", [500.0, 900.0]), ("r3", None)],
        "run_id string, edges array<double>",
    ).createOrReplaceTempView("runs_udtf")
    got = sorted(
        tuple(r)
        for r in spark.sql(
            "SELECT r.run_id, b.band, b.lo, b.hi "
            "FROM runs_udtf r, LATERAL band_legend(r.edges) b"
        ).collect()
    )
    assert got == [
        ("r1", 0, 1000.0, 2000.0),
        ("r1", 1, 2000.0, 3000.0),
        ("r2", 0, 500.0, 900.0),
    ]


def test_basin_percentile_summary_matches_numpy(spark):
    import numpy as np

    dates = [datetime.date(2024, 1, 1)]
    raster = ingest.synthetic_raster(spark, 6, 6, dates, ["swe_mm"])
    topo = ingest.synthetic_topo(spark, 6, 6, [0.0, 50.0, 100.0])
    joined = raster.join(topo, ["y", "x"]).select("basin_id", "date", "value")
    out = {r.basin_id: r for r in udf.basin_percentile_summary(joined).collect()}
    # independent check for basin_A (x < 60% of 6 → x in 0..2... int(6*0.6)=3 → x<3)
    pdf = joined.filter(F.col("basin_id") == "basin_A").toPandas()
    v = pdf["value"].to_numpy()
    assert out["basin_A"].n_px == len(v)
    assert out["basin_A"].p50 == float(np.quantile(v, 0.5))
    assert set(out) == {"basin_A", "basin_B"}


def test_audio_features_recover_sine_frequency(spark):
    """Real DSP, real assertion: synthesize int16 PCM sines at known
    frequencies and verify the FFT path recovers them — dominant bin
    within resolution, RMS at amplitude/sqrt(2), centroid at the tone."""
    import numpy as np

    from snowav_spark.ops import multimodal

    sr = 16_000
    t = np.arange(sr // 2) / sr  # 0.5 s → 2 Hz bin resolution

    def pcm(freq, amp):
        return (
            (amp * 32767 * np.sin(2 * np.pi * freq * t))
            .astype("<i2")
            .tobytes()
        )

    df = spark.createDataFrame(
        [
            (1, "audio", "pcm", None, None, 500, bytearray(pcm(440.0, 0.8))),
            (2, "audio", "pcm", None, None, 500, bytearray(pcm(3000.0, 0.5))),
            (3, "audio", "pcm", None, None, 0, bytearray(b"")),
            (4, "audio", "pcm", None, None, None, None),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    out = {
        r.media_id: r
        for r in multimodal.audio_features(df, sample_rate=sr).collect()
    }
    assert out[1].n_samples == sr // 2
    assert abs(out[1].dominant_hz - 440.0) <= 2.0
    assert abs(out[1].rms - 0.8 / np.sqrt(2)) < 0.01
    # a pure tone's centroid sits on the tone (leakage gives slight bias)
    assert abs(out[1].spectral_centroid_hz - 440.0) < 30.0
    assert abs(out[2].dominant_hz - 3000.0) <= 2.0
    for empty in (3, 4):
        assert out[empty].n_samples == 0
        assert out[empty].dominant_hz is None
        assert out[empty].spectral_centroid_hz is None


def test_audio_features_real_wav_container(spark):
    """VERDICT r4 item 7: a REAL WAV container (stdlib wave writer)
    flows through audio_features — the header is sniffed, the file's
    OWN frame rate (8 kHz here, not the 16 kHz param) drives the
    frequency axis, and stereo downmixes to mono.  Also covers
    decode_media('wav')."""
    import io
    import wave

    import numpy as np

    from snowav_spark.ops import multimodal

    def make_wav(freq, rate, seconds, channels=1):
        t = np.arange(int(rate * seconds)) / rate
        x = (0.6 * 32767 * np.sin(2 * np.pi * freq * t)).astype("<i2")
        if channels == 2:
            x = np.column_stack([x, x]).ravel()
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(x.tobytes())
        return buf.getvalue()

    mono = make_wav(440.0, 8_000, 0.5)
    stereo = make_wav(1000.0, 8_000, 0.5, channels=2)
    df = spark.createDataFrame(
        [
            (1, "audio", "wav", None, None, 500, bytearray(mono)),
            (2, "audio", "wav", None, None, 500, bytearray(stereo)),
        ],
        multimodal.MEDIA_SCHEMA,
    )
    # sample_rate param deliberately WRONG (16 kHz): the container's own
    # 8 kHz header must win, so 440 Hz comes back as 440, not 880.
    out = {
        r.media_id: r
        for r in multimodal.audio_features(df, sample_rate=16_000).collect()
    }
    assert out[1].n_samples == 4_000
    assert abs(out[1].dominant_hz - 440.0) <= 2.0
    assert out[2].n_samples == 4_000  # stereo downmixed: frames, not ints
    assert abs(out[2].dominant_hz - 1000.0) <= 2.0

    # decode_media parity: wav branch returns the raw int16 samples
    arr = multimodal.decode_media(mono, "wav")
    assert arr.dtype == np.dtype("<i2") and arr.shape == (4_000,)
    st = multimodal.decode_media(stereo, "wav")
    assert st.shape == (4_000, 2)


def test_perceptual_hash_fake_and_dup_pairs(spark):
    """Fake-path pHash: identical payloads hash identically (Hamming 0
    pair found by the banded join), unrelated payloads stay far apart;
    hashes are non-negative 63-bit longs."""
    from snowav_spark.ops import dedup, multimodal

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown fox"),  # same text -> same fake payload
            (3, "completely different content here"),
        ],
        ["doc_id", "text"],
    )
    media = multimodal.attach_fake_media(docs, "doc_id", "text")
    hashes = multimodal.perceptual_hash(media, fake=True)
    got = {r.media_id: r.phash for r in hashes.collect()}
    assert set(got) == {1, 2, 3}
    assert all(h >= 0 for h in got.values())
    assert got[1] == got[2]
    assert got[1] != got[3]

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in multimodal.media_dup_pairs(hashes, max_hamming=3).collect()
    }
    assert pairs.get((1, 2)) == 0
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_perceptual_hash_real_wav_amplitude_invariance(spark):
    """Real decode path on WAV PCM: volume scaling leaves the
    amplitude-profile hash UNCHANGED (mean threshold is scale
    invariant); a different envelope shape lands far away; stereo
    downmixes to the mono hash."""
    import io
    import wave

    import numpy as np

    from snowav_spark.ops import dedup, multimodal
    from pyspark.sql import functions as F

    def make_wav(envelope, rate=8_000, channels=1):
        t = np.arange(int(rate * 0.25)) / rate
        x = (envelope(t) * 32767).astype("<i2")
        if channels == 2:
            x = np.column_stack([x, x]).ravel()
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(x.tobytes())
        return buf.getvalue()

    loud = make_wav(lambda t: 0.9 * np.sin(2 * np.pi * 3 * t))
    quiet = make_wav(lambda t: 0.05 * np.sin(2 * np.pi * 3 * t))
    ramp = make_wav(lambda t: 0.9 * (t / t.max()) * np.sin(2 * np.pi * 200 * t))
    stereo_loud = make_wav(lambda t: 0.9 * np.sin(2 * np.pi * 3 * t), channels=2)
    rows = [
        (1, "audio", "wav", None, None, 250, bytearray(loud)),
        (2, "audio", "wav", None, None, 250, bytearray(quiet)),
        (3, "audio", "wav", None, None, 250, bytearray(ramp)),
        (4, "audio", "wav", None, None, 250, bytearray(stereo_loud)),
    ]
    df = spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)
    got = {
        r.media_id: r.phash
        for r in multimodal.perceptual_hash(df).collect()
    }
    assert got[1] == got[2]  # amplitude-scale invariant
    assert got[1] == got[4]  # stereo == mono after downmix
    # different envelope: far in Hamming space
    ham = spark.range(1).select(
        dedup.hamming64(F.lit(got[1]), F.lit(got[3])).alias("d")
    ).collect()[0].d
    assert ham > 8
