"""Multimodal columns: image/audio/video as opaque ``binary`` columns with
typed metadata, plus Pandas-UDF plumbing for decode / feature-extract /
resize / frame-sample (SURVEY.md §2.6 EXT).

Compressed-format decode is STUBBED (image/audio codec libraries are not
in this container — see ``decode_media``; PIL is used when importable):
real deployments drop a PIL/ffmpeg call inside the same ``mapInPandas``
body.  Raw-PCM audio needs no codec, so ``audio_features`` is a REAL
numpy-FFT feature extractor, tested against synthesized sine waves.
Everything else — the schema contract, Arrow batch shape, partition
sizing, and the deterministic fake used by tests — is real and tested.

Scale notes: media bytes are large and must never be shuffled casually.
The pattern is: keep binary columns in their own table keyed by id,
repartition by id ONCE to size partitions for executor memory
(`maxRecordsPerBatch` keeps Arrow batches bounded), run decode/feature
UDFs as mapInPandas (no shuffle — narrow), and join only the *extracted
features* (small) to analytic tables.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Typed metadata accompanying every opaque media payload.
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("format", StringType(), True),  # png | wav | mp4 | ...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("payload", BinaryType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), False),
        StructField("byte_sum", LongType(), False),
        StructField("head_hash", StringType(), False),
    ]
)


def attach_fake_media(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Deterministic fake media payloads for tests/fixtures: payload bytes
    derive from the row's own content (md5 of the text), so every engine
    and every run agrees.  Shape-compatible with real ingested media."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit("image").alias("kind"),
        F.lit("fake").alias("format"),
        (F.length(text) % 64 + 1).cast("int").alias("width"),
        (F.length(text) % 48 + 1).cast("int").alias("height"),
        F.lit(None).cast("int").alias("duration_ms"),
        F.to_binary(F.md5(F.col(text)), F.lit("hex")).alias("payload"),
    )


def decode_media(payload: bytes, fmt: str):
    """Decode one media payload into a pixel array.

    Graduates automatically when a codec library is present: image
    formats decode through Pillow if importable.  Audio/video (and any
    environment without codecs, like this container) raise — the Spark
    plumbing around decode is exercised via the deterministic fake path
    (``extract_features(fake=True)``).
    """
    if fmt in ("png", "jpeg", "jpg", "bmp", "gif", "webp"):
        try:
            import io as _io

            from PIL import Image  # optional extra, absent here
        except ImportError as e:
            raise NotImplementedError(
                "image decode requires Pillow (pip install pillow); tests "
                "exercise the surrounding Spark plumbing via the "
                "deterministic fake path (extract_features(fake=True))."
            ) from e
        import numpy as np

        return np.asarray(Image.open(_io.BytesIO(payload)))
    if fmt == "wav":
        # stdlib decoder — no dependency gate needed.  Returns int16
        # samples, shape (n_frames,) mono / (n_frames, n_channels).
        samples, _rate = _decode_wav(payload)
        return samples
    raise NotImplementedError(
        f"no codec wired for format {fmt!r}; wire soundfile/av here."
    )


def _decode_wav(payload: bytes):
    """Decode a RIFF/WAVE container via the stdlib ``wave`` module into
    (int16 sample array, frame rate).  16-bit PCM only — the format the
    wave module itself writes; other sample widths raise (callers treat
    that as an undecodable payload)."""
    import io as _io
    import wave

    import numpy as np

    with wave.open(_io.BytesIO(bytes(payload))) as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"wav decode supports 16-bit PCM only, got sampwidth="
                f"{w.getsampwidth()}"
            )
        nch = w.getnchannels()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    arr = np.frombuffer(raw, dtype="<i2")
    if nch > 1:
        arr = arr[: (arr.size // nch) * nch].reshape(-1, nch)
    return arr, rate


def _is_wav(payload) -> bool:
    """RIFF/WAVE magic check — cheap per-row container sniff."""
    return (
        payload is not None
        and len(payload) >= 12
        and bytes(payload[:4]) == b"RIFF"
        and bytes(payload[8:12]) == b"WAVE"
    )


def extract_features(df: DataFrame, fake: bool = False) -> DataFrame:
    """Feature extraction over media payloads via ``mapInPandas``.

    Arrow-batched: each batch arrives as a pandas DataFrame, features are
    computed vectorized per batch, and only small feature rows leave the
    executor.  ``fake=True`` computes deterministic byte-level features
    (length, byte sum, head hash) instead of decoding — the Spark-side
    plumbing (schema, batching, narrow execution) is identical.
    """

    # Opaque functions defeat Spark's column pruning: mapInPandas ships
    # every input column to the Python worker AND forces the scan to
    # read it from storage (guide §4.1).  The extractor touches only
    # (media_id, payload[, format]) — project them explicitly so a real
    # media table's width/height/duration/kind columns never leave
    # parquet.
    cols = ["media_id", "payload"]
    if not fake and "format" in df.columns:
        cols.append("format")
    df = df.select(*cols)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        for pdf in batches:
            payloads = pdf["payload"]
            if fake:
                # Byte-level features straight off the payload.  np.uint8
                # view + C-side .sum() per row — no Python-int loop over
                # payload bytes (the old sum(p) walked every byte in the
                # interpreter).
                byte_sum = payloads.map(
                    lambda p: int(np.frombuffer(p, dtype=np.uint8).sum())
                    if p is not None
                    else 0
                )
            else:
                # Real path: decode via the per-row format (PIL when
                # importable — raises NotImplementedError otherwise) and
                # featurize the decoded pixel array.
                fmts = (
                    pdf["format"]
                    if "format" in pdf.columns
                    else pd.Series(["unknown"] * len(pdf))
                )
                byte_sum = [
                    int(np.asarray(decode_media(p, f), dtype=np.int64).sum())
                    if p is not None
                    else 0
                    for p, f in zip(payloads, fmts)
                ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(
                        lambda p: len(p) if p is not None else 0
                    ).astype("int64"),
                    "byte_sum": pd.Series(byte_sum).astype("int64"),
                    # Engine-portable definition (the q_tfidf promotion
                    # pattern): md5 over the lowercase-HEX TEXT of the
                    # first 8 payload bytes, not the raw bytes — DuckDB's
                    # md5() only accepts VARCHAR, so hashing the hex
                    # string is what lets q_multimodal_decode carry a
                    # full SQL oracle while keeping the same fingerprint
                    # strength (the hex text is a bijection of the head).
                    "head_hash": payloads.map(
                        lambda p: hashlib.md5(
                            (bytes(p[:8]).hex() if p else "").encode()
                        ).hexdigest()
                    ),
                }
            )

    return df.mapInPandas(run, FEATURE_SCHEMA)


def resize_stub(df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize plumbing: passes payloads through ``mapInPandas`` with the
    target dims recorded in metadata; the pixel transform is the stubbed
    decode step.  Returns MEDIA_SCHEMA rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out["width"] = width
            out["height"] = height
            yield out

    return df.mapInPandas(run, MEDIA_SCHEMA)


def frame_sample_stub(df: DataFrame, every_ms: int) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits one row per
    sampled frame offset from the metadata duration — demonstrates the
    1→N mapInPandas expansion shape without a real demuxer."""
    out_schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("frame_ms", IntegerType(), False),
            StructField("payload", BinaryType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            # Vectorized 1→N expansion: per-row frame counts, then a
            # single np.repeat / concatenated-arange — no iterrows.
            dur = pdf["duration_ms"].fillna(0).astype("int64").to_numpy()
            counts = np.maximum((dur + every_ms - 1) // every_ms, 0)
            idx = np.repeat(np.arange(len(pdf)), counts)
            # frame offsets: for each row, 0, every_ms, 2·every_ms, …
            starts = np.repeat(np.cumsum(counts) - counts, counts)
            frame_ms = (np.arange(counts.sum()) - starts) * every_ms
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy()[idx],
                    "frame_ms": frame_ms.astype("int32"),
                    "payload": pdf["payload"].to_numpy()[idx],
                }
            )

    return df.mapInPandas(run, out_schema)


AUDIO_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_samples", LongType(), False),
        StructField("rms", DoubleType(), False),
        StructField("dominant_hz", DoubleType(), True),
        StructField("spectral_centroid_hz", DoubleType(), True),
    ]
)


def audio_features(df: DataFrame, sample_rate: int = 16_000) -> DataFrame:
    """REAL audio feature extraction — no codec libraries needed.
    Payloads carrying a RIFF/WAVE header are decoded as real WAV
    containers (stdlib ``wave``: the file's OWN frame rate is used and
    multi-channel audio is downmixed to mono by averaging); anything
    else is interpreted as headerless int16 little-endian mono PCM at
    ``sample_rate`` (the raw fallback).  Features via numpy's FFT
    inside ``mapInPandas``:

    - ``rms``: root-mean-square level of the normalized signal,
    - ``dominant_hz``: the peak magnitude bin of the real FFT,
    - ``spectral_centroid_hz``: magnitude-weighted mean frequency (the
      "brightness" feature of audio classification pipelines).

    Same scale rules as every media op: narrow (no shuffle), Arrow
    batches bounded by maxRecordsPerBatch, bytes never leave the
    executor — only the five-column feature rows do.  Empty/NULL
    payloads yield n_samples=0 with NULL spectral features.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        # single-entry memo (last (length, rate) only): same-shape runs
        # reuse the bin array, variable-length audio stays O(1) memory —
        # an unbounded dict would retain one float64 array per distinct
        # length for the task's lifetime.
        last_key, last_freqs = None, None
        rows: dict[str, list] = {
            "media_id": [],
            "n_samples": [],
            "rms": [],
            "dominant_hz": [],
            "spectral_centroid_hz": [],
        }
        for pdf in batches:
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                rows["media_id"].append(int(mid))
                if payload is None or len(payload) < 2:
                    rows["n_samples"].append(0)
                    rows["rms"].append(0.0)
                    rows["dominant_hz"].append(None)
                    rows["spectral_centroid_hz"].append(None)
                    continue
                if _is_wav(payload):
                    try:
                        samples, rate = _decode_wav(payload)
                    except Exception:
                        # undecodable container → null-feature row, not
                        # a failed batch
                        rows["n_samples"].append(0)
                        rows["rms"].append(0.0)
                        rows["dominant_hz"].append(None)
                        rows["spectral_centroid_hz"].append(None)
                        continue
                    x = samples.astype(np.float64) / 32768.0
                    if x.ndim > 1:  # downmix stereo+ to mono
                        x = x.mean(axis=1)
                else:
                    # raw fallback: truncate a trailing odd byte rather
                    # than fail the batch
                    buf = payload[: len(payload) - (len(payload) % 2)]
                    x = (
                        np.frombuffer(buf, dtype="<i2").astype(np.float64)
                        / 32768.0
                    )
                    rate = sample_rate
                n = x.size
                rows["n_samples"].append(int(n))
                if n == 0:  # e.g. a WAV container with an empty data chunk
                    rows["rms"].append(0.0)
                    rows["dominant_hz"].append(None)
                    rows["spectral_centroid_hz"].append(None)
                    continue
                rows["rms"].append(float(np.sqrt(np.mean(x * x))))
                mag = np.abs(np.fft.rfft(x))
                mag[0] = 0.0  # ignore DC for peak/centroid
                if (n, rate) != last_key:
                    last_key = (n, rate)
                    last_freqs = np.fft.rfftfreq(n, d=1.0 / rate)
                freqs = last_freqs
                total = mag.sum()
                if total <= 0.0:
                    rows["dominant_hz"].append(None)
                    rows["spectral_centroid_hz"].append(None)
                else:
                    rows["dominant_hz"].append(
                        float(freqs[int(np.argmax(mag))])
                    )
                    rows["spectral_centroid_hz"].append(
                        float((freqs * mag).sum() / total)
                    )
            yield pd.DataFrame(rows)
            rows = {k: [] for k in rows}

    return df.mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def perceptual_hash(
    df: DataFrame, fake: bool = False, grid: int = 8
) -> DataFrame:
    """63-bit perceptual fingerprint (aHash family) per media payload:
    decode → reduce to a grid²-cell average plane → threshold each cell
    at the plane mean → one bit per cell.  Near-identical media (small
    crops, brightness shifts, re-encodes) land within a few Hamming
    bits, so :func:`media_dup_pairs` turns media dedup into the same
    banded equi-join as SimHash text dedup.

    Runs as ``mapInPandas`` (narrow — payload bytes never shuffle; only
    (media_id, 8-byte hash) leaves the executor).  Decoded shapes:

    - 2-D / 3-D pixel arrays → grayscale (channel mean) then grid×grid
      nearest-index block sampling — the classic image aHash;
    - 1-D PCM samples (the container-testable WAV path) → grid² equal
      bins of |amplitude| means — an amplitude-profile audio hash,
      invariant to volume scaling by construction (mean threshold).

    ``fake=True`` derives deterministic pseudo-pixels from the payload
    bytes (sha256-tiled), exercising identical Spark plumbing with no
    codec — the extract_features convention.  Bit 63 stays 0 so the
    hash is a non-negative BIGINT in every engine."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as np

        cells = grid * grid

        def plane_of(payload, fmt):
            if fake:
                raw = hashlib.sha256(bytes(payload)).digest()
                buf = (raw * (cells // len(raw) + 1))[:cells]
                return np.frombuffer(buf, dtype=np.uint8).astype(
                    np.float64
                )
            arr = np.asarray(decode_media(bytes(payload), fmt))
            if fmt == "wav" and arr.ndim == 2:  # stereo PCM → mono
                arr = arr.mean(axis=1)
            if arr.ndim == 3:  # H×W×C → luma via channel mean
                arr = arr.mean(axis=2)
            if arr.ndim == 2:
                yi = np.linspace(0, arr.shape[0] - 1, grid).astype(int)
                xi = np.linspace(0, arr.shape[1] - 1, grid).astype(int)
                return arr[np.ix_(yi, xi)].astype(np.float64).ravel()
            a = np.abs(arr.astype(np.float64))
            edges = np.linspace(0, a.size, cells + 1).astype(int)
            return np.asarray(
                [
                    a[s:e].mean() if e > s else 0.0
                    for s, e in zip(edges[:-1], edges[1:])
                ]
            )

        for pdf in batches:
            fmts = (
                pdf["format"]
                if "format" in pdf.columns
                else pd.Series(["unknown"] * len(pdf))
            )
            out = []
            for mid, fmt, payload in zip(
                pdf["media_id"], fmts, pdf["payload"]
            ):
                if payload is None:
                    continue
                plane = plane_of(payload, fmt)
                bits = plane > plane.mean()
                h = 0
                for i in range(min(plane.size, 63)):
                    if bits[i]:
                        h |= 1 << i
                out.append((int(mid), h))
            yield pd.DataFrame(out, columns=["media_id", "phash"])

    return df.mapInPandas(run, "media_id long, phash long")


def media_dup_pairs(
    hashes: DataFrame,
    id_col: str = "media_id",
    hash_col: str = "phash",
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-duplicate media pairs from perceptual hashes: band the
    63-bit fingerprint into ``bands`` bit-slices and equi-join on
    (band, slice value) — the SimHash banding argument: two hashes
    within ``bands − 1`` Hamming bits MUST agree on at least one slice
    (pigeonhole), so recall is exact for ``max_hamming < bands`` and
    probabilistic beyond.  Candidates are verified with the exact
    ``hamming64`` and deduped (a < b).  Linear in the corpus — the
    all-pairs comparison never materializes — and the payload bytes
    were already left behind by perceptual_hash."""
    from snowav_spark.ops import dedup

    width = 64 // bands
    mask = (1 << width) - 1
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col(hash_col), b * width)
                .bitwiseAND(F.lit(mask))
                .alias("slice"),
            )
            for b in range(bands)
        ]
    )
    banded = hashes.select(
        F.col(id_col), F.col(hash_col), F.explode(slices).alias("bb")
    ).select(id_col, hash_col, "bb.band", "bb.slice")
    a = banded.select(
        F.col(id_col).alias("id_a"),
        F.col(hash_col).alias("h_a"),
        "band",
        "slice",
    )
    b = banded.select(
        F.col(id_col).alias("id_b"),
        F.col(hash_col).alias("h_b"),
        "band",
        "slice",
    )
    return (
        a.join(b, ["band", "slice"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            dedup.hamming64(F.col("h_a"), F.col("h_b")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )
