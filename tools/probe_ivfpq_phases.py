"""Phase-level attribution for the IVF-PQ build's decade-up growth.

The round-11 decade probe (800k -> 1.6M vectors, constant ~6,250-row cell
occupancy so n_cells doubles 128 -> 256) measured build ratio 2.78 — up
from 1.39 one decade down.  Under constant occupancy the flat batch x k
assignment matmul is the only O(N x k) = O(N^2) term, but the k-range in
question (128 -> 256) is far below the two-level router's crossover, so
this probe times each build phase separately to find where the growth
actually lives before touching the _HIER_MIN_CELLS gate.

Usage: python tools/probe_ivfpq_phases.py [N]   (vectors at the 2x leg;
default 1_600_000; the 1x leg is N/2).  Prints one JSON line with
per-phase seconds at both legs and ratios.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from snowav_spark.ops import quantize, sampling, similarity  # noqa: E402
from snowav_spark.session import get_spark  # noqa: E402
from tools.scale_probe import gen_embeddings  # noqa: E402


def timed_build(spark, n_vec: int) -> dict:
    emb = gen_embeddings(spark, n_vec).cache()
    emb.count()
    n_cells = max(8, n_vec // 6_250)
    frac = min(1.0, 50_000 / max(n_vec, 1))
    root = tempfile.mkdtemp(prefix="probe_ivfpq_ph_")
    path = root + "/idx"
    out: dict[str, float] = {"n_vec": n_vec, "n_cells": n_cells}

    t0 = time.perf_counter()
    cents = similarity.ivf_centroids(
        emb, "vec_id", "embedding", n_cells, 1, 64
    )
    out["centroids"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    res = quantize._residuals(emb, "vec_id", "embedding", cents)
    train = sampling.hash_sample(res, "vec_id", frac)
    codebook = quantize.train_pq_codebook(
        train, "vec_id", "_res", dim=64, m=8, k=16, iters=1
    )
    out["codebook"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    codes = quantize.pq_encode(res, "vec_id", "_res", codebook, keep=("cell",))
    quantize._write_codes(codes, path, None, overwrite_all=True)
    out["encode_write"] = round(time.perf_counter() - t0, 2)

    emb.unpersist()
    shutil.rmtree(root, ignore_errors=True)
    return out


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_600_000
    spark = get_spark("probe-ivfpq-phases")
    legs = [timed_build(spark, n // 2), timed_build(spark, n)]
    ratios = {
        k: round(legs[1][k] / max(legs[0][k], 1e-9), 2)
        for k in ("centroids", "codebook", "encode_write")
    }
    print(json.dumps({"legs": legs, "ratios": ratios}))


if __name__ == "__main__":
    main()
