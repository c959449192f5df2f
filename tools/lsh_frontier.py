"""Measure the sign-LSH recall/pruning frontier on the production path.

For bits ∈ {3, 8, 16} (tables fixed), report per corpus size:
  - candidate pairs emitted by ``lsh_candidate_pairs`` (the Σ n_bucket²
    cost the self-join actually pays),
  - pruning factor vs the N(N−1)/2 pairs a crossJoin would score,
  - verified pairs at cos ≥ 0.9 and recall vs the exact N² path
    (exact path only run when N ≤ exact_cap — it is the quadratic
    baseline this operator exists to avoid).

Corpora: the sf0.1 embeddings fixture (real driver data) plus synthetic
clustered embeddings from tools/scale_probe.py at larger N, so the
``bits ≈ log2(N / B)`` sizing rule is checked against growth, not a
single point.

Usage: python tools/lsh_frontier.py [N_synth ...]   (default 20000 40000)
Prints one JSON line per (corpus, bits) and a final summary line; paste
the table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

EXACT_CAP = 5_000
BITS = (3, 8, 16)
TABLES = 4
THRESHOLD = 0.9


def probe(spark, name, emb, n, bits_list=BITS):
    from snowav_spark.ops import similarity

    emb = emb.localCheckpoint(eager=True)
    exact = None
    if n <= EXACT_CAP:
        exact = {
            (r.id_a, r.id_b)
            for r in similarity.cosine_pairs_above(
                emb, "vec_id", "embedding", THRESHOLD
            ).collect()
        }
    out = []
    for bits in bits_list:
        t0 = time.perf_counter()
        n_cand = similarity.lsh_candidate_pairs(
            emb, "vec_id", "embedding", tables=TABLES, bits=bits
        ).count()
        got = {
            (r.id_a, r.id_b)
            for r in similarity.dedup_pairs_lsh(
                emb, "vec_id", "embedding", THRESHOLD,
                tables=TABLES, bits=bits,
            ).collect()
        }
        dt = round(time.perf_counter() - t0, 2)
        full = n * (n - 1) // 2
        rec = {
            "corpus": name,
            "n": n,
            "tables": TABLES,
            "bits": bits,
            "candidates": n_cand,
            "prune_vs_n2": round(n_cand / full, 6) if full else None,
            "pairs_ge_0.9": len(got),
            "recall": (
                round(len(got & exact) / len(exact), 4)
                if exact
                else None
            ),
            "sec": dt,
        }
        out.append(rec)
        print(json.dumps(rec))
    return out


def main() -> None:
    # flags: --bits 15,16,17 overrides the bit sweep (big-N probes need
    # constant-occupancy bits — bits=3 at 400k vectors would score ~42%
    # of 8e10 pairs); --no-fixture skips the sf0.1 corpus re-run.
    argv = sys.argv[1:]
    bits_list = BITS
    if "--bits" in argv:
        i = argv.index("--bits")
        bits_list = tuple(int(b) for b in argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    skip_fixture = "--no-fixture" in argv
    argv = [a for a in argv if a != "--no-fixture"]
    n_synth = [int(a) for a in argv] or [20_000, 40_000]
    from snowav_spark.session import get_spark

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scale_probe import gen_embeddings

    spark = get_spark(
        app_name="lsh-frontier", extra_conf={"spark.ui.enabled": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    if not skip_fixture:
        fix = spark.read.parquet("/root/testdata/sf0.1/embeddings.parquet")
        rows += probe(spark, "sf0.1-fixture", fix, fix.count(), bits_list)
    for n in n_synth:
        rows += probe(
            spark, f"synthetic-{n}", gen_embeddings(spark, n), n, bits_list
        )
    print(json.dumps({"summary": rows}))
    spark.stop()


if __name__ == "__main__":
    main()
