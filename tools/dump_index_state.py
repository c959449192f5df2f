"""Dump every artifact of the offline index builds to JSON so an
optimization of the build path can be proven output-identical.

Covers, at one sf_dir:
- train_pq_codebook codebook floats (repr-exact)
- pq_encode codes for every vec_id
- build_ivfpq_index: centroid sidecar, codebook sidecar, stored codes
  (id -> (cell, codes)), for both the plain and metadata layouts
- q_pq_ann / q_ivfpq_ann / q_ann_filtered / q_ann_ivf / q_cluster_kmeans /
  q_semdedup / q_cluster_sample declared-query results (sorted rows)

Usage: python tools/dump_index_state.py OUT.json [SF_DIR]
Diff two dumps with plain `diff` / json equality.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def rows_of(df):
    return sorted(
        [
            [
                list(v) if isinstance(v, (list, tuple)) else (
                    repr(v) if isinstance(v, float) else v
                )
                for v in row
            ]
            for row in df.collect()
        ],
        key=repr,
    )


def main() -> None:
    out_path = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    from snowav_spark import contract
    from snowav_spark.io import load_table
    from snowav_spark.ops import quantize
    from snowav_spark.session import get_spark

    spark = get_spark("dump-index-state", extra_conf={"spark.ui.enabled": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")
    out: dict = {"sf_dir": sf_dir}

    cb = quantize.train_pq_codebook(
        emb, "vec_id", "embedding", dim=64, m=8, k=8, iters=2
    )
    out["pq_codebook"] = [
        [[repr(float(x)) for x in c] for c in cents] for cents in cb
    ]
    out["pq_codes"] = {
        str(r.vec_id): list(r.codes)
        for r in quantize.pq_encode(emb, "vec_id", "embedding", cb).collect()
    }

    for name, meta in (("ivfpq", ()), ("ivfpq_meta", ("label",))):
        path = tempfile.mkdtemp(prefix=f"dump_{name}_") + "/idx"
        cents, codebook = quantize.build_ivfpq_index(
            emb, "vec_id", "embedding", path,
            n_cells=8, m=8, k=8, iters=1, dim=64, metadata=meta,
        )
        out[f"{name}_centroids"] = [
            [repr(float(x)) for x in c] for c in cents
        ]
        out[f"{name}_codebook"] = [
            [[repr(float(x)) for x in c] for c in cents_j]
            for cents_j in codebook
        ]
        stored = spark.read.parquet(path)
        out[f"{name}_stored"] = {
            str(r.vec_id): [int(r.cell), list(r.codes)]
            + ([r.label] if meta else [])
            for r in stored.collect()
        }
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)

    for key in (
        "q_pq_ann", "q_ivfpq_ann", "q_ann_filtered", "q_ann_ivf",
        "q_cluster_kmeans", "q_cluster_sample", "q_semdedup",
        "q_dedup_embed_lsh", "q_minhash_lsh",
    ):
        out[key] = rows_of(contract.QUERIES[key](spark, sf_dir))

    with open(out_path, "w") as f:
        json.dump(out, f, indent=0, sort_keys=True)
    print("wrote", out_path)
    spark.stop()


if __name__ == "__main__":
    main()
