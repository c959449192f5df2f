"""Fixture-perturbation fuzz harness for the oracle-parity contract.

The driver REGENERATES /root/testdata fixtures between rounds, and history
shows the regenerations change more than values: round 1→3 flipped the
physical timestamp encoding (ns → µs), and ADVICE r3 found a latent
Spark-vs-DuckDB divergence (q_chunk_docs) that only NULL-text documents
would expose.  Every such latent divergence is a future red CORRECTNESS
row.  This tool hunts them *now*:

  for each perturbation variant:
      write a modified copy of the sf0.001 tables to a temp dir
      run tools/check.py (full Spark-vs-DuckDB parity, all oracle keys)
          with SPARK_GRAFT_SF_DIR pointing at the copy
      any mismatch = a real dialect-drift bug (both engines see the SAME
          perturbed data, so fixture "wrongness" cannot cause a false
          positive — only engine disagreement can)

Variants (gating — a mismatch is a bug to fix):
  nulls       NULL text/lang/source in documents, NULL props/value/user_id
              in events, NULL embedding/label in embeddings
  weird_text  empty / whitespace-only / unicode (CJK, emoji, combining) /
              regex-metacharacter / embedded tab+newline texts
  ts_ns       events.ts, o_orderdate, l_shipdate re-encoded timestamp[ns]
  ts_tz       same columns re-encoded timestamp[us, tz=UTC]
  dupes       exact duplicate document rows + same-text-different-id pairs
  fuzzy_text  sub-trigram-length / empty names and texts, a dist-1 name
              pair, hot-trigram clusters (fuzzy_join fallback + max_df
              paths, dedup-near shingling on degenerate docs)

Report-only (engine disagreement noted, not fatal — NaN ordering and
overflow semantics legitimately differ across engines and the driver's
synthetic generator has never emitted them):
  float_mag   -0.0 / ±1e13-magnitude / subnormal doubles in events.value
  float_nan   NaN doubles in events.value

Usage:
    python tools/fuzz_fixtures.py [variant ...]     # default: all
    python tools/fuzz_fixtures.py --keep            # keep temp dirs
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.001"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)

# ---------------------------------------------------------------------------
# per-variant table rewriters: (table_name, arrow_table) -> arrow_table
# ---------------------------------------------------------------------------


def _set_rows(tbl: pa.Table, col: str, updates: dict[int, object]) -> pa.Table:
    """Replace values at given row indices of one column (None allowed)."""
    vals = tbl.column(col).to_pylist()
    for i, v in updates.items():
        vals[i] = v
    typ = tbl.schema.field(col).type
    idx = tbl.schema.get_field_index(col)
    return tbl.set_column(idx, pa.field(col, typ), pa.array(vals, type=typ))


def perturb_nulls(name: str, tbl: pa.Table) -> pa.Table:
    n = tbl.num_rows
    if name == "documents" and n >= 20:
        # NULL text with n_chars kept consistent (NULL too) and one row
        # where only lang/source go NULL.
        tbl = _set_rows(tbl, "text", {3: None, 11: None})
        tbl = _set_rows(tbl, "n_chars", {3: None, 11: None})
        tbl = _set_rows(tbl, "lang", {5: None})
        tbl = _set_rows(tbl, "source", {7: None})
    elif name == "events" and n >= 50:
        tbl = _set_rows(tbl, "props", {2: None, 13: "not json", 17: "{}"})
        tbl = _set_rows(tbl, "value", {4: None, 21: None})
        tbl = _set_rows(tbl, "user_id", {9: None})
    elif name == "embeddings" and n >= 20:
        tbl = _set_rows(tbl, "embedding", {6: None})
        tbl = _set_rows(tbl, "label", {8: None})
    return tbl


_WEIRD = [
    "",  # empty
    "   ",  # whitespace-only
    "\t\n ",  # control whitespace
    "雪 水 当 量 数据 雪 水",  # CJK tokens
    "café naïve déjà-vu café",  # combining accents
    "🌨️ snow ❄️ emoji 🌨️ test",  # emoji
    "a.b*c(d [e] {f} |g| ^h$ \\i",  # regex metacharacters
    "word " * 200,  # long highly-repetitive
    "UPPER lower MiXeD UPPER",  # case variance
    "one\ttab\nnewline one",  # embedded tab/newline
]


def perturb_weird_text(name: str, tbl: pa.Table) -> pa.Table:
    if name != "documents" or tbl.num_rows < 2 * len(_WEIRD):
        return tbl
    updates = {2 * i: t for i, t in enumerate(_WEIRD)}
    tbl = _set_rows(tbl, "text", updates)
    return _set_rows(tbl, "n_chars", {i: len(t) for i, t in updates.items()})


def _recast_ts(tbl: pa.Table, unit_tz: tuple[str, str | None]) -> pa.Table:
    unit, tz = unit_tz
    for i, f in enumerate(tbl.schema):
        if pa.types.is_timestamp(f.type):
            target = pa.timestamp(unit, tz=tz)
            col = tbl.column(i)
            if tz is not None and f.type.tz is None:
                # naive → instant: interpret the naive value as UTC
                col = pc.assume_timezone(col, "UTC")
            tbl = tbl.set_column(i, pa.field(f.name, target), col.cast(target))
    return tbl


def perturb_ts_ns(name: str, tbl: pa.Table) -> pa.Table:
    return _recast_ts(tbl, ("ns", None))


def perturb_ts_tz(name: str, tbl: pa.Table) -> pa.Table:
    return _recast_ts(tbl, ("us", "UTC"))


def perturb_dupes(name: str, tbl: pa.Table) -> pa.Table:
    if name != "documents" or tbl.num_rows < 30:
        return tbl
    # exact duplicate rows (same doc_id AND text) + same-text/new-id pairs
    head = tbl.slice(0, 5)
    clones = tbl.slice(5, 5)
    ids = pc.add(clones.column("doc_id"), 1_000_000)
    idx = clones.schema.get_field_index("doc_id")
    clones = clones.set_column(idx, clones.schema.field(idx), ids)
    return pa.concat_tables([tbl, head, clones])


def perturb_fuzzy_text(name: str, tbl: pa.Table) -> pa.Table:
    """Adversarial inputs for the trigram-blocked operators (VERDICT r4
    item 8): names/texts SHORTER than a trigram (fuzzy_join's
    whole-string-gram fallback branch), an empty string, a name pair
    within 1 edit, and hot-trigram clusters (many rows sharing the same
    gram — the df(g)² blocking hot spot).  Both engines see the same
    rows, so any q_fuzzy_join / dedup-near / tokenizer mismatch is a
    real dialect divergence."""
    if name == "nation" and tbl.num_rows >= 15:
        return _set_rows(
            tbl,
            "n_name",
            {
                0: "A",  # 1 char — below trigram length
                1: "AB",  # 2 chars
                2: "",  # empty string
                3: "ABC",  # exactly one trigram
                5: "THETHETHE1",  # hot-gram cluster: "the"/"het"/"eth"
                6: "THETHETHE2",
                8: "THETHETHE3",
                10: "GERMANX",  # 1 edit from GERMANY (row 7)
                12: "AB",  # short-string pair: dist 0 vs row 1
            },
        )
    if name == "documents" and tbl.num_rows >= 40:
        updates = {
            1: "a",
            9: "ab",
            15: "",
            21: "the the the the the",
            27: "thethethethe",
            33: "xy",
        }
        tbl = _set_rows(tbl, "text", updates)
        return _set_rows(
            tbl, "n_chars", {i: len(t) for i, t in updates.items()}
        )
    return tbl


def perturb_float_mag(name: str, tbl: pa.Table) -> pa.Table:
    """-0.0, 1e13-magnitude, and subnormal doubles — values both engines
    agree on pointwise, so any mismatch is summation-noise absorption
    failing (round(,6) stops working at ~1e7+ sum magnitude)."""
    if name != "events" or tbl.num_rows < 40:
        return tbl
    return _set_rows(
        tbl,
        "value",
        {6: -0.0, 12: 1.23456789e13, 18: -9.87654321e12, 25: 5e-324},
    )


def perturb_float_nan(name: str, tbl: pa.Table) -> pa.Table:
    if name != "events" or tbl.num_rows < 10:
        return tbl
    return _set_rows(tbl, "value", {1: float("nan"), 7: float("nan")})


def perturb_hot_term(name: str, tbl: pa.Table) -> pa.Table:
    """A corpus-hot QUERY term: 'join' (a term the bm25/text-index/rrf
    keys actually query) appended to every document and tripled in a few
    — df(join) = N drives the BM25 idf to ln(1 + ε) ≈ 0, every doc
    matches the retrieval keys (top-k tie-break storms on near-equal
    scores), the inverted index gets one corpus-hot posting bucket, and
    dl shifts by one everywhere.  Also three pure-hot docs (text is ONLY
    the hot term).  Both engines see the same rows, so any divergence in
    idf math, tie-breaks, or bucket handling is a real dialect bug."""
    if name != "documents" or tbl.num_rows < 10:
        return tbl
    texts = tbl.column("text").to_pylist()
    out = []
    for i, t in enumerate(texts):
        if t is None:
            out.append(None)
        elif i % 7 == 0:
            out.append(f"join {t} join join")
        else:
            out.append(f"{t} join")
    idx = tbl.schema.get_field_index("text")
    tbl = tbl.set_column(
        idx, tbl.schema.field(idx), pa.array(out, type=tbl.column("text").type)
    )
    extra = tbl.slice(0, 3)
    ids = pc.add(extra.column("doc_id"), 2_000_000)
    di = extra.schema.get_field_index("doc_id")
    extra = extra.set_column(di, extra.schema.field(di), ids)
    ti = extra.schema.get_field_index("text")
    extra = extra.set_column(
        ti,
        extra.schema.field(ti),
        pa.array(["join join join"] * 3, type=tbl.column("text").type),
    )
    return pa.concat_tables([tbl, extra])


VARIANTS = {
    "nulls": (perturb_nulls, True),
    "weird_text": (perturb_weird_text, True),
    "ts_ns": (perturb_ts_ns, True),
    "ts_tz": (perturb_ts_tz, True),
    "dupes": (perturb_dupes, True),
    "fuzzy_text": (perturb_fuzzy_text, True),
    "hot_term": (perturb_hot_term, True),
    "float_mag": (perturb_float_mag, False),
    "float_nan": (perturb_float_nan, False),
}


def build_variant(variant: str, dest: str) -> None:
    fn, _ = VARIANTS[variant]
    os.makedirs(dest, exist_ok=True)
    for t in TABLES:
        tbl = pq.read_table(f"{SRC}/{t}.parquet")
        out = fn(t, tbl)
        pq.write_table(out, f"{dest}/{t}.parquet")


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    keep = "--keep" in sys.argv[1:]
    unknown = [a for a in args if a not in VARIANTS]
    if unknown:
        print(f"unknown variant(s) {unknown}; valid: {sorted(VARIANTS)}")
        return 2
    names = args or list(VARIANTS)
    root = tempfile.mkdtemp(prefix="fuzzfix_")
    gating_failed = []
    report_failed = []
    for v in names:
        dest = os.path.join(root, v)
        build_variant(v, dest)
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=dest)
        print(f"\n=== variant {v} ({dest}) ===", flush=True)
        r = subprocess.run(
            [sys.executable, "tools/check.py"],
            env=env,
            cwd="/root/repo",
            capture_output=True,
            text=True,
        )
        tail = "\n".join(r.stdout.strip().splitlines()[-1:])
        bad = [
            ln
            for ln in r.stdout.splitlines()
            if any(
                m in ln
                for m in ("MISMATCH", "ERROR", "NO SUCH", "NONDETERMINISTIC")
            )
        ]
        for ln in bad:
            print("  " + ln)
        print(f"  {tail}")
        gating = VARIANTS[v][1]
        if r.returncode != 0:
            if gating:
                gating_failed.append(v)
            else:
                report_failed.append(v)
                print(f"  (report-only variant — not gating)")
    if not keep:
        shutil.rmtree(root, ignore_errors=True)
    clean = len(names) - len(gating_failed) - len(report_failed)
    print(
        f"\nfuzz: {clean}/{len(names)} variants clean"
        + (f"; GATING FAILURES: {gating_failed}" if gating_failed else "")
        + (
            f"; report-only disagreements: {report_failed}"
            if report_failed
            else ""
        )
    )
    return 1 if gating_failed else 0


if __name__ == "__main__":
    sys.exit(main())
