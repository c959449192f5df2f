"""Text-analysis operators for large-scale training-data pipelines
(SURVEY.md §2.6 EXT — no reference analog; the reference is a numeric
raster pipeline).

Everything here is built-in-expression only: ``split`` / ``explode`` /
higher-order array functions — JVM-side, whole-stage codegen, no Python in
the hot path.  At 100 TB the explode-based shapes (tokenize, lang-ID) are
a flat map followed by a hash aggregate: no shuffle until the aggregate,
and the aggregate keys (word, lang) are low-cardinality so map-side
combine collapses almost everything before the exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Deterministic language marker profiles for the n-gram/stopword heuristic
# language-ID.  Real deployments load calibrated profiles as a dim table;
# the operator shape (explode → broadcast join → score → argmax) is the
# same regardless of profile quality.
LANG_MARKERS: list[tuple[str, str, float]] = [
    ("the", "en", 1.0),
    ("a", "en", 0.5),
    ("is", "en", 1.0),
    ("data", "es", 1.0),
    ("table", "es", 0.5),
    ("fast", "de", 1.0),
    ("slow", "de", 0.5),
    ("query", "fr", 1.0),
    ("row", "fr", 0.5),
    ("spark", "zh", 1.0),
    ("join", "zh", 0.5),
]


def tokens(text: Column) -> Column:
    """Whitespace tokenization as an array column (no explode yet)."""
    return F.split(text, " ")


def text_stats(df: DataFrame, group: str, text: str, n_chars: str) -> DataFrame:
    """Per-group corpus statistics: doc counts, char/length aggregates."""
    return df.groupBy(group).agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg(n_chars), 6).alias("avg_chars"),
        F.round(F.avg(F.length(text)), 6).alias("avg_len"),
        F.min(n_chars).alias("min_chars"),
        F.max(n_chars).alias("max_chars"),
    )


def top_terms(df: DataFrame, text: str, k: int) -> DataFrame:
    """Term frequency top-k: explode → hash agg → TakeOrdered.

    Map-side combine means the exchange carries at most |vocab| rows per
    partition regardless of corpus size; the top-k never sorts the corpus.
    """
    return (
        df.select(F.explode(tokens(F.col(text))).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(k)
    )


def token_counts(df: DataFrame, id_col: str, text: str) -> DataFrame:
    """Per-document token counting two ways: whitespace split and a
    BPE-ish regex ([a-z]+ chunks) — both JVM-side, no explode (array
    length only, so the row count never grows)."""
    return df.select(
        id_col,
        F.size(tokens(F.col(text))).alias("n_ws"),
        F.regexp_count(F.col(text), F.lit("[a-z]+")).cast("int").alias("n_re"),
    )


def quality_expr(
    text: Column, stopwords: tuple[str, ...] = ("a", "the")
) -> tuple[Column, Column, Column]:
    """(avg_word_len, stop_ratio, quality) column expressions — THE
    quality formula, shared by the batch scorer and the streaming
    curation gate so the two can never drift.  Pure arithmetic over
    higher-order array functions (no transcendentals → bit-identical
    across engines)."""
    toks = tokens(text)
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in stopwords])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    # chars excluding the (n_tok - 1) separators, per token
    awl = (F.length(text) - (n_tok - 1)) / n_tok
    stop_ratio = n_stop.cast("double") / n_tok
    return awl, stop_ratio, awl - 4.0 * stop_ratio


def quality_score(
    df: DataFrame,
    id_col: str,
    text: str,
    stopwords: tuple[str, ...] = ("a", "the"),
) -> DataFrame:
    """Heuristic document quality: average word length minus a stopword-
    ratio penalty (see quality_expr)."""
    awl, stop_ratio, quality = quality_expr(F.col(text), stopwords)
    return df.select(
        id_col,
        F.round(awl, 6).alias("avg_word_len"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(quality, 6).alias("quality"),
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 3
) -> DataFrame:
    """Top-k distinguishing terms per document by TF-IDF.

    tf = term count within the doc; idf = ln(N / df) over the corpus.
    Three aggregates and one broadcast join — the df table is vocab-sized,
    so at 100 TB only the (doc, term) counts shuffle, keyed by the doc.
    Oracle-verified in the contract since r10 (q_tfidf): round(tf·ln(N/df),
    6) agrees between Spark's and DuckDB's libm at every probed SF — see
    q_tfidf's docstring for the 1-ulp boundary-flake caveat and fallback.
    """
    from pyspark.sql.window import Window

    tok = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("word")
    )
    tf = tok.groupBy(id_col, "word").agg(F.count("*").alias("tf"))
    # Corpus size stays IN the plan (1-row agg, broadcast cross join) —
    # an eager df.count() here would be an extra full scan of the corpus
    # outside the lazy plan at every call.
    stats = df.agg(F.count("*").cast("double").alias("n_docs"))
    doc_freq = (
        tok.distinct().groupBy("word").agg(F.count("*").alias("df"))
    )
    scored = (
        tf.join(F.broadcast(doc_freq), "word")
        .crossJoin(F.broadcast(stats))
        .select(
            id_col,
            "word",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        F.desc("tfidf"), F.asc("word")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(id_col, "word", "tfidf", F.col("rn").cast("int").alias("rank"))
    )


def bm25_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 relevance of every document against a term query — the
    retrieval-side scorer of a training-data pipeline (quality filtering
    by query relevance, dedup cluster ranking).

    Same shuffle shape as TF-IDF; the query-term list is inlined as a
    literal filter so only matching (doc, term) rows survive the explode.

    NULL-text docs are excluded from the collection entirely (N and
    avg_dl): Spark's non-ANSI ``size(split(NULL))`` is −1, which would
    silently poison avg_dl where SQL's avg skips NULLs.
    """
    df = df.filter(F.col(text_col).isNotNull())
    tok = df.select(
        F.col(id_col),
        F.size(tokens(F.col(text_col))).alias("dl"),
        F.explode(tokens(F.col(text_col))).alias("word"),
    )
    # Corpus stats (N, avg doc length) stay IN the plan as a 1-row
    # broadcast aggregate — the previous count()/collect() pair was two
    # extra eager full scans of the corpus per call.
    stats = df.select(
        F.size(tokens(F.col(text_col))).cast("double").alias("_dl")
    ).agg(
        F.count("*").cast("double").alias("n_docs"),
        F.avg("_dl").alias("avg_dl"),
    )
    qt = [w.lower() for w in query_terms]
    tf = (
        tok.filter(F.col("word").isin(qt))
        .groupBy(id_col, "word")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
    )
    doc_freq = tf.groupBy("word").agg(F.countDistinct(id_col).alias("df"))
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl")))
    )
    return (
        tf.join(F.broadcast(doc_freq), "word")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )


def lang_id(
    df: DataFrame,
    id_col: str,
    text: str,
    markers: list[tuple[str, str, float]] = LANG_MARKERS,
) -> DataFrame:
    """Language identification via marker-token scoring (n-gram heuristic,
    SURVEY §2.6): explode tokens → broadcast-join the marker dim → sum
    weights per (doc, lang) → argmax with deterministic ties.

    The marker table is tiny → broadcast; the per-(doc, lang) score
    aggregate is the only shuffle.
    """
    spark = df.sparkSession
    m = spark.createDataFrame(markers, ["word", "lang", "wt"])
    tok = df.select(F.col(id_col), F.explode(tokens(F.col(text))).alias("word"))
    scores = (
        tok.join(F.broadcast(m), "word")
        .groupBy(id_col, "lang")
        .agg(F.sum("wt").alias("score"))
    )
    # argmax(lang by score), ties → lexicographically smallest lang:
    # min_by over (-score, lang) compares lexicographically on the struct.
    pred = scores.groupBy(id_col).agg(
        F.min_by("lang", F.struct((-F.col("score")).alias("ns"), F.col("lang"))).alias(
            "pred_lang"
        )
    )
    return (
        df.select(id_col)
        .join(pred, id_col, "left")
        .select(id_col, F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"))
    )


# -- cleaning / redaction ---------------------------------------------------
#
# Corpus-cleaning scalar pipeline (SURVEY §2.6 EXT): pure regexp_replace
# chains — whole-stage-codegen projections, no UDFs, trivially linear at
# any scale.  Patterns deliberately use only syntax shared by Java regex
# (Spark) and RE2 (DuckDB): no lookaround, no backrefs — so the same
# pattern string serves both the engine and the oracle.

PII_PATTERNS = {
    # local@domain.tld — conservative, no lookaround
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted-quad IPv4
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
    # international-ish phone: +, digits, separators; ≥9 digits total
    "phone": r"\+[0-9][0-9 ().-]{7,}[0-9]",
}

URL_PATTERN = r"https?://[^\s]+"


def redact_pii(text: Column, patterns: dict[str, str] | None = None) -> Column:
    """Replace each PII pattern with a typed placeholder (``<EMAIL>`` …).

    One chained ``regexp_replace`` per pattern — a single codegen
    projection; ordering is sorted-by-name for determinism.
    """
    out = text
    for name in sorted((patterns or PII_PATTERNS)):
        pat = (patterns or PII_PATTERNS)[name]
        out = F.regexp_replace(out, pat, f"<{name.upper()}>")
    return out


def clean_text(text: Column) -> Column:
    """Normalization used before hashing/dedup: strip URLs, lowercase,
    drop non-alphanumerics (keeping spaces), collapse whitespace, trim."""
    c = F.regexp_replace(text, URL_PATTERN, " ")
    c = F.lower(c)
    c = F.regexp_replace(c, r"[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, r" +", " ")
    return F.trim(c)


def clean_docs(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc cleaning record: normalized text digest (the dedup key for
    *normalized* exact dedup), cleaned length, and PII match counts."""
    cleaned = clean_text(redact_pii(F.col(text_col)))
    return df.select(
        F.col(id_col),
        F.md5(cleaned).alias("clean_digest"),
        F.length(cleaned).alias("clean_len"),
        F.length(F.col(text_col)).alias("raw_len"),
    )


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Repetition detection — the duplicate-n-gram fraction quality rule
    used by large corpus-cleaning pipelines (a doc whose shingles are
    mostly repeats is boilerplate or spam).

    dup_frac = 1 − distinct(shingles)/total(shingles): no explode, no
    shuffle — the per-doc shingle list is built once and measured in
    place.  The token and shingle arrays are each MATERIALIZED in their
    own projection before being referenced twice; inlining the split into
    the transform lambda re-evaluates it per element (the
    shingles_of_tokens pitfall), measured 3.4× slower at sf0.1.  The
    map-only array form composes into any projection without adding an
    exchange, unlike the explode → count/count_distinct agg twin.

    NULL-text docs are dropped (same convention as chunk_docs): a NULL
    text has no repetition score, and the engines disagree on the
    NULL-shingle fallout (DuckDB's list_distinct strips NULLs, Spark's
    array_distinct keeps them — tools/fuzz_fixtures.py nulls variant).
    """
    df = df.filter(F.col(text_col).isNotNull())
    tokd = df.select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    )
    toks = F.col("_toks")
    shingled = tokd.select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        ).alias("_sh"),
    )
    total = F.size(F.col("_sh"))
    uniq = F.size(F.array_distinct(F.col("_sh")))
    return shingled.select(
        F.col(id_col),
        total.alias("n_shingles"),
        uniq.alias("n_distinct"),
        F.round(
            1.0 - uniq.cast("double") / total, 6
        ).alias("dup_frac"),
    )


def quality_flags(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.2,
) -> DataFrame:
    """Rule-based document quality flags (the classic corpus-cleaning
    rule family: word-count bounds, mean-word-length bounds, symbol
    ratio) as ONE codegen projection — each flag an independent boolean
    so downstream can gate or just monitor.

    `keep` = every rule passes.  Pure integer/ratio arithmetic: identical
    across engines, so the whole report is oracle-matchable.
    """
    toks = F.split(F.col(text_col), " ")
    n_words = F.size(toks)
    mean_wl = (F.length(text_col) - (n_words - 1)).cast("double") / n_words
    n_sym = F.length(text_col) - F.length(
        F.regexp_replace(F.col(text_col), "[#@<>|^~]", "")
    )
    sym_ratio = n_sym.cast("double") / F.greatest(
        F.length(text_col), F.lit(1)
    )
    flags = {
        "ok_word_count": (n_words >= min_words) & (n_words <= max_words),
        "ok_word_len": (mean_wl >= min_mean_word_len)
        & (mean_wl <= max_mean_word_len),
        "ok_symbols": sym_ratio <= max_symbol_ratio,
    }
    keep = None
    cols = [F.col(id_col)]
    for name, cond in flags.items():
        cols.append(cond.alias(name))
        keep = cond if keep is None else (keep & cond)
    cols.append(keep.alias("keep"))
    return df.select(*cols)


def chunk_docs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    size: int = 50,
    stride: int = 25,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window preparation step of a training pipeline (long docs
    become size-token chunks every stride tokens; short docs yield one
    chunk).

    Shape at 100 TB: a flat map (transform + posexplode) with NO shuffle
    — chunks stay co-partitioned with their source doc, so a downstream
    per-doc aggregation needs no exchange.  All array ops are JVM-side
    codegen; chunk count per doc is ceil(max(n-size,0)/stride)+1, so
    output size is bounded by ~n/stride × input tokens.
    """
    # NULL text yields no chunks.  The SQL oracle twin must ALSO filter
    # NULL text explicitly: DuckDB's greatest() ignores NULL arguments, so
    # greatest(NULL-derived, 1) = 1 and an unfiltered oracle would emit one
    # bogus all-NULL chunk row per NULL-text doc.
    tokd = df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.split(F.col(text_col), " ").alias("_toks")
    )
    toks = F.col("_toks")
    n = F.size(toks)
    # number of chunk starts: 0, stride, 2·stride, … — always ≥ 1
    nch = F.greatest(
        F.ceil((n - size) / F.lit(float(stride))).cast("long") + 1, F.lit(1)
    )
    chunks = F.transform(
        F.sequence(F.lit(0), (nch - 1).cast("int")),
        lambda i: F.slice(toks, i * stride + 1, size),
    )
    ex = tokd.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "_chunk")
    )
    return ex.select(
        F.col(id_col),
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.array_join("_chunk", " ").alias("chunk_text"),
        F.size("_chunk").cast("long").alias("n_tokens"),
    )


# PII patterns shared by pii_audit and its SQL oracle twin (distinct from
# the name→pattern PII_PATTERNS dict above, which drives the redact-only
# Column helper redact_pii / clean_docs).  Written in
# the RE2 ∩ java.util.regex common subset — character classes instead of
# \d / \b / lookarounds — so Spark (Java regex) and DuckDB (RE2) match
# and replace identically.  Replacement order is email → ip → phone and
# must be the same in both engines (overlapping matches are resolved by
# whichever pattern runs first).
PII_AUDIT_PATTERNS = (
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+"),
    ("ip", "[0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"),
    ("phone", "[+]?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"),
)


def pii_audit(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails / IPv4 addresses / phone numbers from a text corpus
    and count what was removed — the privacy-scrub step of a training
    pipeline.  Emits (id, redacted text, n_email, n_ip, n_phone); counts
    are taken on the ORIGINAL text, redaction is sequential per
    PII_PATTERNS order.  NULL text passes through as NULL with NULL
    counts (identical in both engines: regexp over NULL is NULL).

    Shape at 100 TB: one codegen projection — regexp_count +
    regexp_replace are JVM-side, no UDF, no shuffle, fully pushdown-
    compatible; cost is linear in corpus bytes.
    """
    orig = F.col(text_col)
    red = orig
    counts = []
    for kind, pat in PII_AUDIT_PATTERNS:
        counts.append(
            F.regexp_count(orig, F.lit(pat)).cast("long").alias(f"n_{kind}")
        )
        red = F.regexp_replace(red, pat, f"<{kind.upper()}>")
    return df.select(F.col(id_col), red.alias("text"), *counts)


def ngram_doc_freq(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 5,
    k: int = 20,
) -> DataFrame:
    """Corpus-level n-gram document frequency, top-k — the boilerplate /
    template detector of corpus cleaning (an n-gram shared by many
    documents is boilerplate or contamination, not content).

    Per doc the n-gram set is DISTINCT (array_distinct before explode),
    so n_docs is a plain count(*) after the shuffle and within-doc
    repetition never inflates the shuffle.  Docs shorter than n tokens
    contribute nothing.  Top-k is a deterministic total order
    (n_docs desc, ngram asc) via TakeOrdered — no global sort
    materialization.

    Shape at 100 TB: explode → one groupBy shuffle on ngram with
    map-side partial aggregation; hot boilerplate n-grams are exactly
    what partial aggregation collapses best, so skew is self-limiting.
    """
    toks = F.split(F.col(text_col), " ")
    based = df.filter(
        F.col(text_col).isNotNull() & (F.size(toks) >= n)
    ).select(F.col(id_col), toks.alias("_toks"))
    grams = F.transform(
        F.sequence(F.lit(1), (F.size("_toks") - n + 1).cast("int")),
        lambda i: F.array_join(F.slice("_toks", i, n), " "),
    )
    ex = based.select(F.explode(F.array_distinct(grams)).alias("ngram"))
    return (
        ex.groupBy("ngram")
        .agg(F.count("*").alias("n_docs"))
        .orderBy(F.desc("n_docs"), F.asc("ngram"))
        .limit(k)
    )


def token_budget(
    df: DataFrame, by: list[str], text_col: str
) -> DataFrame:
    """Corpus token accounting per group (source, language, …): exact
    document / token / character totals — the table a data-mixing plan
    is computed from (mixture weights are set in TOKENS, not documents).

    One map-side-combined hash aggregate over integer measures (token
    count is array length — no explode, the row count never grows).
    NULL text counts as a document with 0 tokens/chars in BOTH engines
    (explicit coalesce: size(split(NULL)) is -1 in Spark, NULL in SQL).
    """
    toks = tokens(F.col(text_col))
    n_tok = F.when(
        F.col(text_col).isNull(), F.lit(0)
    ).otherwise(F.size(toks))
    n_chr = F.coalesce(F.length(F.col(text_col)), F.lit(0))
    return (
        df.groupBy(*by)
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(n_tok).cast("long").alias("n_tokens"),
            F.sum(n_chr).cast("long").alias("n_chars"),
        )
        .orderBy(*by)
    )


def _exploded_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, tok) rows; NULL-text docs contribute nothing (chunk_docs
    convention)."""
    return df.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )


def unigram_logprob(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Unigram language-model quality score — the CCNet-style LM filter:
    score each document by the mean log-probability of its tokens under
    a unigram model trained on the corpus itself.  Low scores flag
    gibberish / non-language payloads; implausibly high scores flag
    degenerate all-stopword docs.

    Shape at 100 TB: the model (token → count) is VOCABULARY-sized, not
    corpus-sized — Heaps' law keeps it in broadcast range even for
    multi-TB corpora, exactly why production LM filters ship as lookup
    tables.  So the scoring join is a broadcast hash join: the exploded
    token stream never shuffles.  The per-doc aggregation combines
    map-side (a doc's tokens are co-partitioned with the doc row the
    explode came from).  Two corpus passes total (one to count, one to
    score), both scans — no corpus-sized shuffle anywhere.

    Hash parity: count/total is the identical int→double division in
    both engines; ln() may differ by 1 ulp between libm and the JVM,
    which round(avg, 6) absorbs at |logp| ~ 10.
    """
    toks = _exploded_tokens(df, id_col, text_col)
    freq = toks.groupBy("tok").agg(F.count("*").alias("_c"))
    tot = toks.agg(F.count("*").alias("_t"))
    logp = F.log(F.col("_c").cast("double") / F.col("_t"))
    return (
        toks.join(F.broadcast(freq), "tok")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.round(F.avg(logp), 6).alias("avg_logp"),
        )
    )


def oov_rate(
    df: DataFrame, id_col: str, text_col: str, vocab_size: int = 100
) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-``vocab_size`` token vocabulary — the vocabulary-coverage
    quality rule (docs dominated by rare tokens are code, noise, or the
    wrong language for the vocab).

    The vocabulary is deterministic: top-V by (count desc, token asc) —
    the explicit tie-break keeps the V boundary engine-independent.
    Same scale shape as unigram_logprob: vocab is broadcast-sized by
    construction (V rows), the marker join is broadcast, the per-doc agg
    combines map-side.  All measures are exact integers; the rate is one
    int/int division rounded identically everywhere.
    """
    toks = _exploded_tokens(df, id_col, text_col)
    vocab = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("_c"))
        .orderBy(F.desc("_c"), F.asc("tok"))
        .limit(vocab_size)
        .select("tok", F.lit(1).alias("_in"))
    )
    marked = toks.join(F.broadcast(vocab), "tok", "left")
    n_oov = F.sum(F.when(F.col("_in").isNull(), 1).otherwise(0))
    return marked.groupBy(id_col).agg(
        F.count("*").alias("n_tokens"),
        n_oov.cast("long").alias("n_oov"),
        F.round(n_oov * 1.0 / F.count("*"), 6).alias("oov_frac"),
    )


def bigram_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Adjacent-token bigram model counts — the n-gram LM / next-token
    statistics pass of a training-data pipeline: for each (w1, w2)
    bigram, its corpus count and the total count of bigrams opening
    with w1, so P(w2|w1) = n_pair/n_w1 normalizes exactly to 1 per w1.

    Shape: one projection builds the adjacent-pair array per document
    (element_at over a sequence — NO self-join of exploded tokens, the
    classic mistake that shuffles the corpus twice and joins on doc_id),
    one explode, one map-side-combined count, and a vocab-sized
    equi-join to attach the w1 totals (AQE broadcasts it when small).
    Counts are exact integers, so the conditional probability divides
    two identical ints in every engine — hash-exact after round(,6).
    Docs with <2 tokens contribute nothing (guarded: Spark's sequence()
    DESCENDS when start > stop — an unguarded size-1 doc would emit a
    bogus reversed pair).
    """
    t = tokens(F.col(text_col))
    pairs = (
        df.filter(F.col(text_col).isNotNull() & (F.size(t) >= 2))
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size(t) - 1),
                    lambda i: F.struct(
                        F.element_at(t, i).alias("w1"),
                        F.element_at(t, i + 1).alias("w2"),
                    ),
                )
            ).alias("bi")
        )
        .select("bi.w1", "bi.w2")
    )
    pair_counts = pairs.groupBy("w1", "w2").agg(
        F.count("*").alias("n_pair")
    )
    from pyspark.sql.window import Window

    # w1 totals as a window over the (vocab-pair)-sized count table — a
    # groupBy+self-join would re-scan the CORPUS (Catalyst does not reuse
    # the aggregated subtree), which the plan audit caught; the window
    # costs one exchange of the tiny pair table instead.
    w = Window.partitionBy("w1")
    return pair_counts.select(
        "w1",
        "w2",
        "n_pair",
        F.sum("n_pair").over(w).alias("n_w1"),
    ).withColumn("p", F.round(F.col("n_pair") / F.col("n_w1"), 6))


def vocab_coverage(df: DataFrame, text_col: str, ks=(10, 100, 1000)) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-design question "what
    fraction of corpus tokens do the top-k words cover?": for each
    k ∈ ``ks``, the cumulative count of the k most frequent words and
    its share of all tokens.

    Scale shape: token counts are one explode + map-side-combined agg
    (vocab-sized output); the top max(ks) rows come via TakeOrdered —
    never a global sort of the vocabulary — and the running sum windows
    over that driver-bounded frame only.  The total is a 1-row agg off
    the same (lazily checkpointed) count table, so the corpus scans
    once.  Counts are exact ints; coverage divides identical ints.
    Output: (k, cum_tokens, total_tokens, coverage).
    """
    from pyspark.sql.window import Window

    counts = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("n"))
        .localCheckpoint(eager=False)  # reused by top-k AND the total
    )
    total = counts.agg(F.sum("n").alias("total_tokens"))
    top = counts.orderBy(F.desc("n"), F.asc("w")).limit(max(ks))
    w = Window.orderBy(F.desc("n"), F.asc("w")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    ranked = top.select(
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("w"))).alias(
            "k"
        ),
        F.sum("n").over(w).alias("cum_tokens"),
    )
    return (
        ranked.filter(F.col("k").isin(*ks))
        .crossJoin(F.broadcast(total))
        .select(
            "k",
            "cum_tokens",
            "total_tokens",
            F.round(F.col("cum_tokens") / F.col("total_tokens"), 6).alias(
                "coverage"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Persisted inverted index + partition-pruned BM25 retrieval
# ---------------------------------------------------------------------------


def _term_bucket_sql(term_expr: str, n_buckets: int) -> str:
    """Bucket id of a term — md5-prefix mod, NOT xxhash64: the driver
    must compute the SAME bucket for query terms in plain Python
    (hashlib.md5) to prune partitions before the scan."""
    return (
        f"CAST(conv(substring(md5({term_expr}), 1, 8), 16, 10) AS BIGINT)"
        f" % {n_buckets}"
    )


def _term_bucket_py(term: str, n_buckets: int) -> int:
    import hashlib

    return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % n_buckets


def _postings_of(
    df: DataFrame, id_col: str, text_col: str, n_buckets: int, obs=None
) -> DataFrame:
    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.size(tokens(F.col(text_col))).alias("dl"),
        tokens(F.col(text_col)).alias("_toks"),
    )
    if obs is not None:
        # Corpus stats ride the postings pass (guide §1.2 remove
        # passes): the old dedicated stats scan re-tokenized the corpus
        # to re-derive exactly count(*) and Σ size(tokens(text)) — both
        # already computed per row HERE, before the explode drops
        # zero-token docs.  The CollectMetrics node adds no shuffle and
        # no job; _stats_row reads it after the postings write action.
        base = base.observe(
            obs,
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("dl").cast("long")).alias("sum_dl"),
        )
    tok = base.select("doc_id", "dl", F.explode("_toks").alias("term"))
    return (
        tok.groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"), F.first("dl").alias("dl"))
        .selectExpr(
            "term",
            "doc_id",
            "tf",
            "dl",
            f"{_term_bucket_sql('term', n_buckets)} AS bucket",
        )
    )


def _stats_row(spark, obs, n_buckets: int) -> DataFrame:
    """The corpus-stats row — MERGEABLE integer partials
    (n_docs, sum_dl): search derives avg_dl = Σsum_dl / Σn_docs, one
    double division, exact at any merge order (integer sums below
    2^53), unlike persisting a float avg that would need
    order-sensitive weighted re-merging.

    Recovered from the postings pass's observation instead of the
    dedicated second corpus scan + re-tokenization it used to be —
    ``obs.get`` blocks until the postings write has executed, which is
    exactly the postings-before-stats commit order _write_text_parts
    documents.  Value-identical to the old scan: same count over the
    same pre-explode rows, same integer sum (NULL on an empty batch in
    both forms)."""
    from snowav_spark.io import local_df

    row = obs.get
    return local_df(
        spark,
        [(row["n_docs"], row["sum_dl"], int(n_buckets))],
        "n_docs long, sum_dl long, n_buckets int",
    )


def _write_text_parts(
    postings: DataFrame,
    stats,
    path: str,
    batch_id: int | None,
    overwrite_all: bool,
    digest: str | None = None,
) -> None:
    """One write shape for both layouts (the quantize._write_codes
    twin): plain ``bucket`` partitions for batch builds/appends,
    ``(bucket, _batch)`` + per-batch stats rows for streaming ingest —
    replays rewrite their own partitions via dynamic overwrite.  Batch
    APPENDS (batch_id None, overwrite_all False) carry a content
    ``digest`` and commit through sinks.idempotent_append, so a
    crashed-then-retried append converges to one copy.

    ``stats`` is a ZERO-ARG CALLABLE returning the stats row, invoked
    only after the postings write has run — with observation-fed stats
    (:func:`_stats_row`) the call is what blocks on the metrics, and
    the deferral preserves the postings-first commit order in every
    branch."""
    side = path.rstrip("/") + "/_corpus_stats"
    # cluster each bucket's postings (without this, every write task
    # emits a file into every bucket directory — tasks × buckets small
    # files) and sort by term so the query-time term In-filter also
    # prunes at parquet row-group level WITHIN a bucket
    postings = postings.repartition(F.col("bucket")).sortWithinPartitions(
        "term", "doc_id"
    )
    if batch_id is None:
        if not overwrite_all:
            from snowav_spark import sinks

            assert digest is not None
            # postings FIRST, stats partial LAST: a crash in between
            # under-counts (search slightly under-scores the batch)
            # until the retry repairs it — the reverse order would
            # over-count, which no retry could detect
            sinks.idempotent_append(
                postings, path, digest, partition_by=("bucket",)
            )
            sinks.idempotent_append(stats().coalesce(1), side, digest)
            return
        postings.write.mode("overwrite").partitionBy("bucket").parquet(path)
        stats().coalesce(1).write.mode("overwrite").parquet(side)
        return
    pw = postings.withColumn("_batch", F.lit(int(batch_id))).write
    if overwrite_all:
        pw = pw.mode("overwrite")
    else:
        pw = pw.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        )
    pw.partitionBy("bucket", "_batch").parquet(path)
    sw = (
        stats().withColumn("_batch", F.lit(int(batch_id)))
        .coalesce(1)
        .write
    )
    if overwrite_all:
        sw = sw.mode("overwrite")
    else:
        sw = sw.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        )
    sw.partitionBy("_batch").parquet(side)


def build_text_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    n_buckets: int = 64,
    batch_id: int | None = None,
    doc_meta: tuple = (),
) -> None:
    """Persist an INVERTED INDEX over a document corpus: posting rows
    (term, doc_id, tf, dl) partitioned by a term-hash bucket, plus a
    ``_corpus_stats`` sidecar of mergeable integer partials
    (n_docs, sum_dl) — the textual sibling of
    quantize.build_ivfpq_index's layout.  At 100 TB the corpus is
    scanned ONCE here; every later retrieval reads only the query
    terms' bucket directories (partition pruning) instead of
    re-tokenizing the corpus the way ad-hoc ``bm25_scores`` must.

    Buckets use an md5-prefix hash computed identically in SQL (build)
    and Python (query-time pruning).  Doc frequencies are NOT stored —
    they are derivable at query time from the query terms' own postings
    (a groupBy over the pruned scan), which keeps appends cheap: new
    postings land in their buckets, a new stats partial is appended,
    and df stays automatically consistent.  NULL-text docs are excluded
    from the collection entirely (N and avg_dl), matching bm25_scores.
    ``batch_id`` selects the streaming layout (see _write_text_parts).

    ``doc_meta`` names metadata columns (lang, source, quality, …)
    stored once per doc in a ``_doc_meta`` sidecar — search can then
    POST-FILTER results by a metadata predicate (the quantize
    ``metadata=`` twin; see ``search_text_index(where=…)``) without
    touching any other table.  One sidecar row per doc, not per
    posting, so the overhead is |docs|, not |postings|.
    """
    from pyspark.sql import Observation

    df = df.filter(F.col(text_col).isNotNull())
    obs = Observation()
    _write_text_parts(
        _postings_of(df, id_col, text_col, n_buckets, obs=obs),
        lambda: _stats_row(df.sparkSession, obs, n_buckets),
        path,
        batch_id,
        overwrite_all=True,
    )
    if doc_meta:
        meta = df.selectExpr(f"{id_col} AS doc_id", *doc_meta)
        meta_dir = path.rstrip("/") + "/_doc_meta"
        if batch_id is None:
            meta.write.mode("overwrite").parquet(meta_dir)
        else:
            # streaming layout: meta rows under (_batch) like postings,
            # so replayed builds/appends rewrite their own partition —
            # the two layouts cannot mix under one path (same rule as
            # _write_text_parts)
            (
                meta.withColumn("_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .partitionBy("_batch")
                .parquet(meta_dir)
            )


def append_to_text_index(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    batch_id: int | None = None,
) -> None:
    """Add documents to a :func:`build_text_index` layout without
    rebuilding: new postings append into their term buckets (linear in
    the batch) and the batch's own stats PARTIAL row is appended — no
    read-modify-write of the sidecar, so concurrent/replayed appends
    can't corrupt the collection stats.  Doc frequencies need no
    maintenance (retrieval derives them from postings).  Blind to
    duplicate doc ids (the append_to_ivfpq_index contract); dedup
    upstream.  ``batch_id`` (streaming): postings land under
    ``(bucket, _batch)`` and the stats partial under ``_batch`` with
    dynamic overwrite, so an at-least-once replay rewrites itself.

    Batch appends (batch_id=None) are STRUCTURALLY idempotent: the
    batch's identity is a content digest of its (id, text) rows, every
    file it emits carries that digest in its name, and the commit
    sweeps any prior partial attempt of the same digest before an
    atomic-rename move (sinks.idempotent_append).  A crash at ANY
    point — mid-postings, between postings and the stats partial —
    followed by a retry converges to exactly one copy; so does a
    retry after an unacknowledged success.  Local-filesystem layouts
    only (the compact_partitions rename rule); object-store ingest
    should use the ``batch_id`` streaming layout."""
    from snowav_spark import sinks

    spark = df.sparkSession
    side = path.rstrip("/") + "/_corpus_stats"
    # bucket count from the sidecar so appends can't fork the layout
    n_buckets = int(spark.read.parquet(side).collect()[0].n_buckets)
    df = df.filter(F.col(text_col).isNotNull())
    digest = (
        sinks.content_digest(df, id_col, text_col)
        if batch_id is None
        else None
    )
    # metadata-carrying index: the batch's sidecar rows land with the
    # SAME columns the build declared (schema read from the sidecar) —
    # a metadata-less append against a meta-carrying index would leave
    # NULL-filtered docs invisible to filtered search.  Written BEFORE
    # the postings (a crash in between leaves orphan meta rows, which
    # filtered search merely ignores; the reverse order would leave
    # postings whose docs are PERMANENTLY invisible to every where=
    # filter, with no retry path recreating them), and under a _batch
    # dynamic-overwrite partition when batch_id is given so at-least-
    # once replays rewrite their own meta rows instead of duplicating.
    from snowav_spark.io import hadoop_path_exists

    meta_dir = path.rstrip("/") + "/_doc_meta"
    if hadoop_path_exists(spark, meta_dir):
        meta_cols = [
            c
            for c in spark.read.parquet(meta_dir).columns
            if c not in ("doc_id", "_batch")
        ]
        meta = df.selectExpr(f"{id_col} AS doc_id", *meta_cols)
        if batch_id is None:
            sinks.idempotent_append(meta, meta_dir, digest)
        else:
            (
                meta.withColumn("_batch", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("_batch")
                .parquet(meta_dir)
            )
    from pyspark.sql import Observation

    obs = Observation()
    _write_text_parts(
        _postings_of(df, id_col, text_col, n_buckets, obs=obs),
        lambda: _stats_row(spark, obs, n_buckets),
        path,
        batch_id,
        overwrite_all=False,
        digest=digest,
    )


def _read_text_tombstones(spark, path: str):
    """The index's ``_tombstones`` sidecar as a (doc_id) frame, or None
    if no delete has ever run (the sidecar directory does not exist)."""
    from snowav_spark.io import hadoop_path_exists

    tomb = path.rstrip("/") + "/_tombstones"
    if not hadoop_path_exists(spark, tomb):
        return None
    return spark.read.parquet(tomb)


def delete_from_text_index(spark, path: str, doc_ids) -> int:
    """Tombstone documents in a :func:`build_text_index` layout — the
    takedown / re-dedup eviction path (SURVEY §2.6 lifecycle; no
    reference analog — the public pattern is Delta/Iceberg delete
    files).  Postings are NEVER rewritten here: deletes append the ids
    to a ``_tombstones`` sidecar that :func:`search_text_index`
    anti-joins against, and :func:`compact_text_index` later folds away
    physically.  ``doc_ids`` is a list of ids or a 1-column DataFrame.

    Exactness: search after delete equals a fresh rebuild on the
    surviving corpus — a NEGATIVE stats partial (−n_docs, −sum_dl,
    recovered from the docs' own postings) is appended next to the
    positive ones, so avg_dl/n_docs stay exact, and doc frequencies
    already derive from (anti-joined) postings.  Cost: one postings
    scan per delete BATCH (doc_id is not the partition key) — batch
    takedowns, don't loop.  Idempotent: already-tombstoned ids are
    skipped (no double subtraction); ids absent from the index are
    ignored (they may legitimately be appended later).  Write order is
    tombstones THEN stats — a crash between the two leaves deleted docs
    excluded but stats stale-high until compaction (conservative),
    never a double-subtract.  A tombstoned id stays suppressed even if
    re-appended; compact first to truly re-add.  Returns the number of
    newly tombstoned documents."""
    if not isinstance(doc_ids, DataFrame):
        doc_ids = spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id long"
        )
    ids = doc_ids.selectExpr("CAST(doc_id AS LONG) AS doc_id").distinct()
    existing = _read_text_tombstones(spark, path)
    if existing is not None:
        ids = ids.join(existing, "doc_id", "left_anti")
    # per-doc length from the docs' own postings (dl rides on every
    # posting row) — also restricts the tombstones to ids actually
    # present, so an absent id can't suppress a future append
    per_doc = (
        spark.read.parquet(path)
        .join(F.broadcast(ids), "doc_id")
        .groupBy("doc_id")
        .agg(F.first("dl").alias("dl"))
        .persist()
    )
    try:
        n = per_doc.count()
        if n == 0:
            return 0
        per_doc.select("doc_id").coalesce(1).write.mode("append").parquet(
            path.rstrip("/") + "/_tombstones"
        )
        side = path.rstrip("/") + "/_corpus_stats"
        n_buckets = int(
            spark.read.parquet(side).select("n_buckets").first()[0]
        )
        neg = per_doc.agg(
            (-F.count("*")).cast("long").alias("n_docs"),
            (-F.sum("dl")).cast("long").alias("sum_dl"),
            F.lit(n_buckets).cast("int").alias("n_buckets"),
        )
        neg.coalesce(1).write.mode("append").parquet(side)
    finally:
        per_doc.unpersist()
    return n


def search_text_index(
    spark,
    path: str,
    query_terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    where: str | None = None,
) -> DataFrame:
    """BM25 top-k against a :func:`build_text_index` layout, reading
    ONLY the query terms' bucket directories: bucket ids are computed
    driver-side with the same md5-prefix hash the build used, so the
    scan carries ``bucket IN (…)`` as a PARTITION filter at any corpus
    size.  Doc frequencies come from the pruned postings themselves
    (one groupBy over query-term rows); the scoring formula — including
    the ``round(…, 6)`` — is bm25_scores', so a full-corpus ad-hoc run
    and an index run return identical scores (pinned in tests).
    Output: (doc_id, bm25) by score desc, doc_id asc.

    ``where`` (metadata-filtered retrieval): a SQL predicate over the
    ``_doc_meta`` sidecar columns the index was built with
    (``build_text_index(doc_meta=…)``).  POST-FILTER semantics — df and
    avg_dl stay collection-level, so a doc's score is identical whether
    or not a filter is applied (the semantics an exact SQL twin can
    state); the predicate is pushed into the |docs|-row sidecar scan
    and the surviving ids semi-join the scored frame before top-k.
    Raises if the index carries no ``_doc_meta`` sidecar."""
    # merge the sidecar's integer partials: exact at any order/batching,
    # and sum/count equals the ad-hoc scorer's avg(dl) bit-for-bit
    # (double summation of integers below 2^53 is exact)
    raw = spark.read.parquet(path.rstrip("/") + "/_corpus_stats")
    qt = sorted({w.lower() for w in query_terms})
    n_buckets = int(raw.collect()[0].n_buckets)
    buckets = sorted({_term_bucket_py(t, n_buckets) for t in qt})
    side = raw.agg(
        F.sum("n_docs").cast("double").alias("n_docs"),
        (
            F.sum("sum_dl").cast("double")
            / F.sum("n_docs").cast("double")
        ).alias("avg_dl"),
    )
    # explicit bucket-directory paths: listing cost is O(|query terms|)
    # directories, not O(n_buckets) — with buckets ∝ corpus the root
    # read's full-tree listing was the only search-time term that grew
    # with N (io.read_pruned_partitions; SCALE.md round 11)
    from snowav_spark.io import read_pruned_partitions

    cand = read_pruned_partitions(spark, path, "bucket", buckets).filter(
        F.col("bucket").isin(buckets) & F.col("term").isin(qt)
    )
    # deleted docs: anti-join the tombstone sidecar BEFORE df/scoring —
    # with the negative stats partials this makes post-delete search
    # EQUAL a rebuild on the surviving corpus (pinned in tests).  Join
    # strategy left to AQE: takedown sets are usually broadcast-small,
    # but a policy-change purge can be arbitrarily large.
    tomb = _read_text_tombstones(spark, path)
    if tomb is not None:
        cand = cand.join(tomb, "doc_id", "left_anti")
    doc_freq = cand.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term_score = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avg_dl")))
    )
    scored = (
        cand.join(F.broadcast(doc_freq), "term")
        .crossJoin(F.broadcast(side))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term_score), 6).alias("bm25"))
    )
    if where is not None:
        from snowav_spark.io import hadoop_path_exists

        meta_dir = path.rstrip("/") + "/_doc_meta"
        if not hadoop_path_exists(spark, meta_dir):
            raise ValueError(
                "search_text_index(where=...) needs an index built with "
                "doc_meta=(...): no _doc_meta sidecar at " + meta_dir
            )
        keep = (
            spark.read.parquet(meta_dir).filter(where).select("doc_id")
        )
        scored = scored.join(keep, "doc_id", "left_semi")
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)


def rrf_fuse(
    inputs: list,
    id_col: str = "doc_id",
    k_rrf: int = 60,
    depth: int = 100,
    k_out: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of scored candidate lists — the standard
    hybrid-retrieval combiner (BM25 ⊕ vector ANN):
    ``rrf(d) = Σ_lists 1 / (k_rrf + rank_list(d))``, missing entries
    contribute nothing.  ``inputs`` is a list of (DataFrame, score_col)
    pairs, each frame carrying (id_col, score_col).

    Rank-based fusion needs no score calibration across systems — only
    the ORDER of each list matters, so the fusion is deterministic as
    long as each ranking is (scores rounded before ranking, ties on id
    — the cosine_topk/bm25 convention).  Scale: each list is truncated
    to ``depth`` by TakeOrdered (sort-free), so the row_number window —
    though unpartitioned — runs over ≤depth rows by construction
    (domain-bounded, the plan-audit whitelist rule); the union and the
    ≤2·depth-row fusion aggregate are driver-trivial at any corpus
    size.  The heavy lifting stays in the upstream retrievers, which is
    the point: fuse AFTER each system's own pruned top-k."""
    from pyspark.sql.window import Window

    fused = None
    for df, score in inputs:
        top = df.orderBy(F.desc(score), F.asc(id_col)).limit(depth)
        w = Window.orderBy(F.desc(score), F.asc(id_col))
        part = top.select(
            F.col(id_col),
            (1.0 / (F.lit(k_rrf) + F.row_number().over(w))).alias("_rrf"),
        )
        fused = part if fused is None else fused.unionByName(part)
    return (
        fused.groupBy(id_col)
        .agg(F.round(F.sum("_rrf"), 6).alias("rrf"))
        .orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k_out)
    )


def compact_text_index(
    spark, path: str, target_rows_per_file: int = 1_000_000
) -> int:
    """Fold a STREAMED inverted-index layout back into the batch serving
    layout (the compact_ivfpq_index twin): postings rewritten under
    ``bucket`` alone — term-sorted again, so row-group pruning survives
    compaction — and the per-batch stats PARTIALS merged into one exact
    row (integer sums, order-free).  Run after the stream is stopped;
    batch appends work normally afterwards.  Returns the post-compaction
    postings file count."""
    from snowav_spark import sinks

    tomb = _read_text_tombstones(spark, path)

    def _fold(df):
        if "_batch" in df.columns:
            df = df.drop("_batch")
        if tomb is not None:
            # physical delete: tombstoned postings are dropped from the
            # rewrite; the stats sidecar already carries their negative
            # partials, so the merged stats row below stays exact
            df = df.join(tomb, "doc_id", "left_anti")
        return df

    n_files = sinks.compact_partitions(
        spark,
        path,
        partition_by=("bucket",),
        target_rows_per_file=target_rows_per_file,
        transform=_fold,
        sort_within=("term", "doc_id"),
    )
    side = path.rstrip("/") + "/_corpus_stats"
    merged = spark.read.parquet(side).agg(
        F.sum("n_docs").cast("long").alias("n_docs"),
        F.sum("sum_dl").cast("long").alias("sum_dl"),
        F.max("n_buckets").cast("int").alias("n_buckets"),
    )
    rows = merged.collect()  # materialize BEFORE touching the source
    # staged + rename swap, NOT an in-place overwrite: Spark's static
    # overwrite deletes the partials before committing the replacement,
    # so a crash mid-write would leave NO stats at all (search and
    # append both unrecoverable).  compact_partitions already validated
    # the path is a local directory, so os-level renames are safe here.
    import os
    import shutil

    staged = side + "._compact_staged"
    old = side + "._compact_old"
    shutil.rmtree(staged, ignore_errors=True)
    if os.path.isdir(old) and not os.path.isdir(side):
        shutil.move(old, side)  # recover a prior crash mid-swap
    shutil.rmtree(old, ignore_errors=True)
    from snowav_spark.io import local_df

    local_df(spark, rows, merged.schema).write.parquet(staged)
    shutil.move(side, old)
    shutil.move(staged, side)
    shutil.rmtree(old)
    # _doc_meta (metadata-carrying indexes): fold the streamed _batch
    # partitions flat and drop tombstoned docs' rows — lingering meta
    # is only ever semi-joined (harmless) but compaction is the moment
    # the layout is supposed to become the clean serving form.  Same
    # staged-swap discipline as the stats sidecar.
    from snowav_spark.io import hadoop_path_exists

    meta_dir = path.rstrip("/") + "/_doc_meta"
    if hadoop_path_exists(spark, meta_dir):
        meta = spark.read.parquet(meta_dir)
        if "_batch" in meta.columns:
            meta = meta.drop("_batch")
        if tomb is not None:
            meta = meta.join(tomb, "doc_id", "left_anti")
        meta = meta.localCheckpoint(eager=True)
        m_staged = meta_dir + "._compact_staged"
        m_old = meta_dir + "._compact_old"
        shutil.rmtree(m_staged, ignore_errors=True)
        if os.path.isdir(m_old) and not os.path.isdir(meta_dir):
            shutil.move(m_old, meta_dir)
        shutil.rmtree(m_old, ignore_errors=True)
        meta.coalesce(1).write.parquet(m_staged)
        shutil.move(meta_dir, m_old)
        shutil.move(m_staged, meta_dir)
        shutil.rmtree(m_old)
    # tombstones are now folded into the data (rows dropped, stats
    # merged, meta pruned) — retire the sidecar so re-appended ids are
    # live again
    shutil.rmtree(
        path.rstrip("/") + "/_tombstones", ignore_errors=True
    )
    return n_files
