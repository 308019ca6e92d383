"""Text analysis for LLM-data pipelines: tokenization, quality scoring,
language ID, fingerprinting, token-count estimation.

Everything here is built-in Spark SQL expressions (JVM-side, codegen'd) —
no Python UDFs in the hot path. Each operation has an exactly-equivalent
DuckDB formulation (see registry_ext.py) so results are oracle-checkable:
the tokenizer, ratios, and heuristics are defined to the character so both
engines compute identical values.

Scale: all per-row map work — no shuffle at all. A 100 TB documents table
streams through whole-stage-codegen at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from sparkgraft.ops.relational import fan_out

#: whitespace tokenizer on lowercased trimmed text (empty tokens dropped)
_TOKENS_SQL = "filter(split(lower(trim({col})), '\\\\s+'), t -> t != '')"

#: per-language stopword marker sets for the n-gram/stopword lang-ID heuristic
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "es"),
    "de": ("der", "die", "das", "und", "ist", "von"),
    "fr": ("le", "les", "des", "et", "est", "un"),
}

#: generic stopword set for quality scoring (english-ish)
STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"] + ("it", "for", "on", "with")


def tokens(col: str = "text") -> Column:
    """Whitespace tokens of lowercased text, empties removed."""
    return F.expr(_TOKENS_SQL.format(col=col))


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col))


def bpe_token_estimate(col: str = "text") -> Column:
    """BPE-ish token-count estimate: ~1 token per 4 chars (the standard
    heuristic for byte-pair-encoded English text)."""
    return F.ceil(F.length(F.trim(F.col(col))) / F.lit(4.0)).cast("bigint")


def _count_in_set(tokens_expr: str, words: tuple[str, ...]) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"size(filter({tokens_expr}, t -> array_contains(array({arr}), t)))"


def quality_features(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality features + a composite [0,1] score.

    - alpha_ratio: share of a-z characters
    - stopword_ratio: stopword tokens / tokens (with duplicates)
    - avg_token_len: mean token length
    - quality_score: 0.4*alpha + 0.3*min(1, n_tokens/100) + 0.3*stopword-signal
    """
    df = fan_out(df)  # scan-split fan-out: see ops.relational.fan_out
    t = _TOKENS_SQL.format(col=col)
    n_tok = f"size({t})"
    n_chars = f"length(trim({col}))"
    alpha = f"length(regexp_replace(lower(trim({col})), '[^a-z]', ''))"
    stop_hits = _count_in_set(t, STOPWORDS)
    tok_len_sum = f"aggregate({t}, 0L, (acc, x) -> acc + length(x))"
    # try_divide, not '/': an empty document (n_chars = n_tok = 0) must
    # yield NULL ratios, not an ANSI DIVIDE_BY_ZERO that kills the whole
    # job — and NULL is exactly what DuckDB's double division returns on a
    # zero denominator, so the oracle twin needs no change. On non-empty
    # documents try_divide is bit-identical to '/'.
    return df.selectExpr(
        id_col,
        f"CAST({n_tok} AS BIGINT) AS n_tokens",
        f"CAST({n_chars} AS BIGINT) AS n_chars",
        f"round(try_divide({alpha}, CAST({n_chars} AS DOUBLE)), 6) AS alpha_ratio",
        f"round(try_divide({stop_hits}, CAST({n_tok} AS DOUBLE)), 6)"
        " AS stopword_ratio",
        f"round(try_divide({tok_len_sum}, CAST({n_tok} AS DOUBLE)), 6)"
        " AS avg_token_len",
        f"round(0.4 * try_divide({alpha}, CAST({n_chars} AS DOUBLE))"
        f" + 0.3 * least(1.0, {n_tok} / 100.0)"
        f" + 0.3 * least(1.0, 3.0 * try_divide({stop_hits},"
        f" CAST({n_tok} AS DOUBLE))), 6)"
        " AS quality_score",
    )


def lang_id(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", keep: tuple[str, ...] = ()
) -> DataFrame:
    """Stopword-marker language ID: score each language by marker-token
    hits, pick the max (fixed precedence en>es>de>fr on ties, 'und' if no
    hits). Deterministic by construction. ``keep`` passes extra columns
    through (e.g. the declared lang for a confusion audit)."""
    df = fan_out(df)  # scan-split fan-out: see ops.relational.fan_out
    t = _TOKENS_SQL.format(col=col)
    scores = {k: _count_in_set(t, v) for k, v in LANG_MARKERS.items()}
    case = (
        "CASE "
        f"WHEN {scores['en']} >= {scores['es']} AND {scores['en']} >= {scores['de']}"
        f" AND {scores['en']} >= {scores['fr']} AND {scores['en']} > 0 THEN 'en' "
        f"WHEN {scores['es']} >= {scores['de']} AND {scores['es']} >= {scores['fr']}"
        f" AND {scores['es']} > 0 THEN 'es' "
        f"WHEN {scores['de']} >= {scores['fr']} AND {scores['de']} > 0 THEN 'de' "
        f"WHEN {scores['fr']} > 0 THEN 'fr' "
        "ELSE 'und' END"
    )
    return df.selectExpr(id_col, *keep, f"{case} AS lang_pred")


def normalize_text(col: str = "text") -> Column:
    """Canonical form for fingerprinting: lowercase, collapse whitespace."""
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def fingerprint(col: str = "text") -> Column:
    """128-bit content fingerprint of the normalized text (md5 hex)."""
    return F.md5(normalize_text(col))


#: PII patterns — a Java-regex/RE2 common-subset so Spark and DuckDB find
#: byte-identical matches (no backrefs, no lookaround, plain classes only)
PII_PATTERNS: dict[str, tuple[str, str]] = {
    # (pattern, replacement-tag), applied in this order
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    "ipv4": (r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    "phone": (r"\+?\d{3}[- ]\d{3,4}[- ]\d{4}\b", "<PHONE>"),
}


def pii_scrub(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """PII redaction — the pre-training scrub pass every corpus pipeline
    runs before tokenization: emails, IPv4 addresses, and phone-shaped
    digit runs are replaced with typed tags, and per-category match counts
    are emitted for audit dashboards.

    Counts are measured on the ORIGINAL text: each ``n_<category>`` is the
    number of pattern occurrences BEFORE any substitution, while tags are
    substituted sequentially in the fixed PII_PATTERNS order.  Categories
    can overlap (an IPv4-shaped local part in ``1.2.3.4@example.com``
    increments both ``n_email`` and ``n_ipv4`` yet the scrub emits only
    ``<EMAIL>``), so audit counts are per-pattern match counts, not tag
    counts — the sum of ``n_*`` may exceed the tags visible in
    ``scrubbed``.  The DuckDB oracle mirrors the same convention.

    Scale: pure per-row regexp map work, zero shuffle, fully codegen'd —
    identical posture to quality_features. The regexes are written in the
    Java-regex/RE2 common subset so the DuckDB oracle matches byte-for-byte.
    """
    df = fan_out(df)  # scan-split fan-out: see ops.relational.fan_out
    scrubbed = F.col(col)
    counts = []
    for name, (pat, tag) in PII_PATTERNS.items():
        counts.append(
            F.regexp_count(F.col(col), F.lit(pat)).cast("bigint").alias(f"n_{name}")
        )
        scrubbed = F.regexp_replace(scrubbed, pat, tag)
    return df.select(F.col(id_col), *counts, scrubbed.alias("scrubbed"))


def unigram_logprob(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """CCNet-style unigram LM quality score: mean per-token negative log
    probability under the corpus's own unigram distribution. Low scores =
    common/fluent text; high scores = rare-token gibberish. The standard
    cheap perplexity proxy for corpus filtering.

    Per doc: ``lm_score = avg_t( -ln( count(t) / total_tokens ) )`` over
    the doc's tokens (with duplicates), rounded to 6 places.

    Cross-engine parity design: each per-token logprob is rounded to 6
    decimals and cast to DECIMAL(28,8) BEFORE the per-doc sum, so the
    aggregate is an exact decimal sum (shuffle-order-invariant) and any
    sub-ulp ln() divergence between the JVM and libm is absorbed by the
    pre-round. The count/total division is a single IEEE double op —
    bit-identical in both engines.

    Scale: one explode (corpus tokens), one groupBy(token) for the vocab
    (vocabulary-sized output — sublinear in corpus), one join back on
    token (vocab side is the small side — AQE broadcasts it), one
    groupBy(doc) for the final score. Two shuffles total, both on keys
    with natural partial aggregation; no window, no driver materialization.
    """
    df = fan_out(df)  # scan-split fan-out: see ops.relational.fan_out
    toks = df.select(F.col(id_col), F.explode(tokens(col)).alias("tok"))
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").cast("double").alias("total"))
    scored = (
        toks.join(vocab, "tok")
        .crossJoin(F.broadcast(total))
        .select(
            F.col(id_col),
            F.round(-F.log(F.col("cnt").cast("double") / F.col("total")), 6)
            .cast("decimal(28,8)")
            .alias("nlp"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            # cast the exact decimal sum to double BEFORE dividing: decimal
            # division scale rules differ across engines, double division
            # is IEEE exact-rounded and bit-identical
            F.round(F.sum("nlp").cast("double") / F.count("*"), 6).alias("lm_score"),
        )
    )


def gopher_repetition(
    df: DataFrame, col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style duplicate n-gram repetition signals (the published
    quality-filter family: fraction of n-gram occurrences that repeat an
    already-seen n-gram) for n = 2 and 3 — catches looping/boilerplate
    generations whose UNIGRAM stats look healthy (repetition_stats covers
    n = 1).

    ``dup_{n}gram_ratio = (count - distinct) / count`` over the doc's
    n-gram multiset; docs with < n tokens collapse to one degenerate
    shingle (ratio 0). Pure per-row array expressions — the shingle list
    is built with the same expression the dedup lane uses
    (ext/dedup.shingle_expr), zero shuffle, fully codegen'd.
    """
    df = fan_out(df)  # scan-split fan-out: see ops.relational.fan_out
    from sparkgraft.ext.dedup import shingle_expr

    toked = df.select(F.col(id_col), tokens(col).alias("__t"))
    cols = [F.col(id_col)]
    for n in (2, 3):
        s = shingle_expr("__t", n)
        cols.append(F.expr(f"CAST(size({s}) AS BIGINT)").alias(f"n_{n}grams"))
        # try_divide: an empty doc has ZERO shingles (shingle_expr's
        # zero-token branch) -> 0/0 must be NULL, not an ANSI error;
        # DuckDB's double division is NULL on zero already
        cols.append(
            F.expr(
                f"round(try_divide(size({s}) - size(array_distinct({s})),"
                f" CAST(size({s}) AS DOUBLE)), 6)"
            ).alias(f"dup_{n}gram_ratio")
        )
    return toked.select(*cols)


def bigram_logprob(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Bigram LM quality score: mean ``-ln P(tok_i | tok_{i-1})`` under the
    corpus's OWN bigram distribution — the next-quality-rung above
    :func:`unigram_logprob` (catches locally-plausible-tokens/implausible-
    sequences text that a unigram model scores as fluent).

    ``P(b|a) = c(a,b) / c(a,·)`` where ``c(a,·)`` sums bigram counts over
    the context token — every observed bigram therefore has ``p > 0``; no
    smoothing needed for self-scoring. Docs with fewer than two tokens have
    no bigrams and drop out (same on both engines).

    Cross-engine parity mirrors unigram_logprob: per-pair logprob rounded
    to 6 decimals and cast to DECIMAL(28,8) BEFORE the per-doc sum; the
    count division is one IEEE double op.

    Scale: bigram PAIRS are built row-wise from the token array
    (``transform`` over a slice with the lambda index — codegen, no
    shuffle for pair construction), then one explode + groupBy(a, b) for
    counts (bounded by observed-bigram vocabulary — sublinear in corpus),
    a derived groupBy(a) for contexts, joins back (count relations are the
    small sides — AQE broadcasts), one groupBy(doc) for the score.
    """
    df = fan_out(df)  # scan-split fan-out: see ops.relational.fan_out
    toked = df.select(F.col(id_col), tokens(col).alias("__t")).where(
        F.size("__t") >= 2
    )
    pairs = toked.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(slice(__t, 1, size(__t) - 1),"
                " (x, i) -> struct(x AS a, __t[i + 1] AS b))"
            )
        ).alias("p"),
    ).select(id_col, F.col("p.a").alias("a"), F.col("p.b").alias("b"))
    c_ab = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c_ab"))
    c_a = c_ab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    scored = (
        pairs.join(c_ab, ["a", "b"])
        .join(c_a, ["a"])
        .select(
            F.col(id_col),
            F.round(
                -F.log(F.col("c_ab").cast("double") / F.col("c_a").cast("double")), 6
            )
            .cast("decimal(28,8)")
            .alias("nlp"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("*").cast("bigint").alias("n_bigrams"),
        F.round(F.sum("nlp").cast("double") / F.count("*"), 6).alias("lm2_score"),
    )


def repetition_stats(df: DataFrame, col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Within-doc repetition signals — the boilerplate/degenerate-text
    filter every quality pipeline runs (low distinct-token ratio flags
    keyword-stuffed or looping generations):

    - ``n_tokens`` / ``n_distinct``: total and distinct token counts
    - ``rep_ratio``: 1 - distinct/total (0 = no repetition), rounded
    - ``top_token_share``: frequency share of the single most frequent
      token, doc-locally (max count / total), rounded

    Pure per-row array expressions — zero shuffle, fully codegen'd: the
    token array is built once per row and all four signals derive from it
    (aggregate over array_distinct for the mode count). Empty docs emit
    0-token rows with 0.0 ratios rather than nulls.
    """
    df = fan_out(df)  # scan-split fan-out: see ops.relational.fan_out
    toks = tokens(col)
    n_tok = F.size(toks)
    n_dis = F.size(F.array_distinct(toks))
    # count of the most frequent token: for each distinct token, count its
    # occurrences in the full array; take the max — O(distinct * n) per
    # row, bounded by doc length, no shuffle
    top_cnt = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    return df.select(
        F.col(id_col),
        n_tok.cast("bigint").alias("n_tokens"),
        n_dis.cast("bigint").alias("n_distinct"),
        F.when(n_tok > 0, F.round(1 - n_dis / n_tok, 6))
        .otherwise(F.lit(0.0))
        .alias("rep_ratio"),
        F.when(n_tok > 0, F.round(top_cnt / n_tok, 6))
        .otherwise(F.lit(0.0))
        .alias("top_token_share"),
    )


def bm25_scores(
    df: DataFrame,
    terms: tuple[str, ...],
    k1: float = 1.2,
    b: float = 0.75,
    col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 20,
) -> DataFrame:
    """BM25 keyword retrieval over the corpus — the standard lexical search
    scorer (Robertson/Sparck-Jones):

        score(d) = sum_t idf(t) * tf(t,d)*(k1+1) /
                               (tf(t,d) + k1*(1 - b + b*dl/avgdl))
        idf(t)   = ln((N - df + 0.5)/(df + 0.5) + 1)

    Cross-engine parity design: idf is rounded to 6 decimals before use
    (absorbs any JVM-vs-libm ln() ulp), every other step is integer counts
    and single IEEE ops, and the final score sums the per-term products in
    FIXED expression order (no aggregate over floats anywhere) — so the
    whole path is bit-identical in any engine.

    Scale: term frequencies filter to the query terms BEFORE grouping
    (the per-(doc,term) relation is |matching docs| x |terms|, not corpus
    tokens); doc lengths are one groupBy; global stats and per-term dfs
    collapse to broadcast one-row relations; ranking is TakeOrdered top-k,
    not a global sort.
    """
    if not terms:
        raise ValueError("bm25_scores requires at least one query term")
    toks = df.select(F.col(id_col), F.explode(tokens(col)).alias("tok"))
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    stats = dl.agg(
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
        F.count("*").alias("n_docs"),
    )
    tf = (
        toks.where(F.col("tok").isin(*terms))
        .groupBy(id_col, "tok")
        .agg(F.count("*").alias("tf"))
    )
    dft = tf.groupBy("tok").agg(F.count("*").alias("df"))
    tf_piv = tf.groupBy(id_col).agg(
        *[
            F.max(F.when(F.col("tok") == t, F.col("tf"))).alias(f"tf_{i}")
            for i, t in enumerate(terms)
        ]
    )
    df_row = dft.agg(
        *[
            F.max(F.when(F.col("tok") == t, F.col("df"))).alias(f"df_{i}")
            for i, t in enumerate(terms)
        ]
    )
    joined = (
        tf_piv.join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(df_row))
    )
    parts = []
    for i in range(len(terms)):
        tf_i = f"CAST(coalesce(tf_{i}, 0) AS DOUBLE)"
        df_i = f"CAST(coalesce(df_{i}, 0) AS DOUBLE)"
        idf = f"round(ln((n_docs - {df_i} + 0.5) / ({df_i} + 0.5) + 1), 6)"
        tfn = (
            f"{tf_i} * {k1 + 1} / ({tf_i} + {k1} * (1 - {b} + {b} *"
            f" CAST(dl AS DOUBLE) / avgdl))"
        )
        parts.append(f"{idf} * {tfn}")
    score = "round(" + " + ".join(parts) + ", 6)"
    return (
        joined.select(F.col(id_col), F.expr(score).alias("bm25"))
        .orderBy(F.col("bm25").desc(), F.col(id_col))
        .limit(top_k)
    )


# ---------------------------------------------------------------------------
# Hashed linear quality classifier (fastText-style)
# ---------------------------------------------------------------------------

#: hashed feature-space width for the linear classifier (power of two so the
#: bucket is a cheap mask-equivalent pmod)
HASHED_DIM = 64


def hashed_weights(dim: int = HASHED_DIM) -> list[int]:
    """Deterministic integer weight table for the hashed linear classifier.

    w_b = md5("w:b")[:15 hex] mod 2001 - 1000 — integer MILLI-units in
    [-1000, 1000]. Computed with hashlib here and embedded as an array
    literal in both the Spark plan and the DuckDB oracle, so the "model"
    is identical in both engines (stand-in for real trained weights, which
    would be broadcast the same way).
    """
    import hashlib

    return [
        int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:15], 16) % 2001 - 1000
        for b in range(dim)
    ]


def linear_classifier(
    df: DataFrame, col: str = "text", id_col: str = "doc_id", dim: int = HASHED_DIM
) -> DataFrame:
    """CCNet/fastText-style linear quality scorer over hashed bag-of-words.

    Each token hashes to one of ``dim`` buckets (md5-based 64-bit hash —
    the engine-portable HASH64 used across the dedup lane); the document
    score is the mean bucket weight. Weights are integer milli-units so the
    sum is EXACT (order-free) — the float division + round happens once at
    the end, and the keep decision compares the exact integer sum to zero.

    Output: (doc_id, n_tokens, score, keep). Scale: pure per-row map work
    (transform + aggregate over the token array, weight table inlined as a
    64-element literal) — whole-stage codegen, zero shuffle; a real model
    with 1M buckets would swap the literal for a broadcast map lookup.
    """
    w = hashed_weights(dim)
    arr = ", ".join(str(x) for x in w)
    tks = _TOKENS_SQL.format(col=col)
    from sparkgraft.ext.dedup import HASH64_SQL  # local: text<->dedup import cycle

    bucket = f"CAST(pmod({HASH64_SQL.format(x='t')}, {dim}) AS INT)"
    milli_sum = (
        f"aggregate(transform({tks}, t -> element_at(array({arr}), {bucket} + 1)),"
        " CAST(0 AS BIGINT), (acc, x) -> acc + CAST(x AS BIGINT))"
    )
    return df.select(
        F.col(id_col),
        F.expr(f"size({tks})").cast("bigint").alias("n_tokens"),
        F.expr(
            f"CASE WHEN size({tks}) = 0 THEN CAST(0.0 AS DOUBLE)"
            f" ELSE round({milli_sum} / (1000.0 * size({tks})), 6) END"
        ).alias("score"),
        # coalesce: NULL text must be keep=false, not keep=NULL — absent
        # content is not keepable, and the DuckDB twin already collapses
        # to false via three-valued `NULL AND false`
        F.expr(f"coalesce(size({tks}) > 0 AND {milli_sum} > 0, false)").alias(
            "keep"
        ),
    )
