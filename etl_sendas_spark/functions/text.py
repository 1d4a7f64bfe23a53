"""Text-analysis scalar library for training-data pipelines.

These are the per-document features a 100 TB corpus pipeline computes
before filtering/dedup: token counts, quality heuristics, language id,
and fingerprints. All pure Column expressions (JVM, codegen'd) so they
run at scan speed — no Python in the hot path.

Where a DuckDB oracle needs identical arithmetic, the building blocks
are chosen to exist in both engines (regexp_replace / length / md5).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, functions as F

# A small English/Spanish stopword panel for the n-gram-free lang-id
# heuristic; counts of hits per language decide the label.
_EN_STOP = ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"]
_ES_STOP = ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"]

_WORD_RE = r"[^ ]+"


def _panel_hits(norm: Column, words: list[str]) -> Column:
    """Count tokens of single-space-normalized ``norm`` that are in
    ``words`` — as ONE ``regexp_count`` instead of
    ``size(filter(split(norm, ' '), t -> t.isin(...)))``.

    Equivalent by construction: tokens are the non-space runs of the
    normalized form, the leading ``(?:^| )`` anchors each match to a
    token start, and the trailing lookahead ``(?= |$)`` requires the
    token end WITHOUT consuming the separator, so adjacent stopwords
    all count ("de de de" → 3). Java regex alternation backtracks, so
    prefix-shadowing pairs (de/del) resolve on the boundary lookahead.
    The HOF formulation is CodegenFallback: inside a pushed-down filter
    its interpreted tree re-evaluates the embedded normalization per
    use with no CSE (guide §4.1; r12 measured the regexp gate at 0.37 s
    vs 0.53 s, hash-equal). Empty/normalized-away docs: no match = 0,
    same as filtering the [""] token list.
    """
    pat = "(?:^| )(?:" + "|".join(words) + ")(?= |$)"
    return F.regexp_count(norm, F.lit(pat))


def normalized_text(col: Column | str) -> Column:
    """Lowercase, strip non-alphanumerics to single spaces, trim.

    The canonical form used by every dedup flavor (exact, minhash,
    simhash, n-gram) so near-dup decisions ignore punctuation/case.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"[^a-z0-9]+", " "))


def token_count(col: Column | str) -> Column:
    """Whitespace token count over normalized text (0 for empty)."""
    norm = normalized_text(col)
    return F.when(norm == "", F.lit(0)).otherwise(
        F.size(F.split(norm, " "))
    ).cast("long")


def quality_features(col: Column | str) -> dict[str, Column]:
    """Document quality heuristics: length, punctuation ratio, stopword
    ratio, mean word length — the standard pre-filter features."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c).cast("double")
    n_punct = (n_chars - F.length(F.regexp_replace(c, r"[^\w\s]", ""))).cast("double")
    norm = normalized_text(c)
    n_tokens = token_count(c).cast("double")
    stop_hits = _panel_hits(norm, _EN_STOP + _ES_STOP).cast("double")
    safe_tokens = F.when(n_tokens > 0, n_tokens).otherwise(F.lit(None))
    safe_chars = F.when(n_chars > 0, n_chars).otherwise(F.lit(None))
    return {
        "n_chars": n_chars.cast("long"),
        "n_tokens": n_tokens.cast("long"),
        "punct_ratio": F.round(F.coalesce(n_punct / safe_chars, F.lit(0.0)), 6),
        "stopword_ratio": F.round(F.coalesce(stop_hits / safe_tokens, F.lit(0.0)), 6),
        "mean_word_len": F.round(
            F.coalesce(F.length(F.replace(norm, F.lit(" "), F.lit(""))) / safe_tokens, F.lit(0.0)), 6
        ),
    }


def lang_id(col: Column | str) -> Column:
    """Stopword-panel language id: 'en' / 'es' / 'unknown'.

    A real pipeline would swap in fastText/CLD3 via mapInPandas; the
    heuristic keeps the operator JVM-side and deterministic, which is
    what matters for the engine (the model is a plug-in).
    """
    # token-HOF form kept on purpose (r13 A/B): lang_id is consumed as
    # a PROJECTION column, not inside pushed-down filters, so the
    # interpreted-HOF re-evaluation bomb `_panel_hits` exists to dodge
    # never fires here — and the regexp_count formulation (two extra
    # full-text scans with a 10-way alternation) measured
    # corpus_prep_pipeline SLOWER (1.32 → 1.56-1.68 s interleaved).
    toks = F.split(normalized_text(col), " ")
    en = F.size(F.filter(toks, lambda t: t.isin(*_EN_STOP)))
    es = F.size(F.filter(toks, lambda t: t.isin(*_ES_STOP)))
    c = F.col(col) if isinstance(col, str) else col
    return (
        # NULL text first: size(NULL array) is -1 under legacy sizeOfNull,
        # which would otherwise fall through the en/es comparisons
        F.when(c.isNull(), F.lit("unknown"))
        .when((en == 0) & (es == 0), F.lit("unknown"))
        .when(en >= es, F.lit("en"))
        .otherwise(F.lit("es"))
    )


# PII patterns deliberately restricted to syntax with identical semantics
# in Java regex (Spark) and RE2 (DuckDB): character classes, bounded
# repetition, \b — no lookaround, no backreferences. Order matters only
# for overlapping shapes; these three are mutually exclusive.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
]


def pii_redact(col: Column | str) -> Column:
    """Replace email / SSN-shaped / phone-shaped spans with typed tags.

    One chained ``regexp_replace`` per pattern — pure JVM expressions,
    so redaction runs at scan speed over a 100 TB corpus with no Python
    and no shuffle. Spark's regexp_replace is global by default (the
    DuckDB mirror needs the explicit ``'g'`` flag).
    """
    c = F.col(col) if isinstance(col, str) else col
    for _name, pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return c


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-document hit count for each PII pattern (audit columns)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pat)).cast("long")
        for name, pat, _tag in PII_PATTERNS
    }


def repeated_ngram_ratio(col: Column | str, n: int) -> Column:
    """Fraction of duplicated word n-grams in a document (0.0 if fewer
    than ``n`` tokens) — the Gopher-style repetition quality signal.

    1 - distinct_ngrams/total_ngrams over normalized tokens, built from
    array expressions with no explode and no shuffle. Rounded to 6
    places to pin cross-engine float equality.

    Built from ``zip_with`` over shifted slices, NOT
    ``transform(sequence(...), i -> concat_ws(toks[i], toks[i+1]))``:
    higher-order functions are CodegenFallback, and in the interpreted
    path a lambda that indexes the OUTER ``toks`` expression tree
    re-evaluates it — the full-document regex normalization + split —
    for every gram element (~2k extra regex passes per k-token doc;
    r12 measured 30.6 s for a 5000-doc filter at sf0.1 against 0.36 s
    after this rewrite). ``zip_with`` lambdas touch only their lambda
    variables, so each slice is evaluated once per row.
    """
    toks = F.split(normalized_text(col), " ")
    k = F.size(toks)

    def _grams() -> Column:
        # parts[j] = toks[j .. j+k-n] (0-based); index-aligned zip_with
        # concatenation yields exactly transform's gram list
        parts = [F.slice(toks, j + 1, k - (n - 1)) for j in range(n)]
        g = parts[0]
        for p in parts[1:]:
            g = F.zip_with(g, p, lambda a, b: F.concat_ws(" ", a, b))
        return g

    grams = F.when(k >= n, _grams()).otherwise(
        F.array().cast("array<string>")
    )
    total = F.size(grams).cast("double")
    return F.round(
        F.when(
            total > 0,
            F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / total,
        ).otherwise(F.lit(0.0)),
        6,
    )


# Linear quality model over the heuristic features. The weights are a
# stand-in for a trained classifier (fastText/logreg distilled to a
# linear scorer) — the *engine* contract is the feature plumbing and the
# IEEE-exact arithmetic, with the weight vector as plug-in data. Every
# term uses only correctly-rounded IEEE ops (sqrt, *, +) in a fixed
# left-to-right order, so a DuckDB oracle reproduces the logit
# bit-for-bit — which is why the scorer is a logit + threshold rather
# than a sigmoid (libm exp() is not cross-engine reproducible).
QUALITY_MODEL_WEIGHTS: dict[str, float] = {
    "bias": -2.0,
    "sqrt_tokens": 0.35,       # longer docs are likelier keepers, concave
    "punct_ratio": -6.0,       # symbol soup
    "stopword_ratio": 8.0,     # natural prose has function words
    "mean_word_len": 0.05,
    "repeated_2gram_ratio": -5.0,  # boilerplate / spam repetition
}


def quality_logit(col: Column | str) -> Column:
    """Model-based quality score (pre-sigmoid logit), rounded to 6
    places; ``keep`` decision is ``logit >= 0``. One pure-Column pass —
    at 100 TB this scores at scan speed and the filter pushes down."""
    q = quality_features(col)
    w = QUALITY_MODEL_WEIGHTS
    z = (
        F.lit(w["bias"])
        + F.lit(w["sqrt_tokens"]) * F.sqrt(q["n_tokens"].cast("double"))
        + F.lit(w["punct_ratio"]) * q["punct_ratio"]
        + F.lit(w["stopword_ratio"]) * q["stopword_ratio"]
        + F.lit(w["mean_word_len"]) * q["mean_word_len"]
        + F.lit(w["repeated_2gram_ratio"]) * repeated_ngram_ratio(col, 2)
    )
    return F.round(z, 6)


def quality_score(col: Column | str) -> Column:
    """Sigmoid of the logit — the [0,1] score a corpus pipeline
    thresholds or samples against. Not oracle-hashed (exp() is libm-
    dependent); parity checks pin :func:`quality_logit` instead."""
    z = quality_logit(col)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint of normalized text.

    md5 (not Spark's murmur ``hash``) so a DuckDB oracle computes the
    identical value — the cross-engine-checkable analog of a rolling
    content hash.
    """
    return F.md5(normalized_text(col))


def vocab_top_k(df, text_col: str = "text", k: int = 100):
    """Corpus vocabulary induction: the k most frequent normalized
    tokens with rank and cumulative coverage — the first step of
    training a tokenizer (seed vocab / coverage curve) run at corpus
    scale.

    Plan shape: explode(tokens) → groupBy(token) count — the explode is
    scan-local and the count partial-aggregates map-side, so the only
    full shuffle carries one row per DISTINCT token, not per token
    occurrence. The top-k is a TakeOrdered over the distinct-token
    aggregate; the cumulative-coverage window runs over k rows on one
    partition (k is tiny by construction). Ties break on token text for
    cross-engine determinism.
    """
    from pyspark.sql import DataFrame, Window

    toks = F.explode(
        F.filter(F.split(normalized_text(F.col(text_col)), " "), lambda t: t != "")
    ).alias("token")
    counts = df.select(toks).groupBy("token").agg(F.count("*").alias("freq"))
    total = counts.agg(F.sum("freq").alias("total"))
    top = counts.orderBy(F.col("freq").desc(), F.col("token")).limit(k)
    w = Window.orderBy(F.col("freq").desc(), F.col("token")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(
            Window.orderBy(F.col("freq").desc(), F.col("token"))
        ))
        .withColumn(
            "cum_coverage",
            F.round(
                F.sum("freq").over(w).cast("double") / F.col("total").cast("double"),
                6,
            ),
        )
        .select("rank", "token", "freq", "cum_coverage")
    )


# Gopher-style quality rule panel (Rae et al. 2021, "Scaling Language
# Models: ... Gopher", appendix A1.1 — public paper). Word-level rules
# only: the line-based rules (bullet/ellipsis line fractions) need
# newline structure this corpus doesn't carry; segment-level boilerplate
# is handled by operators.decontam.segment_dedup instead.
GOPHER_BOUNDS = {
    "min_words": 50,
    "max_words": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "max_symbol_ratio": 0.1,    # '#' or '...' per word
    "min_alpha_frac": 0.80,     # words containing >= 1 alphabetic char
    "min_stop_hits": 2,         # docs with no function words are junk
}


def gopher_quality_flags(col: Column | str) -> dict[str, Column]:
    """The Gopher rule panel as int flag columns plus the conjunction.

    Each rule is a pure Column expression over normalized tokens —
    codegen'd, scan-speed, filter-pushdown-friendly; ``gopher_keep``
    is the AND of all rules (1 = document survives the panel).
    Thresholds live in :data:`GOPHER_BOUNDS`, plug-in data like the
    quality-model weights.
    """
    c = F.col(col) if isinstance(col, str) else col
    b = GOPHER_BOUNDS
    n_words = token_count(c).cast("double")
    safe_words = F.when(n_words > 0, n_words).otherwise(F.lit(None))
    mean_wl = F.coalesce(
        F.length(F.replace(normalized_text(c), F.lit(" "), F.lit(""))) / safe_words,
        F.lit(0.0),
    )
    symbols = F.regexp_count(c, F.lit(r"#|\.\.\.")).cast("double")
    # tokens containing a letter, as one anchored regexp_count (each
    # match consumes its whole token, so a token counts at most once)
    alpha = F.regexp_count(
        normalized_text(c), F.lit(r"(?:^| )[^ ]*[a-z][^ ]*(?= |$)")
    ).cast("double")
    stop_hits = _panel_hits(normalized_text(c), _EN_STOP + _ES_STOP)
    flags = {
        "f_word_count": (n_words >= b["min_words"]) & (n_words <= b["max_words"]),
        "f_mean_word_len": (mean_wl >= b["min_mean_word_len"])
        & (mean_wl <= b["max_mean_word_len"]),
        "f_symbol_ratio": F.coalesce(symbols / safe_words, F.lit(0.0))
        < b["max_symbol_ratio"],
        "f_alpha_frac": F.coalesce(alpha / safe_words, F.lit(0.0))
        > b["min_alpha_frac"],
        "f_stopwords": stop_hits >= b["min_stop_hits"],
    }
    out = {k: v.cast("int") for k, v in flags.items()}
    keep = None
    for v in flags.values():
        keep = v if keep is None else (keep & v)
    out["gopher_keep"] = keep.cast("int")
    return out


def bigram_lm_scores(
    df,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_k: int = 256,
    alpha: float = 0.1,
):
    """Corpus-trained bigram language-model quality score — the
    in-engine stand-in for the CCNet/Wikipedia-LM perplexity filter
    (Wenzek et al. 2020 score with KenLM; same two-pass shape, n=2,
    add-α smoothing so the model is exactly replayable in SQL).

    Pass 1 trains on the corpus itself: vocabulary = top-``vocab_k``
    tokens by frequency (ties on token text), everything else mapped to
    ``<unk>``; bigram counts c(w1,w2) aggregate map-side, and unigram
    context counts derive as c(w1) = Σ_w2 c(w1,w2) — a model-sized
    aggregate of the model, zero extra corpus pass. Pass 2 scores every
    document with ≥ 2 tokens by its mean bigram log-probability

        lm_score = avg ln( (c(w1,w2) + α) / (c(w1) + α·(V+1)) )

    (V+1 event types: the vocabulary plus ``<unk>``). Low scores =
    improbable token transitions = gibberish/boilerplate — rank or
    threshold downstream exactly like ``quality_logit``.

    Plan shape at 100 TB: the vocabulary is a bounded ``vocab_k``-row
    collect (the model is driver-sized by construction, like the BM25
    query workload) re-broadcast as a map literal, so OOV mapping is a
    narrow array ``transform`` at scan speed; the bigram explode
    partial-aggregates map-side into a model-sized table that
    broadcasts back onto the scoring pass; the only corpus-keyed
    shuffle is the per-doc average. Above ~10⁵ vocab the map-literal
    and broadcast both outgrow their sweet spots — route the mapping
    through a broadcast join on exploded tokens and the model join
    through a shuffle on (w1, w2), same semantics. Train and score each
    scan the corpus once (standard two-pass LM; at rest the model
    table is written once and reused across scoring runs).

    Returns ``(doc_id, n_bigrams, lm_score)`` for docs with ≥ 1 bigram,
    score rounded to 6.
    """
    from pyspark.sql import functions as F

    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "), lambda t: t != ""
    )
    counts = (
        df.select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("freq"))
    )
    vocab = [
        r["token"]
        for r in counts.orderBy(F.col("freq").desc(), F.col("token"))
        .limit(vocab_k)
        .collect()
    ]
    v_types = len(vocab) + 1  # + <unk>
    vmap = F.create_map(*[x for t in vocab for x in (F.lit(t), F.lit(t))])

    mapped = df.select(
        F.col(id_col).alias("doc_id"),
        F.transform(
            toks, lambda t: F.coalesce(F.element_at(vmap, t), F.lit("<unk>"))
        ).alias("mt"),
    )
    # <2-token docs are guarded INSIDE the explode expression instead
    # of a size(mt) >= 2 Filter: predicate pushdown would substitute
    # the whole vocab-map transform into that filter and re-map every
    # row a second time (the round-10 DSIR shape finding,
    # operators/dsir._gram_rows). Empty arrays explode to nothing, so
    # the semantics are identical.
    bigrams = mapped.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(mt) < 2 THEN array() "
                "ELSE transform(sequence(0, size(mt)-2), "
                "i -> struct(mt[i] AS w1, mt[i+1] AS w2)) END"
            )
        ).alias("z"),
    ).select("doc_id", "z.w1", "z.w2")

    c12 = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    model = c12.join(c1, "w1")

    logp = F.log(
        (F.col("c12") + F.lit(alpha)) / (F.col("c1") + F.lit(alpha) * F.lit(v_types))
    )
    return (
        bigrams.join(F.broadcast(model), ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_bigrams"),
            F.round(F.avg(logp), 6).alias("lm_score"),
        )
    )


# ---------------------------------------------------------------------------
# information-theoretic quality signals: char entropy + compressibility
# ---------------------------------------------------------------------------

_ENTROPY_ALPHABET = "abcdefghijklmnopqrstuvwxyz0123456789 "


def char_entropy(col: Column | str) -> Column:
    """Shannon entropy (bits/char) of the normalized text — the cheap
    gibberish detector: natural language sits ~3.4-4.2 bits/char over
    this 37-symbol alphabet, single-char spam near 0, uniform random
    keyboard mash near log2(37) ≈ 5.21.

    Engine-faithful construction: per-symbol counts come from the
    length-difference trick (``len(s) - len(replace(s, c, ''))``) over
    the closed 37-symbol normalized alphabet — 37 JVM codegen terms,
    NO explode, NO shuffle, NO UDF, so the cost is a scan and the
    identical expression tree replays in ANSI SQL bit-for-bit (fixed
    left-to-right float summation order; see CHAR_ENTROPY_SQL users in
    plans). Uses the identity H = log2(n) - (Σ c·log2(c))/n so each
    count appears once. Empty text → 0.0; rounded to 6 dp.

    MEASURED TRAP (BASELINE.md round 6): inlining the normalization
    into every one of the ~150 column references defeats codegen
    subexpression elimination — the regex re-evaluates per reference
    (6.9 s for 5k docs). Do NOT select this Column directly over raw
    text at scale; call :func:`add_char_entropy`, which hoists the
    normalization into its own projection (CollapseProject refuses to
    re-inline a non-cheap multiply-referenced alias, so the plan keeps
    exactly one regexp_replace — 2.7×) or takes the Arrow backend
    (~25× on prose-sized docs). This inline form remains the
    oracle-replayable definition and is fine at reference scale.
    """
    return char_entropy_from_norm(normalized_text(col))


def char_entropy_from_norm(norm: Column | str) -> Column:
    """:func:`char_entropy` over ALREADY-normalized text (the hoisted
    form — see the trap note there). Same expression tree minus the
    normalization, so results are identical floats."""
    s = F.col(norm) if isinstance(norm, str) else norm
    n = F.length(s).cast("double")
    acc: Column | None = None
    for ch in _ENTROPY_ALPHABET:
        c = (F.length(s) - F.length(F.replace(s, F.lit(ch), F.lit("")))).cast(
            "double"
        )
        term = F.when(c > 0, c * F.log2(c)).otherwise(F.lit(0.0))
        acc = term if acc is None else acc + term
    h = F.log2(n) - acc / n
    return F.when(n > 0, F.round(h, 6)).otherwise(F.lit(0.0))


def add_char_entropy(
    df,
    text_col: str = "text",
    out_col: str = "entropy",
    backend: str = "exact",
):
    """Append a char-entropy column the scale-safe way.

    ``backend="exact"`` hoists the normalization into its own
    projection so the regex evaluates once per row and the 37 counting
    terms run over the cached normalized string (the SQL-replayable
    path — one regexp_replace in the executed plan, plan-pinned).
    ``backend="arrow"`` computes the same alphabet-ordered float sum in
    a vectorized scalar (Counter per doc) — ~10× the hoisted JVM form
    on prose-sized docs because the JVM path still allocates 37
    replace() copies of every string; property-pinned equal to exact
    on the test corpus (same ops, same order, same 6-dp round).
    """
    if backend == "arrow":
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("double")
        def ent(s: pd.Series) -> pd.Series:
            import math
            import re as _re
            from collections import Counter

            def one(t):
                if not t:
                    return 0.0
                x = _re.sub(r"[^a-z0-9]+", " ", t.lower()).strip()
                if not x:
                    return 0.0
                n = len(x)
                cnt = Counter(x)
                acc = 0.0
                for ch in _ENTROPY_ALPHABET:
                    c = cnt.get(ch, 0)
                    if c > 0:
                        acc += c * math.log2(c)
                return round(math.log2(n) - acc / n, 6)

            return s.map(one)

        return df.withColumn(out_col, ent(F.col(text_col)))
    if backend != "exact":
        raise ValueError(f"add_char_entropy: unknown backend {backend!r}")
    return (
        df.withColumn("__ce_norm", normalized_text(F.col(text_col)))
        .withColumn(out_col, char_entropy_from_norm("__ce_norm"))
        .drop("__ce_norm")
    )


def char_entropy_sql(text_expr: str = "text", assume_normalized: bool = False) -> str:
    """The DuckDB/ANSI mirror of :func:`char_entropy` — generated from
    the same alphabet loop so the 37 terms sum in the same order. With
    ``assume_normalized`` the expression is counted as-is (pair it with
    a normalized-once subquery, mirroring :func:`add_char_entropy`'s
    hoist — same values, since normalization is idempotent)."""
    norm = (
        text_expr
        if assume_normalized
        else f"trim(regexp_replace(lower({text_expr}), '[^a-z0-9]+', ' ', 'g'))"
    )
    terms = []
    for ch in _ENTROPY_ALPHABET:
        lit = "' '" if ch == " " else f"'{ch}'"
        c = f"CAST(length({norm}) - length(replace({norm}, {lit}, '')) AS DOUBLE)"
        terms.append(f"(CASE WHEN {c} > 0 THEN {c} * log2({c}) ELSE 0.0 END)")
    acc = " + ".join(terms)
    n = f"CAST(length({norm}) AS DOUBLE)"
    return (
        f"CASE WHEN {n} > 0 THEN ROUND(log2({n}) - ({acc}) / {n}, 6) ELSE 0.0 END"
    )


def compression_ratio(col: Column | str, level: int = 6) -> Column:
    """Deflate compressibility of the raw text: ``compressed_bytes /
    raw_bytes`` (zlib level ``level``), the quality signal corpus
    pipelines use to catch both templated boilerplate (ratio → 0,
    deflate eats repetition) and binary/base64 junk (ratio → 1+,
    incompressible). Natural prose lands ~0.3-0.6.

    zlib has no SQL analogue, so this is an Arrow-vectorized scalar
    (scan-local, no shuffle) held to the Python zlib reference by
    pytest instead of the DuckDB oracle. Empty/NULL text → NULL
    (no evidence, distinct from 'perfectly compressible').
    """
    from pyspark.sql.functions import pandas_udf

    c = F.col(col) if isinstance(col, str) else col

    @pandas_udf("double")
    def ratio(s: pd.Series) -> pd.Series:
        import zlib

        def one(t):
            if not t:
                return None
            raw = t.encode("utf-8")
            return round(len(zlib.compress(raw, level)) / len(raw), 6)

        return s.map(one)

    return ratio(c)


# ---------------------------------------------------------------------------
# trained n-gram language ID (Cavnar & Trenkle 1994, out-of-place measure)
# ---------------------------------------------------------------------------


def _trigram_rows(df, key_expr: Column, key_name: str):
    """(key, gram) rows: every character trigram of each row's
    normalized text. The normalization is HOISTED to its own projected
    column (the round-6 CSE lesson: a lambda body referencing the raw
    expression would re-run the regex once per trigram); strings
    shorter than 3 chars contribute nothing (sequence(1,0) would
    DESCEND — same guard as repeated_ngram_ratio)."""
    with_norm = df.select(
        key_expr.alias(key_name), normalized_text(F.col("text")).alias("__n")
    )
    n = F.col("__n")
    grams = F.when(
        F.length(n) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(n) - 2),
            lambda i: F.substring(n, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return with_norm.select(key_name, F.explode(grams).alias("gram"))


def langid_train(df, lang_col: str = "lang", k: int = 50):
    """Train Cavnar-Trenkle language profiles: per language, the top-k
    character trigrams of normalized text, ranked by frequency with
    ties broken on gram text — a total order, so training is
    deterministic and fully SQL-replayable.

    Scale shape: ONE corpus-sized stage (the trigram explode, whose
    groupBy(lang, gram) shuffle is map-side combined down to distinct
    pairs per partition); the rank window runs on the model-sized count
    table. Returns (lang, gram, rank) with ≤ k rows per language — a
    broadcastable model, exactly how production language-ID models are
    tiny artifacts trained in one corpus pass.
    """
    from pyspark.sql import Window

    counts = (
        _trigram_rows(df, F.col(lang_col), "lang")
        .groupBy("lang", "gram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), F.col("gram").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("lang", "gram", "rank")
    )


def _langid_score_profiles(doc_prof, profiles, id_col: str, k: int):
    """Scoring tail shared by :func:`langid_score` and
    :func:`langid_train_score`: out-of-place distance of per-doc
    profiles against broadcast language profiles, argmin per doc."""
    from pyspark.sql import Window

    langs = profiles.select("lang").distinct()
    scored = (
        doc_prof.crossJoin(F.broadcast(langs))
        .join(
            F.broadcast(profiles.withColumnRenamed("rank", "lrank")),
            ["lang", "gram"],
            "left",
        )
        .groupBy(id_col, "lang")
        .agg(
            F.sum(
                F.coalesce(
                    F.abs(F.col("drank") - F.col("lrank")), F.lit(k)
                ).cast("long")
            ).alias("distance")
        )
    )
    best = Window.partitionBy(id_col).orderBy(
        F.col("distance").asc(), F.col("lang").asc()
    )
    return (
        scored.withColumn("__rn", F.row_number().over(best))
        .filter(F.col("__rn") == 1)
        .select(id_col, F.col("lang").alias("lang_pred"), "distance")
    )


def langid_train_score(
    df,
    lang_col: str = "lang",
    id_col: str = "doc_id",
    k: int = 50,
    strategy: str | None = None,
):
    """Train AND classify in one corpus pass: identical output to
    ``langid_score(df, langid_train(df, k=k), k=k)``, but the
    corpus-sized work — the trigram explode (normalization regex +
    substring generation over every character position) AND its
    map-side-combined shuffle — runs ONCE. What gets pinned is NOT the
    raw exploded frame (pinning ~200 gram rows per document
    OOM-pressured local[32] at 500k docs — a corpus-sized pin is the
    wrong stage table at any scale); it is the per-(id, lang, gram)
    COUNT, which is combine-sized (distinct grams per doc). Each doc
    has one lang, so (id, gram) is unique in the pin and BOTH profiles
    derive from it: the language profile re-aggregates
    ``SUM(cnt) GROUP BY (lang, gram)`` (a pin-sized shuffle, not a
    corpus one) and the per-doc ranks read it directly. Pin mechanism
    is the ``materialize`` strategy knob (localCheckpoint locally,
    reliable checkpoint / stage parquet on a cluster).

    MEASURED NEGATIVE RESULT (round 7, BASELINE.md): at ×100 (500k
    docs, local[32]) this fused form LOSES to the two-pass
    ``langid_score(df, langid_train(df))`` — 47.3 s (parquet stage)
    vs 41.0 s, and a localCheckpoint pin fails outright under block-
    manager pressure (~250M pinned gram rows). The intermediate is
    cheap to recompute (pure codegen over the scan) and expensive to
    materialize, so the registered query keeps the two-explode form;
    this operator remains for callers whose source scan is the
    expensive part (e.g. remote object storage with per-scan egress),
    equality pinned by pytest across all strategies.
    """
    from pyspark.sql import Window

    from ..materialize import materialize, release

    with_norm = df.select(
        F.col(id_col), F.col(lang_col).alias("lang"),
        normalized_text(F.col("text")).alias("__n"),
    )
    n = F.col("__n")
    grams = F.when(
        F.length(n) >= 3,
        F.transform(
            F.sequence(F.lit(1), F.length(n) - 2),
            lambda i: F.substring(n, i, F.lit(3)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    doc_gram_counts = materialize(
        with_norm.select(id_col, "lang", F.explode(grams).alias("gram"))
        .groupBy(id_col, "lang", "gram")
        .agg(F.count("*").alias("cnt")),
        name="langid_doc_gram_counts",
        strategy=strategy,
    )
    try:
        wl = Window.partitionBy("lang").orderBy(
            F.col("cnt").desc(), F.col("gram").asc()
        )
        profiles = (
            doc_gram_counts.groupBy("lang", "gram")
            .agg(F.sum("cnt").alias("cnt"))
            .withColumn("rank", F.row_number().over(wl))
            .filter(F.col("rank") <= k)
            .select("lang", "gram", "rank")
        )
        wd = Window.partitionBy(id_col).orderBy(
            F.col("cnt").desc(), F.col("gram").asc()
        )
        doc_prof = (
            doc_gram_counts.withColumn("drank", F.row_number().over(wd))
            .filter(F.col("drank") <= k)
            .select(id_col, "gram", "drank")
        )
        out = _langid_score_profiles(doc_prof, profiles, id_col, k)
        # the pinned frame feeds two branches of `out`'s plan, so it
        # must stay alive until the caller has consumed the result;
        # eagerly materialize the small output before releasing it
        result = materialize(out, name="langid_out", strategy=strategy)
    finally:
        release(doc_gram_counts)
    return result


def langid_score(df, profiles, id_col: str = "doc_id", k: int = 50):
    """Classify each document against trained profiles with the
    out-of-place measure: build the document's own top-k trigram
    profile, then for each candidate language sum |doc_rank −
    lang_rank| over the document's grams, charging the maximum penalty
    ``k`` for grams absent from the language profile; predict the
    argmin (ties on language name).

    Scale shape: one trigram explode + one (doc, gram) combine (the
    corpus-sized stage), a map-side WindowGroupLimit for the per-doc
    top-k, then a BROADCAST join of the model and a doc-keyed
    aggregate. Documents with no trigrams are absent from the output
    (no evidence → no prediction). Output: (id, lang_pred, distance).
    """
    from pyspark.sql import Window

    doc_counts = (
        _trigram_rows(df, F.col(id_col), id_col)
        .groupBy(id_col, "gram")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("cnt").desc(), F.col("gram").asc())
    doc_prof = (
        doc_counts.withColumn("drank", F.row_number().over(w))
        .filter(F.col("drank") <= k)
        .select(id_col, "gram", "drank")
    )
    return _langid_score_profiles(doc_prof, profiles, id_col, k)
