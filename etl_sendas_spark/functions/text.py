"""Text-analysis scalar library for training-data pipelines.

These are the per-document features a 100 TB corpus pipeline computes
before filtering/dedup: token counts, quality heuristics, language id,
and fingerprints. All pure Column expressions (JVM, codegen'd) so they
run at scan speed — no Python in the hot path.

Where a DuckDB oracle needs identical arithmetic, the building blocks
are chosen to exist in both engines (regexp_replace / length / md5).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

# A small English/Spanish stopword panel for the n-gram-free lang-id
# heuristic; counts of hits per language decide the label.
_EN_STOP = ["the", "and", "of", "to", "in", "is", "that", "for", "with", "on"]
_ES_STOP = ["el", "la", "de", "que", "y", "en", "los", "del", "se", "por"]

_WORD_RE = r"[^ ]+"


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
    toks = F.split(norm, " ")
    n_tokens = token_count(c).cast("double")
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(*_EN_STOP) | t.isin(*_ES_STOP))
    ).cast("double")
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
    toks = F.split(normalized_text(col), " ")
    en = F.size(F.filter(toks, lambda t: t.isin(*_EN_STOP)))
    es = F.size(F.filter(toks, lambda t: t.isin(*_ES_STOP)))
    return (
        F.when((en == 0) & (es == 0), F.lit("unknown"))
        .when(en >= es, F.lit("en"))
        .otherwise(F.lit("es"))
    )


def doc_fingerprint(col: Column | str) -> Column:
    """Deterministic 128-bit content fingerprint of normalized text.

    md5 (not Spark's murmur ``hash``) so a DuckDB oracle computes the
    identical value — the cross-engine-checkable analog of a rolling
    content hash.
    """
    return F.md5(normalized_text(col))
