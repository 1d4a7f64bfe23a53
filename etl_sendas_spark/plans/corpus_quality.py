"""Corpus-hygiene queries: eval-set decontamination, segment-level
boilerplate dedup, and the Gopher quality-rule panel.

Extends the LLM-pipeline ladder (SURVEY.md §2 extensions) with the
three passes between raw ingest and packing that the existing entries
don't cover: "did the benchmark leak into the training set", "strip
cross-document boilerplate", and "apply the published rule panel".
Oracle discipline follows inventory.py (counts BIGINT, ratios rounded
to 6, md5 witnesses for rebuilt text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.text import gopher_quality_flags
from ..operators.decontam import ngram_contamination, segment_dedup


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_table

    return read_table(spark, sf_dir, name)


_NORM_SQL = "trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))"
_TOKS_SQL = f"string_split({_NORM_SQL}, ' ')"
_EN = "['the','and','of','to','in','is','that','for','with','on']"
_ES = "['el','la','de','que','y','en','los','del','se','por']"


def decontaminate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval split on doc_id (id % 11 == 0 plays the benchmark),
    5-gram contamination audit of the train side.  The eval n-gram
    universe broadcasts; the train corpus is read once."""
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 11 != 0)
    eval_set = docs.filter(F.col("doc_id") % 11 == 0)
    return ngram_contamination(
        train, eval_set, id_col="doc_id", text_col="text", n=5, threshold=0.1
    )


DECONTAMINATE_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(generate_series(1, len(t) - 4),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
                || ' ' || t[i+4])) AS grams
  FROM toks WHERE len(t) >= 5
), eval_grams AS (
  SELECT DISTINCT UNNEST(grams) AS gram FROM sh WHERE doc_id % 11 = 0
), train AS (
  SELECT doc_id, grams, len(grams) AS sz FROM sh WHERE doc_id % 11 <> 0
), posting AS (
  SELECT doc_id, UNNEST(grams) AS gram FROM train
), ov AS (
  SELECT doc_id, COUNT(*) AS n_overlap
  FROM posting JOIN eval_grams USING (gram) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.sz AS BIGINT) AS n_grams,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       ROUND(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / t.sz, 6)
         AS contamination,
       CAST(ROUND(CAST(COALESCE(o.n_overlap, 0) AS DOUBLE) / t.sz, 6) >= 0.1
            AS INTEGER) AS contaminated
FROM train t LEFT JOIN ov o USING (doc_id)
"""


def dedup_segments_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Segment-level (10-token, non-overlapping) cross-document dedup:
    segments appearing in 2+ docs are boilerplate and are stripped;
    the rebuilt text is witnessed by md5 so the oracle pins content,
    not just counts."""
    docs = _t(spark, sf_dir, "documents")
    cleaned = segment_dedup(
        docs, id_col="doc_id", text_col="text", seg_tokens=10, max_df=1
    )
    return cleaned.select(
        "doc_id",
        F.md5(F.col("clean_text")).alias("clean_md5"),
        "n_segments",
        "n_removed",
    )


DEDUP_SEGMENTS_SQL = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS t FROM documents WHERE {_NORM_SQL} <> ''
), segs AS (
  SELECT doc_id, i AS pos,
         array_to_string(t[(i*10+1):(i*10+10)], ' ') AS seg
  FROM toks,
       UNNEST(generate_series(0, CAST(ceil(len(t) / 10.0) AS BIGINT) - 1))
         AS u(i)
), dfq AS (
  SELECT seg, COUNT(DISTINCT doc_id) AS seg_df FROM segs GROUP BY seg
), kept AS (
  SELECT s.doc_id, s.pos, s.seg
  FROM segs s JOIN dfq USING (seg) WHERE seg_df <= 1
), totals AS (
  SELECT doc_id, COUNT(*) AS n_segments FROM segs GROUP BY doc_id
), rebuilt AS (
  SELECT doc_id, string_agg(seg, ' ' ORDER BY pos) AS clean_text,
         COUNT(*) AS n_kept
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id,
       md5(COALESCE(r.clean_text, '')) AS clean_md5,
       CAST(t.n_segments AS BIGINT) AS n_segments,
       CAST(t.n_segments - COALESCE(r.n_kept, 0) AS BIGINT) AS n_removed
FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


def gopher_quality_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher rule panel over the corpus: five word-level flags +
    the conjunction, all JVM Column expressions at scan speed."""
    docs = _t(spark, sf_dir, "documents")
    flags = gopher_quality_flags("text")
    return docs.select(
        "doc_id", *[v.alias(k) for k, v in flags.items()]
    )


GOPHER_SQL = f"""
WITH feat AS (
  SELECT doc_id,
         CASE WHEN {_NORM_SQL} = '' THEN 0
              ELSE len({_TOKS_SQL}) END AS n_words,
         CAST(length(replace({_NORM_SQL}, ' ', '')) AS DOUBLE) AS n_alpha_chars,
         len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols,
         len(list_filter({_TOKS_SQL}, x -> regexp_matches(x, '[a-z]')))
           AS n_alpha_words,
         len(list_filter({_TOKS_SQL},
             x -> list_contains({_EN}, x) OR list_contains({_ES}, x)))
           AS stop_hits
  FROM documents
), r AS (
  SELECT doc_id, n_words,
         CASE WHEN n_words > 0 THEN n_alpha_chars / n_words ELSE 0.0 END
           AS mean_wl,
         CASE WHEN n_words > 0 THEN CAST(n_symbols AS DOUBLE) / n_words
              ELSE 0.0 END AS symbol_ratio,
         CASE WHEN n_words > 0 THEN CAST(n_alpha_words AS DOUBLE) / n_words
              ELSE 0.0 END AS alpha_frac,
         stop_hits
  FROM feat
)
SELECT doc_id,
       CAST(n_words >= 50 AND n_words <= 100000 AS INTEGER) AS f_word_count,
       CAST(mean_wl >= 3.0 AND mean_wl <= 10.0 AS INTEGER) AS f_mean_word_len,
       CAST(symbol_ratio < 0.1 AS INTEGER) AS f_symbol_ratio,
       CAST(alpha_frac > 0.80 AS INTEGER) AS f_alpha_frac,
       CAST(stop_hits >= 2 AS INTEGER) AS f_stopwords,
       CAST(n_words >= 50 AND n_words <= 100000
            AND mean_wl >= 3.0 AND mean_wl <= 10.0
            AND symbol_ratio < 0.1
            AND alpha_frac > 0.80
            AND stop_hits >= 2 AS INTEGER) AS gopher_keep
FROM r
"""


CORPUS_QUALITY_QUERIES = {
    "decontaminate_docs": decontaminate_docs,
    "dedup_segments_docs": dedup_segments_docs,
    "gopher_quality_docs": gopher_quality_docs,
}

CORPUS_QUALITY_ORACLES = {
    "decontaminate_docs": DECONTAMINATE_SQL,
    "dedup_segments_docs": DEDUP_SEGMENTS_SQL,
    "gopher_quality_docs": GOPHER_SQL,
}
