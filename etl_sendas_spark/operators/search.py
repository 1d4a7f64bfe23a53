"""Keyword search over a document corpus: BM25 scoring with an
inverted-index plan shape.

The retrieval counterpart of the dedup/ANN ladder: given a small set of
keyword queries, rank corpus documents by Okapi BM25. At 100 TB the
corpus side is the only big input, and the plan is built so that every
corpus-sized stage is either scan-local or filtered to the query
vocabulary BEFORE its shuffle:

- document length (``dl``) is ``size(tokens)`` computed in the scan
  projection — no explode, no shuffle;
- the postings explode is immediately filtered by an ``isin`` against
  the (broadcast-sized) query vocabulary, so the one corpus-keyed
  shuffle — the ``(doc_id, token)`` term-frequency aggregate — carries
  only matching postings, not the whole corpus;
- document frequency / IDF is derived from that already-filtered tf
  frame (grouping by token is exactly the per-term document count when
  tf rows are one-per-(doc, term)), yielding a query-vocabulary-sized
  frame that broadcasts back onto the postings;
- the final per-(query, doc) score sum groups a frame bounded by
  |matched postings| x |queries sharing the term|, and the top-k is a
  per-query window over candidates that matched at least one term.

Scores are rounded to 6 decimals BEFORE ranking so the ordering (and
the DuckDB oracle's) cannot diverge on last-ULP float noise from the
different summation orders / libm implementations.

Tokenization is the corpus-wide canonical form shared with every dedup
flavor (``functions.text.normalized_text``), so search and dedup agree
on what a token is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text


def _tokens(col) -> F.Column:
    return F.filter(F.split(normalized_text(col), " "), lambda t: t != "")


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per keyword query under Okapi BM25.

    ``queries`` is a small driver-side list of ``(query_id, text)`` —
    the broadcast side by construction (a query workload is KBs, the
    corpus is the 100 TB side). Duplicate terms within one query count
    once (standard binary query-term weighting).

    Returns ``(query_id, doc_id, score)`` with ``score`` rounded to 6
    decimals and ``rank <= k`` per query (ties broken by ``doc_id``).
    """
    spark = docs.sparkSession
    qdf = spark.createDataFrame(queries, schema="query_id INT, qtext STRING")
    qterms = qdf.select(
        "query_id", F.explode(_tokens(F.col("qtext"))).alias("token")
    ).distinct()
    # The query vocabulary as a plan-time literal set: tiny, and lets the
    # postings filter run inside the scan stage (no join before the tf agg).
    vocab = sorted({t for _, q in queries for t in _py_tokens(q)})

    base = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("toks")
    )
    dl = base.select("doc_id", F.size("toks").alias("dl"))
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    post = base.select(
        "doc_id", F.explode("toks").alias("token")
    ).filter(F.col("token").isin(vocab))
    tf = post.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    # tf has one row per (doc, term) => per-token row count IS the
    # document frequency; both frames are query-vocabulary-bounded.
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))

    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(qterms), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", "score")
    )


def _py_tokens(text: str) -> list[str]:
    """Driver-side mirror of the canonical tokenizer for the tiny query
    strings (same lowercase + non-alphanumeric split)."""
    import re

    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]
