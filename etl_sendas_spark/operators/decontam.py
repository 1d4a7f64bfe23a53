"""Train-set hygiene operators: eval-set decontamination and
segment-level corpus dedup.

Two standard passes a training-data pipeline runs between raw ingest
and packing:

- :func:`ngram_contamination` — flag training documents that share
  word n-grams with an evaluation/benchmark set (the "did the test set
  leak into the training corpus" audit).  The eval side is assumed
  benchmark-sized (thousands of docs, millions of n-grams at most), so
  its distinct n-gram set broadcasts and the 100 TB train side is
  touched exactly once, map-side.
- :func:`segment_dedup` — remove segments (fixed-length token windows,
  the deterministic stand-in for lines/paragraphs) that repeat across
  too many documents: boilerplate headers, navigation chrome, license
  blocks.  This is the CCNet/RefinedWeb "line dedup" pass restated
  over tokens, since a tokenized corpus has no newline structure to
  key on.

Both are pure DataFrame composition — no UDFs, no driver state; the
only shuffles are the (token-segment | n-gram)-keyed aggregations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import normalized_text


def _doc_shingles(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(id, sh: array<string>, sz) — distinct word n-grams per doc.

    Same formulation as dedupe._shingle_docs (tokens materialized in
    their own projection so the per-token regex isn't re-inlined);
    duplicated minimally here to also emit the set size.
    """
    toks_df = df.select(
        F.col(id_col),
        F.split(normalized_text(F.col(text_col)), " ").alias("__toks"),
    ).filter(F.size("__toks") >= n)
    toks = F.col("__toks")
    idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
    sh = F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )
    return toks_df.select(
        F.col(id_col), sh.alias("sh"), F.size(sh).alias("sz")
    )


def ngram_contamination(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    threshold: float = 0.1,
) -> DataFrame:
    """Per-train-document overlap with the eval set's n-gram universe.

    Returns (id, n_grams, n_overlap, contamination, contaminated):
    ``n_grams`` = distinct n-grams in the doc, ``n_overlap`` = how many
    of them appear ANYWHERE in the eval set, ``contamination`` their
    ratio (rounded to 6), ``contaminated`` = 1 iff ratio ≥ threshold.
    Documents shorter than ``n`` tokens have no n-grams and are not
    returned (nothing to test).

    Plan: the eval set collapses to one distinct-n-gram column and
    BROADCASTS — eval benchmarks are tiny next to a training corpus,
    and broadcasting makes the train pass shuffle-free up to the final
    per-doc count (keyed by doc id, combiner-friendly).  The n-gram
    length should match the eval benchmark's contamination protocol
    (13-gram is common for LLM evals; the default 5 suits short docs).
    """
    eval_grams = (
        _doc_shingles(eval_set, id_col, text_col, n)
        .select(F.explode("sh").alias("gram"))
        .distinct()
    )
    docs = _doc_shingles(train, id_col, text_col, n)
    posting = docs.select(id_col, "sz", F.explode("sh").alias("gram"))
    overlap = (
        posting.join(F.broadcast(eval_grams), "gram")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_overlap"))
    )
    ratio = F.col("n_overlap") / F.col("sz")
    return (
        docs.select(id_col, "sz")
        .join(overlap, id_col, "left")
        .select(
            F.col(id_col),
            F.col("sz").cast("long").alias("n_grams"),
            F.coalesce(F.col("n_overlap"), F.lit(0)).cast("long").alias("n_overlap"),
        )
        .withColumn(
            "contamination", F.round(F.col("n_overlap") / F.col("n_grams"), 6)
        )
        .withColumn(
            "contaminated",
            (F.col("contamination") >= F.lit(threshold)).cast("int"),
        )
    )


def segment_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_tokens: int = 10,
    max_df: int = 1,
    drop_empty: bool = False,
) -> DataFrame:
    """Remove cross-document repeated segments, keep within-doc order.

    A segment is a NON-overlapping run of ``seg_tokens`` normalized
    tokens (the last one may be shorter).  Any segment whose document
    frequency exceeds ``max_df`` is dropped from every document; the
    survivors re-join in position order.  Returns
    (id, clean_text, n_segments, n_removed).

    Plan: segment extraction is narrow (one ``posexplode`` per doc);
    document frequency is one segment-keyed aggregation (map-side
    combinable — a segment's count partial-aggregates per partition);
    the removal is a join back on the segment, and reassembly one
    doc-keyed aggregation.  Two shuffle keys total (segment, doc id),
    both well distributed: the segment side CAN skew on ubiquitous
    boilerplate, which is exactly what AQE skew-join handles — and the
    frequency cap means hot segments are dropped, not joined through.
    At 100 TB the df table is itself corpus-sized; it stays distributed
    end to end (no collect, no broadcast of the bad-segment set).
    """
    k = int(seg_tokens)
    toks_df = df.select(
        F.col(id_col),
        F.split(normalized_text(F.col(text_col)), " ").alias("__toks"),
    ).filter(F.size("__toks") > 0)
    toks = F.col("__toks")
    n_seg = F.ceil(F.size(toks) / F.lit(k)).cast("int")
    segs_arr = F.transform(
        F.sequence(F.lit(0), n_seg - 1),
        lambda i: F.array_join(F.slice(toks, i * F.lit(k) + 1, k), " "),
    )
    segs = toks_df.select(
        F.col(id_col), F.posexplode(segs_arr).alias("pos", "seg")
    )
    docfreq = segs.groupBy("seg").agg(
        F.countDistinct(id_col).alias("seg_df")
    )
    kept = (
        segs.join(docfreq, "seg")
        .filter(F.col("seg_df") <= F.lit(int(max_df)))
        .select(id_col, "pos", "seg")
    )
    totals = segs.groupBy(id_col).agg(F.count("*").alias("n_segments"))
    rebuilt = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "seg"))),
                lambda s: s["seg"],
            ),
            " ",
        ).alias("clean_text"),
        F.count("*").alias("n_kept"),
    )
    out = (
        totals.join(rebuilt, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
            F.col("n_segments").cast("long"),
            (F.col("n_segments") - F.coalesce(F.col("n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )
    if drop_empty:
        out = out.filter(F.col("clean_text") != "")
    return out
