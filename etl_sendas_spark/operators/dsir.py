"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): pick raw-corpus documents whose hashed-n-gram
distribution matches a TARGET corpus, the published recipe behind
"select pretraining data that looks like Wikipedia/books" pipelines.

The pipeline, Spark-first and fully declarative:

1. featurize: unigrams + bigrams of the whitespace-tokenized text,
   hashed into ``buckets`` bins (md5-60 — the engine-portable hash the
   bloom/fingerprint family already uses, so a DuckDB oracle can
   replay every bin exactly);
2. fit: bin distributions p (target) and q (raw) with add-``alpha``
   smoothing; importance log-weight per bin = ln p_b − ln q_b;
3. score: every raw doc's log importance = Σ over its gram
   OCCURRENCES of its bin's log-weight (bag-of-hashed-ngrams
   unigram-model likelihood ratio, eq. 3 of the paper);
4. resample: Gumbel-top-k over the log-weights — add an independent
   Gumbel(0,1) to each doc's score and take the top k, which samples
   k docs WITHOUT replacement with probability ∝ exp(score) (the
   softmax-sampling identity). The Gumbel noise is derived from
   md5(doc_id, seed), so selection is deterministic, seed-replayable,
   and oracle-hashable.

Scale shape: the weight table is ``buckets`` rows (broadcast); fitting
is one map-side-combinable count per side; scoring is scan + explode +
broadcast join + per-doc partial agg; selection is TakeOrdered. No
shuffle grows with pair counts — cost is linear in corpus tokens, the
way the reference DSIR implementation's hashed featurization is.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

_MD60_MAX = float(1 << 60)


def _gram_rows(
    df: DataFrame, text_col: str, keep_cols: Sequence[str] = ()
) -> DataFrame:
    """One row per gram occurrence: ``keep_cols... , __g`` where the
    grams are unigrams + '_'-joined bigrams of the whitespace-
    normalized, lowercased text — pure column algebra, no UDF.
    Spark's sequence() DESCENDS when start > stop, so the <2-token
    case returns an empty slice instead (typed array<string>, safe to
    concat).

    SHAPE MATTERS (round-10 ×10 finding, 25× wall-clock): the gram
    array must be built INLINE inside the explode's own select.
    Materializing it as a named column first makes
    InferFiltersFromGenerate add ``size(__grams) > 0`` on the (cheap)
    attribute, and predicate pushdown then substitutes the FULL
    tokenize expression into that filter — whose higher-order-function
    lambda re-runs ``split(regexp_replace(...))`` per ELEMENT access,
    quadratic in tokens per doc (the SPARK-36715 class, reintroduced
    through the attribute-input shape; measured 55 s vs 2 s on 50k
    docs). With the expensive expression inline, the rule's own
    cheapness guard skips the inference."""
    d = df.withColumn(
        "__toks",
        F.split(
            F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " "
        ),
    )
    grams = F.concat(
        F.col("__toks"),
        F.expr(
            "CASE WHEN size(__toks) < 2 THEN slice(__toks, 1, 0) "
            "ELSE transform(sequence(0, size(__toks) - 2), "
            "i -> concat(__toks[i], '_', __toks[i + 1])) END"
        ),
    )
    return d.select(*keep_cols, F.explode(grams).alias("__g"))


def _bucket(gram: "F.Column", buckets: int) -> "F.Column":
    """md5-60 hash bin — non-negative, so % == pmod on both engines."""
    return (
        F.conv(F.substring(F.md5(gram), 1, 15), 16, 10).cast("long")
        % F.lit(buckets)
    )


def hashed_ngram_counts(
    df: DataFrame, text_col: str, buckets: int
) -> DataFrame:
    """(bucket, cnt) — the corpus's hashed-n-gram bag. ≤ ``buckets``
    rows out regardless of corpus size; partial aggregation makes the
    count map-side combinable."""
    return (
        _gram_rows(df, text_col)
        .select(_bucket(F.col("__g"), buckets).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def dsir_log_weights(
    target: DataFrame,
    raw: DataFrame,
    text_col: str,
    buckets: int = 10_000,
    alpha: float = 1.0,
) -> DataFrame:
    """Per-bin importance log-weight ln p_b − ln q_b with add-``alpha``
    smoothing over ``buckets`` bins: (bucket, log_w), ≤ ``buckets``
    rows — small enough to broadcast to the scoring scan. Bins unseen
    on one side get that side's smoothed floor; bins unseen on BOTH
    sides never occur in scoring (scored docs ⊆ raw), so the outer
    join covers everything scoring can probe."""
    p = hashed_ngram_counts(target, text_col, buckets).withColumnRenamed(
        "cnt", "tc"
    )
    q = hashed_ngram_counts(raw, text_col, buckets).withColumnRenamed(
        "cnt", "qc"
    )
    np_, nq_ = (
        p.agg(F.sum("tc")).first()[0] or 0,
        q.agg(F.sum("qc")).first()[0] or 0,
    )
    j = p.join(q, "bucket", "full_outer").select(
        "bucket",
        F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
        F.coalesce(F.col("qc"), F.lit(0)).alias("qc"),
    )
    return j.select(
        "bucket",
        (
            F.log((F.col("tc") + alpha) / F.lit(np_ + alpha * buckets))
            - F.log((F.col("qc") + alpha) / F.lit(nq_ + alpha * buckets))
        ).alias("log_w"),
    )


def dsir_scores(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: DataFrame,
    buckets: int,
) -> DataFrame:
    """Per-doc DSIR log importance: Σ over gram occurrences of the
    bin's log-weight, rounded to 6 (the repo's cross-engine ln
    discipline). Explode → broadcast join on the ≤``buckets``-row
    weight table → map-side-combinable per-doc sum. Every non-NULL
    text yields at least one unigram (even the empty string), so the
    aggregate covers every such doc and no corpus-sized zero-fill
    join is needed; NULL-text rows drop (filter upstream if they must
    score)."""
    occ = _gram_rows(df, text_col, [id_col]).select(
        id_col, _bucket(F.col("__g"), buckets).alias("bucket")
    )
    return (
        occ.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(F.round(F.sum("log_w"), 6).alias("dsir_score"))
    )


def dsir_resample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target: DataFrame,
    k: int,
    buckets: int = 10_000,
    alpha: float = 1.0,
    seed: int = 0,
    gumbel: bool = True,
) -> DataFrame:
    """Select ``k`` docs from ``df`` by importance resampling against
    ``target``: Gumbel-top-k over the DSIR log-weights (sampling
    without replacement ∝ exp(score)); ``gumbel=False`` degrades to
    deterministic top-k by score (the paper's "top-k heuristic"
    baseline). Returns the selected rows of ``df`` plus
    ``dsir_score`` and the ranking ``dsir_key``. Deterministic for a
    fixed seed — the Gumbel variate is md5-derived per (doc, seed) —
    and the key is rounded to 6 with a doc-id tiebreak so the cut is
    engine-stable."""
    w = dsir_log_weights(target, df, text_col, buckets, alpha)
    s = dsir_scores(df, id_col, text_col, w, buckets)
    if gumbel:
        u = (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            "_",
                            F.col(id_col).cast("string"),
                            F.lit(str(seed)),
                        )
                    ),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("double")
            + F.lit(0.5)
        ) / F.lit(_MD60_MAX)
        key = F.round(F.col("dsir_score") + -F.log(-F.log(u)), 6)
    else:
        key = F.col("dsir_score")
    ranked = s.withColumn("dsir_key", key)
    sel = ranked.orderBy(
        F.col("dsir_key").desc(), F.col(id_col)
    ).limit(k)
    # k rows: broadcast back onto the corpus to fetch the full rows
    return df.join(F.broadcast(sel), id_col).select(
        *df.columns, "dsir_score", "dsir_key"
    )
