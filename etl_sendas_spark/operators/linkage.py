"""Fuzzy record linkage: approximate string-match joins.

The entity-resolution shape (match customer/product/provider names
across systems that spell them differently) restated as the standard
two-phase distributed plan:

1. BLOCKING — candidate pairs share at least one character q-gram.
   This is not a heuristic here: an edit (insert/delete/substitute)
   destroys at most ``q`` of a string's ``L - q + 1`` q-grams, so two
   strings within edit distance ``k`` share at least
   ``L - q + 1 - k·q`` q-grams (count filtering, Gravano et al.,
   VLDB 2001 — public literature).  For ``L ≥ q·(k+1)`` that bound is
   ≥ 1, so the q-gram join has PERFECT recall and the operator
   enforces that length precondition rather than silently missing
   pairs.
2. VERIFY — exact Levenshtein on the candidates only, via the
   built-in JVM ``levenshtein`` expression (codegen'd, no Python).

Scale: the only corpus-sized shuffle is the posting-list self/cross
join keyed on the q-gram.  Hot q-grams make hot partitions — the same
skew surface as the n-gram dedup inverted index (AQE skew-join
handles moderate skew; for adversarial corpora swap the blocker for
the banded-LSH bucketer in operators/dedupe.py, trading the recall
proof for a probabilistic one).  Verification is embarrassingly
parallel and candidate-sized, not |L|×|R|.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.text import normalized_text


def _qgrams(col, q: int):
    """Distinct character q-grams of the normalized string.

    Fast path: ``zip_with`` over q shifted char slices — the lambda
    touches only lambda variables, so the normalization regex runs q
    times per ROW. The original ``transform(idx, i -> substring(norm,
    i, q))`` re-evaluated ``norm`` (a full regexp_replace) per GRAM in
    the interpreted higher-order-function path (HOFs are
    CodegenFallback). Strings shorter than q keep the original
    expression verbatim (including its descending-``sequence`` edge
    behavior), so the output is bit-identical everywhere.
    """
    norm = normalized_text(col)
    idx = F.sequence(F.lit(1), F.length(norm) - (q - 1))
    slow = F.transform(idx, lambda i: F.substring(norm, i, q))
    # split between every char: zero-width, not at start, must be
    # followed by a char — no leading/trailing empties
    chars = F.split(norm, r"(?!^)(?=.)")
    n_gr = F.length(norm) - (q - 1)
    parts = [F.slice(chars, j + 1, n_gr) for j in range(q)]
    fast = parts[0]
    for p in parts[1:]:
        fast = F.zip_with(fast, p, lambda a, b: F.concat(a, b))
    return F.array_distinct(
        F.when(F.length(norm) >= q, fast).otherwise(slow)
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_col: str,
    right_id: str,
    right_col: str,
    max_dist: int = 2,
    q: int = 2,
) -> DataFrame:
    """All (left, right) pairs with Levenshtein distance ≤ ``max_dist``
    between the match columns — exact result, sub-quadratic plan.

    Returns (left_id, right_id, left_col, right_col, dist).  Strings
    shorter than ``q·(max_dist+1)`` after normalization void the
    count-filtering recall guarantee, so the operator REJECTS them
    (raises on action via an assertion column) instead of silently
    dropping matches; pre-filter or brute-force the short stratum.
    """
    min_len = q * (max_dist + 1)

    def guarded_grams(col):
        # assert_true returns NULL on success and raises the job on
        # violation — the length precondition fails loudly instead of
        # silently missing matches
        ok = F.assert_true(
            F.length(normalized_text(col)) >= min_len,
            F.lit(
                f"fuzzy_join: string shorter than {min_len} voids the "
                "q-gram recall bound; brute-force the short stratum"
            ),
        )
        return F.when(ok.isNull(), _qgrams(col, q))

    l = left.select(
        F.col(left_id).alias("l_id"),
        F.col(left_col).alias("l_val"),
        guarded_grams(F.col(left_col)).alias("l_grams"),
    )
    r = right.select(
        F.col(right_id).alias("r_id"),
        F.col(right_col).alias("r_val"),
        guarded_grams(F.col(right_col)).alias("r_grams"),
    )
    lp = l.select("l_id", "l_val", F.explode("l_grams").alias("gram"))
    rp = r.select("r_id", "r_val", F.explode("r_grams").alias("gram"))
    cand = lp.join(rp, "gram").select("l_id", "l_val", "r_id", "r_val").distinct()
    # distance over the SAME normalized form the blocker used — the
    # recall bound only holds when both phases see one string space
    dist = F.levenshtein(
        normalized_text(F.col("l_val")), normalized_text(F.col("r_val"))
    )
    return (
        cand.withColumn("dist", dist)
        .filter(F.col("dist") <= max_dist)
        .select(
            F.col("l_id").alias(left_id),
            F.col("r_id").alias(right_id),
            F.col("l_val").alias(left_col),
            F.col("r_val").alias(right_col),
            F.col("dist").cast("int").alias("dist"),
        )
    )
