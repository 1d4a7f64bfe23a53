"""Distributed training of a linear quality classifier — closed-form
least squares, integer-exact end to end.

Production corpus pipelines score documents with a cheap linear model
(a fastText/logreg-style classifier distilled from heuristics or
human labels) because at 100 TB the scorer must run at scan speed.
This module supplies BOTH halves in-engine:

- **training** is the minimum-squared-error discriminant (least
  squares onto ±1 targets — the classical closed-form linear
  classifier, equivalent to Fisher's LDA direction): ONE distributed
  aggregate over the feature table computes the exact integer moment
  sums XᵀX and Xᵀy, and the driver solves the k×k normal equations
  EXACTLY by Cramer's rule over Python's arbitrary-precision ints.
  Integer features × integer targets ⇒ every moment is a sum of
  integers — associative, commutative, partitioning-independent — so
  the trained model is bit-identical however the corpus is
  distributed, and the whole computation (moments, determinants,
  per-doc margins) replays in portable SQL (HUGEINT-exact in the
  oracle).  One corpus pass, a k(k+3)/2-cell collect: at scale the
  training cost is ONE narrow scan, not the T epoch scans of
  iterative trainers, and there is no oscillation/learning-rate
  tuning (the batch perceptron was tried and rejected: full-batch
  unit-rate updates flip-flop between all-positive and all-negative
  on imbalanced data — measured, see BASELINE.md round 9).
- **scoring** is a pure Column expression — the integer margin
  ``sign(det)·Σ det_j·x_j`` (the Cramer numerators ARE the weights,
  scaled by the positive determinant, so the margin's SIGN is the
  exact prediction and no division ever happens).  Zero-UDF,
  codegen'd: scoring 100 TB is one narrow projection, exactly like
  functions/text.quality_score whose weights are hand-set; here they
  are learned.

Class balance: with raw ±1 targets the least-squares threshold favors
the majority class (measured on the documents corpus: accuracy ~0.92,
precision 0.9–1.0, recall ~0.35 against the weak teacher, stable
across sf0.001–sf0.1); ``balanced=True``
regresses onto ±(opposite class count) instead — still exact integers
— which moves the operating point to recall 1.0 / accuracy 0.64.
Pick per use: pretraining-corpus quality gates usually want the
precision end (dropping a good doc is cheap, keeping junk is not).

Reference scope note: the reference (capital_sendas.py) has no
trained models; this extends the engine along the published
corpus-quality recipe (GPT-3/CCNet-style quality classifiers) next to
the hand-weighted quality_score and the corpus-trained bigram LM in
functions/text.py.
"""

from __future__ import annotations

from collections.abc import Sequence
from decimal import Decimal

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import normalized_text, token_count

# Tokens counted by the n_stop feature: high-frequency English function
# words — presence correlates with running prose, absence with
# boilerplate/code/tables (the same signal CCNet's LM proxy uses).
STOPWORDS = ("the", "and", "of", "to", "a", "in", "is", "that")


def quality_feature_exprs(col: Column | str) -> dict[str, Column]:
    """Integer per-document features over a text column, each exactly
    replayable in ANSI SQL (explicit char classes — no engine-specific
    ``\\s`` semantics): bias, token/char counts, digit/upper/punct
    char counts, stopword hits.  All BIGINT; ratios are deliberately
    absent (a linear model learns its own thresholds between counts,
    and integer features keep training exact)."""
    c = F.col(col) if isinstance(col, str) else col
    norm = normalized_text(c)
    toks = F.split(norm, " ")
    return {
        "bias": F.lit(1).cast("long"),
        "n_tokens": token_count(c),
        "n_chars": F.length(c).cast("long"),
        "n_digits": F.length(F.regexp_replace(c, "[^0-9]", "")).cast("long"),
        "n_upper": F.length(F.regexp_replace(c, "[^A-Z]", "")).cast("long"),
        "n_punct": F.length(
            F.regexp_replace(c, "[^.,!?;:]", "")
        ).cast("long"),
        "n_stop": F.when(norm == "", F.lit(0).cast("long")).otherwise(
            F.size(
                F.filter(toks, lambda t: t.isin(*STOPWORDS))
            ).cast("long")
        ),
    }


def weak_quality_label(feats: dict[str, Column]) -> Column:
    """The distillation teacher: +1 for documents that look like
    running prose (enough tokens, ≥10% stopwords, not digit-heavy),
    -1 otherwise.  A deliberately NONLINEAR rule over the features
    (two of the three tests are ratio/AND thresholds), so the linear
    student must actually generalize, not read off a hyperplane that
    exists by construction."""
    keep = (
        (feats["n_tokens"] >= 20)
        & (feats["n_stop"] * 10 >= feats["n_tokens"])
        & (feats["n_digits"] * 4 <= feats["n_chars"])
    )
    return F.when(keep, F.lit(1)).otherwise(F.lit(-1)).cast("long")


def _det(m: list[list[int]]) -> int:
    """Exact determinant by cofactor expansion — k is the FEATURE
    count (≤ ~6), so the k! cost is nothing and Python ints keep it
    exact at any magnitude."""
    k = len(m)
    if k == 1:
        return m[0][0]
    total = 0
    for j in range(k):
        minor = [row[:j] + row[j + 1 :] for row in m[1:]]
        total += (-1) ** j * m[0][j] * _det(minor)
    return total


def lsq_train(
    feats: DataFrame,
    feature_cols: Sequence[str],
    label_col: str,
    balanced: bool = False,
) -> tuple[list[int], int]:
    """Train the least-squares discriminant: one distributed aggregate
    collects the exact integer moments ``M = XᵀX`` (k(k+1)/2 sums) and
    ``V = Xᵀt`` (k sums) where ``t`` is the ±1 label — or, with
    ``balanced=True``, ±(opposite-class count), the integer form of
    inverse-class-frequency weighting.  The normal equations
    ``M·w = V`` are then solved EXACTLY by Cramer's rule on the
    driver: returns ``(numerators, det)`` with the sign folded so
    ``det > 0`` and ``w_j = numerators[j] / det`` — callers never
    divide; :func:`lsq_margin` scores with the numerators directly.

    Raises if ``det == 0`` (collinear features — drop one).

    Scale: ONE scan of ``feats``, a k(k+3)/2-cell collect, O(k·k!)
    driver arithmetic.  Train on a bounded sample upstream
    (``df.sample``) when the corpus is large; the moments are exact
    for whatever frame they see.  Feature-magnitude contract: the
    SQL-oracle replay holds while every 3×3 determinant fits HUGEINT
    (|moment| ≲ 1e12 keeps det ≲ 1e37) — counts-sized features at
    corpus scale are orders of magnitude inside it.

    Overflow is LOUD, not silent: per-row products are computed in
    DECIMAL(38,0) (two 19-digit factors always fit 38 digits, so the
    product itself cannot wrap) and summed in DECIMAL(38,0); a sum
    that exceeds 38 digits becomes NULL, which — on a non-empty frame
    — raises ``OverflowError`` instead of silently training a wrong
    model the way BIGINT wraparound would."""
    cols = list(feature_cols)
    k = len(cols)
    y = F.col(label_col).cast("long")
    if balanced:
        n_pos = feats.filter(y == 1).count()
        n_neg = feats.filter(y != 1).count()
        t = F.when(y == 1, F.lit(n_neg)).otherwise(F.lit(-n_pos)).cast(
            "long"
        )
    else:
        t = y

    def _d19(c: Column) -> Column:
        return c.cast("long").cast("decimal(19,0)")

    aggs = [
        F.sum(
            (_d19(F.col(a)) * _d19(F.col(b))).cast("decimal(38,0)")
        ).alias(f"m_{i}_{j}")
        for i, a in enumerate(cols)
        for j, b in enumerate(cols)
        if i <= j
    ] + [
        F.sum((_d19(F.col(c)) * _d19(t)).cast("decimal(38,0)")).alias(
            f"v_{j}"
        )
        for j, c in enumerate(cols)
    ] + [F.count(F.lit(1)).alias("__n_rows")]
    try:
        row = feats.select(*aggs).collect()[0].asDict()
    except Exception as exc:  # ANSI mode: overflow raises JVM-side
        if "NUMERIC_VALUE_OUT_OF_RANGE" in str(exc):
            raise OverflowError(
                "lsq_train: moment sum exceeded DECIMAL(38,0) — "
                "feature magnitudes break the exactness contract; "
                "clip or rescale features upstream"
            ) from exc
        raise
    n_rows = int(row.pop("__n_rows"))
    if n_rows > 0:
        nulled = sorted(key for key, val in row.items() if val is None)
        if nulled:
            raise OverflowError(
                "lsq_train: moment sum exceeded DECIMAL(38,0) for "
                f"{nulled} — feature magnitudes break the exactness "
                "contract; clip or rescale features upstream"
            )
    m = [
        [int(row[f"m_{min(i, j)}_{max(i, j)}"] or 0) for j in range(k)]
        for i in range(k)
    ]
    v = [int(row[f"v_{j}"] or 0) for j in range(k)]
    det = _det(m)
    if det == 0:
        raise ValueError(
            "lsq_train: singular moment matrix (collinear features)"
        )
    sgn = 1 if det > 0 else -1
    nums = []
    for j in range(k):
        mj = [r[:] for r in m]
        for i in range(k):
            mj[i][j] = v[i]
        nums.append(_det(mj) * sgn)
    return nums, det * sgn


def lsq_margin(
    numerators: Sequence[int], feature_cols: Sequence[str]
) -> Column:
    """The learned scorer as a pure Column: the det-scaled margin
    ``Σ num_j·x_j`` (DECIMAL(38,0)-exact — numerators are det-sized,
    features are counts, products stay well under 38 digits).  Its
    sign is the exact prediction; its value is the raw score times the
    positive determinant, so ranking/thresholding semantics are
    unchanged.  Apply to any frame carrying the feature columns —
    scan-speed corpus scoring, no UDF, no model object at runtime.

    Magnitude contract (ENFORCED, because non-ANSI decimal overflow
    would silently NULL every margin and make every prediction -1):
    each numerator must satisfy ``|num| < 1e30`` — checked here,
    raises ``ValueError`` — and each feature value must satisfy
    ``|x| < 1e7`` at scoring time (the ``decimal(7,0)`` cast; a
    larger value nulls that row's margin, so clip features like
    ``n_chars`` upstream for multi-MB documents).  The numerator
    bound holds whenever lsq_train's documented |moment| ≲ 1e12
    contract held during training (det ≲ 1e37 / margin headroom
    1e30·1e7 < 1e38)."""
    margin = None
    for nj, c in zip(numerators, feature_cols):
        if abs(int(nj)) >= 10**30:
            raise ValueError(
                f"lsq_margin: numerator for {c!r} is {int(nj):e}, "
                "outside the decimal(30,0) scoring split — training "
                "feature magnitudes exceeded the |moment| <= ~1e12 "
                "contract; rescale features and retrain"
            )
        term = F.lit(Decimal(int(nj))).cast("decimal(30,0)") * F.col(
            c
        ).cast("decimal(7,0)")
        margin = term if margin is None else margin + term
    return margin.cast("decimal(38,0)")
