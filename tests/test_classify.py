"""Closed-form least-squares quality classifier (operators/classify.py):
exactness, determinism, and classification-quality properties."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_sendas_spark.operators.classify import (
    lsq_margin,
    lsq_train,
    quality_feature_exprs,
    weak_quality_label,
)

from conftest import SF_ORACLE

COLS = ["bias", "n_tokens", "n_stop"]


def _doc_feats(spark):
    docs = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .filter(F.col("text").isNotNull())
    )
    fx = quality_feature_exprs("text")
    return docs.select(
        "doc_id", *[e.alias(k) for k, e in fx.items()]
    ).withColumn("y", weak_quality_label({k: F.col(k) for k in fx}))


def test_lsq_separates_planted_blobs(spark):
    """Two well-separated integer blobs: the closed-form discriminant
    classifies every training point (LSQ is not margin-maximizing, but
    with this separation the decision boundary has no excuse)."""
    rows = []
    # positives: high x2 relative to x1; negatives: the opposite
    for i in range(40):
        rows.append((1, 10 + (i % 5), 30 + (i % 7), 1))
        rows.append((1, 30 + (i % 7), 5 + (i % 3), -1))
    df = spark.createDataFrame(rows, "bias LONG, n_tokens LONG, n_stop LONG, y LONG")
    nums, det = lsq_train(df, COLS, "y")
    assert det > 0
    scored = df.select(
        "y", F.when(lsq_margin(nums, COLS) > 0, 1).otherwise(-1).alias("p")
    )
    assert scored.filter(F.col("p") != F.col("y")).count() == 0


def test_lsq_model_is_partitioning_invariant(spark):
    """Integer moments are exact whatever the partitioning: the SAME
    (numerators, det) come back from 1-partition and 17-partition
    layouts of the same frame — the determinism contract that float
    gradient training cannot offer."""
    feats = _doc_feats(spark)
    a = lsq_train(feats.coalesce(1), COLS, "y")
    b = lsq_train(feats.repartition(17), COLS, "y")
    assert a == b


def test_lsq_singular_moments_raise(spark):
    """Collinear features (a column duplicated) make XᵀX singular —
    fail loudly instead of dividing by a zero determinant."""
    df = spark.createDataFrame(
        [(1, 2, 2, 1), (1, 3, 3, -1), (1, 5, 5, 1)],
        "bias LONG, n_tokens LONG, n_stop LONG, y LONG",
    )
    with pytest.raises(ValueError, match="singular"):
        lsq_train(df, COLS, "y")


def test_lsq_quality_teacher_agreement_and_balanced_tradeoff(spark):
    """On the documents corpus: the plain model beats the base rate
    with perfect precision; the balanced model trades accuracy for
    full recall (the measured operating points in the module
    docstring, pinned loosely so corpus drift can't flake)."""
    feats = _doc_feats(spark).persist()
    try:
        n = feats.count()
        n_pos = feats.filter(F.col("y") == 1).count()
        base = max(n_pos, n - n_pos) / n

        nums, _ = lsq_train(feats, COLS, "y")
        m = lsq_margin(nums, COLS)
        sc = feats.select("y", F.when(m > 0, 1).otherwise(-1).alias("p"))
        acc = sc.filter(F.col("p") == F.col("y")).count() / n
        fp = sc.filter((F.col("p") == 1) & (F.col("y") == -1)).count()
        tp0 = sc.filter((F.col("p") == 1) & (F.col("y") == 1)).count()
        assert acc > base  # learned something beyond majority-class
        # precision end of the trade (measured 0.9–1.0 across SFs)
        assert tp0 > 0 and tp0 / (tp0 + fp) >= 0.85

        bnums, _ = lsq_train(feats, COLS, "y", balanced=True)
        bm = lsq_margin(bnums, COLS)
        bsc = feats.select("y", F.when(bm > 0, 1).otherwise(-1).alias("p"))
        fn_bal = bsc.filter(
            (F.col("p") == -1) & (F.col("y") == 1)
        ).count()
        tp_bal = bsc.filter((F.col("p") == 1) & (F.col("y") == 1)).count()
        assert tp_bal > 0 and fn_bal < n_pos  # recall moved up
        tp_plain = sc.filter(
            (F.col("p") == 1) & (F.col("y") == 1)
        ).count()
        assert tp_bal > tp_plain
    finally:
        feats.unpersist()


def test_lsq_margin_matches_rational_weights(spark):
    """The det-scaled integer margin orders and signs EXACTLY like the
    rational weights w = nums/det would: cross-checked per row on the
    driver with Python Fractions."""
    from fractions import Fraction

    feats = _doc_feats(spark).limit(60).persist()
    try:
        nums, det = lsq_train(_doc_feats(spark), COLS, "y")
        rows = feats.select(
            *COLS, lsq_margin(nums, COLS).alias("m")
        ).collect()
        w = [Fraction(nj, det) for nj in nums]
        for r in rows:
            exact = sum(wj * r[c] for wj, c in zip(w, COLS))
            assert (exact > 0) == (int(r["m"]) > 0) or exact == 0
            assert int(r["m"]) == sum(
                nj * r[c] for nj, c in zip(nums, COLS)
            )
    finally:
        feats.unpersist()


def test_lsq_train_overflow_is_loud(spark):
    """Moment sums that exceed DECIMAL(38,0) raise OverflowError
    (round-10 ADVICE fix) instead of silently wrapping BIGINT into a
    wrong model: two rows of ~9e18 features make Σx² ≈ 1.6e38 > 38
    digits."""
    big = 9_200_000_000_000_000_000
    df = spark.createDataFrame(
        [(1, big, 1), (1, big, -1)], "bias LONG, x LONG, y LONG"
    )
    with pytest.raises(OverflowError, match="DECIMAL"):
        lsq_train(df, ["bias", "x"], "y")


def test_lsq_train_decimal_path_matches_small_scale(spark):
    """The decimal-summed moments are integer-exact: same model as
    before the overflow-hardening on ordinary count-sized features."""
    rows = [(1, 3, 9, 1), (1, 5, 1, -1), (1, 4, 7, 1), (1, 6, 2, -1)]
    df = spark.createDataFrame(
        rows, "bias LONG, n_tokens LONG, n_stop LONG, y LONG"
    )
    nums, det = lsq_train(df, COLS, "y")
    # replay the normal equations in pure Python for the 4-row frame
    import itertools

    X = [r[:3] for r in rows]
    yv = [r[3] for r in rows]
    k = 3
    M = [
        [sum(x[i] * x[j] for x in X) for j in range(k)]
        for i in range(k)
    ]
    V = [sum(x[i] * t for x, t in zip(X, yv)) for i in range(k)]

    def det3(m):
        s = 0
        for p in itertools.permutations(range(3)):
            sign = 1
            for a in range(3):
                for b in range(a + 1, 3):
                    if p[a] > p[b]:
                        sign = -sign
            s += sign * m[0][p[0]] * m[1][p[1]] * m[2][p[2]]
        return s

    d = det3(M)
    sgn = 1 if d > 0 else -1
    exp_nums = []
    for j in range(k):
        mj = [row[:] for row in M]
        for i in range(k):
            mj[i][j] = V[i]
        exp_nums.append(det3(mj) * sgn)
    assert (nums, det) == (exp_nums, d * sgn)


def test_lsq_margin_rejects_oversized_numerators():
    """Numerators at/past 1e30 would silently NULL every margin in the
    decimal(30,0) scoring split — lsq_margin raises instead."""
    with pytest.raises(ValueError, match="decimal\\(30,0\\)"):
        lsq_margin([10**30, 1], ["a", "b"])
