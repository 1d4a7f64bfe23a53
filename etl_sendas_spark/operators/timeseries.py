"""Sequential time-series folds that no window function expresses.

EWMA (exponential smoothing) is the canonical one: ``y_t = (1-a)*y_{t-1}
+ a*x_t`` depends on the PREVIOUS OUTPUT, not a previous input — a
recurrence, not a window aggregate. (A closed-form window sum with
``a^-i`` weights exists but overflows double for long histories, so the
honest distributed form is a per-key grouped fold.)

Same execution pattern as the R7 gap-anchor fold (``operators/
marking.py``): ONE shuffle on the key, Arrow-batched ``applyInPandas``,
the recurrence runs inside each group in explicit event order. The
fold loop applies the recurrence literally — ``y = (1.0 - a) * y +
a * x`` — so an engine replaying the same formula in the same order
(the DuckDB recursive-CTE oracle) reproduces it to the last ulp; we do
NOT use ``pandas.DataFrame.ewm``, whose internal weighting arithmetic
is algebraically equal but floating-point different.

At 100 TB the state per group is one double and the cost is one pass
per key — the same profile as any sessionization; skewed keys are a
single long group, which Arrow batches stream through without
materializing more than the group.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T


def ewma(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    alpha: float,
    out_col: str = "ewma",
) -> DataFrame:
    """Per-key exponential moving average in event order.

    ``y_1 = x_1`` (adjust-free initialization), then
    ``y_t = (1-alpha)*y_{t-1} + alpha*x_t``. Ties in ``order_cols``
    must be broken by a unique column for a deterministic series.
    Output: the input columns plus ``out_col`` (double, unrounded).
    """
    if not 0.0 < alpha <= 1.0:
        raise ValueError(f"ewma: alpha must be in (0, 1], got {alpha}")
    if not order_cols:
        raise ValueError("ewma: order_cols must be non-empty")
    keys = list(key_cols)
    order = list(order_cols)
    # a fresh StructType — StructType.add would MUTATE df's cached
    # schema object in place, desynchronizing df.columns from its plan
    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType())]
    )

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        xs = pdf[value_col].astype("float64").to_numpy()
        ys = xs.copy()
        for i in range(1, len(ys)):
            # literal recurrence — see module docstring re: float parity
            ys[i] = (1.0 - alpha) * ys[i - 1] + alpha * xs[i]
        pdf[out_col] = ys
        return pdf

    return df.groupBy(*keys).applyInPandas(fold, schema)


def group_ols(
    df,
    keys: "list[str]",
    x_col: str,
    y_col: str,
):
    """Per-group ordinary least squares of ``y`` on ``x`` in ONE
    aggregation: the five sufficient statistics (n, Σx, Σy, Σxy, Σx²,
    Σy²) accumulate as EXACT decimals — map-side combinable, one
    shuffle on the group key, no second pass, no window — and the
    closed-form slope/intercept/R² derive from them in float at the
    end. The decimal accumulation is what makes the result
    engine-portable: float summation order is the only
    non-determinism in textbook OLS, and it is gone before any
    division happens.

    Degenerate groups are NULL, not NaN: constant x → slope/intercept
    NULL (division by zero variance), constant y → R² NULL. Inputs
    must be exact at ≤6 decimals (the repo-wide decimal(28,6)
    discipline); returns ``(keys..., n, slope, intercept, r2)``
    unrounded — callers round for cross-engine hashing."""
    from pyspark.sql import functions as F

    x = F.col(x_col).cast("decimal(28,6)")
    y = F.col(y_col).cast("decimal(28,6)")
    agg = df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum((x * y).cast("decimal(38,12)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,12)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,12)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    cov = n * sxy - sx * sy
    slope = cov / F.nullif(vx, F.lit(0.0))
    return agg.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        slope.alias("slope"),
        ((sy - slope * sx) / n).alias("intercept"),
        (cov * cov / F.nullif(vx * vy, F.lit(0.0))).alias("r2"),
    )


def funnel_steps(
    events,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within: str | None = None,
):
    """Ordered-funnel analysis (the MATCH_RECOGNIZE / product-analytics
    "funnel" primitive): per funnel step k, how many users produced
    events matching ``steps[0..k]`` in STRICT timestamp order — step
    k's event must be strictly later than the user's matched step-k-1
    event. ``within`` (an INTERVAL literal, e.g. ``'7 days'``) bounds
    the whole funnel to a window opening at the matched first step.

    Plan: k chained earliest-match aggregates — step 1 is
    ``min(ts)`` per user over the step-1 events; step k joins the
    step-(k-1) frame (per-user, tiny) to the step-k events and takes
    ``min(ts) where ts > t_{k-1}``. Greedy earliest-completion
    chaining is exact for reachability: taking the EARLIEST valid
    event at each step can only enlarge the set of later events
    available, so a user completes the funnel under greedy iff they
    complete it under any strategy. Each stage shuffles only the
    step-filtered slim ``(user, ts)`` projection — k small
    hash-aggregates, no window over the raw feed, no UDF; at 100 TB
    the feed is scanned once per step with the type filter pushed to
    the scan (or once total if the source is type-partitioned).

    Returns one row per step: ``(step_idx, step, n_users,
    conversion)`` where conversion = n_users / step-1 users, rounded
    to 6 (step 1's conversion is 1.0 by definition; an empty step-1
    cohort yields zero rows for every step, not a divide-by-zero).
    """
    from pyspark.sql import functions as F

    if not steps:
        raise ValueError("funnel_steps: empty step list")
    spark = events.sparkSession
    slim = events.select(
        F.col(user_col).alias("u"),
        F.col(ts_col).alias("ts"),
        F.col(type_col).alias("et"),
    ).filter(F.col("ts").isNotNull())

    reached = (
        slim.filter(F.col("et") == steps[0])
        .groupBy("u")
        .agg(F.min("ts").alias("t"))
    )
    if within is not None:
        reached = reached.withColumn(
            "deadline", F.col("t") + F.expr(f"INTERVAL {within}")
        )
    counts = [reached.count()]
    for s in steps[1:]:
        nxt = slim.filter(F.col("et") == s).join(reached, "u")
        nxt = nxt.filter(F.col("ts") > F.col("t"))
        if within is not None:
            nxt = nxt.filter(F.col("ts") <= F.col("deadline"))
            nxt = nxt.groupBy("u", "deadline").agg(F.min("ts").alias("t"))
        else:
            nxt = nxt.groupBy("u").agg(F.min("ts").alias("t"))
        reached = nxt
        counts.append(reached.count())

    base = counts[0]
    rows = [
        (
            i + 1,
            s,
            int(c),
            round(c / base, 6) if base else 0.0,
        )
        for i, (s, c) in enumerate(zip(steps, counts))
        if base > 0
    ]
    return spark.createDataFrame(
        rows, "step_idx int, step string, n_users bigint, conversion double"
    )


def resample_ffill(
    df: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_col: str,
    step_seconds: int,
    agg: str = "avg",
) -> DataFrame:
    """Regularize an irregular per-key time series onto a fixed grid
    with forward fill — the resample/gap-fill every monitoring,
    feature-engineering, and as-of pipeline needs before windowed
    math (a rolling mean over irregular samples is biased by sampling
    density; the grid fixes the denominator).

    Buckets are ``floor(epoch/step)*step``; per ``(keys, bucket)`` the
    value aggregates (``avg``/``min``/``max``/``last`` by event time);
    each key's grid spans ITS OWN min..max bucket (``sequence`` +
    explode — no global calendar join), empty buckets carry ``n = 0``
    and forward-fill their value from the most recent populated
    bucket.  The first bucket of every key is populated by
    construction, so the fill is total.

    Returns ``(keys..., bucket_ts, n, value, filled)`` with ``value``
    rounded to 6 (cross-engine float discipline).

    Scale shape: one hash aggregate on ``(keys, bucket)``, one
    per-key window for the fill (second exchange, keys-only), and the
    grid explode is output-sized — nothing depends on the raw event
    count beyond the first aggregate.  Skewed keys skew only their
    own grid length (bounded by time span / step, not event count).
    """
    from pyspark.sql import Window, functions as F

    if agg not in ("avg", "min", "max", "last"):
        raise ValueError(f"resample_ffill: unsupported agg {agg!r}")
    keys = list(keys)
    bucket = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / step_seconds)
        * step_seconds
    ).cast("long")
    base = df.select(*keys, bucket.alias("__b"), F.col(value_col).alias("__v"), F.col(ts_col).alias("__ts"))
    if agg == "last":
        val = F.max_by("__v", "__ts")
    else:
        val = getattr(F, agg)("__v")
    per_bucket = base.groupBy(*keys, "__b").agg(
        F.count(F.lit(1)).alias("n"), val.alias("__val")
    )
    spans = per_bucket.groupBy(*keys).agg(
        F.min("__b").alias("__lo"), F.max("__b").alias("__hi")
    )
    grid = spans.select(
        *keys,
        F.explode(
            F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step_seconds))
        ).alias("__b"),
    )
    joined = grid.join(per_bucket, [*keys, "__b"], "left_outer")
    w = (
        Window.partitionBy(*keys)
        .orderBy("__b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        *keys,
        F.col("__b").cast("timestamp").alias("bucket_ts"),
        F.coalesce(F.col("n"), F.lit(0)).cast("long").alias("n"),
        F.round(
            F.last(F.col("__val"), ignorenulls=True).over(w).cast("double"),
            6,
        ).alias("value"),
        F.when(F.col("n").isNull(), F.lit(1)).otherwise(F.lit(0)).cast("int").alias("filled"),
    )
