"""Relational core operators (SURVEY.md §2.3-§2.7), Spark-first.

The reference leans on four pandas idioms with no direct Spark
analog; each gets one composable operator here:

- ``drop_duplicates(subset=K, keep='first')`` (capital_sendas.py:179,
  191,270,405,406,423,499) → :func:`keep_first` — a ``row_number()``
  window with an EXPLICIT deterministic tiebreak (the reference relies
  on silent file/row order; we require an order column, normally the
  engine row id).
- ``~duplicated(...)`` first-row flag (:556) → :func:`first_flag`.
- index-aligned ``df.update(sub)`` / ``df.loc[idx, col] = v`` (:380,
  409,429,543,559) → :func:`update_by_row_id` — left join on the
  synthetic row id + ``coalesce``.
- all-column anti-join dedup across files (:117-123) →
  :func:`anti_join_all_columns`.

All operators are lazy DataFrame→DataFrame; shuffles happen only on
the declared keys and Catalyst/AQE pick physical strategies.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..sources.readers import ROW_ID


def _cols(cs: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in cs]


def _order_nulls_last(cs: Sequence[str | Column]) -> list[Column]:
    """Order columns with NULLS LAST for plain-name ascending sorts.

    Spark's default ascending sort is NULLS FIRST; both the pandas
    reference (``sort_values`` puts NaN last) and the DuckDB oracles
    (ASC is NULLS LAST) sort nulls last — a null in an order column
    would otherwise pick a different surviving row than reference and
    oracle. Explicit Column objects pass through untouched (the
    caller's asc/desc/nulls choice wins).
    """
    return [F.col(c).asc_nulls_last() if isinstance(c, str) else c for c in cs]


def keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column] | None = None,
) -> DataFrame:
    """Keyed dedup keeping the first row per key in ``order_by`` order.

    One shuffle on ``keys``; at scale this is the canonical
    window-dedup (AQE handles skewed keys). Nulls group together,
    matching pandas' default treatment in the reference's dedups;
    null ORDER values sort last (pandas/DuckDB semantics).
    """
    order = _order_nulls_last(order_by) if order_by else [F.col(ROW_ID)]
    w = Window.partitionBy(*_cols(keys)).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def first_flag(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column] | None = None,
    flag_col: str = "validacion",
) -> DataFrame:
    """1 for the first row per key, 0 for the rest (reference A4, :556).

    Null order values sort last, mirroring :func:`keep_first`."""
    order = _order_nulls_last(order_by) if order_by else [F.col(ROW_ID)]
    w = Window.partitionBy(*_cols(keys)).orderBy(*order)
    return df.withColumn(
        flag_col, F.when(F.row_number().over(w) == 1, F.lit(1)).otherwise(F.lit(0))
    )


def update_by_row_id(
    base: DataFrame,
    updates: DataFrame,
    value_col: str,
    row_id: str = ROW_ID,
) -> DataFrame:
    """Re-expression of pandas index-aligned ``df.update(sub)``.

    ``updates`` carries (row_id, value_col); rows present there
    overwrite ``base``'s column, others keep their value. The join is
    on a unique synthetic key, so Catalyst can broadcast small update
    sets; with AQE the plan adapts when an update set is large.
    """
    upd = updates.select(
        F.col(row_id), F.col(value_col).alias("__upd_value")
    )
    return (
        base.join(upd, on=row_id, how="left")
        .withColumn(value_col, F.coalesce(F.col("__upd_value"), F.col(value_col)))
        .drop("__upd_value")
    )


def anti_join_all_columns(df_new: DataFrame, df_seen: DataFrame) -> DataFrame:
    """Rows of ``df_new`` whose full column tuple never appears in ``df_seen``.

    Null-safe on every column (pandas merge treats NaN==NaN as a match
    on join keys), which plain ``left_anti`` equality would not —
    hence the ``eqNullSafe`` condition.
    """
    # rename the probe side so column resolution is unambiguous even when
    # df_seen derives from df_new (self-referential lineage)
    seen = df_seen.select(
        *[F.col(c).alias(f"__seen_{i}") for i, c in enumerate(df_new.columns)]
    )
    cond = None
    for i, c in enumerate(df_new.columns):
        clause = df_new[c].eqNullSafe(F.col(f"__seen_{i}"))
        cond = clause if cond is None else (cond & clause)
    return df_new.join(seen, on=cond, how="left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts_col: str,
    payload_cols: Sequence[str],
    right_ts_alias: str | None = None,
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key (nulls when no
    prior right row exists).

    Spark-first formulation: tag and UNION both sides, then carry the
    most recent right payload forward with ``last(..., ignoreNulls)``
    over one (key, ts) window — a single shuffle on the equi-key, no
    per-row range probe and no skew-prone range join. At equal
    timestamps the right row sorts first (ties are as-of matches,
    mirroring SQL ASOF's ``>=``).
    """
    keys = list(on)
    lpay = [c for c in left.columns if c not in keys and c != ts_col]
    l_side = left.select(
        *keys,
        F.col(ts_col),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in lpay],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in payload_cols],
        F.lit(None).cast(right.schema[ts_col].dataType).alias("__r_ts"),
    )
    r_side = right.select(
        *keys,
        F.col(ts_col),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lpay],
        *[F.col(c).alias(f"__r_{c}") for c in payload_cols],
        F.col(ts_col).alias("__r_ts"),
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col), F.col("__side"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_side.unionByName(r_side).select(
        "*",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}")
            for c in payload_cols
        ],
        F.last("__r_ts", ignorenulls=True).over(w).alias(f"__asof_ts"),
    )
    out_alias = right_ts_alias or f"{ts_col}_right"
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *keys,
            F.col(ts_col),
            *[F.col(c) for c in lpay],
            *[F.col(f"__asof_{c}").alias(f"right_{c}") for c in payload_cols],
            F.col("__asof_ts").alias(out_alias),
        )
    )


def bounded_range_join(
    left: DataFrame,
    right: DataFrame,
    ts_left: str,
    ts_right: str,
    lower_s: int,
    upper_s: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Inner join on ``right.ts ∈ (left.ts + lower_s, left.ts + upper_s]``
    (seconds), with optional extra equi-keys — WITHOUT the
    BroadcastNestedLoopJoin a bare inequality predicate compiles to.

    Both sides bucket time by ``width = upper_s - lower_s``; the left
    row explodes to the ≤ 2 buckets its window can touch, so the range
    condition becomes a hash-equi join on (bucket, *on) plus an exact
    row-local filter. Cost is one shuffle per side and each pair is
    examined at most once — the standard interval-join layout of
    stream processors, usable in batch and Structured Streaming alike.
    """
    width = int(upper_s - lower_s)
    if width <= 0:
        raise ValueError("upper_s must exceed lower_s")
    # fractional-second epoch for bucketing (unix_timestamp truncates —
    # a sub-second event at a bucket edge would land one bucket short);
    # the exact filter below uses native timestamp + INTERVAL arithmetic
    l_epoch = F.col(ts_left).cast("double")
    r_epoch = F.col(ts_right).cast("double")
    lo = F.floor((l_epoch + lower_s) / width).cast("long")
    hi = F.floor((l_epoch + upper_s) / width).cast("long")
    lhs = left.withColumn("__bucket", F.explode(F.sequence(lo, hi)))
    rhs = right.withColumn("__bucket", F.floor(r_epoch / width).cast("long"))
    cond = [lhs["__bucket"] == rhs["__bucket"]] + [
        lhs[k] == rhs[k] for k in on
    ]
    joined = lhs.join(rhs, functools.reduce(lambda a, b: a & b, cond), "inner")
    l_ts, r_ts = lhs[ts_left], rhs[ts_right]
    in_range = (
        r_ts > l_ts + F.expr(f"INTERVAL {lower_s} SECONDS")
    ) & (r_ts <= l_ts + F.expr(f"INTERVAL {upper_s} SECONDS"))
    return joined.filter(in_range).drop(lhs["__bucket"]).drop(rhs["__bucket"])


def keep_first_salted(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    n_salt: int = 16,
    salt_on: str | Column | None = None,
) -> DataFrame:
    """:func:`keep_first` for HOT keys: two-phase window dedup.

    Phase 1 deduplicates within ``(key, salt)`` — ``n_salt``× more,
    proportionally smaller partitions; phase 2 reduces the ≤ ``n_salt``
    survivors per key. Exact for keep-first semantics because
    min-by-order is associative. ``salt_on`` (default: the first order
    column) must be deterministic — never ``rand()``, which breaks
    retry/replay exactness at scale.

    WHEN TO USE (measured, see BASELINE.md skew section): on Spark
    ≥3.5 the plain :func:`keep_first` compiles to a map-side
    ``WindowGroupLimit`` — top-1-per-key runs BEFORE the shuffle, so
    even a key holding 50 % of all rows produces a uniform task
    histogram and plain beats salted by the cost of the extra shuffle.
    Reach for the salted form on engines without group-limit pushdown,
    or for hot-key operations WindowGroupLimit cannot cover (full-group
    window aggregates where every row survives to the reduce side).
    """
    basis = salt_on if salt_on is not None else order_by[0]
    basis_col = F.col(basis) if isinstance(basis, str) else basis
    salted = df.withColumn("__salt", F.pmod(F.xxhash64(basis_col), F.lit(n_salt)))
    phase1 = keep_first(salted, [*keys, "__salt"], order_by)
    return keep_first(phase1, keys, order_by).drop("__salt")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    assert_unique_keys: bool = False,
) -> DataFrame:
    """Generate the I/U/D change feed that turns ``old`` into ``new`` —
    the other half of :func:`merge_changes`, so
    ``merge_changes(old, snapshot_diff(old, new, keys), keys)`` equals
    ``new`` (the round-trip property ``tests`` pin).

    PRECONDITION (shared with :func:`merge_changes`): ``keys`` is
    unique within EACH snapshot. Duplicate keys turn the full-outer
    join into a per-key cross product — spurious 'U' rows, and the
    round-trip law no longer holds. The default trusts the caller
    (snapshots normally come from a keyed sink); pass
    ``assert_unique_keys=True`` to pay one counting pass per side and
    fail fast with the offending side named instead.

    ONE null-safe full-outer join on ``keys``; each side's presence is
    detected with a literal flag column (never by key-null checks, which
    would misclassify legitimately-null key values). Value comparison is
    null-safe per column. At 100 TB both snapshots shuffle once on the
    key — the standard reconciliation shape; when one side is known
    small (an incremental batch), AQE picks the broadcast plan by size.
    Unchanged rows produce NO feed row, so the output is change-sized,
    not snapshot-sized.
    """
    value_cols = [c for c in old.columns if c not in keys]
    if set(old.columns) != set(new.columns):
        raise ValueError("snapshot_diff requires identical schemas")
    if assert_unique_keys:
        for side, df in (("old", old), ("new", new)):
            n_dup = (
                df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
            )
            if n_dup:
                raise ValueError(
                    f"snapshot_diff: duplicate key(s) in '{side}' snapshot on "
                    f"{list(keys)}; the diff would cross-product those rows"
                )
    o = old.withColumn("__in_old", F.lit(1)).alias("o")
    n = new.withColumn("__in_new", F.lit(1)).alias("n")
    cond = functools.reduce(
        lambda x, y: x & y,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    in_old = F.col("o.__in_old").isNotNull()
    in_new = F.col("n.__in_new").isNotNull()
    changed = functools.reduce(
        lambda x, y: x | y,
        [~F.col(f"o.{v}").eqNullSafe(F.col(f"n.{v}")) for v in value_cols],
        F.lit(False),
    )
    op = (
        F.when(in_old & ~in_new, F.lit("D"))
        .when(~in_old & in_new, F.lit("I"))
        .when(changed, F.lit("U"))
    )
    out_keys = [
        F.coalesce(F.col(f"n.{k}"), F.col(f"o.{k}")).alias(k) for k in keys
    ]
    # D rows carry the old values (the merge only needs the key), I/U the new
    out_vals = [
        F.when(in_new, F.col(f"n.{v}")).otherwise(F.col(f"o.{v}")).alias(v)
        for v in value_cols
    ]
    return (
        j.select(*out_keys, *out_vals, op.alias(op_col))
        .filter(F.col(op_col).isNotNull())
    )


def merge_changes(
    base: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    op_col: str = "op",
    seq_col: str | None = None,
) -> DataFrame:
    """CDC merge (MERGE INTO semantics): apply an insert/update/delete
    change feed onto a base table — the incremental-maintenance shape
    the reference approximates by re-running its whole month batch
    (capital_sendas.py re-derives every output from scratch each run).

    ``changes`` carries the base's columns plus ``op_col`` in
    {'I','U','D'}. PRECONDITION (shared with :func:`snapshot_diff`):
    ``keys`` is unique in ``base``, and in ``changes`` after the
    optional ``seq_col`` resolution — duplicates cross-product the
    join. If ``seq_col`` is given, last-writer-wins per key is
    resolved first (one window shuffle); then ONE full-outer join on
    ``keys`` applies the net change: unmatched base rows survive, 'D'
    drops, 'I'/'U' take the change row's values. At 100 TB the change
    feed is normally orders of magnitude smaller than the base, so the
    join is shuffle-on-base/broadcast-or-shuffle-on-changes — never a
    rewrite of unchanged partitions' *content*, and AQE picks the
    physical join by actual feed size.
    """
    if seq_col is not None:
        changes = keep_first(
            changes, keys=list(keys), order_by=[F.col(seq_col).desc()]
        )
    value_cols = [c for c in base.columns if c not in keys]
    b = base.alias("b")
    c = changes.alias("c")
    cond = functools.reduce(
        lambda x, y: x & y,
        [F.col(f"b.{k}").eqNullSafe(F.col(f"c.{k}")) for k in keys],
    )
    joined = b.join(c, cond, "full_outer")
    has_change = F.col(f"c.{op_col}").isNotNull()
    out_keys = [
        F.coalesce(F.col(f"c.{k}"), F.col(f"b.{k}")).alias(k) for k in keys
    ]
    out_vals = [
        F.when(has_change, F.col(f"c.{v}")).otherwise(F.col(f"b.{v}")).alias(v)
        for v in value_cols
    ]
    return joined.filter(
        ~has_change | (F.col(f"c.{op_col}") != "D")
    ).select(*out_keys, *out_vals)


def invoices_containing(
    df: DataFrame, invoice_col: str, service_col: str, service_value: str
) -> Column:
    """Window-based membership flag: does this row's invoice contain
    ``service_value`` anywhere? (reference J8, :445,455).

    Preferred over the collect-to-driver ``unique()`` + ``isin`` of the
    reference and over a self-join: a single ``max(when(...))`` window
    on the invoice key — one shuffle, no driver round-trip, no
    broadcast of an unbounded value list.
    """
    w = Window.partitionBy(invoice_col)
    return (
        F.max(F.when(F.col(service_col) == service_value, 1).otherwise(0)).over(w) == 1
    )


def scd2_history(
    df: DataFrame,
    key: str,
    order_cols: Sequence[str],
    state_col: str,
) -> DataFrame:
    """Slowly-changing-dimension type-2 history build: collapse an
    ordered change feed into validity intervals per key.

    Classic gaps-and-islands: a null-safe lag-compare marks state
    changes, its running sum numbers the segments, and one aggregate
    per (key, segment) yields ``valid_from`` / ``n_events``;
    ``valid_to`` is the next segment's start (open interval,
    ``NULL`` = current). This is how a warehouse derives a versioned
    dimension (with effective-dating) from an event/CDC stream —
    the inverse of :func:`asof_join`, which reads such a history
    back at a point in time.

    Scale: every window is keyed by ``key`` alone and there is NO
    segment-keyed aggregate — segment boundaries are marked in the
    ordered pass, non-start rows are filtered out scan-side, and the
    interval end / row count come from ``lead`` over the surviving
    start rows — so the whole build costs exactly ONE hash exchange
    on the key at any corpus size (plan-tested); no self-join, no
    driver state. (The first formulation aggregated by (key, segment),
    which re-shuffled on the refined key — measurably a second
    corpus-sized exchange.) Ties in the event order must be broken by
    a unique column in ``order_cols`` for a deterministic history.
    """
    if not order_cols:
        raise ValueError("scd2_history: order_cols must be non-empty")
    order = [F.col(c) for c in order_cols]
    w = Window.partitionBy(key).orderBy(*order)
    whole = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    chg = F.when(
        ~F.lag(state_col).over(w).eqNullSafe(F.col(state_col)), 1
    ).otherwise(0)
    first_order = order_cols[0]
    marked = df.select(
        F.col(key).alias(key),
        F.col(state_col).alias("state"),
        F.col(first_order).alias("valid_from"),
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(whole).alias("__total"),
        ((F.row_number().over(w) == 1) | (chg == 1)).alias("__start"),
    )
    starts = marked.filter(F.col("__start"))
    w2 = Window.partitionBy(key).orderBy("__rn")
    return starts.select(
        key,
        "state",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        (
            F.coalesce(F.lead("__rn").over(w2), F.col("__total") + 1)
            - F.col("__rn")
        ).alias("n_events"),
        F.lead("valid_from").over(w2).isNull().alias("is_current"),
    )
