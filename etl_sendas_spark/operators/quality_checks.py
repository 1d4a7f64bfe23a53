"""Data-quality expectations: declarative checks evaluated
scan-efficiently, returning a violations report instead of a crash.

The production counterpart of an assert: a 100 TB ingest wave is
validated BEFORE it merges — null rates, key uniqueness, accepted
value domains, numeric ranges, referential integrity — and the report
(one row per rule) drives the quarantine/alert decision. The WHOLE
suite compiles into ONE aggregate over ONE scan of the fact table
(one Spark job), whatever the rule mix:

- ``not_null`` / ``in_set`` / ``in_range`` are conditional sums —
  map-side combinable;
- each ``unique`` rule is ``count(*) - count(DISTINCT struct(keys))``
  in the same aggregate (a struct is never NULL, so NULL-keyed rows
  count exactly like the groupBy formulation they replace). Spark
  evaluates mixed distinct aggregates with one Expand over the scan —
  still a single pass, though each distinct rule multiplies the
  expanded row stream; suites with MANY unique rules over a 100 TB
  fact should weigh that against one extra scan per rule;
- each ``foreign_key`` rule against a DIMENSION-sized ref becomes a
  broadcast LEFT join against the referenced (distinct) keys stacked
  under the aggregate, violations = rows whose key is non-NULL and
  unmatched — the anti-join reformulated so it fuses into the same
  scan. A FACT-sized ref (estimated via Catalyst plan stats, override
  with ``"broadcast": True/False`` on the rule) would make the
  broadcast build the bottleneck, so it routes through a standalone
  LEFT ANTI branch instead — one extra job, but its scan prunes to the
  single key column, so at 100 TB it reads one column, not the table.

So the whole suite costs one full-width scan plus at most one
single-column scan per fact-sized FK — versus one scan per rule class
in the naive formulation.

Rules are plain dicts so suites can live in config, not code:

    [{"rule": "not_null", "col": "l_orderkey"},
     {"rule": "in_set", "col": "l_returnflag", "values": ["A","N","R"]},
     {"rule": "in_range", "col": "l_discount", "lo": 0.0, "hi": 0.1},
     {"rule": "unique", "cols": ["l_orderkey", "l_linenumber"]},
     {"rule": "foreign_key", "col": "l_orderkey",
      "ref": orders_df, "ref_col": "o_orderkey"}]

NULL semantics: ``in_set`` and ``in_range`` count NULL as a violation
only if ``count_null`` is set (default False — compose with
``not_null`` to assert both, so each rule reports one failure mode).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# A ref whose Catalyst-estimated size exceeds this is "fact-sized": the
# broadcast hashed-relation build would dominate, so its FK check runs
# as a standalone single-column anti-join branch instead. Matches the
# order of spark.sql.autoBroadcastJoinThreshold's spirit but applied to
# the PRE-distinct ref estimate we actually have.
_FK_BROADCAST_MAX_BYTES = 64 << 20


def _ref_is_small(ref: DataFrame, override: "bool | None") -> bool:
    if override is not None:
        return bool(override)
    try:
        size = (
            ref._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
        return int(size) <= _FK_BROADCAST_MAX_BYTES
    except Exception:  # stats unavailable: assume dimension-shaped
        return True


def expectation_report(df: DataFrame, rules: list[dict[str, Any]]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    ``(rule, target, violations, n_rows, passed)`` in the order given.
    Compiles to ONE aggregate over ONE scan (see module docstring).
    """
    if not rules:
        raise ValueError("expectation_report: empty rule list")
    exprs = [F.count(F.lit(1)).alias("__n")]
    targets: list[tuple[str, str]] = []
    joined = df
    heavy: dict[int, DataFrame] = {}  # rule idx -> 1-row violation frame

    for i, r in enumerate(rules):
        kind = r["rule"]
        alias = f"__v{i}"
        if kind == "not_null":
            c = r["col"]
            exprs.append(F.sum(F.col(c).isNull().cast("long")).alias(alias))
            targets.append((kind, c))
        elif kind == "in_set":
            c = r["col"]
            bad = ~F.col(c).isin(list(r["values"]))
            if not r.get("count_null", False):
                bad = bad & F.col(c).isNotNull()
            exprs.append(F.sum(bad.cast("long")).alias(alias))
            targets.append((kind, c))
        elif kind == "in_range":
            c = r["col"]
            bad = (F.col(c) < r["lo"]) | (F.col(c) > r["hi"])
            if not r.get("count_null", False):
                bad = bad & F.col(c).isNotNull()
            exprs.append(F.sum(bad.cast("long")).alias(alias))
            targets.append((kind, c))
        elif kind == "unique":
            cols = list(r["cols"])
            exprs.append(
                (
                    F.count(F.lit(1))
                    - F.count_distinct(F.struct(*[F.col(c) for c in cols]))
                ).alias(alias)
            )
            targets.append((kind, ",".join(cols)))
        elif kind == "foreign_key":
            c, ref, ref_col = r["col"], r["ref"], r["ref_col"]
            if _ref_is_small(ref, r.get("broadcast")):
                key, flag = f"__fkk{i}", f"__fkf{i}"
                refk = (
                    ref.select(F.col(ref_col).alias(key))
                    .distinct()
                    .withColumn(flag, F.lit(1))
                )
                joined = joined.join(
                    F.broadcast(refk), F.col(c) == F.col(key), "left"
                )
                exprs.append(
                    F.sum(
                        (F.col(c).isNotNull() & F.col(flag).isNull()).cast(
                            "long"
                        )
                    ).alias(alias)
                )
            else:
                # pre-aggregate fact keys (map-side combinable) so the
                # anti-join shuffles one row per DISTINCT key, not one
                # per fact row — ~rows-per-key x fewer shuffled bytes
                keyed = (
                    df.select(F.col(c).alias("__k"))
                    .filter(F.col("__k").isNotNull())
                    .groupBy("__k")
                    .agg(F.count(F.lit(1)).alias("__c"))
                )
                heavy[i] = keyed.join(
                    ref.select(F.col(ref_col).alias("__k")).distinct(),
                    "__k",
                    "left_anti",
                ).agg(
                    F.coalesce(F.sum("__c"), F.lit(0))
                    .cast("long")
                    .alias(alias)
                )
            targets.append((kind, c))
        else:
            raise ValueError(f"unknown rule kind {kind!r}")

    report = joined.agg(*exprs)
    for frame in heavy.values():
        report = report.crossJoin(F.broadcast(frame))
    rows = [
        F.struct(
            F.lit(kind).alias("rule"),
            F.lit(target).alias("target"),
            F.coalesce(F.col(f"__v{i}"), F.lit(0)).cast("long").alias(
                "violations"
            ),
        )
        for i, (kind, target) in enumerate(targets)
    ]
    return report.select(
        F.explode(F.array(*rows)).alias("r"), F.col("__n").alias("n_rows")
    ).select(
        "r.rule",
        "r.target",
        "r.violations",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("r.violations") == 0).alias("passed"),
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Population Stability Index between a reference snapshot and the
    current wave — the standard production drift monitor for a numeric
    feature (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted).

    Both frames are binned into ``n_bins`` equi-width buckets over
    [lo, hi) (values clamp into the edge bins, so outliers land in bin
    0 / n_bins-1 instead of vanishing); bin shares are Laplace-smoothed
    with +0.5 per bin (a bin empty on one side must not produce
    ln(0) = ±inf — smoothing is how PSI is deployed, and it keeps the
    statistic exactly replayable in ANSI SQL). PSI per group =
    Σ_bins (p_cur - p_ref) · ln(p_cur / p_ref), rounded to 6. A bin
    empty on BOTH sides is skipped rather than densified: its smoothed
    term is exactly 0 when the two sides have equal totals and
    O(Δ/N²) otherwise — noise the 6-decimal round keeps out of the
    report, at the price of never shipping a bins×groups cross join.

    ``lo``/``hi`` default to the REFERENCE min/max, computed eagerly in
    one tiny aggregate — the deployed pattern (bin edges are frozen
    from the reference window so the monitor itself cannot drift).

    Scale shape: each side is one scan → one (group, bin) aggregate
    (map-side combinable counts, at most groups×n_bins rows survive);
    the two bin tables join on (group, bin) — a broadcast-sized frame
    for any sane group cardinality. Null values drop (missing-outcome
    policy, same as the A/B readout). NOT a sketch: counts are exact,
    so the report is deterministic and oracle-checkable.
    """
    if n_bins < 2:
        raise ValueError(f"psi_drift: n_bins must be >= 2, got {n_bins}")
    gcols = list(group_cols or [])
    v = F.col(value_col).cast("double")
    if lo is None or hi is None:
        row = ref.select(
            F.min(v).alias("lo"), F.max(v).alias("hi")
        ).first()
        lo = float(row["lo"]) if lo is None else lo
        hi = float(row["hi"]) if hi is None else hi
    if not hi > lo:
        raise ValueError(f"psi_drift: need hi > lo, got [{lo}, {hi}]")

    def binned(df: DataFrame, tag: str) -> DataFrame:
        b = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(n_bins))
        b = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), b)).cast("int")
        return (
            df.filter(v.isNotNull())
            .select(*gcols, b.alias("bin"))
            .groupBy(*gcols, "bin")
            .agg(F.count("*").alias(f"n_{tag}"))
        )

    r, c = binned(ref, "ref"), binned(cur, "cur")
    # name-list full_outer join: Spark emits ONE already-coalesced copy
    # of each join column, so only the count sides need a null fill
    joined = r.join(c, [*gcols, "bin"], "full_outer").select(
        *gcols,
        "bin",
        F.coalesce(F.col("n_ref"), F.lit(0)).alias("n_ref"),
        F.coalesce(F.col("n_cur"), F.lit(0)).alias("n_cur"),
    )
    tot = Window.partitionBy(*gcols) if gcols else Window.partitionBy(F.lit(1))
    p_ref = (F.col("n_ref") + F.lit(0.5)) / (
        F.sum("n_ref").over(tot) + F.lit(0.5 * n_bins)
    )
    p_cur = (F.col("n_cur") + F.lit(0.5)) / (
        F.sum("n_cur").over(tot) + F.lit(0.5 * n_bins)
    )
    term = (p_cur - p_ref) * F.log(p_cur / p_ref)
    return (
        joined.withColumn("term", term)
        .groupBy(*gcols)
        .agg(
            F.round(F.sum("term"), 6).alias("psi"),
            F.sum("n_ref").alias("n_ref"),
            F.sum("n_cur").alias("n_cur"),
        )
    )


def ks_drift(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift statistic per group:
    ``D = sup_x |F_ref(x) - F_cur(x)|`` — the binning-free companion to
    :func:`psi_drift` (PSI depends on the frozen bin edges; KS is the
    exact distributional distance, sensitive where PSI's 10 bins are
    blind, e.g. a pure within-bin reshuffle).

    Distributed shape: the sup over a CONTINUOUS x only changes at
    observed values, so D = max over the union of observed values of
    |ECDF difference|. The union of the two slim ``(group, v, side)``
    projections takes ONE shuffle on (group); the running ECDFs are
    windowed running sums over the per-group local sort, and the sup
    is a plain max aggregate. Ties are handled by evaluating the ECDFs
    AFTER consuming all rows of a tied value (``rangeBetween`` on the
    value = the standard right-continuous convention, replayable in
    SQL). With no ``group_cols`` the global sort runs on one
    partition — inherent to an exact global ECDF; group the statistic
    (or sample) at corpus scale.

    Emits ``(group..., ks, n_ref, n_cur)`` with ``ks`` rounded to 6.
    Raises on an empty side (a KS against nothing is undefined) —
    checked per group by emitting NULL ks for groups missing a side.
    """
    gcols = list(group_cols or [])

    def side(df, tag):
        return df.filter(F.col(value_col).isNotNull()).select(
            *gcols,
            F.col(value_col).cast("double").alias("v"),
            F.lit(tag).alias("w"),
        )

    u = side(ref, "r").unionByName(side(cur, "c"))
    counts = u.groupBy(*gcols).agg(
        F.sum(F.when(F.col("w") == "r", 1).otherwise(0)).alias("n_ref"),
        F.sum(F.when(F.col("w") == "c", 1).otherwise(0)).alias("n_cur"),
    )
    w_run = (
        Window.partitionBy(*gcols)
        .orderBy("v")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    # rangeBetween on the VALUE makes the running counts right-
    # continuous at ties: every row of a tied value sees the full count
    # of that value on both sides
    stepped = (
        u.withColumn(
            "cr", F.sum(F.when(F.col("w") == "r", 1).otherwise(0)).over(w_run)
        )
        .withColumn(
            "cc", F.sum(F.when(F.col("w") == "c", 1).otherwise(0)).over(w_run)
        )
    )
    d = (
        stepped.join(counts, gcols) if gcols
        else stepped.crossJoin(F.broadcast(counts))
    )
    return (
        d.withColumn(
            "diff",
            F.abs(
                F.col("cr") / F.col("n_ref") - F.col("cc") / F.col("n_cur")
            ),
        )
        .groupBy(*gcols)
        .agg(
            F.round(F.max("diff"), 6).alias("ks"),
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
        )
        .filter((F.col("n_ref") > 0) & (F.col("n_cur") > 0))
    )


def profile_table(
    df: DataFrame,
    columns: list[str] | None = None,
) -> DataFrame:
    """Column-profile report — the first query anyone runs against an
    unfamiliar table: per column, row count, null count, exact distinct
    count, and the modal value with its frequency.

    One scan, two shuffles, ANY number of columns: every profiled
    column stacks into (col_name, value-as-string) rows via a single
    explode, so adding columns widens the explode, not the job count.
    The first groupBy (col_name, val) is map-side combinable — the
    shuffle carries per-partition DISTINCT (column, value) pairs, so
    low-cardinality columns cost almost nothing; the second aggregate
    reduces value-counts to the per-column report. The modal value uses
    a min-over-struct((-cnt, val)) so ties break on the smallest value
    — a total order, deterministic across engines.

    Honest scale note: an all-distinct column (a primary key) makes its
    slice of the stacked shuffle row-per-value — exact distinct counts
    are only free when cardinality is bounded. For wide fact tables,
    profile id-like columns with approx_count_distinct separately or
    feed a hash-sampled df (operators/sampling.stratified_sample); the
    exact form here is what the DuckDB oracle can replay.

    Output: (col_name, n_rows, n_nulls, n_distinct, top_value,
    top_count), one row per profiled column; values compare as their
    Spark string casts.
    """
    cols = columns or df.columns
    stacked = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(c).cast("string").alias("val"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.col_name", "s.val")
    counts = stacked.groupBy("col_name", "val").agg(F.count("*").alias("cnt"))
    top_struct = F.min(
        F.when(
            F.col("val").isNotNull(),
            F.struct((-F.col("cnt")).alias("neg_cnt"), F.col("val").alias("v")),
        )
    )
    return (
        counts.groupBy("col_name")
        .agg(
            F.sum("cnt").alias("n_rows"),
            F.sum(
                F.when(F.col("val").isNull(), F.col("cnt")).otherwise(F.lit(0))
            ).alias("n_nulls"),
            F.count(F.when(F.col("val").isNotNull(), F.lit(1))).alias("n_distinct"),
            top_struct.alias("__top"),
        )
        .select(
            "col_name",
            "n_rows",
            "n_nulls",
            "n_distinct",
            F.col("__top.v").alias("top_value"),
            (-F.col("__top.neg_cnt")).alias("top_count"),
        )
    )


def mad_outliers(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    thresh: float = 3.5,
) -> DataFrame:
    """Robust per-group outlier flags via the median/MAD rule
    (Iglewicz–Hoaglin modified z-score): ``z = 0.6745·(x − med) /
    MAD`` with ``MAD = median(|x − med|)``; ``|z| > thresh`` flags.
    Mean/stddev gates break on the very outliers they hunt (one wild
    value inflates σ until nothing flags); medians don't — this is
    the standard data-quality gate for skewed telemetry/billing
    values.

    Degenerate groups are explicit, not NaN: ``MAD = 0`` (half the
    group at the median — common in integer-ish data) flags exactly
    the values ≠ median when any exist, via z = ±inf represented as
    NULL z with ``is_outlier`` still computed; singleton groups never
    flag.

    Two exact-percentile passes (median, then MAD around it) as
    WINDOW aggregates over the same ``keys`` partition — ONE shuffle
    total and no join-back (the round-10 rewrite of the
    groupBy+join shape, measured 2.3× at ×10: the second window
    reuses the first's partitioning).

    Returns the input columns plus ``med``, ``mad``, ``mad_z``
    (rounded 6, NULL when MAD = 0), ``is_outlier`` (int).  Input
    columns may not collide with those four output names (or the
    ``__med``/``__mad`` internals) — raises ``ValueError`` rather
    than silently producing ambiguous/duplicate columns."""
    from pyspark.sql import Window

    reserved = {"med", "mad", "mad_z", "is_outlier", "__med", "__mad"}
    clash = sorted(set(df.columns) & reserved)
    if clash:
        raise ValueError(
            f"mad_outliers: input columns collide with outputs: {clash}"
        )
    w = Window.partitionBy(*keys)
    out = df.withColumn(
        "__med", F.expr(f"percentile({value_col}, 0.5)").over(w)
    ).withColumn(
        "__mad",
        F.expr(f"percentile(abs({value_col} - __med), 0.5)").over(w),
    )
    z = F.lit(0.6745) * (F.col(value_col) - F.col("__med")) / F.col("__mad")
    return out.select(
        *df.columns,
        F.round(F.col("__med").cast("double"), 6).alias("med"),
        F.round(F.col("__mad").cast("double"), 6).alias("mad"),
        F.round(
            F.when(F.col("__mad") != 0, z).cast("double"), 6
        ).alias("mad_z"),
        F.when(
            F.col("__mad") != 0,
            (F.abs(z) > F.lit(thresh)).cast("int"),
        )
        .otherwise(
            (F.col(value_col) != F.col("__med")).cast("int")
        )
        .alias("is_outlier"),
    )
