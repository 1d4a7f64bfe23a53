"""Incremental view maintenance: keep a grouped aggregate current from
a change feed without rescanning the base table.

The batch engine's aggregates (inventory A-family, the sendas rule
outputs) are all re-derived from scratch each run — exactly what the
reference does month over month.  At 100 TB that re-scan is the cost
ceiling, and the standard fix is IVM: for self-maintainable aggregates
(COUNT, SUM, and AVG derived from them), a keyed delta computed from
the change feed alone merges into the existing aggregate state.

``incremental_agg_update`` implements the insert/delete algebra
(an update is modeled as delete + insert, the usual CDC normal form):

- delta = changes grouped by the same keys, counting +1/-1 per row and
  summing +x/-x per measure;
- new_state = full-outer merge of (state, delta), adding counts and
  sums; groups whose merged count reaches 0 are dropped (their sums
  are exact zeros too, so nothing is lost);
- AVG & friends re-derive from (sum, count) at read time.

Scale shape: ONE aggregation over the (small) change feed + ONE keyed
merge join against the state table — never a base-table scan.  The
state side shuffles on the group key only if it isn't already
partitioned by it; co-locating state storage on the key (bucketed
parquet / the stream-upsert sink) makes maintenance change-feed-sized.
MIN/MAX are not self-maintainable under deletes (a retracted max needs
base data), so :func:`incremental_minmax_update` handles them with the
affected-key recompute: deletes that touch an extreme re-aggregate
ONLY their keys against the (key-pruned) base; every other key merges
change-feed-sized.
"""

from __future__ import annotations

import functools
from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def aggregate_state(
    df: DataFrame, keys: Sequence[str], sum_cols: Sequence[str]
) -> DataFrame:
    """Build the initial aggregate state: per-key row count ``n`` plus
    one exact decimal-summed ``sum_<c>`` per measure (the same decimal
    discipline as the query inventory, so incremental and full
    recompute agree bit-for-bit)."""
    aggs = [F.count("*").alias("n")] + [
        F.sum(F.col(c).cast("decimal(28,6)")).alias(f"sum_{c}") for c in sum_cols
    ]
    return df.groupBy(*keys).agg(*aggs)


def aggregate_delta(
    changes: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """The signed per-key delta of a CDC feed against
    :func:`aggregate_state`: ``(keys..., d_n, d_sum_<c>...)`` —
    feed-key-sized, exact decimal sums, I/D churn on the same key
    partially cancels inside the aggregate.  Exposed separately so
    storage-merge consumers (``txlog_cdf_consumer_step(apply=
    "merge")``) can apply it without materializing the merged state
    in-plan."""
    sign = F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
    return changes.groupBy(*keys).agg(
        F.sum(sign).alias("d_n"),
        *[
            F.sum(sign.cast("decimal(28,6)") * F.col(c).cast("decimal(28,6)"))
            .alias(f"d_sum_{c}")
            for c in sum_cols
        ],
    )


def incremental_agg_update(
    state: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    sum_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Merge a CDC feed into an aggregate state built by
    :func:`aggregate_state`.

    ``changes`` carries the base columns plus ``op_col`` in {'I','D'}
    (normalize updates to D+I upstream).  Returns the new state with
    the same schema; groups whose count reaches zero disappear.
    Deleting rows that were never inserted is the caller's contract
    violation (counts go negative and stay visible — intentionally not
    masked)."""
    delta = aggregate_delta(changes, keys, sum_cols, op_col)
    s = state.alias("s")
    d = delta.alias("d")
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"s.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys],
    )
    merged = s.join(d, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"d.{k}"), F.col(f"s.{k}")).alias(k)
            for k in keys
        ],
        (
            F.coalesce(F.col("s.n"), F.lit(0))
            + F.coalesce(F.col("d.d_n"), F.lit(0))
        ).alias("n"),
        *[
            (
                F.coalesce(
                    F.col(f"s.sum_{c}"), F.lit(0).cast("decimal(28,6)")
                )
                + F.coalesce(
                    F.col(f"d.d_sum_{c}"), F.lit(0).cast("decimal(28,6)")
                )
            )
            .cast("decimal(28,6)")
            .alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return merged.filter(F.col("n") != 0)


def distinct_state(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """Support state for incremental ``COUNT(DISTINCT value)`` — the
    aggregate the plain count/sum state CANNOT maintain (a delete may
    or may not remove a key's LAST copy of a value; the count alone
    cannot tell).  The DBSP/Materialize answer is a per-(key, value)
    multiplicity table: ``(keys..., value, m)`` with ``m`` = how many
    base rows carry that value.  NULL values are excluded, matching
    SQL's COUNT(DISTINCT) semantics.  State size is the number of
    DISTINCT (key, value) pairs — the irreducible information content
    of the aggregate, not the base size."""
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.count("*").alias("m"))
    )


def incremental_distinct_update(
    state: DataFrame,
    changes: DataFrame,
    keys: Sequence[str],
    value_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Merge a CDC feed into :func:`distinct_state`: feed rows collapse
    to signed multiplicity deltas per (key, value) — an I/D churn on
    the same value cancels before touching the state — then ONE keyed
    full-outer merge; pairs whose multiplicity reaches zero leave.
    Maintenance is feed-key-sized; the base is never consulted
    (COUNT DISTINCT is self-maintainable GIVEN the support state —
    that is the whole point of storing multiplicities).  Deleting
    never-inserted rows leaves negative multiplicities, intentionally
    visible, as in :func:`incremental_agg_update`."""
    sign = F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
    delta = (
        changes.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.sum(sign).alias("dm"))
        .filter(F.col("dm") != 0)
    )
    s = state.alias("s")
    d = delta.alias("d")
    cols = [*keys, value_col]
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}")) for c in cols],
    )
    merged = s.join(d, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"d.{c}"), F.col(f"s.{c}")).alias(c)
            for c in cols
        ],
        (
            F.coalesce(F.col("s.m"), F.lit(0))
            + F.coalesce(F.col("d.dm"), F.lit(0))
        ).alias("m"),
    )
    return merged.filter(F.col("m") != 0)


def distinct_counts(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """``COUNT(DISTINCT value)`` per key, read off the support state:
    one narrow aggregate over (key, value) pairs with positive
    multiplicity (negative pairs are contract-violation tombstones and
    must not count)."""
    return (
        state.filter(F.col("m") > 0)
        .groupBy(*keys)
        .agg(F.count("*").alias("n_distinct"))
    )


def join_view_state(
    a: DataFrame,
    b: DataFrame,
    keys: Sequence[str],
    a_cols: Sequence[str],
    b_cols: Sequence[str],
) -> DataFrame:
    """Initial state of the materialized inner equi-join view
    ``V = A ⋈_keys B``, represented as a Z-set (DBSP / Materialize
    style): one row per DISTINCT joined tuple ``(keys, a_cols,
    b_cols)`` with its multiplicity ``n``.  The Z-set form is what
    makes deletes maintainable — a retraction just decrements ``n``,
    no base lookup needed to know how many copies existed."""
    v = a.select(*keys, *a_cols).join(b.select(*keys, *b_cols), list(keys))
    return v.groupBy(*keys, *a_cols, *b_cols).agg(F.count("*").alias("n"))


def join_view_delta(
    a_changes: DataFrame,
    b_changes: DataFrame,
    a_new: DataFrame,
    b_new: DataFrame,
    keys: Sequence[str],
    a_cols: Sequence[str],
    b_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """The signed Z-set delta of a join view — the bilinear rule of
    :func:`incremental_join_update`, exposed separately so callers can
    APPLY it their own way: the in-plan full-outer merge (that
    function), or a keyed storage merge that rewrites only affected
    files (``streaming.sessions.txlog_join_view_step(apply="merge")``).
    Returns ``(keys..., a_cols..., b_cols..., w)`` with ``w != 0``
    (see :func:`incremental_join_update` for the algebra, the
    key-pruned probe shape, and the broadcast contract)."""
    keys = list(keys)

    def zset(changes: DataFrame, cols: Sequence[str]) -> DataFrame:
        sign = F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
        return (
            changes.groupBy(*keys, *cols)
            .agg(F.sum(sign).alias("w"))
            .filter(F.col("w") != 0)
        )

    w_a = zset(a_changes, a_cols)
    w_b = zset(b_changes, b_cols)

    # Key-pruned post-change base probes: only partitions holding the
    # other feed's keys are read (Z-set weight = row multiplicity).
    # The feed-key sides are EXPLICITLY broadcast — they are small by
    # the CDC contract, and without the hint a conservative session
    # (autoBroadcastJoinThreshold=-1) would sort-merge the semi join,
    # shuffling the whole base and destroying the feed-sized cost
    # claim (measured: the probe's 5M-row shuffle WAS the maintenance
    # cost until the hint pinned it map-side).
    b_probe = (
        b_new.select(*keys, *b_cols)
        .join(F.broadcast(w_a.select(*keys).distinct()), keys, "left_semi")
        .groupBy(*keys, *b_cols)
        .agg(F.count("*").alias("w"))
    )
    a_probe = (
        a_new.select(*keys, *a_cols)
        .join(F.broadcast(w_b.select(*keys).distinct()), keys, "left_semi")
        .groupBy(*keys, *a_cols)
        .agg(F.count("*").alias("w"))
    )

    view_cols = [*keys, *a_cols, *b_cols]
    t1 = (
        F.broadcast(w_a).alias("l")
        .join(b_probe.alias("r"), keys)
        .select(*view_cols, (F.col("l.w") * F.col("r.w")).alias("w"))
    )
    t2 = (
        a_probe.alias("l")
        .join(F.broadcast(w_b).alias("r"), keys)
        .select(*view_cols, (F.col("l.w") * F.col("r.w")).alias("w"))
    )
    t3 = (
        F.broadcast(w_a).alias("l")
        .join(w_b.alias("r"), keys)
        .select(*view_cols, (-F.col("l.w") * F.col("r.w")).alias("w"))
    )
    return (
        t1.unionByName(t2)
        .unionByName(t3)
        .groupBy(*view_cols)
        .agg(F.sum("w").alias("w"))
        .filter(F.col("w") != 0)
    )


def incremental_join_update(
    state: DataFrame,
    a_changes: DataFrame,
    b_changes: DataFrame,
    a_new: DataFrame,
    b_new: DataFrame,
    keys: Sequence[str],
    a_cols: Sequence[str],
    b_cols: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Maintain a join view built by :func:`join_view_state` from the
    two sides' CDC feeds — the bilinear delta rule of incremental
    view maintenance (join is bilinear over Z-sets, so its delta has
    exactly three terms):

        ΔV = ΔA ⋈ B_new  ⊕  A_new ⋈ ΔB  ⊖  ΔA ⋈ ΔB

    written against the POST-change base tables because that is what
    the storage layer holds when maintenance runs (same convention as
    :func:`incremental_minmax_update`'s ``effective_base``); the
    ``⊖ ΔA ⋈ ΔB`` term removes the double count the two ``_new``
    probes introduce.  ``a_changes``/``b_changes`` carry the side's
    ``keys + cols`` plus ``op_col`` in {'I','D'} (normalize updates to
    D+I upstream, the CDC normal form used everywhere in this module).

    Scale shape — the whole point: NEITHER base table is scanned in
    full.  Each probe side is semi-join-pruned to the OTHER feed's key
    set before grouping — with the feed frames EXPLICITLY broadcast
    (small by the CDC contract; without the hint a conservative
    session sort-merges the semi join and shuffles the whole base,
    measured in BASELINE.md r9) — so with the bases
    partitioned/bucketed on the join key the maintenance I/O is
    change-feed-key-sized, not base-sized; the three delta terms are
    all change-feed-sized joins; and the final merge is one keyed
    full-outer against the state (state-sized shuffle only if the
    state store isn't already co-partitioned on the view key, as the
    stream-upsert/txlog sinks arrange).  A full recompute — the law
    the oracle enforces — would instead re-shuffle both bases.

    Multiplicity correctness falls out of the Z-set algebra: every
    term multiplies its inputs' weights (feed rows collapse to signed
    weights first, so a +1/-1 churn on the same tuple cancels before
    it ever probes a base).  Rows whose merged multiplicity reaches 0
    leave the view; negative multiplicities (deleting never-inserted
    rows) stay visible, intentionally unmasked, matching
    :func:`incremental_agg_update`."""
    view_cols = [*keys, *a_cols, *b_cols]
    delta = join_view_delta(
        a_changes, b_changes, a_new, b_new, keys, a_cols, b_cols, op_col
    )

    s = state.alias("s")
    d = delta.alias("d")
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}")) for c in view_cols],
    )
    merged = s.join(d, cond, "full_outer").select(
        *[
            F.coalesce(F.col(f"d.{c}"), F.col(f"s.{c}")).alias(c)
            for c in view_cols
        ],
        (
            F.coalesce(F.col("s.n"), F.lit(0))
            + F.coalesce(F.col("d.w"), F.lit(0))
        ).alias("n"),
    )
    return merged.filter(F.col("n") != 0)


def minmax_state(
    df: DataFrame, keys: Sequence[str], val_col: str
) -> DataFrame:
    """Initial MIN/MAX state: ``(keys..., n, min_v, max_v)``."""
    return df.groupBy(*keys).agg(
        F.count("*").alias("n"),
        F.min(val_col).alias("min_v"),
        F.max(val_col).alias("max_v"),
    )


def incremental_minmax_update(
    state: DataFrame,
    changes: DataFrame,
    effective_base: DataFrame,
    keys: Sequence[str],
    val_col: str,
    op_col: str = "op",
) -> DataFrame:
    """MIN/MAX maintenance under inserts AND deletes — the aggregate the
    module docstring used to exclude, closed with the standard
    affected-key recompute:

    - inserts are self-maintainable: ``min' = least(min, ins_min)``;
    - a delete only invalidates state when it TOUCHES an extreme
      (``del_min <= min_v`` or ``del_max >= max_v`` — conservative: the
      state does not track extreme multiplicity, so an equal-valued
      delete forces the safe path);
    - ONLY those affected keys re-aggregate, against
      ``effective_base`` (the base table as of after the changes —
      what the storage layer already holds when maintenance runs),
      pruned by a semi-join on the affected key set. Everything else
      merges change-feed-sized.

    At 100 TB the recompute branch reads base partitions for the
    affected keys only — bucket/partition the base by the group key and
    the semi-join prunes to those buckets; the full-scan fallback this
    replaces is exactly the "route MIN/MAX to a full re-aggregate" the
    earlier design prescribed. Returns the new ``minmax_state`` schema;
    keys whose count reaches zero disappear. Deletes for keys the state
    never saw take the recompute path (the feed is ahead of the state —
    recomputing is the only consistent answer)."""
    sign = F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
    ins_val = F.when(F.col(op_col) == "I", F.col(val_col))
    del_val = F.when(F.col(op_col) == "D", F.col(val_col))
    delta = changes.groupBy(*keys).agg(
        F.sum(F.when(F.col(op_col) == "I", 1).otherwise(0)).alias("n_ins"),
        F.sum(F.when(F.col(op_col) == "D", 1).otherwise(0)).alias("n_del"),
        F.min(ins_val).alias("ins_min"),
        F.max(ins_val).alias("ins_max"),
        F.min(del_val).alias("del_min"),
        F.max(del_val).alias("del_max"),
    )
    s = state.alias("s")
    d = delta.alias("d")
    cond = functools.reduce(
        lambda a, b: a & b,
        [F.col(f"s.{k}").eqNullSafe(F.col(f"d.{k}")) for k in keys],
    )
    merged = s.join(d, cond, "full_outer").select(
        *[F.coalesce(F.col(f"d.{k}"), F.col(f"s.{k}")).alias(k) for k in keys],
        (
            F.coalesce(F.col("s.n"), F.lit(0))
            + F.coalesce(F.col("d.n_ins"), F.lit(0))
            - F.coalesce(F.col("d.n_del"), F.lit(0))
        ).alias("new_n"),
        F.col("s.n").alias("old_n"),
        "s.min_v",
        "s.max_v",
        "d.n_ins",
        "d.n_del",
        "d.ins_min",
        "d.ins_max",
        "d.del_min",
        "d.del_max",
    )
    needs_recompute = (F.coalesce(F.col("n_del"), F.lit(0)) > 0) & (
        F.col("old_n").isNull()
        | (F.col("del_min") <= F.col("min_v"))
        | (F.col("del_max") >= F.col("max_v"))
    )
    safe = merged.filter(~needs_recompute & (F.col("new_n") > 0)).select(
        *keys,
        F.col("new_n").alias("n"),
        F.least("min_v", "ins_min").alias("min_v"),
        F.greatest("max_v", "ins_max").alias("max_v"),
    )
    affected = merged.filter(needs_recompute).select(*keys)
    recomputed = (
        effective_base.join(affected, list(keys), "left_semi")
        .groupBy(*keys)
        .agg(
            F.count("*").alias("n"),
            F.min(val_col).alias("min_v"),
            F.max(val_col).alias("max_v"),
        )
    )
    return safe.unionByName(recomputed)
