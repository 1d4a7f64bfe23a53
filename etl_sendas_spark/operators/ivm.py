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
MIN/MAX are deliberately NOT supported: they are not self-maintainable
under deletes (a retracted max needs the base table); route those to a
full re-aggregate or a sketch.
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
    sign = F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
    delta = changes.groupBy(*keys).agg(
        F.sum(sign).alias("d_n"),
        *[
            F.sum(sign.cast("decimal(28,6)") * F.col(c).cast("decimal(28,6)"))
            .alias(f"d_sum_{c}")
            for c in sum_cols
        ],
    )
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
