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

from pyspark.sql import DataFrame
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
