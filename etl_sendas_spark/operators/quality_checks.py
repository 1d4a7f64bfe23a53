"""Data-quality expectations: declarative checks evaluated
scan-efficiently, returning a violations report instead of a crash.

The production counterpart of an assert: a 100 TB ingest wave is
validated BEFORE it merges — null rates, key uniqueness, accepted
value domains, numeric ranges, referential integrity — and the report
(one row per rule) drives the quarantine/alert decision. Execution is
grouped by cost class so the whole suite touches the fact table the
minimum number of times:

- ``not_null`` / ``in_set`` / ``in_range`` compile into ONE aggregate
  of conditional sums — a single scan for any number of scalar rules,
  map-side combinable;
- each ``unique`` rule is one groupBy on its key (duplicate groups
  counted, violations = extra rows beyond the first of each key);
- each ``foreign_key`` rule is one LEFT ANTI join against the
  referenced keys (broadcast when the dim is small — Catalyst/AQE
  decides, as everywhere else in this engine).

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


def expectation_report(df: DataFrame, rules: list[dict[str, Any]]) -> DataFrame:
    """Evaluate ``rules`` against ``df``; returns one row per rule:
    ``(rule, target, violations, n_rows, passed)`` in the order given.
    """
    if not rules:
        raise ValueError("expectation_report: empty rule list")
    scalar_exprs = [F.count(F.lit(1)).alias("__n")]
    scalar_names: list[tuple[str, str]] = []
    heavy: list[tuple[str, str, DataFrame]] = []

    for r in rules:
        kind = r["rule"]
        if kind == "not_null":
            c = r["col"]
            scalar_exprs.append(
                F.sum(F.col(c).isNull().cast("long")).alias(
                    f"__v{len(scalar_names)}"
                )
            )
            scalar_names.append((kind, c))
        elif kind == "in_set":
            c = r["col"]
            bad = ~F.col(c).isin(list(r["values"]))
            if not r.get("count_null", False):
                bad = bad & F.col(c).isNotNull()
            scalar_exprs.append(
                F.sum(bad.cast("long")).alias(f"__v{len(scalar_names)}")
            )
            scalar_names.append((kind, c))
        elif kind == "in_range":
            c = r["col"]
            bad = (F.col(c) < r["lo"]) | (F.col(c) > r["hi"])
            if not r.get("count_null", False):
                bad = bad & F.col(c).isNotNull()
            scalar_exprs.append(
                F.sum(bad.cast("long")).alias(f"__v{len(scalar_names)}")
            )
            scalar_names.append((kind, c))
        elif kind == "unique":
            cols = list(r["cols"])
            dup = (
                df.groupBy(*cols)
                .agg(F.count(F.lit(1)).alias("__c"))
                .agg(
                    F.coalesce(
                        F.sum(F.col("__c") - 1), F.lit(0)
                    ).cast("long").alias("v")
                )
            )
            heavy.append((kind, ",".join(cols), dup))
        elif kind == "foreign_key":
            c, ref, ref_col = r["col"], r["ref"], r["ref_col"]
            orphans = (
                df.select(F.col(c).alias("__k"))
                .filter(F.col("__k").isNotNull())
                .join(
                    ref.select(F.col(ref_col).alias("__k")).distinct(),
                    "__k",
                    "left_anti",
                )
                .agg(F.count(F.lit(1)).cast("long").alias("v"))
            )
            heavy.append((kind, c, orphans))
        else:
            raise ValueError(f"unknown rule kind {kind!r}")

    scalars = df.agg(*scalar_exprs)
    report = scalars
    for i, (_, _, frame) in enumerate(heavy):
        report = report.crossJoin(
            F.broadcast(frame.withColumnRenamed("v", f"__h{i}"))
        )

    rows = []
    h_idx = s_idx = 0
    for r in rules:
        kind = r["rule"]
        if kind in ("not_null", "in_set", "in_range"):
            col, v = scalar_names[s_idx][1], F.col(f"__v{s_idx}")
            s_idx += 1
        else:
            col = heavy[h_idx][1]
            v = F.col(f"__h{h_idx}")
            h_idx += 1
        rows.append(
            F.struct(
                F.lit(kind).alias("rule"),
                F.lit(col).alias("target"),
                F.coalesce(v, F.lit(0)).cast("long").alias("violations"),
            )
        )
    return report.select(
        F.explode(F.array(*rows)).alias("r"), F.col("__n").alias("n_rows")
    ).select(
        "r.rule",
        "r.target",
        "r.violations",
        F.col("n_rows").cast("long").alias("n_rows"),
        (F.col("r.violations") == 0).alias("passed"),
    )
