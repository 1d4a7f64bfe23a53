"""Round-12 query-inventory section (see plans/inventory.py for the
registry discipline). This module is NOT a public entry point —
plans.inventory star-imports it and owns the DRIVER_WINDOW literal and
the merged QUERIES/ORACLES registries.

Three rows pin the round's new table-format machinery end to end:

- ``txlog_clone_events`` — Delta-style SHALLOW CLONE
  (``sources/txlog.py`` ``clone``): version 0 of the clone references
  the source's live files absolutely (zero data copied — asserted
  in-query), the clone and the source then diverge under CoW DML
  without touching each other (asserted), and the clone's final state
  is hash-checked against a pure-SQL replay of its ladder.
- ``txlog_date_zone_map_events`` — zone maps on DATE/DECIMAL columns
  (round 12: the harvest previously CRASHED on them): a date-
  clustered table prunes files by a date-range probe (strict
  inputFiles-subset asserted in-query) and the pruned read's
  aggregate is hash-checked against SQL.
- ``txlog_constraint_events`` — Delta-style CHECK constraints:
  declaration scans existing rows, violating writes refuse atomically
  (head asserted unchanged), NULL passes (SQL CHECK semantics), and
  the hash pins exactly the writes the machinery let through.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_table

    return read_table(spark, sf_dir, name)


def _scratch(sf_dir: str, slug: str) -> str:
    import hashlib
    import shutil
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"{slug}_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    return base


PART_QUERIES: dict = {}
PART_ORACLES: dict = {}

# ===========================================================================
# round 12: shallow clone — zero-copy table branching
# ===========================================================================


def txlog_clone_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style SHALLOW CLONE end to end (sources/txlog.py round
    12): an events-derived source table takes a DV delete, is CLONED
    (version 0 of the clone references the source's live files by
    absolute path — ZERO parquet files under the clone's data dir,
    asserted in-query), and the two tables then DIVERGE: the clone
    doubles click values and deletes its high tail (CoW rewrites land
    under the clone; the external reference is removed by its
    absolute path — one stray relpath would duplicate every rewritten
    row, which the hash would catch), while the SOURCE deletes
    purchases — a mutation that must stay invisible to the clone
    because version-0 references pin the clone to the source files
    that existed at clone time. The final aggregate reads the CLONE;
    the ORACLE replays only the clone's ladder (DV delete + update +
    delete), so the hash pins reference isolation, the CoW remove
    law, and DV inheritance at once."""
    from ..sources.txlog import TxLogTable

    base = _scratch(sf_dir, "clone")
    src_root = os.path.join(base, "src")
    clone_root = os.path.join(base, "clone")

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    src = TxLogTable.create(src_root, ev, stat_cols=["event_id"])
    # merge-on-read delete the clone must inherit
    src.delete_where(spark, "event_id % 10 = 3", mode="dv")

    cl = src.clone(clone_root)
    data_dir = os.path.join(clone_root, "data")
    cloned_parquet = [
        f
        for _, _, fs in os.walk(data_dir)
        for f in fs
        if f.endswith(".parquet")
    ] if os.path.isdir(data_dir) else []
    if cloned_parquet:
        raise AssertionError("shallow clone must copy zero data files")

    # diverge: clone mutates...
    cl.update_where(
        spark, {"value": "value * 2"}, "event_type = 'click'"
    )
    cl.delete_where(spark, "value > 600")
    # ...and the source mutates AFTER the clone — must be invisible
    src.delete_where(spark, "event_type = 'purchase'")
    if src.read(spark).filter("event_type = 'purchase'").count() != 0:
        raise AssertionError("source DML failed")

    return (
        cl.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("val_sum"),
        )
    )


TXLOG_CLONE_SQL = """
WITH dv AS (
  -- the source's merge-on-read delete, inherited by the clone
  SELECT event_id, event_type, value
  FROM events WHERE event_id % 10 <> 3
), updated AS (
  SELECT event_id, event_type,
         CASE WHEN event_type = 'click' THEN value * 2
              ELSE value END AS value
  FROM dv
), final AS (
  -- DML semantics: rows where the predicate is NULL are KEPT
  SELECT * FROM updated WHERE value <= 600 OR value IS NULL
)
SELECT event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS val_sum
FROM final
GROUP BY event_type
"""

PART_QUERIES["txlog_clone_events"] = txlog_clone_events
PART_ORACLES["txlog_clone_events"] = TXLOG_CLONE_SQL

# ===========================================================================
# round 12: date zone maps — typed pruning bounds through the JSON log
# ===========================================================================


def txlog_date_zone_map_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Zone maps on a DATE column (round 12 — the stat harvest
    previously CRASHED on date/decimal bounds; they now land as ISO /
    decimal strings and coerce back at prune time): an events-derived
    table clustered by day records per-file date min/max, a date-range
    probe prunes the scan to a STRICT subset of files (asserted
    in-query via inputFiles — the skipping is manifest-level, before
    Spark plans the scan), and the pruned read's per-day aggregate is
    hash-checked against SQL. A DECIMAL amount column rides the same
    files with its own zone maps probed by an exact Decimal range.

    At 100 TB this is the date-filter lever for tables NOT partitioned
    by time: footer-exact day bounds per file turn an event-time
    predicate into a file skip without any layout change."""
    import datetime
    from decimal import Decimal

    from ..sources.txlog import TxLogTable

    base = _scratch(sf_dir, "datezm")
    root = os.path.join(base, "t")

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.to_date("ts").alias("day"),
        (F.floor(F.col("value") * 100) / 100)
        .cast("decimal(12,2)")
        .alias("amt"),
    )
    t = TxLogTable.create(
        root,
        ev.repartitionByRange(8, "day").sortWithinPartitions("day"),
        stat_cols=["day", "amt"],
    )

    lo, hi = datetime.date(2024, 1, 10), datetime.date(2024, 1, 20)
    full = set(t.read(spark).inputFiles())
    pruned_df = t.read(spark, prune={"day": (lo, hi)})
    pf = set(pruned_df.inputFiles())
    if not pf or not pf < full:
        raise AssertionError(
            "date zone maps must prune to a strict file subset"
        )
    # decimal zone maps prune the same files by an exact range
    pa = set(
        t.read(
            spark, prune={"amt": (Decimal("0.00"), Decimal("99.99"))}
        ).inputFiles()
    )
    if not pa:
        raise AssertionError("decimal zone maps must keep some files")

    return (
        pruned_df.filter(
            (F.col("day") >= F.lit(lo)) & (F.col("day") <= F.lit(hi))
        )
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("amt").cast("double").alias("amt_sum"),
        )
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "cnt",
            "amt_sum",
        )
    )


TXLOG_DATE_ZONE_MAP_SQL = """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(FLOOR(value * 100) / 100 AS DECIMAL(12,2)))
            AS DOUBLE) AS amt_sum
FROM events
WHERE CAST(ts AS DATE) BETWEEN DATE '2024-01-10' AND DATE '2024-01-20'
GROUP BY 1
"""

PART_QUERIES["txlog_date_zone_map_events"] = txlog_date_zone_map_events
PART_ORACLES["txlog_date_zone_map_events"] = TXLOG_DATE_ZONE_MAP_SQL

# ===========================================================================
# round 12: CHECK constraints — write-time invariants in the commit log
# ===========================================================================


def txlog_constraint_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style CHECK constraints end to end (sources/txlog.py
    round 12): an events-derived table declares two invariants (the
    declaration scans existing rows — an already-violated constraint
    REFUSES, asserted in-query), a violating append then fails loudly
    and commits NOTHING (head asserted unchanged — atomicity of the
    refusal), a NULL-result row passes (SQL CHECK semantics), a CoW
    update whose post-image would violate refuses, and after
    drop_constraint the same write lands. The final aggregate reads
    the surviving content; the ORACLE replays exactly the ACCEPTED
    writes, so the hash pins which writes the constraint machinery
    let through."""
    from ..sources.txlog import TxLogTable

    base = _scratch(sf_dir, "constraint")
    root = os.path.join(base, "t")

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    t = TxLogTable.create(root, ev, stat_cols=["event_id"])
    t.add_constraint(spark, "value_floor", "value >= 0")
    t.add_constraint(spark, "id_nonneg", "event_id >= 0")

    try:
        t.add_constraint(spark, "impossible", "value > 100")
        raise AssertionError(
            "declaring an already-violated constraint must refuse"
        )
    except ValueError:
        pass

    head = t.latest_version()
    try:
        t.append(
            spark.sql(
                "SELECT CAST(900001 AS BIGINT) AS event_id, "
                "'bad' AS event_type, CAST(-1.0 AS DOUBLE) AS value"
            ),
            spark,
        )
        raise AssertionError("violating append must refuse")
    except ValueError:
        pass
    if t.latest_version() != head:
        raise AssertionError("refused append must commit nothing")

    # NULL passes (SQL CHECK semantics); this row is ACCEPTED
    t.append(
        spark.sql(
            "SELECT CAST(900002 AS BIGINT) AS event_id, "
            "'ok' AS event_type, CAST(NULL AS DOUBLE) AS value"
        ),
        spark,
    )
    # CoW update post-image violating refuses atomically
    head = t.latest_version()
    try:
        t.update_where(
            spark, {"value": "-value - 1"}, "event_type = 'click'"
        )
        raise AssertionError("violating update must refuse")
    except ValueError:
        pass
    if t.latest_version() != head:
        raise AssertionError("refused update must commit nothing")

    # dropping the constraint releases enforcement; the write lands
    t.drop_constraint("value_floor")
    t.append(
        spark.sql(
            "SELECT CAST(900003 AS BIGINT) AS event_id, "
            "'late' AS event_type, CAST(-7.5 AS DOUBLE) AS value"
        ),
        spark,
    )

    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("val_sum"),
        )
    )


TXLOG_CONSTRAINT_SQL = """
WITH accepted AS (
  SELECT event_id, event_type, value FROM events
  UNION ALL
  SELECT 900002, 'ok', CAST(NULL AS DOUBLE)
  UNION ALL
  SELECT 900003, 'late', -7.5
)
SELECT event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS val_sum
FROM accepted
GROUP BY event_type
"""

PART_QUERIES["txlog_constraint_events"] = txlog_constraint_events
PART_ORACLES["txlog_constraint_events"] = TXLOG_CONSTRAINT_SQL
