"""Round-7 query-inventory section (see plans/inventory.py for the
registry discipline). This module is NOT a public entry point —
plans.inventory star-imports it and owns the DRIVER_WINDOW literal and
the merged QUERIES/ORACLES registries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_table

    return read_table(spark, sf_dir, name)


PART_QUERIES: dict = {}
PART_ORACLES: dict = {}

# ===========================================================================
# round 7: transaction-log table — create/append/overwrite lifecycle,
# time travel, and zone-map file pruning under one driver hash
# ===========================================================================


def txlog_time_travel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TxLogTable lifecycle (sources/txlog.py) as one hashed result:
    create(v0) + append(v1) + append(v2) + overwrite(v3) of disjoint
    event slices, then aggregate BOTH a time-traveled snapshot read at
    v1 (must see exactly the v0+v1 slices — proves replay ignores the
    later append AND the overwrite) and the latest snapshot read
    through zone-map pruning (must see exactly the overwrite slice —
    proves the overwrite's remove-set replay).

    Each write is range-partitioned on event_id so every data file
    carries a tight min/max zone map; the pruned read asserts in-query
    that the manifest-level skip dropped files BEFORE Spark saw them
    (``DataFrame.inputFiles``), so a silently disabled pruner fails the
    driver row with an error, not a lucky hash. Pruning is metadata-only
    by contract (a file with no stats is kept), so the caller still
    applies the row filter — which is why the hash can be oracle-exact
    while the file list shrinks.

    At 100 TB the read path is a plain distributed parquet scan of the
    live-file list (pushdown/AQE apply); the log is driver-side
    metadata, O(versions mod checkpoint-interval) to replay.

    ORACLE: replays both snapshots from the `events` view by the same
    modulo derivation — v1 = slices {0,1}, latest = slice {3} — with
    the pruned read's row filter applied verbatim.
    """
    import hashlib
    import shutil
    import tempfile

    from ..sources.txlog import TxLogTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"txlog_q_{tag}")
    shutil.rmtree(root, ignore_errors=True)

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )

    def slice_(r: int) -> DataFrame:
        return ev.filter(F.col("event_id") % 4 == r).repartitionByRange(
            4, "event_id"
        )

    t = TxLogTable.create(root, slice_(0), stat_cols=["event_id"])
    t.append(slice_(1), spark)  # v1
    t.append(slice_(2), spark)  # v2
    t.overwrite(slice_(3).repartitionByRange(8, "event_id"))  # v3

    lo, hi = 1000, 2999
    latest_full = t.read(spark)
    latest_pruned = t.read(spark, prune={"event_id": (lo, hi)})
    if not len(latest_pruned.inputFiles()) < len(latest_full.inputFiles()):
        raise AssertionError(
            "zone-map pruning skipped no files: "
            f"{len(latest_pruned.inputFiles())} of "
            f"{len(latest_full.inputFiles())}"
        )

    def agg(df: DataFrame, snapshot: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.max("event_id").alias("max_event_id"),
        ).select(F.lit(snapshot).alias("snapshot"), "*")

    v1 = agg(t.read(spark, version=1), "v1")
    pruned = agg(
        latest_pruned.filter(F.col("event_id").between(lo, hi)),
        "latest_pruned",
    )
    return v1.unionByName(pruned)


TXLOG_TIME_TRAVEL_SQL = """
SELECT 'v1' AS snapshot, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       MAX(event_id) AS max_event_id
FROM events
WHERE event_id % 4 IN (0, 1)
GROUP BY event_type
UNION ALL
SELECT 'latest_pruned', event_type,
       COUNT(*),
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
       MAX(event_id)
FROM events
WHERE event_id % 4 = 3 AND event_id BETWEEN 1000 AND 2999
GROUP BY event_type
"""

PART_QUERIES["txlog_time_travel_events"] = txlog_time_travel_events
PART_ORACLES["txlog_time_travel_events"] = TXLOG_TIME_TRAVEL_SQL
