"""Round-8 query-inventory section (see plans/inventory.py for the
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
# round 8: partitioned txlog table — hive partition spec as the
# first-order file-skipping lever, zone maps refining within it
# ===========================================================================


def txlog_partitioned_prune_events(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Partitioned TxLogTable (sources/txlog.py, ``partition_by=``,
    round 8): events land in a table partitioned by ``event_type``
    with ``event_id`` zone maps, written as create + append (both
    commits inherit the spec, the Delta/Iceberg partition-column
    contract). The query reads ONE partition through
    ``read(prune={"event_type": ...})`` plus an ``event_id`` range,
    and asserts IN-QUERY (``DataFrame.inputFiles``, the same pattern
    as ``txlog_time_travel_events``) that

    1. partition pruning alone scanned fewer files than the full
       table, and
    2. stacking the zone-map range pruned further within the
       surviving partition —

    so a silently disabled pruner fails the row with an error, never a
    lucky hash. Pruning is metadata-only by contract: the row filter
    is applied verbatim on top, which is why the aggregate can be
    oracle-exact while the file list shrinks.

    At 100 TB this is the read path's first-order lever: a
    date/source partition column drops whole directory subtrees from
    the manifest before Spark plans the scan; zone maps (and a
    z-order rewrite) refine within partitions.

    ORACLE: replays the same partition + range predicate on the
    ``events`` view directly — the table round-trip must be lossless
    and the pruning must not change results.
    """
    import hashlib
    import shutil
    import tempfile

    from ..sources.txlog import TxLogTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"txlog_part_{tag}")
    shutil.rmtree(root, ignore_errors=True)

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    # two commits so appended files provably inherit the spec; range
    # partitioning on event_id keeps zone maps tight per file
    t = TxLogTable.create(
        root,
        ev.filter(F.col("event_id") % 2 == 0).repartitionByRange(
            4, "event_id"
        ),
        stat_cols=["event_id"],
        partition_by=["event_type"],
    )
    t.append(
        ev.filter(F.col("event_id") % 2 == 1).repartitionByRange(
            4, "event_id"
        ),
        spark,
    )

    lo, hi = 100, 699
    full = t.read(spark)
    part_only = t.read(spark, prune={"event_type": ("purchase", "purchase")})
    both = t.read(
        spark, prune={"event_type": ("purchase", "purchase"), "event_id": (lo, hi)}
    )
    n_full = len(full.inputFiles())
    n_part = len(part_only.inputFiles())
    n_both = len(both.inputFiles())
    if not (n_both < n_part < n_full):
        raise AssertionError(
            "partition/zone-map pruning skipped no files: "
            f"full={n_full} partition={n_part} both={n_both}"
        )

    return (
        both.filter(
            (F.col("event_type") == "purchase")
            & F.col("event_id").between(lo, hi)
        )
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.min("event_id").alias("min_event_id"),
            F.max("event_id").alias("max_event_id"),
        )
    )


TXLOG_PARTITIONED_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       MIN(event_id) AS min_event_id,
       MAX(event_id) AS max_event_id
FROM events
WHERE event_type = 'purchase' AND event_id BETWEEN 100 AND 699
GROUP BY event_type
"""

PART_QUERIES["txlog_partitioned_prune_events"] = txlog_partitioned_prune_events
PART_ORACLES["txlog_partitioned_prune_events"] = TXLOG_PARTITIONED_SQL


# ===========================================================================
# round 8: row-level DML — DELETE / UPDATE / MERGE with file-level
# copy-on-write, composed under one driver-grade hash
# ===========================================================================


def txlog_dml_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DML ladder on a txlog table (sources/txlog.py, round 8):
    DELETE (error events in one event_id band — localized in the
    range-clustered column, so the CoW rewrite skips the other
    files) → UPDATE (double click
    values at % 7 = 0, assignments reading the pre-update row) →
    MERGE (source = the % 11 rows with value −1 plus % 97 rows
    re-keyed +10M as inserts; matched rows replaced, inserts in the
    same commit) — then an aggregate over the final state. Each step
    is file-level copy-on-write: only files containing affected rows
    rewrite (asserted in-query — the delete must leave some v0 files
    live by path), which is what makes a 0.1% DELETE on a 100 TB
    table a 0.1% rewrite.

    ORACLE: replays the three statements as CTEs over the events view
    (NOT-matching filter, CASE update, anti-join ∪ source merge) — the
    table round-trip, the CoW file splits, and SQL DML semantics
    (NULL predicates keep rows, assignments see old values) must all
    agree for the hash to land.
    """
    import hashlib
    import shutil
    import tempfile

    from ..sources.txlog import TxLogTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"txlog_dml_{tag}")
    shutil.rmtree(root, ignore_errors=True)

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = TxLogTable.create(
        root, ev.repartitionByRange(8, "event_id"), stat_cols=["event_id"]
    )
    v0_files = set(t.live_files())

    t.delete_where(
        spark,
        "event_id BETWEEN 2000 AND 2999 AND event_type = 'error'",
    )
    if not (set(t.live_files()) & v0_files):
        raise AssertionError(
            "delete rewrote every file — copy-on-write regressed"
        )
    t.update_where(
        spark,
        {"value": "value * 2"},
        "event_type = 'click' AND event_id % 7 = 0",
    )

    cur = t.read(spark)
    src = (
        cur.filter(F.col("event_id") % 11 == 0)
        .withColumn("value", F.lit(-1.0))
        .unionByName(
            cur.filter(F.col("event_id") % 97 == 0).withColumn(
                "event_id", F.col("event_id") + F.lit(10_000_000)
            ).withColumn("value", F.lit(1.5))
        )
    )
    t.merge_into(spark, src, keys=["event_id"])

    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.max("event_id").alias("max_event_id"),
        )
    )


TXLOG_DML_SQL = """
WITH base AS (
  SELECT event_id, user_id, event_type, value FROM events
), del AS (
  SELECT * FROM base
  WHERE NOT COALESCE(
    event_id BETWEEN 2000 AND 2999 AND event_type = 'error', FALSE)
), upd AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN COALESCE(event_type = 'click' AND event_id % 7 = 0, FALSE)
              THEN value * 2 ELSE value END AS value
  FROM del
), src AS (
  SELECT event_id, user_id, event_type, CAST(-1.0 AS DOUBLE) AS value
  FROM upd WHERE event_id % 11 = 0
  UNION ALL
  SELECT event_id + 10000000, user_id, event_type, CAST(1.5 AS DOUBLE)
  FROM upd WHERE event_id % 97 = 0
), merged AS (
  SELECT u.* FROM upd u ANTI JOIN src s ON u.event_id = s.event_id
  UNION ALL
  SELECT * FROM src
)
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       MAX(event_id) AS max_event_id
FROM merged
GROUP BY event_type
"""

PART_QUERIES["txlog_dml_events"] = txlog_dml_events
PART_ORACLES["txlog_dml_events"] = TXLOG_DML_SQL


# ===========================================================================
# round 8: the native txlog DataSource under an oracle hash — batch
# parity + a checkpointed streaming drain, one row
# ===========================================================================


def streaming_txlog_source_ingest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The format("txlog") DataSource end-to-end
    (sources/txlog_source.py): events land in a txlog table as create
    + two appends (one schema-evolving — older files must pad the new
    column NULL through the Arrow read), then

    1. BATCH: ``spark.read.format("txlog")`` must agree with the
       library read (asserted in-query on counts), and
    2. STREAMING: an availableNow drain through version-offsets into a
       parquet sink delivers every commit exactly once; the returned
       aggregate is computed from the SINK's files, so a duplicated or
       dropped micro-batch breaks the hash.

    ORACLE: the same aggregate straight off the events view — the
    table round-trip, the Arrow ingest, the offset bookkeeping, and
    the evolution padding must all be lossless.
    """
    import hashlib
    import shutil
    import tempfile

    from ..sources.txlog import TxLogTable
    from ..sources.txlog_source import register_txlog_source

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"txsrc_{tag}")
    out = os.path.join(tempfile.gettempdir(), f"txsrc_out_{tag}")
    ck = os.path.join(tempfile.gettempdir(), f"txsrc_ck_{tag}")
    for d in (root, out, ck):
        shutil.rmtree(d, ignore_errors=True)

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = TxLogTable.create(
        root, ev.filter(F.col("event_id") % 3 == 0).repartition(4)
    )
    t.append(ev.filter(F.col("event_id") % 3 == 1).repartition(4), spark)
    t.append(
        ev.filter(F.col("event_id") % 3 == 2).withColumn(
            "flagged", F.col("value") > 50
        ),
        spark,
        merge_schema=True,
    )

    register_txlog_source(spark)
    batch = spark.read.format("txlog").load(root)
    n_lib, n_src = t.read(spark).count(), batch.count()
    if n_lib != n_src:
        raise AssertionError(
            f"txlog source batch read diverged: {n_src} vs {n_lib}"
        )

    q = (
        spark.readStream.format("txlog")
        .load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.count(F.when(F.col("flagged"), 1)).alias("n_flagged"),
            F.max("event_id").alias("max_event_id"),
        )
    )


STREAMING_TXLOG_SOURCE_SQL = """
SELECT event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       COUNT(CASE WHEN event_id % 3 = 2 AND value > 50 THEN 1 END)
         AS n_flagged,
       MAX(event_id) AS max_event_id
FROM events
GROUP BY event_type
"""

PART_QUERIES["streaming_txlog_source_ingest"] = streaming_txlog_source_ingest
PART_ORACLES["streaming_txlog_source_ingest"] = STREAMING_TXLOG_SOURCE_SQL
