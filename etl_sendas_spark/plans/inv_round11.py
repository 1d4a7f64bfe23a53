"""Round-11 query-inventory section (see plans/inventory.py for the
registry discipline). This module is NOT a public entry point —
plans.inventory star-imports it and owns the DRIVER_WINDOW literal and
the merged QUERIES/ORACLES registries.

Three rows pin the round's table-format machinery end to end:

- ``txlog_column_mapping_events`` — Delta-style column mapping
  (``sources/txlog.py`` ``rename_column``/``drop_column``): a rename
  mid-DML-ladder that rewrites ZERO data files, with the ladder's
  final state hash-checked against a pure-SQL replay and the
  metadata-only / time-travel / zone-map-through-rename laws asserted
  in-query.
- ``catalog_snapshot_events`` — the multi-table :class:`Catalog`
  (``sources/txlog.py``): independently-committed tables become
  visible only through one atomic pin record; the torn intermediate
  state is asserted invisible in-query and the published snapshot's
  join is hash-checked against SQL.
- ``txlog_type_widening_events`` — metadata-only TYPE WIDENING
  (int→bigint, float→double, and — round 12 — decimal precision
  growth and date→timestamp_ntz): mixed-width files upcast through
  the explicit-schema read, with the narrow-type time-travel law
  asserted in-query and the float32 round-trip replayed by the
  oracle.
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
# round 11: column mapping — RENAME/DROP as metadata-only commits
# ===========================================================================

_CM_NEW = [
    (900001, 1, "signup", 12.5, "re-added"),
    (900002, 2, "view", 30.0, "re-added"),
]


def txlog_column_mapping_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style column mapping mid-ladder (sources/txlog.py round
    11): an events-derived txlog table is created range-clustered on
    ``value`` (zone maps), evolved with RENAME COLUMN value→amount and
    DROP COLUMN props — both METADATA-ONLY (asserted in-query: the
    live file set is bit-identical across both commits and neither
    carries add/remove) — then mutated UNDER THE NEW NAME (UPDATE
    doubling click amounts, DELETE of the post-update tail) and
    evolved again by re-adding the dropped logical name via a
    merge-schema append, which must bind a FRESH physical column so
    the dropped column's dead bytes cannot resurrect (asserted: every
    pre-re-add row reads NULL props). Time travel below the rename
    must show the OLD name, and zone-map pruning must keep skipping
    files when probed by the NEW name (prune specs translate through
    the name→physical mapping; asserted via a strict inputFiles
    subset). The ORACLE replays the whole ladder in pure SQL, so the
    hash pins the mapping read path, the DML semantics under renamed
    names, and the no-resurrection rule at once."""
    from ..sources.txlog import TxLogTable

    base = _scratch(sf_dir, "cmap")
    root = os.path.join(base, "t")

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "props"
    )
    even = ev.filter(F.col("event_id") % 2 == 0)
    odd = ev.filter(F.col("event_id") % 2 == 1)
    t = TxLogTable.create(
        root,
        even.repartitionByRange(4, "value"),
        stat_cols=["value"],
    )
    t.append(odd.repartitionByRange(4, "value"), spark)

    live_before = sorted(t.live_files())
    v_ren = t.rename_column("value", "amount")
    v_drop = t.drop_column("props")
    if sorted(t.live_files()) != live_before:
        raise AssertionError("rename/drop must rewrite zero data files")
    for v in (v_ren, v_drop):
        c = t.commit_meta(v)
        if c.get("add") or c.get("remove"):
            raise AssertionError(
                "rename/drop commits must be metadata-only"
            )
    if "value" not in t.read(spark, v_ren - 1).columns:
        raise AssertionError(
            "time travel below the rename must show the old name"
        )
    full = set(t.read(spark, v_ren).inputFiles())
    pruned = set(
        t.read(spark, v_ren, prune={"amount": (None, 50.0)}).inputFiles()
    )
    if not pruned < full:
        raise AssertionError(
            "zone maps must keep pruning through the renamed column"
        )

    # DML under the new logical name
    t.update_where(spark, {"amount": "amount * 2"}, "event_type = 'click'")
    t.delete_where(spark, "amount > 400")

    # re-add the dropped logical name: fresh physical, NULL history
    t.append(
        spark.createDataFrame(
            _CM_NEW,
            "event_id LONG, user_id LONG, event_type STRING, "
            "amount DOUBLE, props STRING",
        ),
        spark,
        merge_schema=True,
    )
    cur = t.read(spark)
    if (
        cur.filter(
            (F.col("event_id") < 900000) & F.col("props").isNotNull()
        ).count()
        != 0
    ):
        raise AssertionError(
            "dropped column's bytes resurrected under the re-added name"
        )

    return (
        cur.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("amount").cast("decimal(18,4)"))
            .cast("double")
            .alias("amount_sum"),
            F.count("props").alias("props_n"),
        )
    )


_CM_NEW_VALUES = ", ".join(
    f"({i}, {u}, '{e}', {a}, '{p}')" for i, u, e, a, p in _CM_NEW
)

TXLOG_COLUMN_MAPPING_SQL = f"""
WITH renamed AS (
  SELECT event_id, user_id, event_type, value AS amount,
         CAST(NULL AS VARCHAR) AS props   -- props dropped mid-ladder
  FROM events
), updated AS (
  SELECT event_id, user_id, event_type,
         CASE WHEN event_type = 'click' THEN amount * 2
              ELSE amount END AS amount,
         props
  FROM renamed
), deleted AS (
  -- DML semantics: rows where the predicate is NULL are KEPT
  SELECT * FROM updated WHERE amount <= 400 OR amount IS NULL
), final AS (
  SELECT * FROM deleted
  UNION ALL
  SELECT * FROM (VALUES {_CM_NEW_VALUES})
    AS v(event_id, user_id, event_type, amount, props)
)
SELECT event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(amount AS DECIMAL(18,4))) AS DOUBLE) AS amount_sum,
       COUNT(props) AS props_n
FROM final
GROUP BY event_type
"""

PART_QUERIES["txlog_column_mapping_events"] = txlog_column_mapping_events
PART_ORACLES["txlog_column_mapping_events"] = TXLOG_COLUMN_MAPPING_SQL

# ===========================================================================
# round 11: multi-table Catalog — atomic cross-table pins
# ===========================================================================


def catalog_snapshot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-table Catalog end to end (sources/txlog.py round 11):
    a facts table (events) and a derived dim table (user → segment)
    commit INDEPENDENTLY, and become readable only through atomic
    {table → version} pin records. In-query assertions pin the
    transaction laws: a facts commit that has not been published is
    INVISIBLE to ``snapshot()`` (the torn (new facts, old dim) pair
    can never be read), a conditional publish against a stale head
    raises CommitConflict (the Iceberg pointer CAS), partial publishes
    merge over prior pins, and the historical pin view time-travels.
    The returned result is the PUBLISHED snapshot's join — facts at
    their final pinned version enriched by the updated dim — which the
    ORACLE replays in pure SQL, so the hash pins the pin-resolution
    read path and the published content at once."""
    from ..sources.txlog import Catalog, CommitConflict, TxLogTable

    base = _scratch(sf_dir, "cata")
    facts_root = os.path.join(base, "facts")
    dims_root = os.path.join(base, "dims")

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    even = ev.filter(F.col("event_id") % 2 == 0)
    odd = ev.filter(F.col("event_id") % 2 == 1)
    dims_df = (
        ev.select("user_id")
        .distinct()
        .withColumn("segment", (F.col("user_id") % 5).cast("long"))
    )

    facts = TxLogTable.create(facts_root, even)
    dims = TxLogTable.create(dims_root, dims_df)
    cat = Catalog(os.path.join(base, "_catalog"))
    cat.publish({"facts": 0, "dims": 0}, expected=-1)

    # torn write: facts advance, publish crashes before landing —
    # the new commit must be invisible through the catalog
    facts.append(odd, spark)
    torn = cat.snapshot(
        spark, {"facts": facts_root, "dims": dims_root}
    )
    if torn["facts"].count() != even.count():
        raise AssertionError(
            "unpublished facts commit leaked into the catalog snapshot"
        )

    # a stale-head publish must lose loudly (the pointer CAS)
    try:
        cat.publish({"facts": 1}, expected=-1)
        raise AssertionError("stale-head publish must raise")
    except CommitConflict:
        pass

    # redelivery: finish the dim move and publish BOTH atomically
    v_dim = dims.update_where(
        spark, {"segment": "segment + 10"}, "user_id % 7 = 0"
    )
    cat.publish({"facts": 1, "dims": v_dim}, expected=0)

    # partial publish merges over prior pins; history time-travels
    if cat.pins(version=0) != {"facts": 0, "dims": 0}:
        raise AssertionError("historical pin view must time-travel")
    if cat.pins() != {"facts": 1, "dims": v_dim}:
        raise AssertionError("published pins must merge forward")

    snap = cat.snapshot(spark, {"facts": facts_root, "dims": dims_root})
    return (
        snap["facts"]
        .join(snap["dims"], "user_id")
        .groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,4)"))
            .cast("double")
            .alias("value_sum"),
        )
    )


CATALOG_SNAPSHOT_SQL = """
WITH dims AS (
  SELECT user_id,
         CASE WHEN user_id % 7 = 0 THEN (user_id % 5) + 10
              ELSE user_id % 5 END AS segment
  FROM (SELECT DISTINCT user_id FROM events)
)
SELECT d.segment,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS value_sum
FROM events e
JOIN dims d USING (user_id)
GROUP BY d.segment
"""

PART_QUERIES["catalog_snapshot_events"] = catalog_snapshot_events
PART_ORACLES["catalog_snapshot_events"] = CATALOG_SNAPSHOT_SQL

# ===========================================================================
# round 11: type widening — lossless type promotion as metadata
# ===========================================================================


def txlog_type_widening_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta-style TYPE WIDENING mid-ladder (sources/txlog.py round
    11): an events-derived table is created with value stored as
    FLOAT and a day-of-month stored as INT, then widened to
    double/bigint by two METADATA-ONLY commits (asserted in-query:
    live file set bit-identical, no add/remove), appended to with
    wide-typed rows (mixed-width files now coexist — Spark's footer
    merge would refuse them; the explicit-schema read upcasts each
    file), mutated under the wide schema, and finally aggregated.
    Time travel below the widen must show the NARROW types. The
    ORACLE replays the ladder with the same float round-trip
    (CAST(value AS REAL) then back to DOUBLE — IEEE float32
    truncation is engine-identical), so the hash pins the upcast read
    path and the narrow-to-wide value identity at once.

    Round 12 extends the ladder along the two parametric axes
    (VERDICT r11 #4): ``amt`` is stored DECIMAL(10,2) and widened to
    DECIMAL(14,2) (precision growth, same scale — the decimal
    derivation FLOOR(value*100)/100 is tie-free, so the double→
    decimal cast rounds identically in both engines), and ``day`` is
    stored DATE and widened to TIMESTAMP_NTZ (old files' date32
    upcasts to midnight on read; the appended half lands natively
    NTZ) — both still metadata-only, both still hash-pinned."""
    from ..sources.txlog import TxLogTable

    base = _scratch(sf_dir, "widen")
    root = os.path.join(base, "t")

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("float").alias("val"),
        F.dayofmonth("ts").cast("int").alias("dom"),
        (F.floor(F.col("value") * 100) / 100)
        .cast("decimal(10,2)")
        .alias("amt"),
        F.col("ts").cast("date").alias("day"),
    )
    even = ev.filter(F.col("event_id") % 2 == 0)
    odd = ev.filter(F.col("event_id") % 2 == 1)
    t = TxLogTable.create(root, even, stat_cols=["event_id"])

    live0 = sorted(t.live_files())
    v1 = t.widen_column("val", "double")
    v2 = t.widen_column("dom", "bigint")
    v3 = t.widen_column("amt", "decimal(14,2)")
    v4 = t.widen_column("day", "timestamp_ntz")
    if sorted(t.live_files()) != live0:
        raise AssertionError("widen must rewrite zero data files")
    for v in (v1, v2, v3, v4):
        c = t.commit_meta(v)
        if c.get("add") or c.get("remove"):
            raise AssertionError("widen commits must be metadata-only")
    narrow = t.read(spark, v1 - 1).schema
    if (
        narrow["val"].dataType.simpleString() != "float"
        or narrow["dom"].dataType.simpleString() != "int"
        or narrow["amt"].dataType.simpleString() != "decimal(10,2)"
        or narrow["day"].dataType.simpleString() != "date"
    ):
        raise AssertionError(
            "time travel below the widen must show the narrow types"
        )

    # wide-typed append: mixed-width files in one table (the odd
    # half's day lands NATIVELY timestamp_ntz at the same midnight
    # the even half's stored date32 upcasts to)
    t.append(
        odd.select(
            "event_id",
            "event_type",
            F.col("val").cast("double").alias("val"),
            F.col("dom").cast("bigint").alias("dom"),
            F.col("amt").cast("decimal(14,2)").alias("amt"),
            F.col("day").cast("timestamp_ntz").alias("day"),
        ),
        spark,
    )
    # DML under the wide schema
    t.update_where(
        spark, {"val": "val * 2"}, "event_type = 'purchase'"
    )
    t.delete_where(spark, "dom = 31")

    return (
        t.read(spark)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("val").cast("decimal(18,4)"))
            .cast("double")
            .alias("val_sum"),
            F.sum("dom").alias("dom_sum"),
            F.sum("amt").cast("double").alias("amt_sum"),
            # string form: pandas renders Spark NTZ as datetime64[ns]
            # but DuckDB as [us] - the driver hash is dtype-sensitive
            F.date_format(F.max("day"), "yyyy-MM-dd HH:mm:ss")
            .alias("max_day"),
        )
    )


TXLOG_TYPE_WIDENING_SQL = """
WITH narrow AS (
  -- the create stored value as FLOAT: replay the same float32
  -- truncation before widening back to double; amt replays the
  -- tie-free decimal derivation; day is the stored date read back
  -- as a (midnight) timestamp after the NTZ widening
  SELECT event_id, event_type,
         CAST(CAST(value AS REAL) AS DOUBLE) AS val,
         CAST(EXTRACT(day FROM ts) AS BIGINT) AS dom,
         CAST(FLOOR(value * 100) / 100 AS DECIMAL(14,2)) AS amt,
         CAST(CAST(ts AS DATE) AS TIMESTAMP) AS day
  FROM events
), updated AS (
  SELECT event_id, event_type,
         CASE WHEN event_type = 'purchase' THEN val * 2
              ELSE val END AS val,
         dom, amt, day
  FROM narrow
), deleted AS (
  SELECT * FROM updated WHERE dom <> 31 OR dom IS NULL
)
SELECT event_type,
       COUNT(*) AS cnt,
       CAST(SUM(CAST(val AS DECIMAL(18,4))) AS DOUBLE) AS val_sum,
       CAST(SUM(dom) AS BIGINT) AS dom_sum,
       CAST(SUM(amt) AS DOUBLE) AS amt_sum,
       strftime(MAX(day), '%Y-%m-%d %H:%M:%S') AS max_day
FROM deleted
GROUP BY event_type
"""

PART_QUERIES["txlog_type_widening_events"] = txlog_type_widening_events
PART_ORACLES["txlog_type_widening_events"] = TXLOG_TYPE_WIDENING_SQL
