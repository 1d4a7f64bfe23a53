"""Round-10 query-inventory section (see plans/inventory.py for the
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
# round 10: at-rest index maintenance under corpus DML — the change
# feed drives delete+insert postings in ONE replace_where commit; the
# probe then matches a fresh inline BM25 of the post-DML corpus,
# which is exactly what the oracle replays
# ===========================================================================

_RIDX_QUERIES = [
    (1, "spark hash join"),
    (2, "table scan fast"),
    (3, "sort merge document"),
]
_RIDX_UPD_TEXT = "replacement text about spark hash join tables"
_RIDX_NEW = [
    (900001, "fresh spark document about hash tables"),
    (900002, "another fresh document about sort merge"),
]


def search_index_refresh_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 served from an at-rest inverted index AFTER the
    indexed corpus mutated underneath it (operators/search.py round
    10): the corpus lives as a txlog table, a DML ladder (CoW delete →
    text rewrite → append) runs against it, and text_index_refresh
    consumes the COMMIT-SCOPED change feed into one atomic
    replace_where on the postings table — old postings of touched docs
    out, final-image postings in, cumulative stats and the
    idx_src_version watermark advanced in the same commit, corpus
    never rescanned.  In-query assertions: the refresh commit is a
    replace_where, the watermark equals the corpus head, and a second
    refresh is a no-op.  The ORACLE replays inline BM25 over the
    post-DML corpus in SQL — so the hash pins the feed reconstruction,
    the final-image derivation, the stats telescope, AND the scoring.
    """
    import hashlib
    import shutil
    import tempfile

    from ..operators.search import (
        text_index_build,
        text_index_refresh,
        text_index_topk,
    )
    from ..sources.txlog import TxLogTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"ridx_{tag}")
    shutil.rmtree(base, ignore_errors=True)
    corpus_root = os.path.join(base, "corpus")
    root = os.path.join(base, "idx")

    docs = (
        _t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    corpus = TxLogTable.create(corpus_root, docs)
    text_index_build(
        corpus.read(spark), root, buckets=16, src_version=0
    )

    corpus.delete_where(spark, "doc_id % 7 = 0")
    corpus.update_where(
        spark, {"text": f"'{_RIDX_UPD_TEXT}'"}, "doc_id % 11 = 3"
    )
    corpus.append(
        spark.createDataFrame(_RIDX_NEW, "doc_id LONG, text STRING"),
        spark,
    )

    v = text_index_refresh(spark, root, corpus_root)
    t = TxLogTable(root)
    if v is None or t._read_commit(v)["op"] != "replace_where":
        raise AssertionError(
            "refresh must land as one replace_where commit"
        )
    if int(t.commit_meta(v)["idx_src_version"]) != corpus.latest_version():
        raise AssertionError("watermark must advance to the corpus head")
    if text_index_refresh(spark, root, corpus_root) is not None:
        raise AssertionError("second refresh must be a no-op")

    return text_index_topk(spark, root, _RIDX_QUERIES, k=10)


_RIDX_QS_VALUES = ", ".join(f"({i}, '{q}')" for i, q in _RIDX_QUERIES)
_RIDX_NEW_VALUES = ", ".join(
    f"({i}, '{txt}')" for i, txt in _RIDX_NEW
)

SEARCH_IDX_REFRESH_SQL = f"""
WITH corpus AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 3 THEN '{_RIDX_UPD_TEXT}'
              ELSE text END AS text
  FROM documents
  WHERE text IS NOT NULL AND doc_id % 7 <> 0
  UNION ALL
  SELECT * FROM (VALUES {_RIDX_NEW_VALUES}) AS nd(doc_id, text)
),
qs(query_id, qtext) AS (VALUES {_RIDX_QS_VALUES}),
qterm AS (
  SELECT DISTINCT query_id,
         unnest(list_filter(string_split(trim(regexp_replace(lower(qtext),
                '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> '')) AS token
  FROM qs
),
docs AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text),
             '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> '') AS toks
  FROM corpus WHERE text IS NOT NULL
),
dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
stats AS (SELECT COUNT(*) AS n_docs,
                 CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS token FROM docs)
  WHERE token IN (SELECT DISTINCT token FROM qterm)
  GROUP BY 1, 2
),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT q.query_id, t.doc_id,
         ROUND(SUM(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * t.tf * (1.2 + 1.0)
           / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))
         ), 6) AS score
  FROM qterm q
  JOIN tf t USING (token)
  JOIN dfreq d USING (token)
  JOIN dl l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
)
SELECT query_id, doc_id, score FROM (
  SELECT query_id, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rn
  FROM scored
) WHERE rn <= 10
"""

PART_QUERIES["search_index_refresh_docs"] = search_index_refresh_docs
PART_ORACLES["search_index_refresh_docs"] = SEARCH_IDX_REFRESH_SQL


# ===========================================================================
# round 10: incremental COUNT(DISTINCT) — the aggregate plain
# count/sum IVM cannot maintain, via the per-(key, value)
# multiplicity support state; equality with recompute is the law
# ===========================================================================


def ivm_count_distinct_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, day) COUNT(DISTINCT user_id) maintained
    through the standard insert+delete CDC scenario
    (operators/ivm.distinct_state / incremental_distinct_update /
    distinct_counts): the support state stores per-(key, user)
    multiplicities, so a delete that removes ONE of a user's rows
    decrements without changing the distinct count, while a delete
    removing the user's LAST row drops them — the case a count-only
    state cannot decide.  The delete set (event_id % 10 == 0) hits
    both cases by construction.  Feed churn collapses to signed
    deltas; maintenance never reads the base.  The oracle recomputes
    COUNT(DISTINCT) from scratch over the effective rows — equality
    is the IVM law under the driver hash."""
    from ..operators.ivm import (
        distinct_counts,
        distinct_state,
        incremental_distinct_update,
    )

    ev = _t(spark, sf_dir, "events").withColumn(
        "dt", F.date_format(F.col("ts"), "yyyy-MM-dd")
    )
    split = F.lit("2024-01-16")
    base = ev.filter(F.col("ts") < split)
    keys = ["event_type", "dt"]
    state = distinct_state(base, keys, "user_id")
    inserts = ev.filter(F.col("ts") >= split).withColumn("op", F.lit("I"))
    deletes = base.filter(F.col("event_id") % 10 == 0).withColumn(
        "op", F.lit("D")
    )
    changes = inserts.unionByName(deletes)
    new_state = incremental_distinct_update(state, changes, keys, "user_id")
    return distinct_counts(new_state, keys).select(
        "event_type", "dt", F.col("n_distinct").cast("long").alias("n_distinct")
    )


IVM_COUNT_DISTINCT_SQL = """
WITH eff AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt, user_id
  FROM events WHERE ts >= '2024-01-16'
  UNION ALL
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS dt, user_id
  FROM events
  WHERE ts < '2024-01-16' AND event_id % 10 <> 0
)
SELECT event_type, dt, COUNT(DISTINCT user_id) AS n_distinct
FROM eff
WHERE user_id IS NOT NULL
GROUP BY event_type, dt
"""

PART_QUERIES["ivm_count_distinct_events"] = ivm_count_distinct_events
PART_ORACLES["ivm_count_distinct_events"] = IVM_COUNT_DISTINCT_SQL


# ===========================================================================
# round 10: hidden partitioning — Iceberg-style partition transforms
# (day(ts) + bucket(N, user_id)); predicates on the SOURCE columns
# prune at the manifest, DML re-derives, the logical schema never
# shows the derived columns
# ===========================================================================


def txlog_hidden_partition_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events stored as a txlog table partitioned by the TRANSFORMS
    day(ts) + bucket(8, user_id) (sources/txlog.py round 10): the
    derived values live only in the hive paths and commit manifest —
    the logical schema stays (event_id, user_id, event_type, ts,
    value).  A CoW DELETE of one calendar day runs with a ts-range
    prune that the manifest translates to day-partition pruning; the
    final aggregate reads through a ts-range prune and asserts
    in-query that every scanned file lies under a matching ts_day
    directory (hidden partitioning must actually route the scan, not
    just decorate paths).  The ORACLE replays the post-delete
    aggregate in SQL — routing must be invisible to results."""
    import hashlib
    import shutil
    import tempfile

    from ..sources.txlog import TxLogTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"txlog_hp_{tag}")
    shutil.rmtree(root, ignore_errors=True)

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select("event_id", "user_id", "event_type", "ts", "value")
        # co-locate each day before the partitionBy write: one task
        # per day -> files = days x buckets, not x input partitions
        .repartition(F.to_date("ts"))
    )
    t = TxLogTable.create(
        root, ev, partition_by=["day(ts)", "bucket(8, user_id)"]
    )

    t.delete_where(
        spark,
        "ts >= '2024-01-05' AND ts < '2024-01-06'",
        prune={"ts": ("2024-01-05", "2024-01-06")},
    )

    lo, hi = "2024-01-10", "2024-01-20"
    pruned = t.read(spark, prune={"ts": (lo, hi)})
    bad = [
        f
        for f in pruned.inputFiles()
        if not any(
            f"ts_day=2024-01-{d:02d}" in f for d in range(10, 21)
        )
    ]
    if bad or not pruned.inputFiles():
        raise AssertionError(
            f"hidden partition prune escaped its days: {bad[:3]}"
        )
    if len(pruned.inputFiles()) >= len(t.read(spark).inputFiles()):
        raise AssertionError("ts-range prune dropped no files")
    return (
        pruned.filter((F.col("ts") >= lo) & (F.col("ts") < hi))
        .groupBy(
            F.date_format("ts", "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
        )
    )


TXLOG_HIDDEN_PART_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM events
WHERE ts IS NOT NULL
  AND NOT (ts >= '2024-01-05' AND ts < '2024-01-06')
  AND ts >= '2024-01-10' AND ts < '2024-01-20'
GROUP BY 1, 2
"""

PART_QUERIES["txlog_hidden_partition_events"] = txlog_hidden_partition_events
PART_ORACLES["txlog_hidden_partition_events"] = TXLOG_HIDDEN_PART_SQL
