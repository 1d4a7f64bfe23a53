"""Query-inventory section split out of plans/inventory.py (round-6
item 9: no file >2,500 lines). This module is NOT a public entry
point — plans.inventory star-imports it and owns the single
DRIVER_WINDOW literal and the merged QUERIES/ORACLES registries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.dates import edad_unidad, edad_valor, parse_js_timestamp
from ..functions.strings import split_full_name
from ..functions.text import (
    PII_PATTERNS,
    doc_fingerprint,
    lang_id,
    normalized_text,
    pii_counts,
    pii_redact,
    quality_features,
    repeated_ngram_ratio,
    token_count,
)
from ..operators.dedupe import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from ..operators.marking import capped_group_mark, gap_anchor_mark, sessionize
from ..operators.multimodal import extract_features
from ..operators.relational import first_flag, keep_first
from ..operators.sampling import stratified_sample
from ..operators.similarity import cosine_topk, ivf_cosine_topk, lsh_cosine_topk
from ..sources.readers import ROW_ID, load_fact_files
from .sendas_driver_query import SENDAS_FULL_SQL, sendas_full_pipeline
from .tpch import TPCH_ORACLES, TPCH_QUERIES


def _t(
    spark: SparkSession, sf_dir: str, name: str, widen: bool = True
) -> DataFrame:
    # widen=False: callers whose FIRST operator is an exchange (window,
    # groupBy, shuffle join) — the round-robin widening repartition
    # would be a wasted extra pass there, since the query's own shuffle
    # already redistributes the single-row-group local scan
    # (optimization guide §2.4; r12 interleaved A/Bs at sf0.1:
    # r1 1.15 vs 1.64 s, sessionize 0.52 vs 0.95 s, q1 0.78 vs 0.94 s).
    # Keep the default for scan-heavy per-row compute (regex/text),
    # which widening genuinely parallelizes.
    from ..sources.readers import read_table

    return read_table(spark, sf_dir, name, widen=widen)


def _dec_sum(col, scale: int = 6):
    """Order-insensitive exact sum: cast each term to DECIMAL, sum, back
    to double. DuckDB mirror: SUM(CAST(x AS DECIMAL(18,6)))::DOUBLE."""
    return F.sum(col.cast("decimal(18,6)")).cast("double")



# ===========================================================================
# relational core
# ===========================================================================

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship (TPC-H Q1 shape): scan → filter → groupBy → 6 aggregates.

    Exercises A-family aggregation + predicate pushdown (the shipdate
    filter reaches the parquet scan).
    """
    li = _t(spark, sf_dir, "lineitem", widen=False)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_quantity")).alias("sum_qty"),
            _dec_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("sum_disc_price"),
            F.round(
                _dec_sum(F.col("l_quantity")) / F.count("*"), 4
            ).alias("avg_qty"),
            F.round(
                _dec_sum(F.col("l_extendedprice")) / F.count("*"), 4
            ).alias("avg_price"),
            F.count("*").alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_qty,
       ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 4) AS avg_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape on the synthetic schema: 3-way join (filtered fact
    ⋈ filtered orders ⋈ broadcast customer segment) → group → top-10 by
    revenue. The segment filter prunes customers before the broadcast;
    both date filters push into the parquet scans; the only shuffles are
    the li⋈orders join and the final aggregation. ``l_orderkey`` breaks
    revenue ties so the top-10 is engine-independent."""
    cutoff = "1998-06-01"
    cust = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(cust), orders.o_custkey == cust.c_custkey
    )
    return (
        j.groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            _dec_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
        .select(
            "l_orderkey",
            "revenue",
            F.col("o_orderdate").cast("string").alias("o_orderdate"),
            "o_orderpriority",
        )
    )


Q3_SQL = """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       CAST(o_orderdate AS VARCHAR) AS o_orderdate,
       o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey
  AND l_orderkey = o_orderkey
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def a_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical aggregate: revenue by (returnflag, linestatus) with
    ROLLUP subtotals and grand total — one shuffle, Catalyst expands the
    grouping sets; null grouping cells mark the subtotal rows."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            _dec_sum(F.col("l_extendedprice")).alias("sum_price"),
            F.count("*").alias("n_rows"),
        )
    )


A_ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
       COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
"""


def a_exact_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median / p90) of quantity per
    returnflag. Both engines use linear interpolation (Spark
    ``percentile``, DuckDB ``quantile_cont``); the approximate scale
    path is ``percentile_approx`` with the same call shape."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(l_extendedprice, 0.99)"), 6).alias("price_p99"),
    )


A_PCTL_SQL = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS p50,
       ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90,
       ROUND(quantile_cont(l_extendedprice, 0.99), 6) AS price_p99
FROM lineitem
GROUP BY l_returnflag
"""


def a_pivot_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: revenue by returnflag spread across linestatus columns —
    one shuffle (Catalyst rewrites pivot into conditional aggregates,
    exactly the formulation the oracle states)."""
    li = _t(spark, sf_dir, "lineitem")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(_dec_sum(F.col("l_extendedprice")))
    )
    return pivoted.select(
        "l_returnflag",
        F.coalesce("F", F.lit(0.0)).alias("sum_f"),
        F.coalesce("O", F.lit(0.0)).alias("sum_o"),
    )


A_PIVOT_SQL = """
SELECT l_returnflag,
       COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'F'
                 THEN CAST(l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE), 0.0) AS sum_f,
       COALESCE(CAST(SUM(CASE WHEN l_linestatus = 'O'
                 THEN CAST(l_extendedprice AS DECIMAL(18,6)) END) AS DOUBLE), 0.0) AS sum_o
FROM lineitem
GROUP BY l_returnflag
"""


def a_grouping_sets_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity event rollup in ONE shuffle: GROUPING SETS over
    (event_type, day), (event_type), (day), () — Catalyst expands the
    sets map-side, so the four granularities cost one pass over the fact
    table instead of four separate jobs (the way a report layer would
    otherwise issue them). ``lvl`` is the grouping_id bitmask that
    distinguishes a subtotal row from a genuine null key."""
    ev = _t(spark, sf_dir, "events", widen=False)
    g = ev.select("event_type", F.to_date("ts").alias("day"), "value")
    agg = g.groupingSets(
        [["event_type", "day"], ["event_type"], ["day"], []],
        "event_type",
        "day",
    ).agg(
        F.count("*").alias("n_events"),
        _dec_sum(F.col("value")).alias("sum_value"),
        F.grouping_id().cast("long").alias("lvl"),
    )
    # date → ISO string so the oracle compare is dtype-stable (DuckDB
    # DATE surfaces as datetime64 in pandas, Spark as date objects).
    return agg.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        "n_events",
        "sum_value",
        "lvl",
    )


A_GROUPING_SETS_SQL = """
SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       CAST(GROUPING(event_type, CAST(ts AS DATE)) AS BIGINT) AS lvl
FROM events
GROUP BY GROUPING SETS ((event_type, CAST(ts AS DATE)), (event_type), (CAST(ts AS DATE)), ())
"""


def j9_update_by_row_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 directly: the pandas index-aligned ``df.update(sub)`` as a
    row-id join + coalesce (reference :380,409,429,543,559) — orders
    with priority re-marked for a filtered update set, others keeping
    their value."""
    from ..operators.relational import update_by_row_id

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    updates = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit("0-RECLASSIFIED").alias("o_orderpriority")
    )
    out = update_by_row_id(
        orders, updates, value_col="o_orderpriority", row_id="o_orderkey"
    )
    return out.select("o_orderkey", "o_orderstatus", "o_orderpriority")


J9_UPDATE_SQL = """
SELECT o_orderkey, o_orderstatus,
       CASE WHEN o_orderstatus = 'F' THEN '0-RECLASSIFIED'
            ELSE o_orderpriority END AS o_orderpriority
FROM orders
"""


def j_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE: a deterministic change feed (delete every key ≡0 mod
    10, reprice keys ≡1,2, insert shifted copies of keys ≡3) applied
    onto orders in ONE full-outer join — the incremental-maintenance
    primitive the reference lacks (it recomputes whole months). The
    +1000.0 reprice is an exactly-representable double so the oracle
    needs no rounding."""
    from ..operators.relational import merge_changes

    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    deletes = base.filter(k % 10 == 0).withColumn("op", F.lit("D"))
    updates = (
        base.filter((k % 10).isin(1, 2))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("op", F.lit("U"))
    )
    inserts = (
        base.filter(k % 10 == 3)
        .withColumn("o_orderkey", k + F.lit(100_000_000))
        .withColumn("op", F.lit("I"))
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    return merge_changes(base, changes, keys=["o_orderkey"])


J_MERGE_SQL = """
WITH base AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders),
changes AS (
  SELECT o_orderkey, o_custkey, o_totalprice, 'D' AS op
  FROM base WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_totalprice + 1000.0, 'U'
  FROM base WHERE o_orderkey % 10 IN (1, 2)
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, o_totalprice, 'I'
  FROM base WHERE o_orderkey % 10 = 3
)
SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN c.op IS NOT NULL THEN c.o_custkey ELSE b.o_custkey END AS o_custkey,
       CASE WHEN c.op IS NOT NULL THEN c.o_totalprice ELSE b.o_totalprice END AS o_totalprice
FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
WHERE c.op IS NULL OR c.op <> 'D'
"""


def j9_update_then_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J9 + CDC MERGE chained: first the pandas-``df.update``-equivalent
    row-id update (reference :380,409,429,543,559 — reclassify priority
    for finished orders), then a deterministic change feed (delete keys
    ≡0 mod 10, reprice ≡1,2, insert shifted copies of ≡3) applied in ONE
    full-outer join. Both maintenance primitives share the o_orderkey
    shuffle key, so AQE plans the chain with no extra exchange over
    either half alone. The +1000.0 reprice is exactly representable in
    double, so the oracle needs no rounding."""
    from ..operators.relational import merge_changes, update_by_row_id

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority", "o_totalprice"
    )
    reclass = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit("0-RECLASSIFIED").alias("o_orderpriority")
    )
    base = update_by_row_id(
        orders, reclass, value_col="o_orderpriority", row_id="o_orderkey"
    )
    k = F.col("o_orderkey")
    deletes = base.filter(k % 10 == 0).withColumn("op", F.lit("D"))
    updates = (
        base.filter((k % 10).isin(1, 2))
        .withColumn("o_totalprice", F.col("o_totalprice") + F.lit(1000.0))
        .withColumn("op", F.lit("U"))
    )
    inserts = (
        base.filter(k % 10 == 3)
        .withColumn("o_orderkey", k + F.lit(100_000_000))
        .withColumn("op", F.lit("I"))
    )
    changes = deletes.unionByName(updates).unionByName(inserts)
    return merge_changes(base, changes, keys=["o_orderkey"])


J9_MERGE_CHAIN_SQL = """
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus,
         CASE WHEN o_orderstatus = 'F' THEN '0-RECLASSIFIED'
              ELSE o_orderpriority END AS o_orderpriority,
         o_totalprice
  FROM orders
),
changes AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority, o_totalprice,
         'D' AS op
  FROM base WHERE o_orderkey % 10 = 0
  UNION ALL
  SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
         o_totalprice + 1000.0, 'U'
  FROM base WHERE o_orderkey % 10 IN (1, 2)
  UNION ALL
  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus, o_orderpriority,
         o_totalprice, 'I'
  FROM base WHERE o_orderkey % 10 = 3
)
SELECT COALESCE(c.o_orderkey, b.o_orderkey) AS o_orderkey,
       CASE WHEN c.op IS NOT NULL THEN c.o_custkey ELSE b.o_custkey END AS o_custkey,
       CASE WHEN c.op IS NOT NULL THEN c.o_orderstatus ELSE b.o_orderstatus END AS o_orderstatus,
       CASE WHEN c.op IS NOT NULL THEN c.o_orderpriority ELSE b.o_orderpriority END AS o_orderpriority,
       CASE WHEN c.op IS NOT NULL THEN c.o_totalprice ELSE b.o_totalprice END AS o_totalprice
FROM base b FULL OUTER JOIN changes c ON b.o_orderkey = c.o_orderkey
WHERE c.op IS NULL OR c.op <> 'D'
"""


def p_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P-family predicates: contains / NOT-startswith / rlike / IN /
    numeric compare, then projection (reference :109-111,212,448)."""
    part = _t(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").contains("r")
        & ~F.col("p_brand").startswith("Brand#1")
        & F.upper(F.col("p_type")).rlike("ECONOMY|SMALL")
        & F.col("p_size").isin(5, 11, 23, 28, 36, 42)
        & (F.col("p_retailprice") > 901.0)
    ).select("p_partkey", "p_name", "p_brand", "p_type", "p_size")


P_FILTER_SQL = """
SELECT p_partkey, p_name, p_brand, p_type, p_size
FROM part
WHERE p_name LIKE '%r%'
  AND p_brand NOT LIKE 'Brand#1%'
  AND regexp_matches(UPPER(p_type), 'ECONOMY|SMALL')
  AND p_size IN (5, 11, 23, 28, 36, 42)
  AND p_retailprice > 901.0
"""


def j_broadcast_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2-shape: fact left-joins two broadcast dims, revenue by brand ×
    nation (the reference's dim-enrichment chain at scale: the fact
    never shuffles for the joins, only for the final groupBy)."""
    li = _t(spark, sf_dir, "lineitem", widen=False)
    part = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    supp = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"], "left")
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"], "left")
        .join(F.broadcast(nation), supp["s_nationkey"] == nation["n_nationkey"], "left")
        .groupBy("p_brand", "n_name")
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


J_BROADCAST_SQL = """
SELECT p_brand, n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
LEFT JOIN part ON l_partkey = p_partkey
LEFT JOIN supplier ON l_suppkey = s_suppkey
LEFT JOIN nation ON s_nationkey = n_nationkey
GROUP BY p_brand, n_name
"""


def j_anti_all_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-shape: null-safe anti-join on ALL columns (cross-file dedup
    primitive, reference :117-123)."""
    from ..operators.relational import anti_join_all_columns

    # widen=False (r13 sweep): the probe side feeds a broadcast anti
    # join directly (Catalyst had even pulled the probe's widen ABOVE
    # the join — a pure post-join repartition of the output), and the
    # seen side's widen fed a BroadcastExchange that collects
    # everything anyway. Interleaved A/B 0.58/0.53 vs 0.73/0.78 s
    # (wins 2/2 pairs); plan drops both RoundRobin exchanges
    # (plans/r13/j_anti_all_columns_*.txt).
    orders = _t(spark, sf_dir, "orders", widen=False).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"
    )
    seen = orders.filter(F.col("o_orderkey") % 3 == 0)
    return anti_join_all_columns(orders, seen)


J_ANTI_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority
FROM orders o
WHERE NOT EXISTS (
  SELECT 1 FROM orders s
  WHERE s.o_orderkey % 3 = 0
    AND s.o_orderkey IS NOT DISTINCT FROM o.o_orderkey
    AND s.o_custkey IS NOT DISTINCT FROM o.o_custkey
    AND s.o_orderstatus IS NOT DISTINCT FROM o.o_orderstatus
    AND s.o_orderpriority IS NOT DISTINCT FROM o.o_orderpriority
)
"""


def j_semi_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8-shape: rows of invoices (orders) that contain a marker item —
    window-flag formulation, one shuffle, no self-join collect."""
    li = _t(spark, sf_dir, "lineitem")
    from ..operators.relational import invoices_containing

    flag = invoices_containing(li, "l_orderkey", "l_returnflag", "R")
    return (
        li.withColumn("__has", flag)
        .filter(F.col("__has"))
        .select("l_orderkey", "l_linenumber", "l_returnflag")
    )


J_SEMI_SQL = """
SELECT l_orderkey, l_linenumber, l_returnflag
FROM lineitem
WHERE l_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
"""


def j_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located join via bucketing: both sides written bucketed+sorted
    on the join key, then join + same-key aggregation. The physical plan
    has NO shuffle exchange — at 100 TB this is the difference between
    re-shuffling the fact table per join and a purely local merge join
    (pytest asserts the exchange-free plan; the oracle checks values)."""
    import hashlib
    import tempfile

    # stable digest (not seed-randomized hash()) + SF-qualified table
    # names: two SFs can coexist in one session, reruns reuse the same
    # paths, and the bucketed tables build ONCE — repeat calls (bench
    # reruns) time only the probe, not the index build, the same split
    # a deployment has between table maintenance and queries.
    digest = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    base = os.path.join(tempfile.gettempdir(), f"buckets_{digest}")
    li_tbl, ord_tbl = f"li_bucketed_{digest}", f"orders_bucketed_{digest}"

    def ensure(table: str, df_fn, key: str, path: str) -> None:
        if spark.catalog.tableExists(table) and os.path.isdir(path):
            return
        if spark.catalog.tableExists(table):
            spark.sql(f"DROP TABLE {table}")
        (
            df_fn()
            .write.mode("overwrite")
            .bucketBy(8, key).sortBy(key)
            .option("path", path)
            .saveAsTable(table)
        )

    ensure(
        li_tbl,
        lambda: _t(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice", "l_discount"
        ),
        "l_orderkey",
        os.path.join(base, "li"),
    )
    ensure(
        ord_tbl,
        lambda: _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority"),
        "o_orderkey",
        os.path.join(base, "orders"),
    )
    a = spark.table(li_tbl)
    b = spark.table(ord_tbl)
    return (
        a.join(b, a["l_orderkey"] == b["o_orderkey"])
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


J_BUCKETED_SQL = """
SELECT l_orderkey, o_orderpriority,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY l_orderkey, o_orderpriority
"""


def d1_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1: keyed dedup keep-first with explicit tiebreak (reference
    keep='first' ×8; here: first lineitem per (order, part) by line#)."""
    # widen stays ON here (r13, VERDICT r12 item 2): the r12 widen=False
    # flip A/B'd slower (1.48 vs 1.56) and the driver confirmed −15%
    # (1.49→1.75 s). The high-cardinality (orderkey, partkey) window
    # overlaps scan+shuffle-write better with the widened scan.
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linenumber", "l_quantity"
    )
    # l_quantity in the tiebreak: the synthetic data has duplicate
    # (orderkey, partkey, linenumber) rows, and a value-deterministic
    # order is the only thing both engines can agree on without a
    # shared physical row order
    return keep_first(
        li, keys=["l_orderkey", "l_partkey"], order_by=["l_linenumber", "l_quantity"]
    )


D1_SQL = """
SELECT l_orderkey, l_partkey, l_linenumber, l_quantity
FROM lineitem
QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey ORDER BY l_linenumber, l_quantity) = 1
"""


def a4_first_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4/R8: 1 for the first row per key, 0 for the rest (:556)."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linenumber"
    )
    return first_flag(
        li, keys=["l_orderkey", "l_returnflag"], order_by=["l_linenumber"]
    )


A4_SQL = """
SELECT l_orderkey, l_returnflag, l_linenumber,
       CASE WHEN ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_returnflag ORDER BY l_linenumber) = 1
            THEN 1 ELSE 0 END AS validacion
FROM lineitem
"""


def u_union_dedup_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4/U1/U2: multi-file union where later files drop rows already
    seen (all-column match) but keep genuinely new/changed rows."""
    orders = _t(spark, sf_dir, "orders", widen=False).select(
        "o_orderkey", "o_orderstatus", "o_orderpriority"
    )
    file0 = orders.filter(F.col("o_orderkey") % 3 < 2)
    file1 = orders.withColumn(
        "o_orderpriority",
        F.when(F.col("o_orderkey") % 3 == 1, F.lit("X")).otherwise(
            F.col("o_orderpriority")
        ),
    )
    return load_fact_files(spark, [file0, file1])


U_UNION_SQL = """
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders WHERE o_orderkey % 3 < 2
UNION ALL
SELECT o_orderkey, o_orderstatus, 'X' AS o_orderpriority
FROM orders WHERE o_orderkey % 3 = 1
UNION ALL
SELECT o_orderkey, o_orderstatus, o_orderpriority
FROM orders WHERE o_orderkey % 3 = 2
"""


def o_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O-family: top-3 items by price per order (sort-as-window)."""
    li = _t(spark, sf_dir, "lineitem", widen=False)
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber")
    )
    return (
        li.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("l_orderkey", "l_linenumber", "l_extendedprice", "rank")
    )


O_TOPK_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice,
       ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber) AS rank
FROM lineitem
QUALIFY rank <= 3
"""


def w_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-spec window: running quantity per supplier in ship order."""
    li = _t(spark, sf_dir, "lineitem")
    # l_quantity in the order: (shipdate, orderkey, linenumber) is NOT
    # unique in the synthetic data (dup rows differ in quantity), and a
    # ROWS running sum under a non-total order is engine-dependent —
    # surfaced by the sf0.1 strict audit, invisible at sf0.01
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(
            F.col("l_shipdate"), F.col("l_orderkey"), F.col("l_linenumber"),
            F.col("l_quantity"),
        )
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("running_qty"),
    )


W_RUNNING_SQL = """
SELECT l_suppkey, l_orderkey, l_linenumber,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER (
         PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_qty
FROM lineitem
"""


def w_trailing_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window: per-user trailing 1-hour event sum/count —
    the rolling-feature shape of behavioral feature engineering. The
    frame is value-based (all peers within 3.6e9 µs), so same-timestamp
    events land in the same frame in any engine — no tiebreak needed.
    Ordering on integer microseconds, not double seconds: the epoch in
    double loses the µs digit at the float64 mantissa edge."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.sum(F.col("value").cast("decimal(18,6)"))
        .over(w)
        .cast("double")
        .alias("sum_1h"),
        F.count("*").over(w).cast("long").alias("n_1h"),
    )


W_TRAILING_RANGE_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h,
       CAST(COUNT(*) OVER w AS BIGINT) AS n_1h
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def w_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 + RANGE-frame ext in one pass: per-user ROWS running sum AND
    value-based trailing-1-hour sum/count over events (reference's
    sorts-as-orderings :142,257 plus the rolling-feature shape). Both
    frames partition on ``user_id`` — Catalyst reuses ONE hash exchange
    for the two window specs, so the merged query costs one shuffle,
    same as either half alone. ROWS ordering includes unique
    ``event_id`` as tiebreak (ties in ts would make a ROWS frame
    engine-dependent); the RANGE frame orders on integer microseconds
    (double epoch loses the µs digit at the float64 mantissa edge)."""
    ev = _t(spark, sf_dir, "events")
    wr = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"), F.col("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    dec_val = F.col("value").cast("decimal(18,6)")
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec_val).over(wr).cast("double").alias("running_value"),
        F.sum(dec_val).over(wt).cast("double").alias("sum_1h"),
        F.count("*").over(wt).cast("long").alias("n_1h"),
    )


W_FRAMES_SQL = """
SELECT event_id, user_id,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER wr AS DOUBLE) AS running_value,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER wt AS DOUBLE) AS sum_1h,
       CAST(COUNT(*) OVER wt AS BIGINT) AS n_1h
FROM events
WINDOW wr AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
              ROWS UNBOUNDED PRECEDING),
       wt AS (PARTITION BY user_id ORDER BY epoch_us(ts)
              RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
"""


def a1_latest_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1/O2/P6-shape: scalar MAX drives a partition-style filter — keep
    only orders from the latest (year, month) present, the reference's
    manual max-AnoMes pruning (:82-90,142). The max computes as a
    scalar subquery so Catalyst folds it into the scan filter."""
    # widen=False (r13 sweep): BOTH consumers of the scan wasted the
    # round-robin pass — the agg side reduces to one row before its own
    # exchange, the probe side's per-row work is a date_format+compare
    # behind a broadcast join with no downstream shuffle. Interleaved
    # A/B 0.55/0.86 vs 0.62/2.20 s (wins 2/2 pairs); plan drops both
    # RoundRobin exchanges (plans/r13/a1_latest_partition_*.txt).
    orders = _t(spark, sf_dir, "orders", widen=False)
    ym = F.date_format("o_orderdate", "yyyyMM")
    latest = orders.agg(F.max(ym).alias("m"))
    return (
        orders.withColumn("anomes", ym)
        .join(F.broadcast(latest), F.col("anomes") == F.col("m"))
        .select("o_orderkey", "o_custkey", "anomes")
    )


A1_SQL = """
SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y%m') AS anomes
FROM orders
WHERE strftime(o_orderdate, '%Y%m') = (SELECT MAX(strftime(o_orderdate, '%Y%m')) FROM orders)
"""


def s3_filename_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: filename-derived partition column via input_file_name() —
    fully distributed, no driver-side listing (reference :82-90 parses
    AnoMes out of produccion_YYYYMMDD filenames on the driver)."""
    import os

    from etl_sendas_spark.sources.readers import widen_to_parallelism

    # input_file_name() is only defined at the scan — an exchange above
    # it (e.g. the fact-table widening) erases it — so attach the
    # filename-derived column FIRST, then widen
    raw = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    base = F.element_at(F.split(F.input_file_name(), "/"), -1)
    src = F.element_at(F.split(base, "\\."), 1)
    li = widen_to_parallelism(raw.withColumn("src_table", src))
    return (
        li
        .groupBy("src_table")
        .agg(F.count("*").alias("n_rows"))
    )


S3_SQL = """
SELECT 'lineitem' AS src_table, COUNT(*) AS n_rows FROM lineitem
"""


def s1_excel_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 Excel-dimension ingest through a REAL ``.xlsx`` byte stream.

    The reference's primary ingest is an HTTP-fetched Excel workbook
    whose production sheets carry the real header in the first DATA row
    (capital_sendas.py:30-61,100-102). This builds exactly that
    workbook shape — a blank header row (→ ``Unnamed: N`` columns),
    mixed numeric/string cells, and blanks — as an actual xlsx zip
    (``sources/xlsx.py`` stdlib codec), then ingests it with the REAL
    production path, ``read_excel_dim``: xlsx parse → dtype=str →
    header promotion → NaN → NULL. ``S1_EXCEL_SQL`` mirrors the
    expected post-ingest table literally.
    """
    import os
    import tempfile
    import zipfile

    from ..sources.readers import read_excel_dim

    path = os.path.join(
        tempfile.gettempdir(), "etl_sendas_s1_dim_fixture.xlsx"
    )
    # worksheet with a title-only first row (→ columns 'REPORTE',
    # 'Unnamed: 1', 'Unnamed: 2' — the production-report shape) then the
    # real header in the first DATA row; numeric cells stored as numbers
    # so the dtype=str contract is exercised, not just string passthrough
    sheet = (
        '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">'
        "<sheetData>"
        '<row r="1"><c r="A1" t="inlineStr"><is><t>REPORTE</t></is></c></row>'
        '<row r="2">'
        '<c r="A2" t="inlineStr"><is><t>CODIGO</t></is></c>'
        '<c r="B2" t="inlineStr"><is><t>DESCRIPCION</t></is></c>'
        '<c r="C2" t="inlineStr"><is><t>VALOR</t></is></c>'
        "</row>"
        '<row r="3">'
        '<c r="A3" t="inlineStr"><is><t>890201</t></is></c>'
        '<c r="B3" t="inlineStr"><is><t>Consulta</t></is></c>'
        '<c r="C3"><v>125000</v></c>'
        "</row>"
        '<row r="4">'
        '<c r="A4" t="inlineStr"><is><t>890301</t></is></c>'
        '<c r="B4" t="inlineStr"><is><t>Control</t></is></c>'
        '<c r="C4"><v>98000.5</v></c>'
        "</row>"
        '<row r="5">'
        '<c r="B5" t="inlineStr"><is><t>Sin dato</t></is></c>'
        "</row>"
        "</sheetData></worksheet>"
    )
    from ..sources.xlsx import (
        _XLSX_CONTENT_TYPES,
        _XLSX_ROOT_RELS,
        _XLSX_WB_RELS,
        _wb_xml,
    )

    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr("[Content_Types].xml", _XLSX_CONTENT_TYPES)
        zf.writestr("_rels/.rels", _XLSX_ROOT_RELS)
        zf.writestr("xl/workbook.xml", _wb_xml("Hoja1"))
        zf.writestr("xl/_rels/workbook.xml.rels", _XLSX_WB_RELS)
        zf.writestr("xl/worksheets/sheet1.xml", sheet)

    return read_excel_dim(spark, path, promote_first_row=True)


S1_EXCEL_SQL = """
SELECT * FROM (VALUES
  ('890201', 'Consulta', '125000'),
  ('890301', 'Control', '98000.5'),
  (NULL, 'Sin dato', NULL)
) AS t(CODIGO, DESCRIPCION, VALOR)
"""


def s5_partitioned_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/S6 sink family, scale layout: write orders as parquet
    PARTITIONED BY order status (hive-style directories — the layout
    that gives partition pruning for free at 100 TB), read it back,
    aggregate per partition. Oracle aggregates the source directly, so
    the write→read roundtrip must be lossless."""
    import tempfile

    from ..sources.sinks import write_parquet

    import hashlib

    out = os.path.join(
        tempfile.gettempdir(),
        f"sink_orders_{hashlib.md5(sf_dir.encode()).hexdigest()[:10]}",
    )
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    write_parquet(orders, out, partition_by=["o_orderstatus"])
    back = spark.read.parquet(out)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        _dec_sum(F.col("o_totalprice")).alias("sum_price"),
        F.max("o_orderkey").alias("max_orderkey"),
    )


S5_SINK_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
       MAX(o_orderkey) AS max_orderkey
FROM orders
GROUP BY o_orderstatus
"""


def s6_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction roundtrip: fragment documents into 16 tiny
    parquet files (the streaming-sink pathology), compact them to a
    byte-sized file count, read back and aggregate. Content must survive
    both rewrites — the oracle aggregates the source directly. At scale
    this runs per partition directory so only appended partitions
    rewrite."""
    import hashlib
    import tempfile

    from ..sources.sinks import compact_parquet

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    frag = os.path.join(tempfile.gettempdir(), f"compact_src_{tag}")
    compacted = os.path.join(tempfile.gettempdir(), f"compact_dst_{tag}")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text", "source")
    docs.repartition(16).write.mode("overwrite").parquet(frag)
    # the returned file count is ceil(bytes / target) — SF-dependent, so
    # it is pinned by tests/test_cli.py, NOT hashed here (a literal in
    # the oracle would break the moment the table outgrows one target
    # file); the parity columns are the content-roundtrip invariants
    compact_parquet(spark, frag, compacted, target_file_mb=128)
    back = spark.read.parquet(compacted)
    return back.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.max("doc_id").alias("max_doc_id"),
    )


S6_COMPACT_SQL = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       MAX(doc_id) AS max_doc_id
FROM documents
GROUP BY source
"""


def s5_sink_compact_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5 + S6-ext in one roundtrip: write orders as hive-partitioned
    parquet (PARTITIONED BY o_orderstatus — the layout that gives
    partition pruning for free at 100 TB), fragment each partition the
    way a streaming sink would, then compact the whole dataset to a
    byte-sized file count and read it back. Content must survive the
    partitioned write, the hive-column round-trip, AND the compaction
    rewrite — the oracle aggregates the source directly. At scale the
    compaction runs per partition directory so only appended partitions
    rewrite."""
    import hashlib
    import tempfile

    from ..sources.sinks import compact_parquet, write_parquet

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    part_dir = os.path.join(tempfile.gettempdir(), f"sink_part_{tag}")
    compacted = os.path.join(tempfile.gettempdir(), f"sink_compact_{tag}")
    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    # repartition(8) inside each status dir = the small-file pathology
    write_parquet(
        orders.repartition(8), part_dir, partition_by=["o_orderstatus"]
    )
    # file count = ceil(bytes / target): SF-dependent, pinned by
    # tests/test_cli.py rather than hashed into the parity columns (a
    # literal here breaks as soon as orders exceeds one target file)
    compact_parquet(spark, part_dir, compacted, target_file_mb=128)
    back = spark.read.parquet(compacted)
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        _dec_sum(F.col("o_totalprice")).alias("sum_price"),
        F.max("o_orderkey").alias("max_orderkey"),
    )


S5_SINK_COMPACT_SQL = """
SELECT o_orderstatus,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price,
       MAX(o_orderkey) AS max_orderkey
FROM orders
GROUP BY o_orderstatus
"""


def f1_priority_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/D2/T4-shape: priority-ranked keep-first. Per part size-class,
    rank candidate types by a CASE priority then name, keep the top row
    — the reference's asignar_tipologia + sort + groupwise-first
    (:212-257) re-expressed as one window."""
    part = _t(spark, sf_dir, "part")
    prio = (
        F.when(F.upper("p_type").contains("PROMO"), F.lit(1))
        .when(F.upper("p_type").contains("ECONOMY"), F.lit(2))
        .otherwise(F.lit(3))
    )
    ranked = part.select(
        "p_size", F.col("p_type"), prio.alias("prio"), "p_partkey"
    )
    return keep_first(
        ranked, keys=["p_size"], order_by=[F.col("prio"), F.col("p_type"), F.col("p_partkey")]
    ).select("p_size", "p_type", "prio")


F1_SQL = """
SELECT p_size, p_type, prio
FROM (
  SELECT p_size, p_type, p_partkey,
         CASE WHEN UPPER(p_type) LIKE '%PROMO%' THEN 1
              WHEN UPPER(p_type) LIKE '%ECONOMY%' THEN 2
              ELSE 3 END AS prio
  FROM part
)
QUALIFY ROW_NUMBER() OVER (PARTITION BY p_size ORDER BY prio, p_type, p_partkey) = 1
"""


def r2_dual_key_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2-shape (:383-410): scope split into two branches deduped on
    DIFFERENT keys (R-flag rows key on (order, part, linestatus); other
    flags on (order, part)), first rows of both branches marked 1."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_linestatus", "l_returnflag", "l_linenumber"
    )
    strict = keep_first(
        li.filter(F.col("l_returnflag") == "R"),
        keys=["l_orderkey", "l_partkey", "l_linestatus"],
        order_by=["l_linenumber"],
    )
    loose = keep_first(
        li.filter(F.col("l_returnflag") != "R"),
        keys=["l_orderkey", "l_partkey"],
        order_by=["l_linenumber"],
    )
    marks = strict.unionByName(loose).select(
        "l_orderkey", "l_partkey", "l_linenumber", F.lit(1).alias("validacion")
    )
    return (
        li.join(marks, ["l_orderkey", "l_partkey", "l_linenumber"], "left")
        .withColumn("validacion", F.coalesce("validacion", F.lit(0)))
        .select("l_orderkey", "l_partkey", "l_linenumber", "validacion")
    )


R2_SQL = """
WITH marks AS (
  SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem WHERE l_returnflag = 'R'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey, l_linestatus ORDER BY l_linenumber) = 1
  UNION ALL
  SELECT l_orderkey, l_partkey, l_linenumber FROM lineitem WHERE l_returnflag <> 'R'
  QUALIFY ROW_NUMBER() OVER (PARTITION BY l_orderkey, l_partkey ORDER BY l_linenumber) = 1
)
SELECT li.l_orderkey, li.l_partkey, li.l_linenumber,
       CASE WHEN m.l_orderkey IS NULL THEN 0 ELSE 1 END AS validacion
FROM lineitem li
LEFT JOIN marks m USING (l_orderkey, l_partkey, l_linenumber)
"""


def j_asof_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each click paired with the user's latest purchase at
    or before it (union + last-carry window — one shuffle on user_id,
    no range probe). Oracle: DuckDB's native ASOF LEFT JOIN."""
    from ..operators.relational import asof_join

    ev = _t(spark, sf_dir, "events", widen=False)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    joined = asof_join(
        clicks,
        purchases,
        on=["user_id"],
        ts_col="ts",
        payload_cols=["event_id", "value"],
        right_ts_alias="purchase_ts",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("right_event_id").alias("purchase_event_id"),
        F.round("right_value", 6).alias("purchase_value"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss").alias("purchase_ts"),
    )


J_ASOF_SQL = """
SELECT l.event_id, l.user_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       r.event_id AS purchase_event_id,
       ROUND(r.value, 6) AS purchase_value,
       strftime(r.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts
FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') l
ASOF LEFT JOIN (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase') r
  ON l.user_id = r.user_id AND l.ts >= r.ts
"""


def j_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join WITHOUT an equi-key: every purchase within 10
    minutes after any signup, across all users. A bare inequality join
    compiles to BroadcastNestedLoopJoin (quadratic); time-bucketing
    turns it into a hash join on the bucket — the interval-join layout
    (pytest asserts no nested-loop in the plan)."""
    from ..operators.relational import bounded_range_join

    ev = _t(spark, sf_dir, "events", widen=False)
    signups = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"), F.col("ts").alias("signup_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("purchase_ts")
    )
    pairs = bounded_range_join(
        signups, purchases, ts_left="signup_ts", ts_right="purchase_ts",
        lower_s=0, upper_s=600,
    )
    # integer microseconds: a double epoch difference at ~1.7e9 s sits
    # at the mantissa edge and the two engines round differently
    return pairs.select(
        "signup_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("signup_ts")).alias(
            "delay_us"
        ),
    )


J_RANGE_SQL = """
SELECT s.event_id AS signup_id, p.event_id AS purchase_id,
       epoch_us(p.ts) - epoch_us(s.ts) AS delay_us
FROM (SELECT event_id, ts FROM events WHERE event_type = 'signup') s
JOIN (SELECT event_id, ts FROM events WHERE event_type = 'purchase') p
  ON p.ts > s.ts AND p.ts <= s.ts + INTERVAL 10 MINUTES
"""


def d_keep_first_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key dedup: first event per event_type (5 distinct values —
    the skew case where a plain window funnels everything into 5
    tasks). Two-phase salted keep-first; same answer as the plain
    QUALIFY oracle."""
    from ..operators.relational import keep_first_salted

    ev = _t(spark, sf_dir, "events", widen=False).select("event_type", "event_id", "ts", "value")
    first = keep_first_salted(
        ev,
        keys=["event_type"],
        order_by=["ts", "event_id"],
        n_salt=16,
        salt_on="event_id",
    )
    return first.select(
        "event_type",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.round("value", 6).alias("value"),
    )


D_SALTED_SQL = """
SELECT event_type, event_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
       ROUND(value, 6) AS value
FROM events
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) = 1
"""


def o_global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global ORDER BY + LIMIT with a total-order tiebreak. Spark
    executes this as TakeOrderedAndProject — per-partition heap + merge
    on the driver, never a full sort/shuffle of the table."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .limit(20)
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
    )


O_GLOBAL_TOPK_SQL = """
SELECT l_orderkey, l_linenumber, l_extendedprice
FROM lineitem
ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
LIMIT 20
"""


# ===========================================================================
# scalar library
# ===========================================================================

def scalar_dates_ages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 date family: JS-text timestamp roundtrip (+5h, coerce) and
    the EDAD1/EDAD2 CASE chains over (orderdate → shipdate) spans."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_shipdate"
    )
    orders = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    df = li.join(orders, li["l_orderkey"] == orders["o_orderkey"], "inner")
    js_text = F.date_format("l_shipdate", "EEE MMM dd yyyy HH:mm:ss")
    parsed = parse_js_timestamp(js_text, add_hours=5)
    return df.select(
        "l_orderkey",
        "l_linenumber",
        F.date_format(parsed, "yyyy-MM-dd HH:mm:ss").alias("parsed_plus5"),
        edad_valor("l_shipdate", "o_orderdate").alias("edad_1"),
        edad_unidad("l_shipdate", "o_orderdate").alias("edad_2"),
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias(
            "span_days"
        ),
    )


SCALAR_DATES_SQL = """
SELECT l_orderkey, l_linenumber,
       strftime(strptime(substr(strftime(l_shipdate, '%a %b %d %Y %H:%M:%S'), 1, 24),
                         '%a %b %d %Y %H:%M:%S') + INTERVAL 5 HOURS,
                '%Y-%m-%d %H:%M:%S') AS parsed_plus5,
       CASE WHEN dd >= 365 THEN dd // 365
            WHEN dd >= 30 THEN dd // 30
            ELSE dd END AS edad_1,
       CASE WHEN dd >= 365 THEN 'Años'
            WHEN dd >= 30 THEN 'Meses'
            ELSE 'Días' END AS edad_2,
       dd AS span_days
FROM (
  SELECT l_orderkey, l_linenumber, l_shipdate,
         date_diff('day', CAST(o_orderdate AS DATE), CAST(l_shipdate AS DATE)) AS dd
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
"""


def scalar_name_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 name splitter end-to-end: synthesize 2- and 4-unit names (with
    a glued 'DE LOS' particle) from customer keys, split via the
    Arrow-vectorized UDF; oracle states the expected positions."""
    cust = _t(spark, sf_dir, "customer").select("c_custkey")
    name = F.when(
        F.col("c_custkey") % 2 == 0,
        F.concat(F.lit("ANA MARIA DE LOS RIOS GOMEZ")),
    ).otherwise(F.lit("CARLOS RUIZ"))
    df = cust.withColumn("full_name", name)
    parts = df.withColumn("__p", split_full_name("full_name"))
    return parts.select(
        "c_custkey",
        F.col("__p.nombre1").alias("nombre1"),
        F.col("__p.nombre2").alias("nombre2"),
        F.col("__p.apellido1").alias("apellido1"),
        F.col("__p.apellido2").alias("apellido2"),
    )


SCALAR_NAME_SQL = """
SELECT c_custkey,
       CASE WHEN c_custkey % 2 = 0 THEN 'ANA' ELSE 'CARLOS' END AS nombre1,
       CASE WHEN c_custkey % 2 = 0 THEN 'MARIA' ELSE '' END AS nombre2,
       CASE WHEN c_custkey % 2 = 0 THEN 'DE LOS RIOS' ELSE 'RUIZ' END AS apellido1,
       CASE WHEN c_custkey % 2 = 0 THEN 'GOMEZ' ELSE '' END AS apellido2
FROM customer
"""


def scalar_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar path (events.props): extract k, aggregate per type."""
    ev = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n"),
            F.round(F.sum("k") / F.count("k"), 4).alias("avg_k"),
        )
    )


SCALAR_JSON_SQL = """
SELECT event_type,
       CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(k) AS n,
       ROUND(CAST(SUM(k) AS DOUBLE) / COUNT(k), 4) AS avg_k
FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
GROUP BY event_type
"""


# ===========================================================================
# rule-engine formulations (R1 / R7 analogs on driver tables)
# ===========================================================================

def r1_capped_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 two-window cap on lineitem: per order, walking returnflag
    descending, ≤2 marks per flag run and ≤3 total (reference :326-380)."""
    li = _t(spark, sf_dir, "lineitem", widen=False).select(
        "l_orderkey", "l_returnflag", "l_linenumber"
    )
    return capped_group_mark(
        li,
        group_keys=["l_orderkey"],
        run_col="l_returnflag",
        walk_order=[F.col("l_returnflag").desc(), F.col("l_linenumber")],
        per_run_cap=2,
        total_cap=3,
    )


R1_SQL = """
WITH s AS (
  SELECT l_orderkey, l_returnflag, l_linenumber,
         ROW_NUMBER() OVER w AS rn,
         CASE WHEN LAG(l_returnflag) OVER w IS DISTINCT FROM l_returnflag THEN 1 ELSE 0 END AS chg
  FROM lineitem
  WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_returnflag DESC, l_linenumber)
), s2 AS (
  -- order later stages by rn (unique) so tie rows keep the SAME walk
  -- order rn was assigned under — re-sorting ties would desync stages
  SELECT *, MAX(CASE WHEN chg = 1 THEN rn END) OVER
           (PARTITION BY l_orderkey ORDER BY rn
            ROWS UNBOUNDED PRECEDING) AS run_start
  FROM s
), s3 AS (
  SELECT *, CASE WHEN rn - run_start < 2 THEN 1 ELSE 0 END AS eligible FROM s2
), s4 AS (
  SELECT *, SUM(eligible) OVER
           (PARTITION BY l_orderkey ORDER BY rn
            ROWS UNBOUNDED PRECEDING) AS elig_so_far
  FROM s3
)
SELECT l_orderkey, l_returnflag, l_linenumber,
       CASE WHEN eligible = 1 AND elig_so_far <= 3 THEN 1 ELSE 0 END AS validacion
FROM s4
"""


def r7_gap_mark(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R7 anchor-reset gap fold on events: per (user, type) in ts order,
    mark first, then only >3 days after the last marked (reference
    :484-543). The one applyInPandas operator; oracle is a recursive CTE."""
    ev = _t(spark, sf_dir, "events", widen=False).select("event_id", "user_id", "event_type", "ts")
    marked = gap_anchor_mark(
        ev,
        group_keys=["user_id", "event_type"],
        ts_col="ts",
        order_by=["ts", "event_id"],
        gap_days=3,
    )
    return marked.select("event_id", "user_id", "event_type", "validacion")


R7_SQL = """
WITH RECURSIVE ordered AS (
  SELECT user_id, event_type, event_id, ts,
         ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS rn
  FROM events
), walk AS (
  SELECT user_id, event_type, event_id, ts, rn, 1 AS validacion, ts AS anchor
  FROM ordered WHERE rn = 1
  UNION ALL
  SELECT o.user_id, o.event_type, o.event_id, o.ts, o.rn,
         CASE WHEN epoch(o.ts) - epoch(w.anchor) >= 4 * 86400 THEN 1 ELSE 0 END,
         CASE WHEN epoch(o.ts) - epoch(w.anchor) >= 4 * 86400 THEN o.ts ELSE w.anchor END
  FROM walk w
  JOIN ordered o ON o.user_id = w.user_id AND o.event_type = w.event_type AND o.rn = w.rn + 1
)
SELECT event_id, user_id, event_type, validacion FROM walk
"""


def r4_invoice_zeroing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R4 shape (:431-456): CASE-chain marking with an invoice-membership
    override — orders containing a qty-50 item zero out their small-qty
    C-like rows."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_linestatus"
    )
    from ..operators.relational import invoices_containing

    w = Window.partitionBy("l_orderkey")
    has50 = (
        F.max(F.when(F.col("l_quantity") == 50.0, 1).otherwise(0)).over(w) == 1
    )
    base = F.col("l_linestatus") == "O"
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.when(base & has50 & F.col("l_quantity").isin(1.0, 2.0, 3.0), F.lit(0))
        .when(base & (F.col("l_quantity") == 25.0), F.col("l_quantity").cast("int"))
        .when(base & (F.col("l_quantity") != 25.0), F.lit(1))
        .otherwise(F.lit(-1))
        .alias("validacion"),
    )


R4_SQL = """
SELECT l_orderkey, l_linenumber,
       CASE WHEN l_linestatus = 'O'
                 AND l_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity = 50.0)
                 AND l_quantity IN (1.0, 2.0, 3.0) THEN 0
            WHEN l_linestatus = 'O' AND l_quantity = 25.0 THEN CAST(l_quantity AS INT)
            WHEN l_linestatus = 'O' AND l_quantity <> 25.0 THEN 1
            ELSE -1 END AS validacion
FROM lineitem
"""


def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gap to PREVIOUS event > 30 min starts a new
    session) — the window-expressible cousin of R7 and the batch mirror
    of streaming session_window."""
    ev = _t(spark, sf_dir, "events", widen=False).select("event_id", "user_id", "ts")
    out = sessionize(
        ev, group_keys=["user_id"], ts_col="ts", gap="INTERVAL 30 MINUTES",
        order_by=["event_id"],  # total order — matches SESSIONIZE_SQL's tiebreak
    )
    return out.select("event_id", "user_id", "session_id")


SESSIONIZE_SQL = """
SELECT event_id, user_id,
       CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
FROM (
  SELECT event_id, user_id, ts,
         CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                   OR ts > LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                          + INTERVAL 30 MINUTES
              THEN 1 ELSE 0 END AS new_session
  FROM events
)
"""


