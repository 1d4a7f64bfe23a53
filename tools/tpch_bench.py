"""Benchmark the full 22-query TPC-H suite against the DuckDB mirror.

Usage: python tools/tpch_bench.py [sf_dir] [reps] [--bucketed]

Runs every TPC-H-shape query (q1/q3/q5/q17 from inventory + the 18 in
plans/tpch.py) on Spark (shared session, warm min-of-N) and the paired
oracle SQL on DuckDB at the same scale, printing one JSON line with
per-query seconds for both engines. The same protocol as bench.py /
tools/scale_bench.py: timings exclude session startup, each query is
fully materialized (count() on Spark, fetchall on DuckDB).

``--bucketed``: build (or reuse) the orderkey-bucketed at-rest layout
for lineitem/orders first (plans.tpch.build_bucketed_warehouse) and
run the suite against it — the orderkey-keyed family (q4/q7/q8/q9/
q12/q18/q21) then plans without any fact exchange. The one-time build
cost is reported separately as ``bucketed_build_sec``; query timings
measure the steady state, the maintenance/query split a warehouse has.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--bucketed"]
    bucketed = "--bucketed" in sys.argv[1:]
    sf_dir = args[0] if args else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    reps = int(args[1]) if len(args) > 1 else 2

    import duckdb

    from etl_sendas_spark.plans.inventory import (
        ORACLES,
        QUERIES,
    )
    from etl_sendas_spark.plans.tpch import TPCH_ORACLES, TPCH_QUERIES
    from etl_sendas_spark.session import get_spark

    suite = {
        "q1_pricing_summary": (QUERIES["q1_pricing_summary"], ORACLES["q1_pricing_summary"]),
        "q3_shipping_priority": (QUERIES["q3_shipping_priority"], ORACLES["q3_shipping_priority"]),
    }
    from etl_sendas_spark.plans.inventory import EXTRA_ORACLES, EXTRA_QUERIES

    for k in ("q5_local_supplier_revenue", "q17_small_quantity_revenue"):
        suite[k] = (EXTRA_QUERIES[k], EXTRA_ORACLES[k])
    for k in TPCH_QUERIES:
        suite[k] = (TPCH_QUERIES[k], TPCH_ORACLES[k])

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="tpch_bench", master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    build_sec = None
    if bucketed:
        from etl_sendas_spark.plans.tpch import build_bucketed_warehouse

        build_sec = round(
            build_bucketed_warehouse(spark, sf_dir, buckets=int(cpus)), 3
        )

    con = duckdb.connect()
    con.execute(f"SET threads TO {cpus}")
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    spark_s, duck_s = {}, {}
    for name, (fn, sql) in suite.items():
        best_s = best_d = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            best_s = min(best_s, time.perf_counter() - t0)
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            best_d = min(best_d, time.perf_counter() - t0)
        spark_s[name] = round(best_s, 3)
        duck_s[name] = round(best_d, 3)

    total_s = round(sum(spark_s.values()), 3)
    total_d = round(sum(duck_s.values()), 3)
    out = {
        "metric": "tpch_22_total_sec",
        "value": total_s,
        "unit": "sec",
        "duckdb_total_sec": total_d,
        "ratio": round(total_s / total_d, 3) if total_d else None,
        "queries": spark_s,
        "duckdb": duck_s,
        "sf": sf_dir,
    }
    if bucketed:
        out["bucketed"] = True
        out["bucketed_build_sec"] = build_sec
    print(json.dumps(out))


if __name__ == "__main__":
    main()
