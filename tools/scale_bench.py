#!/usr/bin/env python
"""Scaling experiment: engine vs the DuckDB single-node mirror on
replicated data — the evidence behind BASELINE.md's claim that the
sub-second ratios are a constant scheduling floor, not a plan defect.

    python tools/scale_bench.py [factor] [sf_dir] [query ...]
    python tools/scale_bench.py [factor] [sf_dir] --skew

Builds ``/tmp/sendas_scale_x{factor}`` by replicating each fact table
``factor`` times with primary ids shifted per replica (each replica is a
disjoint population shard: per-key group sizes stay constant, total data
grows linearly — the way real corpora grow). Dimension tables copy 1×,
so broadcast-join sides stay small, as they do at cluster scale. Then
runs each query through BOTH engines (min of 2 runs after a warmup) on
the identical replicated parquet and prints one JSON line:
``{"factor": N, "queries": {name: {"spark": s, "duckdb": s, "ratio": r}}}``.

``--skew`` instead builds ``/tmp/sendas_skew_x{factor}``: real billing
data has hot invoices/patients (one insurer/payer dominating a batch),
so the replicas' group-key columns (lineitem.l_orderkey,
events.user_id) are remapped to a zipf(α≈2) distribution over
``N_HOT`` keys — ``ceil(1/u)`` (capped) for a deterministic
per-(row, replica) uniform ``u`` gives P(key=k) ∝ 1/k²; the hottest
key holds ~50 % of ALL rows. The skew run then measures (a) the
flagship and d1 window shapes on hot groups, (b) plain vs salted
keep-first on the SAME hot key — the salted two-phase path wins once
per-task group work dominates the extra shuffle it buys, and (c) that
AQE's skew-join splits the hot partition of a forced sort-merge join
(``SortMergeJoin(skew=true)`` in the executed plan).

Content-dedup queries (minhash/simhash/ngram/embedding near-dup) are
excluded by default: replicating identical text/vectors inflates
duplicate-cluster sizes quadratically in pair count, which benchmarks
the data generator, not the engine.

The SAME caveat hits co-occurrence/graph queries built on entity keys
the default SHIFT map leaves alone (l_partkey, o_custkey, l_suppkey):
replicas repeat the same part/customer/supplier universe, so basket
co-occurrence support inflates ×factor (association rules' s>=2 gate
passes a superlinearly denser co-purchase graph — one wedge-join task
was still running after 12 min at ×10) while distinct entity-pair
graphs (random walks' customer-supplier edges) collapse back to ×1.
``--shift-entities`` builds ``/tmp/sendas_entshift_x{factor}`` where
those three keys ALSO shift per replica — each replica a disjoint
catalog shard, co-occurrence per-key constant, total graph linear in
factor: the way a real catalog grows. Queries that join the 1×-copied
part/customer/supplier dims are excluded in this mode (fact keys no
longer resolve); the co-occurrence family reads facts only, which is
why the mode exists.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# fact table -> primary id columns shifted per replica (disjoint shards)
SHIFT: dict[str, list[str]] = {
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
STRIDE = 10_000_000_000  # beyond any generated id at any driver SF

# --shift-entities: entity keys additionally shifted (disjoint catalog
# shards per replica; dim-joining queries excluded — see module doc)
ENTITY_SHIFT: dict[str, list[str]] = {
    "lineitem": ["l_partkey", "l_suppkey"],
    "orders": ["o_custkey"],
}

# --skew: group-key columns remapped to zipf over N_HOT keys
ZIPF_KEY = {"lineitem": "l_orderkey", "events": "user_id"}
N_HOT = 1000

DEFAULT_QUERIES = [
    "q1_pricing_summary",
    "j_broadcast_enrich",
    "d1_keep_first",
    "o_topk_per_group",
    "j_asof_events",
    "d_keep_first_salted",
    "sessionize_events",
    "r1_capped_mark",
    "r7_gap_mark",
    "text_features",
    "corpus_prep_pipeline",
    "ann_cosine_topk",
    "sendas_full_pipeline",
]

# Defaults that join the part/customer/supplier dims — excluded under
# --shift-entities, where replica fact keys are shifted into disjoint
# catalog shards and would no longer match the 1x-copied dims (the join
# would "succeed" while enriching nothing).
DIM_JOINING_QUERIES = {"j_broadcast_enrich", "sendas_full_pipeline"}


def build_scaled(
    src_dir: str,
    factor: int,
    out_dir: str,
    skew: bool = False,
    shift_entities: bool = False,
) -> None:
    import duckdb

    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    shift_map = {
        t: cols + ENTITY_SHIFT.get(t, []) if shift_entities else cols
        for t, cols in SHIFT.items()
    }
    for t in TABLES:
        src = os.path.join(src_dir, f"{t}.parquet")
        dst = os.path.join(out_dir, f"{t}.parquet")
        if not os.path.exists(src) or os.path.exists(dst):
            continue
        if t not in shift_map:
            shutil.copyfile(src, dst)
            continue
        # zipf(α≈2) via inverse CDF: u uniform in (0,1] per (row,
        # replica) → ceil(1/u) capped at N_HOT, P(key=k) ∝ 1/k².
        # Deterministic (hash, not random()) so replays are identical.
        def zipf(c: str) -> str:
            u = f"((hash({c} * 1000003 + r.i) % 1000000) + 1) / 1000000.0"
            return f"LEAST(CAST(ceil(1.0 / ({u})) AS BIGINT), {N_HOT}) AS {c}"

        exprs = []
        for c in shift_map[t]:
            if skew and ZIPF_KEY.get(t) == c:
                exprs.append(zipf(c))
            else:
                exprs.append(f"{c} + r.i * {STRIDE} AS {c}")
        if skew and t in ZIPF_KEY and ZIPF_KEY[t] not in shift_map[t]:
            exprs.append(zipf(ZIPF_KEY[t]))
        repl = ", ".join(exprs)
        con.execute(
            f"""
            COPY (
              SELECT t.* REPLACE ({repl})
              FROM read_parquet('{src}') t CROSS JOIN range({factor}) AS r(i)
            ) TO '{dst}' (FORMAT PARQUET)
            """
        )


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def run_skew_suite(spark, out_dir: str, runs: int) -> dict:
    """The hot-key comparison set: plain vs salted keep-first on (a)
    the cardinality-5 event_type — the parallelism-starved case a plain
    window reduces to 5 tasks on a 32-core box, where salting is the
    designed win — and (b) the zipf user_id — the straggler case, where
    the hottest key holds ~14 % of rows and salting trades an extra
    full shuffle for splitting that task; plus a forced sort-merge join
    whose executed plan must show AQE's skew split."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.materialize import materialize, release
    from etl_sendas_spark.operators.relational import keep_first, keep_first_salted
    from etl_sendas_spark.sources.readers import normalize_event_time

    ev = normalize_event_time(
        spark.read.parquet(os.path.join(out_dir, "events.parquet")), "ts"
    ).select("event_type", "user_id", "event_id", "ts", "value")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict = {}
    for label, key in (("event_type", "event_type"), ("zipf_user", "user_id")):
        plain = lambda k=key: noop(  # noqa: E731
            keep_first(ev, keys=[k], order_by=["ts", "event_id"])
        )
        salted = lambda k=key: noop(  # noqa: E731
            keep_first_salted(
                ev, keys=[k], order_by=["ts", "event_id"],
                n_salt=32, salt_on="event_id",
            )
        )
        plain()
        out[f"{label}_plain"] = timed(plain, runs=runs)
        salted()
        out[f"{label}_salted"] = timed(salted, runs=runs)
        out[f"{label}_salted_speedup"] = round(
            out[f"{label}_plain"] / out[f"{label}_salted"], 2
        )

    # the reason plain wins locally: Spark ≥3.5 compiles row_number<=k
    # into map-side WindowGroupLimit — top-1-per-key happens BEFORE the
    # shuffle, so a hot key never funnels into one reduce task
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        keep_first(ev, keys=["user_id"], order_by=["ts", "event_id"]).explain(
            "formatted"
        )
    out["window_group_limit_in_plan"] = "WindowGroupLimit" in buf.getvalue()

    # AQE skew-join: hot-key fact ⋈ per-user dim, broadcast disabled so
    # the join is sort-merge; production thresholds scaled to the local
    # dataset (the 100 TB defaults are 256MB partitions).
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "512KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        # pin the dim first: OptimizeSkewedJoin only rewrites a join
        # whose children are plain Sort(ShuffleRead) — an aggregate
        # between sort and shuffle on the dim side makes the rule skip
        dim = materialize(
            ev.select("user_id", "event_id")
            .groupBy("user_id")
            .agg(F.min("event_id").alias("first_event")),
            name="skew_dim",
        )
        # the shrink filter must reference BOTH sides: a single-side
        # predicate gets pushed below the join and deletes the very
        # skew being measured (hot partition drops to KBs)
        j = ev.select("user_id", "event_id").join(dim, "user_id").filter(
            (F.col("event_id") + F.col("first_event")) % 997 == 0
        )
        t0 = time.perf_counter()
        j.collect()  # same QueryExecution → final adaptive plan readable
        out["skew_join_s"] = round(time.perf_counter() - t0, 3)
        plan = j._jdf.queryExecution().executedPlan().toString()
        out["skew_join_fired"] = "skew=true" in plan
        release(dim)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)
    return out


def main() -> int:
    import duckdb

    from etl_sendas_spark.plans.inventory import (
        EXTRA_ORACLES,
        EXTRA_QUERIES,
        ORACLES,
        QUERIES,
    )

    QUERIES = {**QUERIES, **EXTRA_QUERIES}
    ORACLES = {**ORACLES, **EXTRA_ORACLES}
    from etl_sendas_spark.session import get_spark

    args = sys.argv[1:]
    skew = "--skew" in args
    shift_entities = "--shift-entities" in args
    args = [a for a in args if a != "--shift-entities"]
    args = [a for a in args if a != "--skew"]
    factor = int(args[0]) if args else 10
    src_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    if args[2:]:
        names = args[2:]
    elif skew:
        names = ["d1_keep_first", "sendas_full_pipeline"]
    elif shift_entities:
        # the module doc's exclusion, enforced: shifted replica fact keys
        # (partkey/suppkey/custkey) no longer resolve against the
        # 1x-copied dims, so dim-joining defaults would silently bench
        # joins that match nothing. Keep only the fact-only family.
        names = [n for n in DEFAULT_QUERIES if n not in DIM_JOINING_QUERIES]
    else:
        names = DEFAULT_QUERIES
    # SCALE_BENCH_SPARK_ONLY=1 skips the DuckDB side (its single-thread
    # shapes get prohibitively slow at large factors); SCALE_BENCH_RUNS
    # overrides min-of-N (default 2).
    spark_only = os.environ.get("SCALE_BENCH_SPARK_ONLY", "") == "1"
    runs = int(os.environ.get("SCALE_BENCH_RUNS", "2"))

    if skew:
        out_dir = f"/tmp/sendas_skew_x{factor}"
    elif shift_entities:
        out_dir = f"/tmp/sendas_entshift_x{factor}"
    else:
        out_dir = f"/tmp/sendas_scale_x{factor}"
    build_scaled(src_dir, factor, out_dir, skew=skew, shift_entities=shift_entities)

    spark = get_spark(app_name=f"scale_bench_x{factor}")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(out_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    results: dict[str, dict] = {}
    for name in names:
        entry: dict = {}
        try:
            def run_spark(n=name):
                # noop sink: materialize every output column, discard rows
                # JVM-side (count() would prune computed columns).
                QUERIES[n](spark, out_dir).write.format("noop").mode(
                    "overwrite"
                ).save()

            run_spark()  # warmup (plan + IO cache)
            entry["spark"] = timed(run_spark, runs=runs)
        except Exception as exc:  # noqa: BLE001 - experiment, report and move on
            entry["spark_err"] = f"{type(exc).__name__}: {exc}"[:200]
        if name in ORACLES and not spark_only:
            sql = ORACLES[name]
            try:
                con.execute(sql).fetchall()  # warmup
                entry["duckdb"] = timed(
                    lambda: con.execute(sql).fetchall(), runs=runs
                )
            except Exception as exc:  # noqa: BLE001
                entry["duckdb_err"] = f"{type(exc).__name__}: {exc}"[:200]
        if "spark" in entry and "duckdb" in entry and entry["duckdb"] > 0:
            entry["ratio"] = round(entry["spark"] / entry["duckdb"], 2)
        results[name] = entry
        print(f"# {name}: {entry}", file=sys.stderr, flush=True)

    payload = {"factor": factor, "src": src_dir, "queries": results}
    if skew:
        payload["mode"] = "skew"
        payload["n_hot"] = N_HOT
        payload["skew_suite"] = run_skew_suite(spark, out_dir, runs)
        print(f"# skew_suite: {payload['skew_suite']}", file=sys.stderr, flush=True)
    print(json.dumps(payload))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
