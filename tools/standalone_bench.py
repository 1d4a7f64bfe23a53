"""Run the headline suite + bucketed TPC-H family on a REAL standalone
cluster (1 master + 4 worker JVMs on this box) and assert plan parity
against local[32] — the off-local evidence that the engine's exchange
budgets and join strategies survive a real scheduler, network shuffle,
and per-executor Python worker pools.

Usage: python tools/standalone_bench.py [sf_dir] [names...]
  default sf_dir /tmp/sendas_scale_x10, default names = bench.py's
  19-query HEADLINE + the orderkey-bucketed TPC-H family.

Protocol (same as round 5's first 4-query data point, now the full
suites): two back-to-back sessions — local[32] first, then
spark://127.0.0.1:7077 with 4 × (8-core, 18 g) executors — warm
min-of-2 per query through the noop sink, row count recorded, and a
plan SIGNATURE (Exchange / SortMergeJoin / BroadcastHashJoin /
WindowGroupLimit counts from the formatted explain) compared across
masters. A query passes parity iff signature AND row count match.

The cluster is started/stopped by this script via spark-class daemons
under /tmp (nothing written to the repo); logs are kept for the master
to confirm 4 registered executors.
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import signal
import socket
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SPARK_HOME = os.environ.get("SPARK_HOME", "/opt/spark")
MASTER_PORT = 7077
MASTER_URL = f"spark://127.0.0.1:{MASTER_PORT}"
N_WORKERS = 4
WORKER_CORES = 8
WORKER_MEM = "20g"
EXECUTOR_MEM = "18g"


def _wait_port(port: int, timeout: float = 60.0) -> None:
    t0 = time.time()
    while time.time() - t0 < timeout:
        with socket.socket() as s:
            if s.connect_ex(("127.0.0.1", port)) == 0:
                return
        time.sleep(0.5)
    raise TimeoutError(f"port {port} never opened")


def start_cluster(log_dir: str) -> list[subprocess.Popen]:
    os.makedirs(log_dir, exist_ok=True)
    env = {**os.environ, "SPARK_HOME": SPARK_HOME, "SPARK_LOG_DIR": log_dir,
           "SPARK_MASTER_HOST": "127.0.0.1", "SPARK_NO_DAEMONIZE": "1"}
    procs = []

    def spawn(name, *args):
        out = open(os.path.join(log_dir, f"{name}.log"), "w")
        p = subprocess.Popen(
            [os.path.join(SPARK_HOME, "bin", "spark-class"), *args],
            stdout=out, stderr=subprocess.STDOUT, env=env,
            start_new_session=True,
        )
        procs.append(p)
        return p

    spawn("master", "org.apache.spark.deploy.master.Master",
          "--host", "127.0.0.1", "--port", str(MASTER_PORT),
          "--webui-port", "8089")
    _wait_port(MASTER_PORT)
    for i in range(N_WORKERS):
        spawn(f"worker{i}", "org.apache.spark.deploy.worker.Worker",
              "--cores", str(WORKER_CORES), "--memory", WORKER_MEM,
              "--webui-port", str(8100 + i), MASTER_URL)
    return procs


def stop_cluster(procs: list[subprocess.Popen]) -> None:
    for p in reversed(procs):
        try:
            os.killpg(os.getpgid(p.pid), signal.SIGTERM)
        except ProcessLookupError:
            pass
    for p in procs:
        try:
            p.wait(timeout=20)
        except subprocess.TimeoutExpired:
            with contextlib.suppress(ProcessLookupError):
                os.killpg(os.getpgid(p.pid), signal.SIGKILL)


def plan_signature(df) -> dict:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    p = buf.getvalue()
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange", p)),
        "smj": len(re.findall(r"\(\d+\) SortMergeJoin", p)),
        "bhj": len(re.findall(r"\(\d+\) BroadcastHashJoin", p)),
        "window_group_limit": p.count("WindowGroupLimit"),
    }


def run_suite(master: str | None, sf_dir: str, names: list[str],
              tpch_family: list[str]) -> dict:
    from etl_sendas_spark.plans import tpch
    from etl_sendas_spark.plans.inventory import EXTRA_QUERIES, QUERIES
    from etl_sendas_spark.session import get_spark

    all_q = {**QUERIES, **EXTRA_QUERIES}
    extra = {
        "spark.executor.memory": EXECUTOR_MEM,
        "spark.executor.cores": str(WORKER_CORES),
        "spark.cores.max": str(N_WORKERS * WORKER_CORES),
        # executor Python workers unpickle closures that import the
        # engine package; workers run on this box but inherit a clean
        # PYTHONPATH from the worker daemon
        "spark.executorEnv.PYTHONPATH": os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))
        ),
    } if master else None
    spark = get_spark(app_name="standalone_bench", master=master,
                      extra_conf=extra)
    if master:
        # ship the engine package to executor Python workers (closures
        # in pandas_udf/applyInPandas import it); addPyFile is the
        # standard distribution path and needs a zip, not a directory
        import shutil
        import tempfile

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        zip_base = os.path.join(tempfile.gettempdir(), "etl_sendas_spark_pkg")
        zip_path = shutil.make_archive(
            zip_base, "zip", root_dir=repo, base_dir="etl_sendas_spark"
        )
        spark.sparkContext.addPyFile(zip_path)
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    out: dict[str, dict] = {}

    def measure(name, fn):
        df = fn(spark, sf_dir)
        sig = plan_signature(df)
        best = None
        for _ in range(3):  # first run is warmup
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        rows = fn(spark, sf_dir).count()
        out[name] = {"sec": round(best, 2), "rows": rows, "sig": sig}
        print(f"# [{master or 'local'}] {name}: {out[name]}",
              file=sys.stderr, flush=True)

    for name in names:
        measure(name, all_q[name])
    if tpch_family:
        tpch.build_bucketed_warehouse(spark, sf_dir, buckets=32)
        for name in tpch_family:
            measure(f"bucketed:{name}", tpch.TPCH_QUERIES[name])
    n_exec = spark.sparkContext._jsc.sc().getExecutorMemoryStatus().size()
    spark.stop()
    out["__n_executors__"] = {"sec": 0, "rows": n_exec, "sig": {}}
    return out


def main() -> int:
    import bench

    args = sys.argv[1:]
    sf_dir = args[0] if args else "/tmp/sendas_scale_x10"
    names = args[1:] or bench.HEADLINE
    tpch_family = [] if args[1:] else [
        "q4_priority_exists", "q7_volume_shipping", "q8_market_share",
        "q9_product_profit", "q12_late_shipping_priority",
        "q18_large_volume_customers", "q21_waiting_supplier",
    ]

    local = run_suite(None, sf_dir, names, tpch_family)

    log_dir = "/tmp/sendas_standalone_logs"
    procs = start_cluster(log_dir)
    try:
        time.sleep(3)
        cluster = run_suite(MASTER_URL, sf_dir, names, tpch_family)
    finally:
        stop_cluster(procs)

    result = {}
    for k in local:
        if k == "__n_executors__":
            continue
        l, c = local[k], cluster.get(k, {})
        result[k] = {
            "local_s": l["sec"],
            "cluster_s": c.get("sec"),
            "rows_match": l["rows"] == c.get("rows"),
            "plan_match": l["sig"] == c.get("sig"),
            "sig": l["sig"],
        }
    payload = {
        "sf_dir": sf_dir,
        "workers": N_WORKERS,
        "worker_cores": WORKER_CORES,
        "cluster_executors_seen": cluster["__n_executors__"]["rows"],
        "queries": result,
        "all_rows_match": all(v["rows_match"] for v in result.values()),
        "all_plans_match": all(v["plan_match"] for v in result.values()),
    }
    print(json.dumps(payload))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
