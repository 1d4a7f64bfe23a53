#!/usr/bin/env python
"""×N throughput for the native txlog streaming source (VERDICT r8 #7):
the exactly-once contract is test-pinned at sf scale; this measures the
one axis not yet measured — DRAIN THROUGHPUT vs the batch read of the
same commits.

    python tools/stream_bench.py [--mult 10] [--commits 8] [--sf-dir D]

Builds a txlog table from events replicated ×mult across `commits`
append commits (multi-file, multi-commit — the realistic backfill
shape), then measures:

- batch:  spark.read.format("txlog").count()   (same Arrow scan path)
- stream: readStream.format("txlog") → noop sink, ONE availableNow
  drain over all commits (engine checkpointing on a fresh dir)

and prints one JSON line {rows, batch_sec, stream_sec, batch_rps,
stream_rps, stream_overhead}. The stream reads the same files through
the same _read_file_batches pyarrow path, so the delta is micro-batch
machinery + checkpoint I/O, not data-path divergence.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--commits", type=int, default=8)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_sendas_spark.session import get_spark
    from etl_sendas_spark.sources.txlog import TxLogTable
    from etl_sendas_spark.sources.txlog_source import register_txlog_source

    spark = get_spark(app_name="txlog_stream_bench")
    register_txlog_source(spark)

    ev = spark.read.parquet(os.path.join(args.sf_dir, "events.parquet"))
    # replicate with perturbed ids so shuffle compression can't elide
    # duplicate rows (BASELINE.md r6 trap)
    rep = (
        ev.crossJoin(
            spark.range(args.mult).withColumnRenamed("id", "__r")
        )
        .withColumn(
            "event_id",
            F.col("event_id") + F.col("__r") * F.lit(100_000_000),
        )
        .drop("__r")
    )
    per_commit = rep.randomSplit([1.0] * args.commits, seed=7)

    work = tempfile.mkdtemp(prefix="txlog_stream_bench_")
    root = os.path.join(work, "t")
    try:
        t = TxLogTable.create(root, per_commit[0].repartition(8))
        for part in per_commit[1:]:
            t.append(part.repartition(8), spark)

        spark.read.format("txlog").load(root).count()  # warm page cache
        t0 = time.time()
        n_batch = spark.read.format("txlog").load(root).count()
        batch_sec = time.time() - t0

        ck = os.path.join(work, "ck")
        t0 = time.time()
        q = (
            spark.readStream.format("txlog")
            .load(root)
            .writeStream.format("noop")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(600)
        stream_sec = time.time() - t0
        n_stream = (
            sum(int(p["numInputRows"]) for p in q.recentProgress)
            if q.recentProgress
            else -1
        )

        out = {
            "rows": n_batch,
            "stream_rows": n_stream,
            "commits": args.commits,
            "batch_sec": round(batch_sec, 2),
            "stream_sec": round(stream_sec, 2),
            "batch_rps": int(n_batch / batch_sec),
            "stream_rps": int(n_batch / stream_sec),
            "stream_overhead": round(stream_sec / batch_sec, 2),
            "mult": args.mult,
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
