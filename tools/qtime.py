#!/usr/bin/env python
"""Time one or more registered queries K times each in one warm session
(noop sink), printing every reading plus loadavg — the fine-grained
companion to bench.py for optimization A/Bs on this noisy VM.

    python tools/qtime.py [-k N] name [name...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = sys.argv[1:]
    k = 3
    if args and args[0] == "-k":
        k = int(args[1])
        args = args[2:]
    from etl_sendas_spark.plans.inventory import EXTRA_QUERIES, QUERIES
    from etl_sendas_spark.session import get_spark

    all_q = {**QUERIES, **EXTRA_QUERIES}
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="qtime")
    # warm inputs (same rationale as bench.py)
    for f in sorted(os.listdir(sf_dir)):
        if f.endswith(".parquet"):
            spark.read.parquet(os.path.join(sf_dir, f)).write.format(
                "noop"
            ).mode("overwrite").save()
    for name in args:
        fn = all_q[name]
        runs = []
        for i in range(k):
            spark.sparkContext.setJobDescription(f"{name}#{i}")
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            runs.append(dt)
            with open("/proc/loadavg") as fh:
                la = fh.read().split()[0]
            print(f"{name} run{i}: {dt:.3f}s (loadavg {la})", flush=True)
        print(f"{name} min={min(runs):.3f} med={sorted(runs)[len(runs)//2]:.3f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
