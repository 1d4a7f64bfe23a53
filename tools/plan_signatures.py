#!/usr/bin/env python
"""One-line physical-plan signature per driver-window query: Exchange /
SortMergeJoin / BroadcastHashJoin / ShuffledHashJoin / NestedLoop /
Python-eval node counts plus scan pushdown evidence — the r12
optimization round's quick anomaly scan.

    python tools/plan_signatures.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from etl_sendas_spark.plans.inventory import EXTRA_QUERIES, QUERIES
    from etl_sendas_spark.session import get_spark

    all_q = {**QUERIES, **EXTRA_QUERIES}
    names = sys.argv[2:] or sorted(QUERIES)
    spark = get_spark(app_name="plan_signatures")
    for name in names:
        try:
            df = all_q[name](spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            continue
        sig = {
            "ex": len(re.findall(r"Exchange (?:hash|range)partitioning", plan)),
            "rr": len(re.findall(r"Exchange RoundRobin", plan)),
            "single": len(re.findall(r"Exchange SinglePartition", plan)),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "shj": plan.count("ShuffledHashJoin"),
            "nlj": plan.count("BroadcastNestedLoopJoin") + plan.count("CartesianProduct"),
            "py": plan.count("EvalPython") + plan.count("MapInPandas")
            + plan.count("FlatMapGroupsInPandas") + plan.count("MapInArrow"),
            "sort": plan.count("Sort "),
        }
        print(
            f"{name}: "
            + " ".join(f"{k}={v}" for k, v in sig.items() if v)
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
