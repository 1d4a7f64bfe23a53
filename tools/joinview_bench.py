#!/usr/bin/env python
"""Join-view maintenance vs recompute at growing base size (round 10).

Extends the round-9 protocol (BASELINE.md "join-IVM maintenance vs
recompute") to the STORAGE path: all variants are txlog-backed, the
broadcast threshold is disabled (the SMJ regime join-IVM exists for),
and the round-10 key-partitioned state mode is measured against both
the unbucketed merge apply and a full recompute+overwrite.

    python tools/joinview_bench.py [n_facts] [n_dim] [buckets]

Per trial: one localized two-sided churn (200 fact appends + a dim
update over 20 join keys), then each variant catches up from its own
watermark over the SAME delta; recompute rebuilds join_view_state from
both heads and overwrites a scratch table. Reports per-trial seconds
and the min-ratio headline.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_sendas_spark.operators.ivm import join_view_state  # noqa: E402
from etl_sendas_spark.session import get_spark  # noqa: E402
from etl_sendas_spark.sources.txlog import TxLogTable  # noqa: E402
from etl_sendas_spark.streaming.sessions import (  # noqa: E402
    txlog_join_view_step,
)


def main() -> None:
    n_facts = int(sys.argv[1]) if len(sys.argv) > 1 else 5_000_000
    n_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    buckets = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    trials = 3

    spark = get_spark(app_name="joinview_bench")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    base = tempfile.mkdtemp(prefix="jvb_")
    try:
        facts = spark.range(n_facts).selectExpr(
            "id AS k",
            f"CAST(id % {n_dim} AS BIGINT) AS j",
            "CAST(id % 3 AS STRING) AS a",
        )
        dim = spark.range(n_dim).selectExpr(
            "id AS j", "CAST(id % 7 AS STRING) AS b"
        )
        a = TxLogTable.create(os.path.join(base, "facts"), facts)
        b = TxLogTable.create(os.path.join(base, "dim"), dim)

        args = (
            spark,
            os.path.join(base, "facts"),
            os.path.join(base, "dim"),
            ["k"],
            ["j"],
            ["j"],
            ["a"],
            ["b"],
        )
        dst_b = os.path.join(base, "view_bucketed")
        dst_m = os.path.join(base, "view_merge")
        dst_o = os.path.join(base, "view_overwrite")
        dst_r = os.path.join(base, "view_recompute")

        t0 = time.time()
        txlog_join_view_step(
            *args, dst_b, apply="merge", state_buckets=buckets
        )
        boot_b = time.time() - t0
        t0 = time.time()
        txlog_join_view_step(*args, dst_m, apply="merge")
        boot_m = time.time() - t0
        txlog_join_view_step(*args, dst_o, apply="overwrite")
        t0 = time.time()
        TxLogTable.create(
            dst_r,
            join_view_state(
                a.read(spark), b.read(spark), ["j"], ["a"], ["b"]
            ),
        )
        boot_r = time.time() - t0
        print(
            f"bootstrap: bucketed {boot_b:.2f}s  merge {boot_m:.2f}s  "
            f"recompute {boot_r:.2f}s  (n_facts={n_facts} n_dim={n_dim} "
            f"B={buckets})"
        )

        times: dict[str, list[float]] = {
            "bucketed": [],
            "merge": [],
            "overwrite": [],
            "recompute": [],
        }
        for trial in range(trials):
            keys = [1000 + trial * 20 + i for i in range(20)]
            a.append(
                spark.createDataFrame(
                    [
                        (10**9 + trial * 1000 + n, keys[n % 20], str(n % 3))
                        for n in range(200)
                    ],
                    "k LONG, j LONG, a STRING",
                ),
                spark,
            )
            b.update_where(
                spark,
                {"b": "'hot'"},
                f"j IN ({','.join(map(str, keys))})",
            )

            t0 = time.time()
            assert txlog_join_view_step(
                *args, dst_b, apply="merge", state_buckets=buckets
            )
            times["bucketed"].append(time.time() - t0)

            t0 = time.time()
            assert txlog_join_view_step(*args, dst_m, apply="merge")
            times["merge"].append(time.time() - t0)

            t0 = time.time()
            assert txlog_join_view_step(*args, dst_o, apply="overwrite")
            times["overwrite"].append(time.time() - t0)

            t0 = time.time()
            state = join_view_state(
                a.read(spark), b.read(spark), ["j"], ["a"], ["b"]
            )
            TxLogTable(dst_r).overwrite(state)
            times["recompute"].append(time.time() - t0)

        for k, v in times.items():
            print(f"{k:10s} " + " ".join(f"{x:6.2f}" for x in v))
        mr = min(times["recompute"])
        print(
            f"ratio vs recompute: bucketed {min(times['bucketed']) / mr:.2f}x"
            f"  merge {min(times['merge']) / mr:.2f}x"
            f"  overwrite {min(times['overwrite']) / mr:.2f}x"
        )

        # parity: both maintained views equal the recompute
        want = sorted(
            map(tuple, TxLogTable(dst_r).read(spark).collect())
        )
        got_b = sorted(
            map(
                tuple,
                TxLogTable(dst_b)
                .read(spark)
                .select("j", "a", "b", "n")
                .collect(),
            )
        )
        got_m = sorted(
            map(tuple, TxLogTable(dst_m).read(spark).collect())
        )
        assert got_b == want and got_m == want, "parity violated"
        print("parity: both maintained views == recompute")
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
