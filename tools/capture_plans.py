#!/usr/bin/env python
"""Capture ``explain("formatted")`` for headline (or named) queries into
plans/r12/<query>_<tag>.txt — the optimization round's plan evidence.

    python tools/capture_plans.py before [names...]
    python tools/capture_plans.py after  [names...]

Defaults to bench.py's HEADLINE set. Queries whose builders execute
eagerly (materialize pins, streaming runs) pay that cost here; the
captured plan is the plan of the RETURNED frame — for those queries the
interesting plan is inside the builder, and the companion notes in
OPTIMIZATION_r12.md say which stage the claim is about.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    import bench
    from etl_sendas_spark.plans.inventory import EXTRA_QUERIES, QUERIES
    from etl_sendas_spark.session import get_spark

    all_q = {**QUERIES, **EXTRA_QUERIES}
    names = sys.argv[2:] or bench.HEADLINE
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        os.environ.get("SPARK_GRAFT_PLANS_ROUND", "r13"),
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"capture_plans_{tag}")
    for name in names:
        fn = all_q[name]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} bytes)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
