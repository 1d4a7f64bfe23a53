#!/usr/bin/env python
"""Strict oracle audit: every query in the inventory vs its DuckDB
oracle with an exact (dtype- and format-sensitive) value hash — a
stronger gate than the tolerance-based pytest parity suite, at any SF.

    python tools/audit_oracles.py [sf_dir]     # default /root/testdata/sf0.01

Caught in practice: DuckDB SUM(BIGINT)→HUGEINT→float64 dtype drift, and
an engine-dependent running sum under a non-total window order that only
manifested at sf0.1.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def canon(df):
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = pd.to_numeric(df[c], errors="coerce").round(6)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


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

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])  # optional query-name filter
    spark = get_spark(app_name="oracle_audit")
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    bad = 0
    names = [n for n in sorted(ORACLES) if not only or n in only]
    for name in names:
        try:
            a = canon(QUERIES[name](spark, sf_dir).toPandas())
            b = canon(con.execute(ORACLES[name]).df())
            ha = hashlib.md5(a.to_csv(index=False, float_format="%.6f").encode()).hexdigest()
            hb = hashlib.md5(b.to_csv(index=False, float_format="%.6f").encode()).hexdigest()
            ok = (
                len(a) == len(b)
                and list(a.columns) == list(b.columns)
                and ha == hb
            )
        except Exception as exc:  # noqa: BLE001 - audit reports, not raises
            print(f"ERROR     {name}: {type(exc).__name__}: {exc}", flush=True)
            bad += 1
            continue
        if ok:
            print(f"match     {name} ({len(a)} rows)", flush=True)
        else:
            bad += 1
            print(
                f"MISMATCH  {name}: rows {len(a)} vs {len(b)}, "
                f"cols {list(a.columns)} vs {list(b.columns)}",
                flush=True,
            )
    print(f"\n{len(names)} oracles, {bad} bad")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
