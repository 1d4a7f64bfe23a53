"""Local replica of the driver's t2 gate: every query with a DuckDB
oracle must match on row count, sorted-column schema, and values
(order-insensitive)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from etl_sendas_spark.plans.inventory import (
    EXTRA_ORACLES,
    EXTRA_QUERIES,
    ORACLES,
    QUERIES,
)

from conftest import SF_ORACLE

# driver window (first 50) + pytest-only variants: identical oracle bar
ALL_QUERIES = {**QUERIES, **EXTRA_QUERIES}
ALL_ORACLES = {**ORACLES, **EXTRA_ORACLES}


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_matches_oracle(name, spark, duck):
    ours = _canon(ALL_QUERIES[name](spark, SF_ORACLE).toPandas())
    theirs = _canon(duck.execute(ALL_ORACLES[name]).df())
    assert len(ours) == len(theirs), f"{name}: row count {len(ours)} vs {len(theirs)}"
    assert list(ours.columns) == list(theirs.columns), f"{name}: columns differ"
    for c in ours.columns:
        a, b = ours[c], theirs[c]
        if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
            a = pd.to_numeric(a, errors="coerce")
            b = pd.to_numeric(b, errors="coerce")
            bad = ~(
                (a.isna() & b.isna())
                | (abs(a - b) <= 1e-9 + 1e-9 * abs(b))
            )
            assert not bad.any(), (
                f"{name}.{c}: {int(bad.sum())} mismatches, first: "
                f"{a[bad].head(3).tolist()} vs {b[bad].head(3).tolist()}"
            )
        else:
            same = (a == b) | (a.isna() & b.isna())
            assert same.all(), (
                f"{name}.{c}: first diff {a[~same].head(3).tolist()} vs "
                f"{b[~same].head(3).tolist()}"
            )


def test_every_query_runs(spark):
    """Queries without an oracle still must run and return a schema."""
    for name, fn in ALL_QUERIES.items():
        df = fn(spark, SF_ORACLE)
        assert df.columns, name
        df.limit(5).collect()


def test_embedding_near_dup_bucketed_parity(spark, duck):
    """The scale path (sign-LSH buckets, no driver collect) must match
    its DuckDB mirror, which embeds the same plane constants."""
    from etl_sendas_spark.plans.inventory import (
        EMB_NEAR_DUP_BUCKETED_SQL,
        embedding_near_dup_bucketed,
    )

    srows = sorted(
        tuple(r) for r in embedding_near_dup_bucketed(spark, SF_ORACLE).collect()
    )
    orows = sorted(tuple(r) for r in duck.execute(EMB_NEAR_DUP_BUCKETED_SQL).fetchall())
    assert srows == orows
    assert len(srows) > 0
