"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is never trained on whole: pipelines draw *stratified*
samples (per-language / per-source quotas) that must be (a) reproducible
across runs and engines, (b) computable in one scan with no shuffle, and
(c) stable under re-partitioning. ``rand()``-based sampling fails all
three; keying the decision on a content-stable hash of the row id gives
a sample that is a pure, partition-local filter — Catalyst pushes it
into the scan, and adding data never flips the decision for an existing
row (the property consistent-hash samplers are built for).

The hash is the 60-bit md5 prefix (:func:`~..operators.dedupe.
portable_hash60`) so a DuckDB/ANSI-SQL oracle reproduces the *exact*
sample: ``('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::BIGINT``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedupe import portable_hash60


def hash_bucket(id_col: Column, denom: int = 1000) -> Column:
    """Stable per-row bucket in [0, denom): hash60(id-as-string) % denom."""
    return portable_hash60(id_col.cast("string")) % F.lit(denom)


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    denom: int = 1000,
) -> DataFrame:
    """Deterministic stratified sample: keep a row iff its hash bucket
    falls below its stratum's per-mille quota.

    ``rates`` maps stratum value -> sampling fraction (0..1). The filter
    is a single Column expression — no shuffle, no RNG state, pushdown-
    friendly — so at cluster scale the sample costs exactly one scan and
    the kept fraction per stratum concentrates tightly around the quota
    (each row an independent Bernoulli on a uniform 60-bit hash).

    Mirrors the "kept-fraction" semantics of the reference's manual
    per-category row slicing (capital_sendas.py filters categories one
    at a time); here the quota map is data, not code.
    """
    bucket = hash_bucket(F.col(id_col), denom)
    quota: Column = F.lit(int(round(default_rate * denom)))
    for value, rate in sorted(rates.items()):
        quota = F.when(
            F.col(stratum_col) == F.lit(value), F.lit(int(round(rate * denom)))
        ).otherwise(quota)
    return df.filter(bucket < quota)
