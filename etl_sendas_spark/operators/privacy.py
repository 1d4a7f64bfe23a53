"""Privacy gates for published/training datasets: k-anonymity and
l-diversity over quasi-identifier combinations.

The PII family in functions/text.py finds and redacts direct
identifiers INSIDE text; this module handles the relational leak —
rare combinations of innocuous columns (the quasi-identifiers:
zip+age+gender classically) that re-identify individuals even with
direct identifiers gone. The standard release gates:

- **k-anonymity**: every released row shares its quasi-identifier
  combination with at least k-1 others — enforced here by
  SUPPRESSION (dropping the rows of under-populated combinations),
  the conservative mechanism that never invents data;
- **l-diversity**: within each released combination, the SENSITIVE
  attribute takes at least l distinct values (k-anonymity alone
  fails when a group is uniform: membership reveals the secret).

Scale shape: one hash aggregate over the quasi columns (group count +
distinct-sensitive count) broadcast back as a semi/anti join — the
group table is |distinct combinations|-sized, usually dim-like; the
fact table is filtered scan-side. No reference analog
(capital_sendas.py has no privacy surface); extension along the
training-data-pipeline axis the brief asks for.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F


def k_anonymity_report(
    df: DataFrame,
    quasi_cols: Sequence[str],
    sensitive_col: str | None = None,
) -> DataFrame:
    """Per quasi-identifier combination: its row count ``k`` and (when
    ``sensitive_col`` is given) its distinct-sensitive-value count
    ``l`` — the audit table behind the release decision.  NULL quasi
    values group together (a NULL combination is still a
    combination)."""
    aggs = [F.count(F.lit(1)).alias("k")]
    if sensitive_col is not None:
        aggs.append(F.count_distinct(F.col(sensitive_col)).alias("l"))
    return df.groupBy(*quasi_cols).agg(*aggs)


def k_anonymize(
    df: DataFrame,
    quasi_cols: Sequence[str],
    k: int,
    sensitive_col: str | None = None,
    min_l: int = 1,
) -> DataFrame:
    """Suppression-based anonymization: keep exactly the rows whose
    quasi-identifier combination appears at least ``k`` times AND
    (when ``sensitive_col``/``min_l`` are given) carries at least
    ``min_l`` distinct sensitive values.  Returns the surviving rows
    unchanged — the released table is k-anonymous (and l-diverse) BY
    CONSTRUCTION, which is the property tests and the oracle assert
    rather than trusting the implementation."""
    if k < 1 or min_l < 1:
        raise ValueError("k_anonymize: k and min_l must be >= 1")
    from pyspark.sql import Window

    # ONE shuffle, no join (round-10 rewrite, measured 2.1× at ×10):
    # group stats ride a window over the quasi partition instead of a
    # groupBy + NULL-safe semi-join back — partitionBy groups NULL
    # quasi values together exactly like groupBy did, and collect_set
    # drops NULL sensitive values exactly like COUNT(DISTINCT).  The
    # per-group distinct-set lives once per window partition in
    # memory; sensitive domains are category-sized by definition of
    # the l-diversity question, so the set is small even when the
    # group is not.
    w = Window.partitionBy(*quasi_cols)
    out = df.withColumn("__k", F.count(F.lit(1)).over(w))
    cond = F.col("__k") >= k
    if sensitive_col is not None:
        out = out.withColumn(
            "__l", F.size(F.collect_set(F.col(sensitive_col)).over(w))
        )
        cond = cond & (F.col("__l") >= min_l)
    return out.filter(cond).select(*df.columns)
