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


def mixture_rates(
    df: DataFrame,
    stratum_col: str,
    alpha: float = 0.5,
    target_rows: int | None = None,
) -> DataFrame:
    """Temperature-based mixture weights over strata (sources /
    languages): ``weight_s ∝ share_s^alpha`` — the standard corpus
    re-balancing rule (alpha=1 keeps natural proportions, alpha→0
    flattens toward uniform; multilingual pipelines run ~0.3-0.7 so
    head sources stop drowning the tail).

    Returns one row per stratum: ``n_rows``, ``mix_weight`` (normalized
    share^alpha) and, when ``target_rows`` is given, ``sample_rate`` =
    min(1, weight * target / n_rows) — the per-stratum Bernoulli rate
    that realizes the mixture in expectation. The output is a tiny
    aggregate (one row per stratum) meant to be broadcast back against
    the corpus via :func:`stratified_sample_rates`; the whole
    computation is one groupBy + one scalar total, no driver loops.

    alpha=0.5 keeps the power inside IEEE-exact sqrt so the weights are
    engine-reproducible; other alphas go through pow() (libm) and are
    fine operationally, just not hash-comparable cross-engine.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("n_rows"))
    powed = counts.withColumn(
        "__w_raw",
        F.sqrt(F.col("n_rows").cast("double"))
        if alpha == 0.5
        else F.pow(F.col("n_rows").cast("double"), F.lit(alpha)),
    )
    total = powed.agg(F.sum("__w_raw").alias("__w_total"))
    out = powed.crossJoin(F.broadcast(total)).withColumn(
        "mix_weight", F.col("__w_raw") / F.col("__w_total")
    )
    if target_rows is not None:
        out = out.withColumn(
            "sample_rate",
            F.least(
                F.lit(1.0),
                F.col("mix_weight") * F.lit(float(target_rows)) / F.col("n_rows"),
            ),
        )
    return out.drop("__w_raw", "__w_total")


def stratified_sample_rates(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    rates: DataFrame,
    rate_col: str = "sample_rate",
    denom: int = 100_000,
) -> DataFrame:
    """Deterministic stratified sample with DATA-driven rates (the
    dynamic cousin of :func:`stratified_sample`, whose quota map is
    code): broadcast-join the tiny per-stratum rate table and keep a
    row iff its hash bucket clears its stratum's quota. Same portable
    hash, so the kept set is reproducible across engines and stable
    under repartitioning; the join adds no shuffle (rates is stratum-
    sized, always broadcast)."""
    quota = F.round(F.col(rate_col) * denom).cast("long")
    bucket = hash_bucket(F.col(id_col), denom)
    return (
        df.join(
            F.broadcast(rates.select(stratum_col, rate_col)), stratum_col
        )
        .filter(bucket < quota)
        .drop(rate_col)
    )


def stratified_exact_k(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    k: int,
) -> DataFrame:
    """EXACTLY min(k, |stratum|) rows per stratum, deterministically:
    rank rows within each stratum by the portable hash of their id and
    keep the k smallest — a hash-ordered top-k, so the 'random' sample
    is reproducible across engines/runs and stable under repartitioning
    (Bernoulli quotas give the right rate but a binomial count; eval
    sets and per-source caps need the exact count).

    One shuffle on the stratum key; Spark compiles the rank filter to a
    map-side WindowGroupLimit, so each map partition ships at most k
    rows per stratum — hot strata never straggle."""
    from pyspark.sql import Window

    h = portable_hash60(F.col(id_col).cast("string"))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= k)
        .drop("__rk")
    )


def weighted_sample_k(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis-Spirakis exponential-clocks scheme with the randomness
    replaced by the portable 60-bit content hash.

    Each row gets ``key = -ln(u) / w`` where ``u = (hash60(id)+1)/2^60``
    is its deterministic uniform in (0, 1] and ``w`` its weight; the k
    SMALLEST keys are exactly a weighted sample without replacement
    (P(row first) = w_i / sum w). Selection is a global top-k on the
    key — ``TakeOrderedAndProject``, no full sort, no shuffle beyond
    the per-partition heads — and, like every sampler here, the draw
    is reproducible across runs, engines, and repartitioning because
    the only "randomness" is md5 of the row id.

    Keys are rounded to 12 decimals BEFORE the top-k (ties then break
    on id) so rank order cannot depend on last-ulp differences between
    engines' ``ln``/division. Weights must be > 0 — enforced row-side
    with ``raise_error`` (a zero/negative/null weight would produce a
    -inf or negative sort key that deterministically wins the top-k,
    silently corrupting the sample).
    """
    u = (portable_hash60(F.col(id_col).cast("string")) + F.lit(1)).cast(
        "double"
    ) / F.lit(float(2**60))
    w = F.col(weight_col).cast("double")
    w = F.when(w > 0, w).otherwise(
        F.raise_error(
            F.concat(
                F.lit("weighted_sample_k: weights must be > 0, got "),
                F.coalesce(F.col(weight_col).cast("string"), F.lit("NULL")),
                F.lit(" at "),
                F.lit(id_col),
                F.lit("="),
                F.col(id_col).cast("string"),
            )
        )
    )
    key = F.round(-F.log(u) / w, 12)
    return (
        df.withColumn("sample_key", key)
        .orderBy(F.col("sample_key"), F.col(id_col))
        .limit(k)
    )


def group_split(
    df: DataFrame,
    group_col: str,
    splits: list[tuple[str, float]],
    denom: int = 1000,
    out_col: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test assignment: every row of a GROUP
    (domain, author, url-host, dedup cluster…) lands in the SAME split.

    Row-hash splitting leaks — near-duplicates share a source, so a
    random row split puts one copy in train and its twin in test,
    inflating eval. The standard fix (how production corpus pipelines
    split before benchmark decontamination) keys the split decision on
    a hash of the *group*: ``bucket = hash60(group) % denom``, and
    cumulative bucket ranges in the caller's ``splits`` order pick the
    split name. Within a group the assignment is constant, so cross-
    split leakage of a group is impossible by construction.

    Like every sampler in this module the decision is the portable
    60-bit md5 prefix: a single scan-local ``CASE`` over a hash —
    no shuffle, no RNG, reproducible across engines/runs/partitioning,
    and stable as the corpus grows (an existing group never changes
    split when new groups arrive — the consistent-hash property that
    makes incremental corpus refreshes train/test-safe).

    ``splits`` is an ordered list of (name, fraction); fractions must
    be > 0 and sum to <= 1 (any remainder falls to the LAST split, so
    [(train, .8), (val, .1), (test, .1)] covers the space exactly).
    """
    if not splits:
        raise ValueError("group_split: splits must be non-empty")
    fracs = [f for _, f in splits]
    if any(f <= 0 for f in fracs):
        raise ValueError(f"group_split: fractions must be > 0, got {fracs}")
    if sum(fracs) > 1.0 + 1e-9:
        raise ValueError(f"group_split: fractions sum to {sum(fracs)} > 1")
    bucket = hash_bucket(F.col(group_col), denom)
    expr: Column | None = None
    acc = 0.0
    for name, frac in splits[:-1]:
        acc += frac
        cond = bucket < F.lit(int(round(acc * denom)))
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
    last = F.lit(splits[-1][0])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, expr)
