"""Approximate-nearest-neighbor search over an embedding column.

- :func:`cosine_topk` — brute-force cosine top-k: broadcast the query
  set, score every corpus vector, window top-k per query. Exact; the
  correctness baseline and the right plan whenever |queries| is small
  (the broadcast side) even at 100 TB corpus scale — the scan is one
  pass, no shuffle except the final per-query top-k.
- :func:`lsh_cosine_topk` — random-hyperplane LSH variant: corpus and
  queries hash to sign-buckets over ``planes`` seeded hyperplanes with
  ``probe_bits`` multi-probe (flip each single bit) so near neighbors
  in adjacent buckets are still found; only bucket-mates are scored.
  Sub-linear per query at scale; recall tunable via planes/probes.

Vector math is `zip_with`/`aggregate` Column expressions — JVM-side,
codegen'd, no Python per row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, v: s + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, v: s + v * v))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cosine, rank), excluding self-
    matches. Ties broken by neighbor id for determinism.
    """
    qid = query_id_col or id_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    q = queries.select(
        F.col(qid).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv"))).filter(F.col("qn") > 0)

    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, planes: int, seed: int = 7) -> list[list[float]]:
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(planes)]


def _bucket_sig(vec: Column, planes: list[list[float]]) -> Column:
    sig = None
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = (_dot(vec, plane) > 0).cast("long")
        term = F.shiftleft(bit, i)
        sig = term if sig is None else sig.bitwiseXOR(term)
    return sig


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    planes: int = 8,
    probe_bits: int = 1,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via random-hyperplane buckets with multi-probe.

    Queries land in their own bucket plus every bucket within
    ``probe_bits`` flipped sign bits (probe_bits=1 → planes+1 probes).
    The corpus is bucketed once; scoring joins on the bucket id, so
    per-query work is ~corpus/2^planes per probe instead of the full
    scan.
    """
    dim = len(corpus.select(vec_col).first()[0])
    hp = _hyperplanes(dim, planes, seed)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    c = c.withColumn("bucket", _bucket_sig(F.col("cv"), hp))

    q = queries.select(
        F.col(id_col).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv"))).filter(F.col("qn") > 0)
    q = q.withColumn("__sig", _bucket_sig(F.col("qv"), hp))

    probes = [F.col("__sig")]
    if probe_bits >= 1:
        probes += [
            F.col("__sig").bitwiseXOR(F.lit(1 << i)) for i in range(planes)
        ]
    q = q.withColumn("bucket", F.explode(F.array(*probes))).drop("__sig")

    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(_dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6).alias(
                "cosine"
            ),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
