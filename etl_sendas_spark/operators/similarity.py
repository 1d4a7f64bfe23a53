"""Similarity search over an embedding column (`array<float>`).

Three plans, exact-first — the standard ANN ladder for corpus-scale
retrieval:

- :func:`cosine_topk` — brute-force cosine top-k: broadcast the query
  set, score every corpus vector, window top-k per query. Exact; the
  correctness baseline and the right plan whenever |queries| is small
  (the broadcast side) even at 100 TB corpus scale — the scan is one
  pass, no shuffle except the final per-query top-k.
- :func:`ivf_cosine_topk` — IVF (inverted-file) variant: the corpus is
  clustered once against a deterministic centroid sample; a query
  scores only the ``n_probe`` clusters nearest to it. Per-query work
  drops to ~``n_probe / n_centroids`` of the corpus. This is the scale
  path for *general* top-k (mid-range cosine), where sign-LSH's
  per-bit collision probability (1 - θ/π) is too close to ½ to bucket
  usefully.
- :func:`lsh_cosine_topk` — multi-table random-hyperplane LSH:
  ``tables`` independent tables of ``bits`` sign-bits; candidates are
  bucket-mates in ANY table. Sub-linear per query, but effective only
  in the near-duplicate range (cosine ≳ 0.9, where per-bit collision
  ≥ 0.85 ⇒ per-table ≥ 0.27 ⇒ 16 tables ≥ 99% recall). Use for
  dedup-style "find my almost-exact copy" lookups; use IVF or brute
  force for mid-cosine top-k.

Vector math is `zip_with`/`aggregate` Column expressions — JVM-side
with no Python per row, but NOTE: higher-order functions are
CodegenFallback (interpreted, ~0.3M multiply-adds/s/core measured), so
dense corpus×k kernels offer an Arrow-batched BLAS backend
(``assign_backend="numpy"``) where the arithmetic dominates; see
:func:`_assign_nearest_centroid` for the measured comparison.
"""

from __future__ import annotations

import os
import random

from pyspark.sql import Column, DataFrame, Window, functions as F


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def round_half_up(arr, decimals: int = 6):
    """HALF_UP rounding for numpy arrays — matches Spark's ``F.round``
    (and DuckDB's ``round``), which round a trailing 5 AWAY FROM ZERO.
    ``np.round`` is banker's (half-to-even), so a cosine landing exactly
    on a 5-at-the-(d+1)th-decimal boundary would round differently per
    backend; the numpy paths share this one rule instead."""
    import numpy as np

    scale = 10.0 ** decimals
    return np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale


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
    exclude_self: bool = True,
    backend: str = "exact",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cosine, rank), excluding self-
    matches unless ``exclude_self=False`` (retrieval workloads whose
    query ids share the corpus id namespace on purpose — e.g. hybrid
    search seeded by a corpus vector — must keep the identity match).
    Ties broken by neighbor id for determinism.

    ``backend="exact"`` scores with the SQL-replayable
    zip_with/aggregate dot (the oracle path — but interpreted, see the
    module docstring); ``backend="numpy"`` scores each Arrow batch as
    one (B×dim) @ (dim×|queries|) BLAS matmul — the production kernel
    once corpus×|queries| is real. Both round to 6 decimals BEFORE the
    rank window, so the two backends' rankings agree unless a true
    cosine sits within ~1e-15 of a 6-decimal boundary
    (property-tested equal on the test corpus).
    """
    qid = query_id_col or id_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    q = queries.select(
        F.col(qid).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv"))).filter(F.col("qn") > 0)

    if backend == "numpy":
        scored = _cosine_scores_np(c, q)
        if exclude_self:
            scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    else:
        pairs = c.crossJoin(F.broadcast(q))
        if exclude_self:
            pairs = pairs.filter(F.col("neighbor_id") != F.col("query_id"))
        scored = (
            pairs
            .select(
                "query_id",
                "neighbor_id",
                F.round(
                    _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6
                ).alias("cosine"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _cosine_scores_np(c: DataFrame, q: DataFrame) -> DataFrame:
    """(query_id, neighbor_id, cosine rounded 6) for every
    (corpus, query) pair — the BLAS backend of :func:`cosine_topk`.
    The query workload is the bounded side by contract: it collects
    and ships to every task in the mapInPandas closure; each batch
    scores as one matmul, still one corpus pass, no shuffle."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    qrows = q.collect()
    if not qrows:
        raise ValueError("cosine_topk: empty query set")
    qmat = np.array([list(r["qv"]) for r in qrows], dtype=np.float64)
    qn = np.array([float(r["qn"]) for r in qrows], dtype=np.float64)
    qids = [r["query_id"] for r in qrows]
    out_schema = StructType(
        [
            StructField("query_id", q.schema["query_id"].dataType),
            StructField("neighbor_id", c.schema["neighbor_id"].dataType),
            StructField("cosine", DoubleType()),
        ]
    )

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emb = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
            sims = round_half_up(
                (emb @ qmat.T) / (pdf["cn"].to_numpy()[:, None] * qn[None, :]), 6
            )
            b, m = sims.shape
            yield pd.DataFrame(
                {
                    "query_id": np.tile(np.asarray(qids), b),
                    "neighbor_id": np.repeat(pdf["neighbor_id"].to_numpy(), m),
                    "cosine": sims.ravel(),
                }
            )

    return c.select("neighbor_id", "cv", "cn").mapInPandas(score, schema=out_schema)


# ---------------------------------------------------------------------------
# IVF — inverted file over a deterministic centroid sample
# ---------------------------------------------------------------------------

def _assign_nearest_centroid(
    c: DataFrame, cents: DataFrame, backend: str = "exact"
) -> DataFrame:
    """(neighbor_id, cv, cn, cluster): each corpus vector labeled with
    its nearest centroid by cosine. Ties break to the lowest
    centroid_id for determinism. Both backends are NARROW — no join,
    no shuffle, no per-pair row materialization; the centroid table is
    bounded (n_clusters rows) by contract and collects driver-side.

    ``backend="exact"`` (default): centroids constant-fold into one
    literal array-of-structs; each row computes its sim array with a
    ``transform`` and picks the winner with a first-strictly-greater
    ``aggregate`` fold. The dot is the same left-to-right
    zip_with/aggregate sum the SQL oracle replays, so assignments are
    bit-reproducible cross-engine — this is the oracle-checked path.
    Its cost is interpreted HOF arithmetic (higher-order functions are
    CodegenFallback): ~corpus×k×dim boxed multiply-adds, measured
    ~0.3M/s/core — fine for the ORACLE-scale k, quadratically painful
    as k grows.

    ``backend="numpy"``: one Arrow-batched ``mapInPandas`` stage; each
    batch is a (B×dim) @ (dim×k) BLAS matmul + argmax (first max wins
    = lowest centroid_id, matching the exact path's tie-break). This
    is the production path for real k — measured 36 s → ~2 s at 20k
    vectors × 256 centroids. BLAS reassociates the dot-product sum, so
    a sim can differ from the exact path in the last ULP; an argmax
    flip needs two DISTINCT centroids within ~1e-16 of each other —
    vanishing for real data, and exactly-equal centroid copies
    tie-break identically in both paths (property-tested equal on the
    test corpus). Not the oracle path because the SQL oracle cannot
    replay BLAS summation order.

    Two rejected join-shaped alternatives, both measured at 20k × 256:
    crossJoin + row_number window exchanged ~5 GB of array-carrying
    rows (30-40 s); a slim-projected crossJoin still paid the
    BroadcastNestedLoopJoin's row-at-a-time copy of 5M × ~1 KB rows
    (~30 s). 256 SEPARATE inlined dot expressions also fail — past the
    codegen method limit."""
    if backend == "numpy":
        return _assign_nearest_centroid_np(c, cents)
    rows = sorted(cents.collect(), key=lambda r: r["centroid_id"])
    if not rows:
        raise ValueError("assign_nearest_centroid: empty centroid table")
    k = len(rows)
    cent_arr = F.array(
        *[
            F.struct(
                F.array(*[F.lit(float(x)) for x in r["ce"]]).alias("ce"),
                F.lit(float(r["ce_n"])).alias("n"),
            )
            for r in rows
        ]
    )
    ids_arr = F.array(*[F.lit(r["centroid_id"]) for r in rows])
    sims = F.transform(
        cent_arr, lambda s: _dot(F.col("cv"), s["ce"]) / (F.col("cn") * s["n"])
    )
    best = F.aggregate(
        F.sequence(F.lit(0), F.lit(k - 1)),
        F.struct(F.lit(float("-inf")).alias("s"), F.lit(-1).alias("i")),
        lambda acc, i: F.when(
            F.element_at(F.col("__sims"), i + 1) > acc["s"],
            F.struct(F.element_at(F.col("__sims"), i + 1).alias("s"), i.alias("i")),
        ).otherwise(acc),
    )
    return (
        c.withColumn("__sims", sims)
        .withColumn("__best", best)
        .select(
            "neighbor_id",
            "cv",
            "cn",
            F.element_at(ids_arr, F.col("__best")["i"] + 1).alias("cluster"),
        )
    )


def _assign_nearest_centroid_np(c: DataFrame, cents: DataFrame) -> DataFrame:
    """numpy backend of :func:`_assign_nearest_centroid` — see there."""
    import numpy as np
    from pyspark.sql.types import StructField, StructType

    rows = sorted(cents.collect(), key=lambda r: r["centroid_id"])
    if not rows:
        raise ValueError("assign_nearest_centroid: empty centroid table")
    cent_mat = np.array([list(r["ce"]) for r in rows], dtype=np.float64)  # k×d
    cent_n = np.array([float(r["ce_n"]) for r in rows], dtype=np.float64)
    ids = [r["centroid_id"] for r in rows]
    id_type = cents.schema["centroid_id"].dataType

    out_schema = StructType(
        [
            c.schema["neighbor_id"],
            c.schema["cv"],
            c.schema["cn"],
            StructField("cluster", id_type),
        ]
    )

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            emb = np.stack([np.asarray(v, dtype=np.float64) for v in pdf["cv"]])
            sims = (emb @ cent_mat.T) / (
                pdf["cn"].to_numpy()[:, None] * cent_n[None, :]
            )
            # argmax returns the FIRST maximum — lowest centroid_id,
            # same tie-break as the exact path
            idx = sims.argmax(axis=1)
            out = pdf[["neighbor_id", "cv", "cn"]].copy()
            out["cluster"] = [ids[i] for i in idx]
            yield out

    return c.mapInPandas(assign, schema=out_schema)


def _ivf_centroids(
    c: DataFrame,
    n_centroids: int,
    lloyd_iters: int = 0,
    assign_backend: str = "exact",
    dim: int | None = None,
) -> DataFrame:
    """(centroid_id, ce, ce_n) from a normalized (neighbor_id, cv, cn)
    corpus frame — the deterministic IVF coarse quantizer shared by the
    inline query path and the at-rest index build. Seeds are the
    ``n_centroids`` lowest *portable* md5-60 hashes of the id
    (reproducible cross-engine, no RNG); ``lloyd_iters`` k-means rounds
    refine them with the element-wise mean expressed as ``dim``
    map-side-combinable ``avg`` aggregates (one shuffle per round, no
    posexplode). Labels keep the seed ids so tie-breaks stay
    deterministic."""
    from .dedupe import portable_hash60

    cents = (
        c.withColumn("__h", portable_hash60(F.col("neighbor_id").cast("string")))
        .orderBy("__h")
        .limit(n_centroids)
        .select(
            F.col("neighbor_id").alias("centroid_id"),
            F.col("cv").alias("ce"),
            F.col("cn").alias("ce_n"),
        )
    )
    if lloyd_iters > 0:
        if dim is None:
            raise ValueError("_ivf_centroids: lloyd refinement needs dim")
        for _ in range(lloyd_iters):
            members = _assign_nearest_centroid(c, cents, backend=assign_backend)
            cents = (
                members.groupBy("cluster")
                .agg(*[F.avg(F.col("cv")[i]).alias(f"__m{i}") for i in range(dim)])
                .select(
                    F.col("cluster").alias("centroid_id"),
                    F.array(*[F.col(f"__m{i}") for i in range(dim)]).alias("ce"),
                )
                .withColumn("ce_n", _norm(F.col("ce")))
                .filter(F.col("ce_n") > 0)
            )
        # centroid table is tiny — pin it (strategy-pluggable) so the
        # assign pass and the probe pass don't each recompute
        # lloyd_iters rounds
        from ..materialize import materialize as _pin

        cents = F.broadcast(_pin(cents, name="ivf_centroids"))
    return cents


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 8,
    lloyd_iters: int = 0,
    assign_backend: str = "exact",
    query_id_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via an inverted-file (IVF) index.

    Centroids start as a deterministic sample of the corpus itself (the
    ``n_centroids`` lowest *portable* hash values of the id — md5-60,
    reproducible across engines so the DuckDB oracle rebuilds the
    identical index; no RNG). ``lloyd_iters`` k-means rounds then
    refine them DataFrame-side: assign (broadcast argmax pass) →
    update (per-cluster element-wise mean = ``dim`` map-side-combinable
    ``avg`` aggregates, one shuffle on cluster id). Cluster labels stay
    the seed ids, so tie-breaks remain deterministic; recall at fixed
    ``n_probe`` is measured against :func:`cosine_topk` in
    ``tests/test_corpus_ops.py``. Every corpus vector is assigned to
    its nearest (refined) centroid; each query scores only its
    ``n_probe`` nearest clusters. Scanned fraction ≈
    n_probe / n_centroids, recall degrades smoothly as n_probe shrinks.

    The default ``lloyd_iters=0`` keeps the index byte-replayable by
    the cross-engine SQL oracle; production indexes should use 2-3
    rounds (diminishing returns after — standard IVF practice).
    """
    qid = query_id_col or id_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    q = queries.select(
        F.col(qid).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv"))).filter(F.col("qn") > 0)

    dim = (
        len(corpus.select(vec_col).first()[0]) if lloyd_iters > 0 else None
    )
    cents = _ivf_centroids(c, n_centroids, lloyd_iters, assign_backend, dim)

    # the index build; at rest `assigned` would be written as a
    # `cluster_id`-partitioned table so probes prune whole partitions.
    assigned = _assign_nearest_centroid(c, cents, backend=assign_backend)

    # n_probe nearest clusters per query
    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn("sim", _dot(F.col("qv"), F.col("ce")) / (F.col("qn") * F.col("ce_n")))
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "qn", F.col("centroid_id").alias("cluster"))
    )

    scored = assigned.join(F.broadcast(probes), "cluster")
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = (
        scored
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# ---------------------------------------------------------------------------
# IVF index at rest — build once / append / query many (txlog-backed)
# ---------------------------------------------------------------------------


def ivf_index_build(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 32,
    lloyd_iters: int = 0,
    assign_backend: str = "exact",
    centroid_source: DataFrame | None = None,
    src_version: int | None = None,
) -> str:
    """Materialize an IVF index as TWO txlog tables under ``path`` —
    the build-once/query-many split :func:`ivf_cosine_topk` rebuilds
    inline on every call (fine for one-shot queries, wasteful for a
    query service):

    - ``<path>/centroids``: the coarse quantizer (tiny, broadcast at
      query time), FROZEN at build — the FAISS train-once contract;
    - ``<path>/rows``: every corpus vector labeled with its nearest
      centroid, PARTITIONED BY ``cluster`` (the new txlog partition
      spec), so :func:`ivf_index_topk` reads only the probed clusters'
      files — the at-rest realization of IVF's scanned-fraction bound.

    ``centroid_source`` trains the quantizer from a DIFFERENT frame
    than the indexed corpus (defaults to the corpus) — what makes the
    append law testable exactly: ``build(A) + append(B)`` must equal
    ``build(A ∪ B, centroid_source=A)`` row-for-row, because appends
    assign against the frozen centroids.

    Both tables are ordinary txlog tables: versioned, vacuumable,
    compactable (a periodic ``compact`` on rows/ keeps per-cluster
    file counts bounded as appends accumulate).
    """
    from ..sources.txlog import TxLogTable

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    if centroid_source is not None:
        cs = centroid_source.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("cv"),
        ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    else:
        cs = c
    dim = (
        len(corpus.select(vec_col).first()[0]) if lloyd_iters > 0 else None
    )
    cents = _ivf_centroids(cs, n_centroids, lloyd_iters, assign_backend, dim)
    TxLogTable.create(os.path.join(path, "centroids"), cents)
    assigned = _assign_nearest_centroid(c, cents, backend=assign_backend)
    TxLogTable.create(
        os.path.join(path, "rows"),
        assigned.select("neighbor_id", "cv", "cn", "cluster"),
        partition_by=["cluster"],
        extra=(
            {"idx_src_version": int(src_version)}
            if src_version is not None
            else None
        ),
    )
    return path


def ivf_index_append(
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_backend: str = "exact",
    src_version: int | None = None,
) -> int:
    """Add vectors to an at-rest IVF index WITHOUT rebuilding: assign
    them against the frozen centroid table (one narrow pass — the
    corpus already indexed is never rescanned, the
    minhash_index_append property applied to vectors) and append the
    labeled rows to the partitioned rows table. Returns the rows
    table's new version."""
    from ..sources.txlog import TxLogTable

    spark = new_vectors.sparkSession
    cents = TxLogTable(os.path.join(path, "centroids")).read(spark)
    c = new_vectors.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    assigned = _assign_nearest_centroid(c, cents, backend=assign_backend)
    rows_t = TxLogTable(os.path.join(path, "rows"))
    extra = None
    if src_version is not None:
        extra = {"idx_src_version": int(src_version)}
    else:
        meta = rows_t.commit_meta(rows_t.latest_version())
        if "idx_src_version" in meta:
            extra = {"idx_src_version": int(meta["idx_src_version"])}
    return rows_t.append(
        assigned.select("neighbor_id", "cv", "cn", "cluster"), spark,
        extra=extra,
    )


def ivf_index_refresh(
    spark,
    path: str,
    corpus_root: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assign_backend: str = "exact",
    to_version: int | None = None,
    max_touched_ids: int = 10_000,
    rebuild_fraction: float = 0.05,
) -> int | None:
    """Maintain the at-rest IVF index under CORPUS DML — the vector
    twin of :func:`..operators.search.text_index_refresh`: consume the
    corpus txlog table's change feed from the rows table's
    ``idx_src_version`` watermark, derive each touched id's FINAL live
    vector from the feed itself (newest commit per id; I row wins over
    the same-version D of a normalized update), assign the live ones
    against the FROZEN centroids (the train-once contract — a refresh
    never moves the quantizer), and land delete+insert as ONE atomic
    ``replace_where`` on the rows table carrying the advanced
    watermark.  After a refresh, :func:`ivf_index_topk` equals a fresh
    build against the corpus head with the same frozen centroids (the
    law the tests pin).  Returns the rows table's new version, or
    None when already synced.

    Feed-sized end to end — neither the corpus nor the already-
    indexed rows are rescanned (the replace's CoW rewrite touches the
    files holding the touched ids' rows; vectors that changed cluster
    land in their new hive dir).  Zero-norm updated vectors drop out
    of the index, matching the build's ``cn > 0`` filter.  The
    bounded ``IN`` literal is capped by ``max_touched_ids``, as in
    the text refresh."""
    from pyspark.sql import Window

    from ..sources.txlog import (
        TxLogTable,
        decide_refresh_wave,
        plan_refresh_wave,
        sql_in_condition,
    )

    rows_t = TxLogTable(os.path.join(path, "rows"))
    meta = rows_t.commit_meta(rows_t.latest_version())
    if "idx_src_version" not in meta:
        raise ValueError(
            "ivf_index_refresh: rows table carries no idx_src_version "
            "watermark — build/append with src_version= to enable "
            "incremental refresh"
        )
    last = int(meta["idx_src_version"])
    corpus = TxLogTable(corpus_root)
    head = corpus.latest_version() if to_version is None else to_version
    if head <= last:
        return None
    feed = corpus.change_feed(
        spark,
        keys=[id_col],
        from_version=last + 1,
        to_version=head,
        normalize_updates=True,
    ).persist()
    try:
        # count-first strategy pick — no driver collect before the
        # rebuild decision (round 12, see decide_refresh_wave)
        strategy, touched = decide_refresh_wave(
            feed,
            id_col,
            max_touched_ids=max_touched_ids,
            rebuild_fraction=rebuild_fraction,
            base_count=rows_t.row_count(),
        )
        if strategy == "noop":
            return rows_t.append(
                rows_t.read(spark).limit(0),
                spark,
                extra={"idx_src_version": head},
            )
        # REBUILD fallback (round 11, same law as the text twin): a
        # wave that both exceeds the per-commit id cap and touches at
        # least ``rebuild_fraction`` of the indexed rows would pay one
        # near-full CoW rewrite PER CHUNK when the ids are spread over
        # the id space — re-assign ALL live vectors against the FROZEN
        # centroids in ONE overwrite instead (cost = one build minus
        # the training; the quantizer still never moves).
        cents = TxLogTable(os.path.join(path, "centroids")).read(spark)
        if strategy == "rebuild":
            c_all = (
                corpus.read(spark, head)
                .select(
                    F.col(id_col).alias("neighbor_id"),
                    _as_double(F.col(vec_col)).alias("cv"),
                )
                .withColumn("cn", _norm(F.col("cv")))
                .filter(F.col("cn") > 0)
            )
            all_assigned = _assign_nearest_centroid(
                c_all, cents, backend=assign_backend
            ).select("neighbor_id", "cv", "cn", "cluster")
            return rows_t.overwrite(
                all_assigned,
                extra={"idx_src_version": head, "idx_rebuild": True},
            )
        w = Window.partitionBy(id_col)
        final_live = (
            feed.withColumn("__mv", F.max("_commit_version").over(w))
            .filter(
                (F.col("_commit_version") == F.col("__mv"))
                & (F.col("op") == "I")
            )
            .select(id_col, vec_col)
        )
        c = (
            final_live.select(
                F.col(id_col).alias("neighbor_id"),
                _as_double(F.col(vec_col)).alias("cv"),
            )
            .withColumn("cn", _norm(F.col("cv")))
            .filter(F.col("cn") > 0)
        )
        assigned = _assign_nearest_centroid(
            c, cents, backend=assign_backend
        ).select("neighbor_id", "cv", "cn", "cluster")
        # oversized waves auto-chunk into bounded replace_where
        # commits with a crash cursor — see plan_refresh_wave and the
        # text twin's docstring (round 11)
        chunks, start = plan_refresh_wave(
            meta, last, head, touched, max_touched_ids
        )
        v = None
        for i in range(start, len(chunks)):
            chunk = chunks[i]
            extra = (
                {"idx_src_version": head}
                if i == len(chunks) - 1
                else {
                    "idx_src_version": last,
                    "idx_wave": {
                        "from": last, "to": head, "done_upto": chunk[-1]
                    },
                }
            )
            v = rows_t.replace_where(
                spark,
                assigned.filter(F.col("neighbor_id").isin(chunk)),
                sql_in_condition("neighbor_id", chunk),
                extra=extra,
            )
        return v
    finally:
        feed.unpersist()


def ivf_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 8,
    query_id_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Query an at-rest IVF index: identical scoring/tie-break math to
    :func:`ivf_cosine_topk` (pytest pins row-for-row equality against
    the inline build over the same corpus), but the corpus side is the
    PERSISTED rows table read through partition pruning — only the
    union of the queries' probed clusters is scanned (the probe set is
    bounded by n_centroids, driver-side metadata by contract). At
    100 TB the read is the scanned-fraction bound made physical:
    non-probed clusters' files never reach Spark."""
    from ..sources.txlog import TxLogTable

    qid = query_id_col or id_col
    cents = TxLogTable(os.path.join(path, "centroids")).read(spark)
    q = queries.select(
        F.col(qid).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv"))).filter(F.col("qn") > 0)

    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "sim", _dot(F.col("qv"), F.col("ce")) / (F.col("qn") * F.col("ce_n"))
        )
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "qn", F.col("centroid_id").alias("cluster"))
    )
    # probes feed TWO consumers (the cluster collect below and the
    # scoring join) — pin the bounded frame so the crossJoin+window
    # computes once (strategy-pluggable, same as the lloyd centroids)
    from ..materialize import materialize as _pin

    probes = _pin(probes, name="ivf_index_probes")
    # ≤ n_centroids values by contract — bounded driver-side metadata
    clusters = [r["cluster"] for r in probes.select("cluster").distinct().collect()]
    rows = TxLogTable(os.path.join(path, "rows")).read(
        spark, prune={"cluster": clusters}
    )
    # pruning is metadata-only by contract: apply the row predicate too
    scored = rows.filter(F.col("cluster").isin(clusters)).join(
        F.broadcast(probes), "cluster"
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def ivfpq_index_build(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 32,
    m_subspaces: int = 4,
    n_codes: int = 16,
    encode_backend: str = "numpy",
    pq_lloyd_iters: int = 0,
    centroid_source: DataFrame | None = None,
    src_version: int | None = None,
) -> str:
    """Materialize an IVF-PQ index as THREE txlog tables under
    ``path`` — :func:`ivf_index_build`'s split applied to the
    memory-bounded variant, which is where at-rest persistence matters
    most (the codes table row is m small ints, the ~100× compression
    that fits a 100 TB embedding corpus in probeable storage):

    - ``<path>/centroids``: the frozen coarse quantizer;
    - ``<path>/codebook``: (j, code_id, sub) — the per-subspace
      codewords, tiny, collected to literals at query time exactly as
      the inline path does;
    - ``<path>/codes``: (neighbor_id, cluster, codes) PARTITIONED BY
      ``cluster`` — probes read only their clusters' files, and the
      original vectors are NOT stored (pure-ADC index; rerank-style
      exact re-scoring joins back to wherever the vectors live).

    ``centroid_source`` seeds BOTH the coarse centroids and the
    codebook sample from a different frame (defaults to the corpus),
    making the append law exact: ``build(A) + append(B)`` ==
    ``build(A ∪ B, centroid_source=A)``.
    """
    from ..sources.txlog import TxLogTable
    from .dedupe import portable_hash60

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    if centroid_source is not None:
        cs = centroid_source.select(
            F.col(id_col).alias("neighbor_id"),
            _as_double(F.col(vec_col)).alias("cv"),
        ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    else:
        cs = c
    dim = len(corpus.select(vec_col).first()[0])
    if dim % m_subspaces != 0:
        raise ValueError(
            f"ivfpq_index_build: dim {dim} not divisible by m={m_subspaces}"
        )
    dsub = dim // m_subspaces

    hashed = cs.withColumn(
        "__h", portable_hash60(F.col("neighbor_id").cast("string"))
    )
    cents = (
        hashed.orderBy("__h")
        .limit(n_centroids)
        .select(
            F.col("neighbor_id").alias("centroid_id"),
            F.col("cv").alias("ce"),
            F.col("cn").alias("ce_n"),
        )
    )
    cb_rows = sorted(
        hashed.orderBy("__h").limit(n_codes).select("neighbor_id", "cv").collect(),
        key=lambda r: r["neighbor_id"],
    )
    if len(cb_rows) < 2:
        raise ValueError("ivfpq_index_build: corpus too small for a codebook")
    codebook = [
        [list(r["cv"])[j * dsub : (j + 1) * dsub] for r in cb_rows]
        for j in range(m_subspaces)
    ]
    if pq_lloyd_iters > 0:
        codebook = _pq_train_lloyd(c, codebook, dsub, pq_lloyd_iters)

    spark = corpus.sparkSession
    TxLogTable.create(os.path.join(path, "centroids"), cents)
    cb_flat = [
        (j, i, codebook[j][i])
        for j in range(m_subspaces)
        for i in range(len(codebook[j]))
    ]
    TxLogTable.create(
        os.path.join(path, "codebook"),
        spark.createDataFrame(cb_flat, "j int, code_id int, sub array<double>"),
    )
    assigned = _assign_nearest_centroid(c, cents, backend=encode_backend)
    codes = _pq_encode(assigned, codebook, dsub, backend=encode_backend)
    TxLogTable.create(
        os.path.join(path, "codes"), codes, partition_by=["cluster"],
        extra=(
            {"idx_src_version": int(src_version)}
            if src_version is not None
            else None
        ),
    )
    return path


def _pq_index_parts(spark, path: str):
    """(centroids df, codebook nested lists, dsub) read back from an
    at-rest IVF-PQ index — codewords return as the same float doubles
    the build wrote (parquet round-trip is exact)."""
    from ..sources.txlog import TxLogTable

    cents = TxLogTable(os.path.join(path, "centroids")).read(spark)
    cb_rows = TxLogTable(os.path.join(path, "codebook")).read(spark).collect()
    m = 1 + max(r["j"] for r in cb_rows)
    codebook: list[list[list[float]]] = [[] for _ in range(m)]
    for r in sorted(cb_rows, key=lambda r: (r["j"], r["code_id"])):
        codebook[r["j"]].append(list(r["sub"]))
    return cents, codebook, len(codebook[0][0])


def ivfpq_index_append(
    path: str,
    new_vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encode_backend: str = "numpy",
    src_version: int | None = None,
) -> int:
    """Add vectors to an at-rest IVF-PQ index: assign against the
    frozen centroids, encode against the frozen codebook (one narrow
    pass — the indexed corpus is never rescanned), append the code
    rows. Returns the codes table's new version."""
    from ..sources.txlog import TxLogTable

    spark = new_vectors.sparkSession
    cents, codebook, dsub = _pq_index_parts(spark, path)
    c = new_vectors.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    assigned = _assign_nearest_centroid(c, cents, backend=encode_backend)
    codes = _pq_encode(assigned, codebook, dsub, backend=encode_backend)
    codes_t = TxLogTable(os.path.join(path, "codes"))
    extra = None
    if src_version is not None:
        extra = {"idx_src_version": int(src_version)}
    else:
        meta = codes_t.commit_meta(codes_t.latest_version())
        if "idx_src_version" in meta:
            extra = {"idx_src_version": int(meta["idx_src_version"])}
    return codes_t.append(codes, spark, extra=extra)


def ivfpq_index_refresh(
    spark,
    path: str,
    corpus_root: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    encode_backend: str = "numpy",
    to_version: int | None = None,
    max_touched_ids: int = 10_000,
    rebuild_fraction: float = 0.05,
) -> int | None:
    """Maintain the at-rest IVF-PQ index under CORPUS DML — the
    compressed twin of :func:`ivf_index_refresh`, completing the
    at-rest-index refresh family: consume the corpus table's
    commit-scoped change feed from the codes table's
    ``idx_src_version`` watermark, derive each touched id's FINAL
    live vector from the feed, assign against the FROZEN centroids
    and encode against the FROZEN codebook (the train-once contract —
    a refresh never moves the quantizer or the codewords), and land
    delete+insert as ONE atomic ``replace_where`` on the codes table
    carrying the advanced watermark.  After a refresh,
    :func:`ivfpq_index_topk` equals a fresh build of the corpus head
    with the same frozen quantizer+codebook (the law the tests pin)."""
    from pyspark.sql import Window

    from ..sources.txlog import (
        TxLogTable,
        decide_refresh_wave,
        plan_refresh_wave,
        sql_in_condition,
    )

    codes_t = TxLogTable(os.path.join(path, "codes"))
    meta = codes_t.commit_meta(codes_t.latest_version())
    if "idx_src_version" not in meta:
        raise ValueError(
            "ivfpq_index_refresh: codes table carries no "
            "idx_src_version watermark — build/append with "
            "src_version= to enable incremental refresh"
        )
    last = int(meta["idx_src_version"])
    corpus = TxLogTable(corpus_root)
    head = corpus.latest_version() if to_version is None else to_version
    if head <= last:
        return None
    feed = corpus.change_feed(
        spark,
        keys=[id_col],
        from_version=last + 1,
        to_version=head,
        normalize_updates=True,
    ).persist()
    try:
        # count-first strategy pick — no driver collect before the
        # rebuild decision (round 12, see decide_refresh_wave)
        strategy, touched = decide_refresh_wave(
            feed,
            id_col,
            max_touched_ids=max_touched_ids,
            rebuild_fraction=rebuild_fraction,
            base_count=codes_t.row_count(),
        )
        if strategy == "noop":
            return codes_t.append(
                codes_t.read(spark).limit(0),
                spark,
                extra={"idx_src_version": head},
            )
        cents, codebook, dsub = _pq_index_parts(spark, path)
        # REBUILD fallback (round 11, same law as the text/IVF twins):
        # an oversized spread-out wave re-encodes ALL live vectors
        # against the FROZEN centroids+codebook in ONE overwrite
        # instead of paying a near-full CoW rewrite per chunk.
        if strategy == "rebuild":
            c_all = (
                corpus.read(spark, head)
                .select(
                    F.col(id_col).alias("neighbor_id"),
                    _as_double(F.col(vec_col)).alias("cv"),
                )
                .withColumn("cn", _norm(F.col("cv")))
                .filter(F.col("cn") > 0)
            )
            all_codes = _pq_encode(
                _assign_nearest_centroid(
                    c_all, cents, backend=encode_backend
                ),
                codebook,
                dsub,
                backend=encode_backend,
            )
            return codes_t.overwrite(
                all_codes,
                extra={"idx_src_version": head, "idx_rebuild": True},
            )
        w = Window.partitionBy(id_col)
        final_live = (
            feed.withColumn("__mv", F.max("_commit_version").over(w))
            .filter(
                (F.col("_commit_version") == F.col("__mv"))
                & (F.col("op") == "I")
            )
            .select(id_col, vec_col)
        )
        c = (
            final_live.select(
                F.col(id_col).alias("neighbor_id"),
                _as_double(F.col(vec_col)).alias("cv"),
            )
            .withColumn("cn", _norm(F.col("cv")))
            .filter(F.col("cn") > 0)
        )
        assigned = _assign_nearest_centroid(
            c, cents, backend=encode_backend
        )
        codes = _pq_encode(
            assigned, codebook, dsub, backend=encode_backend
        )
        # oversized waves auto-chunk with a crash cursor, as in the
        # IVF and text twins (round 11)
        chunks, start = plan_refresh_wave(
            meta, last, head, touched, max_touched_ids
        )
        v = None
        for i in range(start, len(chunks)):
            chunk = chunks[i]
            extra = (
                {"idx_src_version": head}
                if i == len(chunks) - 1
                else {
                    "idx_src_version": last,
                    "idx_wave": {
                        "from": last, "to": head, "done_upto": chunk[-1]
                    },
                }
            )
            v = codes_t.replace_where(
                spark,
                codes.filter(F.col("neighbor_id").isin(chunk)),
                sql_in_condition("neighbor_id", chunk),
                extra=extra,
            )
        return v
    finally:
        feed.unpersist()


def ivfpq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 8,
    query_id_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Query an at-rest IVF-PQ index: same probe routing and pure-ADC
    scoring as :func:`ivfpq_cosine_topk` (pytest pins row-for-row
    equality to the inline build), over the persisted codes table read
    through cluster partition pruning — the probed fraction of a
    100 TB index is the only I/O, and each candidate costs m ints, not
    dim doubles."""
    from ..sources.txlog import TxLogTable

    qid = query_id_col or id_col
    cents, codebook, _dsub = _pq_index_parts(spark, path)
    q = queries.select(
        F.col(qid).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv"))).filter(F.col("qn") > 0)

    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "sim", _dot(F.col("qv"), F.col("ce")) / (F.col("qn") * F.col("ce_n"))
        )
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "qn", F.col("centroid_id").alias("cluster"))
    )
    from ..materialize import materialize as _pin

    probes = _pin(probes, name="ivfpq_index_probes")
    clusters = [r["cluster"] for r in probes.select("cluster").distinct().collect()]
    codes = TxLogTable(os.path.join(path, "codes")).read(
        spark, prune={"cluster": clusters}
    )
    index = codes.filter(F.col("cluster").isin(clusters))
    return _pq_adc_topk(index, probes, codebook, k, exclude_self=exclude_self)


# ---------------------------------------------------------------------------
# IVF-PQ — product-quantized inverted file (the memory-bounded ANN path)
# ---------------------------------------------------------------------------


def _pq_lit_vec(vals: list[float]):
    return F.array(*[F.lit(float(x)) for x in vals])


def _pq_encode(
    assigned: DataFrame,
    codebook: list[list[list[float]]],
    dsub: int,
    backend: str = "numpy",
) -> DataFrame:
    """(neighbor_id, cluster, codes) from an assigned corpus frame —
    the PQ encode stage shared by the inline query path and the
    at-rest index build. Per subspace, argmin ||x_j − c||² expanded as
    x·x − 2·x·c + c·c; first strictly-smaller wins = lowest code id on
    ties.

    ``backend="numpy"`` (production): per-batch BLAS argmin — same
    caveat as :func:`_assign_nearest_centroid`'s numpy backend (BLAS
    reassociates sums; a code can flip only on two codewords within
    ~1 ulp, property-pinned equal on the test corpus).
    ``backend="exact"``: the three dot folds as literal Column
    expressions the SQL oracle replays verbatim."""
    m_subspaces = len(codebook)
    if backend == "numpy":
        import numpy as np
        from pyspark.sql.types import ArrayType, IntegerType, StructType

        cb_mats = [
            np.array(codebook[j], dtype=np.float64) for j in range(m_subspaces)
        ]
        idx_schema = StructType(
            [
                assigned.schema["neighbor_id"],
                assigned.schema["cluster"],
            ]
        ).add("codes", ArrayType(IntegerType()))

        def encode(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                emb = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["cv"]]
                )
                codes = np.empty((len(pdf), m_subspaces), dtype=np.int32)
                for j in range(m_subspaces):
                    xj = emb[:, j * dsub : (j + 1) * dsub]
                    d2 = (
                        (xj * xj).sum(axis=1)[:, None]
                        - 2.0 * (xj @ cb_mats[j].T)
                        + (cb_mats[j] * cb_mats[j]).sum(axis=1)[None, :]
                    )
                    codes[:, j] = d2.argmin(axis=1)  # first min = lowest id
                out = pdf[["neighbor_id", "cluster"]].copy()
                out["codes"] = list(codes)
                yield out

        return assigned.mapInPandas(encode, schema=idx_schema)

    def _argmin_code(j: int):
        xj = F.slice(F.col("cv"), j * dsub + 1, dsub)
        xx = _dot(xj, xj)
        d2s = F.array(
            *[
                xx
                - F.lit(2.0) * _dot(xj, _pq_lit_vec(cw))
                + _dot(_pq_lit_vec(cw), _pq_lit_vec(cw))
                for cw in codebook[j]
            ]
        )
        best = F.aggregate(
            F.sequence(F.lit(0), F.lit(len(codebook[j]) - 1)),
            F.struct(F.lit(float("inf")).alias("d"), F.lit(-1).alias("i")),
            lambda acc, i: F.when(
                F.element_at(d2s, i + 1) < acc["d"],
                F.struct(F.element_at(d2s, i + 1).alias("d"), i.alias("i")),
            ).otherwise(acc),
        )
        return best["i"].alias(f"__c{j}")

    return assigned.select(
        "neighbor_id",
        "cluster",
        F.array(*[_argmin_code(j) for j in range(m_subspaces)]).alias("codes"),
        # at rest ONLY (neighbor_id, cluster, codes) persists — cv/cn
        # are consumed by the encode expressions above and dropped
    )


def _pq_adc_topk(
    index: DataFrame,
    probes: DataFrame,
    codebook: list[list[list[float]]],
    k: int,
    exclude_self: bool = True,
) -> DataFrame:
    """Pure-ADC ranking from a PQ codes frame: reconstruct candidates
    from the literal codebook (``element_at``, never a join), exact
    rounded cosine against the reconstruction, top-k per query — the
    scoring tail shared by the inline path and the at-rest index."""
    m_subspaces = len(codebook)
    cb_lits = [
        F.array(*[_pq_lit_vec(cw) for cw in codebook[j]])
        for j in range(m_subspaces)
    ]
    recon = F.flatten(
        F.array(
            *[
                F.element_at(cb_lits[j], F.col("codes")[j] + 1)
                for j in range(m_subspaces)
            ]
        )
    )
    cand = index.join(F.broadcast(probes), "cluster")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    adc = cand.withColumn("__rv", recon).select(
        "query_id",
        "neighbor_id",
        F.round(
            _dot(F.col("__rv"), F.col("qv"))
            / (_norm(F.col("__rv")) * F.col("qn")),
            6,
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return adc.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _pq_train_lloyd(
    c: DataFrame, codebook: list[list[list[float]]], dsub: int, iters: int
) -> list[list[list[float]]]:
    """k-means refinement of PQ codebooks (see ivfpq_cosine_topk).
    One Arrow pass per round trains EVERY subspace: each partition
    emits (subspace, code, partial sum vector, count); the driver sums
    partials in sorted (subspace, code, partition) order and rounds the
    means to 9 decimals, so the updated codewords are deterministic
    literals for the encode/ADC expressions. Codes are argmin by
    ``x·x − 2·x·c + c·c`` with lowest-code ties — identical to the
    encode path, so training and encoding never disagree about
    assignment."""
    import numpy as np
    import pandas as pd

    m = len(codebook)

    for _ in range(iters):
        cb_mats = [np.array(codebook[j], dtype=np.float64) for j in range(m)]

        def partials(batches, _mats=cb_mats):
            sums: dict = {}
            for pdf in batches:
                if not len(pdf):
                    continue
                emb = np.stack(
                    [np.asarray(v, dtype=np.float64) for v in pdf["cv"]]
                )
                for j, mat in enumerate(_mats):
                    xj = emb[:, j * dsub : (j + 1) * dsub]
                    d2 = (
                        (xj * xj).sum(axis=1)[:, None]
                        - 2.0 * (xj @ mat.T)
                        + (mat * mat).sum(axis=1)[None, :]
                    )
                    codes = d2.argmin(axis=1)
                    for code in np.unique(codes):
                        mask = codes == code
                        key = (j, int(code))
                        s, n = sums.get(key, (np.zeros(dsub), 0))
                        sums[key] = (s + xj[mask].sum(axis=0), n + int(mask.sum()))
            yield pd.DataFrame(
                {
                    "j": [k[0] for k in sums],
                    "code": [k[1] for k in sums],
                    "s": [list(v[0]) for v in sums.values()],
                    "cnt": [v[1] for v in sums.values()],
                }
            )

        rows = c.select("cv").mapInPandas(
            partials, schema="j int, code int, s array<double>, cnt long"
        ).collect()
        acc: dict = {}
        # fully-keyed sort (incl. the partials themselves) -> the fold
        # order, hence the trained floats, are independent of task
        # completion order and of which partition emitted which partial
        for r in sorted(
            rows, key=lambda r: (r["j"], r["code"], r["cnt"], tuple(r["s"]))
        ):
            key = (r["j"], r["code"])
            import numpy as _np

            s, n = acc.get(key, (_np.zeros(dsub), 0))
            acc[key] = (s + _np.asarray(r["s"], dtype=_np.float64), n + r["cnt"])
        new_cb = [[list(cw) for cw in codebook[j]] for j in range(m)]
        for (j, code), (s, n) in acc.items():
            if n > 0:
                new_cb[j][code] = [round(float(x), 9) for x in (s / n)]
        codebook = new_cb
    return codebook


def ivfpq_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 32,
    n_probe: int = 8,
    m_subspaces: int = 4,
    n_codes: int = 16,
    rerank: int = 0,
    encode_backend: str = "numpy",
    pq_lloyd_iters: int = 0,
    query_id_col: str | None = None,
    exclude_self: bool = True,
) -> DataFrame:
    """Approximate top-k via IVF + product quantization (Jégou, Douze,
    Schmid 2011 — the FAISS ``IVFPQ`` shape, the standard way to fit a
    billion-vector index in memory).

    Why this exists next to :func:`ivf_cosine_topk`: IVF bounds the
    SCAN (n_probe/n_centroids of the corpus per query) but every probed
    candidate still carries its full ``dim`` doubles through the join.
    PQ bounds the BYTES: the at-rest index row is
    (id, cluster, codes array of ``m_subspaces`` small ints) — at
    dim=64/m=4 that is 4 bytes of code versus 512 bytes of vector, the
    ~100× compression that makes a 100 TB embedding corpus probeable
    from executor memory. Candidates are scored WITHOUT their original
    vectors: the code array reconstructs an approximation from the
    broadcast codebook and the score is the exact rounded
    cosine(query, reconstruction).

    Deterministic, cross-engine-replayable construction (no RNG, same
    discipline as the IVF index):

    - coarse quantizer: the ``n_centroids`` portable-hash-lowest corpus
      rows, nearest-centroid assignment with lowest-id tie-break —
      identical to :func:`ivf_cosine_topk` (lloyd refinement
      deliberately omitted here: the oracle-replayable lloyd=0 config
      is this function's contract; compose with the IVF machinery for
      refined coarse centroids);
    - codebooks: subspace j's codewords are the j-th subvector slices
      of the ``n_codes`` hash-lowest rows (a deterministic sample, the
      same seeding idea as the coarse centroids);
    - encode: per subspace, L2-argmin over the literal codebook via
      ``x·x − 2·x·c + c·c`` (three left-to-right dot folds — the form
      both engines reproduce bit-for-bit), ties to the lowest code id;
    - ADC scoring: reconstruction = concat of the coded codewords
      (``element_at`` into the broadcast literal codebook, never a
      join), cosine = dot(q, x̃)/(|q|·|x̃|) rounded to 6 dp.

    ``rerank > 0`` re-scores each query's top-``rerank`` ADC candidates
    with their TRUE vectors (one broadcast join of the candidate ids
    back onto the corpus) — the standard two-stage recipe that buys
    back the quantization error for pennies; the output ``cosine`` is
    then exact. Left at 0 the output is the pure-ADC ranking the SQL
    oracle replays end-to-end.

    ``encode_backend="numpy"`` (the DEFAULT — this is the production
    index-build path): the coarse assignment AND the per-subspace code
    argmin run as Arrow-batched BLAS instead of interpreted
    higher-order folds (the CodegenFallback cost the r5 lesson
    documented; measured 56× at ×100 — BASELINE.md r7/r8) — same
    tie-breaks, property-pinned equal. ``"exact"`` is the
    SQL-replayable path, reserved for oracle replay: identical output,
    built from the literal fold expressions DuckDB re-runs verbatim.

    ``pq_lloyd_iters > 0`` k-means-trains the codebooks (how FAISS
    trains its quantizer): each round is ONE Arrow pass over the
    corpus emitting per-partition (subspace, code) partial sums —
    every subspace trains in the same pass — then a driver-side
    mean update rounded to 9 decimals (the semantic-dedup replay
    discipline) so the trained codewords are plain literals again;
    empty codes keep their previous codeword. Total quantization
    error is monotonically non-increasing in iterations (the standard
    Lloyd argument, pytest-pinned on the planted corpus). The oracle
    config stays ``pq_lloyd_iters=0`` — sampled codebooks replay in
    SQL; trained ones would need the oracle to re-run k-means.
    """
    from .dedupe import portable_hash60

    if rerank < 0:
        raise ValueError(f"ivfpq_cosine_topk: rerank must be >= 0, got {rerank}")
    if encode_backend not in ("exact", "numpy"):
        raise ValueError(
            f"ivfpq_cosine_topk: encode_backend must be exact|numpy, got {encode_backend!r}"
        )
    qid = query_id_col or id_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    q = queries.select(
        F.col(qid).alias("query_id"), _as_double(F.col(vec_col)).alias("qv")
    ).withColumn("qn", _norm(F.col("qv"))).filter(F.col("qn") > 0)

    dim = len(corpus.select(vec_col).first()[0])
    if dim % m_subspaces != 0:
        raise ValueError(
            f"ivfpq_cosine_topk: dim {dim} not divisible by m={m_subspaces}"
        )
    dsub = dim // m_subspaces

    hashed = c.withColumn(
        "__h", portable_hash60(F.col("neighbor_id").cast("string"))
    )
    cents = (
        hashed.orderBy("__h")
        .limit(n_centroids)
        .select(
            F.col("neighbor_id").alias("centroid_id"),
            F.col("cv").alias("ce"),
            F.col("cn").alias("ce_n"),
        )
    )
    # codebooks: n_codes hash-lowest rows, sliced per subspace
    cb_rows = sorted(
        hashed.orderBy("__h").limit(n_codes).select("neighbor_id", "cv").collect(),
        key=lambda r: r["neighbor_id"],
    )
    if len(cb_rows) < 2:
        raise ValueError("ivfpq_cosine_topk: corpus too small for a codebook")
    # codebook[j][i] = list of dsub floats (codeword i of subspace j),
    # ordered by the sampled rows' ids so code assignment is stable
    codebook = [
        [list(r["cv"])[j * dsub : (j + 1) * dsub] for r in cb_rows]
        for j in range(m_subspaces)
    ]

    def _lit_vec(vals: list[float]):
        return F.array(*[F.lit(float(x)) for x in vals])

    if pq_lloyd_iters > 0:
        codebook = _pq_train_lloyd(c, codebook, dsub, pq_lloyd_iters)

    # encode: per subspace, argmin ||x_j - c||^2 = x·x - 2 x·c + c·c
    # (three dot folds, replayed verbatim by the oracle), first
    # strictly-smaller wins = lowest code id on ties
    assigned = _assign_nearest_centroid(c, cents, backend=encode_backend)
    index = _pq_encode(assigned, codebook, dsub, backend=encode_backend)

    w_probe = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("centroid_id")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "sim", _dot(F.col("qv"), F.col("ce")) / (F.col("qn") * F.col("ce_n"))
        )
        .withColumn("__rn", F.row_number().over(w_probe))
        .filter(F.col("__rn") <= n_probe)
        .select("query_id", "qv", "qn", F.col("centroid_id").alias("cluster"))
    )

    # ADC: reconstruct from the literal codebook (element_at, no join),
    # exact rounded cosine against the reconstruction
    cb_lits = [
        F.array(*[_lit_vec(cw) for cw in codebook[j]]) for j in range(m_subspaces)
    ]
    recon = F.flatten(
        F.array(
            *[
                F.element_at(cb_lits[j], F.col("codes")[j] + 1)
                for j in range(m_subspaces)
            ]
        )
    )
    cand = index.join(F.broadcast(probes), "cluster")
    if exclude_self:
        cand = cand.filter(F.col("neighbor_id") != F.col("query_id"))
    adc = cand.withColumn("__rv", recon).select(
        "query_id",
        "neighbor_id",
        "qv",
        "qn",
        F.round(
            _dot(F.col("__rv"), F.col("qv")) / (_norm(F.col("__rv")) * F.col("qn")),
            6,
        ).alias("adc_cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_cosine").desc(), F.col("neighbor_id")
    )
    if rerank == 0:
        return (
            adc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", F.col("adc_cosine").alias("cosine"), "rank")
        )

    shortlist = adc.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= max(rerank, k)
    )
    exact = (
        c.join(
            F.broadcast(shortlist.select("query_id", "neighbor_id", "qv", "qn")),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6
            ).alias("cosine"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return exact.withColumn("rank", F.row_number().over(w2)).filter(
        F.col("rank") <= k
    )


# ---------------------------------------------------------------------------
# multi-table sign-LSH — the near-duplicate fast path
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, tables: int, bits: int, seed: int = 7) -> list[list[list[float]]]:
    rng = random.Random(seed)
    return [
        [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]
        for _ in range(tables)
    ]


def _table_sigs(vec: Column, planes: list[list[list[float]]]) -> list[Column]:
    """One signature Column per table: ``bits`` sign bits packed into a long."""
    sigs = []
    for table in planes:
        sig = None
        for i, p in enumerate(table):
            plane = F.array(*[F.lit(x) for x in p])
            bit = (_dot(vec, plane) > 0).cast("long")
            term = F.shiftleft(bit, i)
            sig = term if sig is None else sig.bitwiseXOR(term)
        sigs.append(sig)
    return sigs


def lsh_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    tables: int = 16,
    bits: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k via multi-table random-hyperplane LSH.

    A candidate is any corpus vector sharing a bucket with the query in
    at least one of ``tables`` independent tables (OR-of-ANDs, the same
    amplification as MinHash banding). For cosine s, per-table collision
    is (1 - arccos(s)/π)^bits — at s=0.95 with 8 bits that is ≈ 0.52
    per table, so 16 tables find the pair with P ≈ 1 - (0.48)^16 >
    0.999; at s=0.3 it is ≈ 0.02, so noise stays out. Effective for
    near-duplicate retrieval; for mid-cosine top-k use
    :func:`ivf_cosine_topk`.
    """
    dim = len(corpus.select(vec_col).first()[0])
    hp = _hyperplanes(dim, tables, bits, seed)

    def bucketize(df: DataFrame, id_out: str, v_out: str, n_out: str) -> DataFrame:
        base = df.select(
            F.col(id_col).alias(id_out), _as_double(F.col(vec_col)).alias(v_out)
        ).withColumn(n_out, _norm(F.col(v_out))).filter(F.col(n_out) > 0)
        sigs = _table_sigs(F.col(v_out), hp)
        tagged = F.array(
            *[
                F.struct(F.lit(t).alias("t"), s.alias("b"))
                for t, s in enumerate(sigs)
            ]
        )
        return base.withColumn("__tb", F.explode(tagged)).select(
            id_out, v_out, n_out, F.col("__tb.t").alias("t"), F.col("__tb.b").alias("b")
        )

    c = bucketize(corpus, "neighbor_id", "cv", "cn")
    q = bucketize(queries, "query_id", "qv", "qn")

    scored = (
        c.join(F.broadcast(q), ["t", "b"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6
            ).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def quantize_embeddings(
    df: DataFrame,
    vec_col: str = "embedding",
    out_col: str = "q8",
    scale_col: str = "q8_scale",
) -> DataFrame:
    """Symmetric int8 quantization of an embedding column: per-vector
    ``scale = max|v| / 127``, ``q_i = round(v_i / scale)`` — the storage
    form that shrinks an embedding table 4x (float32 -> int8 + one
    float scale), which at 100 TB is the difference between embeddings
    fitting executor page cache or not. Dot products on int8 arrays
    stay JVM-side (multiply in int, one final float multiply by the two
    scales), so ANN prefilters can run directly on the quantized form.

    Pure Column expressions; the arithmetic is IEEE-exact ops only
    (abs/max/divide/round), so a SQL oracle reproduces every quantized
    byte. All-zero or null vectors get a null scale and null q8 (no
    0/0), preserved through dequantize.

    Output schema: input columns + ``q8`` (array<tinyint>) +
    ``scale_col`` (double). Inverse: :func:`dequantize_embeddings`;
    round-trip error is bounded by scale/2 per component, property-
    tested in tests/test_operator_properties.py.
    """
    v = _as_double(F.col(vec_col))
    max_abs = F.array_max(F.transform(v, F.abs))
    scale = F.when(max_abs > 0, max_abs / F.lit(127.0))
    q = F.when(
        scale.isNotNull(),
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint")),
    )
    return df.withColumn(scale_col, scale).withColumn(out_col, q)


def dequantize_embeddings(
    df: DataFrame,
    q_col: str = "q8",
    scale_col: str = "q8_scale",
    out_col: str = "embedding_deq",
) -> DataFrame:
    """Reconstruct float vectors from int8 + scale (lossy inverse)."""
    deq = F.when(
        F.col(scale_col).isNotNull(),
        F.transform(F.col(q_col), lambda x: x.cast("double") * F.col(scale_col)),
    )
    return df.withColumn(out_col, deq)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for
    each query vector, the top-k most-similar corpus vectors with a
    DIFFERENT label — the negatives that sit closest to the decision
    boundary and therefore carry the most gradient signal.

    Same broadcast-query scoring kernel as :func:`cosine_topk` (one
    corpus pass, per-query window top-k) with the label constraint
    applied BEFORE scoring, so excluded same-label vectors cost a
    predicate, not a dot product. Output: (query_id, neighbor_id,
    cosine, rank); ties break on neighbor id.
    """
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("n_label"),
        _as_double(F.col(vec_col)).alias("cv"),
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("q_label"),
        _as_double(F.col(vec_col)).alias("qv"),
    ).withColumn("qn", _norm(F.col("qv"))).filter(F.col("qn") > 0)
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("n_label") != F.col("q_label"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn")), 6
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 32,
    threshold: float = 0.95,
    assign_backend: str = "exact",
    lloyd_iters: int = 0,
) -> DataFrame:
    """SemDeDup-style cluster-bounded semantic deduplication.

    The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
    learning at web-scale through semantic deduplication"): k-means the
    embedding space, then compare pairs ONLY within a cluster — the
    quadratic pair universe shrinks from |corpus|² to Σ|cluster|².
    This is the third pair-generation family in the dedup ladder next
    to LSH buckets (sign/band hashes) and posting lists (n-grams):
    clusters capture *mid-cosine semantic* duplicates that sign-LSH's
    near-duplicate collision regime misses.

    Deterministic construction, same as :func:`ivf_cosine_topk` so the
    DuckDB oracle replays the index bit-for-bit: centroids are the
    ``n_clusters`` corpus vectors with the lowest portable md5-60 id
    hashes (no RNG), optionally refined by ``lloyd_iters`` k-means
    rounds — the paper's actual recipe. Each round assigns (broadcast
    argmax) and recomputes per-cluster element-wise means as ``dim``
    map-side-combinable ``avg`` aggregates; the refined means are
    ROUNDED to 9 decimals so the SQL oracle can replay the refinement
    exactly (an unrounded cross-engine float mean differs in the last
    ULP and could flip a boundary assignment — same rounding discipline
    as the rank-ordering cosines). Labels stay the seed ids; empty
    clusters drop out. Assignment is the broadcast argmax pass. A row
    is flagged
    ``is_dup = 1`` iff a LOWER-id row in the same cluster has rounded
    cosine >= ``threshold`` — min-id canonical, matching every other
    dedup family's keep-first convention (the paper keeps the member
    farthest from the centroid; id order is the deterministic stand-in
    and makes the removal decision per-pair local, no transitive
    closure pass).

    Returns one row per positive-norm corpus vector:
    ``(id_col, cluster, is_dup)``.

    100 TB shape: centroid table broadcasts (n_clusters × dim floats);
    assignment is scan-local; the ONE corpus-sized shuffle is the
    cluster-keyed self-join, bounded by Σ|cluster|² pairs — choose
    n_clusters ≈ |corpus| / target_cluster_size to bound it, and with
    real n_clusters pass ``assign_backend="numpy"`` (Arrow-batched
    BLAS matmul argmax — measured 36 s → 2 s at 20k × 256; the default
    ``"exact"`` path is the slower SQL-replayable one the oracle
    checks; see :func:`_assign_nearest_centroid`). At rest the
    assignment would be written partitioned by cluster so re-runs and
    incremental waves prune to touched clusters; oversized (skewed)
    clusters are exactly what AQE skew-join splitting absorbs.
    """
    from .dedupe import portable_hash60

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(F.col(vec_col)).alias("cv")
    ).withColumn("cn", _norm(F.col("cv"))).filter(F.col("cn") > 0)
    cents = (
        c.withColumn("__h", portable_hash60(F.col("neighbor_id").cast("string")))
        .orderBy("__h")
        .limit(n_clusters)
        .select(
            F.col("neighbor_id").alias("centroid_id"),
            F.col("cv").alias("ce"),
            F.col("cn").alias("ce_n"),
        )
    )
    from ..materialize import materialize

    if lloyd_iters > 0:
        # k-means refinement, IVF's loop (see ivf_cosine_topk) with one
        # addition: means round to 9 decimals so the refinement is
        # cross-engine replayable (docstring). Centroids pin per round
        # so the next assignment doesn't recompute the previous rounds.
        dim = len(corpus.select(vec_col).first()[0])
        for _ in range(lloyd_iters):
            members = _assign_nearest_centroid(c, cents, backend=assign_backend)
            cents = (
                members.groupBy("cluster")
                .agg(*[
                    F.round(F.avg(F.col("cv")[i]), 9).alias(f"__m{i}")
                    for i in range(dim)
                ])
                .select(
                    F.col("cluster").alias("centroid_id"),
                    F.array(*[F.col(f"__m{i}") for i in range(dim)]).alias("ce"),
                )
                .withColumn("ce_n", _norm(F.col("ce")))
                .filter(F.col("ce_n") > 0)
            )
        cents = F.broadcast(materialize(cents, name="semantic_dedup_centroids"))

    # The assignment frame feeds three consumers (both self-join sides
    # and the final flag join); without a pin each re-runs the
    # |corpus|×n_clusters argmax dot products — measured 64 s -> 23 s
    # at 20k vectors × 256 centroids. At rest this IS the
    # cluster-partitioned table a deployment writes once.

    assigned = materialize(
        _assign_nearest_centroid(c, cents, backend=assign_backend),
        name="semantic_dedup_assign",
    )

    a = assigned.select(
        F.col("neighbor_id").alias("id_a"),
        F.col("cv").alias("va"),
        F.col("cn").alias("na"),
        "cluster",
    )
    b = assigned.select(
        F.col("neighbor_id").alias("id_b"),
        F.col("cv").alias("vb"),
        F.col("cn").alias("nb"),
        "cluster",
    )
    dups = (
        a.join(b, "cluster")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            F.round(_dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 6),
        )
        .filter(F.col("cos") >= threshold)
        .select(F.col("id_b").alias(id_col))
        .distinct()
        .withColumn("__d", F.lit(1))
    )
    return (
        assigned.select(F.col("neighbor_id").alias(id_col), "cluster")
        .join(dups, id_col, "left")
        .select(
            id_col,
            "cluster",
            F.coalesce(F.col("__d"), F.lit(0)).alias("is_dup"),
        )
    )
