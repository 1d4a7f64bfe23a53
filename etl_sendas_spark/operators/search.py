"""Keyword search over a document corpus: BM25 scoring with an
inverted-index plan shape.

The retrieval counterpart of the dedup/ANN ladder: given a small set of
keyword queries, rank corpus documents by Okapi BM25. At 100 TB the
corpus side is the only big input, and the plan is built so that every
corpus-sized stage is either scan-local or filtered to the query
vocabulary BEFORE its shuffle:

- document length (``dl``) is ``size(tokens)`` computed in the scan
  projection — no explode, no shuffle;
- the postings explode is immediately filtered by an ``isin`` against
  the (broadcast-sized) query vocabulary, so the one corpus-keyed
  shuffle — the ``(doc_id, token)`` term-frequency aggregate — carries
  only matching postings, not the whole corpus;
- document frequency / IDF is derived from that already-filtered tf
  frame (grouping by token is exactly the per-term document count when
  tf rows are one-per-(doc, term)), yielding a query-vocabulary-sized
  frame that broadcasts back onto the postings;
- the final per-(query, doc) score sum groups a frame bounded by
  |matched postings| x |queries sharing the term|, and the top-k is a
  per-query window over candidates that matched at least one term.

Scores are rounded to 6 decimals BEFORE ranking so the ordering (and
the DuckDB oracle's) cannot diverge on last-ULP float noise from the
different summation orders / libm implementations.

Tokenization is the corpus-wide canonical form shared with every dedup
flavor (``functions.text.normalized_text``), so search and dedup agree
on what a token is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import normalized_text


def _tokens(col) -> F.Column:
    return F.filter(F.split(normalized_text(col), " "), lambda t: t != "")


# Above this many distinct query terms the postings filter routes through
# a broadcast semi-join instead of an inlined isin literal (a 100k-term
# literal makes plan compilation/serialization the bottleneck; the
# broadcast join costs one tiny exchange and keeps the plan O(1)).
_VOCAB_ISIN_MAX = 2048


def bm25_topk(
    docs: DataFrame,
    queries: list[tuple[int, str]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents per keyword query under Okapi BM25.

    ``queries`` is a small driver-side list of ``(query_id, text)`` —
    the broadcast side by construction (a query workload is KBs, the
    corpus is the 100 TB side). Duplicate terms within one query count
    once (standard binary query-term weighting).

    Returns ``(query_id, doc_id, score)`` with ``score`` rounded to 6
    decimals and ``rank <= k`` per query (ties broken by ``doc_id``).
    """
    if not queries:
        raise ValueError("bm25_topk: empty query list")
    spark = docs.sparkSession
    qdf = spark.createDataFrame(queries, schema="query_id INT, qtext STRING")
    qterms = qdf.select(
        "query_id", F.explode(_tokens(F.col("qtext"))).alias("token")
    ).distinct()
    # The query vocabulary bounds the postings BEFORE the one corpus
    # shuffle. Two routes, same semantics: a small vocabulary inlines as
    # a plan-time isin literal (runs inside the scan stage, no join
    # before the tf agg); a large one (10k+ terms — batch retrieval
    # workloads) would bloat the compiled plan as a literal, so it
    # routes through a broadcast LEFT SEMI join against the distinct
    # query tokens instead — still map-side, still pre-shuffle.
    vocab = sorted({t for _, q in queries for t in _py_tokens(q)})

    base = docs.select(
        F.col(id_col).alias("doc_id"), _tokens(F.col(text_col)).alias("toks")
    ).withColumn("dl", F.size("toks"))
    stats = base.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )

    # dl rides THROUGH the explode and the tf aggregate (constant per
    # doc, folded with max) instead of joining a corpus-sized dl frame
    # back on doc_id afterwards — measured 30.6 s -> 26.6 s at x100
    # (5 M docs) by deleting that second corpus-keyed exchange.
    post = base.select("doc_id", "dl", F.explode("toks").alias("token"))
    if len(vocab) <= _VOCAB_ISIN_MAX:
        post = post.filter(F.col("token").isin(vocab))
    else:
        post = post.join(
            F.broadcast(qterms.select("token").distinct()), "token", "left_semi"
        )
    tf = post.groupBy("doc_id", "token").agg(
        F.count("*").alias("tf"), F.max("dl").alias("dl")
    )
    # tf has one row per (doc, term) => per-token row count IS the
    # document frequency; both frames are query-vocabulary-bounded.
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))

    idf = F.log(
        (F.col("n_docs") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(qterms), "token")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", "score")
    )


def _py_tokens(text: str) -> list[str]:
    """Driver-side mirror of the canonical tokenizer for the tiny query
    strings (same lowercase + non-alphanumeric split)."""
    import re

    return [t for t in re.sub(r"[^a-z0-9]+", " ", text.lower()).split() if t]


def phrase_match(
    docs: DataFrame,
    phrase_tokens: list[str],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact phrase search via a positional inverted index.

    The distributed phrase-match plan: posexplode to ``(doc, pos,
    token)`` postings, filter to the phrase's tokens (broadcast-sized
    list — the filter runs scan-side, so the one corpus-keyed shuffle
    carries only phrase-token postings), then the classic
    anchor-alignment trick: a posting for phrase offset ``j`` at
    position ``p`` votes for anchor ``p - j``, and an anchor with all
    ``len(phrase)`` distinct offsets voting is an exact occurrence.
    Repeated tokens in the phrase are handled by letting one posting
    vote once per offset at which its token appears.

    Returns ``(doc_id, first_pos, n_occurrences)`` with ``first_pos``
    1-based in token coordinates. The oracle cross-check is a genuinely
    different algorithm (per-doc array scan over candidate anchors), so
    agreement validates the index construction, not just a shared
    formula.
    """
    if not phrase_tokens:
        raise ValueError("phrase_match: empty phrase")
    spark = docs.sparkSession
    k = len(phrase_tokens)
    offsets = spark.createDataFrame(
        [(t, j) for j, t in enumerate(phrase_tokens)],
        schema="token STRING, off INT",
    )
    post = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(_tokens(F.col(text_col))).alias("pos", "token"),
    ).filter(F.col("token").isin(list(set(phrase_tokens))))
    votes = post.join(F.broadcast(offsets), "token").select(
        "doc_id", (F.col("pos") - F.col("off")).alias("anchor"), "off"
    )
    occurrences = (
        votes.filter(F.col("anchor") >= 0)
        .groupBy("doc_id", "anchor")
        .agg(F.count_distinct("off").alias("n_off"))
        .filter(F.col("n_off") == k)
    )
    return occurrences.groupBy("doc_id").agg(
        (F.min("anchor") + 1).alias("first_pos"),
        F.count("*").alias("n_occurrences"),
    )


def cooccurrence_pmi(
    docs: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 200,
    min_pair_docs: int = 5,
) -> DataFrame:
    """Pointwise mutual information over document-level token
    co-occurrence: PMI(a,b) = ln(N·df_ab / (df_a·df_b)) for token
    pairs from the top-``vocab_size`` df vocabulary that co-occur in
    at least ``min_pair_docs`` documents — the association scores that
    surface collocations/topics and feed phrase induction.

    Plan: distinct (doc, token) postings filtered to the BROADCAST
    vocabulary (tiny by construction) BEFORE the one corpus-keyed
    self-join on doc — the pair explosion is bounded at
    vocab_size²/2 per document, not doc-length², which is what makes
    doc-level co-occurrence tractable at corpus scale (unbounded
    vocabularies make the self-join quadratic in per-doc distinct
    tokens). Pair counting is map-side combinable; df counts ride the
    same postings frame. Ties and float order: PMI computes from
    exact integer counts, rounded at the end.

    Returns ``(tok_a, tok_b, pair_docs, pmi)`` with ``tok_a < tok_b``.
    """
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc"), _tokens(F.col(text_col)).alias("toks")
    )
    n_docs_df = base.agg(F.count("*").alias("n_docs"))
    post = base.select(
        "doc", F.explode(F.array_distinct("toks")).alias("token")
    )
    dfreq = post.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    vocab = (
        dfreq.orderBy(F.col("df").desc(), F.col("token"))
        .limit(vocab_size)
    )
    vp = post.join(F.broadcast(vocab), "token")
    a = vp.select(
        "doc", F.col("token").alias("tok_a"), F.col("df").alias("df_a")
    )
    b = vp.select(
        "doc", F.col("token").alias("tok_b"), F.col("df").alias("df_b")
    )
    pairs = (
        a.join(b, "doc")
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(
            F.count(F.lit(1)).alias("pair_docs"),
            F.max("df_a").alias("df_a"),
            F.max("df_b").alias("df_b"),
        )
        .filter(F.col("pair_docs") >= min_pair_docs)
    )
    return pairs.crossJoin(F.broadcast(n_docs_df)).select(
        "tok_a",
        "tok_b",
        "pair_docs",
        F.round(
            F.log(
                F.col("n_docs").cast("double")
                * F.col("pair_docs")
                / (F.col("df_a").cast("double") * F.col("df_b"))
            ),
            6,
        ).alias("pmi"),
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    queries: list[tuple[int, str, list[float]]],
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    k_each: int = 20,
    rrf_k: int = 60,
    vec_backend: str = "exact",
    vec_path: str = "brute",
    ivf_centroids: int = 32,
    ivf_probe: int = 8,
    ivf_lloyd_iters: int = 2,
) -> DataFrame:
    """Hybrid retrieval: BM25 keyword ranking fused with dense cosine
    ranking by Reciprocal Rank Fusion (Cormack, Clarke & Büttcher 2009
    — the fusion Elasticsearch/Vespa/OpenSearch ship for "hybrid
    search"). Each ``queries`` entry carries BOTH a keyword string and
    a query vector; the fused score of a document is

        rrf = Σ_lists 1 / (rrf_k + rank_in_list)

    over the lists that retrieved it (top-``k_each`` each side, full
    outer union — a doc found by only one retriever still scores).
    Because RRF consumes RANKS, not raw scores, the two retrievers'
    incomparable score scales never mix — which is exactly why the
    fusion is also deterministic cross-engine: ranks are integers, so
    the oracle reproduces the fused ordering bit-for-bit.

    100 TB shape: the two branches are the already-scale-shaped
    :func:`bm25_topk` (query-vocabulary-bounded corpus shuffle) and a
    dense retriever selected by ``vec_path``:

    - ``"brute"`` (default): :func:`~.similarity.cosine_topk` — exact,
      one full corpus scan per query batch. The ORACLE path (the SQL
      mirror replays it term-for-term), and fine while the corpus scan
      is cheap — but it is the branch the round-5 scale audit flagged
      at ×100 (3.46× the mirror), because the scan cost is
      |corpus|×|queries| regardless of how few clusters matter.
    - ``"ivf"``: :func:`~.similarity.ivf_cosine_topk` — the sub-linear
      production path: the corpus is scored only inside the
      ``ivf_probe`` of ``ivf_centroids`` clusters nearest each query
      (scanned fraction ≈ ivf_probe/ivf_centroids), with
      ``ivf_lloyd_iters`` k-means refinement rounds (the recall
      recipe IVF ships with everywhere). RRF consumes ranks, so the
      fusion itself is unchanged; what IVF trades is dense-branch
      RECALL (measured in tests/test_corpus_ops.py), never fusion
      semantics. Self-matches are kept, same as the brute branch.

    Their outputs are query-workload-sized (|queries| × k_each rows),
    so the fusion join and final top-k window cost nothing at corpus
    scale.

    Returns ``(query_id, doc_id, rrf, rank)``, top-``k`` per query,
    rrf rounded to 6, ties broken by doc_id.
    """
    from .similarity import cosine_topk, ivf_cosine_topk

    if not queries:
        raise ValueError("hybrid_rrf_topk: empty query list")
    if vec_path not in ("brute", "ivf"):
        raise ValueError(f"hybrid_rrf_topk: unknown vec_path={vec_path!r}")
    spark = docs.sparkSession

    bm = bm25_topk(
        docs,
        [(qid, text) for qid, text, _ in queries],
        text_col=text_col,
        id_col=id_col,
        k=k_each,
    )
    w_b = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    bm = bm.withColumn("rank_b", F.row_number().over(w_b)).select(
        "query_id", "doc_id", "rank_b"
    )

    qvecs = spark.createDataFrame(
        [(qid, [float(x) for x in vec]) for qid, _, vec in queries],
        schema=f"query_id INT, {vec_col} ARRAY<DOUBLE>",
    )
    if vec_path == "ivf":
        vec = ivf_cosine_topk(
            embeddings,
            qvecs,
            id_col=vec_id_col,
            vec_col=vec_col,
            k=k_each,
            n_centroids=ivf_centroids,
            n_probe=ivf_probe,
            lloyd_iters=ivf_lloyd_iters,
            assign_backend=vec_backend,
            query_id_col="query_id",
            exclude_self=False,
        )
    else:
        vec = cosine_topk(
            embeddings,
            qvecs,
            id_col=vec_id_col,
            vec_col=vec_col,
            k=k_each,
            query_id_col="query_id",
            exclude_self=False,
            backend=vec_backend,
        )
    vec = vec.select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("rank_v")
    )

    fused = (
        bm.join(vec, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.round(
                F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_b")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(rrf_k) + F.col("rank_v")), F.lit(0.0)),
                6,
            ).alias("rrf"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return fused.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --------------------------------------------------------------------------
# At-rest inverted index (build once / query many) — the keyword-search
# sibling of the at-rest ANN index in operators/similarity.py
# --------------------------------------------------------------------------

def _bucket_of(token_col: F.Column, buckets: int) -> F.Column:
    """Term → bucket via the engine-portable md5-60 family, so the
    bucket routing replays in SQL, in driver-side Python
    (:func:`_py_bucket`), and across engines."""
    from .dedupe import portable_hash60

    return (portable_hash60(token_col) % F.lit(buckets)).cast("int")


def _py_bucket(token: str, buckets: int) -> int:
    import hashlib

    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16) % buckets


def _postings(docs, text_col: str, id_col: str, buckets: int):
    """(bucket, token, doc_id, tf, dl) — one row per (doc, term), dl
    riding through the explode exactly as in :func:`bm25_topk`."""
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        _tokens(F.col(text_col)).alias("toks"),
    ).withColumn("dl", F.size("toks"))
    # The no-op filter() wrapper keeps InferFiltersFromGenerate from
    # inferring size(toks) > 0 on the attribute — predicate pushdown
    # would substitute the whole tokenize expression into that filter
    # and re-tokenize every row a second time (the round-10 DSIR
    # finding, operators/dsir._gram_rows; measured 1.7x here).
    post = (
        base.select(
            "doc_id",
            "dl",
            F.explode(
                F.filter(F.col("toks"), lambda t: F.lit(True))
            ).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"), F.max("dl").alias("dl"))
        .withColumn("bucket", _bucket_of(F.col("token"), buckets))
        .select("bucket", "token", "doc_id", "tf", "dl")
    )
    stats = base.agg(
        F.count("*").alias("n"), F.sum("dl").alias("s")
    ).collect()[0]
    return post, int(stats["n"]), int(stats["s"] or 0)


def text_index_build(
    docs,
    root: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 16,
    src_version: int | None = None,
):
    """Build the at-rest inverted index: postings as a txlog table
    hive-PARTITIONED by term bucket (md5-60(token) mod ``buckets``),
    so a query's scan prunes to the partitions its terms hash into —
    :func:`text_index_topk` reads only those partitions' FILES
    (inputFiles-pinned in tests), never the corpus and never the rest
    of the index.  Corpus statistics (n_docs, Σdl) ride the commit
    metadata CUMULATIVELY — the reader takes the latest commit's
    numbers, so stats survive VACUUM log truncation and appends never
    rescan anything.

    The build is ONE corpus-tokenizing shuffle (the same (doc, term)
    aggregate the inline :func:`bm25_topk` pays PER QUERY BATCH) —
    build once, amortize over every query thereafter.  The index is
    maintained by :func:`text_index_append` only; DML/overwrite on the
    postings table would desync the metadata stats (same frozen-state
    contract as the ANN index's centroids)."""
    from ..sources.txlog import TxLogTable

    post, n_docs, sum_dl = _postings(docs, text_col, id_col, buckets)
    extra = {
        "idx_n_docs": n_docs,
        "idx_sum_dl": sum_dl,
        "idx_buckets": buckets,
    }
    if src_version is not None:
        # the indexed corpus's txlog version — the change-feed
        # watermark :func:`text_index_refresh` advances
        extra["idx_src_version"] = int(src_version)
    # Measured negative (round 11, kept for the record): a per-file
    # doc_id Bloom index here looked like it would spare the refresh's
    # replace_where discovery scan, but every postings file holds
    # ~10^4-10^5 DISTINCT doc ids, so at 500k docs the harvest DOUBLED
    # the build (50.7 s -> 102.3 s), the rebuild wave paid the same
    # re-harvest (47.5 s -> 111.4 s), and even the 1-id wave got
    # SLOWER (14.7 s -> 41.2 s: driver-side sidecar resolution beat
    # the scan it avoided). Blooms pay off for point probes over
    # many-file tables with narrow per-file key sets — not for a
    # wholesale-rewritten postings table.
    return TxLogTable.create(
        root,
        post.repartition("bucket"),
        partition_by=["bucket"],
        extra=extra,
    )


def text_index_append(
    docs,
    root: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    src_version: int | None = None,
) -> int:
    """Add NEW documents to an existing index: tokenizes only the new
    docs, appends their postings into the same bucket partitions, and
    advances the cumulative stats in the commit metadata — the indexed
    corpus is never rescanned (the append law
    build(A)+append(B) ≡ build(A∪B) is pinned in tests).  Doc ids must
    be new; re-adding an id double-counts its postings (an index, not
    an upsert table)."""
    from ..sources.txlog import TxLogTable

    t = TxLogTable(root)
    meta = t.commit_meta(t.latest_version())
    buckets = int(meta["idx_buckets"])
    post, n_docs, sum_dl = _postings(docs, text_col, id_col, buckets)
    extra = {
        "idx_n_docs": int(meta["idx_n_docs"]) + n_docs,
        "idx_sum_dl": int(meta["idx_sum_dl"]) + sum_dl,
        "idx_buckets": buckets,
    }
    if src_version is not None:
        extra["idx_src_version"] = int(src_version)
    elif "idx_src_version" in meta:
        extra["idx_src_version"] = int(meta["idx_src_version"])
    return t.append(
        post.repartition("bucket"),
        docs.sparkSession,
        extra=extra,
    )


def text_index_refresh(
    spark,
    root: str,
    corpus_root: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    to_version: int | None = None,
    max_touched_ids: int = 10_000,
    rebuild_fraction: float = 0.05,
) -> int | None:
    """Maintain the at-rest index under CORPUS DML (the round-9
    verdict's stale-postings gap): consume the corpus txlog table's
    change feed from the index's ``idx_src_version`` watermark to
    ``to_version`` (head when None) and land the whole sync as ONE
    atomic ``replace_where`` commit on the postings table — delete
    the touched docs' old postings, insert the final live images'
    postings, advance the cumulative stats AND the watermark in the
    same commit metadata.  After a refresh, :func:`text_index_topk`
    is row-for-row the fresh build of the corpus head (the law the
    tests pin).  Returns the postings table's new version, or None
    when already synced.

    Everything is FEED-SIZED — the corpus is never rescanned:

    - the touched-id set and each doc's FINAL live image come from
      the normalized feed itself (per id, the newest commit's rows;
      an I row there means live-with-that-image — updates normalize
      to D+I at the same version, so I wins; a bare D means deleted);
    - the stats delta telescopes over the signed feed
      (I → +1/+dl, D → −1/−dl of the pre-image), exactly matching
      :func:`_postings`'s accounting (docs with NULL text excluded,
      zero-token docs count with dl = 0);
    - the replace condition is a bounded ``doc_id IN (...)`` literal —
      ``max_touched_ids`` caps each commit's literal; a wave touching
      more ids than that AUTO-CHUNKS into id-sorted bounded
      ``replace_where`` commits (round 11). Only the last chunk
      advances the watermark; earlier chunks carry an ``idx_wave``
      cursor, so a crash mid-wave redelivers idempotently and the
      re-run skips committed slices. Queries between chunks see a
      mixed-but-self-consistent index (each id fully old or fully
      new); the fresh-build law holds once the watermark reaches
      ``to_version``.

    Requires the index to carry the watermark — build/append with
    ``src_version=`` (indexes built from bare DataFrames have no
    corpus version to sync from; loud error, not a guess)."""
    from pyspark.sql import Window

    from ..sources.txlog import (
        TxLogTable,
        decide_refresh_wave,
        plan_refresh_wave,
        sql_in_condition,
    )

    t = TxLogTable(root)
    meta = t.commit_meta(t.latest_version())
    if "idx_src_version" not in meta:
        raise ValueError(
            "text_index_refresh: index carries no idx_src_version "
            "watermark — build/append with src_version= to enable "
            "incremental refresh"
        )
    last = int(meta["idx_src_version"])
    corpus = TxLogTable(corpus_root)
    head = corpus.latest_version() if to_version is None else to_version
    if head <= last:
        return None
    buckets = int(meta["idx_buckets"])
    feed = corpus.change_feed(
        spark,
        keys=[id_col],
        from_version=last + 1,
        to_version=head,
        normalize_updates=True,
    ).persist()
    try:
        # Decide BEFORE any driver materialization (round 12 — the
        # r11 verdict's scale-killer: collecting 100M touched ids on
        # the way to the very fallback built for oversized waves).
        # One cluster-side distinct count picks the strategy; the id
        # list is collected only when the chunked path will use it.
        strategy, touched = decide_refresh_wave(
            feed,
            id_col,
            max_touched_ids=max_touched_ids,
            rebuild_fraction=rebuild_fraction,
            base_count=int(meta["idx_n_docs"]),
        )
        if strategy == "noop":
            # metadata-only commits: advance the watermark alone
            return t.append(
                t.read(spark).limit(0),
                spark,
                extra={
                    "idx_n_docs": int(meta["idx_n_docs"]),
                    "idx_sum_dl": int(meta["idx_sum_dl"]),
                    "idx_buckets": buckets,
                    "idx_src_version": head,
                },
            )
        # REBUILD fallback (round 11, measured): chunked refresh pays
        # one replace_where DISCOVERY + CoW rewrite per chunk, and
        # when the touched ids are spread uniformly over the id space
        # (every posting file holds ids from the whole range) each
        # chunk rewrites nearly the ENTIRE postings table — a 23%-of-
        # corpus wave at 500k docs read 209 s chunked vs 42.8 s for a
        # full rebuild (×100 attribution run, BASELINE.md r11). When
        # the wave both exceeds the per-commit id cap AND touches at
        # least ``rebuild_fraction`` of the indexed corpus, re-derive
        # the postings from the corpus head snapshot in ONE overwrite
        # commit instead: same end state, same watermark law, cost
        # bounded by one build. A stale idx_wave cursor from a
        # crashed chunk wave is superseded by the overwrite.
        if strategy == "rebuild":
            post, n_docs, sum_dl = _postings(
                corpus.read(spark, head), text_col, id_col, buckets
            )
            return t.overwrite(
                post.repartition("bucket"),
                extra={
                    "idx_n_docs": n_docs,
                    "idx_sum_dl": sum_dl,
                    "idx_buckets": buckets,
                    "idx_src_version": head,
                    "idx_rebuild": True,
                },
            )
        # stats delta: signed telescope over the feed. Computed ONCE
        # over the whole wave — the chunked path's non-final commits
        # carry the PRE-wave stats unchanged, so a crash-resume
        # recomputes the identical absolute targets (idempotent).
        sgn = F.when(F.col("op") == "I", F.lit(1)).otherwise(F.lit(-1))
        srow = (
            feed.filter(F.col(text_col).isNotNull())
            .select(
                sgn.alias("s"),
                F.size(_tokens(F.col(text_col))).alias("dl"),
            )
            .agg(
                F.sum("s").alias("dn"),
                F.sum(F.col("s") * F.col("dl")).alias("ddl"),
            )
            .collect()[0]
        )
        dn, ddl = int(srow["dn"] or 0), int(srow["ddl"] or 0)
        # final live image per touched id: newest commit's rows; an I
        # row there wins (update = D+I at the same version)
        w = Window.partitionBy(id_col)
        final_live = (
            feed.withColumn(
                "__mv", F.max("_commit_version").over(w)
            )
            .filter(
                (F.col("_commit_version") == F.col("__mv"))
                & (F.col("op") == "I")
            )
            .select(id_col, text_col)
        )
        # A wave above max_touched_ids auto-chunks into bounded
        # replace_where commits (round 11 — the r10 "raise and tell
        # the user to chunk" gap): only the LAST chunk advances the
        # watermark; earlier chunks carry an idx_wave cursor so a
        # crash mid-wave resumes without re-doing committed slices.
        chunks, start = plan_refresh_wave(
            meta, last, head, touched, max_touched_ids
        )
        base_n = int(meta["idx_n_docs"])
        base_dl = int(meta["idx_sum_dl"])
        v = None
        for i in range(start, len(chunks)):
            chunk = chunks[i]
            chunk_live = final_live.filter(F.col(id_col).isin(chunk))
            new_post, _, _ = _postings(
                chunk_live, text_col, id_col, buckets
            )
            if i == len(chunks) - 1:
                extra = {
                    "idx_n_docs": base_n + dn,
                    "idx_sum_dl": base_dl + ddl,
                    "idx_buckets": buckets,
                    "idx_src_version": head,
                }
            else:
                extra = {
                    "idx_n_docs": base_n,
                    "idx_sum_dl": base_dl,
                    "idx_buckets": buckets,
                    "idx_src_version": last,
                    "idx_wave": {
                        "from": last, "to": head, "done_upto": chunk[-1]
                    },
                }
            v = t.replace_where(
                spark,
                new_post.repartition("bucket"),
                sql_in_condition("doc_id", chunk),
                extra=extra,
            )
        return v
    finally:
        feed.unpersist()


def text_index_topk(
    spark,
    root: str,
    queries: list[tuple[int, str]],
    *,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
):
    """Top-k BM25 per keyword query against the AT-REST index — reads
    ONLY the partitions the query terms' buckets name (manifest-level
    partition prune via ``read(prune=...)``), then runs the identical
    scoring algebra to :func:`bm25_topk`: tf comes straight from the
    stored postings, document frequency derives from the (pruned,
    vocabulary-filtered) postings themselves, and n_docs/avgdl come
    from the latest commit's metadata — zero corpus access, zero
    full-index scan.  Row-for-row equal to the inline operator on the
    same corpus (the equality law the tests pin), because every term
    of the formula is computed from the same integers.

    Scanned fraction ≈ |query term buckets| / buckets — at 100 TB with
    thousands of buckets a 3-term query touches 3 partitions' files of
    a corpus-sized index, the inverted-index promise kept at rest."""
    from ..sources.txlog import TxLogTable

    if not queries:
        raise ValueError("text_index_topk: empty query list")
    t = TxLogTable(root)
    meta = t.commit_meta(t.latest_version())
    buckets = int(meta["idx_buckets"])
    n_docs = int(meta["idx_n_docs"])
    avgdl = int(meta["idx_sum_dl"]) / n_docs if n_docs else 0.0

    qdf = spark.createDataFrame(queries, schema="query_id INT, qtext STRING")
    qterms = qdf.select(
        "query_id", F.explode(_tokens(F.col("qtext"))).alias("token")
    ).distinct()
    vocab = sorted({tok for _, q in queries for tok in _py_tokens(q)})
    hit_buckets = sorted({_py_bucket(tok, buckets) for tok in vocab})

    post = t.read(spark, prune={"bucket": hit_buckets})
    if len(vocab) <= _VOCAB_ISIN_MAX:
        post = post.filter(F.col("token").isin(vocab))
    else:
        post = post.join(
            F.broadcast(qterms.select("token").distinct()),
            "token",
            "left_semi",
        )
    tf = post.select("doc_id", "token", "tf", "dl")
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))

    idf = F.log(
        (F.lit(n_docs) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "token")
        .join(F.broadcast(qterms), "token")
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(idf * tf_norm), 6).alias("score"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "doc_id", "score")
    )
