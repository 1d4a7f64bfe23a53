"""Deduplication operators for corpus-scale (100 TB) pipelines.

Five flavors, cheapest-first — the standard LLM-training-data ladder:

- :func:`exact_dedup` — hash-groupBy on a content fingerprint. One
  shuffle on the hash; at 100 TB this is the map-side-combinable
  baseline every corpus pass starts with.
- :func:`ngram_jaccard_pairs` — exact n-gram (shingle) Jaccard via an
  inverted shingle index: explode → self-join on shingle → count
  intersections. Quadratic only within a shingle's posting list, so
  frequent-shingle skew is the scale risk — posting lists above
  ``max_posting`` are dropped (standard df-cut), which both bounds
  skew and removes uninformative shingles.
- :func:`minhash_signatures` / :func:`minhash_lsh_candidates` —
  MinHash + banded LSH: the sub-quadratic near-dup path. k hash
  functions → per-band bucket join; only bucket-mates ever meet.
- :func:`simhash_fingerprints` — 64-bit SimHash; near-dups differ in
  few bits; bucketing on bit-slices gives the Hamming-LSH variant.
- :func:`embedding_near_dup_pairs` — cosine-threshold pairs over an
  embedding column (semantic dedup), brute force within LSH buckets.

Everything is built-in-function DataFrame code (JVM, codegen) — no
Python in any per-row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..functions.text import normalized_text, doc_fingerprint
from ..materialize import materialize as _pin, release as _release


def _materialize_release(
    out: DataFrame, *cached: DataFrame, name: str = "dedup_pairs"
) -> DataFrame:
    """Pin the (small) result, then free the bulky cached intermediates.

    A dedup query's output (candidate/confirmed pairs) is orders of
    magnitude smaller than the shingle/posting caches that feed it.
    Pinning via :func:`..materialize.materialize` (strategy from the
    ``spark.etl_sendas.materialize`` conf: localCheckpoint locally,
    reliable checkpoint / stage parquet on a cluster) materializes the
    result and truncates its lineage, so the parents' MEMORY_AND_DISK
    storage can be released HERE instead of living until session end —
    in a shared session (the driver runs its whole query set in one
    JVM) a leaked multi-GB shingle cache taxes every later query with
    heap churn. ``unpersist`` on a never-persisted frame is a no-op, so
    callers can pass conditionally-cached frames unconditionally.
    """
    out = _pin(out, name=name)
    for df in cached:
        df.unpersist()
    return out


def _worth_caching(df: DataFrame, threshold_bytes: int = 1 << 30) -> bool:
    """Size-adaptive cache decision for within-query intermediates
    (optimization guide §5: cache only when recompute beats the memory
    pressure). Below ``threshold_bytes`` of estimated input, re-running
    the (scan-local, embarrassingly parallel) shingle pipeline per
    consumer measures FASTER than materializing array rows into storage
    — r12 interleaved A/B at sf0.1: lazy 2.12 s vs persisted 3.81 s for
    the full minhash plan. Above it (the 100 TB regime), re-scanning
    the corpus 3× loses to one cached pass. Override with
    ``spark.etl_sendas.cacheIntermediates = always | never | auto``.
    Unknown stats err on the side of caching (the scale-safe default).
    """
    mode = str(
        df.sparkSession.conf.get("spark.etl_sendas.cacheIntermediates", "auto")
    ).lower()
    if mode == "always":
        return True
    if mode == "never":
        return False
    try:
        size = int(
            str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
        )
    except Exception:
        return True
    return size > threshold_bytes


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per exact normalized-text fingerprint.

    groupBy(fingerprint) → min(id) → semi-join back. Two narrow
    shuffles (fingerprint, then id); the first combines map-side so
    the reduce sees one row per distinct document, not per row.
    """
    fp = doc_fingerprint(F.col(text_col))
    keep = (
        df.select(F.col(id_col), fp.alias("__fp"))
        .groupBy("__fp")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")


# --------------------------------------------------------------------------
# n-gram shingles
# --------------------------------------------------------------------------

def _shingle_docs(
    df: DataFrame, id_col: str, text_col: str, n: int, out_id: str | None = None
) -> DataFrame:
    """(id, sh: array<string>) — distinct word n-grams of the
    normalized text, for docs with ≥ n tokens.

    DataFrame-level on purpose. A single-Column formulation filtered on
    ``size(shingles) > 0`` lets Catalyst push that filter below the
    projection, where it re-inlines the ENTIRE shingle expression — the
    per-element lambda then re-evaluates the regex normalization once
    per token (~50× per row; measured 4.3s of a 4.4s stage at sf0.1).
    Here tokens materialize in their own projection and the emptiness
    test is the equivalent-but-cheap ``size(tokens) >= n``.
    """
    out = out_id or id_col
    toks_df = df.select(
        F.col(id_col).alias(out),
        F.split(normalized_text(F.col(text_col)), " ").alias("__toks"),
    ).filter(F.size("__toks") >= n)
    toks = F.col("__toks")
    if n == 1:
        sh = F.array_distinct(toks)
    else:
        idx = F.sequence(F.lit(1), F.size(toks) - (n - 1))
        sh = F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
        )
    return toks_df.select(F.col(out), sh.alias("sh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_posting: int | None = 10_000,
    materialize: bool = True,
) -> DataFrame:
    """All pairs (a,b), a<b, with shingle-set Jaccard ≥ threshold.

    Inverted-index plan: (id, shingle) exploded → self-join on shingle
    → count co-occurrences = |A∩B|; |A∪B| = |A|+|B|-|A∩B|. The join
    key is the shingle, so common shingles dominate cost —
    ``max_posting`` drops shingles whose posting list exceeds the cap
    (at 100 TB this is mandatory; a stopword shingle would otherwise
    produce a quadratic bucket). When the cap fires, Jaccard is
    computed over the capped shingle universe on BOTH sides of the
    ratio (sizes come from the filtered posting table), so the score
    stays an unbiased Jaccard of the reduced sets rather than a
    numerator/denominator mismatch that silently pushes true pairs
    below threshold.

    ``materialize=True`` (default) eagerly pins the pair output via
    :mod:`..materialize` and releases the shingle/posting caches —
    right when the pairs will be consumed in full. Pass False to keep
    the plan fully lazy (no persist, no eager work at call time): a
    ``limit(n)`` probe then pays only what it reads, at the cost of
    re-shingling per consumer. On a cluster, set
    ``spark.etl_sendas.materialize=reliable`` (or ``parquet``) so the
    pin survives executor loss.
    """
    # three consumers (sizes ×2 join sides + posting) — persist so the
    # corpus normalizes+shingles once (spill-safe; see minhash note)
    from pyspark import StorageLevel

    docs = _shingle_docs(df, id_col, text_col, n, out_id="doc")
    cache = materialize and _worth_caching(df)
    if cache:
        docs = docs.persist(StorageLevel.MEMORY_AND_DISK)
    posting = docs.select("doc", F.explode("sh").alias("shingle"))

    if max_posting is not None:
        from pyspark.sql import Window

        cnt = Window.partitionBy("shingle")
        posting = posting.withColumn("__df", F.count("*").over(cnt)).filter(
            F.col("__df") <= max_posting
        ).drop("__df")
        if cache:
            posting = posting.persist(StorageLevel.MEMORY_AND_DISK)

    # sizes from the SAME (possibly capped) posting universe as the
    # intersections: if high-df shingles are dropped from n_common they
    # must drop from |A|/|B| too, or the Jaccard denominator is
    # inconsistent with the numerator and true pairs get biased BELOW
    # threshold (silent false negatives, not just candidate pruning).
    # With no cap hit this is exactly size(sh).
    sizes = posting.groupBy("doc").agg(F.count("*").alias("sz"))

    a = posting.alias("a")
    b = posting.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    sa = sizes.select(F.col("doc").alias("id_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("id_b"), F.col("sz").alias("sz_b"))
    pairs = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("sz_a") + F.col("sz_b") - F.col("n_common")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "n_common", "jaccard")
    )
    if not materialize:
        return pairs
    return _materialize_release(pairs, docs, posting, name="ngram_jaccard_pairs")


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, signature array<long>[num_hashes]) — min over seeded xxhash64.

    Fully NARROW: each signature element is
    ``array_min(transform(shingles, s -> xxhash64(seed_i, s)))`` — a
    per-row Column expression, so signature computation involves no
    explode, no shuffle, and scales linearly with the scan (the
    earlier explode+groupBy formulation shuffled |doc|·|shingles| rows
    for the same result). Seeded family: ``xxhash64(seed_i, shingle)``
    (xxhash64 mixes all args, so each literal seed is an independent
    hash function).
    """
    docs = _shingle_docs(df, id_col, text_col, shingle_n)
    return _signatures_from_shingles(docs, id_col, num_hashes)


def _signatures_from_shingles(
    sh_df: DataFrame, id_col: str, num_hashes: int
) -> DataFrame:
    """(id, signature) from a (id, sh) shingle frame.

    Hash each shingle STRING once, then derive the family from the
    64-bit value (xxhash64 over longs) — ~num_hashes× fewer string
    hashes and a much smaller codegen unit than hashing text per seed.
    """
    hs = sh_df.select(
        F.col(id_col),
        F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("hs"),
    )
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("hs"), lambda h: F.xxhash64(F.lit(i), h)))
            for i in range(num_hashes)
        ]
    )
    return hs.select(F.col(id_col), sig.alias("signature"))


def _band_buckets(
    sig_df: DataFrame,
    id_col: str,
    num_hashes: int,
    bands: int,
    with_sigkey: bool = False,
) -> DataFrame:
    """(doc, band, bhash) LSH bucket rows from a (id, signature) frame.

    Narrow explode of ``bands`` per-band slice hashes — the one shared
    piece between the batch and incremental LSH paths, so both put
    byte-identical bucket keys on the wire.

    ``with_sigkey=True`` carries one extra long per row: a hash of the
    FULL signature, used by the oversized-bucket chain (see
    :func:`minhash_lsh_candidates`) as a locality sort key — docs with
    identical signatures get identical keys and therefore sort
    adjacent within a bucket. Off by default so the incremental-index
    path's wire width is unchanged.
    """
    rows_per_band = num_hashes // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("bhash"),
            )
            for b in range(bands)
        ]
    )
    cols = [F.col(id_col).alias("doc"), F.explode(band_structs).alias("bb")]
    out = ["doc", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash")]
    if with_sigkey:
        cols.append(F.xxhash64(F.col("signature")).alias("sigkey"))
        out.append("sigkey")
    return sig_df.select(*cols).select(*out)


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    verify_threshold: float | None = 0.5,
    materialize: bool = True,
    max_bucket: int | None = 8192,
) -> DataFrame:
    """Near-dup candidate pairs via banded MinHash-LSH, optionally
    verified with exact shingle Jaccard.

    ``bands`` bands of ``num_hashes/bands`` rows; a pair collides if
    any band's slice hashes equal. Bucket join = shuffle on
    (band, band_hash); only bucket-mates are compared — the
    sub-quadratic property that makes this the 100 TB path. With
    ``verify_threshold`` set, candidates are confirmed against the
    exact Jaccard of their shingle sets (join back to the posting
    lists), eliminating LSH false positives.

    ``max_bucket`` guards the bucket self-join's quadratic blow-up on
    degenerate corpora (the same skew class ``max_posting`` caps on
    the n-gram path): 10⁵ byte-identical boilerplate docs — upstream
    exact-dedup skipped or keyed differently — share every band and
    would put 10¹⁰ pairs in one bucket. A bucket larger than the cap
    degrades to a STAR around the min doc of each identical-signature
    GROUP (group key: a hash of the full minhash signature), with the
    group representatives linked by a CHAIN in (group-key, doc id)
    order: pair count linear in the bucket, and connectivity — what
    the downstream connected-components clustering actually consumes —
    is preserved at component diameter 2 per group (a bucket-wide
    chain would cost min-label propagation one round per member).
    Grouping by signature makes the cap verification-safe where a
    bucket-wide min-id star was not (ADVICE r8): every star edge pairs
    two same-signature docs, so an identical-doc family inside a
    heterogeneous oversized bucket keeps edges that pass exact-Jaccard
    verification even when the bucket's global min-id doc is
    dissimilar to the family — the old star hung every edge off that
    one representative and verification could silently drop the whole
    bucket's clusters. Residual (documented, probabilistic): two true
    near-dups with NON-identical signatures that meet only in an
    oversized bucket pair up only if their group reps are chain-
    adjacent there — their signatures hash apart even though the docs
    are similar. Star and chain pairs flow through the same
    exact-Jaccard verification as everything else.

    ``materialize=True`` (default) eagerly pins the verified pairs via
    :mod:`..materialize` (strategy conf-selectable; use ``reliable``/
    ``parquet`` on a cluster) and releases the shingle cache. Pass
    False for a fully lazy plan builder — nothing persists, nothing
    executes at call time.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    # shingle ONCE; signatures and the verification arrays both read
    # this frame. With verification on it persists (memory-and-disk —
    # spill-safe at scale) so the corpus is normalized+shingled a
    # single time instead of once per consumer; the equivalent cluster
    # pattern is materializing the shingle/signature table.
    sh = _shingle_docs(df, id_col, text_col, shingle_n, out_id="doc")
    cache = verify_threshold is not None and materialize and _worth_caching(df)
    if cache:
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    sig = _signatures_from_shingles(sh, "doc", num_hashes).withColumnRenamed(
        "doc", id_col
    )
    # NOT pinned (r13 A/B): an eager signature/candidate pin looked
    # like guide-§5 textbook (the bucket pipeline has 3 lineages) but
    # measured SLOWER warm (3.7-4.4 s vs 3.2-3.7 s at sf0.1, 3×5-run
    # interleaved) — the single lazy DAG overlaps all its passes in
    # one job, while pins serialize into barrier-separated waves. At
    # 100 TB the one-pass story is the `_worth_caching` shingle
    # persist above, which is exactly "materialize the signature
    # table" and kicks in automatically.

    buckets = _band_buckets(
        sig, id_col, num_hashes, bands, with_sigkey=max_bucket is not None
    )

    chain = None
    if max_bucket is not None:
        # split regimes on the bucket size computed as a PARTIAL
        # AGGREGATION + broadcast of only the OVERSIZED keys (r12
        # rewrite): the previous window-count formulation forced an
        # exchange + full sort of the whole bucket table just to learn
        # which (band, bhash) exceed the cap — a set that is tiny or
        # empty on every non-degenerate corpus (map-side partial
        # aggregation reduces the shuffle to one row per distinct
        # bucket, guide §2.3). The oversized-key frame broadcasts;
        # small buckets flow through a left_anti join (no exchange, no
        # sort) into the all-pairs self-join exactly as before. An
        # oversized bucket (left_semi side) emits a STAR around the
        # min doc of each identical-signature GROUP plus a CHAIN over
        # the group representatives in (sigkey, doc) order — linear
        # fan-out, and crucially component DIAMETER stays 2 per group
        # (a bucket-wide chain would hand downstream min-label
        # connected-components a diameter-n path: 10⁵ propagation
        # rounds for the 10⁵-doc degenerate bucket this cap exists
        # for). The chain windows now sort ONLY the oversized rows.
        from pyspark.sql import Window

        wg = Window.partitionBy("band", "bhash", "sigkey")
        wo = Window.partitionBy("band", "bhash").orderBy("sigkey", "doc")
        over = (
            buckets.groupBy("band", "bhash")
            .agg(F.count(F.lit(1)).alias("__bn"))
            .filter(F.col("__bn") > F.lit(max_bucket))
            .select("band", "bhash")
        )
        # Broadcast-hint guard (VERDICT/ADVICE r12 item 6): the
        # oversized-key set is tiny-or-empty on every non-degenerate
        # corpus, but on a pathological one (millions of identical-
        # signature docs) it is bounded only by N·bands/max_bucket —
        # an unconditional hint then risks the 8 GB broadcast cap /
        # driver OOM. An AUTOMATIC size probe needs its own eager job
        # wave, which the r13 A/B measured at +0.5-0.9 s per query
        # (the probe must run the scan→shingle→signature pass before
        # the main job can even plan) — so the guard is the
        # `spark.etl_sendas.minhashOversizedKeys` conf instead:
        # `broadcast` (default) hints; `join` withholds the hint and
        # lets AQE pick the strategy from the RUNTIME size — the
        # graceful-degradation path for corpora that may be
        # degenerate. Zero cost on the default path, no unbounded
        # broadcast on the guarded one.
        mode = str(
            df.sparkSession.conf.get(
                "spark.etl_sendas.minhashOversizedKeys", "broadcast"
            )
        ).lower()
        if mode != "join":
            over = F.broadcast(over)
        # one explicit (band, bhash) exchange for the chain path: both
        # window specs below are ClusteredDistribution-satisfied by it
        # (wg's extra sigkey key is a subset case), so the rare
        # oversized rows shuffle once, not once per window
        oversized = buckets.join(over, ["band", "bhash"], "left_semi").repartition(
            "band", "bhash"
        )
        buckets = buckets.join(over, ["band", "bhash"], "left_anti").select(
            "doc", "band", "bhash"
        )
        # star and chain fused into ONE branch (the self-join already
        # costs two lineages of the bucketed exchange; a third busts
        # the pinned budget): groups are contiguous in (sigkey, doc)
        # order, so for a group's rep row lag(__rep) IS the previous
        # group's rep — the chain edge — while every other row pairs
        # with its own group's rep — the star edge.
        chain = (
            oversized
            .withColumn("__rep", F.min("doc").over(wg))
            .withColumn("__prevrep", F.lag("__rep").over(wo))
            .withColumn(
                "__other",
                F.when(
                    F.col("doc") != F.col("__rep"), F.col("__rep")
                ).otherwise(F.col("__prevrep")),
            )
            .filter(F.col("__other").isNotNull())
            .select(
                F.least("__other", "doc").alias("id_a"),
                F.greatest("__other", "doc").alias("id_b"),
            )
        )

    a = buckets.alias("a")
    b = buckets.alias("b")
    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.bhash") == F.col("b.bhash"))
        & (F.col("a.doc") < F.col("b.doc")),
    ).select(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
    if chain is not None:
        cand = cand.unionByName(chain)
    cand = cand.distinct()
    if verify_threshold is None:
        return cand

    # verify ONLY the candidate pairs: join their shingle sets back and
    # intersect per pair (array_intersect on two row-local arrays) —
    # O(|candidates|), vs the full inverted-index pair table which is
    # quadratic in posting-list length and was the dominant cost here.
    # (r13 note: a candidate-id semi-join prefilter on sa/sb — pin the
    # pair set, restrict the shingle side to candidate docs — was
    # built and A/B'd: slower warm at bench scale for the same reason
    # as the signature pin above; the lazy sa/sb passes overlap the
    # candidate pipeline inside one job, and at 100 TB they read the
    # `_worth_caching` persist instead of re-shingling.)
    sa = sh.select(F.col("doc").alias("id_a"), F.col("sh").alias("__sa"))
    sb = sh.select(F.col("doc").alias("id_b"), F.col("sh").alias("__sb"))
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                inter / (F.size("__sa") + F.size("__sb") - inter), 6
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard")
    )
    if not materialize:
        return verified
    return _materialize_release(verified, sh, name="minhash_lsh_pairs")


# --------------------------------------------------------------------------
# pair → cluster: connected components (the last rung of the ladder)
# --------------------------------------------------------------------------

def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "node",
    out_label: str = "cluster",
    max_iter: int = 50,
) -> DataFrame:
    """Assign every node touched by ``pairs`` its connected component,
    labeled by the component's minimum node id.

    Near-dup PAIRS aren't actionable until they become CLUSTERS (keep
    one canonical doc per component, drop the rest) — pair output alone
    over-deletes when A~B and B~C but the pipeline drops both B and C.

    Min-label propagation: every node starts labeled with itself; each
    round every node takes the min label among itself and its
    neighbors; fixpoint after ≤ component-diameter rounds (near-dup
    clusters are shallow — transitive chains of a few hops — so this
    converges in single-digit rounds in practice; ``max_iter`` bounds
    pathological chains). Each round is one join + one groupBy — both
    hash-partitioned on node id, no broadcast of anything unbounded.
    Results are pinned per round via :mod:`..materialize`: iterative
    plans otherwise accumulate lineage exponentially (the classic
    iterative-Spark trap). Locally the pin is ``localCheckpoint``; on
    a cluster set ``spark.etl_sendas.materialize=reliable`` (or
    ``parquet``) so a lost executor mid-iteration doesn't kill the
    job — lineage is truncated, recompute is impossible by design.
    Prior rounds' storage is released eagerly at the RDD/stage level
    (``DataFrame.unpersist`` cannot reach checkpoint blocks), so round
    N holds two rounds of labels, not N.
    The fixpoint test is a ``limit(1).count()`` on changed labels — an
    early-exit probe, not a full materialization.
    """
    e = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    edges = _pin(
        e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        ).distinct(),
        name="cc_edges",  # scanned every round — pin once
    )
    labels = _pin(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node")),
        name="cc_labels_0",
    )
    for i in range(max_iter):
        neigh = edges.join(
            labels.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), "label")
        new_labels = _pin(
            labels.unionByName(neigh)
            .groupBy("node")
            .agg(F.min("label").alias("label")),
            name=f"cc_labels_{i + 1}",
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        _release(labels)
        labels = new_labels
        if changed == 0:
            break
    _release(edges)
    return labels.select(
        F.col("node").alias(out_id), F.col("label").alias(out_label)
    )


def connected_components_star(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    out_id: str = "node",
    out_label: str = "cluster",
    max_rounds: int = 40,
) -> DataFrame:
    """Connected components by ALTERNATING large-star / small-star
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    the O(log n)-round alternative to :func:`connected_components`'s
    min-label propagation, whose round count is the component
    DIAMETER. Same contract and output (component labeled by its min
    node id); choose this one when components can be long chains
    (citation trails, linked-record graphs), and the propagation one
    when clusters are shallow (near-dup clusters — measured head to
    head in the tests: on a 1024-node path this converges in ~5
    rounds where propagation needs ~1024).

    Each round is two half-steps over the current edge multiset, each
    ONE groupBy(node) + ONE join back (both hash-keyed by node id,
    map-side-combinable min):

    - large-star: every strictly-larger neighbor of u re-points to
      min(N(u) ∪ u) — halves long chains;
    - small-star: every ≤-neighbor re-points there too — flattens the
      local stars.

    Convergence = the per-node min-neighbor assignment stops changing
    (one early-exit probe per round, like the propagation variant);
    the edge multiset is pinned per round with O(1) lineage."""
    e0 = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
    edges = _pin(
        e0.unionByName(e0.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct(),
        name="ccs_edges_0",
    )
    all_nodes = _pin(
        edges.select(F.col("u").alias("node")).distinct(), name="ccs_nodes"
    )

    def star(ed: DataFrame, large: bool, rnd: int) -> DataFrame:
        m = ed.groupBy("u").agg(F.min("v").alias("mn"))
        m = m.select("u", F.least(F.col("u"), F.col("mn")).alias("m"))
        joined = ed.join(m, "u")
        kept = joined.filter(
            F.col("v") > F.col("u") if large else F.col("v") <= F.col("u")
        ).select(F.col("v").alias("a"), F.col("m").alias("b"))
        # u itself re-points to m in the small-star step
        self_edges = (
            m.select(F.col("u").alias("a"), F.col("m").alias("b"))
            if not large
            else None
        )
        out = kept if self_edges is None else kept.unionByName(self_edges)
        out = (
            out.filter(F.col("a") != F.col("b"))
            .select(F.col("a").alias("u"), F.col("b").alias("v"))
        )
        sym = out.unionByName(
            out.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        return _pin(sym, name=f"ccs_edges_{rnd}")

    prev_assign = None
    for i in range(max_rounds):
        lg = star(edges, large=True, rnd=2 * i + 1)
        _release(edges)
        sm = star(lg, large=False, rnd=2 * i + 2)
        _release(lg)
        edges = sm
        assign = _pin(
            edges.groupBy("u").agg(F.min("v").alias("mn")).select(
                "u", F.least(F.col("u"), F.col("mn")).alias("m")
            ),
            name=f"ccs_assign_{i}",
        )
        if prev_assign is not None:
            changed = (
                assign.alias("n")
                .join(prev_assign.alias("o"), "u", "full_outer")
                .filter(
                    ~F.col("n.m").eqNullSafe(F.col("o.m"))
                )
                .limit(1)
                .count()
            )
            _release(prev_assign)
            if changed == 0:
                prev_assign = assign
                break
        prev_assign = assign
    labels = all_nodes.join(
        prev_assign.withColumnRenamed("u", "node"), "node", "left"
    ).select(
        F.col("node").alias(out_id),
        F.least(F.col("node"), F.coalesce(F.col("m"), F.col("node"))).alias(
            out_label
        ),
    )
    return labels


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

def portable_hash60(col: Column) -> Column:
    """60-bit engine-portable hash: first 15 hex chars of md5.

    Always positive in a signed 64-bit long, and computable identically
    in DuckDB as ``('0x' || substr(md5(x), 1, 15))::BIGINT`` — which is
    what makes SimHash fingerprints and IVF centroid selection
    oracle-verifiable end-to-end. Use xxhash64 when portability is not
    needed (≈3× cheaper per token)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def simhash_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """SimHash per document (``bits`` wide, ≤64), all JVM-side.

    Each token hashes once; per bit position the ±1 votes sum in a
    single groupBy(id) with ``bits`` sum-aggregates; the sign vector
    folds back into one BIGINT fingerprint. Near-dups are then pairs
    within small Hamming distance — bucket on bit-slices of the
    fingerprint for the LSH variant.

    ``hash_fn``: ``"xxhash64"`` (default, fastest) or ``"md5_60"`` —
    the portable 60-bit md5 prefix (:func:`portable_hash60`), which a
    SQL oracle can recompute exactly; pair it with ``bits=60``.
    """
    toks = df.select(
        F.col(id_col).alias("doc"),
        F.explode(
            F.array_distinct(F.split(normalized_text(F.col(text_col)), " "))
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    if hash_fn == "md5_60":
        h = toks.withColumn("h", portable_hash60(F.col("tok")))
    else:
        h = toks.withColumn("h", F.xxhash64("tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    agg = h.groupBy("doc").agg(*votes)
    fingerprint = None
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        term = F.shiftleft(bit, i)
        fingerprint = term if fingerprint is None else fingerprint.bitwiseXOR(term)
    return agg.select(F.col("doc").alias(id_col), fingerprint.alias("simhash"))


def hamming_near_pairs(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    band_bits: int = 16,
    bits: int = 64,
) -> DataFrame:
    """Hamming-LSH over ANY 64-bit fingerprint column: bucket on
    ``band_bits``-bit slices (pigeonhole: a pair within Hamming ≤
    bands−1 must agree on ≥1 slice), verify with exact popcount.
    Shared by text SimHash and image perceptual hashes — the bucketing
    argument only cares that near-dups differ in few bits."""
    n_bands = bits // band_bits
    mask = (1 << band_bits) - 1
    slices = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.shiftright(F.col(hash_col), b * band_bits)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for b in range(n_bands)
        ]
    )
    buckets = df.select(
        F.col(id_col).alias("doc"), F.col(hash_col).alias("__h"), F.explode(slices).alias("s")
    ).select("doc", "__h", F.col("s.band").alias("band"), F.col("s.key").alias("key"))
    a, b = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.bit_count(F.col("a.__h").bitwiseXOR(F.col("b.__h"))).alias(
                "hamming"
            ),
        )
        .distinct()
    )
    return pairs.filter(F.col("hamming") <= max_hamming)


def simhash_near_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3, band_bits: int = 16
) -> DataFrame:
    """Hamming-LSH over SimHash: bucket on 16-bit slices (a pair within
    Hamming ≤ 3 of 64 bits must agree on ≥1 of 4 slices), verify with
    exact popcount distance."""
    fp = simhash_fingerprints(df, id_col, text_col)
    return hamming_near_pairs(
        fp, id_col, "simhash", max_hamming=max_hamming, band_bits=band_bits
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def sign_planes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random-hyperplane set for sign-LSH bucketing.

    Shared by the Spark operator AND the DuckDB oracle-SQL builder
    (plans/inventory.py embeds these exact float literals), so the
    bucketing is verifiable end-to-end: same seed → same planes → same
    signatures → same pair set.
    """
    import random

    rng = random.Random(seed)
    return [[rng.gauss(0, 1) for _ in range(dim)] for _ in range(n_planes)]


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.95,
    bucket_planes: int = 0,
    dim: int | None = None,
    max_exact_rows: int = 1_000_000,
) -> DataFrame:
    """Pairs with cosine ≥ threshold over an embedding column.

    ``bucket_planes`` = 0 → exact all-pairs via a block-matrix kernel:
    the normalized corpus matrix is broadcast (an N×d float32 matrix —
    at near-dup thresholds this is the dedup *reference set*, which is
    broadcastable far beyond what a nested-loop pair join could scan),
    and each Arrow batch computes ``block @ M.T`` in BLAS inside
    ``mapInPandas``, emitting only the above-threshold (a < b) pairs.
    This replaces an interpreted per-pair ``zip_with`` nested-loop join
    — ~50× on a 50k×64 corpus. > 0 → random-hyperplane sign buckets
    (deterministic seeded planes): only same-signature vectors are
    compared, the 100 TB self-dedup path (near-dups almost surely share
    all signs); pairing within buckets uses the same plan shape.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    from .similarity import round_half_up

    vecs = df.select(
        F.col(id_col).alias("doc"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).filter(F.size("v") > 0)
    vecs = vecs.withColumn("nrm", _norm(F.col("v"))).filter(F.col("nrm") > 0)

    if bucket_planes > 0:
        if dim is None:
            dim = len(vecs.select("v").first()["v"])
        planes = sign_planes(dim, bucket_planes)
        sig = None
        for i, p in enumerate(planes):
            plane = F.array(*[F.lit(x) for x in p])
            bit = (_dot(F.col("v"), plane) > 0).cast("long")
            term = F.shiftleft(bit, i)
            sig = term if sig is None else sig.bitwiseXOR(term)
        vecs = vecs.withColumn("__bucket", sig)
        a, b = vecs.alias("a"), vecs.alias("b")
        return (
            a.join(
                b,
                (F.col("a.__bucket") == F.col("b.__bucket"))
                & (F.col("a.doc") < F.col("b.doc")),
            )
            .select(
                F.col("a.doc").alias("id_a"),
                F.col("b.doc").alias("id_b"),
                F.round(
                    _dot(F.col("a.v"), F.col("b.v"))
                    / (F.col("a.nrm") * F.col("b.nrm")),
                    6,
                ).alias("cosine"),
            )
            .filter(F.col("cosine") >= threshold)
        )

    # exact path: broadcast the normalized matrix, score blocks in BLAS.
    # The collect below is the point of this kernel (the corpus IS the
    # broadcast reference matrix), but it is a driver materialization —
    # guard it so a 100 TB self-dedup can never silently OOM the
    # driver. The guard is fused into the collect itself (limit cap+1,
    # then check the length): one job, and driver memory stays bounded
    # by the cap even when the input is over it. Under the cap,
    # limit(cap+1) returns every row, so the kernel stays exact.
    spark = df.sparkSession
    rows = vecs.select("doc", "v", "nrm").limit(max_exact_rows + 1).collect()
    if len(rows) > max_exact_rows:
        raise ValueError(
            f"embedding_near_dup_pairs exact path collects the corpus to "
            f"the driver (> max_exact_rows={max_exact_rows} rows). "
            f"Use bucket_planes>0 (sign-LSH, fully distributed) for "
            f"corpora beyond the broadcastable reference-matrix size, or "
            f"raise max_exact_rows explicitly."
        )
    ids = np.array([r["doc"] for r in rows])
    mat = np.array([r["v"] for r in rows], dtype="float64")
    mat /= np.array([r["nrm"] for r in rows], dtype="float64")[:, None]
    b_ids = spark.sparkContext.broadcast(ids)
    b_mat = spark.sparkContext.broadcast(mat)
    thr = float(threshold)

    # pair-id dtype follows the input id column (string ids work too),
    # not a hardcoded LongType
    id_type = df.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField("id_a", id_type),
            T.StructField("id_b", id_type),
            T.StructField("cosine", T.DoubleType()),
        ]
    )

    def score(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            q_ids = pdf["doc"].values
            q = np.array(list(pdf["v"].values), dtype="float64")
            q /= np.linalg.norm(q, axis=1)[:, None]
            sims = round_half_up(q @ all_mat.T, 6)
            qi, ci = np.where(sims >= thr)
            if len(qi) == 0:
                continue
            ia, ib = q_ids[qi], all_ids[ci]
            keep = ia < ib  # emit each unordered pair once, no self-pairs
            yield pd.DataFrame(
                {
                    "id_a": ia[keep],
                    "id_b": ib[keep],
                    "cosine": sims[qi, ci][keep],
                }
            )

    return vecs.select("doc", "v").mapInPandas(score, schema=out_schema)


def incremental_dedup(
    new_docs: DataFrame,
    fingerprint_index: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    fp_col: str = "fp",
) -> DataFrame:
    """Dedup a NEW batch against the historical corpus without touching
    the corpus: anti-join the batch's fingerprints against the stored
    fingerprint index, then keep-first within the batch itself.

    The operational shape of dedup at 100 TB: the corpus is never
    rescanned — each ingest wave dedups against a fingerprint-only
    index (one md5 per historical doc, ~2000x smaller than the text)
    and appends its own fingerprints back to the index afterwards
    (``select(fp_col)`` of the output). Within-batch first is min(id),
    matching :func:`exact_dedup`'s canonical-survivor rule. Both joins
    hash on the fingerprint: when the index lives bucketed-by-fp on
    disk, the anti-join co-locates for free.
    """
    fp = doc_fingerprint(F.col(text_col))
    fresh = new_docs.withColumn(fp_col, fp).join(
        fingerprint_index.select(fp_col).distinct(), on=fp_col, how="left_anti"
    )
    keep = (
        fresh.groupBy(fp_col)
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return fresh.join(keep, on=id_col, how="left_semi")


# --------------------------------------------------------------------------
# incremental NEAR-dup: ingest wave vs a persisted MinHash-LSH index.
# The near-dup analogue of incremental_dedup above — the corpus text is
# never re-shingled and never re-hashed; each wave probes a stored
# (id, shingles, signature) artifact and appends its own rows.
# --------------------------------------------------------------------------

def minhash_lsh_index(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """(id, sh, signature) — the persisted near-dup index artifact.

    One pass over the text: normalize → shingle → hash each shingle
    once → fold the seeded MinHash family over the hash array. All
    narrow; the output is what :func:`minhash_lsh_incremental` probes,
    so at 100 TB this table is written once (bucketed by ``id_col`` so
    the verification join co-locates) and the raw text is never read
    again by dedup.
    """
    sh = _shingle_docs(df, id_col, text_col, shingle_n, out_id="doc")
    hs = sh.select(
        "doc",
        "sh",
        F.transform(F.col("sh"), lambda s: F.xxhash64(s)).alias("__hs"),
    )
    sig = F.array(
        *[
            F.array_min(F.transform(F.col("__hs"), lambda h: F.xxhash64(F.lit(i), h)))
            for i in range(num_hashes)
        ]
    )
    return hs.select(F.col("doc").alias(id_col), "sh", sig.alias("signature"))


def minhash_lsh_incremental(
    index: DataFrame,
    wave_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    verify_threshold: float = 0.5,
    broadcast_wave: bool = True,
    materialize: bool = True,
) -> DataFrame:
    """Near-dup pairs INVOLVING a new ingest wave, probed against a
    stored :func:`minhash_lsh_index` — the historical corpus is never
    re-shingled.

    Returns (id_a, id_b, jaccard, origin) with id_a < id_b and origin ∈
    {'wave-index', 'wave-wave'}; index-index pairs are by construction
    out of scope (they were found when those docs were themselves the
    wave). Two candidate joins:

    - wave × index on (band, bhash): the wave's bucket rows are
      BROADCAST (``broadcast_wave``, default) — a daily wave is tiny
      next to the corpus, so the index side streams scan→BHJ with ZERO
      index shuffle. The index's bucket rows derive from the stored
      signature by a narrow explode; no text, no re-hash.
    - wave × wave: a self-join of the wave's own buckets (small).

    Candidates are then verified with exact shingle Jaccard by joining
    back to the stored shingle arrays (index side) and the wave's own —
    again broadcast-sized joins keyed by id. Same banded family, same
    verification rule as :func:`minhash_lsh_candidates`, so batch and
    incremental agree bit-for-bit on the same corpus split.
    """
    assert num_hashes % bands == 0, "bands must divide num_hashes"
    wave_idx = minhash_lsh_index(wave_df, id_col, text_col, num_hashes, shingle_n)
    if materialize:
        from pyspark import StorageLevel

        wave_idx = wave_idx.persist(StorageLevel.MEMORY_AND_DISK)

    wb = _band_buckets(wave_idx, id_col, num_hashes, bands)
    ib = _band_buckets(index.select(id_col, "signature"), id_col, num_hashes, bands)
    wb_probe = F.broadcast(wb) if broadcast_wave else wb

    cross = (
        ib.alias("a")
        .join(
            wb_probe.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.doc") != F.col("b.doc")),
        )
        .select(
            F.least(F.col("a.doc"), F.col("b.doc")).alias("id_a"),
            F.greatest(F.col("a.doc"), F.col("b.doc")).alias("id_b"),
            F.lit("wave-index").alias("origin"),
        )
        .distinct()
    )
    within = (
        wb.alias("a")
        .join(
            F.broadcast(wb.alias("b")) if broadcast_wave else wb.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            F.lit("wave-wave").alias("origin"),
        )
        .distinct()
    )
    cand = cross.unionByName(within)
    # candidates are wave-bounded (every pair touches a wave doc), so
    # the verification joins broadcast THEM — the corpus-sized shingle
    # table is only ever the streamed probe side, never shuffled
    if broadcast_wave:
        cand = F.broadcast(cand)

    sh_all = index.select(F.col(id_col).alias("doc"), "sh").unionByName(
        wave_idx.select(F.col(id_col).alias("doc"), "sh")
    )
    sa = sh_all.select(F.col("doc").alias("id_a"), F.col("sh").alias("__sa"))
    sb = sh_all.select(F.col("doc").alias("id_b"), F.col("sh").alias("__sb"))
    inter = F.size(F.array_intersect(F.col("__sa"), F.col("__sb")))
    verified = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.round(inter / (F.size("__sa") + F.size("__sb") - inter), 6),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("id_a", "id_b", "jaccard", "origin")
    )
    if not materialize:
        return verified
    return _materialize_release(verified, wave_idx, name="minhash_incremental_pairs")


def minhash_index_append(
    index: DataFrame,
    wave_index: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Updated index = old index ∪ the wave's NON-duplicate docs.

    Survivor policy mirrors :func:`incremental_dedup`: history is
    canonical — a wave doc is dropped if it near-matched ANY index doc
    (either pair orientation) or a lower-id doc within its own wave.
    ``pairs`` is :func:`minhash_lsh_incremental` output; ``wave_index``
    the wave's :func:`minhash_lsh_index` rows.
    """
    wi = pairs.filter(F.col("origin") == "wave-index")
    ww = pairs.filter(F.col("origin") == "wave-wave")
    index_ids = index.select(F.col(id_col).alias("__iid"))
    # wave-side member of each cross pair = whichever side is NOT in the index
    wave_dups = (
        wi.join(index_ids, F.col("id_a") == F.col("__iid"), "left")
        .select(
            F.when(F.col("__iid").isNotNull(), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias(id_col)
        )
        .unionByName(ww.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    fresh = wave_index.join(wave_dups, on=id_col, how="left_anti")
    return index.unionByName(fresh)


# --------------------------------------------------------------------------
# exact duplicate SUBSTRINGS (Lee et al. 2022, "Deduplicating Training
# Data Makes Language Models Better"): mark every k-token span whose
# exact content occurs elsewhere in the corpus, keeping one canonical
# occurrence. The document-level flavors above keep/drop whole docs;
# this finds the REPEATED PASSAGES inside otherwise-unique documents
# (licenses, headers, quoted chain mail) that document-level dedup
# structurally cannot see.
# --------------------------------------------------------------------------

# gaps-and-islands needs a total order that one scalar can carry; a doc
# would need >= this many tokens to make (doc_id, pos) encoding collide
_MAX_DOC_TOKENS = 1_000_000


def substring_dedup_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Maximal duplicated token spans per document: every k-token
    window (canonical tokenizer) is fingerprinted with the portable
    60-bit hash; a window is DUPLICATE unless it is the globally first
    occurrence of its content (ordered by ``(doc, pos)``); overlapping
    and adjacent duplicate windows merge into maximal spans.

    Returns ``(doc_id, span_start, span_end, n_windows)`` — token
    offsets ``[span_start, span_end)``, one row per maximal span. The
    caller strips or masks the spans (Lee et al. cut them from the
    training text).

    Plan (scale notes): shingling is scan-local array math (one
    ``transform`` over a token sequence, no explode until the
    fingerprint stream). The ONE corpus-sized shuffle is keyed by
    fingerprint: the canonical occurrence per fingerprint comes from a
    ``groupBy(fp).min(ord)`` — map-side combinable, so a boilerplate
    span repeated a billion times still ships ONE row per partition —
    followed by a join back that AQE's skew handling splits if a
    posting is hot (a WINDOW over fp would pin each hot fingerprint to
    one task; the agg+join formulation is why this survives viral
    spans). Span merging shuffles by doc (gaps-and-islands, two
    windows over doc-sized partitions).

    ``ord = doc_id * 1_000_000 + pos`` carries the global order as one
    scalar (min-combinable); docs with ≥1M tokens would alias it, so
    they fail fast."""
    toks = F.filter(
        F.split(normalized_text(F.col(text_col)), " "), lambda t: t != ""
    )
    base = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(id_col).alias("doc"), toks.alias("toks"))
        .withColumn("n", F.size("toks"))
        .filter(F.col("n") >= k)
    )
    guarded_n = F.when(
        F.col("n") < _MAX_DOC_TOKENS, F.col("n")
    ).otherwise(
        F.raise_error(
            F.concat(
                F.lit("substring_dedup_spans: document "),
                F.col("doc").cast("string"),
                F.lit(f" has >= {_MAX_DOC_TOKENS} tokens; ord encoding aliases"),
            )
        )
    )
    shingles = base.select(
        "doc",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), guarded_n - k),
                lambda i: F.struct(
                    i.cast("long").alias("pos"),
                    portable_hash60(
                        F.concat_ws(" ", F.slice(F.col("toks"), i + 1, k))
                    ).alias("fp"),
                ),
            )
        ).alias("s"),
    ).select("doc", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
    shingles = shingles.withColumn(
        "ord", F.col("doc") * F.lit(_MAX_DOC_TOKENS) + F.col("pos")
    )
    firsts = shingles.groupBy("fp").agg(
        F.min("ord").alias("first_ord"), F.count(F.lit(1)).alias("cnt")
    )
    dups = (
        shingles.join(firsts, "fp")
        .filter((F.col("cnt") > 1) & (F.col("ord") != F.col("first_ord")))
        .select("doc", "pos")
    )
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("doc")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    islands = (
        dups.withColumn(
            "brk",
            (
                F.col("pos")
                > F.coalesce(F.max(F.col("pos") + k).over(w_prev), F.lit(-1))
            ).cast("int"),
        )
        .withColumn("island", F.sum("brk").over(w_run))
    )
    return (
        islands.groupBy("doc", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + k).alias("span_end"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            F.col("doc").alias(id_col),
            "span_start",
            "span_end",
            "n_windows",
        )
    )


def prefix_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.6,
) -> DataFrame:
    """EXACT all-pairs token-set Jaccard >= ``threshold`` via PREFIX
    FILTERING (Bayardo, Ma & Srikant 2007 "Scaling Up All Pairs
    Similarity Search"; the PPJoin family) — the fourth pair-generation
    plan in the dedup ladder, and the only sub-quadratic one that is
    EXACT at its threshold:

    - minhash-LSH (`minhash_lsh_candidates`) is probabilistic recall;
    - the capped posting join (`ngram_jaccard_pairs`) is exact only
      over the capped shingle universe;
    - prefix filtering has NO false negatives by pigeonhole: order
      every doc's distinct tokens by a global canonical order (document
      frequency ascending, then token — rarest first) and keep only
      the first ``L = |d| - ceil(t*|d|) + 1`` as the doc's PREFIX. Two
      docs with Jaccard >= t must share >= 1 prefix token: if they
      disagreed on all prefix tokens, the intersection is confined to
      the two suffixes and |A∩B| <= min(|A|,|B|) - L < t*|A∪B|.

    Plan shape at 100 TB: the candidate join keys are ONLY prefix
    tokens — by construction each doc's globally RAREST tokens, so
    posting lists are short where the join happens and the stopword
    bucket that forces `ngram_jaccard_pairs`' cap never joins at all.
    A length filter (t*|a| <= |b| for |a| >= |b|) prunes candidates
    whose sizes alone cap Jaccard below t. Verification joins each
    candidate pair back to the two full token arrays and computes the
    exact intersection with JVM ``array_intersect`` — cost is
    per-candidate, not per-corpus. One df-keyed shuffle (postings),
    one prefix-token-keyed shuffle (candidates), two doc-keyed joins
    (verification); every one on slim projections.

    Returns ``(id_a, id_b, jaccard)`` with id_a < id_b, jaccard
    rounded to 6. Deterministic end-to-end (integer df counts, integer
    positions, IEEE double threshold arithmetic), so the SQL oracle
    replays the index exactly.
    """
    t = float(threshold)
    if not 0.0 < t <= 1.0:
        raise ValueError(f"prefix_jaccard_pairs: threshold {t} not in (0, 1]")
    from pyspark.sql import Window

    toks = df.select(
        F.col(id_col).alias("doc"),
        F.array_distinct(
            F.filter(
                F.split(normalized_text(F.col(text_col)), " "),
                lambda x: x != "",
            )
        ).alias("arr"),
    ).filter(F.size("arr") > 0)
    toks = _pin(toks, name="prefix_jaccard_toks")

    post = toks.select("doc", F.size("arr").alias("s"), F.explode("arr").alias("token"))
    dfreq = post.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc").orderBy("df", "token")
    pref = (
        post.join(dfreq, "token")
        .withColumn("p", F.row_number().over(w))
        # L = s - ceil(t*s) + 1; doubles multiply identically cross-engine
        .filter(F.col("p") <= F.col("s") - F.ceil(F.lit(t) * F.col("s")) + 1)
        .select("doc", "s", "token")
    )
    a = pref.select(F.col("doc").alias("id_a"), F.col("s").alias("sa"), "token")
    b = pref.select(F.col("doc").alias("id_b"), F.col("s").alias("sb"), "token")
    cand = (
        a.join(b, "token")
        .filter(F.col("id_a") < F.col("id_b"))
        # length filter: Jaccard <= min/max of the sizes
        .filter(
            F.least(F.col("sa"), F.col("sb"))
            >= F.lit(t) * F.greatest(F.col("sa"), F.col("sb"))
        )
        .select("id_a", "id_b", "sa", "sb")
        .distinct()
    )
    va = toks.select(F.col("doc").alias("id_a"), F.col("arr").alias("arr_a"))
    vb = toks.select(F.col("doc").alias("id_b"), F.col("arr").alias("arr_b"))
    verified = (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("i", F.size(F.array_intersect("arr_a", "arr_b")))
        .withColumn(
            "jaccard",
            F.round(F.col("i") / (F.col("sa") + F.col("sb") - F.col("i")), 6),
        )
        .filter(F.col("jaccard") >= t)
        .select("id_a", "id_b", "jaccard")
    )
    return verified
