"""Query-inventory section split out of plans/inventory.py (round-6
item 9: no file >2,500 lines). This module is NOT a public entry
point — plans.inventory star-imports it and owns the single
DRIVER_WINDOW literal and the merged QUERIES/ORACLES registries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..functions.dates import edad_unidad, edad_valor, parse_js_timestamp
from ..functions.strings import split_full_name
from ..functions.text import (
    PII_PATTERNS,
    doc_fingerprint,
    lang_id,
    normalized_text,
    pii_counts,
    pii_redact,
    quality_features,
    repeated_ngram_ratio,
    token_count,
)
from ..operators.dedupe import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from ..operators.marking import capped_group_mark, gap_anchor_mark, sessionize
from ..operators.multimodal import extract_features
from ..operators.relational import first_flag, keep_first
from ..operators.sampling import stratified_sample
from ..operators.similarity import cosine_topk, ivf_cosine_topk, lsh_cosine_topk
from ..sources.readers import ROW_ID, load_fact_files
from .sendas_driver_query import SENDAS_FULL_SQL, sendas_full_pipeline
from .tpch import TPCH_ORACLES, TPCH_QUERIES


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_table

    return read_table(spark, sf_dir, name)


def _dec_sum(col, scale: int = 6):
    """Order-insensitive exact sum: cast each term to DECIMAL, sum, back
    to double. DuckDB mirror: SUM(CAST(x AS DECIMAL(18,6)))::DOUBLE."""
    return F.sum(col.cast("decimal(18,6)")).cast("double")



from .inv_relational import *  # noqa: F401,F403 — earlier sections' helpers
from .inv_corpus import *  # noqa: F401,F403 — earlier sections' helpers
from .inv_round4 import *  # noqa: F401,F403 — earlier sections' helpers

# Queries registered by THIS module; plans.inventory merges them
# into the global EXTRA registries after the base literals.
from .inv_corpus import (  # noqa: E402 — underscore helpers star-import skips
    _TOKS_SQL,
    _stream_events,
)
from .inv_round4 import (  # noqa: E402 — underscore helpers star-import skips
    _BM25_QS_VALUES,
    _BM25_QUERIES,
)

PART_QUERIES: dict = {}
PART_ORACLES: dict = {}

# ===========================================================================
# round 5: exact duplicate substrings (Lee et al. 2022 span dedup)
# ===========================================================================

def dedup_substring_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-substring detection over the corpus
    (operators/dedupe.substring_dedup_spans): every 8-token window
    whose content occurs anywhere else (ordered by (doc, pos); the
    global first occurrence is canonical) is a duplicate; overlapping
    and adjacent duplicate windows merge into maximal spans — the
    repeated-passage cut document-level dedup cannot see (licenses,
    boilerplate headers, quoted chains).

    ORACLE: same portable md5-60 fingerprints, same
    groupBy-min-canonical rule, same gaps-and-islands merge in plain
    SQL — one wrong slice bound or tie order anywhere breaks the
    hash."""
    from ..operators.dedupe import substring_dedup_spans

    docs = _t(spark, sf_dir, "documents")
    return substring_dedup_spans(docs, id_col="doc_id", text_col="text", k=8)


SUBSTRING_SPANS_SQL = """
WITH t AS (
  SELECT doc_id,
         list_filter(string_split(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' '),
                     x -> x != '') AS toks
  FROM documents
  WHERE text IS NOT NULL
), sh AS (
  SELECT doc_id, CAST(i AS BIGINT) AS pos,
         ('0x' || substr(md5(array_to_string(toks[i + 1 : i + 8], ' ')), 1, 15))::BIGINT AS fp,
         doc_id * 1000000 + i AS ord
  FROM t, LATERAL unnest(generate_series(0, len(toks) - 8)) AS u(i)
  WHERE len(toks) >= 8
), firsts AS (
  SELECT fp, MIN(ord) AS first_ord, COUNT(*) AS cnt
  FROM sh GROUP BY fp
), dups AS (
  SELECT sh.doc_id, sh.pos
  FROM sh JOIN firsts USING (fp)
  WHERE cnt > 1 AND ord != first_ord
), brk AS (
  SELECT doc_id, pos,
         CASE WHEN pos > COALESCE(MAX(pos + 8) OVER (
                PARTITION BY doc_id ORDER BY pos
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
              THEN 1 ELSE 0 END AS b
  FROM dups
), isl AS (
  SELECT doc_id, pos,
         SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
  FROM brk
)
SELECT doc_id,
       MIN(pos) AS span_start,
       MAX(pos) + 8 AS span_end,
       COUNT(*) AS n_windows
FROM isl
GROUP BY doc_id, island
"""

PART_QUERIES["dedup_substring_spans_docs"] = dedup_substring_spans_docs
PART_ORACLES["dedup_substring_spans_docs"] = SUBSTRING_SPANS_SQL


# ===========================================================================
# round 5: point-in-time enrichment against the SCD2 history
# ===========================================================================

def j_pit_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join: probe events look up the SCD2 version
    valid AT their timestamp — the every-feature-store primitive that
    prevents label leakage (training rows must see the dimension as it
    WAS, not as it is). The history is built by scd2_user_state_history
    machinery; probes are a deterministic event sample looking up the
    state one hour BEFORE their own timestamp (a strictly-past lookup,
    the leakage-safe convention).

    Spark-first: the interval probe [valid_from, valid_to) is
    re-expressed as the union+window AS-OF join (operators/relational
    .asof_join — one equi-key shuffle, no range join, skew-safe);
    empty [T, T) intervals (two state changes at one instant) are
    dropped in both engines, which is exactly what makes the as-of
    forward-fill equivalent to interval semantics. The ORACLE checks
    the equivalence the hard way: a plain BETWEEN-style interval join
    in SQL must hash-match the window formulation."""
    from ..operators.relational import asof_join, scd2_history

    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    hist = scd2_history(ev, "user_id", ["ts", "event_id"], "event_type")
    versions = hist.filter(
        F.col("valid_to").isNull() | (F.col("valid_to") != F.col("valid_from"))
    ).select("user_id", F.col("valid_from").alias("pts"), "state")
    probes = ev.filter(F.col("event_id") % 7 == 0).select(
        "user_id",
        "event_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("pts"),
    )
    out = asof_join(
        probes,
        versions,
        on=["user_id"],
        ts_col="pts",
        payload_cols=["state"],
        right_ts_alias="version_from",
    )
    return out.select(
        "user_id",
        "event_id",
        F.date_format("pts", "yyyy-MM-dd HH:mm:ss").alias("probe_ts"),
        F.col("right_state").alias("state"),
        F.date_format("version_from", "yyyy-MM-dd HH:mm:ss").alias(
            "version_from"
        ),
    )


PIT_SCD2_SQL = """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN LAG(event_type) OVER w IS NOT DISTINCT FROM event_type
              THEN 0 ELSE 1 END AS chg
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS seg
  FROM o
), g AS (
  SELECT user_id, seg, event_type AS state, MIN(ts) AS valid_from
  FROM s GROUP BY 1, 2, 3
), hist AS (
  SELECT user_id, state, valid_from,
         LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY seg) AS valid_to
  FROM g
), versions AS (
  SELECT * FROM hist WHERE valid_to IS NULL OR valid_to != valid_from
), probes AS (
  SELECT user_id, event_id, ts - INTERVAL 1 HOUR AS pts
  FROM events WHERE event_id % 7 = 0
)
SELECT p.user_id, p.event_id,
       strftime(p.pts, '%Y-%m-%d %H:%M:%S') AS probe_ts,
       v.state,
       strftime(v.valid_from, '%Y-%m-%d %H:%M:%S') AS version_from
FROM probes p
LEFT JOIN versions v
  ON v.user_id = p.user_id
 AND v.valid_from <= p.pts
 AND (v.valid_to IS NULL OR p.pts < v.valid_to)
"""

PART_QUERIES["j_pit_scd2_enrich"] = j_pit_scd2_enrich
PART_ORACLES["j_pit_scd2_enrich"] = PIT_SCD2_SQL


def dedup_semantic_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style cluster-bounded semantic dedup over the embedding
    corpus (operators/similarity.semantic_dedup): deterministic md5-60
    centroid sample, broadcast argmax assignment, intra-cluster-only
    pair scan, min-id canonical. The pair universe is Σ|cluster|²
    instead of |corpus|² — the third sub-quadratic pair-generation
    family beside LSH buckets and posting lists.

    Threshold 0.40 sits just under this synthetic corpus's max pairwise
    cosine (~0.49 — vectors are near-uniform; real text embeddings use
    ~0.95+), flagging 19 of 500 rows at sf0.01 so both branches of the
    is_dup flag are exercised.

    ORACLE: ``DEDUP_SEMANTIC_SQL`` rebuilds the identical index —
    same centroid hash order, same argmax tie-break, same rounded
    cosine threshold — so the driver hash covers cluster ids AND the
    flag for every row."""
    from ..operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding", n_clusters=16, threshold=0.40
    )


DEDUP_SEMANTIC_SQL = """
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings WHERE len(embedding) > 0
), s AS (
  SELECT vec_id, e, nrm FROM v WHERE nrm > 0
), cent AS (
  SELECT vec_id AS centroid_id, e AS ce, nrm AS cen FROM s
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
  LIMIT 16
), assigned AS (
  SELECT vec_id, e, nrm, centroid_id AS cluster FROM (
    SELECT s.vec_id, s.e, s.nrm, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
                              ORDER BY list_dot_product(s.e, c.ce) / (s.nrm * c.cen) DESC,
                                       c.centroid_id) AS rn
    FROM s CROSS JOIN cent c
  ) WHERE rn = 1
), dup AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.40
)
SELECT a.vec_id, a.cluster,
       CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
FROM assigned a LEFT JOIN dup d ON a.vec_id = d.vec_id
"""

PART_QUERIES["dedup_semantic_docs"] = dedup_semantic_docs
PART_ORACLES["dedup_semantic_docs"] = DEDUP_SEMANTIC_SQL


def dedup_semantic_lloyd_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup at the PAPER's shape (r5 verdict item 3): the hash-seed
    centroids refined by TWO Lloyd k-means rounds before the
    cluster-bounded pair pass, at a corpus-real n_clusters (64 ≈
    |corpus|/8 at this SF). Refined means round to 9 decimals so the
    construction stays deterministic cross-engine.

    ORACLE: ``DEDUP_SEMANTIC_LLOYD_SQL`` replays the ENTIRE refinement
    — seed sample, two assign→mean rounds (element-wise AVG via
    generate_subscripts/unnest, ROUND 9, empty clusters dropped), final
    assignment, pair pass — so the driver-grade hash covers Lloyd
    itself, not just the seeded index."""
    from ..operators.similarity import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, id_col="vec_id", vec_col="embedding",
        n_clusters=64, threshold=0.40, lloyd_iters=2,
    )


def _semantic_lloyd_assign_sql(cent: str, name: str) -> str:
    return f"""{name} AS (
  SELECT vec_id, e, nrm, centroid_id AS cluster FROM (
    SELECT s.vec_id, s.e, s.nrm, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
                              ORDER BY list_dot_product(s.e, c.ce) / (s.nrm * c.cen) DESC,
                                       c.centroid_id) AS rn
    FROM s CROSS JOIN {cent} c
  ) WHERE rn = 1
)"""


def _semantic_lloyd_mean_sql(prev_assigned: str, name: str) -> str:
    return f"""{name} AS (
  SELECT centroid_id, ce, sqrt(list_dot_product(ce, ce)) AS cen FROM (
    SELECT cluster AS centroid_id, list(m ORDER BY idx) AS ce FROM (
      SELECT cluster, idx, ROUND(AVG(val), 9) AS m FROM (
        SELECT cluster, generate_subscripts(e, 1) AS idx, unnest(e) AS val
        FROM {prev_assigned}
      ) GROUP BY cluster, idx
    ) GROUP BY cluster
  ) WHERE sqrt(list_dot_product(ce, ce)) > 0
)"""


DEDUP_SEMANTIC_LLOYD_SQL = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings WHERE len(embedding) > 0
), s AS (
  SELECT vec_id, e, nrm FROM v WHERE nrm > 0
), cent0 AS (
  SELECT vec_id AS centroid_id, e AS ce, nrm AS cen FROM s
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
  LIMIT 64
), {_semantic_lloyd_assign_sql('cent0', 'a0')},
{_semantic_lloyd_mean_sql('a0', 'cent1')},
{_semantic_lloyd_assign_sql('cent1', 'a1')},
{_semantic_lloyd_mean_sql('a1', 'cent2')},
{_semantic_lloyd_assign_sql('cent2', 'assigned')},
dup AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6) >= 0.40
)
SELECT a.vec_id, a.cluster,
       CASE WHEN d.vec_id IS NULL THEN 0 ELSE 1 END AS is_dup
FROM assigned a LEFT JOIN dup d ON a.vec_id = d.vec_id
"""

PART_QUERIES["dedup_semantic_lloyd_docs"] = dedup_semantic_lloyd_docs
PART_ORACLES["dedup_semantic_lloyd_docs"] = DEDUP_SEMANTIC_LLOYD_SQL


def search_hybrid_rrf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/search.hybrid_rrf_topk): the BM25
    keyword queries fused with dense cosine ranking by Reciprocal Rank
    Fusion. Query i pairs the i-th keyword string with the embedding of
    vec_id=i (the query workload is driver-side by definition — same
    contract as the BM25 literal list; the 5-row vector collect is the
    workload, not the corpus). RRF consumes integer ranks only, so the
    fused ordering is exact cross-engine.

    ORACLE: ``SEARCH_HYBRID_RRF_SQL`` replays both branches — the full
    BM25 pipeline at rank<=20 and the brute cosine at rank<=20 with
    self-match kept — and the identical 1/(60+rank) fusion."""
    from ..operators.search import hybrid_rrf_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    by_id = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin([q[0] for q in _BM25_QUERIES]))
        .select("vec_id", "embedding")
        .collect()
    }
    queries = [(qid, text, by_id[qid]) for qid, text in _BM25_QUERIES]
    return hybrid_rrf_topk(docs, emb, queries, k=10, k_each=20, rrf_k=60)


SEARCH_HYBRID_RRF_SQL = f"""
WITH qs(query_id, qtext) AS (VALUES {_BM25_QS_VALUES}),
qterm AS (
  SELECT DISTINCT query_id,
         unnest(list_filter(string_split(trim(regexp_replace(lower(qtext),
                '[^a-z0-9]+', ' ', 'g')), ' '), t -> t <> '')) AS token
  FROM qs
),
docs AS (
  SELECT doc_id, list_filter({{_TOKS}}, t -> t <> '') AS toks FROM documents
),
dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf
  FROM (SELECT doc_id, unnest(toks) AS token FROM docs)
  WHERE token IN (SELECT DISTINCT token FROM qterm)
  GROUP BY 1, 2
),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
bm_scored AS (
  SELECT q.query_id, t.doc_id,
         ROUND(SUM(
           ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
           * t.tf * (1.2 + 1.0)
           / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * l.dl / s.avgdl))
         ), 6) AS score
  FROM qterm q
  JOIN tf t USING (token)
  JOIN dfreq d USING (token)
  JOIN dl l ON l.doc_id = t.doc_id
  CROSS JOIN stats s
  GROUP BY 1, 2
),
bm AS (
  SELECT query_id, doc_id, rn AS rank_b FROM (
    SELECT query_id, doc_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
                              ORDER BY score DESC, doc_id) AS rn
    FROM bm_scored
  ) WHERE rn <= 20
),
v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings WHERE len(embedding) > 0
),
qv AS (SELECT * FROM v WHERE vec_id IN (1, 2, 3, 4, 5) AND nrm > 0),
vec AS (
  SELECT query_id, doc_id, rn AS rank_v FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY ROUND(list_dot_product(c.e, q.e) / (c.nrm * q.nrm), 6) DESC,
                                       c.vec_id) AS rn
    FROM v c CROSS JOIN qv q
    WHERE c.nrm > 0
  ) WHERE rn <= 20
),
fused AS (
  SELECT CAST(COALESCE(b.query_id, x.query_id) AS INTEGER) AS query_id,
         COALESCE(b.doc_id, x.doc_id) AS doc_id,
         ROUND(COALESCE(1.0 / CAST(60 + b.rank_b AS DOUBLE), 0)
               + COALESCE(1.0 / CAST(60 + x.rank_v AS DOUBLE), 0), 6) AS rrf
  FROM bm b FULL OUTER JOIN vec x
    ON b.query_id = x.query_id AND b.doc_id = x.doc_id
)
SELECT query_id, doc_id, rrf,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY rrf DESC, doc_id) AS rank
FROM fused
QUALIFY rank <= 10
""".replace("{_TOKS}", _TOKS_SQL)

PART_QUERIES["search_hybrid_rrf_docs"] = search_hybrid_rrf_docs
PART_ORACLES["search_hybrid_rrf_docs"] = SEARCH_HYBRID_RRF_SQL


def search_hybrid_rrf_ivf_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid RRF with the SUB-LINEAR dense branch — the round-5 scale
    fix: the brute branch scans |corpus|x|queries| pairs no matter what
    (x100 it ran 3.46x the mirror), while vec_path="ivf" scores only
    the n_probe/n_centroids fraction of the corpus nearest each query
    (operators/search.hybrid_rrf_topk -> similarity.ivf_cosine_topk).

    This registered shape keeps lloyd_iters=0 and md5-60 centroid
    sampling so the ORACLE rebuilds the IDENTICAL index in SQL (same
    construction ANN_IVF_SQL verifies); the production recall recipe
    (lloyd=2 + BLAS assignment) is pinned against this fusion by
    tests/test_search_history_urls.py. The assignment backend is
    env-selectable (SENDAS_IVF_BACKEND=numpy) so the scale bench can
    run the BLAS kernel — the exact backend is CodegenFallback and
    its corpus x centroids HOF dots dominate past ~100k vectors — while
    the driver gate stays on the SQL-replayable exact path (the two
    are property-pinned equal)."""
    import os as _os

    from ..operators.search import hybrid_rrf_topk

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    by_id = {
        r["vec_id"]: r["embedding"]
        for r in emb.filter(F.col("vec_id").isin([q[0] for q in _BM25_QUERIES]))
        .select("vec_id", "embedding")
        .collect()
    }
    queries = [(qid, text, by_id[qid]) for qid, text in _BM25_QUERIES]
    return hybrid_rrf_topk(
        docs, emb, queries, k=10, k_each=20, rrf_k=60,
        vec_path="ivf", ivf_centroids=32, ivf_probe=8, ivf_lloyd_iters=0,
        vec_backend=_os.environ.get("SENDAS_IVF_BACKEND", "exact"),
    )


# the brute `vec` CTE swapped for the IVF index CTEs (cent/assigned/
# probes replayed exactly as ANN_IVF_SQL does, self-match KEPT per the
# hybrid contract); everything else — BM25 branch, fusion, top-k — is
# byte-identical to SEARCH_HYBRID_RRF_SQL.
_HYBRID_BRUTE_VEC_CTE = """vec AS (
  SELECT query_id, doc_id, rn AS rank_v FROM (
    SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY ROUND(list_dot_product(c.e, q.e) / (c.nrm * q.nrm), 6) DESC,
                                       c.vec_id) AS rn
    FROM v c CROSS JOIN qv q
    WHERE c.nrm > 0
  ) WHERE rn <= 20
),"""

_HYBRID_IVF_VEC_CTE = """cent AS (
  SELECT vec_id AS centroid_id, e AS ce, nrm AS cen FROM v WHERE nrm > 0
  ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT
  LIMIT 32
),
assigned AS (
  SELECT vec_id, e, nrm, centroid_id AS cluster FROM (
    SELECT s.vec_id, s.e, s.nrm, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
                              ORDER BY list_dot_product(s.e, c.ce) / (s.nrm * c.cen) DESC,
                                       c.centroid_id) AS rn
    FROM v s CROSS JOIN cent c WHERE s.nrm > 0
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, e AS qe, nrm AS qn, centroid_id AS cluster FROM (
    SELECT q.vec_id, q.e, q.nrm, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY list_dot_product(q.e, c.ce) / (q.nrm * c.cen) DESC,
                                       c.centroid_id) AS rn
    FROM qv q CROSS JOIN cent c
  ) WHERE rn <= 8
),
vec AS (
  SELECT query_id, doc_id, rn AS rank_v FROM (
    SELECT p.query_id, a.vec_id AS doc_id,
           ROW_NUMBER() OVER (PARTITION BY p.query_id
                              ORDER BY ROUND(list_dot_product(a.e, p.qe) / (a.nrm * p.qn), 6) DESC,
                                       a.vec_id) AS rn
    FROM assigned a JOIN probes p ON a.cluster = p.cluster
  ) WHERE rn <= 20
),"""

assert _HYBRID_BRUTE_VEC_CTE in SEARCH_HYBRID_RRF_SQL
SEARCH_HYBRID_RRF_IVF_SQL = SEARCH_HYBRID_RRF_SQL.replace(
    _HYBRID_BRUTE_VEC_CTE, _HYBRID_IVF_VEC_CTE
)

PART_QUERIES["search_hybrid_rrf_ivf_docs"] = search_hybrid_rrf_ivf_docs
PART_ORACLES["search_hybrid_rrf_ivf_docs"] = SEARCH_HYBRID_RRF_IVF_SQL


def quality_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram-LM quality score
    (functions/text.bigram_lm_scores): top-256 vocabulary with <unk>
    fallback, add-0.1-smoothed bigram model trained on the corpus
    itself, every >=2-token document scored by mean bigram
    log-probability — the CCNet perplexity-filter shape with the model
    small enough to replay exactly in SQL.

    ORACLE: ``QUALITY_LM_SQL`` retrains the identical model (same
    tokenizer, same frequency/tie vocabulary cut, same smoothing) and
    rescore — vocabulary choice, counts, and every rounded score are
    all hash-covered."""
    from ..functions.text import bigram_lm_scores

    docs = _t(spark, sf_dir, "documents")
    return bigram_lm_scores(docs, id_col="doc_id", text_col="text", vocab_k=256, alpha=0.1)


QUALITY_LM_SQL = f"""
WITH docs AS (
  SELECT doc_id, list_filter({_TOKS_SQL}, t -> t <> '') AS toks FROM documents
),
tok AS (SELECT unnest(toks) AS token FROM docs),
vocab AS (
  SELECT token FROM (SELECT token, COUNT(*) AS freq FROM tok GROUP BY 1)
  ORDER BY freq DESC, token LIMIT 256
),
vsize AS (SELECT COUNT(*) + 1 AS v FROM vocab),
big AS (
  SELECT doc_id, unnest(list_zip(toks[:len(toks)-1], toks[2:])) AS z
  FROM docs WHERE len(toks) >= 2
),
pairs AS (
  SELECT doc_id,
         CASE WHEN z[1] IN (SELECT token FROM vocab) THEN z[1] ELSE '<unk>' END AS w1,
         CASE WHEN z[2] IN (SELECT token FROM vocab) THEN z[2] ELSE '<unk>' END AS w2
  FROM big
),
c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2),
c1 AS (SELECT w1, SUM(c12) AS c1 FROM c12 GROUP BY 1)
SELECT g.doc_id, COUNT(*) AS n_bigrams,
       ROUND(AVG(ln((c.c12 + 0.1) / (u.c1 + 0.1 * s.v))), 6) AS lm_score
FROM pairs g JOIN c12 c USING (w1, w2) JOIN c1 u USING (w1) CROSS JOIN vsize s
GROUP BY 1
"""

PART_QUERIES["quality_lm_perplexity"] = quality_lm_perplexity
PART_ORACLES["quality_lm_perplexity"] = QUALITY_LM_SQL


def j_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter semi-join prefilter
    (operators/sketches.bloom_build/bloom_filter_probe): the urgent
    orders' keys compress into a 64512-bit filter (<=1024 rows), and
    every distinct lineitem orderkey is tagged with membership by
    broadcast bit tests — no shuffle touches the probe side. ~0.2%
    false positives at this load factor (measured 30 of 11813
    non-members at sf0.01), zero false negatives by construction — the
    cross-job, at-rest twin of Catalyst's runtime bloom injection.

    ORACLE: ``J_BLOOM_SQL`` rebuilds the identical filter (same md5
    double-hashing, same 63-bit words) and replays every bit test, so
    the hash covers the exact false-positive set, not just counts."""
    from ..operators.sketches import bloom_build, bloom_filter_probe

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    bloom = bloom_build(
        orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
            "o_orderkey"
        ).distinct(),
        "o_orderkey",
        m_words=1024,
        k_hashes=3,
    )
    probes = li.select("l_orderkey").distinct()
    return bloom_filter_probe(
        probes, "l_orderkey", bloom, m_words=1024, k_hashes=3
    )


J_BLOOM_SQL = """
WITH build AS (
  SELECT DISTINCT o_orderkey AS v FROM orders WHERE o_orderpriority = '1-URGENT'
),
bh AS (
  SELECT v,
         ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT AS h1,
         ('0x' || substr(md5(CAST(v AS VARCHAR)), 16, 15))::BIGINT AS h2
  FROM build
),
bpos AS (
  SELECT ((h1 + i * h2) % 64512) AS p FROM bh, UNNEST([0, 1, 2]) AS t(i)
),
bloom AS (
  SELECT CAST(p // 63 AS INT) AS w, bit_or(1::BIGINT << CAST(p % 63 AS INT)) AS bits
  FROM bpos GROUP BY 1
),
probes AS (SELECT DISTINCT l_orderkey AS v FROM lineitem),
ph AS (
  SELECT v,
         ('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15))::BIGINT AS h1,
         ('0x' || substr(md5(CAST(v AS VARCHAR)), 16, 15))::BIGINT AS h2
  FROM probes
),
ppos AS (
  SELECT v, ((h1 + i * h2) % 64512) AS p FROM ph, UNNEST([0, 1, 2]) AS t(i)
),
ptest AS (
  SELECT ppos.v,
         CASE WHEN (COALESCE(b.bits, 0) >> CAST(p % 63 AS INT)) & 1 = 1
              THEN 1 ELSE 0 END AS f
  FROM ppos LEFT JOIN bloom b ON b.w = CAST(p // 63 AS INT)
)
SELECT v AS l_orderkey, CAST(MIN(f) AS INT) AS might_contain
FROM ptest GROUP BY 1
"""

PART_QUERIES["j_bloom_prefilter"] = j_bloom_prefilter
PART_ORACLES["j_bloom_prefilter"] = J_BLOOM_SQL


def sketch_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile sketch (operators/sketches.quantile_sketch):
    per-returnflag bottom-256-by-row-hash sample of l_extendedprice,
    nearest-rank p50/p90/p99 estimates — the quantile member of the
    sketch family (KMV = cardinality, CMS = frequency). The sample
    rides the same exact merge law as KMV, so day-level sketches roll
    up without re-touching raw rows; rank error O(1/sqrt(k)) is
    property-tested against the exact percentiles.

    ORACLE: ``SKETCH_QUANTILES_SQL`` replays the identical row hashes,
    the identical bottom-k cut, and the identical nearest-rank pick, so
    the estimates match bit-for-bit."""
    from ..operators.sketches import quantile_estimate, quantile_sketch

    li = _t(spark, sf_dir, "lineitem")
    sk = quantile_sketch(
        li,
        ["l_returnflag"],
        "l_extendedprice",
        id_cols=["l_orderkey", "l_linenumber"],
        k=256,
    )
    return sk.select(
        "l_returnflag",
        F.size("qsk").alias("n_sample"),
        quantile_estimate("qsk", 0.5).alias("p50"),
        quantile_estimate("qsk", 0.9).alias("p90"),
        quantile_estimate("qsk", 0.99).alias("p99"),
    )


SKETCH_QUANTILES_SQL = """
WITH s AS (
  SELECT l_returnflag,
         ('0x' || substr(md5(CAST(l_orderkey AS VARCHAR) || '|' ||
                             CAST(l_linenumber AS VARCHAR)), 1, 15))::BIGINT AS hv,
         CAST(l_extendedprice AS DOUBLE) AS v
  FROM lineitem
), r AS (
  SELECT l_returnflag, v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY hv) AS rn
  FROM s
), smp AS (
  SELECT l_returnflag, v FROM r WHERE rn <= 256
), o AS (
  SELECT l_returnflag, v,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY v) - 1 AS i,
         COUNT(*) OVER (PARTITION BY l_returnflag) AS n
  FROM smp
)
SELECT l_returnflag,
       CAST(MAX(n) AS INT) AS n_sample,
       MAX(CASE WHEN i = CAST(FLOOR(0.5  * (n - 1)) AS BIGINT) THEN v END) AS p50,
       MAX(CASE WHEN i = CAST(FLOOR(0.9  * (n - 1)) AS BIGINT) THEN v END) AS p90,
       MAX(CASE WHEN i = CAST(FLOOR(0.99 * (n - 1)) AS BIGINT) THEN v END) AS p99
FROM o GROUP BY 1
"""

PART_QUERIES["sketch_quantiles_price"] = sketch_quantiles_price
PART_ORACLES["sketch_quantiles_price"] = SKETCH_QUANTILES_SQL


def streaming_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The quantile sketch maintained on a stream
    (streaming/sessions.quantile_sketch_stream): per event_type,
    GroupState holds exactly the bottom-128 (row-hash, value) pairs —
    fixed-size state on an unbounded feed. The bottom-k cut is
    order-insensitive, so micro-batching cannot change the sample: the
    streamed sketch equals the batch sketch bit-for-bit and the ORACLE
    replays hashes, cut, count, and nearest-rank estimates exactly from
    the same rows in SQL."""
    from ..streaming.sessions import quantile_sketch_stream, run_stream_to_memory

    stream = _stream_events(spark, sf_dir).select("event_type", "event_id", "value")
    sk = quantile_sketch_stream(
        stream, group_col="event_type", value_col="value", id_col="event_id", k=128
    )
    run_stream_to_memory(sk, "quantile_sketch_stream", output_mode="update")
    snap = spark.table("quantile_sketch_stream")
    w = Window.partitionBy("event_type").orderBy(F.col("n_seen").desc())
    final = snap.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1)
    vals = F.sort_array(F.col("vs"))
    p = lambda q: F.element_at(  # noqa: E731 — nearest-rank pick, same as batch
        vals, (F.floor(F.lit(q) * (F.size(vals) - 1)) + 1).cast("int")
    )
    return final.select(
        "event_type",
        "n_seen",
        F.size("vs").alias("n_sample"),
        p(0.5).alias("p50"),
        p(0.9).alias("p90"),
    )


STREAM_QUANTILES_SQL = """
WITH s AS (
  SELECT event_type,
         ('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT AS hv,
         CAST(value AS DOUBLE) AS v
  FROM events
), r AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY hv) AS rn
  FROM s
), smp AS (
  SELECT event_type, v FROM r WHERE rn <= 128
), o AS (
  SELECT event_type, v,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v) - 1 AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM smp
), tot AS (
  SELECT event_type, COUNT(*) AS n_seen FROM s GROUP BY 1
)
SELECT o.event_type,
       MAX(t.n_seen) AS n_seen,
       CAST(MAX(o.n) AS INT) AS n_sample,
       MAX(CASE WHEN o.i = CAST(FLOOR(0.5 * (o.n - 1)) AS BIGINT) THEN o.v END) AS p50,
       MAX(CASE WHEN o.i = CAST(FLOOR(0.9 * (o.n - 1)) AS BIGINT) THEN o.v END) AS p90
FROM o JOIN tot t USING (event_type)
GROUP BY 1
"""

PART_QUERIES["streaming_quantile_sketch"] = streaming_quantile_sketch
PART_ORACLES["streaming_quantile_sketch"] = STREAM_QUANTILES_SQL


def a_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets (basket =
    distinct parts on one order): frequent pairs at min_support 3, both
    rule directions scored with confidence = supp(a,b)/supp(a) and
    lift = confidence / (supp(b)/N), top-50 by lift — the Apriori-2
    pattern every recommender pipeline starts from.

    Plan shape at scale: pair generation is the per-basket self-join —
    quadratic ONLY in basket size (orders hold ≤13 distinct parts here;
    production caps pathological baskets the same way the dedup
    inverted index df-cuts hot postings); the pair aggregate map-side
    combines to the frequent-pair universe, and item supports join on
    the pair table (item-universe-sized, broadcast here, shuffle at
    catalog scale). Confidences/lifts are integer ratios in doubles —
    deterministic — rounded to 6 before the rank window.

    The distinct basket table feeds FOUR consumers (the eager
    n_baskets count, item supports, both self-join sides), so it is
    pinned via the pluggable materializer. Measured honestly: the pin
    buys ~7 % at ×10 sf0.1 (8.10 → 7.51 s) — the per-basket pair join
    + aggregate dominates, not the repeated distinct — but it also
    caps the cost of adding consumers, and at 100 TB it turns four
    fact scans into one.

    ORACLE: ``A_ASSOC_RULES_SQL`` replays baskets, supports, both rule
    directions, and the lift-ranked cutoff."""
    from ..materialize import materialize

    li = _t(spark, sf_dir, "lineitem")
    b = materialize(
        li.select(
            F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
        ).distinct(),
        name="assoc_baskets",
    )
    n_baskets = b.select("bk").distinct().count()
    isup = b.groupBy("it").agg(F.count("*").alias("s_item"))
    a = b.select(F.col("bk"), F.col("it").alias("ia"))
    c = b.select(F.col("bk"), F.col("it").alias("ib"))
    pairs = (
        a.join(c, "bk")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("s_pair"))
        .filter(F.col("s_pair") >= 3)
    )
    # both rule directions from the one pair table
    rules = pairs.select(
        F.col("ia").alias("antecedent"), F.col("ib").alias("consequent"), "s_pair"
    ).unionByName(
        pairs.select(
            F.col("ib").alias("antecedent"), F.col("ia").alias("consequent"), "s_pair"
        )
    )
    rules = (
        rules.join(
            F.broadcast(isup.select(F.col("it").alias("antecedent"),
                                    F.col("s_item").alias("s_ante"))),
            "antecedent",
        )
        .join(
            F.broadcast(isup.select(F.col("it").alias("consequent"),
                                    F.col("s_item").alias("s_cons"))),
            "consequent",
        )
        .select(
            "antecedent",
            "consequent",
            "s_pair",
            F.round(F.col("s_pair") / F.col("s_ante"), 6).alias("confidence"),
            F.round(
                (F.col("s_pair") / F.col("s_ante"))
                / (F.col("s_cons") / F.lit(float(n_baskets))),
                6,
            ).alias("lift"),
        )
    )
    w = Window.orderBy(F.col("lift").desc(), F.col("antecedent"), F.col("consequent"))
    return (
        rules.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 50)
    )


A_ASSOC_RULES_SQL = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
),
nb AS (SELECT COUNT(DISTINCT bk) AS n FROM b),
isup AS (SELECT it, COUNT(*) AS s_item FROM b GROUP BY 1),
pairs AS (
  SELECT a.it AS ia, c.it AS ib, COUNT(*) AS s_pair
  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
  GROUP BY 1, 2
  HAVING COUNT(*) >= 3
),
rules AS (
  SELECT ia AS antecedent, ib AS consequent, s_pair FROM pairs
  UNION ALL
  SELECT ib AS antecedent, ia AS consequent, s_pair FROM pairs
),
scored AS (
  SELECT r.antecedent, r.consequent, r.s_pair,
         ROUND(r.s_pair / sa.s_item, 6) AS confidence,
         ROUND((r.s_pair / sa.s_item) / (sc.s_item / CAST(nb.n AS DOUBLE)), 6) AS lift
  FROM rules r
  JOIN isup sa ON sa.it = r.antecedent
  JOIN isup sc ON sc.it = r.consequent
  CROSS JOIN nb
)
SELECT antecedent, consequent, s_pair, confidence, lift,
       ROW_NUMBER() OVER (ORDER BY lift DESC, antecedent, consequent) AS rank
FROM scored
QUALIFY rank <= 50
"""

PART_QUERIES["a_association_rules"] = a_association_rules
PART_ORACLES["a_association_rules"] = A_ASSOC_RULES_SQL


def graph_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts (operators/graph.triangle_counts,
    degree-oriented compact-forward) on the part co-purchase graph —
    edges between parts co-ordered in ≥2 baskets (the same graph the
    association rules mine; 3445 edges / 61 triangles at sf0.01).
    Local closure is the community/quality signal PageRank's global
    rank cannot see.

    ORACLE: ``GRAPH_TRIANGLES_SQL`` replays canonicalization, degrees,
    the (deg, id) orientation, the wedge join, and the membership
    check."""
    from ..operators.graph import triangle_counts

    li = _t(spark, sf_dir, "lineitem")
    b = li.select(
        F.col("l_orderkey").alias("bk"), F.col("l_partkey").alias("it")
    ).distinct()
    e = (
        b.select("bk", F.col("it").alias("src"))
        .join(b.select("bk", F.col("it").alias("dst")), "bk")
        .filter(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count("*").alias("s"))
        .filter(F.col("s") >= 2)
        .select("src", "dst")
    )
    return triangle_counts(e)


GRAPH_TRIANGLES_SQL = """
WITH b AS (
  SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem
),
canon AS (
  SELECT a.it AS a, c.it AS b
  FROM b a JOIN b c ON a.bk = c.bk AND a.it < c.it
  GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
deg AS (
  SELECT node, COUNT(*) AS deg FROM (
    SELECT a AS node FROM canon UNION ALL SELECT b AS node FROM canon
  ) GROUP BY 1
),
fwd AS (
  SELECT CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND c.a < c.b)
              THEN c.a ELSE c.b END AS u,
         CASE WHEN da.deg < db.deg OR (da.deg = db.deg AND c.a < c.b)
              THEN c.b ELSE c.a END AS v
  FROM canon c
  JOIN deg da ON da.node = c.a
  JOIN deg db ON db.node = c.b
),
wedges AS (
  SELECT e1.u, e1.v AS x, e2.v AS y
  FROM fwd e1 JOIN fwd e2 ON e1.u = e2.u AND e1.v < e2.v
),
tris AS (
  SELECT w.u, w.x, w.y
  FROM wedges w JOIN canon c ON c.a = w.x AND c.b = w.y
)
SELECT node, COUNT(*) AS triangles FROM (
  SELECT u AS node FROM tris
  UNION ALL SELECT x FROM tris
  UNION ALL SELECT y FROM tris
) GROUP BY 1
"""

PART_QUERIES["graph_triangle_counts"] = graph_triangle_counts
PART_ORACLES["graph_triangle_counts"] = GRAPH_TRIANGLES_SQL


def a_ab_test_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are hash-bucketed into two arms
    (portable md5 of user_id, mod 2 — exactly how production
    experimentation systems assign deterministically, and replayable in
    SQL), and each event_type's value metric is compared across arms
    with a Welch t statistic — the experiment-analysis pass that closes
    the product-analytics family (z-score outliers, funnel, cohort
    retention, chi-square association, per-group OLS).

    One scan, one (event_type, arm) aggregate (map-side combinable sums
    for n/mean/var), then a 10-row reshape — nothing corpus-sized
    survives the aggregate. Null metric values drop (standard
    missing-outcome policy). t is rounded to 6; the pytest float
    compare tolerates the last-ULP variance-merge differences between
    engines."""
    ev = _t(spark, sf_dir, "events")
    armed = ev.select(
        "event_type",
        F.col("value").alias("v"),
        (
            F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % 2
        ).alias("arm"),
    ).filter(F.col("v").isNotNull())
    stats = armed.groupBy("event_type", "arm").agg(
        F.count("*").alias("n"),
        F.avg("v").alias("mean"),
        F.var_samp("v").alias("var"),
    )
    a0 = stats.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n0"),
        F.col("mean").alias("mean0"),
        F.col("var").alias("var0"),
    )
    a1 = stats.filter(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("n1"),
        F.col("mean").alias("mean1"),
        F.col("var").alias("var1"),
    )
    out = a0.join(a1, "event_type")
    t = (F.col("mean1") - F.col("mean0")) / F.sqrt(
        F.col("var1") / F.col("n1") + F.col("var0") / F.col("n0")
    )
    return out.select(
        "event_type",
        "n0",
        "n1",
        F.round("mean0", 6).alias("mean0"),
        F.round("mean1", 6).alias("mean1"),
        F.round(t, 6).alias("welch_t"),
    )


A_AB_TEST_SQL = """
WITH armed AS (
  SELECT event_type, value AS v,
         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
  FROM events WHERE value IS NOT NULL
),
stats AS (
  SELECT event_type, arm, COUNT(*) AS n, AVG(v) AS mean, VAR_SAMP(v) AS var
  FROM armed GROUP BY 1, 2
)
SELECT a0.event_type,
       a0.n AS n0, a1.n AS n1,
       ROUND(a0.mean, 6) AS mean0, ROUND(a1.mean, 6) AS mean1,
       ROUND((a1.mean - a0.mean)
             / sqrt(a1.var / a1.n + a0.var / a0.n), 6) AS welch_t
FROM (SELECT * FROM stats WHERE arm = 0) a0
JOIN (SELECT * FROM stats WHERE arm = 1) a1 USING (event_type)
"""

PART_QUERIES["a_ab_test_readout"] = a_ab_test_readout
PART_ORACLES["a_ab_test_readout"] = A_AB_TEST_SQL


def graph_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-derandomized uniform random walks
    (operators/graph.random_walks): a 4-step walk from every node of
    the customer<->supplier entity graph — the DeepWalk/node2vec
    corpus-generation stage, with every step's neighbor pick
    md5-derandomized so the ORACLE replays all four hops node-for-node
    (``GRAPH_WALKS_SQL`` unrolls the steps as chained CTEs against the
    same rank-indexed adjacency)."""
    from ..operators.graph import random_walks

    orders = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    e0 = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return random_walks(e0, length=4, seed=17)


GRAPH_WALKS_SQL = """
WITH e0 AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
),
und AS (
  SELECT src, dst FROM e0 UNION SELECT dst, src FROM e0
),
adj AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY dst) - 1 AS idx
  FROM und
),
deg AS (SELECT src, COUNT(*) AS deg FROM und GROUP BY 1),
s0 AS (SELECT DISTINCT src AS walk_id, src AS cur FROM und),
s1 AS (
  SELECT w.walk_id, a.dst AS cur
  FROM s0 w
  JOIN deg d ON d.src = w.cur
  JOIN adj a ON a.src = w.cur
   AND a.idx = ('0x' || substr(md5(w.walk_id || '#17#0'), 1, 15))::BIGINT % d.deg
),
s2 AS (
  SELECT w.walk_id, a.dst AS cur
  FROM s1 w
  JOIN deg d ON d.src = w.cur
  JOIN adj a ON a.src = w.cur
   AND a.idx = ('0x' || substr(md5(w.walk_id || '#17#1'), 1, 15))::BIGINT % d.deg
),
s3 AS (
  SELECT w.walk_id, a.dst AS cur
  FROM s2 w
  JOIN deg d ON d.src = w.cur
  JOIN adj a ON a.src = w.cur
   AND a.idx = ('0x' || substr(md5(w.walk_id || '#17#2'), 1, 15))::BIGINT % d.deg
),
s4 AS (
  SELECT w.walk_id, a.dst AS cur
  FROM s3 w
  JOIN deg d ON d.src = w.cur
  JOIN adj a ON a.src = w.cur
   AND a.idx = ('0x' || substr(md5(w.walk_id || '#17#3'), 1, 15))::BIGINT % d.deg
)
SELECT walk_id, 0 AS step, cur AS node FROM s0
UNION ALL SELECT walk_id, 1, cur FROM s1
UNION ALL SELECT walk_id, 2, cur FROM s2
UNION ALL SELECT walk_id, 3, cur FROM s3
UNION ALL SELECT walk_id, 4, cur FROM s4
"""

PART_QUERIES["graph_random_walks"] = graph_random_walks
PART_ORACLES["graph_random_walks"] = GRAPH_WALKS_SQL


def sample_group_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split of the corpus
    (operators/sampling.group_split): the split decision is keyed on a
    hash of ``source`` — the leakage unit, since near-duplicate docs
    share a source — so no source ever spans splits. Emits the per-split
    audit a pipeline records next to the manifest: docs, distinct
    sources, total text bytes. That ``sum(n_sources)`` across the three
    rows equals the corpus' distinct-source count IS the no-leakage
    witness (a source in two splits would double-count), and the oracle
    replays the exact md5 bucket assignment, so parity proves both the
    assignment and the audit.

    Scale shape: the assignment is one scan-local CASE over a hash
    (no shuffle, no RNG — stable under corpus growth: an existing
    source never changes split when new sources arrive); the audit is
    a 3-group aggregate. At 100 TB the split column is typically
    written back partitioned-by-split in the same pass.

    ORACLE: ``SAMPLE_GROUP_SPLIT_SQL``."""
    from ..operators.sampling import group_split

    docs = _t(spark, sf_dir, "documents")
    out = group_split(
        docs, "source", [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    )
    return (
        out.groupBy("split")
        .agg(
            F.count("*").alias("n_docs"),
            F.countDistinct("source").alias("n_sources"),
            F.sum(F.length("text")).alias("text_chars"),
        )
        .orderBy("split")
    )


SAMPLE_GROUP_SPLIT_SQL = """
WITH assigned AS (
  SELECT *,
    CASE
      WHEN ('0x' || substr(md5(CAST(source AS VARCHAR)), 1, 15))::BIGINT % 1000 < 800
        THEN 'train'
      WHEN ('0x' || substr(md5(CAST(source AS VARCHAR)), 1, 15))::BIGINT % 1000 < 900
        THEN 'val'
      ELSE 'test'
    END AS split
  FROM documents
)
SELECT split, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS text_chars
FROM assigned GROUP BY split ORDER BY split
"""

PART_QUERIES["sample_group_split_docs"] = sample_group_split_docs
PART_ORACLES["sample_group_split_docs"] = SAMPLE_GROUP_SPLIT_SQL


def dq_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor (operators/quality_checks.psi_drift):
    PSI of the event value distribution, second half of January vs the
    first, per event_type — the null-calibration deployment (iid halves
    must read PSI ≈ 0; the operator's property test plants real drift
    and reads it back > 0.25). Bin edges freeze from the REFERENCE
    window's min/max (one tiny eager aggregate — the deployed pattern,
    so the monitor itself cannot drift), counts are exact one-scan
    aggregates per side, and +0.5 Laplace smoothing keeps empty bins
    finite and the whole statistic ANSI-replayable.

    ORACLE: ``DQ_PSI_DRIFT_SQL`` replays the split, the frozen edges,
    the clamped equi-width binning, smoothing, and the PSI sum."""
    from ..operators.quality_checks import psi_drift

    ev = _t(spark, sf_dir, "events")
    mid = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ref = ev.filter(F.col("ts") < mid)
    cur = ev.filter(F.col("ts") >= mid)
    return psi_drift(ref, cur, "value", ["event_type"]).orderBy("event_type")


DQ_PSI_DRIFT_SQL = """
WITH ref AS (
  SELECT event_type, value FROM events
  WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND value IS NOT NULL
),
cur AS (
  SELECT event_type, value FROM events
  WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' AND value IS NOT NULL
),
edges AS (SELECT MIN(value) AS lo, MAX(value) AS hi FROM ref),
rb AS (
  SELECT event_type,
         GREATEST(0, LEAST(9, CAST(FLOOR((value - e.lo) / (e.hi - e.lo) * 10)
                                   AS BIGINT))) AS bin,
         COUNT(*) AS n_ref
  FROM ref, edges e GROUP BY 1, 2
),
cb AS (
  SELECT event_type,
         GREATEST(0, LEAST(9, CAST(FLOOR((value - e.lo) / (e.hi - e.lo) * 10)
                                   AS BIGINT))) AS bin,
         COUNT(*) AS n_cur
  FROM cur, edges e GROUP BY 1, 2
),
j AS (
  SELECT COALESCE(rb.event_type, cb.event_type) AS event_type,
         COALESCE(rb.bin, cb.bin) AS bin,
         COALESCE(n_ref, 0) AS n_ref, COALESCE(n_cur, 0) AS n_cur
  FROM rb FULL OUTER JOIN cb
    ON rb.event_type = cb.event_type AND rb.bin = cb.bin
),
terms AS (
  SELECT event_type, n_ref, n_cur,
         ((n_cur + 0.5) / (SUM(n_cur) OVER (PARTITION BY event_type) + 5.0)
          - (n_ref + 0.5) / (SUM(n_ref) OVER (PARTITION BY event_type) + 5.0))
         * LN(((n_cur + 0.5) / (SUM(n_cur) OVER (PARTITION BY event_type) + 5.0))
              / ((n_ref + 0.5) / (SUM(n_ref) OVER (PARTITION BY event_type) + 5.0)))
         AS term
  FROM j
)
SELECT event_type, ROUND(SUM(term), 6) AS psi,
       CAST(SUM(n_ref) AS BIGINT) AS n_ref, CAST(SUM(n_cur) AS BIGINT) AS n_cur
FROM terms GROUP BY event_type ORDER BY event_type
"""

PART_QUERIES["dq_psi_drift"] = dq_psi_drift
PART_ORACLES["dq_psi_drift"] = DQ_PSI_DRIFT_SQL




# ===========================================================================
# round 6: exact all-pairs similarity join via prefix filtering
# ===========================================================================

def dedup_prefix_jaccard_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact token-set Jaccard all-pairs at threshold 0.9 via PREFIX
    FILTERING (operators/dedupe.prefix_jaccard_pairs; Bayardo et al.
    2007 / PPJoin family) — the one sub-quadratic dedup plan with NO
    false negatives at its threshold: candidates join only on each
    doc's rarest L = |d| - ceil(t|d|) + 1 tokens (df-ascending
    canonical order), pairs sharing none cannot reach t by pigeonhole.

    ORACLE: ``DEDUP_PREFIX_JACCARD_SQL`` rebuilds the identical index —
    same tokenizer, same (df, token) canonical order, same prefix cut,
    same exact intersection — so the driver-grade hash covers the
    pruning logic itself: a wrong prefix length or ordering loses or
    invents pairs."""
    from ..operators.dedupe import prefix_jaccard_pairs

    docs = _t(spark, sf_dir, "documents")
    return prefix_jaccard_pairs(docs, id_col="doc_id", text_col="text",
                                threshold=0.9)


DEDUP_PREFIX_JACCARD_SQL = f"""
WITH toks AS (
  SELECT doc_id AS doc,
         unnest(list_distinct(list_filter({{_TOKS}}, t -> t <> ''))) AS token
  FROM documents
), sz AS (
  SELECT doc, COUNT(*) AS s FROM toks GROUP BY 1
), dfreq AS (
  SELECT token, COUNT(*) AS df FROM toks GROUP BY 1
), pref AS (
  SELECT doc, s, token FROM (
    SELECT t.doc, z.s, t.token,
           ROW_NUMBER() OVER (PARTITION BY t.doc
                              ORDER BY d.df, t.token) AS p
    FROM toks t JOIN dfreq d USING (token) JOIN sz z USING (doc)
  ) WHERE p <= s - CEIL(0.9 * s) + 1
), cand AS (
  SELECT DISTINCT a.doc AS id_a, b.doc AS id_b, a.s AS sa, b.s AS sb
  FROM pref a JOIN pref b
    ON a.token = b.token AND a.doc < b.doc
  WHERE LEAST(a.s, b.s) >= 0.9 * GREATEST(a.s, b.s)
), inter AS (
  SELECT c.id_a, c.id_b, c.sa, c.sb, COUNT(*) AS i
  FROM cand c
  JOIN toks ta ON ta.doc = c.id_a
  JOIN toks tb ON tb.doc = c.id_b AND tb.token = ta.token
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b, ROUND(i / (sa + sb - i), 6) AS jaccard
FROM inter
WHERE ROUND(i / (sa + sb - i), 6) >= 0.9
""".replace("{_TOKS}", _TOKS_SQL)

PART_QUERIES["dedup_prefix_jaccard_docs"] = dedup_prefix_jaccard_docs
PART_ORACLES["dedup_prefix_jaccard_docs"] = DEDUP_PREFIX_JACCARD_SQL


# ===========================================================================
# round 6: ordered funnel analysis (first-touch, strict ordering)
# ===========================================================================

def a_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Four-step ordered funnel view → click → signup → purchase over
    the event feed with a 1-day first-touch window
    (operators/timeseries.funnel_steps): step k counts users whose
    earliest valid step-k event strictly follows their matched step-k-1
    event, all inside 1 day of the user's FIRST view (first-touch
    anchoring — the standard product-analytics convention, and the
    property that makes the chain greedy-exact and SQL-replayable).

    ORACLE: ``A_FUNNEL_SQL`` replays the same chained earliest-match
    CTEs, so the driver hash covers the ordering/deadline logic."""
    from ..operators.timeseries import funnel_steps

    ev = _t(spark, sf_dir, "events")
    return funnel_steps(
        ev, steps=["view", "click", "signup", "purchase"],
        user_col="user_id", ts_col="ts", type_col="event_type",
        within="1 day",
    )


A_FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id AS u, MIN(ts) AS t
  FROM events WHERE event_type = 'view' AND ts IS NOT NULL GROUP BY 1
), s1d AS (
  SELECT u, t, t + INTERVAL 1 DAY AS deadline FROM s1
), s2 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS t, ANY_VALUE(r.deadline) AS deadline
  FROM events e JOIN s1d r ON e.user_id = r.u
  WHERE e.event_type = 'click' AND e.ts > r.t AND e.ts <= r.deadline
  GROUP BY 1
), s3 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS t, ANY_VALUE(r.deadline) AS deadline
  FROM events e JOIN s2 r ON e.user_id = r.u
  WHERE e.event_type = 'signup' AND e.ts > r.t AND e.ts <= r.deadline
  GROUP BY 1
), s4 AS (
  SELECT e.user_id AS u, MIN(e.ts) AS t
  FROM events e JOIN s3 r ON e.user_id = r.u
  WHERE e.event_type = 'purchase' AND e.ts > r.t AND e.ts <= r.deadline
  GROUP BY 1
), counts(step_idx, step, n_users) AS (
  SELECT 1, 'view', (SELECT COUNT(*) FROM s1)
  UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
  UNION ALL SELECT 3, 'signup', (SELECT COUNT(*) FROM s3)
  UNION ALL SELECT 4, 'purchase', (SELECT COUNT(*) FROM s4)
)
SELECT CAST(step_idx AS INTEGER) AS step_idx, step,
       CAST(n_users AS BIGINT) AS n_users,
       ROUND(n_users / (SELECT COUNT(*) FROM s1), 6) AS conversion
FROM counts
WHERE (SELECT COUNT(*) FROM s1) > 0
"""

PART_QUERIES["a_funnel_conversion"] = a_funnel_conversion
PART_ORACLES["a_funnel_conversion"] = A_FUNNEL_SQL


def dq_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type two-sample KS drift between the first and second
    half-month of the event feed (operators/quality_checks.ks_drift) —
    the exact, binning-free companion to ``dq_psi_drift``: D =
    sup|ECDF_ref − ECDF_cur| computed over the union of observed
    values with right-continuous tie handling.

    ORACLE: ``DQ_KS_DRIFT_SQL`` replays the identical running-ECDF
    construction (RANGE frame = ties consumed together), so the hash
    covers the tie convention, not just the formula."""
    from ..operators.quality_checks import ks_drift

    ev = _t(spark, sf_dir, "events")
    mid = F.lit("2024-01-16 00:00:00").cast("timestamp")
    ref = ev.filter(F.col("ts") < mid)
    cur = ev.filter(F.col("ts") >= mid)
    return ks_drift(ref, cur, "value", ["event_type"]).orderBy("event_type")


DQ_KS_DRIFT_SQL = """
WITH u AS (
  SELECT event_type, CAST(value AS DOUBLE) AS v, 'r' AS w
  FROM events WHERE ts < TIMESTAMP '2024-01-16 00:00:00' AND value IS NOT NULL
  UNION ALL
  SELECT event_type, CAST(value AS DOUBLE) AS v, 'c' AS w
  FROM events WHERE ts >= TIMESTAMP '2024-01-16 00:00:00' AND value IS NOT NULL
), counts AS (
  SELECT event_type,
         SUM(CASE WHEN w = 'r' THEN 1 ELSE 0 END) AS n_ref,
         SUM(CASE WHEN w = 'c' THEN 1 ELSE 0 END) AS n_cur
  FROM u GROUP BY 1
), stepped AS (
  SELECT event_type, v,
         SUM(CASE WHEN w = 'r' THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY v
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cr,
         SUM(CASE WHEN w = 'c' THEN 1 ELSE 0 END)
           OVER (PARTITION BY event_type ORDER BY v
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
  FROM u
)
SELECT s.event_type,
       ROUND(MAX(ABS(s.cr / c.n_ref - s.cc / c.n_cur)), 6) AS ks,
       CAST(MAX(c.n_ref) AS BIGINT) AS n_ref,
       CAST(MAX(c.n_cur) AS BIGINT) AS n_cur
FROM stepped s JOIN counts c USING (event_type)
WHERE c.n_ref > 0 AND c.n_cur > 0
GROUP BY 1
ORDER BY 1
"""

PART_QUERIES["dq_ks_drift"] = dq_ks_drift
PART_ORACLES["dq_ks_drift"] = DQ_KS_DRIFT_SQL
