"""Round-7 query-inventory section (see plans/inventory.py for the
registry discipline). This module is NOT a public entry point —
plans.inventory star-imports it and owns the DRIVER_WINDOW literal and
the merged QUERIES/ORACLES registries.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from ..sources.readers import read_table

    return read_table(spark, sf_dir, name)


PART_QUERIES: dict = {}
PART_ORACLES: dict = {}

# ===========================================================================
# round 7: transaction-log table — create/append/overwrite lifecycle,
# time travel, and zone-map file pruning under one driver hash
# ===========================================================================


def txlog_time_travel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TxLogTable lifecycle (sources/txlog.py) as one hashed result:
    create(v0) + append(v1) + append(v2) + overwrite(v3) of disjoint
    event slices, then aggregate BOTH a time-traveled snapshot read at
    v1 (must see exactly the v0+v1 slices — proves replay ignores the
    later append AND the overwrite) and the latest snapshot read
    through zone-map pruning (must see exactly the overwrite slice —
    proves the overwrite's remove-set replay).

    Each write is range-partitioned on event_id so every data file
    carries a tight min/max zone map; the pruned read asserts in-query
    that the manifest-level skip dropped files BEFORE Spark saw them
    (``DataFrame.inputFiles``), so a silently disabled pruner fails the
    driver row with an error, not a lucky hash. Pruning is metadata-only
    by contract (a file with no stats is kept), so the caller still
    applies the row filter — which is why the hash can be oracle-exact
    while the file list shrinks.

    At 100 TB the read path is a plain distributed parquet scan of the
    live-file list (pushdown/AQE apply); the log is driver-side
    metadata, O(versions mod checkpoint-interval) to replay.

    ORACLE: replays both snapshots from the `events` view by the same
    modulo derivation — v1 = slices {0,1}, latest = slice {3} — with
    the pruned read's row filter applied verbatim.
    """
    import hashlib
    import shutil
    import tempfile

    from ..sources.txlog import TxLogTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"txlog_q_{tag}")
    shutil.rmtree(root, ignore_errors=True)

    ev = _t(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )

    def slice_(r: int) -> DataFrame:
        return ev.filter(F.col("event_id") % 4 == r).repartitionByRange(
            4, "event_id"
        )

    t = TxLogTable.create(root, slice_(0), stat_cols=["event_id"])
    t.append(slice_(1), spark)  # v1
    t.append(slice_(2), spark)  # v2
    t.overwrite(slice_(3).repartitionByRange(8, "event_id"))  # v3

    lo, hi = 1000, 2999
    latest_full = t.read(spark)
    latest_pruned = t.read(spark, prune={"event_id": (lo, hi)})
    if not len(latest_pruned.inputFiles()) < len(latest_full.inputFiles()):
        raise AssertionError(
            "zone-map pruning skipped no files: "
            f"{len(latest_pruned.inputFiles())} of "
            f"{len(latest_full.inputFiles())}"
        )

    def agg(df: DataFrame, snapshot: str) -> DataFrame:
        return df.groupBy("event_type").agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,6)"))
            .cast("double")
            .alias("sum_value"),
            F.max("event_id").alias("max_event_id"),
        ).select(F.lit(snapshot).alias("snapshot"), "*")

    v1 = agg(t.read(spark, version=1), "v1")
    pruned = agg(
        latest_pruned.filter(F.col("event_id").between(lo, hi)),
        "latest_pruned",
    )
    return v1.unionByName(pruned)


TXLOG_TIME_TRAVEL_SQL = """
SELECT 'v1' AS snapshot, event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value,
       MAX(event_id) AS max_event_id
FROM events
WHERE event_id % 4 IN (0, 1)
GROUP BY event_type
UNION ALL
SELECT 'latest_pruned', event_type,
       COUNT(*),
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE),
       MAX(event_id)
FROM events
WHERE event_id % 4 = 3 AND event_id BETWEEN 1000 AND 2999
GROUP BY event_type
"""

PART_QUERIES["txlog_time_travel_events"] = txlog_time_travel_events
PART_ORACLES["txlog_time_travel_events"] = TXLOG_TIME_TRAVEL_SQL


# ===========================================================================
# round 7: IVF-PQ — product-quantized ANN (the memory-bounded index)
# ===========================================================================

_PQ_M = 4  # subspaces (dim 64 -> dsub 16)
_PQ_CODES = 16
_PQ_DSUB = 16


def ann_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ approximate top-5 (operators/similarity.ivfpq_cosine_topk,
    pure-ADC config): coarse IVF routing as in ann_ivf_topk, but probed
    candidates are scored from their ``m=4`` PQ codes against the
    broadcast codebook — the index row carries 4 small ints instead of
    64 doubles, the ~100× at-rest compression that fits a 100 TB
    embedding corpus in probeable memory (Jégou et al. 2011).

    ORACLE: ``ANN_IVFPQ_SQL`` rebuilds the ENTIRE index — hash-sampled
    coarse centroids AND codebooks, per-subspace L2-argmin encoding via
    the same three dot folds (x·x − 2·x·c + c·c, lowest code on ties),
    reconstruction by code lookup, rounded ADC cosine rank — so the
    driver-grade hash covers quantization, encoding, and scoring
    end-to-end, not just the routing.

    This row runs the operator's DEFAULT encode_backend="numpy" (the
    production Arrow/BLAS index build, 56× faster at ×100) against the
    oracle's replay of the exact fold math — the backends are
    property-pinned equal (tests/test_operator_properties.py), so the
    hash doubles as the cross-backend equality check at sf scale.
    """
    from ..operators.similarity import ivfpq_cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ivfpq_cosine_topk(
        emb,
        queries,
        k=5,
        n_centroids=32,
        n_probe=8,
        m_subspaces=_PQ_M,
        n_codes=_PQ_CODES,
    )


ANN_IVFPQ_SQL = f"""
WITH v AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[]))) AS nrm
  FROM embeddings WHERE len(embedding) > 0
), s AS (
  SELECT vec_id, e, nrm FROM v WHERE nrm > 0
), hashed AS (
  SELECT vec_id, e, nrm,
         ('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM s
), cent AS (
  SELECT vec_id AS centroid_id, e AS ce, nrm AS cen
  FROM hashed ORDER BY h LIMIT 32
), cbase AS (
  SELECT vec_id, e FROM hashed ORDER BY h LIMIT {_PQ_CODES}
), cb AS (
  SELECT j.j,
         ROW_NUMBER() OVER (PARTITION BY j.j ORDER BY c.vec_id) - 1 AS code_id,
         c.e[j.j*{_PQ_DSUB}+1 : j.j*{_PQ_DSUB}+{_PQ_DSUB}] AS sub
  FROM cbase c CROSS JOIN (VALUES (0),(1),(2),(3)) j(j)
), assigned AS (
  SELECT vec_id, centroid_id AS cluster FROM (
    SELECT s.vec_id, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
                              ORDER BY list_dot_product(s.e, c.ce) / (s.nrm * c.cen) DESC,
                                       c.centroid_id) AS rn
    FROM s CROSS JOIN cent c
  ) WHERE rn = 1
), codes AS (
  SELECT vec_id, j, code_id FROM (
    SELECT s.vec_id, cb.j, cb.code_id,
           ROW_NUMBER() OVER (
             PARTITION BY s.vec_id, cb.j
             ORDER BY list_dot_product(s.e[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}],
                                       s.e[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}])
                      - 2.0 * list_dot_product(s.e[cb.j*{_PQ_DSUB}+1 : cb.j*{_PQ_DSUB}+{_PQ_DSUB}], cb.sub)
                      + list_dot_product(cb.sub, cb.sub) ASC,
                      cb.code_id ASC) AS rn
    FROM s CROSS JOIN cb
  ) WHERE rn = 1
), recon AS (
  SELECT c.vec_id, flatten(array_agg(cb.sub ORDER BY c.j)) AS re
  FROM codes c JOIN cb ON cb.j = c.j AND cb.code_id = c.code_id
  GROUP BY c.vec_id
), probes AS (
  SELECT vec_id AS query_id, e AS qe, nrm AS qn, centroid_id AS cluster FROM (
    SELECT s.vec_id, s.e, s.nrm, c.centroid_id,
           ROW_NUMBER() OVER (PARTITION BY s.vec_id
                              ORDER BY list_dot_product(s.e, c.ce) / (s.nrm * c.cen) DESC,
                                       c.centroid_id) AS rn
    FROM s CROSS JOIN cent c WHERE s.vec_id < 10
  ) WHERE rn <= 8
), adc AS (
  SELECT p.query_id, a.vec_id AS neighbor_id,
         ROUND(list_dot_product(r.re, p.qe)
               / (sqrt(list_dot_product(r.re, r.re)) * p.qn), 6) AS cosine
  FROM assigned a
  JOIN probes p ON a.cluster = p.cluster AND a.vec_id <> p.query_id
  JOIN recon r ON r.vec_id = a.vec_id
)
SELECT query_id, neighbor_id, cosine,
       ROW_NUMBER() OVER (PARTITION BY query_id
                          ORDER BY cosine DESC, neighbor_id) AS rank
FROM adc
QUALIFY rank <= 5
"""

PART_QUERIES["ann_ivfpq_topk"] = ann_ivfpq_topk
PART_ORACLES["ann_ivfpq_topk"] = ANN_IVFPQ_SQL


# ===========================================================================
# round 7: txlog change data feed — per-commit I/U/D under an oracle hash
# ===========================================================================


def txlog_change_feed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-commit change feed of a txlog table
    (sources/txlog.TxLogTable.change_feed): create → overwrite (drops
    some keys, inserts a new slice) → overwrite (bumps the new slice's
    value), then the feed from version 0 — one I/U/D row per changed
    key per commit, tagged ``_commit_version``. Exercises all three op
    classes AND the D-rows-carry-old-values / I-U-carry-new-values
    contract of snapshot_diff under a value hash. Rows whose only
    "change" is NULL→NULL must NOT appear (null-safe comparison).

    ORACLE: replays the three version states from the same modulo
    derivation and emits each commit's expected change rows directly.
    Lives in EXTRA (the lifecycle-row machinery is driver-pinned by
    txlog_time_travel_events; this row adds the diff composition).
    """
    import hashlib
    import shutil
    import tempfile

    from ..sources.txlog import TxLogTable

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    root = os.path.join(tempfile.gettempdir(), f"txlog_cf_{tag}")
    shutil.rmtree(root, ignore_errors=True)

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    a = ev.filter(F.col("event_id") % 3 == 0)
    a_kept = a.filter(F.col("event_id") % 5 != 0)
    b = ev.filter(F.col("event_id") % 3 == 1)

    t = TxLogTable.create(root, a)  # v0: pure inserts
    t.overwrite(a_kept.unionByName(b))  # v1: D (a %5==0), I (b)
    t.overwrite(  # v2: U for b rows with non-null value
        a_kept.unionByName(b.withColumn("value", F.col("value") + 1))
    )
    feed = t.change_feed(spark, keys=["event_id"], from_version=0)
    return feed.select(
        "_commit_version", "op", "event_id", "event_type", "value"
    )


TXLOG_CHANGE_FEED_SQL = """
WITH a AS (
  SELECT event_id, event_type, value FROM events WHERE event_id % 3 = 0
), b AS (
  SELECT event_id, event_type, value FROM events WHERE event_id % 3 = 1
)
SELECT CAST(0 AS BIGINT) AS _commit_version, 'I' AS op,
       event_id, event_type, value
FROM a
UNION ALL
SELECT CAST(1 AS BIGINT), 'D', event_id, event_type, value
FROM a WHERE event_id % 5 = 0
UNION ALL
SELECT CAST(1 AS BIGINT), 'I', event_id, event_type, value
FROM b
UNION ALL
SELECT CAST(2 AS BIGINT), 'U', event_id, event_type, value + 1
FROM b WHERE value IS NOT NULL
"""

PART_QUERIES["txlog_change_feed_events"] = txlog_change_feed_events
PART_ORACLES["txlog_change_feed_events"] = TXLOG_CHANGE_FEED_SQL


# ===========================================================================
# round 7: HTML → text extraction — the web-crawl corpus entry pass
# ===========================================================================

# deterministic per-doc HTML template (both engines concatenate the
# same pieces; a NULL text nulls the whole document in both)
_HTML_PRE = (
    '<html><head><title>Doc &amp; no. '
)
_HTML_MID1 = '</title><style>p{color:red}</style><script>var x="<p>'
_HTML_MID2 = (
    '</p>";</script></head><body><!-- meta --><h1>Section</h1><p>'
)
_HTML_MID3 = '</p><ul><li>alpha</li><li>beta&nbsp;&lt;raw&gt;</li></ul><a href="/nav">nav '
_HTML_POST = '</a><div>tail</div></body></html>'


def html_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML → text over the documents corpus (functions/html.py): each
    doc is wrapped in a deterministic HTML template (title, style +
    script subtrees that MUST be dropped, comments, block tags,
    entities, a nav anchor), then title / visible body / length / link
    density are extracted with the pure-Column regexp chain — the
    first full-corpus pass of a web-crawl pipeline, whole-stage
    codegen, zero UDF.

    ORACLE: the identical strip chain GENERATED FROM THE SAME pattern
    list (``HTML_STRIP_STEPS``/``HTML_ENTITIES`` drive both engines, the
    quality_entropy discipline), so a regex drift between engines —
    or an extraction that leaks script text or misses an entity —
    breaks the hash on every row.
    """
    from ..functions.html import html_link_density, html_title, html_to_text

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    h = F.concat(
        F.lit(_HTML_PRE),
        F.col("doc_id").cast("string"),
        F.lit(_HTML_MID1),
        F.col("doc_id").cast("string"),
        F.lit(_HTML_MID2),
        F.col("text"),
        F.lit(_HTML_MID3),
        F.col("doc_id").cast("string"),
        F.lit(_HTML_POST),
    )
    return docs.select(
        "doc_id",
        html_title(h).alias("title"),
        html_to_text(h).alias("body"),
        F.length(html_to_text(h)).alias("n_chars"),
        html_link_density(h).alias("link_density"),
    )


def _html_sql() -> str:
    from ..functions.html import HTML_ENTITIES, HTML_STRIP_STEPS

    def strip_chain(expr: str) -> str:
        out = expr
        for pat, repl in HTML_STRIP_STEPS:
            r = "chr(10)" if repl == "\n" else f"'{repl}'"
            # 'g' only: dotall/case flags ride inline in the patterns
            out = f"regexp_replace({out}, '{pat}', {r}, 'g')"
        for ent, ch in HTML_ENTITIES:
            c = "''''" if ch == "'" else f"'{ch}'"
            out = f"replace({out}, '{ent}', {c})"
        out = f"regexp_replace({out}, '[ \\t\\r\\f]+', ' ', 'g')"
        out = f"regexp_replace({out}, ' ?\\n ?', chr(10), 'g')"
        out = "regexp_replace(" + out + ", '\\n{2,}', chr(10), 'g')"
        return f"regexp_replace({out}, '(?s)^\\s+|\\s+$', '', 'g')"

    def entity_chain(expr: str) -> str:
        out = expr
        for ent, ch in HTML_ENTITIES:
            c = "''''" if ch == "'" else f"'{ch}'"
            out = f"replace({out}, '{ent}', {c})"
        return out

    title = entity_chain(
        r"regexp_extract(h, '(?is)<title\b[^>]*>(.*?)</title>', 1)"
    )
    anchor = (
        r"array_to_string(regexp_extract_all(h, '(?is)<a\b[^>]*>(.*?)</a>', 1), '')"
    )
    body = strip_chain("h")
    a_text = strip_chain(anchor)
    return f"""
WITH src AS (
  SELECT doc_id,
         '{_HTML_PRE}' || CAST(doc_id AS VARCHAR) || '{_HTML_MID1}'
           || CAST(doc_id AS VARCHAR) || '{_HTML_MID2}' || text
           || '{_HTML_MID3}' || CAST(doc_id AS VARCHAR) || '{_HTML_POST}' AS h
  FROM documents
), ex AS (
  SELECT doc_id, trim({title}, ' ') AS title, {body} AS body,
         length({a_text}) AS a_len
  FROM src
)
SELECT doc_id, title, body, length(body) AS n_chars,
       CASE WHEN body IS NULL THEN NULL
            WHEN length(body) > 0
            THEN ROUND(a_len * 1.0 / length(body), 6)
            ELSE 0.0 END AS link_density
FROM ex
"""


HTML_EXTRACT_SQL = _html_sql()

PART_QUERIES["html_extract_docs"] = html_extract_docs
PART_ORACLES["html_extract_docs"] = HTML_EXTRACT_SQL


# ===========================================================================
# round 7: WARC source — the web-crawl container, byte-framed roundtrip
# ===========================================================================


def s9_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC interchange roundtrip (sources/warc.py): every document is
    framed as a WARC/1.0 response record into ONE per-record-gzipped
    segment (the Common Crawl layout: concatenated gzip members, one
    per record), then read back through the binaryFile + Arrow parse
    stage. Content must survive the header framing, the
    Content-Length byte math on multi-byte UTF-8, and the multi-member
    gzip walk — the oracle recomputes every field from the documents
    table directly, so a one-byte framing error breaks the hash.
    """
    import hashlib
    import tempfile

    from ..sources.warc import read_warc, write_warc

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    seg = os.path.join(tempfile.gettempdir(), f"warc_docs_{tag}.warc.gz")
    docs = sorted(
        _t(spark, sf_dir, "documents").select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    records = [
        (
            {
                "WARC-Type": "response",
                "WARC-Record-ID": f"<urn:uuid:doc-{d['doc_id']}>",
                "WARC-Target-URI": f"https://example.org/doc/{d['doc_id']}",
                "WARC-Date": "2026-01-01T00:00:00Z",
                "Content-Type": "text/plain",
            },
            (d["text"] or "").encode("utf-8"),
        )
        for d in docs
    ]
    write_warc(records, seg, gzip_mode="record")
    rows = read_warc(spark, seg)
    return rows.select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        "warc_type",
        "content_length",
        F.col("payload").cast("string").alias("text_back"),
    )


S9_WARC_SQL = """
SELECT doc_id, 'response' AS warc_type,
       CAST(octet_length(encode(COALESCE(text, ''))) AS BIGINT)
         AS content_length,
       COALESCE(text, '') AS text_back
FROM documents
"""

PART_QUERIES["s9_warc_roundtrip"] = s9_warc_roundtrip
PART_ORACLES["s9_warc_roundtrip"] = S9_WARC_SQL


def crawl_ingest_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl entry pipeline end-to-end: documents framed as HTML
    inside WARC response records (per-record gzip, the Common Crawl
    layout) → WARC parse → HTML → text extraction → quality gate
    (length + link-density keep flag). Byte-level composition proof:
    multi-byte UTF-8 survives gzip members, Content-Length framing,
    the binary→string cast, AND the regex strip chain, or the hash
    breaks.

    ORACLE: rebuilds the same HTML from the documents table and
    replays the generated strip chain (shared pattern lists) plus the
    keep-flag predicate — no WARC needed oracle-side, which is the
    point: the transport must be lossless.
    """
    import hashlib
    import tempfile

    from ..functions.html import html_link_density, html_title, html_to_text
    from ..sources.warc import read_warc, write_warc

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    seg = os.path.join(tempfile.gettempdir(), f"warc_crawl_{tag}.warc.gz")
    docs = sorted(
        _t(spark, sf_dir, "documents").select("doc_id", "text").collect(),
        key=lambda r: r["doc_id"],
    )
    records = []
    for d in docs:
        if d["text"] is None:
            continue  # a crawler has no page to archive
        i = d["doc_id"]
        page = (
            f"{_HTML_PRE}{i}{_HTML_MID1}{i}{_HTML_MID2}{d['text']}"
            f"{_HTML_MID3}{i}{_HTML_POST}"
        )
        records.append(
            (
                {
                    "WARC-Type": "response",
                    "WARC-Record-ID": f"<urn:uuid:doc-{i}>",
                    "WARC-Target-URI": f"https://example.org/doc/{i}",
                    "WARC-Date": "2026-01-01T00:00:00Z",
                    "Content-Type": "text/html",
                },
                page.encode("utf-8"),
            )
        )
    write_warc(records, seg, gzip_mode="record")

    h = F.col("payload").cast("string")
    body = html_to_text(h)
    ld = html_link_density(h)
    return read_warc(spark, seg).select(
        F.regexp_extract("target_uri", r"/doc/(\d+)$", 1)
        .cast("long")
        .alias("doc_id"),
        html_title(h).alias("title"),
        F.length(body).alias("n_chars"),
        ld.alias("link_density"),
        ((F.length(body) >= 200) & (ld <= F.lit(0.2))).alias("keep"),
    )


def _crawl_sql() -> str:
    # the html_extract oracle's CTEs, restricted to crawlable rows and
    # finished with the keep-flag predicate
    inner = HTML_EXTRACT_SQL.strip().rstrip()
    return f"""
WITH extracted AS ({inner})
SELECT doc_id, title, n_chars, link_density,
       (n_chars >= 200 AND link_density <= 0.2) AS keep
FROM extracted
WHERE body IS NOT NULL
"""


CRAWL_INGEST_SQL = _crawl_sql()

PART_QUERIES["crawl_ingest_pipeline"] = crawl_ingest_pipeline
PART_ORACLES["crawl_ingest_pipeline"] = CRAWL_INGEST_SQL
