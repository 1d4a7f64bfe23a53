"""Property tests for the dedup / similarity / multimodal / marking
operators — the non-SQL-expressible half of the inventory.

Each test backs a specific claim made in the operator docstrings:
minhash-LSH finds exactly the brute-force Jaccard pairs, simhash bits
match an independent Python vote fold, sign-LSH and IVF recall their
planted/true neighbors, multimodal features equal the reference
decoder byte-for-byte, and the R7 gap fold agrees with a direct
Python re-implementation on randomized inputs.
"""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F, types as T

from conftest import SF_ORACLE
from etl_sendas_spark.functions.strings import split_name_py
from etl_sendas_spark.operators.dedupe import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
)
from etl_sendas_spark.operators.marking import gap_anchor_mark
from etl_sendas_spark.operators.multimodal import extract_features, fake_decode
from etl_sendas_spark.operators.relational import anti_join_all_columns
from etl_sendas_spark.operators.similarity import (
    cosine_topk,
    ivf_cosine_topk,
    lsh_cosine_topk,
)
from etl_sendas_spark.sources.readers import load_fact_files


def _docs(spark):
    return spark.read.parquet(f"{SF_ORACLE}/documents.parquet")


# ---------------------------------------------------------------------------
# minhash-LSH vs brute-force Jaccard
# ---------------------------------------------------------------------------

def test_minhash_lsh_matches_bruteforce(spark):
    """With verification on, LSH output ⊆ exact pairs by construction;
    at the corpus's near-dup Jaccard levels (≥0.9) the 16-band scheme
    misses a pair with P < 1e-7, so the sets must be equal."""
    docs = _docs(spark)
    exact = {
        (r["id_a"], r["id_b"])
        for r in ngram_jaccard_pairs(
            docs, "doc_id", "text", n=3, threshold=0.5, max_posting=None
        ).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            docs, "doc_id", "text", num_hashes=64, bands=16, shingle_n=3,
            verify_threshold=0.5,
        ).collect()
    }
    assert exact, "fixture should contain near-duplicate documents"
    assert lsh == exact


def test_minhash_lsh_bucket_cap_degrades_to_chain(spark):
    """max_bucket guard (VERDICT r7, re-shaped r9 per ADVICE): a
    planted block of byte-identical boilerplate docs shares every
    band, so without the cap the bucket self-join goes quadratic in
    the block. With the cap an oversized bucket degrades to per-
    signature-group STARS linked by a representative chain: pair count
    is LINEAR in the block (n-1 surviving pairs, all Jaccard 1, each
    anchored at the family min id since identical docs form one
    signature group), the block still forms ONE connected component at
    DIAMETER 2 (so plain min-label propagation converges — a bucket-
    wide chain would need one round per member), and recall on the
    non-degenerate near-dup pairs (small buckets, untouched by the
    cap) is identical to the uncapped run. Two co-planted identical
    families must each stay internally connected with no verified
    cross-family pair — the scenario where a bucket-wide min-id star
    could drop a family's connectivity whenever the bucket
    representative failed verification against it (ADVICE r8)."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.dedupe import connected_components

    n_boiler = 400
    boiler = spark.range(0, n_boiler).select(
        (F.col("id") + 100000).alias("doc_id"),
        F.lit(
            "subscribe to our newsletter for updates terms of service "
            "privacy policy all rights reserved contact us about careers"
        ).alias("text"),
    )
    n_other = 120
    other = spark.range(0, n_other).select(
        (F.col("id") + 200000).alias("doc_id"),
        F.lit(
            "cookie consent banner accept all manage preferences "
            "functional analytics advertising partners legal notice"
        ).alias("text"),
    )
    docs = (
        _docs(spark).select("doc_id", "text")
        .unionByName(boiler)
        .unionByName(other)
    )

    capped = minhash_lsh_candidates(
        docs, "doc_id", "text", num_hashes=64, bands=16, shingle_n=3,
        verify_threshold=0.5, max_bucket=50,
    ).collect()
    in_block = [
        r
        for r in capped
        if 100000 <= r["id_a"] < 200000 and 100000 <= r["id_b"] < 200000
    ]
    # grouped-star shape: exactly n-1 pairs, every one anchored at the
    # family's min id (identical docs = one signature group), every
    # one an exact duplicate — diameter 2 for downstream CC
    assert len(in_block) == n_boiler - 1
    assert {r["id_a"] for r in in_block} == {100000}
    assert all(r["jaccard"] == 1.0 for r in in_block)
    # each block is one cluster downstream; no verified pair crosses
    # the two dissimilar families
    in_other = [r for r in capped if r["id_a"] >= 200000]
    assert len(in_other) == n_other - 1
    assert not any(
        r["id_a"] >= 100000 and (r["id_a"] < 200000) != (r["id_b"] < 200000)
        for r in capped
        if r["id_b"] >= 100000
    )
    pairs = spark.createDataFrame(
        [(r["id_a"], r["id_b"]) for r in in_block + in_other],
        ["id_a", "id_b"],
    )
    comp = connected_components(pairs, "id_a", "id_b")
    assert comp.select("cluster").distinct().count() == 2

    # recall law: pairs NOT involving the boiler block are exactly the
    # uncapped run's pairs on the original corpus
    base = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_candidates(
            _docs(spark), "doc_id", "text", num_hashes=64, bands=16,
            shingle_n=3, verify_threshold=0.5, max_bucket=None,
        ).collect()
    }
    got = {
        (r["id_a"], r["id_b"])
        for r in capped
        if r["id_a"] < 100000 and r["id_b"] < 100000
    }
    assert got == base


def test_minhash_oversized_keys_join_mode_guard(spark):
    """Degenerate-corpus broadcast guard (VERDICT r12 item 6): with
    ``spark.etl_sendas.minhashOversizedKeys=join`` the oversized-key
    set carries NO broadcast hint — the join strategy is left to AQE's
    runtime size decision, so a pathological corpus (oversized keys
    bounded only by N·bands/max_bucket) can never hit the 8 GB
    broadcast cap / driver OOM. The guarded plan must produce the
    IDENTICAL pair set on a corpus that actually trips the cap."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.dedupe import minhash_lsh_candidates

    boiler = spark.range(0, 200).select(
        (F.col("id") + 100000).alias("doc_id"),
        F.lit(
            "subscribe to our newsletter for updates terms of service "
            "privacy policy all rights reserved contact us about careers"
        ).alias("text"),
    )
    docs = _docs(spark).select("doc_id", "text").unionByName(boiler)

    def pairs():
        return {
            (r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(
                docs, "doc_id", "text", num_hashes=64, bands=16,
                shingle_n=3, verify_threshold=0.5, max_bucket=50,
            ).collect()
        }

    default_pairs = pairs()
    spark.conf.set("spark.etl_sendas.minhashOversizedKeys", "join")
    try:
        # plan-level guard: no broadcast hint on the key set
        lazy = minhash_lsh_candidates(
            docs, "doc_id", "text", num_hashes=64, bands=16,
            shingle_n=3, verify_threshold=0.5, max_bucket=50,
            materialize=False,
        )
        analyzed = lazy._jdf.queryExecution().analyzed().toString()
        assert "ResolvedHint" not in analyzed, analyzed[:2000]
        # result-level: identical verified pair set, cap still applied
        assert pairs() == default_pairs
        assert default_pairs
    finally:
        spark.conf.unset("spark.etl_sendas.minhashOversizedKeys")


# ---------------------------------------------------------------------------
# simhash vs an independent Python vote fold
# ---------------------------------------------------------------------------

def test_simhash_matches_python_vote_fold(spark):
    docs = _docs(spark).limit(30)
    got = {
        r["doc_id"]: r["simhash"]
        for r in simhash_fingerprints(docs, "doc_id", "text").collect()
    }
    # independent fold: reuse Spark only for the per-token hash values
    # (xxhash64 is JVM-side), then vote/fold in plain Python
    toks = (
        docs.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.split(
                        F.trim(
                            F.regexp_replace(F.lower("text"), r"[^a-z0-9]+", " ")
                        ),
                        " ",
                    )
                )
            ).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .withColumn("h", F.xxhash64("tok"))
        .collect()
    )
    votes: dict[int, list[int]] = {}
    for r in toks:
        v = votes.setdefault(r["doc_id"], [0] * 64)
        for i in range(64):
            v[i] += 1 if (r["h"] >> i) & 1 else -1
    for doc_id, v in votes.items():
        expect = 0
        for i in range(64):
            if v[i] > 0:
                expect |= 1 << i
        # Python ints are unbounded; Spark longs wrap — compare as two's complement
        if expect >= 1 << 63:
            expect -= 1 << 64
        assert got[doc_id] == expect, doc_id


def test_simhash_near_pairs_on_planted_dups(spark):
    base = (
        "the quick brown fox jumps over the lazy dog while seventeen "
        "astronomers catalog distant galaxies every winter evening"
    )
    rows = [
        (1, base),
        (2, base + " extra"),          # tiny edit → small Hamming distance
        (3, "completely different text about cooking pasta with garlic "
            "tomatoes basil and olive oil in a large copper pan"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_pairs(df, "doc_id", "text", max_hamming=10).collect()
    }
    assert (1, 2) in pairs
    assert all(k == (1, 2) for k in pairs)


def test_embedding_exact_path_guards_driver_collect(spark):
    """The exact kernel collects the corpus as the broadcast reference
    matrix; above max_exact_rows it must refuse instead of OOMing the
    driver, and point at the distributed bucketed path."""
    import pytest

    from etl_sendas_spark.operators.dedupe import embedding_near_dup_pairs

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(10)], ["doc_id", "embedding"]
    )
    with pytest.raises(ValueError, match="bucket_planes"):
        embedding_near_dup_pairs(
            df, "doc_id", "embedding", max_exact_rows=5
        )
    # under the cap the exact path still works
    out = embedding_near_dup_pairs(
        df, "doc_id", "embedding", threshold=0.999, max_exact_rows=100
    )
    assert out.count() > 0


# ---------------------------------------------------------------------------
# ANN: LSH on planted near-dups; IVF recall vs brute force
# ---------------------------------------------------------------------------

def _planted_vectors(spark, n=200, dim=32, n_dups=10, seed=11):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        rows.append((i, [rng.gauss(0.0, 1.0) for _ in range(dim)]))
    # planted near-dups: ids n..n+n_dups-1 are tiny perturbations of 0..n_dups-1
    for j in range(n_dups):
        base = rows[j][1]
        rows.append((n + j, [x + rng.gauss(0.0, 0.01) for x in base]))
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    return spark.createDataFrame(rows, schema), n, n_dups


def test_lsh_topk_finds_planted_near_dups(spark):
    """Multi-table sign-LSH: a cosine≈0.9995 twin collides in ≥1 of 16
    tables with near-certainty; rank-1 neighbor must be the twin."""
    vecs, n, n_dups = _planted_vectors(spark)
    queries = vecs.filter(F.col("vec_id") >= n)
    top = lsh_cosine_topk(
        vecs, queries, "vec_id", "embedding", k=1, tables=16, bits=8
    ).collect()
    got = {r["query_id"]: r["neighbor_id"] for r in top}
    hits = sum(1 for j in range(n_dups) if got.get(n + j) == j)
    assert hits == n_dups, f"only {hits}/{n_dups} planted twins found: {got}"


def test_ivf_recall_against_bruteforce(spark):
    """IVF with n_probe=8 of 16 clusters scans ~half the corpus; top-5
    recall vs the exact baseline should clear 0.5 comfortably and the
    planted twin (an easy, same-cluster case) must always surface."""
    vecs, n, n_dups = _planted_vectors(spark)
    queries = vecs.filter(F.col("vec_id") >= n)
    exact = cosine_topk(vecs, queries, "vec_id", "embedding", k=5).collect()
    approx = ivf_cosine_topk(
        vecs, queries, "vec_id", "embedding", k=5, n_centroids=16, n_probe=8
    ).collect()
    from collections import defaultdict

    ex, ap = defaultdict(set), defaultdict(set)
    for r in exact:
        ex[r["query_id"]].add(r["neighbor_id"])
    for r in approx:
        ap[r["query_id"]].add(r["neighbor_id"])
    recalls = [len(ex[q] & ap[q]) / len(ex[q]) for q in ex]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    top1 = {r["query_id"]: r["neighbor_id"] for r in approx if r["rank"] == 1}
    for j in range(n_dups):
        assert top1.get(n + j) == j


def test_ivfpq_exactness_and_recall_laws(spark):
    """IVF-PQ (product-quantized inverted file):

    (1) FULL-RECOVERY LAW — with every cluster probed and the whole
    probed set reranked with true vectors, quantization must be fully
    bought back: output == exact cosine_topk row-for-row.
    (2) The planted twin (cosine ≈ 0.9995) must surface at rank 1
    through the ADC-shortlist + rerank recipe at production-ish
    settings (the quantizer may blur mid-cosine order, never a twin).
    (3) Pure-ADC output is deterministic and carries at most k rows
    per query with ranks 1..k (dim 32 / m=4 / 16 codes here; the
    driver-grade end-to-end hash lives in ann_ivfpq_topk's oracle)."""
    from etl_sendas_spark.operators.similarity import ivfpq_cosine_topk

    vecs, n, n_dups = _planted_vectors(spark)
    queries = vecs.filter(F.col("vec_id") >= n)

    exact = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in cosine_topk(vecs, queries, "vec_id", "embedding", k=5).collect()
    }
    recovered = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in ivfpq_cosine_topk(
            vecs, queries, k=5, n_centroids=16, n_probe=16,
            m_subspaces=4, n_codes=16, rerank=n + n_dups,
        ).collect()
    }
    assert recovered == exact

    top = ivfpq_cosine_topk(
        vecs, queries, k=5, n_centroids=16, n_probe=8,
        m_subspaces=4, n_codes=16, rerank=40,
    ).collect()
    top1 = {r["query_id"]: r["neighbor_id"] for r in top if r["rank"] == 1}
    for j in range(n_dups):
        assert top1.get(n + j) == j

    adc1 = ivfpq_cosine_topk(
        vecs, queries, k=5, n_centroids=16, n_probe=8,
        encode_backend="exact",
    ).collect()
    adc2 = ivfpq_cosine_topk(
        vecs, queries, k=5, n_centroids=16, n_probe=8,
        encode_backend="exact",
    ).collect()
    assert sorted(map(tuple, adc1)) == sorted(map(tuple, adc2))

    # (4) the DEFAULT (production BLAS index build, encode_backend=
    # "numpy": Arrow-batched coarse assign + per-subspace code argmin)
    # must reproduce the SQL-replayable exact path on this corpus —
    # the equality that lets the registered query run the fast path
    # while the oracle replays the fold expressions
    adc_np = ivfpq_cosine_topk(
        vecs, queries, k=5, n_centroids=16, n_probe=8
    ).collect()
    assert sorted(map(tuple, adc_np)) == sorted(map(tuple, adc1))
    per_q = {}
    for r in adc1:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
    for q_, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1)) and len(ranks) <= 5


def test_ivfpq_lloyd_training_reduces_quantization_error(spark):
    """k-means codebook training: total L2 quantization error over the
    corpus must be monotonically non-increasing in pq_lloyd_iters (the
    Lloyd argument), the trained index must still satisfy the
    full-recovery law, and training must be deterministic across
    repartitionings (partials folded in a fully-keyed sort order,
    means rounded to 9 dp)."""
    import numpy as np

    from etl_sendas_spark.operators.similarity import (
        _pq_train_lloyd,
        ivfpq_cosine_topk,
    )

    vecs, n, n_dups = _planted_vectors(spark)
    dsub = 8  # dim 32, m=4
    rows = sorted(vecs.collect(), key=lambda r: r["vec_id"])[:16]
    cb0 = [
        [list(r["embedding"])[j * dsub : (j + 1) * dsub] for r in rows]
        for j in range(4)
    ]
    c = vecs.selectExpr("vec_id AS neighbor_id", "embedding AS cv")
    emb = np.array([list(r["embedding"]) for r in vecs.collect()])

    def qerr(cb):
        total = 0.0
        for j in range(4):
            xj = emb[:, j * dsub : (j + 1) * dsub]
            mat = np.array(cb[j])
            d2 = (
                (xj * xj).sum(axis=1)[:, None]
                - 2.0 * (xj @ mat.T)
                + (mat * mat).sum(axis=1)[None, :]
            )
            total += d2.min(axis=1).sum()
        return total

    errs = [qerr(cb0)]
    cb = cb0
    for _ in range(3):
        cb = _pq_train_lloyd(c, cb, dsub, 1)
        errs.append(qerr(cb))
    assert all(b <= a + 1e-9 for a, b in zip(errs, errs[1:])), errs
    assert errs[-1] < errs[0]  # training actually moved

    # determinism across partitionings
    cb_a = _pq_train_lloyd(c.repartition(3), cb0, dsub, 2)
    cb_b = _pq_train_lloyd(c.repartition(17), cb0, dsub, 2)
    assert cb_a == cb_b

    # full-recovery law survives training (rerank with true vectors)
    queries = vecs.filter(F.col("vec_id") >= n)
    exact = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in cosine_topk(vecs, queries, "vec_id", "embedding", k=5).collect()
    }
    trained = {
        (r["query_id"], r["neighbor_id"], r["cosine"])
        for r in ivfpq_cosine_topk(
            vecs, queries, k=5, n_centroids=16, n_probe=16,
            m_subspaces=4, n_codes=16, rerank=n + n_dups,
            pq_lloyd_iters=2, encode_backend="numpy",
        ).collect()
    }
    assert trained == exact


# ---------------------------------------------------------------------------
# multimodal plumbing: features equal the decoder, run batch-wise
# ---------------------------------------------------------------------------

def test_multimodal_features_match_decoder(spark):
    payloads = [
        (1, b"hello world"),
        (2, b"\x00\x01\x02\xff"),
        (3, b""),
        (4, None),
    ]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(payloads, schema)
    got = {
        r["media_id"]: r["features"]
        for r in extract_features(df, payload_col="payload").collect()
    }
    assert got[1] == fake_decode(b"hello world")
    assert got[2] == fake_decode(b"\x00\x01\x02\xff")
    assert got[3] == [0.0] * 8
    assert got[4] == [0.0] * 8


def test_real_codecs_roundtrip():
    """Driver-side codec contract: synth → decode inverts exactly for
    PPM and WAV; comments parse; corrupt payloads fall back opaque."""
    from etl_sendas_spark.operators.multimodal import (
        _ppm_header,
        decode_media,
        decode_ppm,
        resize_ppm,
        synth_ppm,
        synth_wav,
    )

    for seed in range(0, 300, 7):
        img = decode_media(synth_ppm(seed))
        assert img["mime"] == "image/x-portable-pixmap"
        assert (img["width"], img["height"]) == (4 + seed % 13, 3 + seed % 7)
        assert abs(img["mean_level"] - seed % 251) < 1e-9
        wav = decode_media(synth_wav(seed))
        n = 500 + (seed % 100) * 37
        assert abs(wav["duration_s"] - n / 8000) < 1e-12
        assert abs(wav["mean_level"] - seed % 997) < 1e-9
        assert wav["n_bytes"] == 44 + 2 * n
    # netpbm comment lines are part of the header grammar
    hdr = b"P6\n# a comment\n10 5\n255\n" + bytes(150 * 3)
    assert _ppm_header(hdr)[:2] == (10, 5)
    # corrupt/foreign payloads never raise — a corpus pass must survive
    for junk in [b"", b"P6", b"P6\n10 9999\n255\n\x00", b"RIFFxxxx", b"\x89PNG"]:
        assert decode_media(junk)["mime"] == "application/octet-stream"
    # nearest-neighbor resize: dims change, constant fill preserved
    r = decode_ppm(resize_ppm(synth_ppm(8), 3, 2))
    assert (r["width"], r["height"]) == (3, 2)
    assert abs(r["mean_level"] - 8 % 251) < 1e-9


def test_resize_images_batch(spark):
    """resize_images: PPMs resized in-batch, foreign payloads pass
    through untouched, schema preserved."""
    from etl_sendas_spark.operators.multimodal import (
        decode_ppm,
        resize_images,
        synth_ppm,
        synth_wav,
    )

    rows = [(1, synth_ppm(5)), (2, synth_ppm(40)), (3, synth_wav(7))]
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    out = {
        r["media_id"]: bytes(r["payload"])
        for r in resize_images(df, 6, 4).collect()
    }
    for mid in (1, 2):
        meta = decode_ppm(out[mid])
        assert (meta["width"], meta["height"]) == (6, 4)
    assert out[3] == synth_wav(7)


# ---------------------------------------------------------------------------
# R7 gap fold vs a direct Python reference on randomized inputs
# ---------------------------------------------------------------------------

def _python_gap_fold(rows, gap_days):
    """Independent re-statement of the reference loop semantics
    (capital_sendas.py:506-536): anchor = last MARKED row."""
    out = {}
    by_group: dict = {}
    for r in rows:
        by_group.setdefault((r[1], r[2]), []).append(r)
    for grp in by_group.values():
        grp.sort(key=lambda r: (r[3], r[0]))
        anchor = None
        for r in grp:
            if anchor is None or (r[3] - anchor).days > gap_days:
                out[r[0]] = 1
                anchor = r[3]
            else:
                out[r[0]] = 0
    return out


def test_gap_anchor_mark_randomized(spark):
    rng = random.Random(99)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(400):
        rows.append(
            (
                i,
                rng.randrange(12),                     # user
                ["a", "b"][rng.randrange(2)],          # type
                base + dt.timedelta(hours=rng.randrange(0, 24 * 40)),
            )
        )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    got = {
        r["event_id"]: r["validacion"]
        for r in gap_anchor_mark(
            df,
            group_keys=["user_id", "event_type"],
            ts_col="ts",
            order_by=["ts", "event_id"],
            gap_days=3,
        ).collect()
    }
    assert got == _python_gap_fold(rows, 3)


# ---------------------------------------------------------------------------
# as-of join vs pandas merge_asof on randomized inputs
# ---------------------------------------------------------------------------

def test_asof_join_matches_pandas_merge_asof(spark):
    import pandas as pd

    from etl_sendas_spark.operators.relational import asof_join

    rng = random.Random(42)
    base = dt.datetime(2024, 1, 1)
    lrows = [
        (i, rng.randrange(8), base + dt.timedelta(minutes=rng.randrange(10_000)))
        for i in range(300)
    ]
    rrows = [
        (1000 + i, rng.randrange(8),
         base + dt.timedelta(minutes=rng.randrange(10_000)), float(i))
        for i in range(120)
    ]
    lschema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
    ])
    rschema = T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("value", T.DoubleType()),
    ])
    left = spark.createDataFrame(lrows, lschema)
    right = spark.createDataFrame(rrows, rschema)
    got = {
        r["event_id"]: (r["right_event_id"], r["right_value"])
        for r in asof_join(
            left, right, on=["user_id"], ts_col="ts",
            payload_cols=["event_id", "value"],
        ).collect()
    }
    lpd = pd.DataFrame(lrows, columns=["event_id", "user_id", "ts"]).sort_values("ts")
    rpd = pd.DataFrame(
        rrows, columns=["r_event_id", "user_id", "ts", "r_value"]
    ).sort_values("ts")
    merged = pd.merge_asof(
        lpd, rpd, on="ts", by="user_id", direction="backward"
    )
    assert len(got) == len(lrows)
    for _, m in merged.iterrows():
        want = (
            None if pd.isna(m["r_event_id"]) else int(m["r_event_id"]),
            None if pd.isna(m["r_value"]) else m["r_value"],
        )
        assert got[m["event_id"]] == want, m["event_id"]


# ---------------------------------------------------------------------------
# salted keep-first equals plain keep-first
# ---------------------------------------------------------------------------

def test_keep_first_salted_equals_plain(spark):
    from etl_sendas_spark.operators.relational import keep_first, keep_first_salted

    rng = random.Random(7)
    rows = [(rng.randrange(3), i, rng.randrange(1000)) for i in range(500)]
    df = spark.createDataFrame(rows, ["k", "uid", "v"])
    plain = sorted(
        tuple(r) for r in keep_first(df, ["k"], order_by=["v", "uid"]).collect()
    )
    salted = sorted(
        tuple(r)
        for r in keep_first_salted(
            df, ["k"], order_by=["v", "uid"], n_salt=8, salt_on="uid"
        ).collect()
    )
    assert plain == salted


# ---------------------------------------------------------------------------
# bucketed join: the plan must be exchange-free
# ---------------------------------------------------------------------------

def test_bucketed_join_plan_has_no_shuffle(spark):
    """No SHUFFLE exchange anywhere: the bucketed layout satisfies both
    the join and the same-key aggregation distribution. (A
    BroadcastExchange may appear — at tiny SFs Catalyst rightly prefers
    broadcasting the small side; at scale it falls back to the bucketed
    sort-merge join, still shuffle-free.)"""
    from etl_sendas_spark.plans.inventory import j_bucketed_colocated

    df = j_bucketed_colocated(spark, SF_ORACLE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


# ---------------------------------------------------------------------------
# sources: cross-file dedup + null-safe anti-join
# ---------------------------------------------------------------------------

def test_load_fact_files_cross_file_dedup(spark):
    cols = ["k", "v"]
    f0 = spark.createDataFrame([(1, "a"), (1, "a"), (2, "b")], cols)
    f1 = spark.createDataFrame([(1, "a"), (3, "c"), (3, "c")], cols)
    out = sorted(tuple(r) for r in load_fact_files(spark, [f0, f1]).collect())
    # (1,a): file0's BOTH copies kept (within-file dups survive), file1's dropped.
    # (3,c): new in file1 → both its copies kept.
    assert out == [(1, "a"), (1, "a"), (2, "b"), (3, "c"), (3, "c")]


def test_anti_join_all_columns_null_safe(spark):
    schema = T.StructType(
        [T.StructField("a", T.LongType()), T.StructField("b", T.StringType())]
    )
    new = spark.createDataFrame([(1, None), (2, "x"), (3, "y")], schema)
    seen = spark.createDataFrame([(1, None), (3, "y")], schema)
    out = sorted((r["a"], r["b"]) for r in anti_join_all_columns(new, seen).collect())
    # (1, NULL) must match (1, NULL) in seen — pandas merge semantics —
    # so only (2, 'x') survives
    assert out == [(2, "x")]


# ---------------------------------------------------------------------------
# F2 name splitter: every token-count branch + particle glue
# ---------------------------------------------------------------------------

@pytest.mark.parametrize(
    "name,expect",
    [
        ("CARLOS", ("CARLOS", "", "", "")),
        ("CARLOS RUIZ", ("CARLOS", "", "RUIZ", "")),
        ("CARLOS RUIZ GOMEZ", ("CARLOS", "", "RUIZ", "GOMEZ")),
        ("ANA MARIA RUIZ GOMEZ", ("ANA", "MARIA", "RUIZ", "GOMEZ")),
        (
            "ANA MARIA JOSE RUIZ GOMEZ",
            ("ANA", "MARIA JOSE", "RUIZ", "GOMEZ"),
        ),
        # particles glue to the FOLLOWING token
        ("ANA DE LA CRUZ", ("ANA", "", "DE LA CRUZ", "")),
        (
            "ANA MARIA DE LOS RIOS GOMEZ",
            ("ANA", "MARIA", "DE LOS RIOS", "GOMEZ"),
        ),
        # trailing particle with nothing after it is dropped (reference
        # never flushes its pending `parte`)
        ("CARLOS RUIZ DE", ("CARLOS", "", "RUIZ", "")),
        ("", ("", "", "", "")),
    ],
)
def test_split_name_py_branches(name, expect):
    assert split_name_py(name) == expect


# ---------------------------------------------------------------------------
# null ordering: keep_first/first_flag sort nulls LAST (pandas/DuckDB)
# ---------------------------------------------------------------------------

def test_keep_first_nulls_last(spark, duck):
    from etl_sendas_spark.operators.relational import first_flag, keep_first

    rows = [
        (1, None, "null-row"),
        (1, "b", "b-row"),
        (1, "a", "a-row"),
        (2, None, "only-null"),
    ]
    df = spark.createDataFrame(rows, ["k", "ord", "payload"])
    got = {r["k"]: r["payload"] for r in keep_first(df, ["k"], order_by=["ord"]).collect()}
    # DuckDB ASC = NULLS LAST, same data
    duck.execute("CREATE OR REPLACE TABLE t_nl(k INT, ord VARCHAR, payload VARCHAR)")
    duck.executemany("INSERT INTO t_nl VALUES (?,?,?)", rows)
    want = dict(duck.execute(
        "SELECT k, payload FROM (SELECT *, ROW_NUMBER() OVER "
        "(PARTITION BY k ORDER BY ord) rn FROM t_nl) WHERE rn=1"
    ).fetchall())
    assert got == want == {1: "a-row", 2: "only-null"}

    flags = {
        (r["k"], r["payload"]): r["validacion"]
        for r in first_flag(df, ["k"], order_by=["ord"]).collect()
    }
    assert flags[(1, "a-row")] == 1 and flags[(1, "null-row")] == 0


# ---------------------------------------------------------------------------
# sessionize: explicit tiebreak required; same-ts events deterministic
# ---------------------------------------------------------------------------

def test_sessionize_tiebreak_total_order(spark):
    import datetime

    import pytest as _pytest

    from etl_sendas_spark.operators.marking import sessionize

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # two same-ts events, then one past the gap
        (2, 100, t0),
        (1, 100, t0),
        (3, 100, t0 + datetime.timedelta(hours=2)),
    ]
    df = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    out = sessionize(
        df, ["user_id"], "ts", gap="INTERVAL 30 MINUTES", order_by=["event_id"]
    )
    got = {r["event_id"]: r["session_id"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 3: 2}

    # no tiebreak and no row id → refuse rather than (ts, ts) order
    with _pytest.raises(ValueError):
        sessionize(df, ["user_id"], "ts")


# ---------------------------------------------------------------------------
# capped-posting Jaccard: numerator and denominator share one universe
# ---------------------------------------------------------------------------

def test_ngram_jaccard_capped_universe_consistent(spark):
    from etl_sendas_spark.operators.dedupe import ngram_jaccard_pairs

    rows = [
        (1, "x y z q w"),
        (2, "x y z q e"),
        (3, "x y z r t"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    # "x y z" appears in all 3 docs -> dropped at max_posting=2; the
    # surviving universe gives J(1,2) = 1/(2+2-1) = 0.333333 (a biased
    # denominator over the FULL sets would give 1/5 = 0.2 and miss it)
    out = ngram_jaccard_pairs(
        df, "doc_id", "text", n=3, threshold=0.3, max_posting=2
    ).collect()
    got = {(r["id_a"], r["id_b"]): r["jaccard"] for r in out}
    assert got == {(1, 2): 0.333333}


def test_connected_components_chains_and_islands(spark):
    """Transitive chains collapse to one component labeled by the min
    node; disjoint pairs stay separate; convergence under max_iter."""
    from etl_sendas_spark.operators.dedupe import connected_components

    # chain 1-2-3-4 (never directly 1-4), island 10-11, singleton edge 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (21, 20)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["cluster"]
        for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20}


def test_connected_components_long_chain(spark):
    """A 30-hop chain needs ~log-to-diameter rounds — must still reach
    the fixpoint inside max_iter and label everything with the min."""
    from etl_sendas_spark.operators.dedupe import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], ["id_a", "id_b"]
    )
    got = {
        r["node"]: r["cluster"]
        for r in connected_components(pairs).collect()
    }
    assert set(got) == set(range(31))
    assert set(got.values()) == {0}


def test_connected_components_random_graphs_match_union_find(spark):
    """Randomized cross-check: component labels must equal a plain
    union-find over the same edges (labels = min node per component)."""
    from etl_sendas_spark.operators.dedupe import connected_components

    for seed in (3, 17, 99):
        rng = random.Random(seed)
        n = 120
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(80)
        ]
        edges = [(a, b) for a, b in edges if a != b]

        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = {x for e in edges for x in e}
        expected = {}
        for x in touched:
            root = find(x)
            expected[x] = min(
                y for y in touched if find(y) == root
            )

        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        got = {
            r["node"]: r["cluster"]
            for r in connected_components(pairs).collect()
        }
        assert got == expected, f"seed={seed}"


def test_snapshot_diff_duplicate_key_guard(spark):
    """snapshot_diff assumes per-snapshot key uniqueness (duplicates
    cross-product the full-outer join); the opt-in assertion names the
    offending side, and unique inputs pass it untouched."""
    import pytest

    from etl_sendas_spark.operators.relational import snapshot_diff

    old = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    new = spark.createDataFrame([(1, "a2"), (2, "b"), (2, "dup")], ["k", "v"])

    with pytest.raises(ValueError, match="duplicate key.*'new'"):
        snapshot_diff(old, new, ["k"], assert_unique_keys=True).collect()

    ok_new = spark.createDataFrame([(1, "a2"), (3, "c")], ["k", "v"])
    feed = snapshot_diff(old, ok_new, ["k"], assert_unique_keys=True)
    got = {(r["k"], r["op"]) for r in feed.collect()}
    assert got == {(1, "U"), (2, "D"), (3, "I")}


def test_ivf_lloyd_refinement_recall(spark):
    """k-means refinement (VERDICT r3 item 6): on a clusterable corpus
    (16-component Gaussian mixture — the workload IVF exists for),
    refined centroids at n_probe=4 of 16 (a 25% scan) must clear 0.9
    recall@10 vs brute force, and must not lose to the unrefined seed
    sample. (On spherically random data — like the synthetic embeddings
    table, whose intra/inter-label cosines are both ~0 — recall is
    bounded by the scanned fraction for ANY index; that case is covered
    by test_ivf_recall_against_bruteforce's planted twins.)"""
    from collections import defaultdict

    rng = random.Random(7)
    dim, n_clusters, per = 32, 16, 20
    centers = [[rng.gauss(0, 1.0) for _ in range(dim)] for _ in range(n_clusters)]
    rows, i = [], 0
    for c in centers:
        for _ in range(per):
            rows.append((i, [x + rng.gauss(0, 0.25) for x in c]))
            i += 1
    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.DoubleType())),
        ]
    )
    vecs = spark.createDataFrame(rows, schema)
    queries = vecs.filter(F.col("vec_id") % 16 == 0)

    def recall(approx, exact):
        ex, ap = defaultdict(set), defaultdict(set)
        for r in exact:
            ex[r["query_id"]].add(r["neighbor_id"])
        for r in approx:
            ap[r["query_id"]].add(r["neighbor_id"])
        return sum(len(ex[q] & ap[q]) / len(ex[q]) for q in ex) / len(ex)

    exact = cosine_topk(vecs, queries, "vec_id", "embedding", k=10).collect()
    unrefined = recall(
        ivf_cosine_topk(
            vecs, queries, "vec_id", "embedding", k=10,
            n_centroids=16, n_probe=4, lloyd_iters=0,
        ).collect(),
        exact,
    )
    refined = recall(
        ivf_cosine_topk(
            vecs, queries, "vec_id", "embedding", k=10,
            n_centroids=16, n_probe=4, lloyd_iters=2,
        ).collect(),
        exact,
    )
    assert refined >= 0.9, f"refined recall {refined}"
    assert refined >= unrefined, (refined, unrefined)


def test_resolve_pointers_durability_and_exactness(spark, tmp_path):
    """Pointer resolution: byte-exact spans resolve; a missing store
    file or truncated span yields NULL payload (corpus-pass rule), not
    a task failure."""
    from etl_sendas_spark.operators.multimodal import (
        MEDIA_POINTER,
        resolve_pointers,
        write_blob_store,
    )

    store = str(tmp_path / "store.bin")
    payloads = [b"alpha", b"", b"gamma-longer"]
    spans = write_blob_store(payloads, store)
    assert spans == [(0, 5), (5, 0), (5, 12)]

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("pointer", MEDIA_POINTER),
        ]
    )
    rows = [
        (0, (store, 0, 5)),
        (1, (store, 5, 0)),
        (2, (store, 5, 12)),
        (3, (store, 10, 99)),               # truncated span → NULL
        (4, (str(tmp_path / "gone.bin"), 0, 3)),  # missing store → NULL
        (5, None),                           # NULL pointer → NULL
    ]
    out = resolve_pointers(
        spark.createDataFrame(rows, schema), "pointer", "payload"
    )
    got = {r["media_id"]: r["payload"] for r in out.collect()}
    assert bytes(got[0]) == b"alpha"
    assert bytes(got[1]) == b""
    assert bytes(got[2]) == b"gamma-longer"
    assert got[3] is None and got[4] is None and got[5] is None


def test_write_blob_store_distributed_round_trip(spark, tmp_path):
    """Executor-side store build: each input partition writes its OWN
    store file (no driver collect anywhere in the path), pointers
    resolve byte-exactly in the same plan, and the store files on disk
    hold exactly the concatenated payloads."""
    import glob
    import inspect

    from etl_sendas_spark.operators.multimodal import (
        resolve_pointers,
        write_blob_store_distributed,
    )

    rows = [(i, bytes([65 + i]) * (i + 1)) for i in range(10)]
    df = spark.createDataFrame(
        rows, "media_id LONG, payload BINARY"
    ).repartition(4)
    ptrs = write_blob_store_distributed(
        df, "payload", str(tmp_path), prefix="st"
    )
    out = resolve_pointers(ptrs, "pointer", "payload")
    got = {r["media_id"]: bytes(r["payload"]) for r in out.collect()}
    assert got == {i: b for i, b in rows}

    files = sorted(glob.glob(str(tmp_path / "st_p*.bin")))
    assert len(files) > 1  # one file per non-empty partition
    total = sum(len(open(f, "rb").read()) for f in files)
    assert total == sum(len(b) for _, b in rows)

    # the registered exemplar query must stay collect-free (r4 verdict)
    from etl_sendas_spark.plans import inventory

    src = inspect.getsource(inventory.multimodal_pointer_features)
    assert ".collect(" not in src and "toPandas" not in src


def test_resize_images_survives_corrupt_p6(spark):
    """A truncated P6 blob must pass through resize unchanged instead
    of failing the job (decode_media's durability rule applies to every
    corpus pass)."""
    from etl_sendas_spark.operators.multimodal import resize_images, synth_ppm

    good = synth_ppm(6)
    corrupt = good[:20]          # valid magic + header, truncated raster
    garbage = b"P6 not a real header"
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, good), (2, corrupt), (3, garbage), (4, None)], schema
    )
    got = {
        r["media_id"]: r["payload"]
        for r in resize_images(df, 2, 2).collect()
    }
    assert bytes(got[1]).startswith(b"P6\n2 2\n255\n")  # really resized
    assert bytes(got[2]) == corrupt                      # passed through
    assert bytes(got[3]) == garbage
    assert got[4] is None


def test_frame_sample_schedule_and_durability(spark):
    """Frame sampling: first frame of each 0.5s window kept (frame 0
    always); corrupt and compressed-marker payloads contribute ZERO
    rows, never a task failure; id columns pass through."""
    from etl_sendas_spark.operators.multimodal import frame_sample, synth_avi

    good = synth_avi(3)  # w=7 h=2, 6 frames, fps=8 → t=0,.125,.25,...
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame(
        [(1, good), (2, b"garbage"), (3, None), (4, good[:40])], schema
    )
    rows = frame_sample(df, every_s=0.5).collect()
    assert {r["media_id"] for r in rows} == {1}
    # fps=8 → us=125000; 6 frames at t=0..0.625; windows 0 and 1 →
    # frames 0 (t=0) and 4 (t=0.5)
    got = [(r["frame_idx"], r["t_s"]) for r in sorted(rows, key=lambda r: r["frame_idx"])]
    assert got == [(0, 0.0), (4, 0.5)], got
    assert all(r["width"] == 7 and r["height"] == 2 for r in rows)


def test_frame_sample_every_frame_when_interval_zero(spark):
    """every_s=0 degenerates to every frame — the dense-decode mode."""
    from etl_sendas_spark.operators.multimodal import frame_sample, synth_avi

    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame([(9, synth_avi(9))], schema)
    rows = frame_sample(df, every_s=0.0).collect()
    assert len(rows) == 3 + 9 % 6  # all frames
    assert [r["mean_level"] for r in sorted(rows, key=lambda r: r["frame_idx"])] == [
        float((9 + 7 * i) % 251) for i in range(3 + 9 % 6)
    ]


def test_jpeg_codec_round_trips():
    """The pure-Python baseline JPEG codec (operators/jpeg.py): solid
    frames with DC quant 8 reconstruct EXACTLY (the MJPEG oracle's
    foundation); random grayscale at q=1 round-trips within one count
    (DCT float error only); color within 3 (adds the YCbCr round
    trip); progressive/odd inputs raise ValueError."""
    import numpy as np
    import pytest

    from etl_sendas_spark.operators.jpeg import (
        decode_baseline_jpeg,
        encode_baseline_jpeg,
    )

    for v in (0, 17, 128, 250):
        img = np.full((10, 13), v, dtype=np.uint8)
        out = decode_baseline_jpeg(encode_baseline_jpeg(img, q=8))
        assert out.shape == (10, 13) and (out == v).all()

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, (24, 32)).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(img, q=1))
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 1

    rgb = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    out = decode_baseline_jpeg(encode_baseline_jpeg(rgb, q=1))
    assert out.shape == (16, 16, 3)
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3

    with pytest.raises(ValueError):
        decode_baseline_jpeg(b"not a jpeg")


def test_frame_sample_mjpeg_planted_frames(spark):
    """MJPEG AVIs decode through the real baseline-JPEG path: planted
    solid frames come back with exact means and the same 0.5s window
    schedule as the uncompressed path; a '00dc' stream without the
    MJPG fourcc still raises (H.264 etc. stay stubbed)."""
    import pytest

    from etl_sendas_spark.operators.multimodal import (
        decode_avi_frames,
        frame_sample,
        synth_avi,
        synth_avi_mjpeg,
    )

    seed = 3  # w=7 h=2, 6 frames, fps=8 — same schedule as synth_avi(3)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )
    df = spark.createDataFrame([(1, synth_avi_mjpeg(seed))], schema)
    rows = sorted(frame_sample(df, every_s=0.5).collect(), key=lambda r: r["frame_idx"])
    got = [(r["frame_idx"], r["t_s"], r["mean_level"]) for r in rows]
    assert got == [(0, 0.0, float(seed % 251)), (4, 0.5, float((seed + 28) % 251))]
    assert all(r["width"] == 7 and r["height"] == 2 for r in rows)

    # MJPEG and uncompressed produce IDENTICAL frame streams per seed
    for s in (0, 5, 11):
        a = list(decode_avi_frames(synth_avi(s)))
        b = list(decode_avi_frames(synth_avi_mjpeg(s)))
        assert a == b, s

    # an 00dc stream whose fourcc is not MJPG must still refuse
    bad = synth_avi_mjpeg(seed).replace(b"MJPG", b"H264")
    with pytest.raises(ValueError, match="pyav"):
        list(decode_avi_frames(bad))


# ---------------------------------------------------------------------------
# sketches: KMV merge law, estimator accuracy, HLL rollup (round 4)
# ---------------------------------------------------------------------------

def test_kmv_merge_equals_direct_sketch(spark):
    """The merge identity the sketch's scale story rests on: k smallest
    of the union of per-part k-minimum sets == k smallest of the union.
    Exact array equality, not tolerance."""
    from etl_sendas_spark.operators.sketches import kmv_merge, kmv_sketch

    docs = _docs(spark).filter(F.col("text").isNotNull()).select(
        "lang", "source", F.col("text").alias("v")
    )
    k = 16
    per_part = kmv_sketch(docs, ["lang", "source"], "v", k=k)
    merged = {
        r["lang"]: r["kmv"]
        for r in kmv_merge(per_part, ["lang"], "kmv", k=k).collect()
    }
    direct = {
        r["lang"]: r["kmv"]
        for r in kmv_sketch(docs, ["lang"], "v", k=k).collect()
    }
    assert merged == direct


def test_kmv_estimate_accuracy(spark):
    """(k-1)/U(k) estimator: exact below k, and within 4 standard
    errors (4/sqrt(k-2)) above it on real hash data."""
    from etl_sendas_spark.operators.sketches import kmv_estimate, kmv_sketch

    docs = _docs(spark).filter(F.col("text").isNotNull()).select(
        F.lit(1).alias("g"), F.col("text").alias("v")
    )
    n_exact = docs.select("v").distinct().count()
    for k in (8, 32, 1 << 20):
        sk = kmv_sketch(docs, ["g"], "v", k=k)
        est = sk.select(kmv_estimate("kmv", k=k).alias("e")).collect()[0]["e"]
        if n_exact < k:
            assert est == n_exact, f"k={k}: exact path must be exact"
        else:
            tol = 4.0 / (k - 2) ** 0.5
            assert abs(est - n_exact) <= tol * n_exact, (
                f"k={k}: {est} vs {n_exact}"
            )


def test_hll_rollup_tolerance_and_merge(spark):
    """Production HLL path: per-part sketches merged per rollup group
    estimate within the lgk=12 error envelope (~3*1.04/2^6 ≈ 5%), and
    the two-level rollup equals the single-shot sketch estimate (both
    are register-max over the same value set)."""
    from etl_sendas_spark.operators.sketches import hll_rollup

    docs = _docs(spark).filter(F.col("text").isNotNull())
    two_level = {
        r["lang"]: r["distinct_est"]
        for r in hll_rollup(docs, ["source"], ["lang"], "text").collect()
    }
    single = {
        r["lang"]: r["distinct_est"]
        for r in docs.groupBy("lang")
        .agg(
            F.hll_sketch_estimate(
                F.hll_sketch_agg(F.col("text").cast("string"), F.lit(12))
            ).alias("distinct_est")
        )
        .collect()
    }
    exact = {
        r["lang"]: r["n"]
        for r in docs.select("lang", "text")
        .distinct()
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert two_level == single
    for lang, n in exact.items():
        assert abs(two_level[lang] - n) <= max(2, 0.05 * n), (
            f"{lang}: {two_level[lang]} vs {n}"
        )


# ---------------------------------------------------------------------------
# int8 embedding quantization (round 4)
# ---------------------------------------------------------------------------

def test_quantize_roundtrip_error_bound(spark):
    """Symmetric int8: components in [-127, 127], reconstruction error
    ≤ scale/2 per component, zero/null vectors map to null scale."""
    from etl_sendas_spark.operators.similarity import (
        dequantize_embeddings,
        quantize_embeddings,
    )

    emb = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
    zero = spark.createDataFrame(
        [(int(-1), [0.0] * 8, int(0))], "vec_id long, embedding array<float>, label int"
    )
    q = dequantize_embeddings(quantize_embeddings(emb.unionByName(zero)))
    rows = q.select(
        "vec_id",
        "q8_scale",
        F.array_min("q8").alias("lo"),
        F.array_max("q8").alias("hi"),
        F.array_max(
            F.zip_with(
                F.transform("embedding", lambda x: x.cast("double")),
                "embedding_deq",
                lambda a, b: F.abs(a - b),
            )
        ).alias("err"),
    ).collect()
    for r in rows:
        if r["vec_id"] == -1:
            assert r["q8_scale"] is None and r["err"] is None
            continue
        assert -127 <= r["lo"] and r["hi"] <= 127
        assert r["err"] <= r["q8_scale"] / 2 + 1e-12


# ---------------------------------------------------------------------------
# JSONL source: corrupt-record quarantine (round 4)
# ---------------------------------------------------------------------------

def test_jsonl_corrupt_record_quarantine(spark, tmp_path):
    """One malformed line must not fail the scan: it lands in the
    corrupt-record column; good lines parse with full fidelity
    (unicode, nulls)."""
    from etl_sendas_spark.sources.readers import read_jsonl

    p = tmp_path / "part-0.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "caf\\u00e9 ✓ ok", "n": 3}\n'
        "{this is not json}\n"
        '{"doc_id": 2, "text": null, "n": 7}\n',
        encoding="utf-8",
    )
    df = read_jsonl(spark, str(p), schema="doc_id bigint, text string, n bigint")
    rows = df.collect()
    good = {r["doc_id"]: r for r in rows if r["_corrupt_record"] is None}
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert len(bad) == 1 and "{this is not json}" in bad[0]["_corrupt_record"]
    assert good[1]["text"] == "café ✓ ok" and good[2]["text"] is None


def test_kmv_jaccard_estimates_planted_overlap(spark):
    """Two synthetic corpora with true Jaccard 1/3 (|A|=|B|=1000,
    overlap 500): the sketch-only estimator must land within the
    ~1/sqrt(k) envelope, and the union estimate within 4 standard
    errors."""
    from etl_sendas_spark.operators.sketches import kmv_jaccard, kmv_sketch

    k = 256
    rows = [("a", str(i)) for i in range(1000)] + [
        ("b", str(i)) for i in range(500, 1500)
    ]
    df = spark.createDataFrame(rows, "side string, v string")
    sk = kmv_sketch(df, ["side"], "v", k=k)
    a = sk.filter(F.col("side") == "a").select(F.col("kmv").alias("ka"))
    b = sk.filter(F.col("side") == "b").select(F.col("kmv").alias("kb"))
    c = kmv_jaccard("ka", "kb", k=k)
    row = (
        a.crossJoin(b)
        .select(
            c["jaccard_est"].alias("j"),
            c["union_est"].alias("u"),
            c["intersection_est"].alias("i"),
        )
        .collect()[0]
    )
    assert abs(row["j"] - 1 / 3) <= 4 / (k ** 0.5), row
    assert abs(row["u"] - 1500) <= 4 * 1500 / ((k - 2) ** 0.5), row
    assert abs(row["i"] - 500) <= 250, row


def test_approx_percentile_within_accuracy_envelope(spark):
    """Spark's mergeable percentile sketch (approx_percentile /
    Greenwald-Khanna): at accuracy a, the returned value's RANK must be
    within n/a of the target rank — the property that makes per-
    partition sketches safe to merge at 100 TB. Checked on a skewed
    column (order totals) at three quantiles."""
    orders = spark.read.parquet(f"{SF_ORACLE}/orders.parquet")
    n = orders.count()
    acc = 1000
    got = orders.select(
        F.percentile_approx("o_totalprice", [0.25, 0.5, 0.99], acc).alias("p")
    ).collect()[0]["p"]
    exact_sorted = [r["o_totalprice"] for r in orders.select("o_totalprice").orderBy("o_totalprice").collect()]
    for q, v in zip([0.25, 0.5, 0.99], got):
        import bisect

        rank = bisect.bisect_left(exact_sorted, v)
        assert abs(rank - q * n) <= n / acc + 1, (q, v, rank, q * n)


def test_mixture_rates_edges(spark):
    """alpha=1 keeps natural proportions; a target above the stratum
    size caps its rate at 1.0; weights always sum to 1."""
    from etl_sendas_spark.operators.sampling import mixture_rates

    df = spark.createDataFrame(
        [("a",)] * 90 + [("b",)] * 10, "s string"
    )
    nat = {r["s"]: r for r in mixture_rates(df, "s", alpha=1.0, target_rows=1000).collect()}
    assert abs(nat["a"]["mix_weight"] - 0.9) < 1e-12
    # target 1000 over 100 rows: every stratum saturates at rate 1.0
    assert nat["a"]["sample_rate"] == 1.0 and nat["b"]["sample_rate"] == 1.0
    half = mixture_rates(df, "s", alpha=0.5).collect()
    assert abs(sum(r["mix_weight"] for r in half) - 1.0) < 1e-12
    # alpha=0.5 flattens toward uniform: tail stratum gains share
    w = {r["s"]: r["mix_weight"] for r in half}
    assert 0.1 < w["b"] < 0.5


def test_stratified_exact_k_counts_and_determinism(spark):
    """Exactly min(k, n) per stratum, and the kept set is identical
    across repartitionings."""
    from etl_sendas_spark.operators.sampling import stratified_exact_k

    docs = _docs(spark)
    k = 7
    out1 = stratified_exact_k(docs, "doc_id", "lang", k=k)
    sizes = {r["lang"]: r["n"] for r in out1.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    strata = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in strata.items():
        assert sizes[lang] == min(k, n)
    ids1 = {r["doc_id"] for r in out1.select("doc_id").collect()}
    ids2 = {
        r["doc_id"]
        for r in stratified_exact_k(docs.repartition(17), "doc_id", "lang", k=k)
        .select("doc_id")
        .collect()
    }
    assert ids1 == ids2


# ---------------------------------------------------------------------------
# image near-dup via perceptual hash (round 4)
# ---------------------------------------------------------------------------

def _gradient_ppm(seed: int, w: int = 32, h: int = 24, noise: int = 0) -> bytes:
    """Structured deterministic image: per-seed diagonal gradient with
    optional ±noise perturbation (a 're-encode' of the same picture)."""
    rnd = random.Random(seed * 7919 + noise)
    px = bytearray()
    for y in range(h):
        for x in range(w):
            base = (x * 255 // w + y * 255 // h + seed * 37) % 256
            for _c in range(3):
                v = base + (rnd.randint(-noise, noise) if noise else 0)
                px.append(max(0, min(255, v)))
    return f"P6\n{w} {h}\n255\n".encode() + bytes(px)


def test_image_near_dup_finds_planted_pairs_only(spark):
    """Perturbed copies of the same image pair up within the Hamming
    budget; different gradients do not; corrupt/non-image payloads are
    null-hashed, never fatal."""
    from etl_sendas_spark.operators.multimodal import (
        image_near_dup_pairs,
        image_phash,
        phash_ppm,
    )

    rows = []
    for seed in range(6):
        rows.append((seed * 10, _gradient_ppm(seed)))
        rows.append((seed * 10 + 1, _gradient_ppm(seed, noise=2)))  # near-dup
    rows.append((900, b"P6\n99 99\n255\nshort"))  # truncated
    rows.append((901, b"not an image"))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    hashed = {r["doc_id"]: r["phash"] for r in image_phash(df).collect()}
    assert hashed[900] is None and hashed[901] is None
    for seed in range(6):
        a, b = hashed[seed * 10], hashed[seed * 10 + 1]
        assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 6, (seed, a, b)

    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in image_near_dup_pairs(df, max_hamming=6).collect()
    }
    for seed in range(6):
        assert (seed * 10, seed * 10 + 1) in pairs, (seed, pairs)
    # no cross-seed pair sneaks in
    for (ia, ib) in pairs:
        assert ia // 10 == ib // 10, (ia, ib)

    # pure-python determinism
    assert phash_ppm(_gradient_ppm(3)) == hashed[30]


def _tone_wav(seed: int, noise: int = 0, rate: int = 8000, secs: float = 1.0) -> bytes:
    """Deterministic synthetic clip: seed-dependent loudness envelope
    (beat pattern) with optional small-amplitude noise re-encode."""
    import math
    import struct as _struct

    rnd = random.Random(seed * 104729 + noise)
    n = int(rate * secs)
    frames = bytearray()
    for i in range(n):
        env = 0.2 + 0.8 * abs(math.sin(2 * math.pi * (i / n) * (2 + seed % 5)))
        v = int(12000 * env * math.sin(2 * math.pi * 440 * i / rate))
        if noise:
            v += rnd.randint(-noise, noise)
        frames += _struct.pack("<h", max(-32768, min(32767, v)))
    hdr = (
        b"RIFF" + _struct.pack("<I", 36 + len(frames)) + b"WAVE"
        + b"fmt " + _struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
        + b"data" + _struct.pack("<I", len(frames))
    )
    return bytes(hdr + frames)


def test_audio_near_dup_finds_planted_pairs_only(spark):
    """Noise re-encodes of the same clip pair up within the Hamming
    budget; clips with different envelopes do not; corrupt payloads are
    null-hashed."""
    from etl_sendas_spark.operators.multimodal import (
        afp_wav,
        audio_fingerprint,
        audio_near_dup_pairs,
    )

    rows = []
    for seed in range(4):
        rows.append((seed * 10, _tone_wav(seed)))
        rows.append((seed * 10 + 1, _tone_wav(seed, noise=300)))
    rows.append((900, b"RIFF----WAVEbroken"))
    rows.append((901, b"not audio"))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")

    hashed = {r["doc_id"]: r["afp"] for r in audio_fingerprint(df).collect()}
    assert hashed[900] is None and hashed[901] is None
    for seed in range(4):
        a, b = hashed[seed * 10], hashed[seed * 10 + 1]
        assert bin((a ^ b) & ((1 << 64) - 1)).count("1") <= 6, (seed, a, b)

    pairs = set(
        (r["id_a"], r["id_b"])
        for r in audio_near_dup_pairs(df, max_hamming=6).collect()
    )
    for seed in range(4):
        assert (seed * 10, seed * 10 + 1) in pairs
    for (ia, ib) in pairs:
        assert ia // 10 == ib // 10, (ia, ib)

    assert afp_wav(_tone_wav(2)) == hashed[20]


def test_ivm_deletes_to_zero_drop_group_and_negative_counts_surface(spark):
    """IVM algebra edges: a group fully retracted disappears; deleting
    a never-inserted row leaves a visible negative count (contract
    violation is not masked); an I+D pair for the same key nets out."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.ivm import (
        aggregate_state,
        incremental_agg_update,
    )

    base = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", 5.0)], ["k", "v"]
    )
    state = aggregate_state(base, keys=["k"], sum_cols=["v"])
    changes = spark.createDataFrame(
        [
            ("a", 1.0, "D"), ("a", 2.0, "D"),      # retract all of 'a'
            ("c", 7.0, "I"), ("c", 7.0, "D"),      # net zero for 'c'
            ("x", 3.0, "D"),                        # never inserted
        ],
        ["k", "v", "op"],
    )
    out = incremental_agg_update(state, changes, keys=["k"], sum_cols=["v"])
    got = {r.k: (r.n, float(r.sum_v)) for r in out.collect()}
    assert "a" not in got and "c" not in got
    assert got["b"] == (1, 5.0)
    assert got["x"] == (-1, -3.0)

    # the IVM law on a random-ish replay: state + feed == recompute
    ins = spark.createDataFrame([("b", 1.5), ("d", 4.0)], ["k", "v"])
    feed = ins.withColumn("op", F.lit("I"))
    maintained = incremental_agg_update(
        aggregate_state(base, ["k"], ["v"]), feed, ["k"], ["v"]
    )
    full = aggregate_state(base.unionByName(ins), ["k"], ["v"])
    a = sorted((r.k, r.n, float(r.sum_v)) for r in maintained.collect())
    b = sorted((r.k, r.n, float(r.sum_v)) for r in full.collect())
    assert a == b


def test_fuzzy_join_exact_recall_and_short_string_guard(spark):
    """Planted matches at known distances all surface (blocking loses
    nothing); the short-string precondition fails loudly."""
    import pytest
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.linkage import fuzzy_join

    left = spark.createDataFrame(
        [(1, "blue widget"), (2, "hot gear"), (3, "cold anvil")], ["id", "name"]
    )
    right = spark.createDataFrame(
        [(10, "blxe widget"), (11, "hot gearsx"), (12, "redwood")], ["rid", "rname"]
    )
    out = fuzzy_join(
        left, right, left_id="id", left_col="name",
        right_id="rid", right_col="rname", max_dist=2, q=2,
    )
    got = {(r.id, r.rid): r.dist for r in out.collect()}
    assert got[(1, 10)] == 1      # one substitution
    assert got[(2, 11)] == 2      # two appended chars
    assert (3, 12) not in got     # far apart
    assert set(got) == {(1, 10), (2, 11)}

    short = spark.createDataFrame([(1, "abc")], ["id", "name"])
    bad = fuzzy_join(
        short, right, left_id="id", left_col="name",
        right_id="rid", right_col="rname", max_dist=2, q=2,
    )
    with pytest.raises(Exception, match="recall bound"):
        bad.collect()


def test_scd2_randomized_partition_laws(spark):
    """Randomized (seeded) SCD2 laws: per key, intervals tile the
    event range (first valid_from = first event; each valid_to = next
    valid_from; one open interval), n_events sums to the key's row
    count, and adjacent intervals never share a state (else they'd be
    one segment)."""
    import random

    from etl_sendas_spark.operators.relational import scd2_history

    rng = random.Random(7)
    rows = []
    for k in range(12):
        for seq in range(rng.randint(1, 30)):
            rows.append((k, seq, rng.choice(["a", "b", None])))
    df = spark.createDataFrame(rows, "k LONG, seq LONG, st STRING")
    hist = scd2_history(df, "k", ["seq"], "st").collect()
    per_key_rows = {}
    for k, seq, st_ in rows:
        per_key_rows[k] = per_key_rows.get(k, 0) + 1
    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    for k, ivals in by_key.items():
        ivals = sorted(ivals, key=lambda r: r["valid_from"])
        assert sum(r["n_events"] for r in ivals) == per_key_rows[k]
        assert ivals[0]["valid_from"] == min(
            seq for kk, seq, _ in rows if kk == k
        )
        opens = [r for r in ivals if r["is_current"]]
        assert len(opens) == 1 and opens[-1] is ivals[-1]
        for a, b in zip(ivals, ivals[1:]):
            assert a["valid_to"] == b["valid_from"]
            # adjacent intervals with equal state (incl. both-NULL)
            # would be one segment
            assert not (a["state"] == b["state"]), "adjacent same state"


def test_weighted_sample_superset_stability(spark):
    """Hash-derandomized sampling law: the top-k of a SUPERSET corpus
    restricted to the subset's ids contains the subset's own top-j
    prefix in order (keys are per-row and content-stable, so adding
    rows never changes an existing row's key — only displaces it)."""
    from etl_sendas_spark.operators.sampling import weighted_sample_k

    big_rows = [(i, (i % 7) + 1) for i in range(300)]
    small_rows = [(i, w) for i, w in big_rows if i % 3 == 0]
    big = spark.createDataFrame(big_rows, "id LONG, w LONG")
    small = spark.createDataFrame(small_rows, "id LONG, w LONG")
    big_keys = {
        r["id"]: r["sample_key"]
        for r in weighted_sample_k(big, "id", "w", 300).collect()
    }
    small_top = [
        r["id"] for r in weighted_sample_k(small, "id", "w", 20).collect()
    ]
    # identical keys row-for-row...
    small_keys = {
        r["id"]: r["sample_key"]
        for r in weighted_sample_k(small, "id", "w", 100).collect()
    }
    for i, key in small_keys.items():
        assert big_keys[i] == key
    # ...and the subset's top-20 is exactly the smallest-20 of its ids
    # under the big corpus's keys
    expect = sorted(small_keys, key=lambda i: (small_keys[i], i))[:20]
    assert small_top == expect


def test_ivm_minmax_branches(spark):
    """MIN/MAX maintenance corners: insert-only extends extremes with
    no recompute; a delete strictly inside (min, max) is safe; a delete
    EQUAL to the extreme takes the recompute path and survives a
    duplicated extreme; a fully-deleted group disappears; a delete for
    a key the state never saw recomputes consistently."""
    from etl_sendas_spark.operators.ivm import (
        incremental_minmax_update,
        minmax_state,
    )

    base_rows = [
        ("a", 1.0), ("a", 1.0), ("a", 5.0),   # duplicated min
        ("b", 2.0), ("b", 9.0),
        ("c", 7.0),
    ]
    base = spark.createDataFrame(base_rows, "k STRING, v DOUBLE")
    state = minmax_state(base, ["k"], "v")

    changes = spark.createDataFrame(
        [
            ("a", 1.0, "D"),   # deletes ONE copy of the duplicated min
            ("a", 10.0, "I"),  # and extends the max
            ("b", 3.0, "D"),   # strictly inside (2, 9): safe branch
            ("c", 7.0, "D"),   # group c vanishes
            ("d", 4.0, "I"),   # brand-new group
        ],
        "k STRING, v DOUBLE, op STRING",
    )
    # effective base AFTER the feed (what storage holds at maintenance)
    eff = spark.createDataFrame(
        [("a", 1.0), ("a", 5.0), ("a", 10.0), ("b", 2.0), ("b", 9.0), ("d", 4.0)],
        "k STRING, v DOUBLE",
    )
    # fix the b-delete to a real inside value (2 < 3 < 9 is inside: safe)
    out = {
        r["k"]: (r["n"], r["min_v"], r["max_v"])
        for r in incremental_minmax_update(
            state, changes, eff, ["k"], "v"
        ).collect()
    }
    # a: equal-extreme delete -> recompute -> min stays 1.0 (duplicate)
    assert out["a"] == (3, 1.0, 10.0)
    # b: delete of 3.0 is strictly inside (2, 9) -> safe branch BUT the
    # count drops by one even though no such row existed — caller's
    # contract (same as SUM IVM); extremes remain correct
    assert out["b"][1:] == (2.0, 9.0)
    # c fully deleted -> gone; d new insert-only group
    assert "c" not in out
    assert out["d"] == (1, 4.0, 4.0)

    # insert-only delta never touches the base (pure safe branch)
    ins = spark.createDataFrame([("b", 11.0, "I")], "k STRING, v DOUBLE, op STRING")
    out2 = {
        r["k"]: (r["min_v"], r["max_v"])
        for r in incremental_minmax_update(
            minmax_state(base, ["k"], "v"), ins, base, ["k"], "v"
        ).collect()
    }
    assert out2["b"] == (2.0, 11.0)


def test_cms_sketch_properties(spark):
    """Count-Min laws: (1) the sketch never exceeds depth×width rows
    however large the stream; (2) estimates are exact-or-over, NEVER
    under, even at a width tiny enough to force collisions — and the
    mean overshoot stays near the expected (N-exact)/width; (3) at a
    width comfortably above the distinct count the estimates are
    exact; (4) sketches of disjoint halves merged cell-wise equal the
    whole-stream sketch (counts are linear)."""
    from etl_sendas_spark.operators.sketches import cms_estimate, cms_sketch

    depth, width = 3, 32  # tiny width FORCES collisions
    rows = [(f"v{i % 50}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "x STRING")
    sk = cms_sketch(df, "x", depth=depth, width=width)
    assert sk.count() <= depth * width

    probes = spark.createDataFrame(
        [(f"v{i}",) for i in range(50)], "x STRING"
    )
    est = {
        r["x"]: r["cms_est"]
        for r in cms_estimate(sk, probes, "x", depth=depth, width=width).collect()
    }
    n, exact = len(rows), 40  # 2000 rows over 50 values
    assert all(est[f"v{i}"] >= exact for i in range(50))  # up-only, always
    mean_overshoot = sum(est[f"v{i}"] - exact for i in range(50)) / 50
    assert mean_overshoot <= 2 * n / width  # near the expected error

    # generous width -> no colliding pair survives the min over rows
    wide = cms_sketch(df, "x", depth=depth, width=4096)
    est_w = {
        r["x"]: r["cms_est"]
        for r in cms_estimate(wide, probes, "x", depth=depth, width=4096).collect()
    }
    assert all(est_w[f"v{i}"] == exact for i in range(50))

    # merge = cell-wise add of per-half sketches
    h1 = cms_sketch(df.limit(1000), "x", depth=depth, width=width)
    import pyspark.sql.functions as F2

    h2 = cms_sketch(
        spark.createDataFrame(rows[1000:], "x STRING"), "x", depth=depth, width=width
    )
    merged = (
        h1.unionByName(h2)
        .groupBy("row", "bucket")
        .agg(F2.sum("c").alias("c"))
    )
    whole = {(r["row"], r["bucket"]): r["c"] for r in sk.collect()}
    got = {(r["row"], r["bucket"]): r["c"] for r in merged.collect()}
    assert got == whole


def test_star_cc_beats_propagation_on_chains(spark):
    """Large-star/small-star connected components: on a 256-node PATH
    (diameter 255) the star variant converges inside its default round
    budget and labels the whole chain with node 0, while min-label
    propagation capped at 8 rounds demonstrably has not converged —
    the O(log n)-vs-O(diameter) gap the second CC implementation
    exists for. On shallow clusters both give identical labels."""
    from etl_sendas_spark.operators.dedupe import (
        connected_components,
        connected_components_star,
    )

    path = [(i, i + 1) for i in range(255)]
    tris = [(900, 901), (901, 902), (900, 902), (950, 951)]
    df = spark.createDataFrame(path + tris, "id_a LONG, id_b LONG")

    star = {
        r["node"]: r["cluster"]
        for r in connected_components_star(df).collect()
    }
    assert all(star[i] == 0 for i in range(256))
    assert star[900] == star[901] == star[902] == 900
    assert star[950] == star[951] == 950

    capped = {
        r["node"]: r["cluster"]
        for r in connected_components(df, max_iter=8).collect()
    }
    assert any(capped[i] != 0 for i in range(256))  # diameter-bound bites

    # shallow input: both algorithms agree exactly
    shallow = spark.createDataFrame(tris, "id_a LONG, id_b LONG")
    a = {r["node"]: r["cluster"] for r in connected_components(shallow).collect()}
    b = {
        r["node"]: r["cluster"]
        for r in connected_components_star(shallow).collect()
    }
    assert a == b


def test_quantile_sketch_merge_law_and_error_bound(spark):
    """(a) Merge identity: sketching two disjoint parts then merging
    equals sketching the union — byte-for-byte, the same law KMV holds.
    (b) Accuracy: nearest-rank estimates from the k=256 sample land
    within the DKW rank band (~2/sqrt(k) of rank, generous constant)
    of the exact quantiles on a skewed distribution."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.sketches import (
        quantile_estimate,
        quantile_merge,
        quantile_sketch,
    )

    # skewed values: v = id^2 over 20k rows, one group
    df = spark.range(0, 20000).select(
        F.lit("g").alias("g"),
        F.col("id").alias("rid"),
        (F.col("id") * F.col("id")).cast("double").alias("v"),
    )
    part1 = df.filter(F.col("rid") % 2 == 0)
    part2 = df.filter(F.col("rid") % 2 == 1)

    whole = quantile_sketch(df, ["g"], "v", id_cols=["rid"], k=256)
    merged = quantile_merge(
        quantile_sketch(part1, ["g"], "v", id_cols=["rid"], k=256).unionByName(
            quantile_sketch(part2, ["g"], "v", id_cols=["rid"], k=256)
        ),
        ["g"],
        k=256,
    )
    a = whole.select("qsk").head()["qsk"]
    b = merged.select("qsk").head()["qsk"]
    assert [tuple(x) for x in a] == [tuple(x) for x in b]

    # rank accuracy: invert the estimate back to its true rank
    est = whole.select(
        quantile_estimate("qsk", 0.5).alias("p50"),
        quantile_estimate("qsk", 0.9).alias("p90"),
    ).head()
    import math

    n, k = 20000, 256
    band = 2.0 / math.sqrt(k)  # DKW-ish rank tolerance
    for q, v in ((0.5, est["p50"]), (0.9, est["p90"])):
        true_rank = math.sqrt(v) / n  # v = id^2 -> rank(v) = id/n
        assert abs(true_rank - q) < band, (q, v, true_rank)


def test_triangle_counts_known_graphs(spark):
    """Hand-checked closures: K4 has 4 triangles with every node in 3;
    a star and a path have none; orientation/duplicate/self-loop noise
    in the input must not change counts."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.graph import triangle_counts

    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    noise = [(b, a) for a, b in k4[:3]] + [(0, 0)]          # reversed dups + loop
    star = [(100, x) for x in (101, 102, 103, 104)]          # no closure
    path = [(200, 201), (201, 202), (202, 203)]              # no closure
    df = spark.createDataFrame(k4 + noise + star + path, "src long, dst long")
    got = {r["node"]: r["triangles"] for r in triangle_counts(df).collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}

    # one extra triangle hanging off K4: node 4 connected to 0 and 1
    df2 = spark.createDataFrame(k4 + [(0, 4), (4, 1)], "src long, dst long")
    got2 = {r["node"]: r["triangles"] for r in triangle_counts(df2).collect()}
    assert got2 == {0: 4, 1: 4, 2: 3, 3: 3, 4: 1}


def test_random_walks_valid_and_deterministic(spark):
    """Every consecutive (step i -> i+1) hop must be a real edge of the
    symmetrized graph, walks start at their walk_id, every node gets a
    full-length walk, and a rerun is byte-identical (hash, not RNG)."""
    from etl_sendas_spark.operators.graph import random_walks, symmetrize

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")],
        "src string, dst string",
    )
    out = random_walks(edges, length=3, seed=5)
    rows = [(r["walk_id"], r["step"], r["node"]) for r in out.collect()]
    again = [(r["walk_id"], r["step"], r["node"])
             for r in random_walks(edges, length=3, seed=5).collect()]
    assert sorted(rows) == sorted(again)

    und = {(r["src"], r["dst"]) for r in symmetrize(edges).collect()}
    walks = {}
    for wid, step, node in rows:
        walks.setdefault(wid, {})[step] = node
    assert set(walks) == {"a", "b", "c", "d"}
    for wid, path in walks.items():
        assert sorted(path) == [0, 1, 2, 3], (wid, path)
        assert path[0] == wid
        for i in range(3):
            assert (path[i], path[i + 1]) in und, (wid, path)


def test_group_split_leakage_free_and_stable(spark):
    """Groups never span splits (the leakage-safety contract), the
    assignment ignores row content (only the group key decides), adding
    new groups never reassigns existing ones (consistent-hash growth
    property), remainder mass falls to the LAST split, and bad
    fractions fail fast."""
    import pytest as _pytest

    from etl_sendas_spark.operators.sampling import group_split

    rows = [(i, f"g{i % 40}", f"payload-{i}") for i in range(400)]
    df = spark.createDataFrame(rows, "id long, grp string, body string")
    splits = [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    out = group_split(df, "grp", splits)

    per_group = {}
    for r in out.collect():
        per_group.setdefault(r["grp"], set()).add(r["split"])
    assert all(len(s) == 1 for s in per_group.values()), per_group
    assert set().union(*per_group.values()) <= {"train", "val", "test"}

    # growth stability: a corpus with MORE groups assigns the original
    # groups identically
    rows2 = rows + [(1000 + i, f"h{i}", "x") for i in range(60)]
    df2 = spark.createDataFrame(rows2, "id long, grp string, body string")
    before = {r["grp"]: r["split"] for r in out.select("grp", "split").distinct().collect()}
    after = {
        r["grp"]: r["split"]
        for r in group_split(df2, "grp", splits)
        .select("grp", "split").distinct().collect()
        if r["grp"].startswith("g")
    }
    assert before == after

    # remainder falls to the last split: fractions summing under 1
    part = group_split(df, "grp", [("a", 0.3), ("b", 0.2)])
    assert {r["split"] for r in part.collect()} <= {"a", "b"}

    with _pytest.raises(ValueError):
        group_split(df, "grp", [])
    with _pytest.raises(ValueError):
        group_split(df, "grp", [("a", 0.0)])
    with _pytest.raises(ValueError):
        group_split(df, "grp", [("a", 0.7), ("b", 0.5)])


def test_psi_drift_planted_shift_and_null_case(spark):
    """Identical distributions read PSI ~ 0; a planted location shift
    reads > 0.25 ('significant shift' on the standard scale); empty
    bins stay finite (smoothing); bad inputs fail fast."""
    import pytest as _pytest

    from etl_sendas_spark.operators.quality_checks import psi_drift

    base = [(i, float(i % 100)) for i in range(2000)]
    ref = spark.createDataFrame(base, "id long, v double")
    same = psi_drift(ref, ref, "v").first()
    assert abs(same["psi"]) < 1e-6
    assert same["n_ref"] == same["n_cur"] == 2000

    # location shift: mass moves to the top of the frozen range
    shifted = spark.createDataFrame(
        [(i, 90.0 + (i % 100) / 10.0) for i in range(2000)], "id long, v double"
    )
    drift = psi_drift(ref, shifted, "v").first()
    assert drift["psi"] > 0.25, drift

    # values beyond the frozen reference range clamp into edge bins
    wild = spark.createDataFrame(
        [(1, -1e9), (2, 1e9), (3, 50.0)], "id long, v double"
    )
    clamped = psi_drift(ref, wild, "v").first()
    assert math.isfinite(clamped["psi"]) and clamped["n_cur"] == 3

    with _pytest.raises(ValueError):
        psi_drift(ref, ref, "v", n_bins=1)
    with _pytest.raises(ValueError):
        psi_drift(ref, ref, "v", lo=5.0, hi=5.0)


def test_bloom_null_values_are_not_members(spark):
    """NULL hygiene on both Bloom sides (r5 advice): a NULL build value
    sets no bits (it would otherwise insert a (NULL, NULL) word row),
    and a NULL probe value reads "not a member" (0) — matching the SQL
    oracle's CASE — instead of poisoning the flag product to NULL."""
    from etl_sendas_spark.operators.sketches import bloom_build, bloom_filter_probe

    members = spark.createDataFrame(
        [(7,), (None,), (21,)], "v long"
    )
    bloom = bloom_build(members, "v", m_words=64, k_hashes=3)
    # no NULL word rows leaked into the filter table
    assert bloom.filter(F.col("w").isNull() | F.col("bits").isNull()).count() == 0

    probes = spark.createDataFrame([(7,), (None,), (999_983,)], "v long")
    out = bloom_filter_probe(probes, "v", bloom, m_words=64, k_hashes=3)
    got = {r["v"]: r["might_contain"] for r in out.collect()}
    assert got[7] == 1                      # member still flagged
    assert got[None] == 0                   # NULL probe: 0, never NULL
    assert got[None] is not None


def test_round_half_up_matches_spark_round(spark):
    """The shared numpy HALF_UP helper must agree with F.round on the
    boundary cases where np.round (banker's) diverges: a trailing 5
    rounds AWAY FROM ZERO in both engines, both signs."""
    import numpy as np

    from etl_sendas_spark.operators.similarity import round_half_up

    vals = [0.1234565, -0.1234565, 0.1234575, -0.1234575, 1.9999995,
            -1.9999995, 0.0, 0.25, -0.25]
    arr = round_half_up(np.array(vals), 6)
    sdf = spark.createDataFrame([(v,) for v in vals], "v double").select(
        F.round("v", 6).alias("r")
    )
    expected = [r["r"] for r in sdf.collect()]
    assert [round(float(x), 6) for x in arr] == expected
    # and np.round would have gotten at least one of these wrong
    assert list(np.round(np.array(vals), 6)) != expected


def test_write_excel_guard_raises_on_oversized_frame(spark, tmp_path):
    """write_excel materializes on the driver; the cap must raise with
    guidance past max_rows and still write the audit-sized path."""
    from etl_sendas_spark.sources.sinks import write_excel

    big = spark.range(0, 50)
    with pytest.raises(ValueError, match="write_parquet"):
        write_excel(big, str(tmp_path / "big.xlsx"), max_rows=10)

    small = spark.range(0, 5).select(F.col("id").cast("string").alias("c"))
    out = str(tmp_path / "small.xlsx")
    write_excel(small, out, max_rows=10)
    import os

    assert os.path.getsize(out) > 0


def test_semantic_dedup_lloyd_numpy_equals_exact(spark):
    """The production recipe (lloyd_iters=2 at corpus-real n_clusters,
    BLAS assignment) must produce the IDENTICAL flag table as the
    SQL-replayable exact backend: the 9-decimal centroid rounding each
    round re-synchronizes the two backends' float noise, so Lloyd does
    not widen the property-pinned equivalence."""
    from etl_sendas_spark.operators.similarity import semantic_dedup

    emb = spark.read.parquet(SF_ORACLE + "/embeddings.parquet")
    kw = dict(id_col="vec_id", vec_col="embedding",
              n_clusters=64, threshold=0.40, lloyd_iters=2)
    exact = sorted(tuple(r) for r in semantic_dedup(emb, **kw).collect())
    blas = sorted(
        tuple(r)
        for r in semantic_dedup(emb, assign_backend="numpy", **kw).collect()
    )
    assert exact == blas
    assert len(exact) == 500


def test_semantic_dedup_mega_cluster_hits_aqe_skew_split(spark):
    """The docstring's 100 TB skew claim, plan-pinned: plant a corpus
    where ONE cluster holds ~99.8% of the vectors, disable broadcast,
    scale the AQE skew thresholds to the local data — the cluster-keyed
    self-join's hot partition must be split by OptimizeSkewedJoin
    (skew=true in the executed plan), which is what absorbs oversized
    clusters at scale.

    Construction notes, both found the hard way: (a) the cone vectors
    carry per-row unique floats — identical rows lz4-compress to
    nothing in the shuffle and the skew detector (which reads
    compressed map-output sizes) sees no skew; (b) the seed ids are the
    n_clusters lowest md5-60 hashes of the id, so the test computes
    them and plants exactly ONE cone-like seed (noise could otherwise
    flip assignments between several near-identical cone seeds and
    shard the mega-cluster). forceOptimizeSkewedJoin mirrors production
    guidance here: the pair join feeds a distinct on another key, so
    without force the rule declines to add the (cheap) extra shuffle."""
    import hashlib

    from etl_sendas_spark.operators.similarity import semantic_dedup

    dim, n = 16, 3200
    h = lambda i: int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
    seeds = sorted(range(n), key=h)[:8]
    cone_seed = seeds[0]
    rows = []
    for i in range(n):
        if i in seeds and i != cone_seed:
            v = [0.0] * dim
            v[seeds.index(i) + 1] = 1.0  # 7 orthogonal singleton clusters
            rows.append((i, v))
        else:
            # noisy cone: cosine ~1 to the single cone seed, <=~0.3 to
            # the orthogonal seeds, unique bytes per row
            v = [1.0 + 0.001 * (((i * 31 + j * 17) % 97) / 97.0)
                 for j in range(dim)]
            rows.append((i, v))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
        spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
        out = semantic_dedup(
            emb, id_col="vec_id", vec_col="embedding",
            n_clusters=8, threshold=0.95,
        )
        res = out.collect()
        assert len(res) == n
        from collections import Counter

        sizes = Counter(r["cluster"] for r in res)
        assert max(sizes.values()) == n - 7  # the planted mega-cluster
        # every cone row except the min id is a dup of it
        dups = sum(r["is_dup"] for r in res)
        assert dups == n - 8, dups
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:3000]
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_prefix_jaccard_pairs_equals_bruteforce(spark):
    """Prefix filtering's no-false-negative guarantee, checked against
    a pure-Python brute force over every pair: planted near-dups (one
    token changed), disjoint docs, and random-overlap docs — the pair
    SET and the rounded scores must both match exactly, at two
    thresholds (the prefix length L changes with t)."""
    import itertools
    import random as _random

    from etl_sendas_spark.operators.dedupe import prefix_jaccard_pairs

    rng = _random.Random(13)
    vocab = [f"w{j}" for j in range(120)]
    rows = []
    for i in range(60):
        base = rng.sample(vocab, rng.randint(8, 20))
        rows.append((2 * i, " ".join(base)))
        twin = list(base)
        twin[rng.randrange(len(twin))] = rng.choice(vocab)  # near-dup
        rows.append((2 * i + 1, " ".join(twin)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sets = {i: set(t.split()) for i, t in rows}
    for t in (0.6, 0.9):
        want = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            if inter:
                j = round(inter / len(sets[a] | sets[b]), 6)
                if j >= t:
                    want[(a, b)] = j
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in prefix_jaccard_pairs(
                docs, id_col="doc_id", text_col="text", threshold=t
            ).collect()
        }
        assert got == want, (
            t,
            sorted(set(want) - set(got))[:5],
            sorted(set(got) - set(want))[:5],
        )
        assert len(got) > 0, t  # planted twins guarantee non-empty


def test_funnel_steps_semantics(spark):
    """Hand-built funnel edge cases: strict ordering (same-timestamp
    events do NOT chain), the first-touch anchor (a user whose only
    valid window opens at a LATER step-1 event does not convert —
    documented convention), the deadline cut, and the empty-cohort
    guard (no step-1 events → zero rows, not a divide by zero)."""
    import datetime as dt

    from etl_sendas_spark.operators.timeseries import funnel_steps

    t0 = dt.datetime(2024, 1, 1)
    h = lambda n: t0 + dt.timedelta(hours=n)
    rows = [
        # user 1: clean A(0h) -> B(1h) -> C(2h): full conversion
        (1, h(0), "A"), (1, h(1), "B"), (1, h(2), "C"),
        # user 2: B at the SAME ts as A -> strict '>' blocks step 2
        (2, h(0), "A"), (2, h(0), "B"),
        # user 3: B before A -> order wrong, step 2 not reached
        (3, h(5), "A"), (3, h(4), "B"),
        # user 4: B beyond the 6h deadline of the FIRST A (first-touch:
        # the second A at 10h would put B in-window, but does not count)
        (4, h(0), "A"), (4, h(10), "A"), (4, h(12), "B"),
        # user 5: A -> B inside window, C outside deadline
        (5, h(0), "A"), (5, h(1), "B"), (5, h(20), "C"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {
        r["step"]: (r["n_users"], r["conversion"])
        for r in funnel_steps(
            ev, ["A", "B", "C"], within="6 hours"
        ).collect()
    }
    assert got == {"A": (5, 1.0), "B": (2, 0.4), "C": (1, 0.2)}, got

    # without a window, user 5 converts fully and user 4 reaches B
    got2 = {
        r["step"]: r["n_users"]
        for r in funnel_steps(ev, ["A", "B", "C"]).collect()
    }
    assert got2 == {"A": 5, "B": 3, "C": 2}, got2

    # empty step-1 cohort: zero rows
    assert funnel_steps(ev, ["Z", "B"]).count() == 0


def test_ks_drift_matches_scipy_convention(spark):
    """KS against a pure-Python reference (the scipy two-sample
    formula, computed directly from sorted samples) on groups with
    ties, identical distributions, and a planted location shift."""
    import random as _random

    from etl_sendas_spark.operators.quality_checks import ks_drift

    rng = _random.Random(5)
    ref_rows, cur_rows = [], []
    data = {}
    for g, shift in (("same", 0.0), ("shifted", 5.0), ("tied", 0.0)):
        rv = [float(rng.randint(0, 30)) for _ in range(200)]
        cv = [float(rng.randint(0, 30)) + shift for _ in range(150)]
        if g == "tied":
            rv = [float(x % 3) for x in range(200)]   # heavy ties
            cv = [float((x + 1) % 3) for x in range(150)]
        data[g] = (rv, cv)
        ref_rows += [(g, v) for v in rv]
        cur_rows += [(g, v) for v in cv]

    ref = spark.createDataFrame(ref_rows, "event_type string, value double")
    cur = spark.createDataFrame(cur_rows, "event_type string, value double")
    got = {
        r["event_type"]: (r["ks"], r["n_ref"], r["n_cur"])
        for r in ks_drift(ref, cur, "value", ["event_type"]).collect()
    }

    def py_ks(a, b):
        xs = sorted(set(a) | set(b))
        na, nb = len(a), len(b)
        sa, sb = sorted(a), sorted(b)
        import bisect

        return max(
            abs(bisect.bisect_right(sa, x) / na - bisect.bisect_right(sb, x) / nb)
            for x in xs
        )

    for g, (rv, cv) in data.items():
        assert got[g][1:] == (len(rv), len(cv))
        assert abs(got[g][0] - round(py_ks(rv, cv), 6)) < 1e-9, g
    assert got["shifted"][0] > got["same"][0]
    # a group missing one side is dropped, not divided by zero
    only_ref = spark.createDataFrame([("x", 1.0)], "event_type string, value double")
    empty = spark.createDataFrame([], "event_type string, value double")
    assert ks_drift(only_ref, empty, "value", ["event_type"]).count() == 0


def test_heavy_hitters_exact_skewed_and_deterministic(spark):
    """The MG candidate pass may not lose a true heavy hitter under
    heavy skew, tiny capacity, or adversarial partitioning, and the
    exact recount must make the output identical to a plain
    groupBy-HAVING regardless of partition layout."""
    from etl_sendas_spark.operators.sketches import heavy_hitters_exact

    # 100k rows: key 0 = 20%, key 1 = 5%, keys 2.. uniform tail + nulls
    df = spark.range(0, 100_000).select(
        F.when(F.col("id") % 5 == 0, F.lit(0))
        .when(F.col("id") % 20 == 1, F.lit(1))
        .when(F.col("id") % 97 == 3, F.lit(None))
        .otherwise((F.col("id") % 4096) + 10)
        .alias("k")
    )
    truth = {
        (r["k"], r["count"])
        for r in df.filter(F.col("k").isNotNull())
        .groupBy("k")
        .count()
        .collect()
        if r["count"] > 0.04 * 97938  # non-null total
    }
    for parts in (3, 32, 200):
        for route in ("auto", "groupby", "misra_gries"):
            out = heavy_hitters_exact(
                df.repartition(parts), "k", threshold=0.04, route=route
            )
            got = {(r["k"], r["cnt"]) for r in out.collect()}
            assert got == truth, f"parts={parts} route={route}"

    # capacity below the default still keeps exactness (recount guards),
    # as long as capacity >= ceil(1/theta) the guarantee argument holds;
    # here we deliberately pass the minimum
    out_min = heavy_hitters_exact(
        df, "k", threshold=0.04, capacity=25, route="misra_gries"
    )
    assert {(r["k"], r["cnt"]) for r in out_min.collect()} == truth

    # MG plan: below _ISIN_CAP candidates the recount is a pure filtered
    # scan (IN-list pushed into the scan stage) — no join of any kind,
    # and the one aggregate runs over candidate rows only
    plan = (
        heavy_hitters_exact(df, "k", 0.04, route="misra_gries")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    assert " IN " in plan or "isin" in plan.lower() or "INSET" in plan.upper()

    # the router: ~4.1k distinct keys under the default ceiling -> auto
    # takes the plain groupBy (no candidate IN-list in the plan, the
    # measured-faster single-box plan); force the ceiling below the
    # estimate -> auto takes MG (IN-list recount appears)
    auto_plan = (
        heavy_hitters_exact(df, "k", 0.04)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "INSET" not in auto_plan.upper() and "Join" not in auto_plan
    forced_plan = (
        heavy_hitters_exact(df, "k", 0.04, groupby_max_distinct=10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert " IN " in forced_plan or "INSET" in forced_plan.upper()


def test_exact_quantile_histogram_matches_sorted_truth(spark):
    """Histogram-refinement selection == sorted order statistic
    (DuckDB quantile_disc semantics, k = max(1, ceil(q*n))) across
    boundary quantiles, heavy ties at the cut, and forced multi-pass
    refinement; empty/all-NULL -> None."""
    import math

    from etl_sendas_spark.operators.sketches import exact_quantile_histogram

    vals = [float((i * 7919) % 1000) / 7.0 for i in range(3000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    svals = sorted(vals)
    for q in [0.0, 0.01, 0.5, 0.777, 0.99, 1.0]:
        k = max(1, math.ceil(q * len(vals)))
        got = exact_quantile_histogram(df, "v", q, buckets=16, collect_threshold=50)
        assert got == svals[k - 1], (q, got, svals[k - 1])

    ties = [1.0] * 500 + [2.0] * 3 + [3.0] * 497
    tdf = spark.createDataFrame([(v,) for v in ties], "v double")
    st = sorted(ties)
    for q in [0.5, 0.500001, 0.503, 0.504]:
        k = max(1, math.ceil(q * len(ties)))
        got = exact_quantile_histogram(tdf, "v", q, buckets=8, collect_threshold=10)
        assert got == st[k - 1], (q, got, st[k - 1])

    assert exact_quantile_histogram(
        spark.createDataFrame([], "v double"), "v", 0.5
    ) is None
    assert exact_quantile_histogram(
        spark.createDataFrame([(None,), (None,)], "v double"), "v", 0.5
    ) is None


def test_exact_quantile_histogram_boundary_planted_values(spark):
    """Values planted EXACTLY on bucket edges (and one ulp either
    side): floor-index membership vs recomputed `lo + b*width` edges
    can disagree under FP rounding, silently dropping or
    double-counting a boundary row — the refinement now narrows by the
    bucket predicate itself, so every planted edge value must resolve
    to the sorted order statistic."""
    import math

    from etl_sendas_spark.operators.sketches import exact_quantile_histogram

    buckets = 16
    lo, hi = 0.1, 0.1 + 16 * 0.7  # non-round width = 0.7 (inexact in FP)
    width = (hi - lo) / buckets
    edges = [lo + b * width for b in range(buckets + 1)]
    vals = []
    for e in edges:
        vals += [e] * 9
        vals += [math.nextafter(e, -math.inf), math.nextafter(e, math.inf)]
    vals = [v for v in vals if lo <= v <= hi]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    svals = sorted(vals)
    for q in [0.0, 0.25, 0.5, 0.5001, 0.75, 1.0]:
        k = max(1, math.ceil(q * len(vals)))
        got = exact_quantile_histogram(
            df, "v", q, buckets=buckets, collect_threshold=10
        )
        assert got == svals[k - 1], (q, got, svals[k - 1])


def test_exact_quantiles_histogram_batch_matches_singular(spark):
    """Batch form == singular form for every q (shared first-pass
    histogram + one tagged collect), including the oversized-bucket
    fallback (forced by a tiny collect threshold against a huge value
    mass) and the small-n degenerate path."""
    from etl_sendas_spark.operators.sketches import (
        exact_quantile_histogram,
        exact_quantiles_histogram,
    )

    vals = [float((i * 104729) % 5000) / 11.0 for i in range(4000)]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    qs = [0.0, 0.1, 0.5, 0.51, 0.9, 1.0]
    batch = exact_quantiles_histogram(df, "v", qs, buckets=32, collect_threshold=300)
    for q, got in batch:
        assert got == exact_quantile_histogram(
            df, "v", q, buckets=32, collect_threshold=300
        ), q

    # oversized bucket: 3500 copies of one value with threshold 100
    mass = [42.0] * 3500 + [float(i) for i in range(500)]
    mdf = spark.createDataFrame([(v,) for v in mass], "v double")
    sm = sorted(mass)
    import math

    for q, got in exact_quantiles_histogram(
        mdf, "v", [0.25, 0.5, 0.95], buckets=16, collect_threshold=100
    ):
        k = max(1, math.ceil(q * len(mass)))
        assert got == sm[k - 1], (q, got)

    # small n: degenerates to the singular path
    tiny = spark.createDataFrame([(1.0,), (2.0,)], "v double")
    assert exact_quantiles_histogram(tiny, "v", [0.5, 1.0]) == [(0.5, 1.0), (1.0, 2.0)]


def test_ivf_index_at_rest_build_once_query_many(spark, tmp_path):
    """At-rest IVF index (round 8): (1) BUILD-ONCE LAW — querying the
    persisted index returns row-for-row the inline ivf_cosine_topk
    over the same corpus, for TWO different query sets against one
    build (no per-call rebuild). (2) The probe read provably scans
    only the probed clusters' partition files (inputFiles < full).
    (3) APPEND LAW — build(A) + append(B) equals
    build(A ∪ B, centroid_source=A) row-for-row: appends assign
    against the frozen centroids and never rescan A."""
    from etl_sendas_spark.operators.similarity import (
        ivf_cosine_topk,
        ivf_index_append,
        ivf_index_build,
        ivf_index_topk,
    )
    from etl_sendas_spark.sources.txlog import TxLogTable

    vecs, n, n_dups = _planted_vectors(spark)

    idx = str(tmp_path / "ivf_idx")
    ivf_index_build(vecs, idx, n_centroids=16)

    for qfilter in ("vec_id >= 200", "vec_id < 10"):
        queries = vecs.filter(qfilter)
        got = sorted(
            map(tuple, ivf_index_topk(
                spark, idx, queries, k=5, n_probe=8
            ).collect())
        )
        want = sorted(
            map(tuple, ivf_cosine_topk(
                vecs, queries, k=5, n_centroids=16, n_probe=8
            ).collect())
        )
        assert got == want and len(got) > 0, qfilter

    # the probe scan is partition-pruned: fewer files than a full read
    rows_t = TxLogTable(f"{idx}/rows")
    full_files = len(rows_t.read(spark).inputFiles())
    one_q = vecs.filter("vec_id = 205")
    probed = ivf_index_topk(spark, idx, one_q, k=5, n_probe=2)
    assert len(probed.inputFiles()) < full_files
    assert probed.count() > 0

    # ---- append law --------------------------------------------------
    a = vecs.filter("vec_id % 2 = 0")
    b = vecs.filter("vec_id % 2 = 1")
    idx_a = str(tmp_path / "ivf_a")
    ivf_index_build(a, idx_a, n_centroids=16)
    ivf_index_append(idx_a, b)

    idx_ab = str(tmp_path / "ivf_ab")
    ivf_index_build(vecs, idx_ab, n_centroids=16, centroid_source=a)

    queries = vecs.filter("vec_id >= 200")
    got = sorted(
        map(tuple, ivf_index_topk(spark, idx_a, queries, k=5, n_probe=8).collect())
    )
    want = sorted(
        map(tuple, ivf_index_topk(spark, idx_ab, queries, k=5, n_probe=8).collect())
    )
    assert got == want and len(got) > 0
    # the index tables are ordinary txlog tables: the append left a
    # new version, history intact
    assert TxLogTable(f"{idx_a}/rows").versions() == [0, 1]


def test_ivfpq_index_at_rest_build_once_query_many(spark, tmp_path):
    """At-rest IVF-PQ index (round 8): persisted codes (m ints per
    vector, no stored vectors) must reproduce the inline
    ivfpq_cosine_topk pure-ADC ranking row-for-row across two query
    sets from ONE build; the probe read scans only probed clusters'
    partition files; and the append law holds — build(A) + append(B)
    == build(A ∪ B, centroid_source=A)."""
    from etl_sendas_spark.operators.similarity import (
        ivfpq_cosine_topk,
        ivfpq_index_append,
        ivfpq_index_build,
        ivfpq_index_topk,
    )
    from etl_sendas_spark.sources.txlog import TxLogTable

    vecs, n, n_dups = _planted_vectors(spark)

    idx = str(tmp_path / "pq_idx")
    ivfpq_index_build(
        vecs, idx, n_centroids=16, m_subspaces=4, n_codes=16
    )
    for qfilter in ("vec_id >= 200", "vec_id < 10"):
        queries = vecs.filter(qfilter)
        got = sorted(
            map(tuple, ivfpq_index_topk(
                spark, idx, queries, k=5, n_probe=8
            ).collect())
        )
        want = sorted(
            map(tuple, ivfpq_cosine_topk(
                vecs, queries, k=5, n_centroids=16, n_probe=8,
                m_subspaces=4, n_codes=16,
            ).collect())
        )
        assert got == want and len(got) > 0, qfilter

    # probe read is partition-pruned
    codes_t = TxLogTable(f"{idx}/codes")
    full_files = len(codes_t.read(spark).inputFiles())
    probed = ivfpq_index_topk(
        spark, idx, vecs.filter("vec_id = 205"), k=5, n_probe=2
    )
    assert len(probed.inputFiles()) < full_files
    assert probed.count() > 0

    # append law (centroids AND codebook frozen from A)
    a = vecs.filter("vec_id % 2 = 0")
    b = vecs.filter("vec_id % 2 = 1")
    idx_a = str(tmp_path / "pq_a")
    ivfpq_index_build(a, idx_a, n_centroids=16, m_subspaces=4, n_codes=16)
    ivfpq_index_append(idx_a, b)
    idx_ab = str(tmp_path / "pq_ab")
    ivfpq_index_build(
        vecs, idx_ab, n_centroids=16, m_subspaces=4, n_codes=16,
        centroid_source=a,
    )
    queries = vecs.filter("vec_id >= 200")
    got = sorted(
        map(tuple, ivfpq_index_topk(spark, idx_a, queries, k=5, n_probe=8).collect())
    )
    want = sorted(
        map(tuple, ivfpq_index_topk(spark, idx_ab, queries, k=5, n_probe=8).collect())
    )
    assert got == want and len(got) > 0
    assert TxLogTable(f"{idx_a}/codes").versions() == [0, 1]


def test_ivm_join_view_bilinear_law_and_edges(spark):
    """JOIN-view IVM (operators/ivm.incremental_join_update): the
    bilinear delta rule maintained state equals a full recompute with
    per-row MULTIPLICITIES under churn on BOTH sides — with the
    ΔA-key/ΔB-key overlap planted so the ⊖ ΔA⋈ΔB correction term is
    load-bearing (drop it and the overlap rows double-count).  Edges:
    a dim key fully retracted removes every view row it fed; an update
    modeled as D+I swaps the payload; multiplicities > 1 decrement,
    not vanish, on a single retraction."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.ivm import (
        incremental_join_update,
        join_view_state,
    )

    a_old = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, "x"), (3, "z"), (4, "w")],
        ["k", "a"],
    )
    b_old = spark.createDataFrame(
        [(1, "P"), (2, "P"), (3, "Q"), (5, "R")], ["k", "b"]
    )
    state = join_view_state(a_old, b_old, ["k"], ["a"], ["b"])
    got0 = {(r.k, r.a, r.b): r.n for r in state.collect()}
    assert got0[(1, "x", "P")] == 2 and got0[(3, "z", "Q")] == 1
    assert (4, "w", None) not in got0  # inner join: unmatched A absent

    # ΔA: insert k=5 (joins ΔB-churned side too? no — 5 stays R),
    # insert k=2 twice, retract ONE copy of (1,'x'); ΔB: k=2 resegments
    # P→S (D+I: the ΔA inserts on k=2 overlap ΔB — correction term
    # territory), k=3 churns out entirely, k=4 appears (joins old
    # unmatched A rows).
    a_changes = spark.createDataFrame(
        [(5, "v", "I"), (2, "x", "I"), (2, "x", "I"), (1, "x", "D")],
        ["k", "a", "op"],
    )
    b_changes = spark.createDataFrame(
        [(2, "P", "D"), (2, "S", "I"), (3, "Q", "D"), (4, "T", "I")],
        ["k", "b", "op"],
    )
    a_new = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (2, "x"), (2, "x"), (3, "z"),
         (4, "w"), (5, "v")],
        ["k", "a"],
    )
    b_new = spark.createDataFrame(
        [(1, "P"), (2, "S"), (4, "T"), (5, "R")], ["k", "b"]
    )
    maintained = incremental_join_update(
        state, a_changes, b_changes, a_new, b_new, ["k"], ["a"], ["b"]
    )
    full = join_view_state(a_new, b_new, ["k"], ["a"], ["b"])
    got = sorted((r.k, r.a, r.b, r.n) for r in maintained.collect())
    want = sorted((r.k, r.a, r.b, r.n) for r in full.collect())
    assert got == want
    d = {(k, a, b): n for k, a, b, n in got}
    assert d[(1, "x", "P")] == 1        # multiplicity decremented, kept
    assert d[(2, "x", "S")] == 3        # D+I reseg + 2 inserts (overlap)
    assert all(k != 3 for k, _, _, _ in got)   # churned dim key gone
    assert d[(4, "w", "T")] == 1        # new dim key joins old A rows
    assert d[(5, "v", "R")] == 1        # new A row joins untouched dim

    # feed-churn cancellation: an I+D pair for the same tuple is a
    # no-op (weights cancel before any base probe)
    noop_a = spark.createDataFrame(
        [(1, "x", "I"), (1, "x", "D")], ["k", "a", "op"]
    )
    empty_b = spark.createDataFrame([], "k INT, b STRING, op STRING")
    unchanged = incremental_join_update(
        state, noop_a, empty_b, a_old, b_old, ["k"], ["a"], ["b"]
    )
    assert sorted((r.k, r.a, r.b, r.n) for r in unchanged.collect()) == sorted(
        (r.k, r.a, r.b, r.n) for r in state.collect()
    )


def test_resample_ffill_grid_and_fill_semantics(spark):
    """Gap-fill resample edges: each key's grid spans its OWN min..max
    bucket; empty buckets carry n=0, filled=1, and the last populated
    value; a populated bucket whose values are all NULL keeps n>0 /
    filled=0 but still inherits the previous value (the fill skips
    null aggregates, not just missing buckets); agg='last' picks the
    latest-by-ts sample in the bucket."""
    import datetime as dt

    from etl_sendas_spark.operators.timeseries import resample_ffill

    def ts(h, m=0):
        return dt.datetime(2024, 1, 1, h, m)

    rows = [
        ("a", ts(0, 5), 10.0),
        ("a", ts(0, 40), 20.0),   # same bucket as above (1h grid)
        ("a", ts(3, 10), 7.0),    # 2 gap buckets before this
        ("b", ts(5, 0), 1.0),
        ("b", ts(6, 0), None),    # populated bucket, null value
        ("b", ts(7, 0), 3.0),
    ]
    df = spark.createDataFrame(rows, "k STRING, t TIMESTAMP, v DOUBLE")
    out = {
        (r.k, r.bucket_ts.hour): (r.n, r.value, r.filled)
        for r in resample_ffill(
            df, ["k"], "t", "v", 3600, agg="avg"
        ).collect()
    }
    assert out[("a", 0)] == (2, 15.0, 0)       # avg of the 2 samples
    assert out[("a", 1)] == (0, 15.0, 1)       # gap, ffilled
    assert out[("a", 2)] == (0, 15.0, 1)
    assert out[("a", 3)] == (1, 7.0, 0)
    assert ("a", 4) not in out                  # grid ends at a's max
    assert ("b", 4) not in out                  # grid starts at b's min
    assert out[("b", 5)] == (1, 1.0, 0)
    assert out[("b", 6)] == (1, 1.0, 0)        # null agg inherits, n=1
    assert out[("b", 7)] == (1, 3.0, 0)

    last = {
        (r.k, r.bucket_ts.hour): r.value
        for r in resample_ffill(
            df, ["k"], "t", "v", 3600, agg="last"
        ).collect()
    }
    assert last[("a", 0)] == 20.0               # latest-by-ts wins


def test_k_anonymize_suppression_properties(spark):
    """Release-gate laws: the released table is k-anonymous and
    l-diverse BY CONSTRUCTION (every surviving combination has >= k
    rows and >= l distinct sensitive values IN THE RELEASE); NULL
    quasi values form a combination like any other (null-safe
    membership); suppression only removes rows, never mutates."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.privacy import (
        k_anonymity_report,
        k_anonymize,
    )

    rows = [
        # (zip, age_band, disease)
        ("111", "30s", "flu"), ("111", "30s", "cold"), ("111", "30s", "flu"),
        ("222", "40s", "flu"), ("222", "40s", "flu"), ("222", "40s", "flu"),
        ("333", "50s", "rare"),                       # k=1: suppressed
        (None, "30s", "flu"), (None, "30s", "cold"), (None, "30s", "flu"),
    ]
    df = spark.createDataFrame(rows, "zip STRING, age STRING, dx STRING")

    out = k_anonymize(df, ["zip", "age"], k=3, sensitive_col="dx", min_l=2)
    rep = k_anonymity_report(out, ["zip", "age"], "dx").collect()
    assert len(rep) > 0
    for r in rep:
        assert r["k"] >= 3 and r["l"] >= 2
    got = {(r.zip, r.age) for r in out.collect()}
    assert ("333", "50s") not in got          # under-k suppressed
    assert ("222", "40s") not in got          # k ok but uniform dx (l=1)
    assert (None, "30s") in got               # NULL combination passes
    assert ("111", "30s") in got
    # suppression never mutates surviving rows
    key = lambda t: tuple("" if x is None else x for x in t)
    kept = sorted(map(tuple, out.collect()), key=key)
    orig = sorted(
        map(
            tuple,
            df.filter(
                F.col("zip").eqNullSafe(F.lit("111")) | F.col("zip").isNull()
            ).collect(),
        ),
        key=key,
    )
    assert kept == orig


def test_mad_outliers_degenerate_groups(spark):
    """MAD edges: a wild value flags while the mean/σ rule would have
    been inflated past it; MAD=0 groups flag exactly the values off
    the median (NULL z); singletons never flag."""
    from etl_sendas_spark.operators.quality_checks import mad_outliers

    rows = (
        [("a", float(v)) for v in (10, 11, 12, 11, 10, 12, 11, 1000)]
        + [("b", 5.0), ("b", 5.0), ("b", 5.0), ("b", 9.0)]  # MAD = 0
        + [("c", 42.0)]                                      # singleton
    )
    df = spark.createDataFrame(rows, "k STRING, v DOUBLE")
    out = mad_outliers(df, ["k"], "v", thresh=3.5).collect()
    flags = {(r.k, r.v): (r.is_outlier, r.mad_z) for r in out}
    assert flags[("a", 1000.0)][0] == 1
    assert all(f == 0 for (k, v), (f, _) in flags.items()
               if k == "a" and v != 1000.0)
    assert flags[("b", 9.0)] == (1, None)      # MAD=0: off-median flags
    assert flags[("b", 5.0)][0] == 0
    assert flags[("c", 42.0)][0] == 0          # singleton never flags


def test_mad_outliers_rejects_colliding_input_columns(spark):
    """mad_outliers raises on input columns that would collide with
    its med/mad/mad_z/is_outlier outputs (round-10 ADVICE fix) rather
    than producing ambiguous or duplicate columns."""
    import pytest

    from etl_sendas_spark.operators.quality_checks import mad_outliers

    df = spark.createDataFrame(
        [("a", 1.0, 9.0)], "g STRING, x DOUBLE, mad DOUBLE"
    )
    with pytest.raises(ValueError, match="collide"):
        mad_outliers(df, ["g"], "x")


def test_ivf_index_refresh_tracks_corpus_dml(spark, tmp_path):
    """CDF-driven IVF maintenance (round 10): corpus deletes, a vector
    rewrite, and appends land as ONE replace_where on the rows table —
    the refreshed index answers row-for-row like a fresh build of the
    corpus head against the SAME frozen centroids, and the watermark
    advances in the refresh commit. Second refresh: no-op."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_refresh,
        ivf_index_topk,
    )
    from etl_sendas_spark.sources.txlog import TxLogTable

    vecs, n, n_dups = _planted_vectors(spark)
    corpus_root = str(tmp_path / "vcorpus")
    corpus = TxLogTable.create(corpus_root, vecs)

    idx = str(tmp_path / "ivf_idx")
    ivf_index_build(
        corpus.read(spark), idx, n_centroids=16, src_version=0
    )
    assert ivf_index_refresh(spark, idx, corpus_root) is None

    # DML: delete a slice, rewrite one vector, append two new ones
    corpus.delete_where(spark, "vec_id % 9 = 3")
    dim = len(vecs.select("embedding").first()[0])
    corpus.update_where(
        spark,
        {"embedding": f"array({', '.join(['0.5D'] * dim)})"},
        "vec_id = 4",
    )
    new_rows = (
        vecs.filter("vec_id IN (10, 11)")
        .select(
            (F.col("vec_id") + 700000).alias("vec_id"), "embedding"
        )
    )
    corpus.append(new_rows, spark)

    v = ivf_index_refresh(spark, idx, corpus_root)
    assert v is not None
    rows_t = TxLogTable(f"{idx}/rows")
    assert rows_t._read_commit(v)["op"] == "replace_where"
    assert (
        int(rows_t.commit_meta(v)["idx_src_version"])
        == corpus.latest_version()
    )

    # equality law vs a fresh build sharing the FROZEN quantizer
    # (centroid_source = the original corpus frame, deterministic)
    fresh = str(tmp_path / "ivf_fresh")
    ivf_index_build(
        corpus.read(spark), fresh, n_centroids=16,
        centroid_source=vecs,
    )
    queries = vecs.filter("vec_id >= 200")
    got = sorted(
        map(
            tuple,
            ivf_index_topk(spark, idx, queries, k=5, n_probe=8).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            ivf_index_topk(
                spark, fresh, queries, k=5, n_probe=8
            ).collect(),
        )
    )
    assert got == want and len(got) > 0

    assert ivf_index_refresh(spark, idx, corpus_root) is None


def test_incremental_distinct_update_multiplicity_cases(spark):
    """Distinct-count IVM (round 10): (1) deleting ONE of a user's two
    rows leaves the distinct count unchanged; (2) deleting the LAST
    row drops the user; (3) I/D churn on the same (key, value) cancels
    to a no-op; (4) NULL values never count; incremental state always
    equals recompute."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.ivm import (
        distinct_counts,
        distinct_state,
        incremental_distinct_update,
    )

    base = spark.createDataFrame(
        [("a", 1), ("a", 1), ("a", 2), ("b", 3), ("b", None)],
        "k STRING, u INT",
    )
    state = distinct_state(base, ["k"], "u")
    got0 = {
        (r["k"], r["n_distinct"])
        for r in distinct_counts(state, ["k"]).collect()
    }
    assert got0 == {("a", 2), ("b", 1)}

    changes = spark.createDataFrame(
        [
            ("a", 1, "D"),   # one of two copies: count unchanged
            ("a", 2, "D"),   # last copy: a loses u=2
            ("b", 3, "D"),   # churn pair...
            ("b", 3, "I"),   # ...cancels before the state merge
            ("b", 9, "I"),   # new distinct value
            ("b", None, "I"),  # NULL: ignored
        ],
        "k STRING, u INT, op STRING",
    )
    new_state = incremental_distinct_update(state, changes, ["k"], "u")
    got = {
        (r["k"], r["n_distinct"])
        for r in distinct_counts(new_state, ["k"]).collect()
    }
    # recompute oracle: apply the same changes to the base rows
    eff = spark.createDataFrame(
        [("a", 1), ("b", 3), ("b", 9)], "k STRING, u INT"
    )
    want = {
        (r["k"], r["n_distinct"])
        for r in eff.groupBy("k")
        .agg(F.countDistinct("u").alias("n_distinct"))
        .collect()
    }
    assert got == want == {("a", 1), ("b", 2)}
    # multiplicity detail: (a, 1) survives with m == 1
    m = {
        (r["k"], r["u"]): r["m"] for r in new_state.collect()
    }
    assert m[("a", 1)] == 1 and ("a", 2) not in m


def test_ivfpq_index_refresh_tracks_corpus_dml(spark, tmp_path):
    """IVF-PQ refresh (round 10): after corpus deletes + a rewrite +
    appends, one replace_where on the codes table makes the probe
    equal a fresh build with the SAME frozen quantizer+codebook."""
    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_refresh,
        ivfpq_index_topk,
    )
    from etl_sendas_spark.sources.txlog import TxLogTable

    vecs, n, n_dups = _planted_vectors(spark)
    corpus_root = str(tmp_path / "vcorpus")
    corpus = TxLogTable.create(corpus_root, vecs)

    idx = str(tmp_path / "pq_idx")
    ivfpq_index_build(
        corpus.read(spark), idx, n_centroids=16, m_subspaces=4,
        n_codes=16, src_version=0,
    )
    assert ivfpq_index_refresh(spark, idx, corpus_root) is None

    corpus.delete_where(spark, "vec_id % 9 = 3")
    dim = len(vecs.select("embedding").first()[0])
    corpus.update_where(
        spark,
        {"embedding": f"array({', '.join(['0.5D'] * dim)})"},
        "vec_id = 4",
    )
    corpus.append(
        vecs.filter("vec_id IN (10, 11)").select(
            (F.col("vec_id") + 700000).alias("vec_id"), "embedding"
        ),
        spark,
    )

    v = ivfpq_index_refresh(spark, idx, corpus_root)
    assert v is not None
    codes_t = TxLogTable(f"{idx}/codes")
    assert codes_t._read_commit(v)["op"] == "replace_where"
    assert (
        int(codes_t.commit_meta(v)["idx_src_version"])
        == corpus.latest_version()
    )

    fresh = str(tmp_path / "pq_fresh")
    ivfpq_index_build(
        corpus.read(spark), fresh, n_centroids=16, m_subspaces=4,
        n_codes=16, centroid_source=vecs,
    )
    queries = vecs.filter("vec_id >= 200")
    got = sorted(
        map(
            tuple,
            ivfpq_index_topk(
                spark, idx, queries, k=5, n_probe=8
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            ivfpq_index_topk(
                spark, fresh, queries, k=5, n_probe=8
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    assert ivfpq_index_refresh(spark, idx, corpus_root) is None


def test_ivf_index_refresh_auto_chunks_through_crash(
    spark, tmp_path, monkeypatch
):
    """Round-11: the IVF twin of the text auto-chunk law — a wave
    touching 3x the cap lands as bounded replace_where commits; a
    crash between chunks leaves the idx_wave cursor; the re-run skips
    the committed slice and the refreshed index equals a fresh build
    against the SAME frozen centroids."""
    import pytest

    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_refresh,
        ivf_index_topk,
    )
    from etl_sendas_spark.sources.txlog import TxLogTable

    vecs, n, n_dups = _planted_vectors(spark)
    corpus_root = str(tmp_path / "vcorpus")
    corpus = TxLogTable.create(corpus_root, vecs)
    idx = str(tmp_path / "ivf_idx")
    ivf_index_build(corpus.read(spark), idx, n_centroids=16, src_version=0)

    # wave: rewrite a third of the vectors (scale each), delete a slice
    dim = len(vecs.select("embedding").first()[0])
    corpus.update_where(
        spark,
        {"embedding": "transform(embedding, x -> x * CAST(1.1 AS FLOAT))"},
        "vec_id % 3 = 0",
    )
    corpus.delete_where(spark, "vec_id % 9 = 4")
    n_touched = vecs.filter("vec_id % 3 = 0 OR vec_id % 9 = 4").count()
    cap = max(1, n_touched // 3 - 1)
    expected_chunks = -(-n_touched // cap)
    assert expected_chunks >= 3

    rows_t = TxLogTable(f"{idx}/rows")
    pre_wm = int(rows_t.commit_meta(rows_t.latest_version())["idx_src_version"])
    orig = TxLogTable.replace_where
    calls = []

    def crashing(self, *a, **k):
        calls.append(1)
        if len(calls) == 2:
            raise RuntimeError("simulated mid-wave crash")
        return orig(self, *a, **k)

    monkeypatch.setattr(TxLogTable, "replace_where", crashing)
    with pytest.raises(RuntimeError, match="mid-wave"):
        ivf_index_refresh(spark, idx, corpus_root, max_touched_ids=cap, rebuild_fraction=2.0)
    monkeypatch.setattr(TxLogTable, "replace_where", orig)

    mid = rows_t.commit_meta(rows_t.latest_version())
    assert int(mid["idx_src_version"]) == pre_wm
    assert mid["idx_wave"]["to"] == corpus.latest_version()

    n_before = rows_t.latest_version()
    v = ivf_index_refresh(spark, idx, corpus_root, max_touched_ids=cap, rebuild_fraction=2.0)
    assert v is not None and v - n_before == expected_chunks - 1
    meta = rows_t.commit_meta(v)
    assert "idx_wave" not in meta
    assert int(meta["idx_src_version"]) == corpus.latest_version()

    fresh = str(tmp_path / "ivf_fresh")
    ivf_index_build(
        corpus.read(spark), fresh, n_centroids=16, centroid_source=vecs
    )
    queries = vecs.filter("vec_id >= 200")
    got = sorted(map(tuple, ivf_index_topk(
        spark, idx, queries, k=5, n_probe=8).collect()))
    want = sorted(map(tuple, ivf_index_topk(
        spark, fresh, queries, k=5, n_probe=8).collect()))
    assert got == want and len(got) > 0


def test_ivf_index_refresh_rebuild_fallback(spark, tmp_path):
    """Round-11 rebuild fallback for the vector twin: an oversized
    spread-out wave re-assigns ALL live vectors against the FROZEN
    centroids in ONE overwrite; the result must equal the chunked
    refresh of an identical index copy (both claim equality with the
    fresh build under the frozen quantizer)."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from etl_sendas_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_refresh,
        ivf_index_topk,
    )
    from etl_sendas_spark.sources.txlog import TxLogTable

    vecs = (
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(150)
    )
    corpus_root = str(tmp_path / "corpus")
    corpus = TxLogTable.create(corpus_root, vecs)
    idx = str(tmp_path / "idx")
    ivf_index_build(
        corpus.read(spark), idx, n_centroids=8, src_version=0
    )
    idx2 = str(tmp_path / "idx2")
    shutil.copytree(idx, idx2)

    # wave touching ~half the corpus, spread over the id space
    corpus.update_where(
        spark,
        {"embedding": "transform(embedding, x -> x * CAST(2.0 AS FLOAT))"},
        "vec_id % 2 = 0",
    )
    corpus.delete_where(spark, "vec_id % 15 = 1")

    t = TxLogTable(os.path.join(idx, "rows"))
    before = t.latest_version()
    v = ivf_index_refresh(spark, idx, corpus_root, max_touched_ids=10)
    assert v == before + 1  # ONE overwrite, not ~8 chunks
    meta = t.commit_meta(v)
    assert meta["op"] == "overwrite" and meta.get("idx_rebuild") is True
    assert int(meta["idx_src_version"]) == corpus.latest_version()

    # chunked path on the identical copy must land the same index
    ivf_index_refresh(
        spark, idx2, corpus_root, max_touched_ids=10,
        rebuild_fraction=2.0,
    )
    q = vecs.limit(5)
    got = sorted(map(tuple, ivf_index_topk(spark, idx, q, k=3).collect()))
    want = sorted(map(tuple, ivf_index_topk(spark, idx2, q, k=3).collect()))
    assert got == want and len(got) > 0
