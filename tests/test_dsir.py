"""DSIR importance resampling (operators/dsir.py): selection is biased
toward target-like documents, Gumbel-top-k is seed-deterministic,
gumbel=False degrades to exact top-k by score, and the scoring plan
broadcasts the weight table (the bin table must never shuffle the
corpus side). The cross-engine bin/score/key algebra itself is pinned
by the dsir_select_docs oracle row."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sendas_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
    dsir_scores,
)


def _corpus(spark):
    """300 background docs (common-word vocabulary) + 60 target-like
    docs (distinct vocabulary), ids disjoint; plus a 15-doc held-out
    TARGET sample of the target-like vocabulary."""
    back_words = "the a of and to in for on with by from".split()
    targ_words = "genome protein enzyme ribosome codon helix".split()

    def mk(ids, words, stride):
        return spark.createDataFrame(
            [
                (
                    i,
                    " ".join(
                        words[(i + j) % len(words)]
                        for j in range(12 + i % 5)
                    ),
                    "back" if stride == "b" else "targ",
                )
                for i in ids
            ],
            "doc_id long, text string, kind string",
        )

    raw = mk(range(0, 300), back_words, "b").unionByName(
        mk(range(1000, 1060), targ_words, "t")
    )
    target = mk(range(5000, 5015), targ_words, "t").drop("kind")
    return raw, target


def test_dsir_selects_target_like_docs(spark):
    raw, target = _corpus(spark)
    sel = dsir_resample(
        raw, "doc_id", "text", target, k=60, buckets=2048, seed=3
    )
    rows = sel.collect()
    assert len(rows) == 60
    targ_hits = sum(1 for r in rows if r["kind"] == "targ")
    # all 60 target-like docs dominate the softmax mass by orders of
    # magnitude — essentially all of them must be selected
    assert targ_hits >= 55, f"only {targ_hits}/60 target-like selected"
    # scores separate the populations cleanly
    s = dsir_scores(
        raw, "doc_id", "text",
        dsir_log_weights(target, raw, "text", 2048), 2048,
    )
    agg = {
        r["kind"]: r["m"]
        for r in s.join(raw.select("doc_id", "kind"), "doc_id")
        .groupBy("kind")
        .agg(F.avg("dsir_score").alias("m"))
        .collect()
    }
    assert agg["targ"] > 0 > agg["back"]


def test_dsir_determinism_and_topk_mode(spark):
    raw, target = _corpus(spark)
    a = {
        r["doc_id"]
        for r in dsir_resample(
            raw, "doc_id", "text", target, k=40, buckets=2048, seed=7
        ).collect()
    }
    b = {
        r["doc_id"]
        for r in dsir_resample(
            raw, "doc_id", "text", target, k=40, buckets=2048, seed=7
        ).collect()
    }
    assert a == b, "same seed must select the same set"
    # different seeds reshuffle the Gumbel keys: the KEY of a fixed doc
    # changes even when the selected set is stable
    k7 = dsir_resample(
        raw, "doc_id", "text", target, k=5, buckets=2048, seed=7
    ).select("doc_id", "dsir_key").collect()
    k8 = dsir_resample(
        raw, "doc_id", "text", target, k=5, buckets=2048, seed=8
    ).select("doc_id", "dsir_key").collect()
    assert {(r["doc_id"], r["dsir_key"]) for r in k7} != {
        (r["doc_id"], r["dsir_key"]) for r in k8
    }

    # gumbel=False: exact deterministic top-k by score
    top = dsir_resample(
        raw, "doc_id", "text", target, k=10, buckets=2048, gumbel=False
    ).collect()
    scores = dsir_scores(
        raw, "doc_id", "text",
        dsir_log_weights(target, raw, "text", 2048), 2048,
    ).collect()
    best = sorted(
        scores, key=lambda r: (-r["dsir_score"], r["doc_id"])
    )[:10]
    assert {r["doc_id"] for r in top} == {r["doc_id"] for r in best}


def test_dsir_scoring_plan_broadcasts_weights(spark):
    """The weight table (≤ buckets rows) must reach the corpus scan as
    a broadcast — a shuffle of the exploded gram stream on bucket
    would be a corpus-sized exchange that grows with tokens, not
    bins."""
    raw, target = _corpus(spark)
    w = dsir_log_weights(target, raw, "text", 2048)
    s = dsir_scores(raw, "doc_id", "text", w, 2048)
    plan = s._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    import re

    # the only hash exchanges allowed are the two count aggregations
    # (weights fit) and the per-doc score aggregation
    n = len(re.findall(r"Exchange hashpartitioning", plan))
    assert n <= 3, plan
