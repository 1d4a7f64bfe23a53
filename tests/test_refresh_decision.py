"""Round-12 pins for the count-first index-refresh decision.

The r11 verdict's one scale-killer: all three index-refresh twins
(`text_index_refresh`, `ivf_index_refresh`, `ivfpq_index_refresh`)
collected the full touched-id set to the driver BEFORE comparing its
size to the rebuild threshold — so the oversized-wave case the rebuild
fallback exists for (~100M ids at 100 TB) OOM'd the driver on the way
to the fallback.  `decide_refresh_wave` (txlog.py) now counts
cluster-side first; these tests pin:

1. an oversized wave takes the rebuild branch with ZERO collect() of
   the feed's touched-id projection (spied via a DataFrame.collect
   wrapper recording every collected frame's columns);
2. the between-bounds case (over the chunking budget, under the
   rebuild fraction) raises loudly instead of collecting;
3. the ≤cap and ≤budget paths still behave (collected list, sorted).
"""
from __future__ import annotations

import os

import pytest
from pyspark.sql import DataFrame

from conftest import SF_ORACLE


def _spy_collect(monkeypatch, record):
    """Wrap DataFrame.collect to record each collected frame's column
    list (the touched-id projection is exactly ``[id_col]``)."""
    real = DataFrame.collect

    def spy(self):
        record.append(list(self.columns))
        return real(self)

    monkeypatch.setattr(DataFrame, "collect", spy)


def test_decide_refresh_wave_unit(spark):
    from etl_sendas_spark.sources.txlog import decide_refresh_wave

    feed = spark.createDataFrame(
        [(i,) for i in range(10)] * 2, "doc_id INT"
    )
    empty = feed.limit(0)

    assert decide_refresh_wave(
        empty, "doc_id", max_touched_ids=5, rebuild_fraction=0.05,
        base_count=100,
    ) == ("noop", None)

    # ≤ cap: chunked, ids materialized
    s, ids = decide_refresh_wave(
        feed, "doc_id", max_touched_ids=20, rebuild_fraction=0.05,
        base_count=10,
    )
    assert s == "chunked" and sorted(ids) == list(range(10))

    # > cap and ≥ fraction of base: rebuild, no ids
    assert decide_refresh_wave(
        feed, "doc_id", max_touched_ids=5, rebuild_fraction=0.5,
        base_count=10,
    ) == ("rebuild", None)

    # > budget but < fraction: loud raise naming the knobs
    with pytest.raises(ValueError, match="chunking budget"):
        decide_refresh_wave(
            feed, "doc_id", max_touched_ids=2, rebuild_fraction=0.9,
            base_count=1_000_000, max_chunks=3,
        )

    # > cap, < fraction, but within budget: chunked
    s, ids = decide_refresh_wave(
        feed, "doc_id", max_touched_ids=2, rebuild_fraction=0.9,
        base_count=1_000_000, max_chunks=10,
    )
    assert s == "chunked" and len(ids) == 10


def test_ivf_rebuild_never_collects_feed_ids(spark, tmp_path, monkeypatch):
    """Oversized wave → rebuild branch → zero collect of the feed's
    single-column id projection (bounded collects — centroids, commit
    metadata — are allowed and recorded for the assertion's sake)."""
    from etl_sendas_spark.operators.similarity import (
        ivf_index_build,
        ivf_index_refresh,
    )
    from etl_sendas_spark.sources.txlog import TxLogTable

    vecs = (
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(120)
    )
    corpus_root = str(tmp_path / "corpus")
    corpus = TxLogTable.create(corpus_root, vecs)
    idx = str(tmp_path / "idx")
    ivf_index_build(corpus.read(spark), idx, n_centroids=6, src_version=0)

    corpus.delete_where(spark, "vec_id % 2 = 0")  # spread, ~half the ids

    collected: list[list[str]] = []
    _spy_collect(monkeypatch, collected)
    t = TxLogTable(os.path.join(idx, "rows"))
    before = t.latest_version()
    v = ivf_index_refresh(spark, idx, corpus_root, max_touched_ids=10)
    assert v == before + 1
    assert t.commit_meta(v).get("idx_rebuild") is True
    assert ["vec_id"] not in collected, (
        "rebuild path collected the touched-id projection: "
        f"{collected}"
    )


def test_text_rebuild_never_collects_feed_ids(spark, tmp_path, monkeypatch):
    from etl_sendas_spark.operators.search import (
        text_index_build,
        text_index_refresh,
    )
    from etl_sendas_spark.sources.txlog import TxLogTable

    docs = (
        spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
        .select("doc_id", "text")
        .limit(120)
    )
    corpus_root = str(tmp_path / "corpus")
    corpus = TxLogTable.create(corpus_root, docs)
    root = str(tmp_path / "idx")
    text_index_build(corpus.read(spark), root, buckets=4, src_version=0)

    corpus.delete_where(spark, "doc_id % 2 = 0")

    collected: list[list[str]] = []
    _spy_collect(monkeypatch, collected)
    t = TxLogTable(root)
    before = t.latest_version()
    v = text_index_refresh(spark, root, corpus_root, max_touched_ids=10)
    assert v == before + 1
    assert t.commit_meta(v).get("idx_rebuild") is True
    assert ["doc_id"] not in collected, (
        f"rebuild path collected the touched-id projection: {collected}"
    )


def test_ivfpq_rebuild_never_collects_feed_ids(spark, tmp_path, monkeypatch):
    from etl_sendas_spark.operators.similarity import (
        ivfpq_index_build,
        ivfpq_index_refresh,
    )
    from etl_sendas_spark.sources.txlog import TxLogTable

    vecs = (
        spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet")
        .select("vec_id", "embedding")
        .limit(120)
    )
    corpus_root = str(tmp_path / "corpus")
    corpus = TxLogTable.create(corpus_root, vecs)
    idx = str(tmp_path / "idx")
    ivfpq_index_build(
        corpus.read(spark), idx, n_centroids=4, m_subspaces=4,
        n_codes=8, src_version=0,
    )

    corpus.delete_where(spark, "vec_id % 2 = 0")

    collected: list[list[str]] = []
    _spy_collect(monkeypatch, collected)
    t = TxLogTable(os.path.join(idx, "codes"))
    before = t.latest_version()
    v = ivfpq_index_refresh(spark, idx, corpus_root, max_touched_ids=10)
    assert v == before + 1
    assert t.commit_meta(v).get("idx_rebuild") is True
    assert ["vec_id"] not in collected, (
        f"rebuild path collected the touched-id projection: {collected}"
    )
