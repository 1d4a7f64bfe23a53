"""BPE tokenizer training (functions/bpe.py) held to a pure-Python
reference implementation of Sennrich et al. 2016 — merge-for-merge
equality including the deterministic tiebreak — plus encode round-trip
laws and the plan shapes that make the trainer corpus-scale-safe
(one corpus pass, vocab-sized iterations, shuffle-free encode)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_sendas_spark.functions.bpe import (
    EOW,
    bpe_encode,
    bpe_train,
    pair_counts,
    to_symbols,
    word_freqs,
)

CORPUS = [
    "the cat sat on the mat",
    "the dog ate the cat food",
    "low lower lowest newest new news",
    "the the the widest wide widely",
    "cats dogs mats logs",
    "Lower-case, punctuation; and CASE!",
    "",
] * 3


def _py_train(freqs: dict[str, int], n_merges: int, min_freq: int = 2):
    """Reference trainer: the paper's algorithm, dict-of-lists form."""
    vocab = {w: list(w) + [EOW] for w in freqs}
    merges = []
    for _ in range(n_merges):
        counts: dict = {}
        for w, f in freqs.items():
            s = vocab[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] = counts.get((a, b), 0) + f
        if not counts:
            break
        (a, b), c = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if c < min_freq:
            break
        merges.append((a, b, c))
        for w, s in vocab.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            vocab[w] = out
    return merges


def _corpus_df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def test_bpe_train_matches_python_reference(spark):
    df = _corpus_df(spark)
    freqs = {r["word"]: r["freq"] for r in word_freqs(df).collect()}
    expected = _py_train(freqs, n_merges=25)
    got = bpe_train(df, n_merges=25)
    assert got == expected
    # early stop on min_freq actually triggered (the corpus is small)
    assert len(got) <= 25


def test_bpe_encode_roundtrip_and_vocab_closure(spark):
    df = _corpus_df(spark)
    merges = bpe_train(df, n_merges=20)
    rows = bpe_encode(df, merges).select("text", "bpe_tokens").collect()
    # learned vocab = initial symbols + one new symbol per merge
    learned = {a + b for a, b, _ in merges}
    for r in rows:
        norm = " ".join(
            w
            for w in "".join(
                ch if ch.isalnum() else " " for ch in r["text"].lower()
            ).split()
        )
        joined = "".join(r["bpe_tokens"]).replace(EOW, " ").strip()
        # lossless: concatenating tokens reproduces the normalized text
        assert joined == norm
        for tok in r["bpe_tokens"]:
            base = tok[: -len(EOW)] if tok.endswith(EOW) and tok != EOW else tok
            # every multi-char token is either a learned merge or a
            # learned merge + EOW (closure over the merge alphabet)
            if len(base) > 1:
                assert tok in learned or base in learned or tok == EOW


def test_bpe_encode_idempotent_rerun_and_schema(spark):
    df = _corpus_df(spark)
    merges = [("t", "h", 9), ("th", "e", 9), ("the", EOW, 9)]
    out = bpe_encode(df, merges)
    assert out.columns == ["doc_id", "text", "bpe_tokens"]
    a = {r["doc_id"]: tuple(r["bpe_tokens"]) for r in out.collect()}
    b = {r["doc_id"]: tuple(r["bpe_tokens"]) for r in out.collect()}
    assert a == b
    assert "the" + EOW in a[0]  # ranked merges actually applied


def test_bpe_plan_shapes(spark):
    """Scale pins: (1) word_freqs is ONE shuffle with a partial
    (map-side combine) aggregate; (2) pair_counts adds no Python stage
    — pure JVM explode; (3) encode has no Exchange at all."""
    df = _corpus_df(spark)

    wf_plan = word_freqs(df)._jdf.queryExecution().executedPlan().toString()
    assert wf_plan.count("Exchange") == 1
    assert "partial_count" in wf_plan or "Partial" in wf_plan

    vocab = word_freqs(df).select(to_symbols("word").alias("syms"), "freq")
    pc_plan = pair_counts(vocab)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in pc_plan and "BatchEvalPython" not in pc_plan

    enc_plan = (
        bpe_encode(df, [("t", "h", 9)])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in enc_plan


def test_bpe_merges_roundtrip_through_parquet(spark, tmp_path):
    """Persist merges, reload shuffled, encode — identical tokens.
    Rank order is restored from the rank column, not file order."""
    from etl_sendas_spark.functions.bpe import merges_from_df, merges_to_df

    df = _corpus_df(spark)
    merges = bpe_train(df, n_merges=15)
    path = str(tmp_path / "merges")
    merges_to_df(spark, merges).repartition(4).write.parquet(path)
    reloaded = merges_from_df(spark.read.parquet(path))
    assert reloaded == merges
    a = {r["doc_id"]: tuple(r["bpe_tokens"]) for r in bpe_encode(df, merges).collect()}
    b = {
        r["doc_id"]: tuple(r["bpe_tokens"]) for r in bpe_encode(df, reloaded).collect()
    }
    assert a == b
