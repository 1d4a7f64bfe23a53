"""Hypothesis property tests for the pure-Python helpers (no Spark
session — these run in milliseconds and fuzz the branchy logic the
example-based tests cover only pointwise)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from etl_sendas_spark.functions.strings import split_name_py
from etl_sendas_spark.sources.readers import latest_partition_files

_token = st.text(
    alphabet=st.sampled_from("ABCDEFGHIJKLMNOPQRSTUVWXYZÑ"), min_size=1, max_size=8
)


@given(st.lists(_token, min_size=0, max_size=7))
@settings(max_examples=300)
def test_split_name_total_and_lossless_on_particle_free_names(tokens):
    """For any particle-free name: the function never throws, returns 4
    strings, and every output token came from the input."""
    particles = {"DE", "DEL", "LA", "LOS"}
    name = " ".join(tokens)
    n1, n2, a1, a2 = split_name_py(name)
    for part in (n1, n2, a1, a2):
        assert isinstance(part, str)
        for tok in part.split():
            assert tok in tokens
    if not any(t in particles for t in tokens):
        # no particles → output tokens exactly cover the input (the
        # reference drops nothing except a trailing particle)
        out_tokens = " ".join(p for p in (n1, n2, a1, a2) if p).split()
        assert sorted(out_tokens) == sorted(tokens)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=2000, max_value=2099),  # year
            st.integers(min_value=1, max_value=12),       # month
            st.integers(min_value=1, max_value=28),       # day
            st.integers(min_value=0, max_value=99),       # suffix
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=200)
def test_latest_partition_files_keeps_exactly_max_anomes(specs):
    files = [
        f"produccion_{y}{m:02d}{d:02d}_{s:02d}.xlsx" for (y, m, d, s) in specs
    ]
    keep, mes = latest_partition_files(files)
    anomes = [f"{y}{m:02d}" for (y, m, d, s) in specs]
    top = max(anomes)
    assert mes == int(top[-2:])
    assert keep  # at least one file of the max month
    assert all(f.split("_")[1][:6] == top for f in keep)
    # nothing from the max month is dropped
    expect = {f for f, am in zip(files, anomes) if am == top}
    assert set(keep) == expect
    assert keep == sorted(keep, reverse=True)  # reference's name-desc order


_word = st.text(alphabet="abcdef01", min_size=1, max_size=12)


@given(
    _word,
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef01", min_size=1, max_size=3),
            st.text(alphabet="abcdef01", min_size=1, max_size=3),
        ),
        min_size=0,
        max_size=12,
    ),
)
@settings(max_examples=300, deadline=None)
def test_bpe_encode_word_lossless_and_rank_greedy(word, pairs):
    """The greedy BPE encode kernel (functions/bpe._encode_word) is
    lossless for ANY merge table (token concat == word + EOW),
    deterministic, and a fixpoint: no adjacent pair of output tokens
    is itself a known merge (the loop may only stop when nothing
    applies)."""
    from etl_sendas_spark.functions.bpe import EOW, _encode_word

    ranks = {p: i for i, p in enumerate(dict.fromkeys(pairs))}
    toks = _encode_word(word, ranks)
    assert "".join(toks) == word + EOW
    # fixpoint: no adjacent pair of output tokens is a known merge
    for a, b in zip(toks, toks[1:]):
        assert (a, b) not in ranks
    # determinism
    assert _encode_word(word, ranks) == toks
