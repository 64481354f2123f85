"""BPE merge learning: the distributed trainer must reproduce the
reference algorithm (Sennrich et al. 2016) exactly — same merges,
same order, deterministic ties — and the encoder must reproduce the
trainer's final segmentation on the training vocabulary."""

import pytest
from hypothesis import given, settings, strategies as st

from cc2dataset_spark.operators.tokenizer import (
    bpe_segment,
    learn_bpe_merges,
)


def _ref_learn(wf, k):
    """Pure-Python BPE trainer, tie-break (count desc, pair asc)."""
    seg = {w: tuple(w) for w in wf}
    merges = []
    for _ in range(k):
        counts = {}
        for w, syms in seg.items():
            for p in zip(syms, syms[1:]):
                counts[p] = counts.get(p, 0) + wf[w]
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        new = {}
        for w, syms in seg.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new[w] = tuple(out)
        seg = new
    return merges, seg


# the paper's worked example vocabulary
_PAPER_WF = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_matches_reference_on_paper_vocab(spark):
    wf = spark.createDataFrame(
        list(_PAPER_WF.items()), ["w", "c"]
    )
    got = learn_bpe_merges(wf, 8)
    want, _ = _ref_learn(_PAPER_WF, 8)
    assert got == want
    # the paper's first merges: ('e','s') with count 9, then ('es','t')
    assert got[0] == ("e", "s") and got[1] == ("es", "t")


def test_stops_early_when_no_pairs_remain(spark):
    wf = spark.createDataFrame([("ab", 3), ("a", 5)], ["w", "c"])
    got = learn_bpe_merges(wf, 10)
    # one merge exhausts every multi-symbol word
    assert got == [("a", "b")]


def test_invalid_k_raises(spark):
    wf = spark.createDataFrame([("ab", 1)], ["w", "c"])
    with pytest.raises(ValueError):
        learn_bpe_merges(wf, -1)
    assert learn_bpe_merges(wf, 0) == []


def test_nonoverlapping_left_to_right_merge(spark):
    # 'aaaa' + merge (a,a): left-to-right non-overlap -> aa|aa, and
    # 'aaa' -> aa|a (the trailing single never re-pairs in-pass)
    wf = spark.createDataFrame([("aaaa", 2), ("aaa", 1)], ["w", "c"])
    merges = learn_bpe_merges(wf, 1)
    assert merges == [("a", "a")]
    enc = {
        r.w: tuple(r.pieces)
        for r in bpe_segment(
            spark.createDataFrame([("aaaa",), ("aaa",)], ["w"]), merges
        ).collect()
    }
    assert enc == {"aaaa": ("aa", "aa"), "aaa": ("aa", "a")}


def test_encoder_reproduces_training_segmentation(spark):
    """Encoding a training word with the learned merge list must land
    on the exact segmentation the trainer ended with — the invariant
    that makes a BPE vocabulary servable."""
    wf = spark.createDataFrame(list(_PAPER_WF.items()), ["w", "c"])
    merges = learn_bpe_merges(wf, 6)
    _, final_seg = _ref_learn(_PAPER_WF, 6)
    words = spark.createDataFrame([(w,) for w in _PAPER_WF], ["w"])
    got = {
        r.w: tuple(r.pieces)
        for r in bpe_segment(words, merges).collect()
    }
    assert got == final_seg


@settings(max_examples=5, deadline=None)
@given(
    words=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=6),
        st.integers(1, 9),
        min_size=1,
        max_size=8,
    ),
    k=st.integers(0, 5),
)
@pytest.mark.slow
def test_matches_reference_fuzz(spark, words, k):
    wf = spark.createDataFrame(list(words.items()), ["w", "c"])
    got = learn_bpe_merges(wf, k)
    want, final_seg = _ref_learn(words, k)
    assert got == want
    enc = {
        r.w: tuple(r.pieces)
        for r in bpe_segment(
            spark.createDataFrame([(w,) for w in words], ["w"]), got
        ).collect()
    }
    assert enc == final_seg


def test_fast_path_equals_distributed_loop(spark):
    """Both trainer paths — the bounded-vocab in-memory fast path
    (default) and the distributed per-merge loop
    (collect_threshold=0) — must learn the IDENTICAL merge list."""
    wf = spark.createDataFrame(list(_PAPER_WF.items()), ["w", "c"])
    fast = learn_bpe_merges(wf, 8)
    dist = learn_bpe_merges(wf, 8, collect_threshold=0)
    assert fast == dist
    assert fast == _ref_learn(_PAPER_WF, 8)[0]


@settings(max_examples=3, deadline=None)
@given(
    words=st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=5),
        st.integers(1, 9),
        min_size=1,
        max_size=6,
    ),
    k=st.integers(1, 4),
)
@pytest.mark.slow
def test_fast_path_equals_distributed_fuzz(spark, words, k):
    wf = spark.createDataFrame(list(words.items()), ["w", "c"])
    assert learn_bpe_merges(wf, k) == learn_bpe_merges(
        wf, k, collect_threshold=0
    )


def test_astral_vocab_falls_back_to_distributed(spark):
    """Astral-plane characters segment differently under Spark's
    UTF-16 split("") vs Python's code-point list() — the fast path
    must refuse and defer to the distributed loop (which is then the
    single source of truth for the learned merges)."""
    wf = spark.createDataFrame([("a\U0001d11eb", 3), ("ab", 2)], ["w", "c"])
    fast_route = learn_bpe_merges(wf, 2)
    dist = learn_bpe_merges(wf, 2, collect_threshold=0)
    # identical BECAUSE the fast path detected the astral char and
    # routed to the same distributed loop
    assert fast_route == dist


def test_null_word_or_count_refused_both_paths(spark):
    """Dirty input (null word or null count) must be refused LOUDLY
    and IDENTICALLY by both trainer paths — previously the fast path
    died with a bare TypeError while the distributed loop silently
    dropped the row, i.e. two different answers on the same input."""
    import pytest
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("w", T.StringType(), True),
            T.StructField("c", T.LongType(), True),
        ]
    )
    for rows in ([("ab", 3), (None, 2)], [("ab", 3), ("cd", None)]):
        wf = spark.createDataFrame(rows, schema)
        with pytest.raises(ValueError, match="null word or count"):
            learn_bpe_merges(wf, 4)
        with pytest.raises(ValueError, match="null word or count"):
            learn_bpe_merges(wf, 4, collect_threshold=0)
