"""duplicate_substring_spans: the distributed suffix-ordering
substring dedup must equal a brute-force Python reference (all
duplicated L-gram positions, merged per doc) on hand-built and
randomized corpora, across ext and partition counts."""

import pytest
from hypothesis import given, settings, strategies as st

from cc2dataset_spark.operators.substring import duplicate_substring_spans


def _brute_spans(docs, min_len):
    """All maximal spans covered by token L-grams occurring >= 2
    times corpus-wide (within- or cross-doc) — the Lee et al. 2022
    coverage definition the operator must reproduce."""
    grams = {}
    toks = {d: t.split() for d, t in docs}
    for d, t in toks.items():
        for i in range(len(t) - min_len + 1):
            grams.setdefault(tuple(t[i : i + min_len]), []).append(
                (d, i + 1)
            )
    marks = {}
    for g, occ in grams.items():
        if len(occ) >= 2:
            for d, p in occ:
                marks.setdefault(d, set()).add(p)
    out = set()
    for d, ps in marks.items():
        covered = sorted(
            {q for p in ps for q in range(p, p + min_len)}
        )
        start = prev = covered[0]
        for q in covered[1:]:
            if q != prev + 1:
                out.add((d, start, prev, prev - start + 1))
                start = q
            prev = q
        out.add((d, start, prev, prev - start + 1))
    return out


def _run(spark, docs, min_len, **kw):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = duplicate_substring_spans(df, min_len=min_len, **kw)
    return {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in got.collect()
    }


def test_cross_doc_and_within_doc_merge(spark):
    docs = [
        # cross-doc duplicate "a b c" at positions 2 and 1
        (1, "x a b c y z"),
        (2, "a b c q r s"),
        # within-doc duplicate "p q r" at 1 and 4 -> overlapping
        # L-windows merge into one span 1..6
        (3, "p q r p q r"),
        # too short to carry an L-gram
        (4, "a b"),
        # no duplicated 3-gram despite shared bigrams
        (5, "a b x b c x"),
    ]
    want = {
        (1, 2, 4, 3),
        (2, 1, 3, 3),
        (3, 1, 6, 6),
    }
    assert _run(spark, docs, min_len=3) == want
    assert _brute_spans(docs, 3) == want


@pytest.mark.slow
def test_adjacent_spans_merge_and_gaps_split(spark):
    # "a b c" dup at pos 1, "d e f" dup at pos 4 (adjacent windows
    # 1-3 and 4-6 merge); "x y z" dup at pos 9 stays separate.
    docs = [
        (1, "a b c d e f g u x y z"),
        (2, "a b c h i j"),
        (3, "k d e f l m"),
        (4, "n o x y z w"),
    ]
    got = _run(spark, docs, min_len=3)
    assert got == _brute_spans(docs, 3)
    assert (1, 1, 6, 6) in got and (1, 9, 11, 3) in got


@pytest.mark.parametrize("ext", [0, 1, 5])
@pytest.mark.parametrize("parts", [1, 3])
def test_ext_and_partitions_invariant(spark, ext, parts):
    docs = [
        (1, "the cat sat on the mat and the cat sat on the hat"),
        (2, "a dog ran while the cat sat on the mat quietly"),
        (3, "the cat sat on the mat and the cat sat on the hat"),
    ]
    want = _brute_spans(docs, 4)
    assert (
        _run(spark, docs, min_len=4, ext=ext, num_partitions=parts)
        == want
    )


def test_no_duplicates_yields_empty(spark):
    docs = [(1, "a b c d e"), (2, "f g h i j")]
    got = duplicate_substring_spans(
        spark.createDataFrame(docs, ["doc_id", "text"]), min_len=3
    )
    assert got.count() == 0
    assert [f.name for f in got.schema.fields] == [
        "doc_id",
        "span_start",
        "span_end",
        "span_len",
    ]


def test_invalid_params_raise(spark):
    df = spark.range(1).selectExpr("id AS doc_id", "'a b' AS text")
    with pytest.raises(ValueError):
        duplicate_substring_spans(df, min_len=0)
    with pytest.raises(ValueError):
        duplicate_substring_spans(df, ext=-1)


@settings(max_examples=6, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c"]), min_size=0, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    min_len=st.integers(2, 4),
)
@pytest.mark.slow
def test_matches_brute_force(spark, texts, min_len):
    docs = [(i, t) for i, t in enumerate(texts)]
    assert _run(spark, docs, min_len=min_len) == _brute_spans(
        docs, min_len
    )


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            # tokens that string-extend each other stress the
            # token-atomic ordering: under a joined-string sort "ab"
            # could interleave inside an ["a","b"]-prefix run and
            # break adjacency; the array-typed key must not care
            st.sampled_from(["a", "aa", "ab", "b"]),
            min_size=0,
            max_size=10,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    min_len=st.integers(2, 3),
)
@pytest.mark.slow
def test_matches_brute_force_extending_tokens(spark, texts, min_len):
    docs = [(i, t) for i, t in enumerate(texts)]
    assert _run(spark, docs, min_len=min_len) == _brute_spans(
        docs, min_len
    )


def test_production_threshold_l50(spark):
    """Lee et al.'s production threshold (min_len=50) on documents
    long enough to carry it: planted 60-token cross-doc and
    56-token within-doc duplicates are found as exact maximal spans,
    nothing else fires on the random background, and the default-
    parameter path (ext=0, sampled partitioning) equals brute force."""
    import random

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(500)]
    body = lambda n: [rng.choice(vocab) for _ in range(n)]
    passage = body(60)
    # 3x a 28-token block: the 50-grams at offsets p and p+28 inside
    # the 84-token run coincide, covering the WHOLE run as one
    # maximal span (a 2x block would only duplicate 28-token
    # substrings — below threshold, correctly silent)
    repeat = body(28)
    texts = {}
    for d in range(30):
        texts[d] = body(120)
    texts[3] = texts[3][:20] + passage + texts[3][20:]
    texts[17] = texts[17][:75] + passage + texts[17][75:]
    texts[20] = body(30) + repeat * 3 + body(30)
    docs = [(d, " ".join(t)) for d, t in sorted(texts.items())]

    got = _run(spark, docs, min_len=50)
    assert got == _brute_spans(docs, 50)
    assert (3, 21, 80, 60) in got
    assert (17, 76, 135, 60) in got
    assert (20, 31, 114, 84) in got
    # with 500^50 possible grams, the random background is silent
    assert {g[0] for g in got} == {3, 17, 20}


def test_scan_output_pinned_single_evaluation(spark):
    """The corpus-scale chain (suffix explode -> range exchange ->
    sort -> Arrow scan) must execute ONCE even though two consumers
    (mark stream + seam frame) read the scan output: both must read
    the persisted relation. Without the pin, each consumer re-runs
    the whole chain (observed as 2 FileScan/rangepartitioning pairs
    in the unpinned plan)."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f"), (3, "x y z w q")],
        ["doc_id", "text"],
    )
    out = duplicate_substring_spans(docs, min_len=3)
    out.count()
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2
    pins = getattr(out, "_pinned_intermediates", [])
    assert len(pins) == 1
    for p in pins:
        p.unpersist()


@pytest.mark.parametrize("parts", [1, 3])
def test_fingerprint_mode_equals_tokens_mode(spark, parts):
    docs = [
        (1, "x a b c y z"),
        (2, "a b c q r s"),
        (3, "p q r p q r"),
        (4, "a b"),
        (5, "the cat sat on the mat and the cat sat on the hat"),
        (6, "a dog ran while the cat sat on the mat quietly"),
    ]
    for L in (3, 4):
        want = _brute_spans(docs, L)
        assert (
            _run(spark, docs, min_len=L, key="fingerprint",
                 num_partitions=parts)
            == want
        )
        assert _run(spark, docs, min_len=L, num_partitions=parts) == want


@settings(max_examples=5, deadline=None)
@given(
    texts=st.lists(
        st.lists(
            # string-extending tokens ALSO stress the fingerprint's
            # length-prefixed encoding: "a"+"b" vs "ab" must hash
            # differently ("1:a1:b" vs "2:ab")
            st.sampled_from(["a", "aa", "ab", "b"]),
            min_size=0,
            max_size=10,
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    min_len=st.integers(2, 3),
)
@pytest.mark.slow
def test_fingerprint_matches_brute_force(spark, texts, min_len):
    docs = [(i, t) for i, t in enumerate(texts)]
    assert _run(
        spark, docs, min_len=min_len, key="fingerprint"
    ) == _brute_spans(docs, min_len)


def test_fingerprint_production_threshold_l50(spark):
    """The L=50 planted-duplicate scenario through the production
    (fingerprint) exchange key — same spans as the exact verifier."""
    import random

    rng = random.Random(7)
    vocab = [f"tok{i}" for i in range(500)]
    body = lambda n: [rng.choice(vocab) for _ in range(n)]
    passage = body(60)
    repeat = body(28)
    texts = {}
    for d in range(30):
        texts[d] = body(120)
    texts[3] = texts[3][:20] + passage + texts[3][20:]
    texts[17] = texts[17][:75] + passage + texts[17][75:]
    texts[20] = body(30) + repeat * 3 + body(30)
    docs = [(d, " ".join(t)) for d, t in sorted(texts.items())]

    got = _run(spark, docs, min_len=50, key="fingerprint")
    assert got == _brute_spans(docs, 50)
    assert {g[0] for g in got} == {3, 17, 20}


def test_fingerprint_exchange_key_is_two_bigints(spark):
    """The production mode's range exchange must carry the 128-bit
    structural fingerprint as two BIGINT xxhash64 words, NOT the
    token array: the pinned scan input's plan shows
    rangepartitioning on (skey_hi, skey_lo) with the hash projection
    BEFORE the exchange, so the exchange input is 16 B/row."""
    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], ["doc_id", "text"]
    )
    out = duplicate_substring_spans(docs, min_len=3, key="fingerprint")
    out.count()
    pins = getattr(out, "_pinned_intermediates", [])
    assert len(pins) == 1
    scanned = pins[0]
    dt = dict(scanned.dtypes)
    assert dt["skey_hi"] == "bigint" and dt["skey_lo"] == "bigint"
    plan = scanned._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(skey_hi" in plan
    assert "xxhash64" in plan
    for p in pins:
        p.unpersist()


def test_fingerprint_lo_word_is_salt_first(spark):
    """The lo fingerprint word must hash the salt FIRST. Spark
    fold-chains multi-column xxhash64 (each column's hash seeds the
    next), so the reversed order xxhash64(gram, lit(1)) is
    XXH64(1, seed=hi) — a deterministic function of the hi word,
    collapsing the '128-bit' key to 64 bits of entropy and making
    every hi-collision a full key collision at corpus scale. Pins
    that the shipped lo equals the salt-first form and NOT the
    fold-chained one."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [([1, 2, 3],), ([4, 5, 6],), (["a", "b"],)][:2], ["g"]
    )
    probe = df.select(
        F.xxhash64("g").alias("hi"),
        F.xxhash64(F.lit(1), F.col("g")).alias("salt_first"),
        F.xxhash64(F.col("g"), F.lit(1)).alias("fold_chained"),
    ).collect()
    for r in probe:
        assert r.salt_first != r.fold_chained

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b c d f")], ["doc_id", "text"]
    )
    out = duplicate_substring_spans(docs, min_len=3, key="fingerprint")
    out.count()
    pins = getattr(out, "_pinned_intermediates", [])
    scanned = pins[0]
    plan = scanned._jdf.queryExecution().analyzed().toString()
    # salt-first: the literal 1 precedes the slice() inside the lo
    # word's xxhash64 argument list
    import re

    m = re.search(r"xxhash64\(1,\s*slice", plan)
    assert m is not None, plan
    assert not re.search(r"xxhash64\(slice\([^)]*\)[^,]*,\s*1\)", plan)
    for p in pins:
        p.unpersist()


def test_invalid_key_raises(spark):
    df = spark.range(1).selectExpr("id AS doc_id", "'a b c' AS text")
    with pytest.raises(ValueError, match="key"):
        duplicate_substring_spans(df, min_len=2, key="xxh")


def test_fingerprint_hot_gram_splits_across_partitions(spark):
    """The boilerplate case at web scale: ONE gram duplicated across
    a large share of the corpus. The range exchange keys include the
    (doc_id, pos) tie-break, so the hot equal-key run SPLITS across
    partitions (a hash-partitioned design would pin it to one — the
    rejected alternative) and the seam window stitches the boundary
    pairs back exactly. Assert correctness vs brute force AND that
    the hot run really did land on >1 partition (its fingerprint
    appears in more than one partition's first/last seam rows)."""
    hot = "x y z"  # the duplicated 3-gram
    docs = [(d, f"a{d} {hot} b{d}") for d in range(400)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = duplicate_substring_spans(
        df, min_len=3, key="fingerprint", num_partitions=8
    )
    got = {
        (r.doc_id, r.span_start, r.span_end, r.span_len)
        for r in out.collect()
    }
    assert got == _brute_spans(docs, 3)
    assert got == {(d, 2, 4, 3) for d in range(400)}
    pins = getattr(out, "_pinned_intermediates", [])
    scanned = pins[0]
    seam_rows = scanned.where("kind != 'm'").collect()
    # every doc carries the hot gram, so with 8 range partitions over
    # a single dominant key the run must straddle partitions: the
    # modal (skey_hi, skey_lo) appears in multiple partitions' seams
    from collections import Counter

    per_pid = {}
    for r in seam_rows:
        per_pid.setdefault((r.skey_hi, r.skey_lo), set()).add(r._pid)
    assert max(len(pids) for pids in per_pid.values()) > 1
    for p in pins:
        p.unpersist()


def test_fixture_documents_mode_equality(spark, sf_dir):
    """Cross-mode equality on the REAL fixture corpus (not synthetic
    plants): the production fingerprint exchange and the exact
    token-array verifier must emit the identical span set."""
    from cc2dataset_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    sets = []
    for key in ("tokens", "fingerprint"):
        out = duplicate_substring_spans(docs, min_len=15, key=key)
        sets.append(
            {
                (r.doc_id, r.span_start, r.span_end, r.span_len)
                for r in out.collect()
            }
        )
        for p in out._pinned_intermediates:
            p.unpersist()
    assert sets[0] == sets[1] and len(sets[0]) > 0
