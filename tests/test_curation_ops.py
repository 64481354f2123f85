"""Crafted-input unit tests for the late-r5 curation operators
(plans/curation.py) — edge cases the fixture oracle run can't isolate:
rank determinism under idf rounding, integer-exact repetition
thresholds, and the hash-gate invariants of language-mix rebalancing.
"""

import pytest
from pyspark.sql import functions as F

from cc2dataset_spark.functions.hashes import md5_mod
from cc2dataset_spark.plans.curation import (
    _MIX_MOD,
    _MIX_WEIGHTS,
    curate_mix_languages,
    curate_repetition_flags,
    text_tfidf_topterms,
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    )


def _with_docs(monkeypatch, df):
    """Route plans.curation's load_table at our crafted frame."""
    import cc2dataset_spark.plans.curation as cur

    monkeypatch.setattr(cur, "load_table", lambda spark, sf_dir, name: df)


def test_tfidf_rare_term_outranks_ubiquitous(spark, monkeypatch):
    rows = [
        (1, "alpha alpha alpha common", "en", "s", 0),
        (2, "common beta", "en", "s", 0),
        (3, "common gamma", "en", "s", 0),
        (4, "common delta", "en", "s", 0),
    ]
    _with_docs(monkeypatch, _docs(spark, rows))
    out = text_tfidf_topterms(spark, "unused")
    top = {r.doc_id: r.term for r in out.where("rnk = 1").collect()}
    # 'common' appears in every doc -> idf floor; each doc's distinctive
    # term must win rank 1
    assert top == {1: "alpha", 2: "beta", 3: "gamma", 4: "delta"}
    # exactly min(3, n_distinct_terms) rows per doc
    counts = {r.doc_id: r.n for r in out.groupBy("doc_id").agg(
        F.count("*").alias("n")).collect()}
    assert counts == {1: 2, 2: 2, 3: 2, 4: 2}


def test_repetition_flags_exact_boundaries(spark, monkeypatch):
    rows = [
        (1, "x x x x x x x x x y", "en", "s", 0),  # top_share 0.9 -> flagged
        (2, "a b c d e f g h i j", "en", "s", 0),  # all unique -> clean
        (3, "", "en", "s", 0),  # no tokens -> dropped (no explode rows)
    ]
    _with_docs(monkeypatch, _docs(spark, rows))
    got = {r.doc_id: r for r in curate_repetition_flags(spark, "unused").collect()}
    assert set(got) == {1, 2}
    assert got[1].flagged and got[1].top_share == 0.9 and got[1].dup_frac == 0.8
    assert not got[2].flagged and got[2].dup_frac == 0.0
    assert got[2].top_share == pytest.approx(0.1)
    # 0.1 is NOT > 0.1: the all-unique 10-token doc sits exactly on the
    # boundary and must stay clean


@pytest.mark.slow
def test_mix_languages_rates_and_caps(spark, monkeypatch):
    # 8 en docs vs target weight 0.30 of 10 -> rate 3/8; 2 zh docs vs
    # 0.30 of 10 -> rate capped at 1.0 (all kept)
    rows = [(i, "t", "en", "s", 0) for i in range(8)] + [
        (100, "t", "zh", "s", 0),
        (101, "t", "zh", "s", 0),
    ]
    _with_docs(monkeypatch, _docs(spark, rows))
    got = {r.lang: r for r in curate_mix_languages(spark, "unused").collect()}
    assert got["zh"].sample_rate == 1.0 and got["zh"].n_sampled == 2
    expected_rate = int(min(1.0, _MIX_WEIGHTS["en"] * 10 / 8) * _MIX_MOD) / _MIX_MOD
    assert got["en"].sample_rate == expected_rate
    # the gate is a per-doc md5 threshold: replay it manually
    thresh = int(min(1.0, _MIX_WEIGHTS["en"] * 10 / 8) * _MIX_MOD)
    manual = (
        _docs(spark, rows)
        .where(F.col("lang") == "en")
        .where(
            md5_mod(F.concat(F.lit("mix:"), F.col("doc_id").cast("string")), _MIX_MOD)
            < F.lit(thresh)
        )
        .count()
    )
    assert got["en"].n_sampled == manual


@pytest.mark.slow
def test_mix_languages_is_rerun_deterministic(spark, monkeypatch):
    rows = [(i, "t", "en", "s", 0) for i in range(50)]
    _with_docs(monkeypatch, _docs(spark, rows))
    a = sorted(map(tuple, curate_mix_languages(spark, "unused").collect()))
    b = sorted(map(tuple, curate_mix_languages(spark, "unused").collect()))
    assert a == b


def test_funnel_ordering_is_strict(spark, monkeypatch):
    """A user who purchased BEFORE clicking (or clicked before viewing)
    must not count as converted — the funnel is strictly ordered."""
    import cc2dataset_spark.plans.events_analytics as EA

    rows = [
        # user 1: proper order view < click < purchase
        (1, "2024-01-01 10:00:00", 1, "view", 0.0, "{}"),
        (2, "2024-01-01 10:01:00", 1, "click", 0.0, "{}"),
        (3, "2024-01-01 10:02:00", 1, "purchase", 0.0, "{}"),
        # user 2: purchase precedes click -> stops at view+click
        (4, "2024-01-01 10:00:00", 2, "view", 0.0, "{}"),
        (5, "2024-01-01 10:00:30", 2, "purchase", 0.0, "{}"),
        (6, "2024-01-01 10:01:00", 2, "click", 0.0, "{}"),
        # user 3: click before any view -> stops at view
        (7, "2024-01-01 10:01:00", 3, "click", 0.0, "{}"),
        (8, "2024-01-01 10:02:00", 3, "view", 0.0, "{}"),
        # user 4: never viewed -> not in the funnel at all
        (9, "2024-01-01 10:00:00", 4, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    monkeypatch.setattr(EA, "load_table", lambda spark, sf_dir, name: df)
    got = EA.events_funnel_conversion(spark, "unused").collect()[0]
    assert (got.n_view, got.n_view_click, got.n_full_funnel) == (3, 2, 1)


def test_retention_cohort_offsets(spark, monkeypatch):
    """A user first active in week 0 and again two weeks later yields
    offsets 0 and 2 for their cohort; a week-1 joiner starts a new
    cohort at offset 0."""
    import cc2dataset_spark.plans.events_analytics as EA

    rows = [
        # 2024-01-01 is a Monday
        (1, "2024-01-02 10:00:00", 1, "view", 0.0, "{}"),   # cohort wk0
        (2, "2024-01-16 10:00:00", 1, "view", 0.0, "{}"),   # wk2 -> offset 2
        (3, "2024-01-10 10:00:00", 2, "view", 0.0, "{}"),   # cohort wk1
    ]
    df = spark.createDataFrame(
        rows, "event_id bigint, ts string, user_id bigint, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    monkeypatch.setattr(EA, "load_table", lambda spark, sf_dir, name: df)
    got = {
        (str(r.cohort_week), r.week_offset): r.n_active
        for r in EA.events_retention_cohorts(spark, "unused").collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-08", 0): 1,
    }


def test_gopher_rules_fire_on_dirty_synthetic_docs(spark):
    """The alpha/symbol rules pass everywhere on the clean fixture, so
    prove them on constructed failures: a hashtag-spam doc, a
    numeric-soup doc, and a clean doc that passes every gate."""
    from cc2dataset_spark.plans.curation import curate_gopher_rules

    filler = " ".join(
        f"the quick brown word{i} and some more of that text in it"
        for i in range(4)
    )
    rows = [
        (1, filler),  # clean: >=30 words, stopwords, all-alpha
        (2, " ".join("#tag#" + str(i) for i in range(40)) + " the a of"),
        (3, " ".join(str(i * 13) for i in range(40)) + " the a of and"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    import cc2dataset_spark.plans.curation as C
    import cc2dataset_spark.sources.tables as tables

    # drive the query body directly on the tiny frame via its seam
    orig = tables.load_table
    try:
        tables.load_table = lambda spark, sf, name: df
        C.load_table = tables.load_table
        out = {r.doc_id: r for r in curate_gopher_rules(spark, "x").collect()}
    finally:
        tables.load_table = orig
        C.load_table = orig
    assert out[1].keep
    assert not out[2].symbol_ok  # '#' density over 0.1/word
    assert not out[3].alpha_ok  # digit soup
    assert not out[2].keep and not out[3].keep


def test_boilerplate_prefix_recovers_planted_banner(spark, sf_dir):
    from cc2dataset_spark.plans.catalog import QUERIES, _load_all

    _load_all()
    rows = QUERIES["curate_boilerplate_prefix"].fn(spark, sf_dir).collect()
    assert rows
    for r in rows:
        banner = f"[{r.source}] "
        assert r.lcp_len >= len(banner), (r.source, r.lcp_len)
        assert r.shared_prefix.startswith(banner)


def test_paragraph_dedup_first_occurrence_and_roundtrip(spark, monkeypatch):
    """curate_dedup_paragraphs: (a) a paragraph block shared by two
    docs survives only at its corpus-first (doc_id, pos); (b) a doc
    with no duplicated blocks round-trips to its exact token join;
    (c) a doc that IS entirely a copy of an earlier doc's blocks
    reassembles to the empty string (its every paragraph is a repeat)."""
    from cc2dataset_spark.plans.curation import (
        _PARA_TOKENS,
        curate_dedup_paragraphs,
    )

    blk_a = " ".join(f"a{i}" for i in range(_PARA_TOKENS))
    blk_b = " ".join(f"b{i}" for i in range(_PARA_TOKENS))
    blk_c = " ".join(f"c{i}" for i in range(_PARA_TOKENS))
    docs = _docs(
        spark,
        [
            (1, f"{blk_a} {blk_b}", "en", "s0", 0),
            (2, f"{blk_c} {blk_a}", "en", "s0", 0),  # blk_a repeats
            (3, blk_a, "en", "s0", 0),  # whole doc is a repeat
        ],
    )
    _with_docs(monkeypatch, docs)
    out = {
        r.doc_id: r
        for r in curate_dedup_paragraphs(spark, "unused").collect()
    }
    assert out[1].text_deduped == f"{blk_a} {blk_b}"  # first wins
    assert (out[1].n_paras, out[1].n_kept) == (2, 2)
    assert out[2].text_deduped == blk_c  # repeat stripped, order kept
    assert (out[2].n_paras, out[2].n_kept) == (2, 1)
    assert out[3].text_deduped == ""  # fully-duplicate doc empties
    assert (out[3].n_paras, out[3].n_kept) == (1, 0)


def test_paragraph_dedup_partial_trailing_block(spark, monkeypatch):
    """A trailing block shorter than _PARA_TOKENS is its own
    paragraph and dedups independently of the full-width blocks."""
    from cc2dataset_spark.plans.curation import (
        _PARA_TOKENS,
        curate_dedup_paragraphs,
    )

    blk = " ".join(f"w{i}" for i in range(_PARA_TOKENS))
    docs = _docs(
        spark,
        [
            (1, f"{blk} tail", "en", "s0", 0),
            (2, "tail", "en", "s0", 0),  # equals doc 1's short block
        ],
    )
    _with_docs(monkeypatch, docs)
    out = {
        r.doc_id: r
        for r in curate_dedup_paragraphs(spark, "unused").collect()
    }
    assert out[1].text_deduped == f"{blk} tail"
    assert out[2].text_deduped == "" and out[2].n_kept == 0


def test_dedup_paragraphs_newline_corpus(spark):
    """The reusable operator (operators/dedup.dedup_paragraphs) on a
    REAL newline-structured corpus: paragraphs = split(text, '\\n\\n'),
    reassembled with '\\n\\n' — the production configuration the
    fixture-adapted catalog query can't exercise."""
    from pyspark.sql import functions as F

    from cc2dataset_spark.operators.dedup import dedup_paragraphs

    footer = "subscribe to our newsletter"
    docs = spark.createDataFrame(
        [
            (1, f"unique first article\n\n{footer}"),
            (2, f"another piece entirely\n\n{footer}"),
            (3, footer),
            (4, ""),  # empty doc: zero paragraphs -> dropped
        ],
        ["doc_id", "text"],
    )
    out = {
        r.doc_id: r
        for r in dedup_paragraphs(
            docs, F.split("text", r"\n\n"), sep="\n\n"
        ).collect()
    }
    assert out[1].text_deduped == f"unique first article\n\n{footer}"
    assert out[2].text_deduped == "another piece entirely"
    assert (out[2].n_paras, out[2].n_kept) == (2, 1)
    assert out[3].text_deduped == ""  # footer-only page fully stripped
    # split('') yields [''] — the operator discards empty-string
    # paragraphs, so the empty doc has zero paragraphs and drops
    assert 4 not in out
