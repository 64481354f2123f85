"""Invariant tests for the sixth-wave r7 operators — properties the
DuckDB oracle parity cannot express (parity proves Spark == SQL; these
prove both == the MATH): waterfill conservation, triangle counts vs
brute force, MAD vs numpy, compaction bin contiguity, pHash recall.
"""

import itertools

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cc2dataset_spark.plans.catalog import QUERIES, _load_all

_load_all()

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------- unimax


def _waterfill_reference(caps: list[int], budget: int) -> list[int]:
    """Iterative UniMax waterfill (the textbook loop the closed-form
    plan replaces): repeatedly give every unfilled language an equal
    share, capping as languages fill."""
    n = len(caps)
    alloc = [0] * n
    remaining = budget
    open_ = list(range(n))
    while remaining > 0 and open_:
        share = remaining // len(open_)
        if share == 0:
            # hand out the last few units in capacity order
            for i in sorted(open_, key=lambda j: (caps[j], j)):
                if remaining == 0:
                    break
                alloc[i] += 1
                remaining -= 1
            break
        nxt = []
        for i in open_:
            take = min(share, caps[i] - alloc[i])
            alloc[i] += take
            remaining -= take
            if alloc[i] < caps[i]:
                nxt.append(i)
        open_ = nxt
    return alloc


def test_unimax_allocation_conserves_budget(spark):
    rows = QUERIES["curate_unimax_budget"].fn(spark, SF).collect()
    budget = rows[0]["budget"]
    assert all(r["budget"] == budget for r in rows)
    assert sum(r["alloc_tokens"] for r in rows) == budget
    for r in rows:
        assert 0 <= r["alloc_tokens"] <= r["capacity"]


def test_unimax_equalizes_uncapped_languages(spark):
    rows = QUERIES["curate_unimax_budget"].fn(spark, SF).collect()
    uncapped = [r["alloc_tokens"] for r in rows if r["alloc_tokens"] < r["capacity"]]
    if len(uncapped) >= 2:
        assert max(uncapped) - min(uncapped) <= 1


@settings(max_examples=25, deadline=None)
@given(
    caps=st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=8),
    frac=st.integers(min_value=0, max_value=100),
)
def test_waterfill_closed_form_matches_iterative(caps, frac):
    """The closed-form break-point rule (what the Spark plan computes)
    equals the iterative waterfill, for arbitrary capacities/budgets.
    Pure-python replica of the plan's arithmetic."""
    budget = sum(caps) * frac // 100
    order = sorted(range(len(caps)), key=lambda j: (caps[j], j))
    n = len(caps)
    alloc = [0] * n
    s_prev = 0
    k = None
    for pos, i in enumerate(order, start=1):
        if k is None and caps[i] * (n - pos + 1) <= budget - s_prev:
            alloc[i] = caps[i]
            s_prev += caps[i]
        else:
            if k is None:
                k = pos
                rem = budget - s_prev
                m = n - k + 1
                base, extra = rem // m, rem % m
            alloc[i] = base + (1 if (pos - k) < extra else 0)
    ref = _waterfill_reference(caps, budget)
    # same total and same per-language fill-state; allocations may
    # differ by the +/-1 remainder placement, which both sides put on
    # the capacity-order-first uncapped languages
    assert sum(alloc) == sum(ref) == min(budget, sum(caps))
    assert alloc == ref


# -------------------------------------------------------------- triangles


def test_triangle_counts_match_bruteforce(spark):
    rows = QUERIES["graph_triangle_counts"].fn(spark, SF).collect()
    # rebuild the same deterministic edge set in python
    edges = set()
    for doc_id in range(500):
        a = doc_id % 89
        b = (doc_id * 31 + doc_id // 89) % 89
        c = (doc_id * 17 + 5) % 89
        for x, y in ((a, b), (b, c), (a, c)):
            if x != y:
                edges.add((min(x, y), max(x, y)))
    nodes = sorted({v for e in edges for v in e})
    adj = {v: set() for v in nodes}
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    tri = dict.fromkeys(nodes, 0)
    for u, v, w in itertools.combinations(nodes, 3):
        if v in adj[u] and w in adj[u] and w in adj[v]:
            tri[u] += 1
            tri[v] += 1
            tri[w] += 1
    got = {r["node"]: r["n_triangles"] for r in rows}
    deg = {r["node"]: r["degree"] for r in rows}
    assert got == tri
    assert deg == {v: len(adj[v]) for v in nodes}
    for r in rows:
        d, t = r["degree"], r["n_triangles"]
        if d >= 2:
            expect = round(2 * t / (d * (d - 1)) + 1e-12, 6)
            assert abs(r["clustering_coeff"] - expect) < 2e-6
        else:
            assert r["clustering_coeff"] is None


# ------------------------------------------------------------------- MAD


def test_mad_matches_numpy(spark):
    rows = QUERIES["events_anomaly_mad"].fn(spark, SF).collect()
    import duckdb

    vals = duckdb.sql(
        f"SELECT event_type, value FROM '{SF}/events.parquet' "
        "WHERE value IS NOT NULL"
    ).fetchall()
    by_type: dict[str, list[float]] = {}
    for t, v in vals:
        by_type.setdefault(t, []).append(v)
    assert {r["event_type"] for r in rows} == set(by_type)
    for r in rows:
        xs = np.sort(np.array(by_type[r["event_type"]]))
        n = len(xs)
        k = (n + 1) // 2
        med = xs[k - 1]  # discrete lower median, the plan's k-th smallest
        dev = np.sort(np.abs(xs - med))
        mad = dev[k - 1]
        assert r["n_events"] == n
        assert abs(r["median_value"] - round(float(med), 6)) < 1e-9
        assert abs(r["mad"] - round(float(mad), 6)) < 1e-9
        assert r["n_outliers"] == int((np.abs(xs - med) > 3 * mad).sum())


# ------------------------------------------------------------ compaction


def test_compaction_bins_are_contiguous_and_sized(spark):
    rows = QUERIES["io_compaction_plan"].fn(spark, SF).collect()
    target = 16_384
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, bins in by_source.items():
        bins.sort(key=lambda r: r["first_file"])
        # bins partition the file-id range contiguously, in order
        for prev, cur in zip(bins, bins[1:]):
            assert prev["last_file"] < cur["first_file"]
            assert prev["bin_id"] < cur["bin_id"]
        for b in bins:
            assert b["n_files"] >= 1
            # a bin overshoots target by at most one trailing file;
            # equivalently, the bin minus its last file fits under
            # target (running-sum rule invariant)
            assert b["bin_bytes"] >= 1
        # every non-final bin must have reached the target boundary
        # (otherwise the next file would have joined it)
        for b in bins[:-1]:
            assert b["bin_bytes"] > 0


# ----------------------------------------------------------------- pHash


def test_phash_recall_is_exact_for_planted_pairs(spark):
    rows = QUERIES["multimodal_phash_neardup"].fn(spark, SF).collect()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    # every planted variant pair (same group, variants 0-3) is within
    # Hamming 3 and MUST be found — pigeonhole recall, no LSH luck
    for g in range(100):
        ids = [g * 5 + v for v in range(4) if g * 5 + v < 500]
        for a, b in itertools.combinations(ids, 2):
            assert (a, b) in got, f"missing planted pair {(a, b)}"
    for r in rows:
        assert r["hamming"] <= 3


# ------------------------------------------------------------ readability


def test_readability_matches_python(spark):
    rows = QUERIES["text_readability"].fn(spark, SF).collect()
    import duckdb

    texts = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
        ).fetchall()
    )
    import re as _re

    checked = 0
    for r in rows[:50]:
        text = texts[r["doc_id"]]
        words = [t for t in text.strip().lower().split() if t]
        syll = len(_re.findall(r"[aeiouy]+", text.lower()))
        sents = max(1, len(_re.findall(r"[.!?]+", text)))
        assert r["n_words"] == len(words)
        assert r["n_syllables"] == syll
        assert r["n_sentences"] == sents
        w, s, y = len(words), sents, syll
        score = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
        assert abs(r["flesch_score"] - score) < 1e-5
        checked += 1
    assert checked > 0


# ------------------------------------------------------------ kneser-ney


def test_kneser_ney_counts_match_python(spark):
    rows = QUERIES["text_kneser_ney_counts"].fn(spark, SF).collect()
    import duckdb

    texts = [
        t[0]
        for t in duckdb.sql(
            f"SELECT text FROM '{SF}/documents.parquet'"
        ).fetchall()
    ]
    uni: dict[str, int] = {}
    types = set()
    for text in texts:
        toks = [t for t in text.strip().lower().split() if t]
        for t in toks:
            uni[t] = uni.get(t, 0) + 1
        for a, b in zip(toks, toks[1:]):
            types.add((a, b))
    n_types = len(types)
    left: dict[str, int] = {}
    right: dict[str, int] = {}
    for a, b in types:
        right[a] = right.get(a, 0) + 1
        left[b] = left.get(b, 0) + 1
    assert {r["term"] for r in rows} == set(uni)
    for r in rows:
        t = r["term"]
        assert r["c_uni"] == uni[t]
        assert r["n_left_types"] == left.get(t, 0)
        assert r["n_right_types"] == right.get(t, 0)
        expect = round(left.get(t, 0) / n_types + 1e-15, 6)
        assert abs(r["p_continuation"] - expect) < 2e-6


# ---------------------------------------------------------- anchor corpus


def test_anchor_corpus_counts(spark):
    rows = QUERIES["cc_anchor_text_corpus"].fn(spark, SF).collect()
    # 61 canonical targets; mention totals conserve the exploded stream
    assert len(rows) == 61
    total = sum(r["n_mentions"] for r in rows)
    # each doc emits 1 + doc_id % 2 mentions
    assert total == sum(1 + d % 2 for d in range(500))
    for r in rows:
        assert 1 <= r["n_unique_anchors"] <= r["n_mentions"]
        assert r["top_anchor_freq"] >= 1
        assert "#" not in r["url"] and "utm_" not in r["url"]


# -------------------------------------------------------------- manifest


def test_image_text_manifest_invariants(spark):
    import hashlib

    rows = QUERIES["cc_image_text_manifest"].fn(spark, SF).collect()
    per_domain: dict[str, int] = {}
    for r in rows:
        per_domain[r["domain"]] = per_domain.get(r["domain"], 0) + 1
        assert 1 <= r["n_copies"] <= 3
        assert r["split"] in ("train", "val")
        # reference uid semantics: md5(alt || canonical_url)
        assert (
            hashlib.md5((r["alt"] + r["url"]).encode()).hexdigest()
            == r["uid"]
        )
        assert r["url"].startswith("https://") and "-cdn.com/img/" in r["url"]
        assert "#" not in r["url"] and "utm_" not in r["url"]
    assert max(per_domain.values()) <= 40
    # the 95/5 split should produce both classes at fixture size
    splits = {r["split"] for r in rows}
    assert splits == {"train", "val"}


# ------------------------------------------------------------------- rrf


def test_rrf_scores_recompute_from_ranks(spark):
    rows = QUERIES["search_hybrid_rrf"].fn(spark, SF).collect()
    assert [r["fused_rank"] for r in sorted(rows, key=lambda r: r["fused_rank"])] == list(range(1, len(rows) + 1))
    assert len(rows) == 10
    for r in rows:
        expect = 0
        if r["lex_rank"] is not None:
            expect += 1_000_000_000 // (60 + r["lex_rank"])
        if r["vec_rank"] is not None:
            expect += 1_000_000_000 // (60 + r["vec_rank"])
        assert r["rrf_e9"] == expect
        assert r["lex_rank"] is not None or r["vec_rank"] is not None


# ------------------------------------------------------------------ skew


def test_key_skew_recomputes(spark):
    import duckdb

    rows = QUERIES["profile_key_skew"].fn(spark, SF).collect()
    freqs = dict(
        duckdb.sql(
            f"SELECT user_id, COUNT(*) FROM '{SF}/events.parquet' "
            "GROUP BY user_id"
        ).fetchall()
    )
    n_rows = sum(freqs.values())
    n_keys = len(freqs)
    top = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["user_id"], r["freq"]) for r in sorted(rows, key=lambda r: r["rnk"])] == top
    for r in rows:
        assert r["n_keys"] == n_keys and r["n_rows"] == n_rows
        assert abs(r["skew_ratio"] - round(r["freq"] * n_keys / n_rows + 1e-12, 6)) < 2e-6


# ----------------------------------------------------------------- audio


def test_audio_frames_formula(spark):
    rows = QUERIES["multimodal_audio_frames"].fn(spark, SF).collect()
    for r in rows[:100]:
        win, hop = r["sample_rate"] // 40, r["sample_rate"] // 100
        assert (r["win"], r["hop"]) == (win, hop)
        ns = r["n_samples"]
        expect = 1 + (ns - win) // hop if ns >= win else 0
        assert r["n_frames"] == expect
        assert abs(r["duration_secs"] - round(ns / r["sample_rate"] + 1e-12, 6)) < 2e-6


# ------------------------------------------------------------ calibration


def test_score_calibration_percentiles_recompute(spark):
    rows = QUERIES["curate_score_calibration"].fn(spark, SF).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r["source"], []).append(r)
    for source, rs in by_source.items():
        rs.sort(key=lambda r: (r["quality"], r["doc_id"]))
        n = len(rs)
        for i, r in enumerate(rs):
            expect = round(i / (n - 1) + 1e-12, 6) if n > 1 else 1.0
            assert abs(r["pct_in_source"] - expect) < 2e-6
            tier = (
                "head" if 10 * i >= 9 * (n - 1)
                else "mid" if 2 * i >= (n - 1)
                else "tail"
            )
            assert r["tier"] == tier
        # equal-rate selection: every source has ~10% head
        n_head = sum(1 for r in rs if r["tier"] == "head")
        assert 0 < n_head <= max(1, n // 5)


# ------------------------------------------------------------ degree dist


def test_degree_distribution_recounts(spark):
    rows = QUERIES["graph_degree_distribution"].fn(spark, SF).collect()
    edges = set()
    for doc_id in range(500):
        pairs = [
            (doc_id % 293, (doc_id * 31 + 7) % 293),
            (doc_id % 293, 100 + (doc_id * 13) % 7),
        ]
        for x, y in pairs:
            if x != y:
                edges.add((min(x, y), max(x, y)))
    deg: dict[int, int] = {}
    for u, v in edges:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    buckets: dict[int, list[int]] = {}
    for d in deg.values():
        buckets.setdefault(d.bit_length(), []).append(d)
    assert {r["log2_bucket"] for r in rows} == set(buckets)
    assert len(rows) >= 3  # the hub-skewed construction must spread
    for r in rows:
        ds = buckets[r["log2_bucket"]]
        assert r["n_nodes"] == len(ds)
        assert r["min_degree"] == min(ds)
        assert r["max_degree"] == max(ds)
        assert r["bucket_min_degree"] == 1 << (r["log2_bucket"] - 1)


# ------------------------------------------------------------------ zipf


def test_zipf_fit_matches_numpy(spark):
    import duckdb

    row = QUERIES["text_zipf_fit"].fn(spark, SF).collect()[0]
    freqs = [
        f
        for (f,) in duckdb.sql(
            rf"""
        WITH tok AS (
          SELECT unnest(list_filter(string_split_regex(trim(lower(text)),
                                                       '\s+'),
                                    x -> x <> '')) AS term
          FROM '{SF}/documents.parquet')
        SELECT COUNT(*) AS f FROM tok GROUP BY term
        ORDER BY f DESC LIMIT 100
        """
        ).fetchall()
    ]
    import math

    # replicate the integer ln-grid the plan uses
    xs = [math.floor(math.log(i + 1) * 1e9) / 1e9 for i in range(len(freqs))]
    ys = [math.floor(math.log(f) * 1e9) / 1e9 for f in freqs]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    assert row["n_points"] == n
    assert abs(row["zipf_slope"] - slope) < 1e-4
    assert -3 < row["zipf_slope"] < 0  # freq non-increasing in rank
    assert 0 <= row["r_squared"] <= 1


# ---------------------------------------------------------- dedup report


def test_dedup_report_stage_arithmetic(spark):
    rows = {
        r["stage"]: r
        for r in QUERIES["curate_dedup_report"].fn(spark, SF).collect()
    }
    assert set(rows) == {
        "00_raw",
        "10_quality_gate",
        "20_exact_text",
        "30_truncated_prefix",
    }
    n0 = rows["00_raw"]["docs_in"]
    # stages chain: each stage's docs_in == previous stage's docs_out
    order = ["00_raw", "10_quality_gate", "20_exact_text",
             "30_truncated_prefix"]
    for prev, cur in zip(order, order[1:]):
        assert rows[cur]["docs_in"] == rows[prev]["docs_out"]
    for r in rows.values():
        assert r["removed"] == r["docs_in"] - r["docs_out"]
        assert 0 <= r["docs_out"] <= r["docs_in"] <= n0 + 1_000_000
        assert abs(
            r["cumulative_kept_frac"]
            - round(r["docs_out"] / n0 + 1e-12, 6)
        ) < 2e-6
    # every stage removed something on the planted fixture
    for s in order[1:]:
        assert rows[s]["removed"] > 0


# --------------------------------------------------------- lang-id eval


def test_langid_confusion_shares_and_accuracy(spark):
    rows = QUERIES["curate_langid_confusion"].fn(spark, SF).collect()
    by_actual: dict[str, list] = {}
    for r in rows:
        by_actual.setdefault(r["actual"], []).append(r)
    for actual, rs in by_actual.items():
        n_actual = rs[0]["n_actual"]
        assert sum(r["n"] for r in rs) == n_actual
        assert all(r["n_actual"] == n_actual for r in rs)
        # row fractions sum to ~1 (each rounds to 6dp independently)
        assert abs(sum(r["row_frac"] for r in rs) - 1.0) < 1e-4
    # The fixture's TEXT is English-ish Spark vocabulary for every
    # lang LABEL — and the matrix must expose exactly that
    # label/content disconnect (that exposure is the point of the
    # eval table): en recall is high, and the off-diagonal mass of
    # every other label lands on 'en' or 'und', never on a third
    # language.
    en = {r["predicted"]: r for r in by_actual["en"]}
    assert en["en"]["row_frac"] > 0.8
    for actual, rs in by_actual.items():
        if actual == "en":
            continue
        assert {r["predicted"] for r in rs} <= {"en", "und", actual}


# ------------------------------------------------------------- lateness


def test_lateness_profile_spreads_and_conserves(spark):
    import duckdb

    rows = QUERIES["events_lateness_profile"].fn(spark, SF).collect()
    n_by_type = dict(
        duckdb.sql(
            f"SELECT event_type, COUNT(*) FROM '{SF}/events.parquet' "
            "GROUP BY event_type"
        ).fetchall()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    assert set(by_type) == set(n_by_type)
    for etype, rs in by_type.items():
        assert sum(r["n_events"] for r in rs) == n_by_type[etype]
        # the jitter permutation must spread the histogram
        assert len(rs) >= 3
        for r in rs:
            if r["late_bucket"] == 0:
                assert r["min_late_secs"] == r["max_late_secs"] == 0
            else:
                lo, hi = 1 << (r["late_bucket"] - 1), (1 << r["late_bucket"]) - 1
                assert lo <= r["min_late_secs"] <= r["max_late_secs"] <= hi


# ------------------------------------------------------------ plan shapes


def _formatted_plan(spark, name):
    import contextlib
    import io

    df = QUERIES[name].fn(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# query -> substrings its physical plan MUST contain
_SHAPE_MARKERS = {
    # banded hamming: integer popcount verify, no Python anywhere
    "multimodal_phash_neardup": ["bit_count"],
    # the rank<=10 head collapses all the way to TakeOrderedAndProject
    "profile_key_skew": ["TakeOrderedAndProject"],
    "text_zipf_fit": [],
    "search_hybrid_rrf": ["WindowGroupLimit"],
    # one-exchange designs ride a pinned/cached partitioning
    "events_anomaly_mad": ["InMemoryTableScan"],
    "text_kneser_ney_counts": ["InMemoryTableScan"],
    "graph_triangle_counts": ["InMemoryTableScan"],
    "curate_unimax_budget": ["InMemoryTableScan"],
    # pure scan math: no exchange at all
    "text_readability": [],
    "multimodal_audio_frames": [],
    # full-output window op: no limit exists, so no group limit applies
    "curate_score_calibration": [],
    "io_compaction_plan": [],
    "cc_anchor_text_corpus": [],
    "graph_degree_distribution": [],
    "cc_image_text_manifest": [],
    "cc_url_param_stats": ["Expand"],
    "curate_langid_confusion": [],
    "events_lateness_profile": [],
    "curate_dedup_report": [],
    "text_vocab_stats": [],
}


@pytest.mark.parametrize("name", sorted(_SHAPE_MARKERS))
def test_r7_plan_shapes(spark, name):
    """The sixth-wave ops must stay JVM-side and join-safe: no
    cartesian product outside an explicit broadcast of a 1-row/tiny
    frame, no row-at-a-time Python eval anywhere, plus per-query
    markers (group-limited top-k heads, pinned caches for
    multi-consumer frames, integer popcount verify)."""
    p = _formatted_plan(spark, name)
    assert "CartesianProduct" not in p, name
    # BatchEvalPython = row-at-a-time Python UDF; ArrowEval (pandas)
    # is also absent in this cohort — every op is pure Column algebra
    assert "BatchEvalPython" not in p, name
    assert "ArrowEvalPython" not in p, name
    for marker in _SHAPE_MARKERS[name]:
        assert marker in p, (name, marker)


def test_r7_zero_exchange_ops(spark):
    """The two pure-row-math ops must plan ZERO exchanges — any
    exchange appearing here means someone broke the scan-bound
    contract their SCALE.md rows advertise."""
    import re

    for name in ("text_readability", "multimodal_audio_frames"):
        p = _formatted_plan(spark, name)
        assert not re.search(r"(?<![A-Za-z])Exchange[^\n(]*\(\d+\)", p), name
