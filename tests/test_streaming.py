"""True streaming tests: the same operators run as micro-batch streams
must converge to the batch answers (batch-equivalence — the only oracle
available for streaming, SURVEY.md Stage 4)."""

import pytest
from pyspark.sql import functions as F

from cc2dataset_spark.sources.tables import load_table
from cc2dataset_spark.streaming import (
    followup_events,
    read_events_stream,
    session_stats,
    streaming_dedup,
    tumbling_counts,
)


def _run_to_memory(stream_df, name, mode):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    batch = {tuple(r) for r in tumbling_counts(events).collect()}
    stream = tumbling_counts(
        read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    )
    _run_to_memory(stream, "t_tumbling", "complete")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_tumbling").collect()}
    assert got == batch


def test_streaming_session_equals_batch(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    batch = {tuple(r) for r in session_stats(events).collect()}
    stream = session_stats(
        read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    )
    _run_to_memory(stream, "t_session", "complete")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_session").collect()}
    assert got == batch


def test_streaming_dedup_within_watermark(spark, sf_dir):
    stream = streaming_dedup(
        read_events_stream(spark, sf_dir), keys=["user_id"], watermark="365 days"
    )
    _run_to_memory(stream.select("user_id"), "t_dedup", "append")
    got = spark.sql("SELECT COUNT(*) n, COUNT(DISTINCT user_id) d FROM t_dedup").first()
    want = load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    assert got.d == want
    assert got.n == want  # no key emitted twice


@pytest.mark.slow
def test_stream_stream_interval_join_equals_batch(spark, sf_dir):
    """Stream-stream inner join with watermarks + interval condition:
    the micro-batch run must converge to the batch join (both sides of
    the join are the same replayed event stream)."""
    events = load_table(spark, sf_dir, "events")
    batch = {tuple(r) for r in followup_events(events, events).collect()}
    s1 = read_events_stream(spark, sf_dir)
    s2 = read_events_stream(spark, sf_dir)
    stream = followup_events(s1, s2, watermark="365 days")
    assert stream.isStreaming
    _run_to_memory(stream, "t_followups", "append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_followups").collect()}
    assert got == batch


def test_streaming_dedup_batch_degradation(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    out = streaming_dedup(events, keys=["user_id"])
    assert not out.isStreaming
    assert out.count() == events.select("user_id").distinct().count()


def test_streaming_pii_scrub_equals_batch(spark, sf_dir):
    """Stateless curation ops are stream-reusable verbatim: the PII
    count/redact projection over a file-source document stream must
    produce exactly the batch answer (no watermark needed — no state)."""
    from cc2dataset_spark.functions.text import (
        EMAIL_RE,
        LONG_DIGITS_RE,
        pattern_count,
        pii_redact,
    )

    def scrub(df):
        return df.select(
            "doc_id",
            pattern_count("text", EMAIL_RE).alias("n_emails"),
            pattern_count("text", LONG_DIGITS_RE).alias("n_digit_runs"),
            F.md5(pii_redact("text")).alias("redacted_md5"),
        )

    docs = load_table(spark, sf_dir, "documents")
    batch = {tuple(r) for r in scrub(docs).collect()}

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    out = scrub(stream)
    assert out.isStreaming
    _run_to_memory(out, "t_pii", "append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_pii").collect()}
    assert got == batch


def test_streaming_mix_gate_equals_batch(spark, sf_dir):
    """Continuous curation: a static language-mix policy (per-lang
    hash thresholds computed once on the reference corpus) gates a
    document STREAM via a stream-static broadcast join + map-side md5
    comparison — the deterministic-sampling twin of the batch
    curate_mix_languages decision. The set of accepted doc_ids must be
    identical to applying the same gate in batch (no RNG, no state)."""
    from cc2dataset_spark.functions.hashes import md5_mod
    from cc2dataset_spark.plans.curation import _MIX_MOD, _MIX_WEIGHTS

    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy(F.col("lang").alias("r_lang")).agg(
        F.count("*").alias("n_docs")
    )
    n_total = docs.count()
    weight = F.create_map(
        *[x for k, v in sorted(_MIX_WEIGHTS.items()) for x in (F.lit(k), F.lit(v))]
    )[F.col("r_lang")]
    rates = counts.select(
        "r_lang",
        (
            F.least(F.lit(1.0), F.coalesce(weight, F.lit(0.0)) * n_total / F.col("n_docs"))
            * _MIX_MOD
        )
        .cast("bigint")
        .alias("thresh"),
    )

    def gate(df):
        return (
            df.join(F.broadcast(rates), df.lang == F.col("r_lang"))
            .where(
                md5_mod(
                    F.concat(F.lit("mix:"), F.col("doc_id").cast("string")), _MIX_MOD
                )
                < F.col("thresh")
            )
            .select("doc_id", "lang")
        )

    batch = {tuple(r) for r in gate(docs).collect()}

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
    )
    out = gate(stream)
    assert out.isStreaming
    _run_to_memory(out, "t_mixgate", "append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_mixgate").collect()}
    assert got == batch and len(got) > 0


def test_streaming_incremental_dedup_equals_batch(spark, sf_dir):
    """Continuous-ingestion dedup: the document STREAM anti-joined
    against the static historical fingerprint index must accept
    exactly the fingerprint set the batch dedup_incremental_index
    query accepts (survivor IDs may differ — streams keep first-seen,
    batch keeps min-id — so the comparison is on fingerprints, which
    both paths dedup identically)."""
    from cc2dataset_spark.functions.hashes import md5_mod
    from cc2dataset_spark.plans.catalog import queries
    from cc2dataset_spark.streaming import streaming_dedup_against_index

    batch_fps = {
        r.fingerprint
        for r in queries()["dedup_incremental_index"](spark, sf_dir).collect()
    }

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    b = md5_mod(F.concat(F.lit("ix:"), F.col("doc_id").cast("string")), 100)
    index_fps = (
        docs.where(b < 80).select(fp.alias("fingerprint")).distinct()
    )

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .where(b >= 80)
    )
    out = streaming_dedup_against_index(stream, index_fps, fp).select(
        "doc_id", "fingerprint"
    )
    assert out.isStreaming
    _run_to_memory(out, "t_incdedup", "append")
    got = {
        r.fingerprint for r in spark.sql("SELECT * FROM t_incdedup").collect()
    }
    assert got == batch_fps and len(got) > 0


def test_streaming_decontaminate_equals_batch(spark, sf_dir):
    """Continuous-ingestion decontamination: the benchmark shingle set
    is static and broadcast, so ngram_decontaminate composes with a
    document stream unchanged (stateless map + broadcast semi-probe +
    per-doc agg). The flagged (doc_id, n_hit_shingles) set must equal
    the batch curate_decontaminate result on the same injected
    overlap."""
    from cc2dataset_spark.operators.contamination import ngram_decontaminate
    from cc2dataset_spark.plans.catalog import queries
    from cc2dataset_spark.plans.llm_ops import _EVAL_SENTENCE

    batch = {
        tuple(r)
        for r in queries()["curate_decontaminate"](spark, sf_dir).collect()
    }

    words = F.split(F.lit(_EVAL_SENTENCE), " ")
    appendix = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.lit(" "),
            F.array_join(
                F.slice(
                    words, F.lit(1), (F.lit(8) + F.col("doc_id") % 5).cast("int")
                ),
                " ",
            ),
        ),
    ).otherwise(F.lit(""))
    benchmark = spark.range(1).select(F.lit(_EVAL_SENTENCE).alias("text"))

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select("doc_id", F.concat("text", appendix).alias("text"))
    )
    out = ngram_decontaminate(stream, benchmark, shingle_words=8)
    assert out.isStreaming
    _run_to_memory(out, "t_decont", "complete")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_decont").collect()}
    assert got == batch and len(got) > 0


def test_streaming_pq_scoring_equals_batch(spark, sf_dir):
    """Streaming vector search: the PQ index (codebook + corpus codes)
    is static state, so scoring a STREAM of query vectors against it
    is a stateless map + broadcast-shaped join — the continuous-serving
    shape of pq_topk minus the final rank (ranking windows are not
    streamable; a serving layer ranks per micro-batch or client-side).
    The streamed (query, neighbor, adc) scores must reproduce the
    batch top-3 exactly once ranked the same way."""
    from cc2dataset_spark.operators.similarity import (
        _pq_code_lookup_sum,
        _pq_query_tables,
        pq_codebook,
        pq_encode,
        pq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    cb = pq_codebook(emb)
    q_batch = emb.where(F.col("vec_id") < 5)
    batch = {tuple(r) for r in pq_topk(q_batch, emb, cb, k=3).collect()}

    codes = pq_encode(emb, cb)
    schema = spark.read.parquet(f"{sf_dir}/embeddings.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "embeddings.parquet")
        .parquet(sf_dir)
        .where(F.col("vec_id") < 5)
        .select(F.col("vec_id").alias("query_id"),
                F.col("embedding").cast("array<double>").alias("qv"))
    )
    qt = _pq_query_tables(stream, cb)
    scored = codes.join(qt, F.col("vec_id") != F.col("query_id")).select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        (F.col("_qc") + _pq_code_lookup_sum(len(cb))).alias("adc"),
    )
    assert scored.isStreaming
    _run_to_memory(scored, "t_pqstream", "append")
    rows = spark.sql("SELECT * FROM t_pqstream").collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r.query_id, []).append((r.adc, r.neighbor_id))
    got = set()
    for qid, cands in per_q.items():
        for rank, (adc, nid) in enumerate(sorted(cands)[:3], start=1):
            got.add((qid, nid, round(adc, 6), rank))
    assert got == batch and len(got) > 0


def test_sessionize_agrees_with_session_window(spark, sf_dir):
    """Two independent formulations of the same 30-minute-gap session
    concept must agree: the per-event lag-flag-cumsum query
    (events_sessionize) and Spark's session_window aggregate
    (streaming/windows.session_stats). Per (user, session): same
    first-event time, same event count, and session_window's end ==
    sessionize's last event + gap (the session_window contract).
    Boundary note: an event at EXACTLY prev + 30min merges in
    sessionize (>) but splits in session_window (<) — distinct at
    microsecond equality only, which the fixture cannot hit."""
    from cc2dataset_spark.plans.catalog import queries
    from cc2dataset_spark.streaming.windows import session_stats
    from datetime import timedelta

    a = {
        (r.user_id, r.t_start, r.n_events, r.t_end + timedelta(minutes=30))
        for r in queries()["events_sessionize"](spark, sf_dir).collect()
    }
    b = {
        (r.user_id, r.session_start, r.n_events, r.session_end)
        for r in session_stats(
            load_table(spark, sf_dir, "events"), gap="30 minutes"
        ).collect()
    }
    assert a == b and len(a) > 0


def test_streaming_outlier_gate_equals_batch(spark, sf_dir):
    """Continuous anomaly monitoring: per-type moments computed once
    on the reference corpus gate a live event STREAM via a
    stream-static broadcast join — the flagged (event_id, is_outlier)
    set must equal the batch events_value_outliers result (the stats
    are static state, so the scoring is a stateless map)."""
    from cc2dataset_spark.plans.catalog import queries

    batch = {
        (r.event_id, r.is_outlier)
        for r in queries()["events_value_outliers"](spark, sf_dir).collect()
    }

    ev = load_table(spark, sf_dir, "events")
    v = F.col("value").cast("decimal(19,6)")
    stats = ev.groupBy(F.col("event_type").alias("t")).agg(
        F.count("*").alias("n"),
        F.sum(v).cast("double").alias("s1"),
        F.sum(v * v).cast("double").alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt(
        F.greatest(F.col("s2") / F.col("n") - mean * mean, F.lit(0.0))
    )

    schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    out = stream.join(
        F.broadcast(stats), stream.event_type == F.col("t")
    ).select(
        "event_id",
        (F.abs(F.col("value") - mean) > 3 * std).alias("is_outlier"),
    )
    assert out.isStreaming
    _run_to_memory(out, "t_outliers", "append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_outliers").collect()}
    assert got == batch and len(got) > 0


def test_streaming_chunking_equals_batch(spark, sf_dir):
    """Context-length chunking is a stateless map + explode, so it
    runs unchanged on a document STREAM — the continuous packing
    shape. Chunk set (id, idx, md5) must equal the batch query's."""
    from cc2dataset_spark.functions import text as T
    from cc2dataset_spark.plans.catalog import queries
    from cc2dataset_spark.plans.curation import _CHUNK, _STRIDE

    batch = {
        (r.doc_id, r.chunk_idx, r.chunk_md5)
        for r in queries()["text_chunk_documents"](spark, sf_dir).collect()
    }

    schema = spark.read.parquet(f"{sf_dir}/documents.parquet").schema
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "documents.parquet")
        .parquet(sf_dir)
        .select("doc_id", T.tokens(F.lower(F.col("text"))).alias("t"))
    )
    n = F.size("t")
    starts = F.sequence(
        F.lit(1), F.greatest(n - _CHUNK + 1, F.lit(1)), F.lit(_STRIDE)
    )
    piece = F.slice("t", F.col("start"), _CHUNK)
    out = stream.select(
        "doc_id", "t", F.explode(starts).alias("start")
    ).select(
        "doc_id",
        ((F.col("start") - 1) / _STRIDE).cast("bigint").alias("chunk_idx"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )
    assert out.isStreaming
    _run_to_memory(out, "t_chunks", "append")
    got = {tuple(r) for r in spark.sql("SELECT * FROM t_chunks").collect()}
    assert got == batch and len(got) > 0


def test_streaming_sliding_counts_runs(spark, sf_dir):
    """sliding_counts must be streamable: countDistinct is rejected by
    Structured Streaming, so the streaming path switches to the HLL
    approx while the batch twin stays exact. Counts (exact in both)
    must agree; n_users must be present and positive."""
    from cc2dataset_spark.streaming.windows import sliding_counts

    events = load_table(spark, sf_dir, "events")
    batch = {
        (r.window_start, r.window_end): r.n_events
        for r in sliding_counts(events).collect()
    }
    stream = sliding_counts(
        read_events_stream(spark, sf_dir).withWatermark("ts", "1 hour")
    )
    _run_to_memory(stream, "t_sliding", "complete")
    rows = spark.sql("SELECT * FROM t_sliding").collect()
    got = {(r.window_start, r.window_end): r.n_events for r in rows}
    assert got == batch
    assert all(r.n_users > 0 for r in rows)
