"""Multimodal near-duplicate queries over opaque media columns.

The decode step (pixels -> perceptual hash) is environment-gated like
every image op in this sandbox (no codec libs; see
operators/multimodal.py), so the pHash here is synthesized
deterministically per document — the Spark-side PLUMBING under test
(64-bit hash banding, band-bucket candidate join, exact Hamming
verification) is the real production path and is what a cluster runs
after a Pandas-UDF pHash kernel fills the hash column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc2dataset_spark.functions.numeric import RATIO6_SQL
from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.sources.tables import load_table

# Planted perturbations: doc_id % 5 selects a variant of the group
# base hash (group = doc_id div 5). Variants 0-3 flip 0/1/1/2 fixed
# bits (pairwise Hamming <= 3); variant 4 rehashes to an unrelated
# point (expected distance ~30) and must NOT survive verification.
_FLIP_SQL = (
    "CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 0 WHEN 1 THEN 1 "
    "WHEN 2 THEN 1048576 WHEN 3 THEN 3298534883328 "
    "ELSE CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) "
    "AS BIGINT) END"
)


@query(
    "multimodal_phash_neardup",
    oracle=f"""
    WITH img AS (
      SELECT doc_id,
             xor(CAST(concat('0x',
                   substr(md5(CAST(doc_id // 5 AS VARCHAR)), 1, 15))
                   AS BIGINT),
                 {_FLIP_SQL}) AS phash
      FROM documents
    ), bands AS (
      SELECT doc_id, phash,
             UNNEST([0, 1, 2, 3]) AS band_idx
      FROM img
    ), keyed AS (
      SELECT doc_id, phash, band_idx,
             (phash >> (15 * band_idx)) & 32767 AS band_val
      FROM bands
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM keyed a JOIN keyed b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b,
           CAST(bit_count(xor(ha.phash, hb.phash)) AS BIGINT) AS hamming
    FROM cand
    JOIN img ha ON ha.doc_id = id_a
    JOIN img hb ON hb.doc_id = id_b
    WHERE bit_count(xor(ha.phash, hb.phash)) <= 3
    """,
    tags=("multimodal", "dedup", "image"),
)
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual-hash image near-dup via BANDED HAMMING blocking: split
    each 60-bit pHash into 4 disjoint 15-bit bands, bucket-join on
    (band_idx, band_val), verify candidates with an exact popcount.
    By pigeonhole, any pair within Hamming distance t <= bands-1 = 3
    shares at least one untouched band, so recall is EXACT for the
    t=3 threshold — no LSH probability, no missed near-dups — while a
    random 60-bit pair (expected distance ~30) collides on a 15-bit
    band with p ~ 4 * 2^-15.

    Scale: the band table is 4x the image count with uniform 15-bit
    keys (widen to 2^20+ band bits for >10^8 images so per-bucket
    fan-out stays O(dups)); ONE exchange keyed (band_idx, band_val)
    feeds the self-join, the distinct pair set is near-dup-sized, and
    verification joins the doc-keyed hash table twice — all integer
    codegen (xor/shift/bit_count), no Python. The pHash itself is the
    stubbed decode product (operators/multimodal.py gate); synthesized
    here per doc with planted <=3-bit variants and a far decoy that
    banding may candidate but verification must reject."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    base = F.conv(
        F.substring(F.md5(F.expr("CAST(doc_id div 5 AS STRING)")), 1, 15),
        16,
        10,
    ).cast("bigint")
    far = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint")
    flip = (
        F.when(F.col("doc_id") % 5 == 0, F.lit(0).cast("bigint"))
        .when(F.col("doc_id") % 5 == 1, F.lit(1).cast("bigint"))
        .when(F.col("doc_id") % 5 == 2, F.lit(1048576).cast("bigint"))
        .when(F.col("doc_id") % 5 == 3, F.lit(3298534883328).cast("bigint"))
        .otherwise(far)
    )
    img = docs.select(
        "doc_id", base.bitwiseXOR(flip).alias("phash")
    )
    keyed = img.select(
        "doc_id",
        "phash",
        F.explode(F.array([F.lit(i) for i in range(4)])).alias("band_idx"),
    ).select(
        "doc_id",
        "phash",
        "band_idx",
        # pyspark's shiftrightunsigned() wrapper only takes a literal
        # shift; the SQL form accepts a column
        F.expr("shiftrightunsigned(phash, band_idx * 15)")
        .bitwiseAND(F.lit(32767))
        .alias("band_val"),
    )
    a = keyed.select(
        F.col("doc_id").alias("id_a"), "band_idx", "band_val"
    )
    b = keyed.select(
        F.col("doc_id").alias("id_b"), "band_idx", "band_val"
    )
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    ha = img.select(F.col("doc_id").alias("id_a"), F.col("phash").alias("pa"))
    hb = img.select(F.col("doc_id").alias("id_b"), F.col("phash").alias("pb"))
    hd = F.bit_count(F.col("pa").bitwiseXOR(F.col("pb")))
    return (
        cand.join(ha, "id_a")
        .join(hb, "id_b")
        .where(hd <= 3)
        .select("id_a", "id_b", hd.cast("bigint").alias("hamming"))
    )


_AUDIO_DUR = RATIO6_SQL.format(num="n_samples", den="sample_rate")


@query(
    "multimodal_audio_frames",
    oracle=f"""
    WITH meta AS (
      SELECT doc_id,
             CAST(CASE CAST(doc_id % 3 AS INT)
                    WHEN 0 THEN 16000 WHEN 1 THEN 22050
                    ELSE 44100 END AS BIGINT) AS sample_rate,
             n_chars * 997 AS n_samples
      FROM documents
    ), framed AS (
      SELECT doc_id, sample_rate, n_samples,
             sample_rate // 40 AS win,
             sample_rate // 100 AS hop
      FROM meta
    )
    SELECT doc_id, sample_rate, n_samples, win, hop,
           CASE WHEN n_samples >= win
                THEN 1 + (n_samples - win) // hop
                ELSE 0 END AS n_frames,
           {_AUDIO_DUR} AS duration_secs
    FROM framed
    """,
    tags=("multimodal", "audio"),
)
def multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio frame-accounting over opaque audio columns: given each
    clip's sample rate and length, the 25 ms window / 10 ms hop frame
    grid every feature extractor (MFCC, mel, wav2vec-style chunking)
    iterates — n_frames = 1 + (n_samples - win) div hop, the
    off-by-one-prone formula worth one canonical implementation. The
    decode that would READ n_samples from real headers is the sandbox-
    gated step (operators/multimodal.py); the metadata here derives
    deterministically from the fixture (rate keyed on doc_id, length
    on n_chars) so the frame arithmetic — the part a cluster actually
    distributes — is value-checked end to end.

    All integer arithmetic (div floor matches DuckDB //); duration in
    seconds via the exact rational. Zero shuffles: pure per-row
    codegen math, scan-bound and embarrassingly parallel; the
    downstream per-frame explode (frame_features' job) multiplies
    rows by n_frames, so THIS table is also the cost estimator a
    scheduler consults before launching that explode."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars"
    )
    rate = (
        F.when(F.col("doc_id") % 3 == 0, 16000)
        .when(F.col("doc_id") % 3 == 1, 22050)
        .otherwise(44100)
        .cast("bigint")
    )
    meta = docs.select(
        "doc_id",
        rate.alias("sample_rate"),
        (F.col("n_chars") * 997).alias("n_samples"),
    )
    framed = meta.select(
        "*",
        F.expr("sample_rate div 40").alias("win"),
        F.expr("sample_rate div 100").alias("hop"),
    )
    from cc2dataset_spark.functions.numeric import ratio_round6

    return framed.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        "win",
        "hop",
        F.when(
            F.col("n_samples") >= F.col("win"),
            F.lit(1) + F.expr("(n_samples - win) div hop"),
        )
        .otherwise(F.lit(0).cast("bigint"))
        .alias("n_frames"),
        ratio_round6(F.col("n_samples"), F.col("sample_rate")).alias(
            "duration_secs"
        ),
    )


_CAP_DIGIT_SHARE = RATIO6_SQL.format(num="n_digits", den="n_chars")


@query(
    "multimodal_caption_stats",
    oracle=f"""
    WITH caps AS (
      SELECT doc_id,
             substr(text, 1, 60) AS caption
      FROM documents
    ), m AS (
      SELECT doc_id, caption,
             CAST(length(caption) AS BIGINT) AS n_chars,
             CAST(len(list_filter(string_split_regex(trim(caption),
                                                     '\\s+'),
                                  x -> x <> '')) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(caption, '[^0-9]', '', 'g'))
               AS BIGINT) AS n_digits
      FROM caps
    )
    SELECT doc_id, n_chars, n_words, n_digits,
           {_CAP_DIGIT_SHARE} AS digit_share,
           n_words >= 3 AND n_words <= 32
             AND 10 * n_digits < 3 * n_chars AS keep
    FROM m WHERE n_chars > 0
    """,
    tags=("multimodal", "image", "curation", "caption"),
)
def multimodal_caption_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption-quality gates for image-text pairs — the LAION-style
    filter battery applied to the TEXT side of the pair (the image
    side is pHash/dims territory): word-count band (3..32 — one-word
    alt text is a filename, 50-word alt text is article boilerplate)
    and digit-density cap (digit-heavy captions are SKUs/timestamps,
    useless as contrastive supervision). Captions here are the
    fixture's alt-text stand-in (the same substr the manifest's
    anchor stream uses).

    The keep flag is decided by INTEGER comparisons only
    (10*digits < 3*chars, i.e. digit share < 0.3); digit_share
    reports via the exact rational. Zero shuffles — pure per-row
    codegen over a two-column scan; at 100 TB this gate belongs
    FUSED into the manifest build's first projection, which is
    exactly what a narrow all-Column formulation makes Catalyst do
    for free."""
    from cc2dataset_spark.functions.numeric import ratio_round6
    from cc2dataset_spark.functions import text as T

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    caps = docs.select(
        "doc_id", F.substring("text", 1, 60).alias("caption")
    )
    m = caps.select(
        "doc_id",
        F.length("caption").cast("bigint").alias("n_chars"),
        F.size(T.tokens("caption")).cast("bigint").alias("n_words"),
        F.length(F.regexp_replace("caption", r"[^0-9]", ""))
        .cast("bigint")
        .alias("n_digits"),
    ).where(F.col("n_chars") > 0)
    return m.select(
        "doc_id",
        "n_chars",
        "n_words",
        "n_digits",
        ratio_round6(F.col("n_digits"), F.col("n_chars")).alias(
            "digit_share"
        ),
        (
            (F.col("n_words") >= 3)
            & (F.col("n_words") <= 32)
            & (F.lit(10) * F.col("n_digits") < F.lit(3) * F.col("n_chars"))
        ).alias("keep"),
    )
