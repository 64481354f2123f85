"""Benchmark decontamination (north-star curation op; no reference
implementation — the reference stops at uid dedup, main.py:256).

The standard pre-training hygiene step (GPT-3 appendix C shape): flag
training documents that share an n-word shingle with any document in an
evaluation/benchmark set, so eval answers can't leak into training
data.

Scale shape: the benchmark side is SMALL by definition (eval suites are
thousands of documents; the corpus is billions), so its distinct
shingle set is broadcast and the corpus side never shuffles — the join
is a map-side broadcast semi-probe, then one groupBy on doc id for the
hit counts. The corpus shingle explode is the same map-side pass the
MinHash pipeline does; at 100 TB the two can share one tokenize scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cc2dataset_spark.functions.text import word_shingles


def ngram_decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_text_col: str = "text",
    shingle_words: int = 8,
) -> DataFrame:
    """(id, n_hit_shingles) for every corpus document sharing at least
    one ``shingle_words``-gram with the benchmark set. Deterministic;
    join key is the shingle string itself (exact-match semantics — the
    conservative standard for decontamination; near-dup variants can
    reuse the MinHash path over the same shingles)."""
    c_sh = corpus.select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(text_col, shingle_words))).alias(
            "s"
        ),
    )
    b_sh = (
        benchmark.select(
            F.explode(
                F.array_distinct(word_shingles(bench_text_col, shingle_words))
            ).alias("s")
        )
        .distinct()
    )
    return (
        c_sh.join(F.broadcast(b_sh), "s")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit_shingles"))
    )
