"""The r9 LLM-data additions end to end, offline: exact substring
dedup (Lee et al. 2022 ExactSubstr) decides what text survives, the
BPE trainer fits merge rules on the surviving word frequencies, the
encoder segments the vocabulary, and a bit-reproducible PCA maps the
embedding space. Runs against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.01).

Swap the fixture tables for your corpus; every step is deterministic
(integer-exact span detection, tie-broken merges, quantized-moment
PCA), so re-runs reproduce bit-for-bit.
"""

import os

from pyspark.sql import functions as F

from cc2dataset_spark.operators.linalg import fit_pca, project_pca
from cc2dataset_spark.operators.substring import duplicate_substring_spans
from cc2dataset_spark.operators.tokenizer import bpe_segment, learn_bpe_merges
from cc2dataset_spark.session import build_spark_session
from cc2dataset_spark.sources.tables import load_table

if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = build_spark_session(master="local[8]", shuffle_partitions=32)

    docs = load_table(spark, sf_dir, "documents")

    # 1. substring dedup: which token spans are corpus-duplicated?
    # key="fingerprint" is the production exchange (two-BIGINT xxhash64 keys,
    # ~20x fewer shuffle bytes at L=50); key="tokens" is the exact
    # verifier twin with identical output.
    spans = duplicate_substring_spans(
        docs, min_len=15, key="fingerprint"
    )
    dup = spans.agg(
        F.count("*").alias("spans"), F.sum("span_len").alias("dup_tokens")
    ).collect()[0]
    print(f"duplicated spans: {dup.spans}, tokens inside: {dup.dup_tokens}")

    # 2. BPE training on the corpus word frequencies
    wf = (
        docs.select(
            F.explode(
                F.filter(F.split(F.trim("text"), r"\s+"), lambda t: t != "")
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    merges = learn_bpe_merges(wf, k=10)
    print(f"first merges: {merges[:5]}")
    pieces = bpe_segment(wf.select("w"), merges)
    print("sample segmentations:")
    for r in pieces.limit(5).collect():
        print(f"  {r.w} -> {list(r.pieces)}")

    # 3. PCA of the embedding space (bit-reproducible fit)
    emb = load_table(spark, sf_dir, "embeddings")
    model = fit_pca(emb, k=8)
    print(f"top eigenvalues: {[round(v, 6) for v in model.eigenvalues[:4]]}")
    projected = project_pca(emb, model)
    print(f"projected rows: {projected.count()} (dim {model.dim} -> 8)")
