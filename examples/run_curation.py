"""End-to-end training-data curation over the fixture corpus: the
production recipe (quality filter -> MinHash-LSH near-dup dedup ->
deterministic split) plus the per-stage accounting queries, written to
parquet. Runs entirely offline against $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.01).

Every stage here is the same code path the driver-checked catalog
queries exercise (plans/llm_ops.curate_full_recipe), so this script is
the "switch your pipeline to this repo" demonstration: swap the fixture
scan for your corpus table and the recipe runs unchanged.
"""

import os

from pyspark.sql import functions as F

from cc2dataset_spark.functions import text as T
from cc2dataset_spark.functions.hashes import md5_mod
from cc2dataset_spark.operators import neardup as ND
from cc2dataset_spark.operators.components import cluster_survivors
from cc2dataset_spark.session import build_spark_session
from cc2dataset_spark.sources.tables import load_table

if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = os.environ.get("SPARK_GRAFT_OUT", "/tmp/curated")
    spark = build_spark_session(master="local[8]", shuffle_partitions=32)

    docs = load_table(spark, sf_dir, "documents")

    # 1. quality filter (C4-style; all predicates scan-pushable)
    kept = docs.where(
        T.token_count("text").between(20, 1000)
        & (T.punct_ratio("text") < 0.1)
        & F.col("lang").isin("en", "es", "fr", "de")
    )

    # 2. near-dup dedup: LSH candidates -> verified pairs -> connected
    #    components -> min-id survivor per cluster
    pairs = ND.minhash_neardup_pairs(kept, threshold=0.5)
    labeled = cluster_survivors(kept, pairs.select("id_a", "id_b"), "doc_id")
    survivors = kept.join(
        labeled.where("is_survivor").select("doc_id"), "doc_id", "left_semi"
    )

    # 3. deterministic salted split (engine/run/partitioning-independent)
    bucket = md5_mod(F.concat(F.lit("split:"), F.col("doc_id").cast("string")), 100)
    curated = survivors.withColumn(
        "split",
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test"),
    )

    curated.write.mode("overwrite").partitionBy("split").parquet(out)

    stats = (
        curated.groupBy("lang", "split")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "split")
    )
    stats.show(20, truncate=False)
    print(f"curated corpus written to {out}")
