"""Daily-snapshot incremental ingestion, end-to-end and offline:

  1. bootstrap a historical fingerprint index from ~80% of the corpus
     (hash-split stands in for "everything ingested so far"),
  2. dedup the incoming ~20% batch against it
     (operators/dedup.dedup_incremental — fp-keyed anti-join +
     in-batch min-window),
  3. fold the accepted fingerprints back into the index
     (operators/dedup.upsert_by_key — MERGE semantics, no table
     format),
  4. maintain the physical layout: compact the accreted small files
     and rewrite the accepted docs range-sorted on doc_id so later
     point scans skip whole files (sources/files.py).

Runs against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01),
writes under $SPARK_GRAFT_OUT (default /tmp/incremental). Swap the
fixture scan + the hash split for your corpus table and yesterday's
index and the loop runs unchanged.
"""

import os

from pyspark.sql import functions as F

from cc2dataset_spark.functions.hashes import md5_mod
from cc2dataset_spark.operators.dedup import dedup_incremental, upsert_by_key
from cc2dataset_spark.session import build_spark_session
from cc2dataset_spark.sources.files import compact_parquet, write_sorted_parquet
from cc2dataset_spark.sources.tables import load_table

if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = os.environ.get("SPARK_GRAFT_OUT", "/tmp/incremental")
    spark = build_spark_session(master="local[8]", shuffle_partitions=32)

    docs = load_table(spark, sf_dir, "documents")
    fp = F.md5(F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " "))
    b = md5_mod(F.concat(F.lit("ix:"), F.col("doc_id").cast("string")), 100)

    # 1. historical index: only the DISTINCT fingerprint column persists
    index_path = f"{out}/index"
    docs.where(b < 80).select(fp.alias("fingerprint")).distinct().write.mode(
        "overwrite"
    ).parquet(index_path)
    index = spark.read.parquet(index_path)
    n_index = index.count()

    # 2. dedup today's batch against it
    batch = docs.where(b >= 80).select("doc_id", "source", "text")
    accepted = dedup_incremental(batch, index, fp)
    accepted.persist()
    n_batch, n_accepted = batch.count(), accepted.count()

    # 3. fold accepted fingerprints into the index (MERGE semantics)
    new_index = upsert_by_key(
        index, accepted.select("fingerprint").distinct(), ["fingerprint"]
    )
    new_index.write.mode("overwrite").parquet(f"{out}/index_next")
    n_next = spark.read.parquet(f"{out}/index_next").count()

    # 4. physical maintenance: compacted index + skippable docs layout
    n_files = compact_parquet(
        spark, f"{out}/index_next", f"{out}/index_compact"
    )
    write_sorted_parquet(
        accepted.select("doc_id", "source", "fingerprint"),
        f"{out}/accepted_sorted",
        sort_by=["doc_id"],
        n_files=4,
    )

    print(
        f"index={n_index} batch={n_batch} accepted={n_accepted} "
        f"index_next={n_next} index_files={n_files}"
    )
    assert n_next >= n_index
    spark.stop()
