"""Round-7 curation chain over the fixture corpus, end to end:

  Gopher quality gates  ->  LOSSLESS prefix-filtered exact dedup
  (min-id survivors)    ->  sharded-jsonl export with a two-phase
                            commit manifest.

Every stage is the same code path the driver-checked catalog runs
(`curate_gopher_rules`, `dedup_prefix_jaccard`); the sink is the
Spark 4 Python DataSource writer (`sources/jsonl_sink.py`). Offline
against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01).
"""

import json
import os

from pyspark.sql import functions as F

from cc2dataset_spark.operators.components import cluster_survivors
from cc2dataset_spark.operators.neardup import prefix_filter_jaccard_pairs
from cc2dataset_spark.plans.curation import curate_gopher_rules
from cc2dataset_spark.session import build_spark_session
from cc2dataset_spark.sources.jsonl_sink import JsonlShardDataSource
from cc2dataset_spark.sources.tables import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
OUT = os.environ.get("SPARK_GRAFT_OUT", "/tmp/gated_dedup_out")


def main() -> None:
    spark = build_spark_session(app_name="gated-dedup")
    spark.dataSource.register(JsonlShardDataSource)

    docs = load_table(spark, SF_DIR, "documents")
    gates = curate_gopher_rules(spark, SF_DIR)
    kept = docs.join(
        gates.where(F.col("keep")).select("doc_id"), "doc_id"
    )

    # exact near-dup pairs over the KEPT corpus -> transitive min-id
    # survivorship via the proven component labeler. (NOT a "drop
    # every id_b" anti-join: in a component {4,7,8} with pairs (4,8)
    # and (7,8) that would keep BOTH 4 and 7 — transitive closure
    # keeps exactly one survivor per component.)
    pairs = prefix_filter_jaccard_pairs(kept)
    labeled = cluster_survivors(
        kept, pairs.select("id_a", "id_b"), "doc_id"
    )
    survivors = kept.join(
        labeled.where(F.col("is_survivor")).select("doc_id"), "doc_id"
    )

    survivors.select("doc_id", "lang", "source", "text").write.format(
        "jsonl_shard"
    ).option("path", OUT).mode("append").save()

    manifest = json.load(open(os.path.join(OUT, "_MANIFEST.json")))
    print(
        f"docs={docs.count()} kept={kept.count()} "
        f"survivors={manifest['rows']} shards={manifest['files']} -> {OUT}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
