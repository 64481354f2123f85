"""Layer-A handoff: the image-text training manifest
(cc_image_text_manifest — extract -> canonicalize -> dedup ->
domain-cap -> split) exported as WebDataset tar shards, the format
multimodal training loaders stream. Runs against $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.01)."""

import json
import os
import tarfile

from cc2dataset_spark.plans.catalog import QUERIES
import cc2dataset_spark.plans.reference_pipeline  # noqa: F401 registers
from cc2dataset_spark.session import build_spark_session
from cc2dataset_spark.sources.tar_sink import TarShardDataSource

from pyspark.sql import functions as F

if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = os.environ.get("SPARK_GRAFT_WDS_OUT", "/tmp/wds_export")
    spark = build_spark_session(master="local[8]", shuffle_partitions=32)
    spark.dataSource.register(TarShardDataSource)

    manifest = QUERIES["cc_image_text_manifest"].fn(spark, sf_dir)
    samples = manifest.select(
        F.col("uid").alias("key"),
        F.coalesce("alt", F.lit("")).alias("txt"),
        F.to_json(F.struct("url", "domain", "split")).alias("json"),
    )
    samples.write.format("tar_shard").option("path", out).mode(
        "overwrite"
    ).save()

    meta = json.load(open(os.path.join(out, "_MANIFEST.json")))
    print(f"wrote {meta['samples']} samples / {meta['shards']} shards -> {out}")
    shard = next(
        p for p in sorted(os.listdir(out)) if p.startswith("part-")
    )
    with tarfile.open(os.path.join(out, shard)) as tar:
        for m in tar.getmembers()[:4]:
            print(f"  {shard}:{m.name} ({m.size} B)")
