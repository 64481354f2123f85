"""Layer-A handoff: the image-text training manifest
(cc_image_text_manifest — extract -> canonicalize -> dedup ->
domain-cap -> split) exported as WebDataset tar shards, the format
multimodal training loaders stream — with a REAL PNG payload per
sample (r10: operators/multimodal.encode_png, stdlib-only) so the
read-back path exercises the actual pixel decoder, not a stub. Runs
against $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)."""

import json
import os
import tarfile

from cc2dataset_spark.plans.catalog import QUERIES
import cc2dataset_spark.plans.reference_pipeline  # noqa: F401 registers
from cc2dataset_spark.session import build_spark_session
from cc2dataset_spark.sources.tar_sink import TarShardDataSource

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _make_thumb_png():
    # pandas_udf parses its return type against the ACTIVE session,
    # so build the UDF after the session exists
    @pandas_udf("binary")
    def _thumb_png(keys: pd.Series) -> pd.Series:
        """Deterministic thumbnail per sample as a byte-real PNG (in
        a real pipeline this column is the fetched/resized bytes)."""
        from cc2dataset_spark.operators.multimodal import encode_png

        out = []
        for k in keys:
            d = int(str(k)[:8], 16)
            w, h = d % 9 + 2, d % 7 + 2
            raw = bytes((d + i) % 256 for i in range(w * h * 3))
            out.append(encode_png(w, h, 3, raw))
        return pd.Series(out)

    return _thumb_png


if __name__ == "__main__":
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out = os.environ.get("SPARK_GRAFT_WDS_OUT", "/tmp/wds_export")
    spark = build_spark_session(master="local[8]", shuffle_partitions=32)
    spark.dataSource.register(TarShardDataSource)
    _thumb_png = _make_thumb_png()

    manifest = QUERIES["cc_image_text_manifest"].fn(spark, sf_dir)
    samples = manifest.select(
        F.col("uid").alias("key"),
        F.coalesce("alt", F.lit("")).alias("txt"),
        F.to_json(F.struct("url", "domain", "split")).alias("json"),
    ).withColumn("png", _thumb_png("key"))
    samples.write.format("tar_shard").option("path", out).mode(
        "overwrite"
    ).save()

    meta = json.load(open(os.path.join(out, "_MANIFEST.json")))
    print(f"wrote {meta['samples']} samples / {meta['shards']} shards -> {out}")
    # read back THROUGH SPARK (r12: the tar_shard source — partition
    # per shard, samples regrouped from adjacent members) and DECODE
    # the pixels: the full loader handoff inside the engine
    from cc2dataset_spark.operators.multimodal import decode_png

    back = spark.read.format("tar_shard").option("path", out).load()
    print(f"read back {back.count()} samples, schema: {back.columns}")
    row = back.orderBy("key").first()
    w, h, ch, raw = decode_png(bytes(row.png))
    print(
        f"decoded {row.key}.png via Spark read: {w}x{h}x{ch}, "
        f"{len(raw)} raw bytes; caption: {bytes(row.txt).decode()[:40]!r}"
    )
    # byte-level spot check against the raw tar (loader equivalence)
    shard = next(
        p for p in sorted(os.listdir(out)) if p.startswith("part-")
    )
    with tarfile.open(os.path.join(out, shard)) as tar:
        m = next(m for m in tar.getmembers() if m.name.endswith(".png"))
        key = m.name.rsplit(".", 1)[0]
        spark_bytes = bytes(
            back.where(F.col("key") == key).first().png
        )
        assert spark_bytes == tar.extractfile(m).read()
        print(f"tar member {m.name} == Spark-read bytes ({m.size} B)")
