"""Cluster pipeline run (twin of the reference's examples/run_on_spark.py):
1000 WATs, multipart=2, per-part session restart, S3A-tuned profile."""

from cc2dataset_spark.pipeline import cc2dataset
from cc2dataset_spark.session import build_spark_session
from cc2dataset_spark.sources.wat import get_cc_wat_index_links, read_wat_index

MASTER = "spark://master:7077"


def make_session():
    return build_spark_session(
        master=MASTER,
        num_cores=128,
        mem_gb=256,
        shuffle_partitions=4096,
        s3_profile=True,
    )


if __name__ == "__main__":
    spark = make_session()
    wat_paths = read_wat_index(
        spark, get_cc_wat_index_links("s3")[-1:], wat_count=1000, seed=42
    )
    n = cc2dataset(
        spark,
        "s3a://my-bucket/cc_output",
        wat_paths,
        document_type="image",
        multipart=2,
        session_factory=make_session,
    )
    print(f"rows written: {n}")
