"""Local pipeline run over real Common Crawl (twin of the reference's
examples/run_on_spark_local.py) — requires fastwarc/fsspec/s3fs
(`pip install .[crawl]`) and network access."""

from cc2dataset_spark.pipeline import cc2dataset
from cc2dataset_spark.session import build_spark_session
from cc2dataset_spark.sources.wat import get_cc_wat_index_links, read_wat_index

if __name__ == "__main__":
    spark = build_spark_session(master="local[16]", s3_profile=True)
    index_links = get_cc_wat_index_links("http")[-1:]
    wat_paths = read_wat_index(
        spark,
        index_links,
        wat_count=3,
        seed=42,
        prefix="https://data.commoncrawl.org/",
    )
    n = cc2dataset(
        spark, "/tmp/cc_output", wat_paths, document_type="image"
    )
    print(f"rows written: {n}")
