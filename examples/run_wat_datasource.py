"""Run the extraction pipeline through the registered ``wat`` Python
Data Source (Spark 4 DataSource API) instead of the RDD bridge:
partition-per-archive planning is visible to Catalyst/AQE, and the
same orchestration (dedup, multipart, resume) applies unchanged.

Requires the `crawl` extra (fastwarc + fsspec + s3fs) for mode=warc;
mode=jsonl runs anywhere.
"""

from cc2dataset_spark.pipeline import cc2dataset
from cc2dataset_spark.session import build_spark_session
from cc2dataset_spark.sources.wat import get_cc_wat_index_links, read_wat_index
from cc2dataset_spark.sources.wat_datasource import WatDataSource

if __name__ == "__main__":
    spark = build_spark_session(master="local[16]", s3_profile=True)
    spark.dataSource.register(WatDataSource)

    def wat_source(s, paths):
        return (
            s.read.format("wat")
            .option("paths", ",".join(paths))
            .option("mode", "warc")
            .load()
        )

    index = get_cc_wat_index_links("http")[-1:]
    wats = read_wat_index(spark, index, wat_count=2, seed=42)
    n = cc2dataset(
        spark,
        "/tmp/cc_output_ds",
        wats,
        document_type="image",
        source=wat_source,
    )
    print(f"rows written: {n}")
