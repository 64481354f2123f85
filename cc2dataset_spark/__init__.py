"""cc2dataset_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of rom1504/cc2dataset, rebuilt Spark-first.

Layer A reproduces the reference ETL semantics (WAT -> (uid, url, alt,
cc_filename, page_url) with dedup; see /root/reference/cc2dataset/main.py)
as declarative DataFrame lineage. Layer B is the general operator surface
(joins/aggs/windows/set-ops/scalar functions/streaming) plus the
LLM-data-pipeline extensions (dedup, similarity search, text analysis,
multimodal columns).
"""

from cc2dataset_spark.session import build_spark_session, local_session

__version__ = "0.1.0"

__all__ = ["build_spark_session", "local_session", "__version__"]
