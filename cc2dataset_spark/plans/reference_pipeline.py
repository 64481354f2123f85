"""Layer-A (reference parity) queries for the driver harness.

``cc_extract_dedup_links`` re-expresses the reference's semantic core —
per-link predicate filter -> projection -> md5 uid -> dedup
(/root/reference/cc2dataset/main.py:117-131,166-176,256) — over a
links-shaped view derived deterministically from the ``documents``
fixture table, so DuckDB can check it end-to-end (md5 exists in both
engines). Duplicates are injected via a lateral sequence so the dedup
stage has real work.

``cc_extract_image_wat`` drives the actual extraction operator
(operators/extraction.py) over in-memory synthetic WAT records —
not SQL-expressible (urljoin UDF), so rows-only checked; its value
parity is covered byte-for-byte by tests/test_extraction.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cc2dataset_spark.operators.extraction import extract_document_links
from cc2dataset_spark.plans.catalog import query
from cc2dataset_spark.sources.tables import load_table
from cc2dataset_spark.sources.wat import WAT_SCHEMA


@query(
    "cc_extract_dedup_links",
    oracle="""
    WITH links AS (
      SELECT 'https://cdn.example.com/' || source || '/'
               || CAST(doc_id AS VARCHAR)
               || CASE doc_id % 4 WHEN 0 THEN '.jpg' WHEN 1 THEN '.mp4'
                                  WHEN 2 THEN '.pdf' ELSE '.mp3' END AS url,
             substr(text, 1, 40) AS alt,
             CASE WHEN doc_id % 4 = 0 THEN 'IMG@/src' ELSE 'A@/href' END AS path,
             UNNEST(generate_series(1, 1 + CAST(doc_id % 3 AS INT))) AS _copy
      FROM documents
    )
    SELECT md5(alt || url) AS uid,
           MIN(url) AS url,
           MIN(alt) AS alt,
           COUNT(*) AS n_copies
    FROM links
    WHERE path = 'IMG@/src' AND length(alt) > 0
    GROUP BY md5(alt || url)
    """,
    tags=("layer_a", "dedup", "flagship"),
)
def cc_extract_dedup_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: links-shaped explode -> image predicate (P4) -> md5 uid
    (P12) -> deterministic dedup (A1). All JVM expressions."""
    docs = load_table(spark, sf_dir, "documents")
    ext = (
        F.when(F.col("doc_id") % 4 == 0, ".jpg")
        .when(F.col("doc_id") % 4 == 1, ".mp4")
        .when(F.col("doc_id") % 4 == 2, ".pdf")
        .otherwise(".mp3")
    )
    links = docs.select(
        F.concat(
            F.lit("https://cdn.example.com/"),
            F.col("source"),
            F.lit("/"),
            F.col("doc_id").cast("string"),
            ext,
        ).alias("url"),
        F.substring("text", 1, 40).alias("alt"),
        F.when(F.col("doc_id") % 4 == 0, "IMG@/src").otherwise("A@/href").alias("path"),
        F.explode(F.sequence(F.lit(1), (F.lit(1) + F.col("doc_id") % 3).cast("int"))).alias(
            "_copy"
        ),
    )
    image_links = links.where(
        (F.col("path") == "IMG@/src") & (F.length("alt") > 0)
    )
    return (
        image_links.withColumn("uid", F.md5(F.concat("alt", "url")))
        .groupBy("uid")
        .agg(
            F.min("url").alias("url"),
            F.min("alt").alias("alt"),
            F.count("*").alias("n_copies"),
        )
    )


_DEMO_WAT_RECORDS = [
    {
        "Envelope": {
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        "Links": [
                            {"url": "https://i.ex.com/a.jpg", "alt": "alpha",
                             "text": None, "path": "IMG@/src"},
                            {"url": "/rel/b.jpg", "alt": "beta", "text": None,
                             "path": "IMG@/src"},
                            {"url": "c.jpg", "alt": "", "text": None,
                             "path": "IMG@/src"},
                        ],
                        "Head": {"Base": None},
                    }
                }
            },
            "WARC-Header-Metadata": {"WARC-Target-URI": "http://page.ex.com/x/y.html"},
        },
        "Container": {"Filename": "demo-00.warc.gz"},
    },
    {
        "Envelope": {
            "Payload-Metadata": {
                "HTTP-Response-Metadata": {
                    "HTML-Metadata": {
                        "Links": [
                            {"url": "pic.png", "alt": "based", "text": None,
                             "path": "IMG@/src"},
                            {"url": "https://i.ex.com/a.jpg", "alt": "alpha",
                             "text": None, "path": "IMG@/src"},
                        ],
                        "Head": {"Base": "https://cdn.ex.org/assets/"},
                    }
                }
            },
            "WARC-Header-Metadata": {"WARC-Target-URI": "https://page.ex.org/p.html"},
        },
        "Container": {"Filename": "demo-01.warc.gz"},
    },
]


@query("cc_extract_image_wat", oracle=None, tags=("layer_a", "extraction"))
def cc_extract_image_wat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The real WAT extraction operator (explode + P4 + urljoin UDF +
    P11/P12) over synthetic records, deduped by uid — the reference's
    full single-part dataflow minus the archive decode."""
    # coalesce(1): two demo records - don't fan 32 near-empty tasks
    # through the Python-UDF branch
    wat_df = spark.createDataFrame(_DEMO_WAT_RECORDS, WAT_SCHEMA).coalesce(1)
    return extract_document_links(wat_df, "image").dropDuplicates(["uid"])
