from cc2dataset_spark.operators.extraction import extraction_stats
from cc2dataset_spark.sources.wat import WAT_SCHEMA
from tests.wat_fixtures import FIXTURE_RECORDS, oracle_extract


def test_extraction_stats_accounting(spark):
    wat = spark.createDataFrame(FIXTURE_RECORDS, WAT_SCHEMA)
    row = extraction_stats(wat, "image").first()
    assert row.records_total == len(FIXTURE_RECORDS)
    assert row.records_no_links == 1  # the planted empty record
    total_links = sum(
        len(
            r["Envelope"]["Payload-Metadata"]["HTTP-Response-Metadata"][
                "HTML-Metadata"
            ]["Links"]
            or []
        )
        for r in FIXTURE_RECORDS
    )
    assert row.links_total == total_links
    assert row.links_kept == len(oracle_extract(FIXTURE_RECORDS, "image"))
    assert row.links_dropped == total_links - row.links_kept
