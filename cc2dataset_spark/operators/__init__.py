from cc2dataset_spark.operators.extraction import extract_document_links
from cc2dataset_spark.operators.dedup import (
    dedup_exact,
    dedup_exact_arbitrary,
)

__all__ = [
    "extract_document_links",
    "dedup_exact",
    "dedup_exact_arbitrary",
]
