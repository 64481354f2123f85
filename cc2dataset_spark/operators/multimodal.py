"""Multimodal column plumbing (north-star; SURVEY.md Stage 3).

Image/audio/video payloads are opaque ``binary`` columns with a typed
metadata struct. The Spark-side machinery — schema, partition sizing,
Arrow batch shape, mapInPandas signatures — is real and tested; the
actual codec step is stubbed behind ``decode_stub``/``DECODERS``
because media libraries are not available in this container (a real
deployment drops in pillow/ffmpeg inside the same batch function).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("source_id", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("format", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
    ]
)


def attach_binary_payload(
    df: DataFrame, content_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Wrap a content column as (payload: binary, meta: struct). With
    real media, payload comes from spark.read.format('binaryFile') or a
    bytes column in parquet; here the fixture text is UTF-8-encoded as
    a deterministic stand-in payload."""
    payload = F.encode(F.col(content_col), "UTF-8")
    fmt = F.element_at(
        F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            fmt.alias("format"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.col(id_col).cast("long").alias("source_id"),
        ).alias("meta"),
    )


def decode_stub(payload: bytes, fmt: str) -> tuple[int, int, int]:
    """Deterministic fake decode: (width, height, n_frames) derived from
    payload bytes. A real deployment replaces this one function with
    PIL/ffmpeg; everything around it (batching, schema, partitioning)
    is production-shaped.
    """
    if payload is None:
        raise NotImplementedError("real media decoding requires codec libs")
    h = len(payload)
    return (64 + h % 512, 64 + (h * 7) % 512, 1 if fmt != "webm" else 1 + h % 30)


def decode_media(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas decode: Arrow-batched, schema-stable. The input is
    repartitioned range-free (payloads are independent) so decode
    parallelism equals core count regardless of upstream layout."""

    # NOTE: the batch fn must be pickled BY VALUE (no references to
    # this package) — executor Python workers may not have
    # cc2dataset_spark importable. _stub mirrors decode_stub; keep in
    # sync.
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def _stub(payload, fmt):
            if payload is None:
                raise NotImplementedError(
                    "real media decoding requires codec libs"
                )
            h = len(payload)
            return (
                64 + h % 512,
                64 + (h * 7) % 512,
                1 if fmt != "webm" else 1 + h % 30,
            )

        for pdf in it:
            meta = pdf["meta"]
            fmts = [m["format"] for m in meta]
            dims = [
                _stub(p, f) for p, f in zip(pdf["payload"], fmts)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": fmts,
                    "n_bytes": [int(m["n_bytes"]) for m in meta],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "n_frames": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(batches, DECODED_SCHEMA)
