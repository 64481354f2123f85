#!/usr/bin/env python
"""Runnable example: the multimodal decode path on REAL files.

Synthesizes a directory of spec-valid media files (Adam7 palette
PNGs, subsampled 4:2:0 JPEGs, interlaced GIFs, PCM WAVs — all from
this repo's stdlib/numpy codecs, no media library anywhere), ingests
them through Spark's ``binaryFile`` source with a listing-time glob
prune, runs the production ``decode_media`` magic-byte dispatch, and
prints per-format dimension statistics. The same plan shape scales
to a 100 TB blob store: one task per file, zero shuffles until the
final tiny aggregate.

    python examples/run_media_decode.py [workdir]
"""
from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    from pyspark.sql import functions as F

    from cc2dataset_spark.operators import multimodal as MM
    from cc2dataset_spark.operators.jpeg import encode_jpeg
    from cc2dataset_spark.session import build_spark_session
    from cc2dataset_spark.sources.files import read_binary_files

    work = Path(
        sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp()
    )
    media = work / "media"
    media.mkdir(parents=True, exist_ok=True)

    pal = [(j * 16, 255 - j * 16, j * 7 % 256) for j in range(16)]
    for i in range(12):
        w, h = i % 9 + 4, i % 7 + 4
        idx = bytes((i + p) % 16 for p in range(w * h))
        (media / f"img_{i:02d}.png").write_bytes(
            MM.encode_png_indexed(
                w, h, pal, idx, bit_depth=4, interlace=bool(i % 2)
            )
        )
        (media / f"img_{i:02d}.gif").write_bytes(
            MM.encode_gif(w, h, pal, idx, interlace=bool(i % 2))
        )
        (media / f"photo_{i:02d}.jpg").write_bytes(
            encode_jpeg(
                8 * (i % 3 + 1),
                8 * (i % 2 + 1),
                3,
                bytes([i * 20 % 256, 90, 45])
                * (64 * (i % 3 + 1) * (i % 2 + 1)),
                sampling="420",
            )
        )
    (media / "README.txt").write_bytes(b"not media, pruned at listing")
    # lossless WebP decodes for real too (r13)
    from cc2dataset_spark.operators.webp import encode_webp_lossless

    for i in range(4):
        w, h = i % 5 + 4, i % 4 + 3
        raw = bytes(((i * 7 + k * 13) % 256) for k in range(w * h * 3))
        (media / f"pic_{i:02d}.webp").write_bytes(
            encode_webp_lossless(w, h, 3, raw, subtract_green=bool(i % 2))
        )
    # planted failures: a 100 TB crawl's first batch always carries
    # corruption and gated classes — status mode must survive both
    import struct as _struct

    (media / "broken.png").write_bytes(
        MM.encode_png(4, 3, 3, bytes(range(36)))[:20]
    )
    sof9 = b"\x08\x00\x08\x00\x08\x01\x01\x11\x00"
    (media / "arith.jpg").write_bytes(
        b"\xff\xd8\xff\xc9"
        + _struct.pack(">H", len(sof9) + 2)
        + sof9
        + b"\xff\xd9"
    )

    spark = build_spark_session(app_name="media-decode-example")
    df = read_binary_files(
        spark, str(media), path_glob="*.{png,jpg,gif,webp}"
    )
    wrapped = df.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit("auto").alias("format"),
            F.col("length").alias("n_bytes"),
            F.lit(0).cast("long").alias("source_id"),
        ).alias("meta"),
    )
    # X7 containment: every record survives with a typed status and
    # the aggregate accounts for each drop — the production posture
    decoded = MM.decode_media(wrapped, errors="status")
    print("drop accounting (planted: 1 corrupt, 1 gated):")
    MM.media_decode_stats(decoded).show(truncate=False)
    decoded = decoded.filter(F.col("status") == "ok")
    # magic-byte dispatch doesn't trust the meta tag, so recover the
    # real format from the decoded payload head for the report
    stats = (
        decoded.join(
            wrapped.select(
                "doc_id",
                F.when(
                    F.substring("payload", 1, 4)
                    == F.lit(b"\x89PNG"),
                    "png",
                )
                .when(
                    F.substring("payload", 1, 3) == F.lit(b"GIF"),
                    "gif",
                )
                .when(
                    F.substring("payload", 1, 4) == F.lit(b"RIFF"),
                    "webp",
                )
                .otherwise("jpeg")
                .alias("kind"),
            ),
            "doc_id",
        )
        .groupBy("kind")
        .agg(
            F.count("*").alias("files"),
            F.min("width").alias("min_w"),
            F.max("width").alias("max_w"),
            F.min("height").alias("min_h"),
            F.max("height").alias("max_h"),
            F.sum(F.col("width") * F.col("height")).alias("pixels"),
        )
        .orderBy("kind")
    )
    stats.show(truncate=False)
    spark.stop()
    print(f"media dir: {media}")


if __name__ == "__main__":
    main()
