"""r12 code-review regression tests: every finding from the round's
diff review, pinned so it stays fixed — corrupt payloads must raise
ValueError (never AttributeError/KeyError) and be CONTAINED in the
media kernels' lenient modes; incomplete sequential multi-scan JPEGs
must not silently decode; NaN float audio is deterministic; GCT-less
animations decode; containment survives composition."""

import struct

import numpy as np
import pytest

from cc2dataset_spark.operators import multimodal as MM
from cc2dataset_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_scans,
)


def _no_dht_jpeg() -> bytes:
    """A JPEG whose DHT segments are stripped — scans reference
    missing Huffman tables."""
    payload = bytearray(encode_jpeg(8, 8, 1, bytes(64)))
    out = bytearray(b"\xff\xd8")
    i = 2
    while i < len(payload):
        m = payload[i + 1]
        if m == 0xD9:
            out += b"\xff\xd9"
            break
        (ln,) = struct.unpack(">H", payload[i + 2 : i + 4])
        if m == 0xDA:
            out += payload[i:]
            break
        if m != 0xC4:
            out += payload[i : i + 2 + ln]
        i += 2 + ln
    return bytes(out)


def test_missing_huffman_table_is_valueerror():
    with pytest.raises(ValueError, match="missing DC Huffman"):
        decode_jpeg(_no_dht_jpeg())


def test_incomplete_sequential_multiscan_raises():
    """Truncating a 3-component non-interleaved file after the Y scan
    must raise, not return grey-ish pixels with zero chroma."""
    full = encode_jpeg_scans(
        8, 8, 3, bytes(192),
        [([0], 0, 63, 0, 0), ([1], 0, 63, 0, 0), ([2], 0, 63, 0, 0)],
        progressive=False,
    )
    # cut after the SECOND SOS begins: keep everything up to it, then EOI
    first = full.index(b"\xff\xda")
    second = full.index(b"\xff\xda", first + 2)
    truncated = full[:second] + b"\xff\xd9"
    with pytest.raises(ValueError, match="cover 1 of 3"):
        decode_jpeg(truncated)
    # the complete file still decodes
    assert decode_jpeg(full)[:3] == (8, 8, 3)


def test_truncated_gif_raises_valueerror():
    g = MM.encode_gif(4, 3, [(0, 0, 0), (5, 5, 5)], bytes(12))
    # cut right after the image descriptor (before the LZW code size)
    desc = g.index(b"\x2c")
    with pytest.raises(ValueError):
        MM.decode_gif(g[: desc + 10])
    with pytest.raises(ValueError):
        MM.decode_gif_frames(g[: desc + 10])
    with pytest.raises(ValueError):
        MM.decode_gif(g[: desc + 5])


def test_nan_float_wav_is_deterministic_zero():
    vals = np.array([float("nan"), 0.5, float("inf"), float("-inf")],
                    dtype="<f4")
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 3, 1, 8000, 32000, 4, 32)
        + b"data" + struct.pack("<I", 16) + vals.tobytes()
    )
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any RuntimeWarning fails
        _, _, bits, data = MM.decode_wav(payload)
    assert bits == 16
    assert list(struct.unpack("<4h", data)) == [0, 16384, 32767, -32767]


def test_gctless_animation_decodes_with_local_tables():
    """Spec-legal: no global color table, per-frame local tables.
    Background is defined black."""
    pal = [(1, 2, 3), (4, 5, 6)]
    anim = MM.encode_gif_animation(
        2, 2, pal,
        [{"left": 0, "top": 0, "w": 1, "h": 1, "indices": bytes([1])}],
    )
    # rewrite: drop the GCT, move the palette into a local table
    packed = anim[10]
    bits = (packed & 7) + 1
    gct_len = 3 * (1 << bits)
    no_gct = bytearray(anim)
    no_gct[10] = packed & 0x7F  # clear GCT flag
    del no_gct[13 : 13 + gct_len]
    desc = no_gct.index(b"\x2c")
    ip = no_gct[desc + 9]
    no_gct[desc + 9] = ip | 0x80 | (bits - 1)  # LCT flag + size
    no_gct[desc + 10 : desc + 10] = anim[13 : 13 + gct_len]
    sw, sh, frames = MM.decode_gif_frames(bytes(no_gct))
    px = np.frombuffer(frames[0], dtype=np.uint8).reshape(2, 2, 3)
    assert tuple(px[0, 0]) == (4, 5, 6)  # drawn pixel via LCT
    assert tuple(px[1, 1]) == (0, 0, 0)  # background defined black


def test_containment_covers_review_corruptions(spark):
    """The exact corruptions the review found escaping containment
    must now land as status='corrupt', not stage failures."""
    from pyspark.sql import functions as F

    g = MM.encode_gif(4, 3, [(0, 0, 0), (5, 5, 5)], bytes(12))
    desc = g.index(b"\x2c")
    rows = [
        (1, _no_dht_jpeg(), "jpeg"),
        (2, g[: desc + 10], "gif"),
        (3, MM.encode_gif(2, 2, [(9, 9, 9)], bytes(4)), "gif"),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, payload binary, fmt string"
    ).select(
        "doc_id",
        "payload",
        F.struct(
            F.col("fmt").alias("format"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.col("doc_id").alias("source_id"),
        ).alias("meta"),
    )
    decoded = MM.decode_media(df, errors="status")
    got = {r.doc_id: r.status for r in decoded.collect()}
    assert got == {1: "corrupt", 2: "corrupt", 3: "ok"}
    # drop accounting zeros (not NULLs) on an EMPTY status frame
    stats = MM.media_decode_stats(
        MM.decode_media(df.where(F.lit(False)), errors="status")
    ).collect()[0]
    assert tuple(stats) == (0, 0, 0, 0, 0)
    # containment survives composition: status output (NULL n_frames)
    # feeds sample_frames without killing the stage
    with_payload = decoded.join(df.select("doc_id", "payload"), "doc_id")
    frames = MM.sample_frames(with_payload, every_k=1).collect()
    assert all(r.doc_id == 3 for r in frames)
