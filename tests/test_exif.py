"""EXIF orientation tests (r13): the bounded APP1/TIFF walk
(jpeg_orientation), the raster map (apply_exif_orientation, checked
against hand-stated per-pixel expectations for all 8 orientations),
and resize_media's honor/ignore policy."""

import struct

import numpy as np
import pytest

from cc2dataset_spark.operators import multimodal as MM
from cc2dataset_spark.operators.jpeg import (
    add_exif_orientation,
    decode_jpeg,
    encode_jpeg,
    jpeg_orientation,
)


def test_orientation_absent_defaults_to_1():
    g = encode_jpeg(5, 4, 1, bytes([77]) * 20)
    assert jpeg_orientation(g) == 1


@pytest.mark.parametrize("byte_order", ["II", "MM"])
@pytest.mark.parametrize("o", list(range(1, 9)))
def test_orientation_roundtrip_both_byte_orders(o, byte_order):
    g = add_exif_orientation(
        encode_jpeg(5, 4, 1, bytes([77]) * 20), o, byte_order
    )
    assert jpeg_orientation(g) == o
    # the injected segment must not disturb the pixel decode
    w, h, ch, raw = decode_jpeg(g)
    assert (w, h, ch) == (5, 4, 1) and raw == bytes([77]) * 20


def test_orientation_malformed_exif_raises():
    g = add_exif_orientation(encode_jpeg(5, 4, 1, bytes([77]) * 20), 6)
    soi_app1 = bytearray(g)
    # APP1 body starts at offset 4 (SOI + marker); TIFF at +4+6
    tiff_off = 2 + 2 + 2 + 6
    bad_bom = bytearray(g)
    bad_bom[tiff_off] = ord("X")
    with pytest.raises(ValueError, match="byte-order"):
        jpeg_orientation(bytes(bad_bom))
    bad_magic = bytearray(g)
    bad_magic[tiff_off + 2] ^= 0xFF
    with pytest.raises(ValueError, match="magic"):
        jpeg_orientation(bytes(bad_magic))
    # orientation value 9: out of range
    bad_val = bytearray(g)
    val_off = tiff_off + 8 + 2 + 8  # IFD count + entry tag/type/count
    assert soi_app1[val_off] == 6  # little-endian value byte
    bad_val[val_off] = 9
    with pytest.raises(ValueError, match="out of range"):
        jpeg_orientation(bytes(bad_val))


def test_orientation_ignores_non_exif_app1():
    g = encode_jpeg(5, 4, 1, bytes([77]) * 20)
    body = b"http://ns.adobe.com/xap/1.0/\x00<xml/>"
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    assert jpeg_orientation(g[:2] + seg + g[2:]) == 1


# hand-stated per-pixel maps for a 3x2 raster labeled
#   0 1 2
#   3 4 5
_ORIENT_EXPECT = {
    1: [[0, 1, 2], [3, 4, 5]],
    2: [[2, 1, 0], [5, 4, 3]],          # flip H
    3: [[5, 4, 3], [2, 1, 0]],          # rotate 180
    4: [[3, 4, 5], [0, 1, 2]],          # flip V
    5: [[0, 3], [1, 4], [2, 5]],        # transpose
    6: [[3, 0], [4, 1], [5, 2]],        # rotate 90 CW
    7: [[5, 2], [4, 1], [3, 0]],        # transverse
    8: [[2, 5], [1, 4], [0, 3]],        # rotate 90 CCW
}


@pytest.mark.parametrize("o", list(range(1, 9)))
def test_apply_exif_orientation_hand_map(o):
    raw = bytes(range(6))
    out, w, h = MM.apply_exif_orientation(raw, 3, 2, 1, o)
    expect = _ORIENT_EXPECT[o]
    assert (h, w) == (len(expect), len(expect[0]))
    assert list(out) == [v for row in expect for v in row]


def test_apply_exif_orientation_multichannel_and_range():
    raw = bytes(range(18))  # 3x2 RGB
    out, w, h = MM.apply_exif_orientation(raw, 3, 2, 3, 6)
    assert (w, h) == (2, 3)
    a = np.frombuffer(raw, np.uint8).reshape(2, 3, 3)
    assert out == a.transpose(1, 0, 2)[:, ::-1].tobytes()
    with pytest.raises(ValueError):
        MM.apply_exif_orientation(raw, 3, 2, 3, 0)
    with pytest.raises(ValueError):
        MM.apply_exif_orientation(raw, 3, 2, 3, 9)


def _media_df(spark, rows):
    from pyspark.sql import types as ST

    schema = ST.StructType(
        [
            ST.StructField("doc_id", ST.LongType()),
            ST.StructField("payload", ST.BinaryType()),
            ST.StructField(
                "meta",
                ST.StructType(
                    [
                        ST.StructField("format", ST.StringType()),
                        ST.StructField("n_bytes", ST.LongType()),
                        ST.StructField("source_id", ST.LongType()),
                    ]
                ),
            ),
        ]
    )
    return spark.createDataFrame(
        [(i, p, ("jpeg", len(p), i)) for i, p in rows], schema
    )


def test_resize_media_honors_orientation(spark):
    """orientation='honor' resamples the DISPLAYED raster; 'ignore'
    (default) keeps the stored one — proven on a greyscale gradient
    where rotation changes the resampled pixels."""
    w, h = 8, 4
    raw = bytes((13 * i) % 256 for i in range(w * h))
    stored = encode_jpeg(w, h, 1, raw)
    # decode first: encode_jpeg is lossy in general; compare against
    # what the codec actually returns for this payload
    _, _, _, decoded = decode_jpeg(stored)
    payload = add_exif_orientation(stored, 6)
    df = _media_df(spark, [(1, payload)])

    [ignored] = MM.resize_media(df, width=4, height=4).collect()
    _, _, _, raw_ign = MM.decode_png(bytes(ignored.payload))
    assert raw_ign == MM.resize_pixels(decoded, w, h, 1, 4, 4)

    [honored] = MM.resize_media(
        df, width=4, height=4, orientation="honor"
    ).collect()
    disp, dw, dh = MM.apply_exif_orientation(decoded, w, h, 1, 6)
    _, _, _, raw_hon = MM.decode_png(bytes(honored.payload))
    assert (dw, dh) == (h, w)
    assert raw_hon == MM.resize_pixels(disp, dw, dh, 1, 4, 4)
    assert raw_hon != raw_ign


def test_resize_media_malformed_exif_contained(spark):
    """A present-but-corrupt EXIF block follows the errors policy in
    honor mode instead of killing the stage."""
    g = add_exif_orientation(encode_jpeg(5, 4, 1, bytes([77]) * 20), 3)
    bad = bytearray(g)
    bad[12] = ord("X")  # TIFF byte-order mark (SOI+marker+len+Exif\0\0)
    df = _media_df(spark, [(1, bytes(bad))])
    [row] = MM.resize_media(
        df, width=4, height=4, errors="status", orientation="honor"
    ).collect()
    assert row.status == "corrupt"
    # ignore mode never reads EXIF, so the same payload resizes fine
    [ok] = MM.resize_media(df, width=4, height=4).collect()
    assert ok.format == "png"


def test_resize_media_orientation_param_validated(spark):
    df = _media_df(spark, [(1, encode_jpeg(4, 4, 1, bytes(16)))])
    with pytest.raises(ValueError, match="orientation"):
        MM.resize_media(df, orientation="sideways")


# ---------------------------------------------------------------------------
# WebP container EXIF (r13)
# ---------------------------------------------------------------------------


def test_webp_orientation_roundtrip():
    from cc2dataset_spark.operators.webp import (
        add_webp_exif_orientation,
        decode_webp,
        encode_webp_lossless,
        webp_orientation,
    )

    raw = bytes((7 * i) % 256 for i in range(6 * 4 * 3))
    still = encode_webp_lossless(6, 4, 3, raw)
    assert webp_orientation(still) == 1  # no EXIF chunk
    for o in (1, 3, 6, 8):
        for bo in ("II", "MM"):
            tagged = add_webp_exif_orientation(still, o, bo)
            assert webp_orientation(tagged) == o
            # the rewrap must not disturb the pixel decode
            assert decode_webp(tagged)[3] == raw


def test_webp_orientation_malformed_raises():
    from cc2dataset_spark.operators.webp import (
        add_webp_exif_orientation,
        encode_webp_lossless,
        webp_orientation,
    )

    still = encode_webp_lossless(4, 4, 3, bytes(48))
    tagged = bytearray(add_webp_exif_orientation(still, 6))
    exif_at = bytes(tagged).rindex(b"EXIF") + 8  # chunk body start
    tagged[exif_at] = ord("X")  # wreck the TIFF byte-order mark
    with pytest.raises(ValueError, match="byte-order"):
        webp_orientation(bytes(tagged))


def test_resize_media_honors_webp_orientation(spark):
    from cc2dataset_spark.operators.webp import (
        add_webp_exif_orientation,
        decode_webp,
        encode_webp_lossless,
    )

    w, h = 8, 4
    raw = bytes((13 * i) % 256 for i in range(w * h * 3))
    payload = add_webp_exif_orientation(
        encode_webp_lossless(w, h, 3, raw), 6
    )
    assert decode_webp(payload)[3] == raw  # lossless
    df = _media_df(spark, [(1, payload)])
    [honored] = MM.resize_media(
        df, width=4, height=4, orientation="honor"
    ).collect()
    disp, dw, dh = MM.apply_exif_orientation(raw, w, h, 3, 6)
    _, _, _, raw_hon = MM.decode_png(bytes(honored.payload))
    assert (dw, dh) == (h, w)
    assert raw_hon == MM.resize_pixels(disp, dw, dh, 3, 4, 4)
