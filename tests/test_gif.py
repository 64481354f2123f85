"""GIF codec (operators/multimodal.py, r11): hand-assembled LZW spec
vectors pin the decoder independently of the encoder twin; interlace
de-weaving is pinned row-by-row; extensions skip; animations gate
loudly; LZW dictionary growth/overflow round-trips."""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from cc2dataset_spark.operators.multimodal import (
    _lzw_decode,
    decode_gif,
    encode_gif,
)


def _pack_lsb(codes, widths):
    """Independent LSB-first bit packer for hand vectors."""
    buf, bits = 0, 0
    out = bytearray()
    for c, w in zip(codes, widths):
        buf |= c << bits
        bits += w
        while bits >= 8:
            out.append(buf & 0xFF)
            buf >>= 8
            bits -= 8
    if bits:
        out.append(buf & 0xFF)
    return bytes(out)


def _gif_bytes(w, h, gct_bits, gct, mcs, lzw, img_packed=0, extra=b""):
    packed = 0x80 | (gct_bits - 1)
    sub = bytearray()
    for i in range(0, len(lzw), 255):
        sub += bytes([len(lzw[i : i + 255])]) + lzw[i : i + 255]
    sub += b"\x00"
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, packed, 0, 0)
        + gct
        + extra
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, img_packed)
        + bytes([mcs])
        + bytes(sub)
        + b"\x3b"
    )


_PAL4 = b"".join(bytes(((j * 50) % 256, j, 255 - j)) for j in range(4))


def test_hand_vector_lzw_literals():
    """2x1, mcs=2: codes clear(4), 1, 2, end(5), all width 3 —
    assembled with an independent packer, never _lzw_encode."""
    lzw = _pack_lsb([4, 1, 2, 5], [3, 3, 3, 3])
    payload = _gif_bytes(2, 1, 2, _PAL4, 2, lzw)
    w, h, c, rgb = decode_gif(payload)
    assert (w, h, c) == (2, 1, 3)
    assert rgb == _PAL4[3:6] + _PAL4[6:9]


def test_hand_vector_kwkwk():
    """The KwKwK case: code == next_code. Stream 1,1,1,1,1 encodes
    as clear, 1, 6(=prev+prev[0] before 6 exists), 6, end."""
    lzw = _pack_lsb([4, 1, 6, 6, 5], [3, 3, 3, 3, 3])
    payload = _gif_bytes(5, 1, 2, _PAL4, 2, lzw)
    w, h, c, rgb = decode_gif(payload)
    assert rgb == _PAL4[3:6] * 5


def test_extensions_and_transparency_skipped():
    """GCE + comment extensions before the image descriptor must be
    walked over via their sub-block chain."""
    gce = b"\x21\xf9\x04\x01\x00\x00\x02\x00"
    comment = b"\x21\xfe\x05hello\x00"
    lzw = _pack_lsb([4, 0, 3, 5], [3, 3, 3, 3])
    payload = _gif_bytes(2, 1, 2, _PAL4, 2, lzw, extra=gce + comment)
    w, h, c, rgb = decode_gif(payload)
    assert rgb == _PAL4[0:3] + _PAL4[9:12]


def test_multi_frame_gates_loudly():
    single = encode_gif(2, 2, [(0, 0, 0), (255, 255, 255)], bytes(4))
    # duplicate the image block (0x2c .. before trailer)
    i = single.index(b"\x2c")
    frame = single[i:-1]
    with pytest.raises(NotImplementedError, match="multi-frame"):
        decode_gif(single[:-1] + frame + b"\x3b")


def test_interlace_row_order_pinned():
    """Interlaced 8-row image: stored row order must be
    0,8-pass rows then 4, then 2,6, then odd rows. Each row is a
    solid distinct color, so any de-weave slip misplaces a row."""
    pal = [(j, j, j) for j in range(8)]
    idx = bytes(r for r in range(8) for _ in range(4))  # row r = color r
    p = encode_gif(4, 8, pal, idx, interlace=True)
    w, h, c, rgb = decode_gif(p)
    for r in range(8):
        row = rgb[3 * 4 * r : 3 * 4 * (r + 1)]
        assert row == bytes((r, r, r)) * 4
    # and the stored (pre-de-weave) order really is the 4-pass one:
    plain = encode_gif(4, 8, pal, idx)
    assert p != plain


def test_local_color_table_overrides_global():
    lzw = _pack_lsb([4, 1, 5], [3, 3, 3])
    lct = b"".join(bytes((200 + j, j, 7)) for j in range(4))
    payload = (
        b"GIF89a"
        + struct.pack("<HHBBB", 1, 1, 0x81, 0, 0)  # GCT, 4 entries
        + _PAL4
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, 1, 1, 0x81)  # LCT flag, 4 entries
        + lct
        + b"\x02"
        + bytes([len(_pack_lsb([4, 1, 5], [3, 3, 3]))])
        + lzw
        + b"\x00\x3b"
    )
    w, h, c, rgb = decode_gif(payload)
    assert rgb == bytes((201, 1, 7))


def test_corrupt_and_unsupported_raise():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"PNG stuff")
    good = encode_gif(3, 3, [(1, 2, 3), (4, 5, 6)], bytes([1]) * 9)
    with pytest.raises(ValueError, match="no image descriptor"):
        decode_gif(good[: good.index(b"\x2c")] + b"\x3b")
    # truncated LZW stream
    with pytest.raises(ValueError, match="truncated|ended early"):
        payload = _gif_bytes(4, 4, 2, _PAL4, 2, _pack_lsb([4, 1], [3, 3]))
        decode_gif(payload)
    # index beyond color table: 2-entry table, code 3
    small_gct = b"\x00\x00\x00\xff\xff\xff"
    bad = _gif_bytes(1, 1, 1, small_gct, 2, _pack_lsb([4, 3, 5], [3] * 3))
    with pytest.raises(ValueError, match="outside color table"):
        decode_gif(bad)


def test_encoder_validates():
    with pytest.raises(ValueError, match="palette"):
        encode_gif(1, 1, [], b"\x00")
    with pytest.raises(ValueError, match="expected"):
        encode_gif(2, 2, [(0, 0, 0)], b"\x00")
    with pytest.raises(ValueError, match="range"):
        encode_gif(1, 1, [(0, 0, 0)], b"\x05")


def _lzw_encode_deferred(mcs: int, indices: bytes) -> bytes:
    """Test-local LZW encoder using the DEFERRED-CLEAR strategy real
    encoders (e.g. giflib) may emit: when the table fills, keep
    coding against the FROZEN table instead of emitting a clear —
    the in-repo encoder always clears, so this is the only way to
    exercise the decoder's frozen-table path."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    out = bytearray()
    bitbuf = bitcnt = 0

    def emit(code, width):
        nonlocal bitbuf, bitcnt
        bitbuf |= code << bitcnt
        bitcnt += width
        while bitcnt >= 8:
            out.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8

    table = {bytes([i]): i for i in range(1 << mcs)}
    next_code = end + 1
    width = mcs + 1
    emit(clear, width)
    w = b""
    for b in indices:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        # table full: NO clear — keep coding against the frozen table
        w = bytes([b])
    if w:
        emit(table[w], width)
    emit(end, width)
    if bitcnt:
        out.append(bitbuf & 0xFF)
    return bytes(out)


def test_deferred_clear_table_full_decodes():
    """A stream that fills the 4096-entry table and KEEPS CODING
    against the frozen table without a clear code (deferred-clear,
    a strategy real encoders use) must decode: the decoder just
    stops adding entries. Built with a test-local deferred-clear
    encoder because the in-repo encoder always clears on overflow."""
    import random

    rng = random.Random(11)
    idx = bytes(rng.randrange(256) for _ in range(120 * 120))
    pal = [((j * 3) % 256, (j * 5) % 256, (j * 7) % 256) for j in range(256)]
    lzw = _lzw_encode_deferred(8, idx)
    gct = bytes(v for c in pal for v in c)
    payload = _gif_bytes(120, 120, 8, gct, 8, lzw)
    w, h, c, rgb = decode_gif(payload)
    assert (w, h) == (120, 120)
    assert rgb == b"".join(bytes(pal[i]) for i in idx)
    # sanity: the stream really is deferred-clear (no mid-stream
    # clear after the opening one) AND really fills the table: the
    # in-repo encoder's output differs
    assert lzw != encode_gif(120, 120, pal, idx)[-len(lzw) - 2 :]


def test_subrectangle_frame_gates_loudly():
    """A frame covering a sub-rectangle of the logical screen needs
    background compositing this decoder doesn't model — gate, don't
    return frame-local pixels with wrong dims."""
    single = bytearray(encode_gif(4, 4, [(0, 0, 0), (1, 1, 1)], bytes(16)))
    # enlarge the logical screen to 6x6, leaving the 4x4 frame inside
    struct.pack_into("<HH", single, 6, 6, 6)
    with pytest.raises(NotImplementedError, match="sub-rectangle"):
        decode_gif(bytes(single))


@settings(max_examples=15, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    ncol=st.integers(1, 256),
    interlace=st.booleans(),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_fuzz(w, h, ncol, interlace, seed):
    import random

    rng = random.Random(seed)
    pal = [
        (rng.randrange(256), rng.randrange(256), rng.randrange(256))
        for _ in range(ncol)
    ]
    idx = bytes(rng.randrange(ncol) for _ in range(w * h))
    got = decode_gif(encode_gif(w, h, pal, idx, interlace=interlace))
    assert got == (w, h, 3, b"".join(bytes(pal[i]) for i in idx))


def test_header_dims_agree_with_jvm_image_dims(spark):
    """The pure-JVM header parser (image_dims) and the full LZW
    pixel decoder must agree on dimensions over REAL encoded GIFs."""
    from pyspark.sql import functions as F

    from cc2dataset_spark.operators.multimodal import image_dims

    pal = [(j, 2 * j, 3 * j) for j in range(8)]
    payloads = [
        (
            i,
            encode_gif(
                i % 9 + 1,
                i % 7 + 1,
                pal,
                bytes(p % 8 for p in range((i % 9 + 1) * (i % 7 + 1))),
                interlace=bool(i % 2),
            ),
        )
        for i in range(1, 8)
    ]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    got = {
        r.doc_id: (r.d["format"], r.d["width"], r.d["height"])
        for r in df.select(
            "doc_id", image_dims("payload").alias("d")
        ).collect()
    }
    for i, p in payloads:
        w, h, c, _ = decode_gif(p)
        assert got[i] == ("gif", w, h)
