"""VP8L (lossless WebP) codec tests.

Two layers of proof, mirroring the PNG/GIF/JPEG fixture protocol:

1. HAND-BUILT spec vectors — bitstreams assembled bit by bit with a
   test-local LSB-first builder (independent of the encoder twin),
   with expected pixels stated by hand from the public spec
   (RFC 9649). These pin the conventions that a matched-but-wrong
   encoder/decoder pair could not catch: simple-code layout, the
   normal code-length code, LZ77 length/distance prefix values, the
   first distance-map entries, color-cache indexing, packed palette
   bit order, subtract-green, and predictor modes 11/12/13
   (including the Select orientation).
2. Round trips through the encoder twin across every transform
   combination (encoder shares _predict/_ct_delta with the decoder,
   the same shared-math protocol the progressive-JPEG twin uses).
"""

import struct

import pytest

from cc2dataset_spark.operators import webp as W


# ---------------------------------------------------------------------------
# test-local bit builder (independent of the package _BitWriter)
# ---------------------------------------------------------------------------


class Bits:
    def __init__(self):
        self.s = []

    def lsb(self, value, n):
        """n bits of value, least-significant first (spec default)."""
        for k in range(n):
            self.s.append((value >> k) & 1)
        return self

    def code(self, bits_str):
        """A prefix code written MSB-first, given as e.g. '01'."""
        for c in bits_str:
            self.s.append(1 if c == "1" else 0)
        return self

    def payload(self):
        out = bytearray()
        for i, b in enumerate(self.s):
            if i % 8 == 0:
                out.append(0)
            out[-1] |= b << (i % 8)
        return bytes(out)


def wrap_riff(vp8l_body: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_body)) + vp8l_body
    if len(vp8l_body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def header(bits: Bits, w: int, h: int, alpha: int = 0) -> Bits:
    bits.lsb(0x2F, 8).lsb(w - 1, 14).lsb(h - 1, 14).lsb(alpha, 1).lsb(0, 3)
    return bits


def simple_single(bits: Bits, symbol: int) -> Bits:
    """Simple prefix code, one symbol (decodes with 0 bits)."""
    bits.lsb(1, 1).lsb(0, 1)
    if symbol <= 1:
        bits.lsb(0, 1).lsb(symbol, 1)
    else:
        bits.lsb(1, 1).lsb(symbol, 8)
    return bits


def simple_pair(bits: Bits, s0: int, s1: int) -> Bits:
    """Simple prefix code, two symbols: s0 -> code 0, s1 -> code 1."""
    bits.lsb(1, 1).lsb(1, 1)
    if s0 <= 1:
        bits.lsb(0, 1).lsb(s0, 1)
    else:
        bits.lsb(1, 1).lsb(s0, 8)
    bits.lsb(s1, 8)
    return bits


def argb_literal_codes(bits: Bits, a, r, g, b) -> Bits:
    """Five codes for a single-color image: green/red/blue/alpha
    single + distance single (unused but must parse)."""
    simple_single(bits, g)
    simple_single(bits, r)
    simple_single(bits, b)
    simple_single(bits, a)
    simple_single(bits, 0)
    return bits


def no_cache_no_meta(bits: Bits) -> Bits:
    """Main image prelude: cache bit + meta-prefix bit."""
    return bits.lsb(0, 1).lsb(0, 1)


def sub_image_prelude(bits: Bits) -> Bits:
    """Sub-images (transform data, palette) have a cache bit but NO
    meta-prefix bit."""
    return bits.lsb(0, 1)


# ---------------------------------------------------------------------------
# hand vectors
# ---------------------------------------------------------------------------


def test_hand_1x1_literal():
    """Minimal stream: header, no transforms, no cache, no meta, five
    simple codes, zero data bits (every code is single-symbol)."""
    bits = header(Bits(), 1, 1)
    bits.lsb(0, 1)  # no transforms
    no_cache_no_meta(bits)
    argb_literal_codes(bits, a=0x80, r=0x12, g=0x34, b=0x56)
    w, h, ch, raw = W.decode_webp(wrap_riff(bits.payload()))
    # alpha hint 0 -> RGB output
    assert (w, h, ch) == (1, 1, 3)
    assert raw == bytes([0x12, 0x34, 0x56])


def test_hand_2x1_green_pair_code():
    """Two-symbol simple green code: first-read symbol takes code 0,
    second code 1 (READ order, not value order — s0 > s1 here)."""
    bits = header(Bits(), 2, 1)
    bits.lsb(0, 1)
    no_cache_no_meta(bits)
    simple_pair(bits, 0xCC, 0x11)  # green: 0xCC -> '0', 0x11 -> '1'
    simple_single(bits, 7)  # red
    simple_single(bits, 9)  # blue
    simple_single(bits, 0xFF)  # alpha
    simple_single(bits, 0)  # distance
    bits.code("1").code("0")  # greens: 0x11 then 0xCC
    w, h, ch, raw = W.decode_webp(wrap_riff(bits.payload()))
    assert (w, h, ch) == (2, 1, 3)
    assert raw == bytes([7, 0x11, 9, 7, 0xCC, 9])


def test_hand_2x2_lz77_distance_map_entry():
    """LZ77 backref through the 2D distance map: length prefix value
    2, distance code 1 -> map entry (0, 1) -> dist = 1*xsize = 2, so
    row 1 copies row 0. Green code is a hand-built NORMAL code over
    {0x11 literal, 257 = length-prefix 1} — also pins the
    code-length-code machinery (order 17,18,0,1; lengths 1/1)."""
    bits = header(Bits(), 2, 2)
    bits.lsb(0, 1)
    no_cache_no_meta(bits)
    # green: normal code, symbols {0x11: len1, 257: len1}
    bits.lsb(0, 1)  # normal
    bits.lsb(0, 4)  # num_code_lengths = 4 (order: 17,18,0,1)
    bits.lsb(0, 3)  # len(17) = 0
    bits.lsb(0, 3)  # len(18) = 0
    bits.lsb(1, 3)  # len(0) = 1
    bits.lsb(1, 3)  # len(1) = 1   -> CL code: 0 -> '0', 1 -> '1'
    bits.lsb(1, 1)  # use max_symbol
    bits.lsb(4, 3)  # length_nbits = 2 + 2*4 = 10
    bits.lsb(256, 10)  # max_symbol = 2 + 256 = 258
    for s in range(258):  # literal code lengths: 1 at 0x11 and 257
        bits.code("1" if s in (0x11, 257) else "0")
    simple_single(bits, 0xAB)  # red
    simple_single(bits, 0xCD)  # blue
    simple_single(bits, 0xFF)  # alpha
    simple_single(bits, 0)  # distance: prefix value 1 -> dist code 1
    # canonical green: 0x11 -> '0', 257 -> '1'
    bits.code("0")  # literal pixel (0,0)
    bits.code("0")  # literal pixel (1,0)
    bits.code("1")  # backref: length prefix 1 -> length 2, no extra
    # distance code: single-symbol -> 0 bits -> value 1 -> (0,1)
    w, h, ch, raw = W.decode_webp(wrap_riff(bits.payload()))
    assert (w, h, ch) == (2, 2, 3)
    row = bytes([0xAB, 0x11, 0xCD, 0xAB, 0x11, 0xCD])
    assert raw == row + row


def test_hand_color_cache():
    """Color cache: literal pixel, then the cache symbol 280+index
    re-emits it. Index = (0x1e35a7bd * ARGB) >> (32 - bits)."""
    a, r, g, b = 0xFF, 0x10, 0x20, 0x30
    px = (a << 24) | (r << 16) | (g << 8) | b
    cache_bits = 2
    idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)
    bits = header(Bits(), 2, 1)
    bits.lsb(0, 1)  # no transforms
    bits.lsb(1, 1).lsb(cache_bits, 4)  # color cache on
    bits.lsb(0, 1)  # no meta
    # green: normal code over {g literal, 280+idx cache hit} — cache
    # symbols are >= 280 so a simple code cannot carry them
    bits.lsb(0, 1)  # normal
    bits.lsb(0, 4)  # num_code_lengths = 4 (order: 17,18,0,1)
    bits.lsb(0, 3).lsb(0, 3).lsb(1, 3).lsb(1, 3)  # len(0)=1, len(1)=1
    bits.lsb(1, 1)  # use max_symbol
    bits.lsb(4, 3)  # length_nbits = 10
    bits.lsb(280 + idx + 1 - 2, 10)  # read 280+idx+1 code lengths
    for s in range(280 + idx + 1):
        bits.code("1" if s in (g, 280 + idx) else "0")
    simple_single(bits, r)
    simple_single(bits, b)
    simple_single(bits, a)
    simple_single(bits, 0)
    # canonical: g (smaller symbol) -> '0', 280+idx -> '1'
    bits.code("0")  # literal
    bits.code("1")  # cache hit
    w, h, ch, raw = W.decode_webp(wrap_riff(bits.payload()))
    assert raw == bytes([r, g, b, r, g, b])


def test_hand_subtract_green():
    """Inverse subtract-green: r/b recover by adding g mod 256."""
    bits = header(Bits(), 1, 1)
    bits.lsb(1, 1).lsb(2, 2)  # transform: subtract green
    bits.lsb(0, 1)  # end transforms
    no_cache_no_meta(bits)
    argb_literal_codes(bits, a=0xFF, r=0xF0, g=0x20, b=0xFF)
    w, h, ch, raw = W.decode_webp(wrap_riff(bits.payload()))
    assert raw == bytes([(0xF0 + 0x20) & 0xFF, 0x20, (0xFF + 0x20) & 0xFF])


def test_hand_packed_palette():
    """Color indexing with 2 colors: width_bits=3, one packed pixel
    holds 8 one-bit indices LSB-first in its green channel."""
    bits = header(Bits(), 8, 1)
    bits.lsb(1, 1).lsb(3, 2)  # transform: color indexing
    bits.lsb(1, 8)  # palette size - 1 = 1
    # palette delta image (2x1): entries delta-coded per channel.
    # palette[0] = ff202020 (delta from 0), palette[1] = ff404040
    # -> delta  = 00202020
    sub_image_prelude(bits)
    simple_single(bits, 0x20)  # green delta: 0x20 for both entries
    simple_single(bits, 0x20)  # red
    simple_single(bits, 0x20)  # blue
    simple_pair(bits, 0xFF, 0x00)  # alpha: ff then 00
    simple_single(bits, 0)
    # per-pixel interleaved g,r,b,a; only alpha consumes bits
    bits.code("0")  # pixel 0 alpha = 0xff
    bits.code("1")  # pixel 1 alpha = 0x00
    bits.lsb(0, 1)  # end transforms
    # main image: packed width = ceil(8/8) = 1 pixel; indices
    # 1,0,1,1,0,0,1,0 LSB-first -> green byte 0b01001101 = 0x4d
    no_cache_no_meta(bits)
    argb_literal_codes(bits, a=0xFF, r=0, g=0x4D, b=0)
    w, h, ch, raw = W.decode_webp(wrap_riff(bits.payload()))
    assert (w, h) == (8, 1)
    c0, c1 = bytes([0x20] * 3), bytes([0x40] * 3)
    expect = b"".join(
        c1 if i else c0 for i in (1, 0, 1, 1, 0, 0, 1, 0)
    )
    assert raw == expect


def _predictor_stream(mode: int, residuals):
    """2x2 image, predictor transform with one 4x4 block (bits=2);
    residuals is a list of 4 (a, r, g, b) tuples."""
    bits = header(Bits(), 2, 2)
    bits.lsb(1, 1).lsb(0, 2)  # transform: predictor
    bits.lsb(0, 3)  # size_bits - 2 = 0 -> block size 4 -> 1x1 sub
    sub_image_prelude(bits)
    argb_literal_codes(bits, a=0xFF, r=0, g=mode, b=0)
    bits.lsb(0, 1)  # end transforms
    no_cache_no_meta(bits)
    # greens/reds/blues/alphas each need pair codes when 2 distinct
    def channel_code(vals):
        distinct = sorted(set(vals))
        if len(distinct) == 1:
            simple_single(bits, distinct[0])
            return {distinct[0]: ""}
        assert len(distinct) == 2
        simple_pair(bits, distinct[0], distinct[1])
        return {distinct[0]: "0", distinct[1]: "1"}

    a_vals = [t[0] for t in residuals]
    r_vals = [t[1] for t in residuals]
    g_vals = [t[2] for t in residuals]
    b_vals = [t[3] for t in residuals]
    g_map = channel_code(g_vals)
    r_map = channel_code(r_vals)
    b_map = channel_code(b_vals)
    a_map = channel_code(a_vals)
    simple_single(bits, 0)  # distance
    for a, r, g, b in residuals:
        bits.code(g_map[g]).code(r_map[r]).code(b_map[b]).code(a_map[a])
    return wrap_riff(bits.payload())


# Shared predictor-vector geometry (each channel keeps exactly two
# distinct residual values so simple pair codes suffice):
#   res(0,0) = (0, 0a, 14, 1e) -> out00 = ff0a141e (pred = black)
#   res(1,0) = (0, 01, 01, 01) -> out10 = ff0b151f (pred = L)
#   res(0,1) = (0, 0a, 14, 1e) -> out01 = ff14283c (pred = T = out00)
#   res(1,1) = (0, 01, 01, 01) -> pred per mode, L=out01 T=out10
#                                 TL=out00
_PRED_RES = [
    (0x00, 0x0A, 0x14, 0x1E),
    (0x00, 0x01, 0x01, 0x01),
    (0x00, 0x0A, 0x14, 0x1E),
    (0x00, 0x01, 0x01, 0x01),
]
_PRED_FIRST3 = bytes(
    [0x0A, 0x14, 0x1E, 0x0B, 0x15, 0x1F, 0x14, 0x28, 0x3C]
)


def test_hand_predictor_mode12_clamp_add_subtract_full():
    """Mode 12 at (1,1): per-channel clamp(L + T - TL) =
    (14+0b-0a, 28+15-14, 3c+1f-1e) = (15, 29, 3d); +1 residual."""
    w, h, ch, raw = W.decode_webp(_predictor_stream(12, _PRED_RES))
    assert raw == _PRED_FIRST3 + bytes([0x16, 0x2A, 0x3E])


def test_hand_predictor_mode11_select_orientation():
    """Mode 11 Select at (1,1): pL = sum|T-TL| = 3, pT = sum|L-TL| =
    0x0a+0x14+0x1e = 60; pL < pT so the prediction is L = out(0,1) —
    pins the Select argument orientation (predicting T instead would
    give 0c,16,20)."""
    w, h, ch, raw = W.decode_webp(_predictor_stream(11, _PRED_RES))
    assert raw == _PRED_FIRST3 + bytes([0x15, 0x29, 0x3D])


def test_hand_predictor_mode13_truncated_half():
    """Mode 13 at (1,1): ave = ((14+0b)>>1, (28+15)>>1, (3c+1f)>>1)
    = (0f, 1e, 2d); pred = clamp(ave + trunc((ave-TL)/2)) =
    (0f+2, 1e+5, 2d+7) = (11, 23, 34); +1 residual."""
    w, h, ch, raw = W.decode_webp(_predictor_stream(13, _PRED_RES))
    assert raw == _PRED_FIRST3 + bytes([0x12, 0x24, 0x35])


def test_distance_map_prefix_and_size():
    """The generated distance map must equal the spec table's start
    and have the documented shape."""
    dm = W._DISTANCE_MAP
    assert len(dm) == 120 and len(set(dm)) == 120
    assert dm[:14] == (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
        (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
    )
    assert dm[-1] == (8, 7)
    # every entry causal and in range
    assert all(
        (-7 <= dx <= 8 and 0 <= dy <= 7 and (dy > 0 or dx > 0))
        for dx, dy in dm
    )


# ---------------------------------------------------------------------------
# encoder-twin round trips
# ---------------------------------------------------------------------------


def formula_pixels(w, h, ch, seed):
    return bytes(
        ((seed * 7 + (i // ch) * 13 + (i % ch) * 59 + (i // (w * ch)) * 131)
         % 256)
        for i in range(w * h * ch)
    )


VARIANTS = [
    {},
    dict(subtract_green=True),
    dict(cache_bits=4),
    dict(use_rle=True),
    dict(predictor_bits=2, predictor_mode=2),
    dict(predictor_bits=2, predictor_mode=lambda bx, by: (bx + by) % 14),
    dict(color_transform=(3, (23, -17, 42))),
    dict(subtract_green=True, predictor_bits=3, predictor_mode=11),
    dict(
        subtract_green=True,
        predictor_bits=2,
        predictor_mode=lambda bx, by: (bx * 3 + by * 5) % 14,
        cache_bits=3,
    ),
    dict(color_transform=(2, (-128, 127, -64)), subtract_green=True),
]


@pytest.mark.parametrize("dims", [(1, 1), (2, 2), (3, 5), (13, 7), (16, 16)])
@pytest.mark.parametrize("ch", [3, 4])
def test_roundtrip_variants(dims, ch):
    w, h = dims
    raw = formula_pixels(w, h, ch, w * h + ch)
    for opts in VARIANTS:
        enc = W.encode_webp_lossless(w, h, ch, raw, **opts)
        dw, dh, dch, out = W.decode_webp(enc)
        assert (dw, dh, dch) == (w, h, ch)
        assert out == raw
        assert W.webp_dims(enc) == (w, h)


@pytest.mark.parametrize(
    "dims,ncol", [((8, 1), 2), ((9, 4), 2), ((7, 3), 4), ((10, 5), 16),
                  ((6, 6), 17), ((5, 5), 256)]
)
def test_roundtrip_palette(dims, ncol):
    w, h = dims
    px = []
    for i in range(w * h):
        j = (i * 7 + 3) % ncol
        px += [(j * 53) % 256, (j * 97 + j // 16) % 256, (j * 29) % 256]
    raw = bytes(px)
    for opts in (
        dict(use_palette=True),
        dict(use_palette=True, use_rle=True),
        dict(use_palette=True, cache_bits=2),
    ):
        enc = W.encode_webp_lossless(w, h, 3, raw, **opts)
        assert W.decode_webp(enc)[3] == raw


def test_roundtrip_all_14_modes_exercised():
    """A 16x16 image with per-block modes (bx+by)%14 and 4x4 blocks
    covers every predictor mode including the TR edge column."""
    raw = formula_pixels(16, 16, 3, 5)
    enc = W.encode_webp_lossless(
        16, 16, 3, raw, predictor_bits=2,
        predictor_mode=lambda bx, by: (bx + by) % 14,
    )
    assert W.decode_webp(enc)[3] == raw


# ---------------------------------------------------------------------------
# gates + structural damage
# ---------------------------------------------------------------------------


def test_lossy_vp8_gated():
    body = b"\x00" * 10
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
        + b"VP8 " + struct.pack("<I", len(body)) + body
    )
    with pytest.raises(NotImplementedError, match="lossy"):
        W.decode_webp(payload)


def test_animated_webp_gated():
    vp8x = bytes([0x02]) + b"\x00" * 9  # ANIM flag
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(vp8x)) + b"WEBP"
        + b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    )
    with pytest.raises(NotImplementedError, match="animated"):
        W.decode_webp(payload)


def test_structural_damage_raises_value_error():
    raw = formula_pixels(5, 4, 3, 9)
    good = W.encode_webp_lossless(5, 4, 3, raw)
    with pytest.raises(ValueError):
        W.decode_webp(good[:-3])  # truncated bitstream
    with pytest.raises(ValueError):
        W.decode_webp(b"RIFF\x00\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        W.decode_webp(b"notawebp")
    bad_sig = bytearray(good)
    bad_sig[20] = 0x2E  # VP8L signature byte
    with pytest.raises(ValueError):
        W.decode_webp(bytes(bad_sig))


def test_version_nonzero_rejected():
    bits = header(Bits(), 1, 1)
    body = bytearray(bits.payload())
    body[4] |= 0x20  # version bit inside the header
    with pytest.raises(ValueError, match="version"):
        W.decode_vp8l(bytes(body))


def test_duplicate_transform_rejected():
    bits = header(Bits(), 1, 1)
    bits.lsb(1, 1).lsb(2, 2)  # subtract green
    bits.lsb(1, 1).lsb(2, 2)  # subtract green again
    with pytest.raises(ValueError, match="duplicate"):
        W.decode_vp8l(bits.payload())


# ---------------------------------------------------------------------------
# decode_media / resize_media dispatch
# ---------------------------------------------------------------------------


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
        [(i, p, ("webp", len(p), i)) for i, p in rows], schema
    )


def test_decode_media_webp_dispatch(spark):
    """decode_media routes RIFF/WEBP magic to the real VP8L codec and
    gates lossy/animated payloads as 'gated' in status mode."""
    from cc2dataset_spark.operators import multimodal as MM

    raw = formula_pixels(9, 4, 3, 2)
    good = W.encode_webp_lossless(9, 4, 3, raw, subtract_green=True)
    lossy = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 10) + b"\x00" * 10
    )
    vp8x_anim = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 10)
        + bytes([0x02]) + b"\x00" * 9
    )
    truncated = good[:-4]
    # an ANIM-flagged animation whose only frame is lossy VP8: gated
    lossy_anim = W.encode_webp_animation(
        4, 4, (0, 0, 0, 255),
        [{"w": 4, "h": 4, "rgba": bytes(64)}],
    ).replace(b"VP8L", b"VP8 ", 1)
    df = _media_df(
        spark,
        [(1, good), (2, lossy), (3, vp8x_anim), (4, truncated),
         (5, lossy_anim)],
    )
    got = {r.doc_id: r for r in
           MM.decode_media(df, errors="status").collect()}
    assert (got[1].width, got[1].height, got[1].n_frames, got[1].status) \
        == (9, 4, 1, "ok")
    assert got[2].status == "gated"
    # a bare VP8X-ANIM container with no ANIM/ANMF chunks is
    # structural damage now that lossless animations decode (r13)
    assert got[3].status == "corrupt"
    assert got[4].status == "corrupt"
    assert got[5].status == "gated"


def test_resize_media_webp_roundtrip(spark):
    """resize_media decodes a WebP, NN-resamples, and re-encodes as a
    PNG whose pixels match resize_pixels of the original raster."""
    from cc2dataset_spark.operators import multimodal as MM

    raw = formula_pixels(10, 6, 3, 3)
    payload = W.encode_webp_lossless(10, 6, 3, raw, cache_bits=2)
    df = _media_df(spark, [(1, payload)])
    [row] = MM.resize_media(df, width=5, height=4).collect()
    assert row.format == "png" and row.source_format == "webp"
    w, h, ch, out = MM.decode_png(bytes(row.payload))
    assert (w, h, ch) == (5, 4, 3)
    assert out == MM.resize_pixels(raw, 10, 6, 3, 5, 4)


def test_image_dims_sql_walk_webp(spark):
    """The pure-SQL image_dims walk parses all three RIFF layouts —
    on REAL encoder output for VP8L, crafted spec headers for VP8X
    and lossy VP8 — and NULLs unknown first chunks."""
    from pyspark.sql import functions as F

    from cc2dataset_spark.operators.multimodal import image_dims

    vp8l = W.encode_webp_lossless(300, 77, 3, bytes(300 * 77 * 3))
    vp8x = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP"
        + b"VP8X" + struct.pack("<I", 10)
        + bytes([0]) + b"\x00" * 3
        + (499).to_bytes(3, "little") + (259).to_bytes(3, "little")
    )
    vp8 = (
        b"RIFF" + struct.pack("<I", 22) + b"WEBP"
        + b"VP8 " + struct.pack("<I", 10)
        + b"\x00\x00\x00" + b"\x9d\x01\x2a"
        + struct.pack("<HH", 640, 360)
    )
    bad = b"RIFF\x00\x00\x00\x00WEBPXXXX\x00\x00\x00\x00"
    df = spark.createDataFrame(
        [(1, vp8l), (2, vp8x), (3, vp8), (4, bad)], "id long, p binary"
    )
    got = {
        r.id: (r.d["format"], r.d["width"], r.d["height"])
        for r in df.select("id", image_dims("p").alias("d")).collect()
    }
    assert got[1] == ("webp", 300, 77)
    assert got[2] == ("webp", 500, 260)
    assert got[3] == ("webp", 640, 360)
    assert got[4] == (None, None, None)


def test_hand_meta_prefix_image_groups():
    """Meta prefix image: an 8x1 image with meta_bits=2 has two 4px
    blocks; the meta image's (red<<8)|green selects the prefix-code
    group per block. All codes are single-symbol, so group selection
    is the ONLY thing deciding the pixels."""
    bits = header(Bits(), 8, 1)
    bits.lsb(0, 1)  # no transforms
    bits.lsb(0, 1)  # no color cache
    bits.lsb(1, 1)  # meta prefix image present
    bits.lsb(0, 3)  # meta_bits - 2 = 0 -> block size 4 -> meta 2x1
    # meta image (2x1, entropy-coded, no meta of its own):
    sub_image_prelude(bits)
    simple_pair(bits, 0, 1)  # green: group ids 0 then 1
    simple_single(bits, 0)  # red
    simple_single(bits, 0)  # blue
    simple_single(bits, 0xFF)  # alpha
    simple_single(bits, 0)  # distance
    bits.code("0").code("1")  # block 0 -> group 0, block 1 -> group 1
    # group 0: solid (a=ff, r=10, g=20, b=30)
    argb_literal_codes(bits, a=0xFF, r=0x10, g=0x20, b=0x30)
    # group 1: solid (a=ff, r=40, g=50, b=60)
    argb_literal_codes(bits, a=0xFF, r=0x40, g=0x50, b=0x60)
    # main data: every code is single-symbol -> zero data bits
    w, h, ch, raw = W.decode_webp(wrap_riff(bits.payload()))
    assert (w, h, ch) == (8, 1, 3)
    assert raw == bytes([0x10, 0x20, 0x30]) * 4 + bytes([0x40, 0x50, 0x60]) * 4


@pytest.mark.parametrize("dims", [(8, 8), (13, 7), (16, 5)])
def test_roundtrip_meta_groups(dims):
    """Encoder-twin meta emission: 4 groups by block parity, with and
    without a stacked transform."""
    w, h = dims
    raw = formula_pixels(w, h, 3, w + h)
    for opts in (
        dict(meta_bits=2),
        dict(meta_bits=2, meta_group_fn=lambda bx, by: (bx * 2 + by) % 4),
        dict(meta_bits=3, subtract_green=True),
    ):
        enc = W.encode_webp_lossless(w, h, 3, raw, **opts)
        assert W.decode_webp(enc)[3] == raw


def test_meta_excludes_cache_and_rle():
    raw = formula_pixels(4, 4, 3, 1)
    with pytest.raises(ValueError, match="meta_bits excludes"):
        W.encode_webp_lossless(4, 4, 3, raw, meta_bits=2, cache_bits=2)


def test_vp8x_wrapping_vp8l_decodes():
    """A VP8X extended container whose image chunk is VP8L decodes
    through the chunk walk (the non-animated VP8X path)."""
    inner = W.encode_webp_lossless(6, 5, 3, formula_pixels(6, 5, 3, 4))
    vp8l_chunk = inner[12:]  # strip RIFF/WEBP prefix, keep VP8L chunk
    vp8x = (
        b"VP8X" + struct.pack("<I", 10)
        + bytes([0]) + b"\x00" * 3
        + (5).to_bytes(3, "little") + (4).to_bytes(3, "little")
    )
    payload = (
        b"RIFF" + struct.pack("<I", 4 + len(vp8x) + len(vp8l_chunk))
        + b"WEBP" + vp8x + vp8l_chunk
    )
    w, h, ch, raw = W.decode_webp(payload)
    assert (w, h) == (6, 5)
    assert raw == formula_pixels(6, 5, 3, 4)
    assert W.webp_dims(payload) == (6, 5)  # VP8X canvas dims


# ---------------------------------------------------------------------------
# animated WebP (lossless frames)
# ---------------------------------------------------------------------------


def _rgba(w, h, seed, alpha=255):
    return bytes(
        v
        for i in range(w * h)
        for v in ((seed + i) % 256, (seed * 3 + i) % 256,
                  (seed * 7 + i) % 256, alpha)
    )


def test_webp_animation_compositing_rules():
    """Dispose-to-background, overwrite (no blend), and transparent
    blend all land on hand-computable canvases."""
    import numpy as np

    anim = W.encode_webp_animation(
        8, 6, (10, 20, 30, 255),
        [
            {"w": 8, "h": 6, "rgba": _rgba(8, 6, 1)},
            {"x": 2, "y": 2, "w": 4, "h": 3, "rgba": _rgba(4, 3, 9),
             "dispose": True},
            {"x": 0, "y": 0, "w": 2, "h": 2,
             "rgba": _rgba(2, 2, 5, alpha=0)},  # transparent blend
        ],
    )
    assert W.webp_is_animated(anim)
    cw, ch, frames = W.decode_webp_frames(anim)
    assert (cw, ch, len(frames)) == (8, 6, 3)
    f1 = np.frombuffer(frames[0], np.uint8).reshape(6, 8, 4)
    assert f1.tobytes() == _rgba(8, 6, 1)
    f2 = np.frombuffer(frames[1], np.uint8).reshape(6, 8, 4)
    assert f2[2:5, 2:6].tobytes() == _rgba(4, 3, 9)
    f3 = np.frombuffer(frames[2], np.uint8).reshape(6, 8, 4)
    assert (f3[2:5, 2:6] == np.array([10, 20, 30, 255])).all()  # disposed
    assert (f3[0:2, 0:2] == f1[0:2, 0:2]).all()  # transparent -> kept


def test_webp_animation_no_blend_overwrites():
    import numpy as np

    transparent = _rgba(2, 2, 5, alpha=0)
    anim = W.encode_webp_animation(
        4, 4, (0, 0, 0, 255),
        [
            {"w": 4, "h": 4, "rgba": _rgba(4, 4, 3)},
            {"x": 0, "y": 0, "w": 2, "h": 2, "rgba": transparent,
             "blend": False},
        ],
    )
    _, _, frames = W.decode_webp_frames(anim)
    f2 = np.frombuffer(frames[1], np.uint8).reshape(4, 4, 4)
    # overwrite mode copies the transparent pixels verbatim
    assert f2[0:2, 0:2].tobytes() == transparent


def test_webp_animation_fractional_blend_formula():
    """Half-transparent blend follows the documented integer 'over'
    realization: hand-compute one pixel."""
    import numpy as np

    base = bytes([100, 100, 100, 255]) * 4
    overlay = bytes([200, 60, 20, 128]) * 4
    anim = W.encode_webp_animation(
        2, 2, (0, 0, 0, 0),
        [
            {"w": 2, "h": 2, "rgba": base},
            {"w": 2, "h": 2, "rgba": overlay},
        ],
    )
    _, _, frames = W.decode_webp_frames(anim)
    got = np.frombuffer(frames[1], np.uint8).reshape(2, 2, 4)[0, 0]
    sa, da = 128, 255
    ba_num = sa * 255 + da * (255 - sa)
    out_a = (ba_num + 127) // 255
    def ch(sv, dv):
        num = sv * sa * 255 + dv * da * (255 - sa)
        return (num + ba_num // 2) // ba_num
    assert list(got) == [ch(200, 100), ch(60, 100), ch(20, 100), out_a]


def test_webp_animation_gates_and_damage():
    anim = W.encode_webp_animation(
        4, 4, (0, 0, 0, 255), [{"w": 4, "h": 4, "rgba": _rgba(4, 4, 2)}]
    )
    # a lossy frame: replace the inner VP8L chunk fourcc with VP8
    lossy = anim.replace(b"VP8L", b"VP8 ", 1)
    with pytest.raises(NotImplementedError, match="lossy"):
        W.decode_webp_frames(lossy)
    with pytest.raises(ValueError):
        W.decode_webp_frames(anim[:-5])  # truncated
    with pytest.raises(ValueError, match="even"):
        W.encode_webp_animation(
            4, 4, (0, 0, 0, 255),
            [{"x": 1, "y": 0, "w": 2, "h": 2, "rgba": _rgba(2, 2, 1)}],
        )
    with pytest.raises(ValueError, match="outside"):
        W.encode_webp_animation(
            4, 4, (0, 0, 0, 255),
            [{"x": 2, "y": 0, "w": 4, "h": 2, "rgba": _rgba(4, 2, 1)}],
        )
    # still decoder keeps refusing animations
    with pytest.raises(NotImplementedError, match="animated"):
        W.decode_webp(anim)


def test_decode_media_and_sample_frames_webp_animation(spark):
    """decode_media reports canvas dims + real frame count for a
    lossless animation, and sample_frames emits composited RGBA
    canvases as PNG payloads."""
    from cc2dataset_spark.operators import multimodal as MM

    anim = W.encode_webp_animation(
        6, 4, (1, 2, 3, 255),
        [
            {"w": 6, "h": 4, "rgba": _rgba(6, 4, 1)},
            {"x": 2, "y": 0, "w": 2, "h": 2, "rgba": _rgba(2, 2, 7)},
        ],
    )
    df = _media_df(spark, [(1, anim)])
    [row] = MM.decode_media(df).collect()
    assert (row.width, row.height, row.n_frames) == (6, 4, 2)
    decoded = MM.decode_media(df, errors="status")
    frames = MM.sample_frames(
        decoded.join(df.select("doc_id", "payload"), "doc_id"), every_k=1
    ).collect()
    assert len(frames) == 2
    _, _, expected = W.decode_webp_frames(anim)
    for f in frames:
        w, h, ch, raw = MM.decode_png(bytes(f.frame_payload))
        assert (w, h, ch) == (6, 4, 4)
        assert raw == expected[f.frame_idx]


# ---------------------------------------------------------------------------
# property fuzz + container robustness
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 10),
    ch=st.sampled_from([3, 4]),
    seed=st.integers(0, 2**31 - 1),
    variant=st.integers(0, 7),
)
def test_fuzz_roundtrip(w, h, ch, seed, variant):
    """Arbitrary rasters through every encoder feature class must
    round-trip byte-exactly (losslessness is the whole contract)."""
    rng = seed
    vals = []
    for _ in range(w * h * ch):
        rng = (rng * 1103515245 + 12345) % (1 << 31)
        vals.append(rng & 0xFF)
    raw = bytes(vals)
    opts = [
        {},
        dict(subtract_green=True),
        dict(cache_bits=1 + seed % 10),
        dict(use_rle=True),
        dict(predictor_bits=2 + seed % 2,
             predictor_mode=lambda bx, by: (bx + by + seed) % 14),
        dict(color_transform=(2 + seed % 3,
                              (seed % 256 - 128, (seed // 7) % 256 - 128,
                               (seed // 49) % 256 - 128))),
        dict(subtract_green=True, cache_bits=2, use_rle=True),
        dict(meta_bits=2 + seed % 2),
    ][variant]
    enc = W.encode_webp_lossless(w, h, ch, raw, **opts)
    dw, dh, dch, out = W.decode_webp(enc)
    assert (dw, dh, dch) == (w, h, ch)
    assert out == raw


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 8),
    h=st.integers(1, 8),
    n_colors=st.integers(1, 20),
    seed=st.integers(0, 2**31 - 1),
)
def test_fuzz_palette_roundtrip(w, h, n_colors, seed):
    colors = []
    rng = seed
    for _ in range(n_colors):
        rng = (rng * 1103515245 + 12345) % (1 << 31)
        colors.append((rng & 0xFF, (rng >> 8) & 0xFF, (rng >> 16) & 0xFF))
    raw = b"".join(
        bytes(colors[(seed + i) % n_colors]) for i in range(w * h)
    )
    enc = W.encode_webp_lossless(w, h, 3, raw, use_palette=True)
    assert W.decode_webp(enc)[3] == raw


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=0, max_size=120))
def test_fuzz_garbage_never_wrong_class(data):
    """Arbitrary bytes in a VP8L wrapper must decode or raise a
    CONTAINED class (ValueError/NotImplementedError) — never an
    uncontained exception that would escape the X7 layer."""
    payload = wrap_riff(data)
    try:
        W.decode_webp(payload)
    except (ValueError, NotImplementedError):
        pass


@settings(max_examples=25, deadline=None)
@given(data=st.binary(min_size=12, max_size=160))
def test_fuzz_container_garbage_contained(data):
    payload = b"RIFF" + data[:4] + b"WEBP" + data[4:]
    try:
        W.decode_webp(payload)
        W.webp_dims(payload)
        W.webp_is_animated(payload)
    except (ValueError, NotImplementedError):
        pass


def test_unknown_chunks_before_image_are_skipped():
    """ICCP/XMP (or any unknown) chunks ahead of the VP8L chunk must
    not disturb the walk — real files carry them routinely."""
    inner = W.encode_webp_lossless(5, 3, 3, formula_pixels(5, 3, 3, 8))
    vp8l_chunk = inner[12:]
    iccp = b"ICCP" + struct.pack("<I", 5) + b"fake\x00" + b"\x00"  # padded
    xmp = b"XMP " + struct.pack("<I", 4) + b"<x/>"
    payload = (
        b"RIFF"
        + struct.pack("<I", 4 + len(iccp) + len(xmp) + len(vp8l_chunk))
        + b"WEBP" + iccp + xmp + vp8l_chunk
    )
    w, h, ch, raw = W.decode_webp(payload)
    assert (w, h) == (5, 3) and raw == formula_pixels(5, 3, 3, 8)
    assert W.webp_dims(payload) == (5, 3)
