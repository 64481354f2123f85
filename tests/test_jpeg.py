"""Baseline JPEG codec (operators/jpeg.py): the production
matrix-form IDCT is pinned against an explicit double-sum reference;
solid-colour images decode EXACTLY (single-coefficient analytic
vector); round-trips with flat quant=1 tables stay inside the
provable rounding bound; restart markers and byte stuffing are hit by
construction; unsupported shapes raise instead of answering wrong."""

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from cc2dataset_spark.operators.jpeg import (
    _C,
    decode_jpeg,
    encode_jpeg,
)


def _ref_idct(coef: np.ndarray) -> np.ndarray:
    """ITU T.81 A.3.3 inverse DCT as the literal double sum —
    independent of the production C.T @ G @ C matrix form."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = np.sqrt(0.5) if u == 0 else 1.0
                    cv = np.sqrt(0.5) if v == 0 else 1.0
                    s += (
                        cu
                        * cv
                        * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return out


def test_matrix_idct_matches_double_sum_reference():
    rng = np.random.default_rng(0)
    for _ in range(5):
        coef = rng.integers(-200, 200, (8, 8)).astype(np.float64)
        fast = _C.T @ coef @ _C
        assert np.allclose(fast, _ref_idct(coef), atol=1e-9)


def test_solid_color_decodes_exactly_grey():
    # constant block -> single DC coefficient -> zero rounding chain
    for v in (0, 77, 128, 130, 255):
        raw = bytes([v]) * (16 * 16)
        w, h, c, out = decode_jpeg(encode_jpeg(16, 16, 1, raw))
        assert (w, h, c) == (16, 16, 1)
        assert out == raw


def test_solid_color_rgb_within_color_rounding():
    # RGB->YCbCr->RGB float chain: exact DC path, only the colour
    # transform rounds — bound 1/255 per channel
    raw = bytes([200, 64, 32]) * (8 * 8)
    w, h, c, out = decode_jpeg(encode_jpeg(8, 8, 3, raw))
    got = np.frombuffer(out, dtype=np.uint8).astype(int)
    want = np.frombuffer(raw, dtype=np.uint8).astype(int)
    assert (w, h, c) == (8, 8, 3)
    assert np.abs(got - want).max() <= 1


@settings(max_examples=8, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    ch=st.sampled_from([1, 3]),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_bound_quant1(w, h, ch, seed):
    # flat quant=1: the only loss is coefficient rounding (<=0.5 per
    # coefficient, energy-preserving basis) plus the colour transform
    rng = np.random.default_rng(seed)
    raw = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
    dw, dh, dc, out = decode_jpeg(encode_jpeg(w, h, ch, raw))
    assert (dw, dh, dc) == (w, h, ch)
    got = np.frombuffer(out, dtype=np.uint8).astype(int)
    want = np.frombuffer(raw, dtype=np.uint8).astype(int)
    assert np.abs(got - want).max() <= 6


def test_gradient_heavier_quant_stays_reasonable():
    # smooth content survives quant=8 with small error (energy in
    # low-frequency coefficients)
    w = h = 16
    grad = np.add.outer(np.arange(h) * 4, np.arange(w) * 4) + 30
    raw = grad.astype(np.uint8).tobytes()
    _, _, _, out = decode_jpeg(encode_jpeg(w, h, 1, raw, quant=8))
    got = np.frombuffer(out, dtype=np.uint8).astype(int)
    want = np.frombuffer(raw, dtype=np.uint8).astype(int)
    assert np.abs(got - want).max() <= 8


def test_restart_markers_roundtrip():
    rng = np.random.default_rng(3)
    w, h = 40, 24  # 5x3 = 15 MCUs, restart every 4 -> 3 RST markers
    raw = rng.integers(0, 256, w * h, dtype=np.uint8).tobytes()
    payload = encode_jpeg(w, h, 1, raw, restart_interval=4)
    assert any(
        payload[i] == 0xFF and 0xD0 <= payload[i + 1] <= 0xD7
        for i in range(2, len(payload) - 2)
    )
    _, _, _, out = decode_jpeg(payload)
    got = np.frombuffer(out, dtype=np.uint8).astype(int)
    want = np.frombuffer(raw, dtype=np.uint8).astype(int)
    assert np.abs(got - want).max() <= 6


def test_byte_stuffing_present_and_handled():
    # an all-255 image drives large positive coefficients; the
    # entropy stream statistically contains 0xFF bytes needing
    # stuffing — force plenty of blocks and verify exact decode
    raw = bytes([255]) * (64 * 64)
    payload = encode_jpeg(64, 64, 1, raw)
    _, _, _, out = decode_jpeg(payload)
    assert out == raw


def test_unsupported_shapes_raise():
    good = bytearray(encode_jpeg(8, 8, 1, bytes(64)))
    # flip SOF0 (0xFFC0) to SOF9 (arithmetic-coded sequential) — a
    # genuinely-gated entropy coder (r12: SOF2 progressive now
    # DECODES, so the gate test moved to the arithmetic class)
    i = good.find(b"\xff\xc0")
    arith = bytes(good[:i]) + b"\xff\xc9" + bytes(good[i + 2 :])
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(arith)
    # SOF2 with a SEQUENTIAL scan header (Ss=0,Se=63) violates the
    # T.81 B.2.3 progressive constraints -> structural ValueError,
    # not a silent wrong decode
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2 :])
    with pytest.raises(ValueError, match="DC-only"):
        decode_jpeg(prog)
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(None)
    with pytest.raises(ValueError):
        encode_jpeg(2, 2, 2, bytes(8))
    with pytest.raises(ValueError):
        encode_jpeg(2, 2, 1, bytes(3))


def test_sampling_factor_above_two_raises():
    good = bytearray(encode_jpeg(8, 8, 3, bytes(192)))
    i = good.find(b"\xff\xc0")
    # SOF0 body: len(2) prec(1) h(2) w(2) nc(1) then comp triples;
    # set first component's sampling byte to 0x41 (4x1 -> 4:1:1)
    samp_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert good[samp_off] == 0x11
    good[samp_off] = 0x41
    with pytest.raises(NotImplementedError, match="sampling factor"):
        decode_jpeg(bytes(good))


@pytest.mark.parametrize("samp", ["420", "422", "440"])
def test_subsampled_solid_color_within_rounding(samp):
    """r11: subsampled chroma decodes for real. Solid colour is flat
    in every plane, so box-average downsampling and replication
    upsampling are both exact — only the RGB<->YCbCr float transform
    rounds (bound 1/255 per channel), exactly as in the 4:4:4 case."""
    for w, h in [(8, 8), (16, 16), (13, 11), (5, 9)]:
        raw = bytes([200, 64, 32]) * (w * h)
        dw, dh, dc, out = decode_jpeg(
            encode_jpeg(w, h, 3, raw, sampling=samp)
        )
        assert (dw, dh, dc) == (w, h, 3)
        got = np.frombuffer(out, dtype=np.uint8).astype(int)
        want = np.frombuffer(raw, dtype=np.uint8).astype(int)
        assert np.abs(got - want).max() <= 1


def test_subsampled_chroma_constant_luma_varying():
    """Grey-ramp RGB (r=g=b -> constant Cb=Cr=128): the luma plane is
    full-resolution under every sampling grid, so a 4:2:0 decode must
    match the 4:4:4 decode bit-for-bit — any MCU geometry or
    upsampling slip shows up as a luma shift."""
    rng = np.random.default_rng(0)
    y = rng.integers(0, 256, (16, 16)).astype(np.uint8)
    rgb = np.stack([y, y, y], axis=-1).tobytes()
    ref = decode_jpeg(encode_jpeg(16, 16, 3, rgb, sampling="444"))
    for samp in ("420", "422", "440"):
        got = decode_jpeg(encode_jpeg(16, 16, 3, rgb, sampling=samp))
        assert got == ref
        want = np.frombuffer(rgb, dtype=np.uint8).astype(int)
        out = np.frombuffer(got[3], dtype=np.uint8).astype(int)
        assert np.abs(out - want).max() <= 1


def test_subsampled_restart_markers():
    raw = bytes([10, 200, 100]) * (32 * 24)
    dw, dh, dc, out = decode_jpeg(
        encode_jpeg(32, 24, 3, raw, sampling="420", restart_interval=2)
    )
    got = np.frombuffer(out, dtype=np.uint8).astype(int)
    want = np.frombuffer(raw, dtype=np.uint8).astype(int)
    assert (dw, dh, dc) == (32, 24, 3)
    assert np.abs(got - want).max() <= 1


def test_smooth_image_420_bounded():
    """A smooth gradient (chroma varies slowly) under 4:2:0: the
    box-average/replication chroma pair loses at most the intra-cell
    chroma spread; with a 2-unit-per-pixel ramp the decoded error
    stays within a small bound (not a spec constant — a regression
    tripwire for the sampling geometry)."""
    w, h = 24, 16
    r = np.arange(h).reshape(h, 1) * 2 % 256
    c = np.arange(w).reshape(1, w) * 2 % 256
    img = np.stack(
        [np.broadcast_to(r, (h, w)), np.broadcast_to(c, (h, w)),
         np.broadcast_to((r + c) // 2, (h, w))], axis=-1
    ).astype(np.uint8)
    got = decode_jpeg(encode_jpeg(w, h, 3, img.tobytes(), sampling="420"))
    out = np.frombuffer(got[3], dtype=np.uint8).astype(int)
    assert np.abs(out - img.astype(int).ravel()).max() <= 6


def test_dims_parser_agrees_on_real_jpeg(spark):
    """The pure-JVM header parser (image_dims) and the full decoder
    agree on dimensions over a REAL encoded JPEG file (the r7 parser
    was tested on synthetic headers; this is a whole-file vector)."""
    from cc2dataset_spark.operators.multimodal import image_dims

    payload = encode_jpeg(24, 16, 3, bytes(24 * 16 * 3))
    w, h, c, _ = decode_jpeg(payload)
    assert (w, h, c) == (24, 16, 3)
    df = spark.createDataFrame([(payload,)], "payload binary")
    row = df.select(image_dims("payload").alias("d")).collect()[0]
    assert (row.d["format"], row.d["width"], row.d["height"]) == (
        "jpeg",
        24,
        16,
    )


def test_fill_bytes_and_tem_marker_tolerated():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker id, and standalone length-less markers (TEM 0x01) in the
    header stream — real-world encoders emit both; the walk must skip
    them instead of mis-parsing a bogus segment length."""
    raw = bytes([77]) * 64
    payload = encode_jpeg(8, 8, 1, raw)
    ref = decode_jpeg(payload)
    # insert a fill byte + a TEM marker right after SOI
    patched = payload[:2] + b"\xff" + b"\xff\x01" + payload[2:]
    assert patched[:2] == b"\xff\xd8" and patched != payload
    assert decode_jpeg(bytes(patched)) == ref


def test_non_interleaved_multi_scan_decodes():
    """r12: a legal baseline file with three single-component
    full-band scans (non-interleaved — formerly a loud gate) decodes
    to the IDENTICAL pixels of its interleaved twin: scan
    organization must not change values (same coefficient math, same
    tables)."""
    from cc2dataset_spark.operators.jpeg import encode_jpeg_scans

    import numpy as np

    rng = np.random.default_rng(42)
    for w, h, samp in [(8, 8, "444"), (16, 16, "420"), (13, 11, "440")]:
        raw = rng.integers(0, 256, w * h * 3, dtype=np.uint8).tobytes()
        interleaved = decode_jpeg(encode_jpeg(w, h, 3, raw, sampling=samp))
        multi = decode_jpeg(
            encode_jpeg_scans(
                w, h, 3, raw,
                [([0], 0, 63, 0, 0), ([1], 0, 63, 0, 0), ([2], 0, 63, 0, 0)],
                sampling=samp, progressive=False,
            )
        )
        assert multi == interleaved


def test_dims_parser_tolerates_fill_bytes(spark):
    """image_dims (pure-JVM walk) must agree with decode_jpeg on a
    fill-padded file (T.81 B.1.1.2 0xFF padding + a TEM marker)."""
    from cc2dataset_spark.operators.multimodal import image_dims

    jpg = encode_jpeg(16, 8, 1, bytes([42]) * 128)
    padded = jpg[:2] + b"\xff" + b"\xff\x01" + jpg[2:]
    assert decode_jpeg(padded)[:2] == (16, 8)
    df = spark.createDataFrame(
        [(1, padded)], "doc_id long, payload binary"
    )
    (r,) = df.select(image_dims("payload").alias("d")).collect()
    assert (r.d["format"], r.d["width"], r.d["height"]) == ("jpeg", 16, 8)


def test_grayscale_with_declared_sampling_factors():
    """T.81 A.2.2: a single-component scan is NON-interleaved — one
    data unit per MCU in raster order over the image's own block
    grid, whatever sampling factors the SOF declares (they only
    relate components to each other). jpegtran -grayscale keeps the
    source's 2x2 luma factors, so such files exist in the wild;
    decoding them with interleaved-MCU geometry would scramble
    blocks or die mid-stream."""
    import struct as _s

    raw = bytes((i * 13 + 7) % 256 for i in range(24 * 24))
    good = bytearray(encode_jpeg(24, 24, 1, raw))
    i = good.find(b"\xff\xc0")
    samp_off = i + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert good[samp_off] == 0x11
    good[samp_off] = 0x22  # declare h2v2 on the only component
    ref = decode_jpeg(encode_jpeg(24, 24, 1, raw))
    assert decode_jpeg(bytes(good)) == ref


def test_truncated_fill_bytes_raise_valueerror():
    """A payload ending inside 0xFF marker padding must raise the
    documented ValueError, not IndexError."""
    with pytest.raises(ValueError, match="truncated"):
        decode_jpeg(b"\xff\xd8\xff\xff")


# ---------------------------------------------------------------------
# r12: progressive JPEG (T.81 Annex G — spectral selection +
# successive approximation)
# ---------------------------------------------------------------------


@pytest.mark.parametrize(
    "w,h,ch,samp",
    [
        (8, 8, 1, "444"),
        (16, 8, 1, "444"),
        (13, 11, 1, "444"),
        (8, 8, 3, "444"),
        (16, 16, 3, "420"),
        (13, 11, 3, "422"),
        (24, 17, 3, "440"),
        (5, 9, 3, "420"),
        (64, 48, 3, "420"),
    ],
)
def test_progressive_equals_baseline_pixels(w, h, ch, samp):
    """The libjpeg-style default progressive script (DC/AC x
    first/refine, interleaved DC, split spectral bands) must decode
    to the BIT-IDENTICAL pixels of the baseline encoding: both
    encoders share the per-block coefficient math, so any slip in
    scan assembly, EOB-run bookkeeping, or correction-bit order shows
    up as a pixel diff."""
    from cc2dataset_spark.operators.jpeg import encode_jpeg_progressive

    rng = np.random.default_rng(w * 1000 + h * 10 + ch)
    raw = rng.integers(0, 256, w * h * ch, dtype=np.uint8).tobytes()
    base = decode_jpeg(encode_jpeg(w, h, ch, raw, sampling=samp))
    prog = decode_jpeg(encode_jpeg_progressive(w, h, ch, raw, sampling=samp))
    assert prog == base


def test_progressive_solid_color_exact():
    """Analytic vector: a solid image has one DCT coefficient per
    block (DC), so the whole progressive chain — point transform,
    DC refinement bit, dequant, IDCT — must reproduce the input
    EXACTLY, like the baseline analytic case."""
    from cc2dataset_spark.operators.jpeg import encode_jpeg_progressive

    for v in (0, 1, 127, 128, 200, 255):
        raw = bytes([v]) * (16 * 16)
        got = decode_jpeg(encode_jpeg_progressive(16, 16, 1, raw))
        assert got == (16, 16, 1, raw)
    raw = bytes([10, 200, 99]) * (8 * 8)
    w_, h_, c_, out = decode_jpeg(encode_jpeg_progressive(8, 8, 3, raw))
    ref = decode_jpeg(encode_jpeg(8, 8, 3, raw))[3]
    assert out == ref


def test_progressive_eobrun_spans_blocks_spec_vector():
    """Hand-built spec vector for EOBn with n>0 (our encoder caps at
    EOB0 because the Annex K tables carry no longer EOB symbols, so
    the DECODER's multi-block EOB-run path needs an independent
    vector): a 32x8 greyscale progressive file, DC scan coding block
    values 128+8k, then an AC scan whose entire content is ONE EOB4
    symbol from a custom DHT — all four blocks end with zero AC."""
    import struct as _s

    from cc2dataset_spark.operators.jpeg import (
        _BitWriter,
        _canonical_codes,
        _category,
        _DC_LUMA,
    )

    def seg(marker, body):
        return _s.pack(">HH", marker, len(body) + 2) + body

    parts = [b"\xff\xd8"]
    parts.append(seg(0xFFDB, bytes([0]) + bytes([1] * 64)))
    parts.append(
        seg(0xFFC2, _s.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    )
    parts.append(
        seg(
            0xFFC4,
            bytes([0x00]) + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1]),
        )
    )
    # DC-first scan (Ss=0,Se=0,Ah=0,Al=0): blocks flat at DC=8k ->
    # pixel value 128+k after IDCT (orthonormal DC gain is 8)
    dcc = _canonical_codes(*_DC_LUMA)
    w = _BitWriter()
    pred = 0
    dc_values = [8 * 1, 8 * 5, 8 * (-3), 8 * 20]
    for dv in dc_values:
        diff = dv - pred
        pred = dv
        t = _category(diff)
        code, ln = dcc[t]
        w.write(code, ln)
        if t:
            w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
    parts.append(seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0])))
    parts.append(w.flush())
    # custom AC table: single symbol 0x40 (EOB4 class) with code '0'
    parts.append(
        seg(
            0xFFC4,
            bytes([0x10])
            + bytes([1] + [0] * 15)  # one code of length 1
            + bytes([0x40]),
        )
    )
    # AC scan 1..63: one EOB4 symbol + 4 extra bits 0b0100 = 4 ->
    # eobrun = (1<<4) + 4 = 20 >= 4 blocks? No: choose extra bits so
    # the run covers EXACTLY the four blocks of the scan: (1<<4)=16
    # would overshoot; use symbol 0x20 (EOB2): run = 4 + extra(0..3).
    # Rebuild with 0x20 and extra bits 00 -> run of exactly 4.
    parts[-1] = seg(
        0xFFC4,
        bytes([0x10]) + bytes([1] + [0] * 15) + bytes([0x20]),
    )
    w = _BitWriter()
    w.write(0, 1)  # the EOB2-class symbol's code
    w.write(0, 2)  # extra bits: run = (1<<2) + 0 = 4 blocks
    parts.append(seg(0xFFDA, bytes([1, 1, 0x00, 1, 63, 0])))
    parts.append(w.flush())
    parts.append(b"\xff\xd9")
    payload = b"".join(parts)

    gw, gh, gc, out = decode_jpeg(payload)
    assert (gw, gh, gc) == (32, 8, 1)
    px = np.frombuffer(out, dtype=np.uint8).reshape(8, 32)
    for b, dv in enumerate(dc_values):
        want = min(255, max(0, 128 + dv // 8))
        assert (px[:, b * 8 : b * 8 + 8] == want).all(), (b, dv)


def test_progressive_restart_markers():
    """Progressive DC scan with restart markers: DRI=2, RST between
    every two blocks, predictor resets — hand-assembled because the
    repo encoder doesn't emit restarts in progressive mode."""
    import struct as _s

    from cc2dataset_spark.operators.jpeg import (
        _BitWriter,
        _canonical_codes,
        _category,
        _DC_LUMA,
    )

    def seg(marker, body):
        return _s.pack(">HH", marker, len(body) + 2) + body

    dcc = _canonical_codes(*_DC_LUMA)
    dc_values = [8, 16, 24, 40]  # blocks: 128+1, +2, +3, +5

    def dc_bits(values, pred0=0):
        w = _BitWriter()
        pred = pred0
        for dv in values:
            diff = dv - pred
            pred = dv
            t = _category(diff)
            code, ln = dcc[t]
            w.write(code, ln)
            if t:
                w.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
        return w.flush()

    parts = [b"\xff\xd8"]
    parts.append(seg(0xFFDB, bytes([0]) + bytes([1] * 64)))
    parts.append(seg(0xFFDD, _s.pack(">H", 2)))
    parts.append(
        seg(0xFFC2, _s.pack(">BHHB", 8, 8, 32, 1) + bytes([1, 0x11, 0]))
    )
    parts.append(
        seg(0xFFC4, bytes([0x00]) + bytes(_DC_LUMA[0]) + bytes(_DC_LUMA[1]))
    )
    parts.append(seg(0xFFDA, bytes([1, 1, 0x00, 0, 0, 0])))
    parts.append(dc_bits(dc_values[:2]))
    parts.append(b"\xff\xd0")  # RST0
    parts.append(dc_bits(dc_values[2:], pred0=0))  # predictor reset
    parts.append(b"\xff\xd9")
    payload = b"".join(parts)

    gw, gh, gc, out = decode_jpeg(payload)
    px = np.frombuffer(out, dtype=np.uint8).reshape(8, 32)
    for b, dv in enumerate(dc_values):
        assert (px[:, b * 8 : b * 8 + 8] == 128 + dv // 8).all()


def test_progressive_structural_violations_raise():
    """B.2.3 violations are ValueError (structural damage), and the
    still-gated classes stay NotImplementedError."""
    from cc2dataset_spark.operators.jpeg import encode_jpeg_scans

    raw = bytes(64)
    # AC scan covering 2 components
    with pytest.raises(ValueError, match="1 component"):
        encode_jpeg_scans(8, 8, 3, bytes(192), [([0, 1], 1, 5, 0, 0)])
    # refinement with Ah != Al+1 (decoder side)
    good = encode_jpeg_scans(
        8, 8, 1, raw, [([0], 0, 0, 0, 0), ([0], 1, 63, 0, 0)]
    )
    bad = bytearray(good)
    # patch the second SOS's (Ah<<4)|Al byte: find second 0xFFDA
    first = bad.index(b"\xff\xda")
    second = bad.index(b"\xff\xda", first + 2)
    bad[second + 2 + 2 + 1 + 2 + 2] = 0x30  # Ah=3, Al=0
    with pytest.raises(ValueError, match="Al"):
        decode_jpeg(bytes(bad))
