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
    # flip SOF0 (0xFFC0) to SOF2 (progressive)
    i = good.find(b"\xff\xc0")
    prog = bytes(good[:i]) + b"\xff\xc2" + bytes(good[i + 2 :])
    with pytest.raises(NotImplementedError, match="non-baseline"):
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


def test_non_interleaved_multi_scan_gates_loudly():
    """A baseline file whose SOS covers fewer components than the SOF
    declares (non-interleaved scans, several SOS segments) must raise
    NotImplementedError — decoding only the first scan would silently
    return all-zero planes for the rest."""
    import struct as _s

    payload = bytearray(encode_jpeg(8, 8, 3, bytes(192)))
    # find the SOS segment and shrink it to cover one component
    i = 2
    while i < len(payload):
        assert payload[i] == 0xFF
        m = payload[i + 1]
        (ln,) = _s.unpack(">H", payload[i + 2 : i + 4])
        if m == 0xDA:
            body = payload[i + 4 : i + 2 + ln]
            ns = body[0]
            assert ns == 3
            new_body = bytes([1]) + bytes(body[1:3]) + bytes(body[7:])
            new = (
                payload[: i + 2]
                + _s.pack(">H", 2 + len(new_body))
                + new_body
                + payload[i + 2 + ln :]
            )
            with pytest.raises(NotImplementedError, match="1 of 3"):
                decode_jpeg(bytes(new))
            return
        i += 2 + ln
    raise AssertionError("no SOS found")


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
