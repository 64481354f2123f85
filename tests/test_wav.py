"""WAV/PCM codec (operators/multimodal.py, r11): hand-built RIFF
spec vectors pin the decoder independently of the encoder; unknown
chunks skip with the RIFF pad byte honored; the genuinely-coded
classes (IEEE float, a-law/mu-law, extensible, MP3-in-WAV) gate
loudly; integer-PCM round-trips are lossless by construction."""

import struct

import pytest
from hypothesis import given, settings, strategies as st

from cc2dataset_spark.operators.multimodal import decode_wav, encode_wav


def _chunk(tag: bytes, body: bytes) -> bytes:
    return tag + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) % 2 else b""
    )


def _fmt(tag=1, ch=1, sr=8000, bits=16, extra=b"") -> bytes:
    ba = ch * (bits // 8)
    return struct.pack("<HHIIHH", tag, ch, sr, sr * ba, ba, bits) + extra


def _riff(*chunks: bytes) -> bytes:
    body = b"WAVE" + b"".join(chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_hand_vector_mono_16bit():
    """Fully hand-assembled file — never touches encode_wav."""
    samples = struct.pack("<4h", 0, 1000, -1000, 32767)
    payload = _riff(_chunk(b"fmt ", _fmt()), _chunk(b"data", samples))
    assert decode_wav(payload) == (8000, 1, 16, samples)


def test_hand_vector_stereo_8bit_and_unknown_chunks():
    """LIST/fact chunks (one odd-sized, exercising the pad byte)
    before and after fmt must be skipped, not mis-parsed."""
    samples = bytes([0, 255, 128, 127, 1, 2])  # 3 stereo frames
    payload = _riff(
        _chunk(b"LIST", b"INFOxy z"),
        _chunk(b"fmt ", _fmt(ch=2, sr=44100, bits=8)),
        _chunk(b"fact", b"\x03\x00\x00\x00\x01"),  # odd size -> pad
        _chunk(b"data", samples),
    )
    assert decode_wav(payload) == (44100, 2, 8, samples)


def test_trailing_bytes_after_data_ignored():
    samples = struct.pack("<2h", 5, -5)
    payload = _riff(_chunk(b"fmt ", _fmt()), _chunk(b"data", samples))
    assert decode_wav(payload + b"JUNK")[3] == samples


@pytest.mark.parametrize(
    "tag,name",
    [
        (0x55, "MP3-in-WAV"),
        (2, "non-PCM"),
    ],
)
def test_coded_formats_gate_loudly(tag, name):
    payload = _riff(
        _chunk(b"fmt ", _fmt(tag=tag)), _chunk(b"data", b"\x00\x00")
    )
    with pytest.raises(NotImplementedError, match=name):
        decode_wav(payload)


def test_24bit_gates_and_malformed_raise():
    p24 = _riff(
        _chunk(b"fmt ", _fmt(bits=24)), _chunk(b"data", b"\x00" * 3)
    )
    with pytest.raises(NotImplementedError, match="24-bit"):
        decode_wav(p24)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"OggS" + bytes(40))
    with pytest.raises(ValueError, match="WAVE"):
        decode_wav(b"RIFF\x04\x00\x00\x00AVI ")
    # data before fmt
    with pytest.raises(ValueError, match="before fmt"):
        decode_wav(_riff(_chunk(b"data", b"\x00\x00")))
    # no data chunk at all
    with pytest.raises(ValueError, match="no data"):
        decode_wav(_riff(_chunk(b"fmt ", _fmt())))
    # declared data size beyond the payload
    with pytest.raises(ValueError, match="truncated"):
        decode_wav(
            _riff(
                _chunk(b"fmt ", _fmt()),
                b"data" + struct.pack("<I", 100) + b"\x00\x00",
            )
        )
    # frame misalignment: 3 bytes of 16-bit mono
    with pytest.raises(ValueError, match="multiple"):
        decode_wav(
            _riff(_chunk(b"fmt ", _fmt()), _chunk(b"data", b"\x00" * 3))
        )


def test_encoder_validates():
    with pytest.raises(ValueError, match="bits"):
        encode_wav(8000, 1, 12, b"")
    with pytest.raises(ValueError, match="channels"):
        encode_wav(8000, 0, 16, b"")
    with pytest.raises(ValueError, match="multiple"):
        encode_wav(8000, 2, 16, b"\x00\x00\x00")


def test_odd_data_pad_byte_roundtrip():
    """8-bit mono with an odd sample count: the encoder writes the
    RIFF pad byte outside the declared size; decode must return
    exactly the declared bytes."""
    samples = bytes([7, 8, 9])
    p = encode_wav(16000, 1, 8, samples)
    assert len(p) % 2 == 0
    assert decode_wav(p) == (16000, 1, 8, samples)


@settings(max_examples=20, deadline=None)
@given(
    sr=st.sampled_from([8000, 11025, 44100]),
    ch=st.integers(1, 3),
    bits=st.sampled_from([8, 16]),
    n=st.integers(1, 64),
    seed=st.integers(0, 2**31),
)
def test_roundtrip_fuzz(sr, ch, bits, n, seed):
    import numpy as np

    rng = np.random.default_rng(seed)
    if bits == 8:
        frames = rng.integers(0, 256, n * ch, dtype=np.uint8).tobytes()
    else:
        frames = rng.integers(
            -32768, 32768, n * ch, dtype=np.int64
        ).astype("<i2").tobytes()
    assert decode_wav(encode_wav(sr, ch, bits, frames)) == (
        sr,
        ch,
        bits,
        frames,
    )


# ---------------------------------------------------------------------
# r12: G.711 A-law / mu-law expansion (format tags 6/7)
# ---------------------------------------------------------------------


def test_g711_tables_match_spec_vectors():
    """Hand vectors from the G.711 segment layout, then (when the
    stdlib still ships audioop) every one of the 512 table entries
    against an independent implementation."""
    from cc2dataset_spark.operators.multimodal import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        alaw_to_linear,
        ulaw_to_linear,
    )

    # mu-law anchors: 0xFF -> 0, 0x7F -> -0, 0x00 -> -32124,
    # 0x80 -> +32124 (bias 0x84 segment expansion)
    assert ulaw_to_linear(0xFF) == 0
    assert ulaw_to_linear(0x7F) == 0
    assert ulaw_to_linear(0x00) == -32124
    assert ulaw_to_linear(0x80) == 32124
    # A-law anchors: sign bit 1 is POSITIVE in G.711 A-law
    assert alaw_to_linear(0xD5) == 8
    assert alaw_to_linear(0x55) == -8
    assert alaw_to_linear(0xAA) == 32256
    assert alaw_to_linear(0x2A) == -32256

    try:
        import audioop
    except ImportError:
        return
    import struct as _s
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        for i in range(256):
            assert _ALAW_TABLE[i] == _s.unpack(
                "<h", audioop.alaw2lin(bytes([i]), 2)
            )[0], i
            assert _ULAW_TABLE[i] == _s.unpack(
                "<h", audioop.ulaw2lin(bytes([i]), 2)
            )[0], i


def test_g711_wav_decodes_to_linear16():
    """A G.711 WAV decodes to bits=16 linear PCM through the exact
    integer tables; the 8-bit companded container round-trips every
    code value."""
    from cc2dataset_spark.operators.multimodal import (
        _ALAW_TABLE,
        _ULAW_TABLE,
    )

    codes = bytes(range(256))
    for tag, table in [(6, _ALAW_TABLE), (7, _ULAW_TABLE)]:
        payload = encode_wav(16000, 1, 8, codes, audio_fmt=tag)
        sr, ch, bits, data = decode_wav(payload)
        assert (sr, ch, bits) == (16000, 1, 16)
        assert list(struct.unpack("<256h", data)) == table
    # stereo interleave preserved
    payload = encode_wav(8000, 2, 8, bytes([0x55, 0xFF, 0xD5, 0x7F]),
                         audio_fmt=6)
    sr, ch, bits, data = decode_wav(payload)
    assert (ch, bits) == (2, 16)
    from cc2dataset_spark.operators.multimodal import alaw_to_linear

    assert list(struct.unpack("<4h", data)) == [
        alaw_to_linear(0x55), alaw_to_linear(0xFF),
        alaw_to_linear(0xD5), alaw_to_linear(0x7F),
    ]


def test_g711_declared_16bit_is_structural_damage():
    payload = _riff(
        _chunk(b"fmt ", _fmt(tag=6, bits=16)), _chunk(b"data", b"\x00\x00")
    )
    with pytest.raises(ValueError, match="8-bit"):
        decode_wav(payload)
    with pytest.raises(ValueError, match="8-bit companded"):
        encode_wav(8000, 1, 16, b"\x00\x00", audio_fmt=6)


# ---------------------------------------------------------------------
# r12: IEEE-float (tag 3) + WAVE_FORMAT_EXTENSIBLE (0xFFFE)
# ---------------------------------------------------------------------

_KSDATA = b"\x00\x00\x10\x00\x80\x00\x00\xaa\x00\x38\x9b\x71"


def _fmt_ext(sub_tag, ch=1, sr=8000, bits=16):
    ba = ch * (bits // 8)
    base = struct.pack(
        "<HHIIHH", 0xFFFE, ch, sr, sr * ba, ba, bits
    )
    ext = struct.pack("<HHI", 22, bits, 0) + struct.pack("<I", sub_tag) + _KSDATA
    return base + ext


def test_ieee_float_wav_converts_to_int16():
    import numpy as np

    vals = np.array([0.0, 1.0, -1.0, 0.5, -0.25, 2.0, -3.0], dtype="<f4")
    payload = _riff(
        _chunk(b"fmt ", _fmt(tag=3, bits=32)),
        _chunk(b"data", vals.tobytes()),
    )
    sr, ch, bits, data = decode_wav(payload)
    assert bits == 16
    got = list(struct.unpack("<7h", data))
    # clamp then *32767, round half-even: 0.5 -> 16383.5 -> 16384
    assert got == [0, 32767, -32767, 16384, -8192, 32767, -32767]
    # float64 path
    payload = _riff(
        _chunk(b"fmt ", _fmt(tag=3, bits=64)),
        _chunk(b"data", vals.astype("<f8").tobytes()),
    )
    assert decode_wav(payload)[3] == data
    # declared 16-bit float is structural damage
    bad = _riff(
        _chunk(b"fmt ", _fmt(tag=3, bits=16)), _chunk(b"data", b"\x00\x00")
    )
    with pytest.raises(ValueError, match="32/64"):
        decode_wav(bad)


def test_extensible_unwraps_subformat():
    samples = struct.pack("<4h", 1, -2, 3, -4)
    payload = _riff(
        _chunk(b"fmt ", _fmt_ext(1)), _chunk(b"data", samples)
    )
    assert decode_wav(payload) == (8000, 1, 16, samples)
    # extensible wrapping IEEE float
    import numpy as np

    fv = np.array([0.25, -0.5], dtype="<f4")
    payload = _riff(
        _chunk(b"fmt ", _fmt_ext(3, bits=32)),
        _chunk(b"data", fv.tobytes()),
    )
    sr, ch, bits, data = decode_wav(payload)
    assert struct.unpack("<2h", data) == (8192, -16384)
    # extensible wrapping G.711 a-law
    payload = _riff(
        _chunk(b"fmt ", _fmt_ext(6, bits=8)),
        _chunk(b"data", bytes([0xD5, 0x55])),
    )
    assert struct.unpack("<2h", decode_wav(payload)[3]) == (8, -8)
    # non-KSDATA GUID gates loudly
    bad_fmt = _fmt_ext(1)[:24] + struct.pack("<I", 1) + b"\x00" * 12
    payload = _riff(
        _chunk(b"fmt ", bad_fmt), _chunk(b"data", samples)
    )
    with pytest.raises(NotImplementedError, match="SubFormat"):
        decode_wav(payload)
    # extensible wrapping an unsupported tag (MP3) gates loudly
    payload = _riff(
        _chunk(b"fmt ", _fmt_ext(0x55)), _chunk(b"data", samples)
    )
    with pytest.raises(NotImplementedError, match="SubFormat tag"):
        decode_wav(payload)
    # truncated extensible fmt is structural damage
    payload = _riff(
        _chunk(b"fmt ", _fmt(tag=0xFFFE)), _chunk(b"data", samples)
    )
    with pytest.raises(ValueError, match="extensible fmt"):
        decode_wav(payload)
