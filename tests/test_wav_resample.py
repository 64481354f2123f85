"""Exact-integer audio resample tests (r13): resample_pcm16 hand
vectors + properties, and the resample_audio operator surface
(schema, X7 containment, the multi-channel/width gates)."""

import numpy as np
import pytest

from cc2dataset_spark.operators import multimodal as MM


def _pcm(vals):
    return np.array(vals, dtype="<i2").tobytes()


def test_identity_and_empty():
    s = _pcm([0, 1000, -2000, 32767, -32768])
    assert MM.resample_pcm16(s, 8000, 8000) == s
    assert MM.resample_pcm16(b"", 8000, 16000) == b""


def test_2x_upsample_exact_midpoints():
    ramp = _pcm(range(0, 1000, 100))
    out = np.frombuffer(MM.resample_pcm16(ramp, 8000, 16000), "<i2")
    # even outputs are the sources, odd outputs the exact midpoints;
    # the final sample clamps to the last input
    assert list(out[:6]) == [0, 50, 100, 150, 200, 250]
    assert out[-1] == 900 and len(out) == 20


def test_downsample_picks_exact_positions():
    """8000 -> 4000: every second sample, no interpolation (fr=0)."""
    s = _pcm([10, 20, 30, 40, 50, 60])
    out = np.frombuffer(MM.resample_pcm16(s, 8000, 4000), "<i2")
    assert list(out) == [10, 30, 50]


def test_irrational_ratio_formula_hand_vector():
    """8000 -> 11025, k=1: pos = 8000, i = 0, fr = 8000;
    out_u = (u0*3025 + u1*8000) // 11025."""
    s = _pcm([-32768, 32767])
    out = np.frombuffer(MM.resample_pcm16(s, 8000, 11025), "<i2")
    u0, u1 = 0, 65535
    expect_u = (u0 * (11025 - 8000) + u1 * 8000) // 11025
    assert out[1] == expect_u - 32768
    assert len(out) == (2 * 11025) // 8000


def test_validation():
    with pytest.raises(ValueError, match="positive"):
        MM.resample_pcm16(b"\x00\x00", 0, 8000)
    with pytest.raises(ValueError, match="odd byte"):
        MM.resample_pcm16(b"\x00\x00\x00", 8000, 16000)


def _audio_df(spark, rows):
    from pyspark.sql import types as ST

    schema = ST.StructType(
        [
            ST.StructField("doc_id", ST.LongType()),
            ST.StructField("payload", ST.BinaryType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def test_resample_audio_operator(spark):
    """The operator decodes any decode_wav class, resamples, and
    re-encodes; G.711 payloads expand first; stereo and non-16-bit
    gate; corrupt payloads contain in status mode."""
    s = (np.arange(400, dtype=np.int64) * 137 % 65536 - 32768).astype(
        "<i2"
    )
    good = MM.encode_wav(8000, 1, 16, s.tobytes())
    stereo = MM.encode_wav(8000, 2, 16, s.tobytes())
    corrupt = good[:16]
    df = _audio_df(spark, [(1, good), (2, stereo), (3, corrupt)])
    got = {
        r.doc_id: r
        for r in MM.resample_audio(
            df, target_rate=16000, errors="status"
        ).collect()
    }
    ok = got[1]
    assert (ok.status, ok.src_rate, ok.dst_rate) == ("ok", 8000, 16000)
    assert (ok.n_in, ok.n_out) == (400, 800)
    sr, ch, bits, frames = MM.decode_wav(bytes(ok.payload))
    assert (sr, ch, bits) == (16000, 1, 16)
    assert frames == MM.resample_pcm16(s.tobytes(), 8000, 16000)
    assert got[2].status == "gated"  # stereo: down-mix is policy
    assert got[3].status == "corrupt"
    # raise mode fails the stage on the first bad payload
    with pytest.raises(Exception):
        MM.resample_audio(df, target_rate=16000).collect()
    # skip mode drops them
    kept = MM.resample_audio(df, target_rate=16000, errors="skip").collect()
    assert [r.doc_id for r in kept] == [1]
