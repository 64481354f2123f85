"""r13 code-review regression tests — every finding from the round's
diff review, pinned: simple prefix codes can't carry >=256 symbols
(cache/LZ77 codes force the normal path), the webp pixel row's
variant 4 really emits runs + cache hits, variant 2's mode formula
reaches all 14 predictors across the corpus, spec-violating ANIM
chunks are corrupt (not gated), and the encoder validates symbols
against the alphabet."""

import struct

import pytest

from cc2dataset_spark.operators import webp as W


def test_solid_image_with_cache_roundtrips():
    """Review #1: a solid image + color cache makes the green code a
    2-symbol set {literal g, 280+idx}; the old simple-code writer
    truncated the cache symbol to 8 bits and decoded WRONG pixels
    silently."""
    raw = bytes([10, 20, 30]) * 4
    enc = W.encode_webp_lossless(2, 2, 3, raw, cache_bits=2)
    assert W.decode_webp(enc)[3] == raw


def test_solid_image_with_rle_roundtrips():
    """Review #1 (second repro): solid + RLE makes the green set
    {literal g, 256+len_code} — previously an unparseable stream."""
    raw = bytes([10, 20, 30]) * 64
    enc = W.encode_webp_lossless(8, 8, 3, raw, use_rle=True)
    assert W.decode_webp(enc)[3] == raw
    # and the run actually compresses: far fewer bytes than literals
    lit = W.encode_webp_lossless(8, 8, 3, raw)
    assert len(enc) < len(lit) or len(lit) < 64  # both tiny is fine


def test_single_cache_symbol_normal_code():
    """A >=256 symbol alone (cache-hit-only continuation) must ride
    a one-symbol NORMAL code that decodes with 0 bits."""
    bw = W._BitWriter()
    codes = W._write_prefix_code(bw, {283}, 280 + 16)
    assert codes == {283: (0, 0)}
    pfx = W._read_prefix_code(W._BitReader(bw.payload()), 280 + 16)
    assert pfx.read(W._BitReader(b"")) == 283  # 0-bit decode


def test_write_prefix_code_validates_alphabet():
    """Review #5: the alphabet_size parameter now guards the writer."""
    bw = W._BitWriter()
    with pytest.raises(ValueError, match="outside alphabet"):
        W._write_prefix_code(bw, {300}, 280)


def _variant4_tokens(d):
    """Replicate the writer's token pass over the variant-4 fixture
    class to prove the stream carries runs AND cache hits."""
    w, h = d % 11 + 2, d % 8 + 2
    cache_bits = 3
    px = []
    for p in range(w * h):
        r, g, b = (
            (d * 13 + ((p // 6) % 3) * 37 + c * 41) % 256 for c in range(3)
        )
        px.append((0xFF << 24) | (r << 16) | (g << 8) | b)
    cache = [None] * (1 << cache_bits)
    kinds = []
    i = 0
    while i < len(px):
        v = px[i]
        if i > 0 and v == px[i - 1]:
            run = 1
            while i + run < len(px) and px[i + run] == v and run < 4096:
                run += 1
            kinds.append("copy")
            cache[W._cache_index(v, cache_bits)] = v
            i += run
            continue
        ci = W._cache_index(v, cache_bits)
        if cache[ci] == v:
            kinds.append("cache")
            i += 1
            continue
        cache[ci] = v
        kinds.append("lit")
        i += 1
    return kinds


def test_variant4_fixture_really_exercises_cache_and_rle():
    """Review #2: the rebuilt variant-4 pixel class emits both copy
    (LZ77 run) and cache-hit tokens for most docs — the driver row
    proves the paths its docstring claims."""
    with_copy = with_cache = 0
    docs = [d for d in range(4, 300) if d % 6 == 4]
    for d in docs:
        kinds = _variant4_tokens(d)
        with_copy += "copy" in kinds
        with_cache += "cache" in kinds
    assert with_copy == len(docs)  # every doc has runs
    assert with_cache > len(docs) * 0.5  # most docs hit the cache
    # and the real encoder agrees with the decoder on this class
    d = 10  # d % 6 == 4
    w, h = d % 11 + 2, d % 8 + 2
    raw = bytes(
        (d * 13 + ((p // 6) % 3) * 37 + c * 41) % 256
        for p in range(w * h)
        for c in range(3)
    )
    enc = W.encode_webp_lossless(w, h, 3, raw, cache_bits=3, use_rle=True)
    assert W.decode_webp(enc)[3] == raw


def test_variant2_mode_formula_covers_all_14():
    """Review #3: across the corpus the per-doc block-mode formula
    (bx*5 + by*7 + d) % 14 reaches every predictor mode (a 3x3 block
    grid alone caps bx+by at 4)."""
    modes = set()
    for d in range(84):
        for bx in range(3):
            for by in range(3):
                modes.add((bx * 5 + by * 7 + d) % 14)
    assert modes == set(range(14))


def test_anim_chunk_without_vp8x_is_corrupt():
    """Review #4: an ANIM/ANMF chunk in a container that did not
    declare animation via VP8X is spec-violating damage — ValueError
    (status 'corrupt'), never the lossy 'gated' class."""
    body = b"\x00" * 6
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
        + b"ANIM" + struct.pack("<I", len(body)) + body
    )
    with pytest.raises(ValueError, match="non-animated"):
        W.decode_webp(payload)


def test_anim_chunk_without_vp8x_status_corrupt(spark):
    from pyspark.sql import types as ST

    from cc2dataset_spark.operators import multimodal as MM

    body = b"\x00" * 6
    payload = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(body)) + b"WEBP"
        + b"ANIM" + struct.pack("<I", len(body)) + body
    )
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
    df = spark.createDataFrame(
        [(1, payload, ("webp", len(payload), 1))], schema
    )
    [row] = MM.decode_media(df, errors="status").collect()
    assert row.status == "corrupt"
