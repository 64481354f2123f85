"""r13 ADVICE regression tests (all three findings):

1. (medium) decode_media(errors="status") must VALIDATE animation
   pixel data — a corrupt-LZW frame 2 is status="corrupt", never
   "ok", so a downstream sample_frames over the status output can
   no longer be killed by a payload that passed the gate.
2. (low) GIF width/height semantics are uniform: decode_media
   reports LOGICAL-SCREEN dims for every GIF — single-frame,
   sub-rectangle single-frame, and animation alike (decode_gif
   keeps frame-local pixels + its sub-rectangle gate for pixel
   consumers).
3. (low) A GIF payload truncated after the last frame's data
   sub-blocks (no 0x3B trailer) raises ValueError from all three
   walkers: gif_frame_count, decode_gif, decode_gif_frames.
"""

import pytest

from cc2dataset_spark.operators import multimodal as MM

PAL = [(j * 11 % 256, j * 7 % 256, j * 3 % 256) for j in range(4)]


def _anim_2frames() -> bytes:
    return MM.encode_gif_animation(
        6,
        4,
        PAL,
        [
            {"w": 6, "h": 4, "indices": bytes(p % 4 for p in range(24))},
            {
                "left": 2,
                "top": 1,
                "w": 3,
                "h": 2,
                "indices": bytes((p + 1) % 4 for p in range(6)),
                "disposal": 2,
            },
        ],
    )


def _walk_descriptor_offsets(p: bytes) -> list:
    """Structural walk (test-local) returning each 0x2C offset."""
    pos = 13
    if p[10] & 0x80:
        pos += 3 * (1 << ((p[10] & 7) + 1))
    out = []
    while pos < len(p):
        b = p[pos]
        if b == 0x3B:
            break
        if b == 0x21:
            pos += 2
            while p[pos] != 0:
                pos += 1 + p[pos]
            pos += 1
            continue
        assert b == 0x2C
        out.append(pos)
        ip = p[pos + 9]
        pos += 10
        if ip & 0x80:
            pos += 3 * (1 << ((ip & 7) + 1))
        pos += 1
        while p[pos] != 0:
            pos += 1 + p[pos]
        pos += 1
    return out


def _corrupt_frame2(anim: bytes) -> bytes:
    """Flip frame 2's first LZW data byte so its stream ends early;
    the descriptor walk still reads clean structure."""
    descs = _walk_descriptor_offsets(anim)
    off = descs[1] + 10 + 1 + 1  # descriptor + mcs + sub-block len
    corrupt = bytearray(anim)
    corrupt[off] = (anim[off] + 1) % 256
    return bytes(corrupt)


def test_corrupt_animation_pixel_data_still_walks():
    """Precondition of the advisory repro: the descriptor walk alone
    cannot see frame-2 LZW damage (that is WHY decode_media must
    decode pixels before saying ok)."""
    c = _corrupt_frame2(_anim_2frames())
    assert MM.gif_frame_count(c) == (6, 4, 2)
    with pytest.raises(ValueError):
        MM.decode_gif_frames(c)


def _media_df(spark, payload: bytes, fmt: str = "gif"):
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
        [(1, payload, (fmt, len(payload), 1))], schema
    )


def test_status_gate_rejects_corrupt_animation(spark):
    """ADVICE #1 (medium): a corrupt-LZW animation must be
    status="corrupt" out of decode_media(errors="status"), and
    sample_frames over that output must compose (skip the row),
    not die."""
    df = _media_df(spark, _corrupt_frame2(_anim_2frames()))
    [row] = MM.decode_media(df, errors="status").collect()
    assert row.status == "corrupt"
    assert row.n_frames is None
    # containment must survive composition: the gated row samples to
    # nothing instead of raising inside the Arrow kernel
    decoded = MM.decode_media(df, errors="status")
    assert (
        MM.sample_frames(
            decoded.join(df.select("doc_id", "payload"), "doc_id")
        ).count()
        == 0
    )


def test_status_gate_ok_animation_really_decodes(spark):
    """The flip side: a CLEAN animation is ok with screen dims and
    the real frame count, and sample_frames yields frames."""
    anim = _anim_2frames()
    df = _media_df(spark, anim)
    [row] = MM.decode_media(df, errors="status").collect()
    assert (row.width, row.height, row.n_frames, row.status) == (
        6,
        4,
        2,
        "ok",
    )
    decoded = MM.decode_media(df, errors="status")
    frames = MM.sample_frames(
        decoded.join(df.select("doc_id", "payload"), "doc_id"), every_k=1
    ).collect()
    assert len(frames) == 2
    for f in frames:
        w, h, ch, _raw = MM.decode_png(bytes(f.frame_payload))
        assert (w, h, ch) == (6, 4, 3)


def test_decode_media_subrect_single_frame_screen_dims(spark):
    """ADVICE #2 (low): a single sub-rectangle frame reports the
    LOGICAL SCREEN dims through decode_media (the compositor draws
    it onto the background canvas); decode_gif keeps its
    sub-rectangle gate for pixel consumers."""
    sub = MM.encode_gif_animation(
        8,
        5,
        PAL,
        [
            {
                "left": 2,
                "top": 1,
                "w": 3,
                "h": 2,
                "indices": bytes([1, 2, 3, 0, 1, 2]),
            }
        ],
    )
    with pytest.raises(NotImplementedError, match="sub-rectangle"):
        MM.decode_gif(sub)
    [row] = MM.decode_media(_media_df(spark, sub)).collect()
    assert (row.width, row.height, row.n_frames) == (8, 5, 1)


def test_decode_media_full_frame_gif_unchanged(spark):
    """Routing GIFs through the compositor must not move the dims of
    the ordinary full-frame single-image class."""
    g = MM.encode_gif(5, 3, PAL, bytes(p % 4 for p in range(15)))
    [row] = MM.decode_media(_media_df(spark, g)).collect()
    assert (row.width, row.height, row.n_frames) == (5, 3, 1)


@pytest.mark.parametrize(
    "fn", [MM.gif_frame_count, MM.decode_gif, MM.decode_gif_frames]
)
def test_missing_trailer_raises(fn):
    """ADVICE #3 (low): truncation after the last frame's terminated
    sub-blocks — structurally complete frames, no 0x3B — raises."""
    g = MM.encode_gif(5, 3, PAL, bytes(p % 4 for p in range(15)))
    assert g[-1] == 0x3B
    fn(g)  # intact payload decodes
    with pytest.raises(ValueError, match="missing trailer"):
        fn(g[:-1])
