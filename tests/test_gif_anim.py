"""Multi-frame GIF decode with real compositing (r12 —
decode_gif_frames/encode_gif_animation): hand-computed disposal /
transparency / sub-rectangle vectors, equivalence with the
single-frame decoder, and a fuzz pass against an independent
per-pixel reference compositor."""

import numpy as np
import pytest

from cc2dataset_spark.operators.multimodal import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_animation,
)

PAL = [(0, 0, 0), (10, 10, 10), (20, 20, 20), (30, 30, 30)]


def _rgb(idx_rows):
    return b"".join(bytes(PAL[i]) for row in idx_rows for i in row)


def test_single_full_frame_matches_decode_gif():
    idx = bytes([1, 2, 3, 0, 1, 2])
    anim = encode_gif_animation(3, 2, PAL, [{"w": 3, "h": 2, "indices": idx}])
    sw, sh, frames = decode_gif_frames(anim)
    assert (sw, sh, len(frames)) == (3, 2, 1)
    single = encode_gif(3, 2, PAL, idx)
    assert frames[0] == decode_gif(single)[3]


def test_compositing_transparency_and_disposal2():
    """3x2 screen: full base frame (disposal 1), then a 2x1 rect at
    (1,0) with one transparent pixel and disposal 2, then a top-row
    frame — every canvas hand-computed."""
    f1 = {"w": 3, "h": 2, "indices": bytes([1, 2, 3, 0, 1, 2]),
          "disposal": 1}
    # rect left=1, top=0, 2x1: draws 3 at (0,1); (0,2) transparent
    f2 = {"left": 1, "top": 0, "w": 2, "h": 1,
          "indices": bytes([3, 2]), "transparent": 2, "disposal": 2}
    # top row redraw after disposal-2 cleared f2's rect to bg (idx 0)
    f3 = {"w": 3, "h": 1, "indices": bytes([2, 0, 1])}
    sw, sh, frames = decode_gif_frames(
        encode_gif_animation(3, 2, PAL, [f1, f2, f3])
    )
    assert len(frames) == 3
    assert frames[0] == _rgb([[1, 2, 3], [0, 1, 2]])
    # f2: (0,1) -> 3; (0,2) stays 3 (transparent skip)
    assert frames[1] == _rgb([[1, 3, 3], [0, 1, 2]])
    # disposal 2 cleared (0,1),(0,2) to bg 0, then f3 drew the top row
    assert frames[2] == _rgb([[2, 0, 1], [0, 1, 2]])


def test_disposal3_restores_previous():
    f1 = {"w": 2, "h": 2, "indices": bytes([1, 1, 1, 1]), "disposal": 1}
    f2 = {"left": 0, "top": 0, "w": 2, "h": 1,
          "indices": bytes([3, 3]), "disposal": 3}
    f3 = {"left": 1, "top": 1, "w": 1, "h": 1, "indices": bytes([2])}
    _, _, frames = decode_gif_frames(
        encode_gif_animation(2, 2, PAL, [f1, f2, f3])
    )
    assert frames[0] == _rgb([[1, 1], [1, 1]])
    assert frames[1] == _rgb([[3, 3], [1, 1]])
    # disposal 3 reverted f2 entirely before f3 drew (1,1)
    assert frames[2] == _rgb([[1, 1], [1, 2]])


def test_interlaced_subframe_and_bounds():
    base = {"w": 3, "h": 3, "indices": bytes([0] * 9)}
    inter = {"left": 0, "top": 0, "w": 3, "h": 3,
             "indices": bytes([1, 2, 3] * 3), "interlace": True}
    _, _, frames = decode_gif_frames(
        encode_gif_animation(3, 3, PAL, [base, inter])
    )
    assert frames[1] == _rgb([[1, 2, 3]] * 3)
    with pytest.raises(ValueError, match="outside"):
        encode_gif_animation(
            2, 2, PAL, [{"left": 1, "top": 0, "w": 2, "h": 1,
                         "indices": bytes(2)}]
        )


def _reference_composite(sw, sh, bg_idx, frames):
    """Independent per-pixel compositor (dicts + loops, no numpy)."""
    canvas = [[PAL[bg_idx]] * sw for _ in range(sh)]
    out = []
    for fr in frames:
        left, top = fr.get("left", 0), fr.get("top", 0)
        w, h = fr["w"], fr["h"]
        trans = fr.get("transparent")
        before = [row[:] for row in canvas]
        for r in range(h):
            for c in range(w):
                i = fr["indices"][r * w + c]
                if trans is not None and i == trans:
                    continue
                canvas[top + r][left + c] = PAL[i]
        out.append(
            b"".join(bytes(px) for row in canvas for px in row)
        )
        d = fr.get("disposal", 0)
        if d == 2:
            for r in range(h):
                for c in range(w):
                    canvas[top + r][left + c] = PAL[bg_idx]
        elif d == 3:
            canvas = before
    return out


def test_fuzz_against_reference_compositor():
    import random

    rng = random.Random(12)
    for trial in range(30):
        sw, sh = rng.randint(2, 6), rng.randint(2, 6)
        frames = []
        for _ in range(rng.randint(1, 4)):
            w = rng.randint(1, sw)
            h = rng.randint(1, sh)
            left = rng.randint(0, sw - w)
            top = rng.randint(0, sh - h)
            frames.append(
                {
                    "left": left, "top": top, "w": w, "h": h,
                    "indices": bytes(
                        rng.randrange(4) for _ in range(w * h)
                    ),
                    "disposal": rng.choice([0, 1, 2, 3]),
                    "transparent": rng.choice([None, 0, 2]),
                    "interlace": rng.random() < 0.3,
                }
            )
        payload = encode_gif_animation(sw, sh, PAL, frames)
        got = decode_gif_frames(payload)
        want = _reference_composite(sw, sh, 0, frames)
        assert got[0] == sw and got[1] == sh
        assert got[2] == want, (trial, frames)


def test_sample_frames_real_for_animations(spark):
    """r12: sample_frames emits REAL PNG-encoded composited canvases
    for animated GIFs (every k-th frame), stub slices otherwise."""
    from pyspark.sql import functions as F

    from cc2dataset_spark.operators.multimodal import (
        decode_media,
        decode_png,
        sample_frames,
    )

    frames = [
        {"w": 2, "h": 2, "indices": bytes([1, 2, 3, 0]), "disposal": 1},
        {"left": 0, "top": 0, "w": 1, "h": 1, "indices": bytes([3])},
        {"w": 2, "h": 2, "indices": bytes([0, 0, 1, 1])},
    ]
    anim = encode_gif_animation(2, 2, PAL, frames)
    txt = b"not media at all"
    df = spark.createDataFrame(
        [(1, anim, "gif"), (2, txt, "webm")],
        "doc_id long, payload binary, fmt string",
    ).select(
        "doc_id",
        "payload",
        F.struct(
            F.col("fmt").alias("format"),
            F.length("payload").cast("long").alias("n_bytes"),
            F.col("doc_id").alias("source_id"),
        ).alias("meta"),
    )
    decoded = decode_media(df).join(
        df.select("doc_id", "payload"), "doc_id"
    )
    out = sample_frames(decoded, every_k=2).collect()
    got = {(r.doc_id, r.frame_idx): bytes(r.frame_payload) for r in out}
    # animation: frames 0 and 2 sampled, payloads are decodable PNGs
    # equal to the composited canvases
    want = _reference_composite(2, 2, 0, frames)
    assert decode_png(got[(1, 0)]) == (2, 2, 3, want[0])
    assert decode_png(got[(1, 2)]) == (2, 2, 3, want[2])
    assert (1, 1) not in got
    # stub path unchanged for non-media payloads
    stub_keys = [k for k in got if k[0] == 2]
    assert stub_keys and all(
        got[k] == txt[k[1] : k[1] + 16] for k in stub_keys
    )
