"""JPEG codec in pure Python + numpy (r10 baseline, r12 progressive)
— narrows the last media-decode gate without any codec library.

Scope (honest): sequential DCT (SOF0/SOF1) AND progressive (SOF2,
r12 — T.81 Annex G spectral selection + successive approximation,
the web's second-most-common JPEG class), 8-bit, Huffman entropy
coding, greyscale or YCbCr at sampling factors 1 or 2 per axis —
4:4:4, 4:2:2, 4:4:0, and the web-typical 4:2:0 (r11; chroma
upsampled by replication, the decode-side inverse of the encoder's
box average — exact wherever chroma is constant per sampling cell,
which is the analytically-pinned class; T.81 leaves the upsampling
filter decoder-defined, so byte-exactness across decoders has no
spec meaning for subsampled files and the contract is a bound) —
optional restart markers, interleaved or non-interleaved
(multi-scan) scan organization (r12). Arithmetic coding (SOF9/10),
hierarchical/lossless modes, sampling factors > 2, and 12-bit raise
``NotImplementedError`` — real gates, never silent wrong answers.
This covers the encoder's own output classes end-to-end plus
externally produced sequential AND progressive files at the common
sampling grids.

Progressive proof strategy: :func:`encode_jpeg_scans` shares the
per-block coefficient math with the baseline encoder, so a
progressive round trip must decode to the baseline round trip's
pixels BIT-FOR-BIT (scan organization cannot change values);
decoder-only paths our capped encoder can't emit (EOBn spanning
blocks) are pinned by hand-built spec vectors with custom DHT
tables in the tests.

Why this is testable without a reference library (the PNG-codec
problem, solved the same way): the decoder is pinned by
(1) ANALYTIC vectors — a solid-colour block must decode EXACTLY
(its DCT has one coefficient, no rounding chain); (2) a slow
explicit double-sum IDCT in the tests, independent of the production
matrix-form IDCT; (3) round-trip error BOUNDS with flat quant=1
tables (the only loss is coefficient rounding, so |err| is provably
small); (4) marker-level hand checks (byte stuffing, restart
intervals, EXTEND sign logic hit by construction). JPEG is lossy, so
unlike PNG the contract is a bound, not byte equality — which is why
this ships as a library operator with pytest proof rather than an
oracle-hashed catalog query (a float IDCT replayed in two engines
has no cross-engine exactness story; the catalog's oracle-proven
image path is the PNG codec).

Tables: the standard Annex K Huffman tables and zigzag order —
public constants from ITU T.81.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU T.81 Figure A.6 zigzag order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K.3 typical Huffman tables: (BITS counts per length 1..16, values)
_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31,
        0x41, 0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32,
        0x81, 0x91, 0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52,
        0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28, 0x29, 0x2A,
        0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57,
        0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x83,
        0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93, 0x94,
        0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8,
        0xD9, 0xDA, 0xE1, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8,
        0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
_AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 119],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06,
        0x12, 0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81,
        0x08, 0x14, 0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33,
        0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56,
        0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79, 0x7A,
        0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92,
        0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6,
        0xD7, 0xD8, 0xD9, 0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7,
        0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal DCT-II basis: C[u, x] = a(u) * cos((2x+1) u pi / 16),
# a(0)=sqrt(1/8), a(u>0)=sqrt(2/8). block_dct = C @ p @ C.T; inverse
# is C.T @ G @ C (C is orthogonal).
_C = np.zeros((8, 8))
for _u in range(8):
    _a = np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
    for _x in range(8):
        _C[_u, _x] = _a * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(bits: list[int], values: list[int]):
    """(code, length) per symbol from the BITS/HUFFVAL spec lists —
    ITU T.81 Annex C code generation."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-pad per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise ValueError("JPEG: truncated entropy stream")
        b = self.data[self.pos]
        self.pos += 1
        if b == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("JPEG: truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed byte
            else:
                raise ValueError(
                    f"JPEG: unexpected marker 0xFF{nxt:02X} in scan"
                )
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_restart(self) -> None:
        """Drop partial byte and consume an RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 2
        else:
            raise ValueError("JPEG: expected restart marker")


def _extend(v: int, t: int) -> int:
    """ITU T.81 F.12: map the t-bit magnitude code to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


class _HuffDecoder:
    """code -> symbol via (length, code) lookup — small tables, and
    entropy decode here is test/fixture-scale by design."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup = {
            (length, code): sym
            for sym, (code, length) in _canonical_codes(
                bits, values
            ).items()
        }
        self.maxlen = max(length for (length, _) in self.lookup)

    def decode(self, r: _BitReader) -> int:
        code = 0
        for length in range(1, self.maxlen + 1):
            code = (code << 1) | r.bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("JPEG: invalid Huffman code")


def _rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = ycc[..., 0], ycc[..., 1] - 128.0, ycc[..., 2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.stack([r, g, b], axis=-1)


_SAMPLING = {"444": (1, 1), "422": (2, 1), "440": (1, 2), "420": (2, 2)}


def encode_jpeg(
    width: int,
    height: int,
    channels: int,
    raw: bytes,
    quant: int = 1,
    restart_interval: int = 0,
    sampling: str = "444",
) -> bytes:
    """Baseline JFIF encoder — greyscale (1ch) or RGB (3ch, coded as
    YCbCr), flat quantization table of ``quant`` (1 = near-lossless:
    the only loss is coefficient rounding), standard Annex K Huffman
    tables, optional restart interval (in MCUs). ``sampling`` picks
    the chroma grid for 3-channel input: "444" (no subsampling),
    "422", "440", or "420" (box-average chroma downsampling; the
    luma component carries the corresponding sampling factors)."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in [1, 255]")
    if sampling not in _SAMPLING:
        raise ValueError(
            f"sampling must be one of {sorted(_SAMPLING)}, got "
            f"{sampling!r}"
        )
    hmax, vmax = _SAMPLING[sampling] if channels == 3 else (1, 1)
    px = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
    if px.size != width * height * channels:
        raise ValueError(
            f"raw has {px.size} bytes, expected {width * height * channels}"
        )
    px = px.reshape(height, width, channels)
    if channels == 1:
        planes = [px[..., 0]]
        factors = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., 0]]
        factors = [(hmax, vmax)]
        for c in (1, 2):
            p = ycc[..., c]
            if (hmax, vmax) != (1, 1):
                # box-average downsample with edge-replicate padding
                ph = -(-height // vmax) * vmax
                pw = -(-width // hmax) * hmax
                pad = np.pad(
                    p,
                    ((0, ph - height), (0, pw - width)),
                    mode="edge",
                )
                p = pad.reshape(
                    ph // vmax, vmax, pw // hmax, hmax
                ).mean(axis=(1, 3))
            planes.append(p)
            factors.append((1, 1))
    qtab = np.full(64, quant, dtype=np.int64)

    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    w = _BitWriter()
    pred = [0] * channels
    mcu_rows = -(-height // (8 * vmax))
    mcu_cols = -(-width // (8 * hmax))
    out_chunks = []
    mcu_count = 0
    rst = 0
    for by in range(mcu_rows):
        for bx in range(mcu_cols):
            if (
                restart_interval
                and mcu_count
                and mcu_count % restart_interval == 0
            ):
                out_chunks.append(w.flush())
                out_chunks.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                w = _BitWriter()
                pred = [0] * channels
            for ci, plane in enumerate(planes):
                h_i, v_i = factors[ci]
                ph, pw = plane.shape
                tid = 0 if ci == 0 else 1
                for v in range(v_i):
                    for hh in range(h_i):
                        # edge-replicate pad within the plane
                        y0 = (by * v_i + v) * 8
                        x0 = (bx * h_i + hh) * 8
                        ys = np.clip(np.arange(y0, y0 + 8), 0, ph - 1)
                        xs = np.clip(np.arange(x0, x0 + 8), 0, pw - 1)
                        block = plane[np.ix_(ys, xs)] - 128.0
                        coef = _C @ block @ _C.T
                        q = np.round(
                            coef.ravel()[ZIGZAG] / qtab
                        ).astype(np.int64)
                        # DC
                        diff = int(q[0]) - pred[ci]
                        pred[ci] = int(q[0])
                        t = _category(diff)
                        code, ln = dc_codes[tid][t]
                        w.write(code, ln)
                        if t:
                            w.write(
                                diff
                                if diff >= 0
                                else diff + (1 << t) - 1,
                                t,
                            )
                        # AC
                        run = 0
                        for k in range(1, 64):
                            v_ac = int(q[k])
                            if v_ac == 0:
                                run += 1
                                continue
                            while run > 15:
                                code, ln = ac_codes[tid][0xF0]  # ZRL
                                w.write(code, ln)
                                run -= 16
                            t = _category(v_ac)
                            code, ln = ac_codes[tid][(run << 4) | t]
                            w.write(code, ln)
                            w.write(
                                v_ac
                                if v_ac >= 0
                                else v_ac + (1 << t) - 1,
                                t,
                            )
                            run = 0
                        if run:
                            code, ln = ac_codes[tid][0x00]  # EOB
                            w.write(code, ln)
            mcu_count += 1
    out_chunks.append(w.flush())
    scan = b"".join(out_chunks)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    parts = [b"\xff\xd8"]  # SOI
    parts.append(
        seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    )
    # flat table, so zigzag vs natural storage order is immaterial
    qbytes = bytes([quant] * 64)
    parts.append(seg(0xFFDB, bytes([0]) + qbytes))
    if channels == 3:
        parts.append(seg(0xFFDB, bytes([1]) + qbytes))
    if restart_interval:
        parts.append(seg(0xFFDD, struct.pack(">H", restart_interval)))
    comp = b"".join(
        bytes(
            [
                i + 1,
                (factors[i][0] << 4) | factors[i][1],
                0 if i == 0 else 1,
            ]
        )
        for i in range(channels)
    )
    parts.append(
        seg(
            0xFFC0,
            struct.pack(">BHHB", 8, height, width, channels) + comp,
        )
    )
    for tid, (cls, tbl) in enumerate(
        [(0, _DC_LUMA), (1, _AC_LUMA)]
        + ([(0, _DC_CHROMA), (1, _AC_CHROMA)] if channels == 3 else [])
    ):
        tc = cls
        th = 0 if tid < 2 else 1
        parts.append(
            seg(
                0xFFC4,
                bytes([(tc << 4) | th]) + bytes(tbl[0]) + bytes(tbl[1]),
            )
        )
    sos_comp = b"".join(
        bytes([i + 1, (0 if i == 0 else 1) * 0x11]) for i in range(channels)
    )
    parts.append(
        seg(0xFFDA, bytes([channels]) + sos_comp + bytes([0, 63, 0]))
    )
    parts.append(scan)
    parts.append(b"\xff\xd9")  # EOI
    return b"".join(parts)


def _component_coefs(
    width: int,
    height: int,
    channels: int,
    raw: bytes,
    quant: int,
    sampling: str,
) -> tuple[list[np.ndarray], list[tuple[int, int]], int, int]:
    """Quantized zigzag DCT coefficients per component — the shared
    front half of every encoder flavor. Returns (coef arrays of shape
    (blocks_v, blocks_h, 64), sampling factors, mcu_rows, mcu_cols).
    Identical per-block float math to :func:`encode_jpeg` (same DCT,
    same rounding), so scan organization cannot change values."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in [1, 255]")
    if sampling not in _SAMPLING:
        raise ValueError(
            f"sampling must be one of {sorted(_SAMPLING)}, got "
            f"{sampling!r}"
        )
    hmax, vmax = _SAMPLING[sampling] if channels == 3 else (1, 1)
    px = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
    if px.size != width * height * channels:
        raise ValueError(
            f"raw has {px.size} bytes, expected {width * height * channels}"
        )
    px = px.reshape(height, width, channels)
    if channels == 1:
        planes = [px[..., 0]]
        factors = [(1, 1)]
    else:
        ycc = _rgb_to_ycbcr(px)
        planes = [ycc[..., 0]]
        factors = [(hmax, vmax)]
        for c in (1, 2):
            p = ycc[..., c]
            if (hmax, vmax) != (1, 1):
                ph = -(-height // vmax) * vmax
                pw = -(-width // hmax) * hmax
                pad = np.pad(
                    p, ((0, ph - height), (0, pw - width)), mode="edge"
                )
                p = pad.reshape(
                    ph // vmax, vmax, pw // hmax, hmax
                ).mean(axis=(1, 3))
            planes.append(p)
            factors.append((1, 1))
    qtab = np.full(64, quant, dtype=np.int64)
    mcu_rows = -(-height // (8 * vmax))
    mcu_cols = -(-width // (8 * hmax))
    coefs = []
    for ci, plane in enumerate(planes):
        h_i, v_i = factors[ci]
        bv, bh = mcu_rows * v_i, mcu_cols * h_i
        arr = np.zeros((bv, bh, 64), dtype=np.int64)
        ph, pw = plane.shape
        for by in range(bv):
            for bx in range(bh):
                ys = np.clip(np.arange(by * 8, by * 8 + 8), 0, ph - 1)
                xs = np.clip(np.arange(bx * 8, bx * 8 + 8), 0, pw - 1)
                block = plane[np.ix_(ys, xs)] - 128.0
                coef = _C @ block @ _C.T
                arr[by, bx] = np.round(
                    coef.ravel()[ZIGZAG] / qtab
                ).astype(np.int64)
        coefs.append(arr)
    return coefs, factors, mcu_rows, mcu_cols


class _ScanEmitter:
    """Entropy emission for one progressive/sequential scan — the
    jcphuff shape: EOB-run accumulation with buffered correction
    bits, flushed before any other symbol."""

    def __init__(self, w: "_BitWriter", ac_codes: dict | None):
        self.w = w
        self.ac = ac_codes
        self.eobrun = 0
        self.pending: list[int] = []  # correction bits riding the EOB run
        # The Annex K tables carry no EOBn symbols beyond EOB0
        # ((r<<4)|0 for r>=1 is absent), so with these tables every
        # block's EOB flushes immediately — less compression, always
        # legal. A custom-DHT encoder would raise this toward the
        # spec cap 0x7FFF; the DECODER handles any EOBn (spec-vector
        # tested with a hand-built table).
        self.max_eobrun = 1

    def emit_sym(self, codes: dict, sym: int) -> None:
        code, ln = codes[sym]
        self.w.write(code, ln)

    def emit_signed(self, v: int, t: int) -> None:
        self.w.write(v if v >= 0 else v + (1 << t) - 1, t)

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            t = self.eobrun.bit_length() - 1
            self.emit_sym(self.ac, t << 4)
            if t:
                self.w.write(self.eobrun - (1 << t), t)
            self.eobrun = 0
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []

    def bump_eobrun(self, block_bits: list[int]) -> None:
        self.eobrun += 1
        self.pending.extend(block_bits)
        if self.eobrun >= self.max_eobrun:
            self.flush_eobrun()


def _emit_ac_first(
    em: _ScanEmitter, coefz: np.ndarray, ss: int, se: int, al: int
) -> None:
    run = 0
    for k in range(ss, se + 1):
        v = int(coefz[k])
        t = (v if v >= 0 else -v) >> al
        if t == 0:
            run += 1
            continue
        em.flush_eobrun()
        while run > 15:
            em.emit_sym(em.ac, 0xF0)
            run -= 16
        s = t.bit_length()
        em.emit_sym(em.ac, (run << 4) | s)
        em.emit_signed(t if v >= 0 else -t, s)
        run = 0
    if run > 0:
        em.bump_eobrun([])


def _emit_ac_refine(
    em: _ScanEmitter, coefz: np.ndarray, ss: int, se: int, al: int
) -> None:
    absv = [
        (abs(int(coefz[k])) >> al) for k in range(ss, se + 1)
    ]
    eob = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob = ss + i
    run = 0
    br: list[int] = []  # this block's correction bits
    for k in range(ss, se + 1):
        t = absv[k - ss]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:
            em.flush_eobrun()
            em.emit_sym(em.ac, 0xF0)
            run -= 16
            for b in br:
                em.w.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        em.flush_eobrun()
        em.emit_sym(em.ac, (run << 4) | 1)
        em.w.write(1 if int(coefz[k]) >= 0 else 0, 1)
        for b in br:
            em.w.write(b, 1)
        br = []
        run = 0
    if run > 0 or br:
        em.bump_eobrun(br)


def encode_jpeg_scans(
    width: int,
    height: int,
    channels: int,
    raw: bytes,
    scans: list[tuple[list[int], int, int, int, int]],
    quant: int = 1,
    sampling: str = "444",
    progressive: bool = True,
) -> bytes:
    """Scan-script JPEG encoder (r12): emits SOF2 (progressive) or
    SOF0 (sequential) with an explicit scan list of
    ``(component_indices, Ss, Se, Ah, Al)`` entries — the encoder
    twin the progressive decoder is pinned against, plus the way to
    produce legal NON-interleaved sequential files (several full-band
    single-component scans). Uses the Annex K Huffman tables and a
    flat quant table like :func:`encode_jpeg`; per-block coefficient
    math is shared (:func:`_component_coefs`), so a progressive
    round trip must reproduce the baseline round trip bit-for-bit in
    pixel space."""
    coefs, factors, mcu_rows, mcu_cols = _component_coefs(
        width, height, channels, raw, quant, sampling
    )
    dc_codes = [_canonical_codes(*_DC_LUMA), _canonical_codes(*_DC_CHROMA)]
    ac_codes = [_canonical_codes(*_AC_LUMA), _canonical_codes(*_AC_CHROMA)]

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    parts = [b"\xff\xd8"]
    parts.append(
        seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    )
    qbytes = bytes([quant] * 64)
    parts.append(seg(0xFFDB, bytes([0]) + qbytes))
    if channels == 3:
        parts.append(seg(0xFFDB, bytes([1]) + qbytes))
    comp = b"".join(
        bytes(
            [
                i + 1,
                (factors[i][0] << 4) | factors[i][1],
                0 if i == 0 else 1,
            ]
        )
        for i in range(channels)
    )
    parts.append(
        seg(
            0xFFC2 if progressive else 0xFFC0,
            struct.pack(">BHHB", 8, height, width, channels) + comp,
        )
    )
    for tc, th, tbl in (
        [(0, 0, _DC_LUMA), (1, 0, _AC_LUMA)]
        + ([(0, 1, _DC_CHROMA), (1, 1, _AC_CHROMA)] if channels == 3 else [])
    ):
        parts.append(
            seg(
                0xFFC4,
                bytes([(tc << 4) | th]) + bytes(tbl[0]) + bytes(tbl[1]),
            )
        )

    for scan_comps, ss, se, ah, al in scans:
        if progressive:
            if ss == 0 and se != 0:
                raise ValueError("progressive DC scan must have Se=0")
            if ss > 0 and len(scan_comps) != 1:
                raise ValueError("progressive AC scan must be 1 component")
        elif (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError(
                "sequential scans must be full-band (0,63,0,0)"
            )
        sos_comp = b"".join(
            bytes([ci + 1, ((0 if ci == 0 else 1) * 0x11)])
            for ci in scan_comps
        )
        parts.append(
            seg(
                0xFFDA,
                bytes([len(scan_comps)])
                + sos_comp
                + bytes([ss, se, (ah << 4) | al]),
            )
        )
        w = _BitWriter()
        refining = ah != 0
        if ss == 0 and not (progressive and refining):
            # DC-first (or full sequential) scan: predictor chain on
            # the point-transformed values
            pred = {ci: 0 for ci in scan_comps}
        if len(scan_comps) > 1:
            blocks = [
                (ci, by * v_i + v, bx * h_i + hh)
                for by in range(mcu_rows)
                for bx in range(mcu_cols)
                for ci in scan_comps
                for v_i in [factors[ci][1]]
                for h_i in [factors[ci][0]]
                for v in range(v_i)
                for hh in range(h_i)
            ]
        else:
            ci = scan_comps[0]
            hmax = max(f[0] for f in factors)
            vmax = max(f[1] for f in factors)
            h_i, v_i = factors[ci]
            cw = -(-width * h_i // hmax)
            ch = -(-height * v_i // vmax)
            blocks = [
                (ci, by, bx)
                for by in range(-(-ch // 8))
                for bx in range(-(-cw // 8))
            ]
        em = _ScanEmitter(w, None)
        for ci, by, bx in blocks:
            cz = coefs[ci][by, bx]
            tid = 0 if ci == 0 else 1
            em.ac = ac_codes[tid] if se > 0 else None
            if ss == 0:
                if refining:
                    w.write((int(cz[0]) >> al) & 1, 1)
                else:
                    cur = int(cz[0]) >> al  # arithmetic shift (G.1.2.1)
                    diff = cur - pred[ci]
                    pred[ci] = cur
                    t = _category(diff)
                    code, ln = dc_codes[tid][t]
                    w.write(code, ln)
                    if t:
                        em.emit_signed(diff, t)
                if se == 0:
                    continue
                # sequential full-band scan: AC follows in-block, and
                # EOB flushes PER BLOCK (eobrun accumulation across
                # blocks is progressive-only syntax)
                _emit_ac_first(em, cz, 1, se, 0)
                em.flush_eobrun()
            elif refining:
                _emit_ac_refine(em, cz, ss, se, al)
            else:
                _emit_ac_first(em, cz, ss, se, al)
        em.flush_eobrun()
        parts.append(w.flush())
    parts.append(b"\xff\xd9")
    return b"".join(parts)


def encode_jpeg_progressive(
    width: int,
    height: int,
    channels: int,
    raw: bytes,
    quant: int = 1,
    sampling: str = "444",
) -> bytes:
    """Progressive JFIF encoder with the libjpeg-style default scan
    script: DC first at Al=1, luma AC 1-5 then 6-63 at Al=2, chroma
    AC at Al=1, then successive-approximation refinements down to
    Al=0 — every scan type the decoder implements (DC/AC x
    first/refine, interleaved DC, non-interleaved AC) in one file."""
    if channels == 1:
        scans = [
            ([0], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0], 0, 0, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    else:
        scans = [
            ([0, 1, 2], 0, 0, 0, 1),
            ([0], 1, 5, 0, 2),
            ([2], 1, 63, 0, 1),
            ([1], 1, 63, 0, 1),
            ([0], 6, 63, 0, 2),
            ([0], 1, 63, 2, 1),
            ([0, 1, 2], 0, 0, 1, 0),
            ([2], 1, 63, 1, 0),
            ([1], 1, 63, 1, 0),
            ([0], 1, 63, 1, 0),
        ]
    return encode_jpeg_scans(
        width, height, channels, raw, scans, quant, sampling,
        progressive=True,
    )


def _decode_scan(
    data: bytes,
    scan_map: list[tuple[int, int, int]],
    comps: list[tuple[int, int, int, int]],
    coefs: list[np.ndarray],
    huff: dict[tuple[int, int], "_HuffDecoder"],
    geom: tuple[int, int, int, int, int, int],
    restart_interval: int,
    progressive: bool,
    ss: int,
    se: int,
    ah: int,
    al: int,
) -> int:
    """Decode ONE entropy-coded scan into the per-component zigzag
    coefficient arrays (T.81 Annex F sequential, Annex G progressive
    with spectral selection + successive approximation). Returns the
    number of entropy bytes consumed so the caller can resume marker
    parsing. ``coefs[ci]`` has shape (blocks_v, blocks_h, 64),
    zigzag index order."""
    width, height, hmax, vmax, mcu_rows, mcu_cols = geom
    if progressive:
        # T.81 B.2.3 scan-header constraints — violations are
        # structural damage, not honest gates
        if ss == 0 and se != 0:
            raise ValueError(
                "JPEG: progressive scan with Ss=0 must be DC-only "
                f"(Se={se})"
            )
        if ss > 0 and len(scan_map) != 1:
            raise ValueError(
                "JPEG: progressive AC scan must cover exactly one "
                f"component ({len(scan_map)} in SOS)"
            )
        if not (0 <= ss <= se <= 63):
            raise ValueError(f"JPEG: bad spectral range {ss}..{se}")
        if ah != 0 and ah != al + 1:
            raise ValueError(
                f"JPEG: successive approximation Ah={ah} must be Al+1"
            )
    else:
        if (ss, se, ah, al) != (0, 63, 0, 0):
            raise ValueError(
                "JPEG: sequential scan header must be Ss=0 Se=63 "
                f"Ah=Al=0 (got {ss},{se},{ah},{al})"
            )

    r = _BitReader(data)
    p1 = 1 << al
    m1 = -p1
    nc = len(comps)
    pred = [0] * nc
    eobrun = 0
    refining = ah != 0

    # a missing Huffman table is STRUCTURAL damage — validate up
    # front so corrupt files raise ValueError, not AttributeError
    # from a huff.get(...) miss deep in the block loop (r12 review)
    for _ci, _dc_t, _ac_t in scan_map:
        if ss == 0 and not refining and (0, _dc_t) not in huff:
            raise ValueError(
                f"JPEG: scan references missing DC Huffman table {_dc_t}"
            )
        if (
            se > 0
            and not (refining and ss == 0)
            and (1, _ac_t) not in huff
        ):
            raise ValueError(
                f"JPEG: scan references missing AC Huffman table {_ac_t}"
            )

    def first_block(coefz, ci, dc_dec, ac_dec) -> None:
        # sequential block, progressive DC-first, or AC-first band
        nonlocal eobrun
        k = ss
        if ss == 0:
            t = dc_dec.decode(r)
            pred[ci] += _extend(r.bits(t), t)
            coefz[0] = pred[ci] << al
            k = 1
            if se == 0:
                return
        if eobrun > 0:  # progressive AC band inside an EOB run
            eobrun -= 1
            return
        while k <= se:
            sym = ac_dec.decode(r)
            rr, s = sym >> 4, sym & 0xF
            if s == 0:
                if rr == 15:  # ZRL
                    k += 16
                    continue
                eobrun = (1 << rr) - 1
                if rr:
                    eobrun += r.bits(rr)
                break
            k += rr
            if k > se:
                raise ValueError("JPEG: AC index overflow")
            coefz[k] = _extend(r.bits(s), s) << al
            k += 1

    def refine_dc_block(coefz) -> None:
        if r.bit():
            coefz[0] |= p1

    def refine_ac_block(coefz, ac_dec) -> None:
        # T.81 G.1.2.3 correction-bit decoding (the jdphuff shape)
        nonlocal eobrun
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = ac_dec.decode(r)
                rr, s = sym >> 4, sym & 0xF
                if s == 0:
                    if rr != 15:
                        # EOBn COUNTS the current block: its remaining
                        # nonzero-history coefficients still receive
                        # correction bits below (the EOB0 case is the
                        # classic slip: eobrun hits 0 only after the
                        # tail of THIS block is refined)
                        eobrun = 1 << rr
                        if rr:
                            eobrun += r.bits(rr)
                        break
                    val = 0  # ZRL: skip 16 zero-history coefficients
                else:
                    if s != 1:
                        raise ValueError(
                            "JPEG: refinement magnitude must be 1"
                        )
                    val = p1 if r.bit() else m1
                # advance over nonzero-history coefficients (reading
                # their correction bits) until rr zero-history slots
                # have been skipped
                while k <= se:
                    c = int(coefz[k])
                    if c != 0:
                        if r.bit() and (c & p1) == 0:
                            coefz[k] = c + (p1 if c > 0 else m1)
                    else:
                        rr -= 1
                        if rr < 0:
                            break
                    k += 1
                if val:
                    if k > se:
                        raise ValueError("JPEG: refinement run overflow")
                    coefz[k] = val
                k += 1
        if eobrun > 0:
            while k <= se:  # refine the rest of the band
                c = int(coefz[k])
                if c != 0 and r.bit() and (c & p1) == 0:
                    coefz[k] = c + (p1 if c > 0 else m1)
                k += 1
            eobrun -= 1

    if len(scan_map) > 1:
        # interleaved: MCU order, h_i x v_i blocks per component
        mcu_count = 0
        for by in range(mcu_rows):
            for bx in range(mcu_cols):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    r.align_restart()
                    pred = [0] * nc
                    eobrun = 0
                for ci, dc_t, ac_t in scan_map:
                    _, _, h_i, v_i = comps[ci]
                    for v in range(v_i):
                        for hh in range(h_i):
                            cz = coefs[ci][by * v_i + v, bx * h_i + hh]
                            if refining:
                                refine_dc_block(cz)
                            else:
                                first_block(
                                    cz, ci, huff[(0, dc_t)],
                                    huff.get((1, ac_t)),
                                )
                mcu_count += 1
    else:
        # non-interleaved: raster over the component's OWN block grid
        # (T.81 A.2.2 — the grid of the ACTUAL component samples, not
        # the MCU-padded grid)
        ci, dc_t, ac_t = scan_map[0]
        _, _, h_i, v_i = comps[ci]
        cw = -(-width * h_i // hmax)
        ch = -(-height * v_i // vmax)
        nbh, nbv = -(-cw // 8), -(-ch // 8)
        dc_dec = huff.get((0, dc_t))
        ac_dec = huff.get((1, ac_t))
        mcu_count = 0
        for by in range(nbv):
            for bx in range(nbh):
                if (
                    restart_interval
                    and mcu_count
                    and mcu_count % restart_interval == 0
                ):
                    r.align_restart()
                    pred = [0] * nc
                    eobrun = 0
                cz = coefs[ci][by, bx]
                if not refining:
                    first_block(cz, ci, dc_dec, ac_dec)
                elif ss == 0:
                    refine_dc_block(cz)
                else:
                    refine_ac_block(cz, ac_dec)
                mcu_count += 1
    return r.pos


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a JPEG to (width, height, channels, raw pixel bytes).
    Supported: baseline/extended sequential (SOF0/SOF1) AND
    progressive (SOF2, r12 — T.81 Annex G spectral selection +
    successive approximation), 8-bit, Huffman, interleaved or
    non-interleaved (multi-scan) scans, all sampling factors 1 or 2
    per axis (greyscale / YCbCr 4:4:4, 4:2:2, 4:4:0, 4:2:0 —
    subsampled chroma upsampled by replication), restart markers.
    Arithmetic coding (SOF9/10), hierarchical/lossless modes,
    sampling factors > 2, and 12-bit raise ``NotImplementedError``."""
    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    width = height = None
    comps = []  # (id, qtab_id, h, v)
    restart_interval = 0
    progressive = False
    coefs = None  # per-comp zigzag coefficient arrays
    geom = None
    nscans = 0
    seq_covered: set = set()  # components fully coded (sequential)
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: bad marker byte at {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad before
        # a marker id — real-world baseline files use them; skipping
        # none mis-parses a bogus segment length (ADVICE r10).
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("JPEG: truncated in marker padding")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            # standalone, length-less markers (TEM / RSTn / SOI):
            # legal in the stream, carry no segment body
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("JPEG: truncated segment header")
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                values = list(body[i + 17 : i + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, values)
                i += 17 + n
        elif marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                tab = np.zeros(64, dtype=np.int64)
                tab[ZIGZAG] = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                qtabs[tid] = tab.reshape(8, 8)
                i += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2
            if width is not None:
                raise ValueError("JPEG: multiple SOF markers")
            progressive = marker == 0xC2
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            for i in range(nc):
                cid, samp, qid = body[6 + 3 * i : 9 + 3 * i]
                h_i, v_i = samp >> 4, samp & 0xF
                if h_i not in (1, 2) or v_i not in (1, 2):
                    # 4:1:1 and rarer grids need sampling factors up
                    # to 4; {1,2} covers 4:4:4 / 4:2:2 / 4:4:0 /
                    # 4:2:0 — the classes real encoders emit
                    raise NotImplementedError(
                        f"sampling factor {h_i}x{v_i} (only 1 or 2 "
                        "per axis: 4:4:4/4:2:2/4:4:0/4:2:0)"
                    )
                comps.append((cid, qid, h_i, v_i))
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X}): "
                "arithmetic/lossless/hierarchical coding"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if width is None:
                raise ValueError("JPEG: SOS before SOF")
            if coefs is None:
                if len(comps) == 1:
                    # T.81 A.2.2: in a single-component frame the
                    # block grid is the image grid regardless of the
                    # declared sampling factors (they only relate
                    # components to each other). Normalizing to 1x1
                    # reproduces exactly that geometry.
                    comps = [(comps[0][0], comps[0][1], 1, 1)]
                hmax = max(h for _, _, h, _ in comps)
                vmax = max(v for _, _, _, v in comps)
                mcu_rows = -(-height // (8 * vmax))
                mcu_cols = -(-width // (8 * hmax))
                geom = (width, height, hmax, vmax, mcu_rows, mcu_cols)
                coefs = [
                    np.zeros((mcu_rows * v, mcu_cols * h, 64),
                             dtype=np.int64)
                    for _, _, h, v in comps
                ]
            ns = body[0]
            scan_map = []
            for i in range(ns):
                cid, tsel = body[1 + 2 * i], body[2 + 2 * i]
                idx = next(
                    (
                        j
                        for j, (c, _, _, _) in enumerate(comps)
                        if c == cid
                    ),
                    None,
                )
                if idx is None:
                    raise ValueError(
                        f"JPEG: SOS component id {cid} not in frame"
                    )
                scan_map.append((idx, tsel >> 4, tsel & 0xF))
            sss, sse, a = body[1 + 2 * ns], body[2 + 2 * ns], body[3 + 2 * ns]
            data_start = pos + 2 + ln
            consumed = _decode_scan(
                payload[data_start:], scan_map, comps, coefs, huff,
                geom, restart_interval, progressive,
                sss, sse, a >> 4, a & 0xF,
            )
            nscans += 1
            if not progressive:
                seq_covered.update(idx for idx, _, _ in scan_map)
            pos = data_start + consumed
            continue
        pos += 2 + ln
    if width is None or coefs is None or nscans == 0:
        raise ValueError("JPEG: missing SOF or SOS")
    if not progressive and len(seq_covered) < len(comps):
        # an incomplete multi-scan sequential file would silently
        # decode the missing planes as flat zero — the exact wrong
        # answer the old r11 gate refused (r12 review: the gate's
        # PROTECTION survives the gate's removal)
        raise ValueError(
            f"JPEG: sequential scans cover {len(seq_covered)} of "
            f"{len(comps)} components"
        )

    # dequantize + IDCT + assemble planes
    width, height, hmax, vmax, mcu_rows, mcu_cols = geom
    nc = len(comps)
    planes = []
    for ci, (_, qid, h_i, v_i) in enumerate(comps):
        if qid not in qtabs:
            raise ValueError(f"JPEG: missing quant table {qid}")
        qflat = qtabs[qid].ravel()[ZIGZAG]
        bv, bh = coefs[ci].shape[:2]
        plane = np.zeros((bv * 8, bh * 8))
        for by in range(bv):
            for bx in range(bh):
                coef = np.zeros(64, dtype=np.float64)
                coef[ZIGZAG] = coefs[ci][by, bx] * qflat
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _C.T @ coef.reshape(8, 8) @ _C + 128.0
                )
        planes.append(plane)

    # upsample subsampled planes to full resolution by replication
    # (nearest-neighbor — the decode-side inverse of the encoder's
    # box average; exact wherever chroma is constant per sampling
    # cell, which is the analytically-pinned class)
    full = np.zeros((nc, mcu_rows * 8 * vmax, mcu_cols * 8 * hmax))
    for ci, (_, _, h_i, v_i) in enumerate(comps):
        p = planes[ci]
        if v_i != vmax:
            p = np.repeat(p, vmax // v_i, axis=0)
        if h_i != hmax:
            p = np.repeat(p, hmax // h_i, axis=1)
        full[ci] = p
    full = full[:, :height, :width]
    if nc == 1:
        out = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return width, height, 1, out.tobytes()
    rgb = _ycbcr_to_rgb(np.moveaxis(full, 0, -1))
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return width, height, 3, out.tobytes()


# --------------------------------------------------------------------------
# EXIF orientation (r13)
# --------------------------------------------------------------------------


def _exif_orientation_from_tiff(t: bytes) -> int:
    """Tag 0x0112 from a TIFF blob (the part after "Exif\\0\\0"):
    byte-order mark, magic 42, IFD0 entry walk. Absent tag -> 1;
    malformed structure raises ValueError."""
    if len(t) < 8:
        raise ValueError("EXIF TIFF header truncated")
    if t[:2] == b"II":
        end = "<"
    elif t[:2] == b"MM":
        end = ">"
    else:
        raise ValueError("EXIF byte-order mark invalid")
    (magic,) = struct.unpack(end + "H", t[2:4])
    if magic != 42:
        raise ValueError("EXIF TIFF magic invalid")
    (ifd0,) = struct.unpack(end + "I", t[4:8])
    if ifd0 + 2 > len(t):
        raise ValueError("EXIF IFD0 offset out of range")
    (n,) = struct.unpack(end + "H", t[ifd0 : ifd0 + 2])
    base = ifd0 + 2
    if base + 12 * n > len(t):
        raise ValueError("EXIF IFD0 entries truncated")
    for i in range(n):
        e = t[base + 12 * i : base + 12 * i + 12]
        tag, typ = struct.unpack(end + "HH", e[:4])
        if tag != 0x0112:
            continue
        (cnt,) = struct.unpack(end + "I", e[4:8])
        if typ != 3 or cnt != 1:
            raise ValueError("EXIF orientation entry malformed")
        (v,) = struct.unpack(end + "H", e[8:10])
        if not 1 <= v <= 8:
            raise ValueError(f"EXIF orientation {v} out of range")
        return v
    return 1


def jpeg_orientation(payload: bytes) -> int:
    """EXIF orientation (TIFF tag 0x0112) via a BOUNDED APP1 walk —
    no entropy decode, stops at SOS (r13; r12 verdict ask #4: at
    crawl scale a visible fraction of photos carry orientation 3/6/8
    and ignoring it transposes resize_media's output). Returns 1
    (top-left / normal) when the JPEG has no APP1/Exif segment or no
    orientation tag; a PRESENT but malformed EXIF structure raises
    ValueError (classified 'corrupt' by the X7 containment layer)."""
    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    while pos + 2 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG: bad marker byte at {pos}")
        while pos + 1 < len(payload) and payload[pos + 1] == 0xFF:
            pos += 1
        if pos + 1 >= len(payload):
            raise ValueError("JPEG: truncated in marker padding")
        marker = payload[pos + 1]
        if marker in (0xD9, 0xDA):  # EXIF must precede the scan
            return 1
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("JPEG: truncated segment header")
        (ln,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + ln]
        if marker == 0xE1 and body[:6] == b"Exif\x00\x00":
            return _exif_orientation_from_tiff(body[6:])
        pos += 2 + ln
    return 1


def exif_tiff_blob(orientation: int, byte_order: str = "II") -> bytes:
    """A minimal TIFF blob (one-entry IFD0 carrying tag 0x0112) in
    either byte order — shared by the JPEG APP1 and WebP EXIF-chunk
    fixture helpers."""
    if not 1 <= orientation <= 8:
        raise ValueError("orientation must be 1..8")
    if byte_order not in ("II", "MM"):
        raise ValueError("byte_order must be II or MM")
    end = "<" if byte_order == "II" else ">"
    return (
        byte_order.encode()
        + struct.pack(end + "H", 42)
        + struct.pack(end + "I", 8)
        + struct.pack(end + "H", 1)
        + struct.pack(end + "HHI", 0x0112, 3, 1)
        + struct.pack(end + "H", orientation)
        + b"\x00\x00"
        + struct.pack(end + "I", 0)
    )


def add_exif_orientation(
    payload: bytes, orientation: int, byte_order: str = "II"
) -> bytes:
    """Fixture helper: insert a minimal APP1/Exif segment (one-entry
    IFD0 carrying tag 0x0112) right after SOI, in either TIFF byte
    order."""
    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    body = b"Exif\x00\x00" + exif_tiff_blob(orientation, byte_order)
    seg = b"\xff\xe1" + struct.pack(">H", len(body) + 2) + body
    return payload[:2] + seg + payload[2:]
