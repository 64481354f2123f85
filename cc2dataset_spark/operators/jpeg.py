"""Baseline JPEG codec in pure Python + numpy (r10) — narrows the
last media-decode gate without any codec library.

Scope (honest): baseline sequential DCT (SOF0), 8-bit, Huffman
entropy coding, greyscale or YCbCr at sampling factors 1 or 2 per
axis — 4:4:4, 4:2:2, 4:4:0, and the web-typical 4:2:0 (r11; chroma
upsampled by replication, the decode-side inverse of the encoder's
box average — exact wherever chroma is constant per sampling cell,
which is the analytically-pinned class; T.81 leaves the upsampling
filter decoder-defined, so byte-exactness across decoders has no
spec meaning for subsampled files and the contract is a bound) —
optional restart markers, one interleaved scan. Progressive (SOF2),
arithmetic coding, non-interleaved multi-scan, sampling factors > 2,
and 12-bit raise ``NotImplementedError`` — real gates, never silent
wrong answers. This covers the encoder's own output classes
end-to-end plus externally produced single-scan baseline files at
the common sampling grids.

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


def decode_jpeg(payload: bytes) -> tuple[int, int, int, bytes]:
    """Decode a baseline JPEG to (width, height, channels, raw pixel
    bytes). Supported: SOF0, 8-bit, Huffman, all sampling factors
    1 or 2 per axis (greyscale / YCbCr 4:4:4, 4:2:2, 4:4:0, 4:2:0 —
    subsampled chroma upsampled by replication, r11), restart
    markers, one interleaved scan. Progressive, arithmetic coding,
    sampling factors > 2, and non-interleaved multi-scan files raise
    ``NotImplementedError``."""
    if payload is None or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    width = height = None
    comps = []  # (id, qtab_id)
    scan_map = []  # (comp_index, dc_table, ac_table)
    restart_interval = 0
    data_start = None
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
        elif marker == 0xC0:  # SOF0 baseline
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
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF marker 0xFF{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            ns = body[0]
            if ns != len(comps):
                # A legal baseline file may carry NON-INTERLEAVED
                # scans (each SOS covers a subset of the SOF
                # components, several SOS segments follow); this
                # decoder handles the single interleaved scan only —
                # decoding just the first scan would silently leave
                # the remaining planes all-zero, so gate LOUDLY like
                # progressive/subsampled (ADVICE r10).
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline JPEG: SOS "
                    f"covers {ns} of {len(comps)} components"
                )
            for i in range(ns):
                cid, tsel = body[1 + 2 * i], body[2 + 2 * i]
                idx = next(
                    j
                    for j, (c, _, _, _) in enumerate(comps)
                    if c == cid
                )
                scan_map.append((idx, tsel >> 4, tsel & 0xF))
            data_start = pos + 2 + ln
            break
        pos += 2 + ln
    if width is None or data_start is None:
        raise ValueError("JPEG: missing SOF0 or SOS")

    r = _BitReader(payload[data_start:])
    nc = len(comps)
    if nc == 1:
        # T.81 A.2.2: a single-component scan is NON-interleaved —
        # one 8x8 data unit per MCU in raster order over the
        # component's own block grid, and in a single-component
        # FRAME that grid is the image grid regardless of the
        # declared sampling factors (they only relate components to
        # each other). Normalizing to 1x1 reproduces exactly that
        # geometry; without this, a grayscale file declaring h2v2
        # (e.g. jpegtran -grayscale keeping the source's luma
        # factors) would decode scrambled or die mid-stream.
        comps = [(comps[0][0], comps[0][1], 1, 1)]
    hmax = max(h for _, _, h, _ in comps)
    vmax = max(v for _, _, _, v in comps)
    # an MCU is 8*hmax x 8*vmax image pixels; component ci contributes
    # h_i x v_i blocks per MCU into its OWN (subsampled) plane
    mcu_rows = -(-height // (8 * vmax))
    mcu_cols = -(-width // (8 * hmax))
    planes = [
        np.zeros((mcu_rows * 8 * v, mcu_cols * 8 * h))
        for _, _, h, v in comps
    ]
    pred = [0] * nc
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
            for ci, dc_t, ac_t in scan_map:
                _, qid, h_i, v_i = comps[ci]
                dc_dec = huff[(0, dc_t)]
                ac_dec = huff[(1, ac_t)]
                for v in range(v_i):
                    for hh in range(h_i):
                        q = np.zeros(64, dtype=np.int64)
                        t = dc_dec.decode(r)
                        pred[ci] += _extend(r.bits(t), t)
                        q[0] = pred[ci]
                        k = 1
                        while k < 64:
                            sym = ac_dec.decode(r)
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += sym >> 4
                            if k > 63:
                                raise ValueError(
                                    "JPEG: AC index overflow"
                                )
                            t = sym & 0xF
                            q[k] = _extend(r.bits(t), t)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = (
                            q * qtabs[qid].ravel()[ZIGZAG]
                        )
                        block = _C.T @ coef.reshape(8, 8) @ _C + 128.0
                        y0 = (by * v_i + v) * 8
                        x0 = (bx * h_i + hh) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_count += 1

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
