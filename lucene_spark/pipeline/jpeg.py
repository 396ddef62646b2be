"""Baseline JFIF (JPEG) codec — pure stdlib + numpy, no libjpeg/PIL.

Fills the last documented seam in the multimodal decode path
(``multimodal.decode_image`` previously raised for JPEG): the pipeline's
binary image columns now cover an uncompressed format (BMP), a
lossless-compressed format (PNG/DEFLATE) and a lossy transform-coded
format (JPEG/DCT), all decoded from real bytes.

Scope: ITU-T T.81 *baseline sequential* process, 8-bit grayscale, one
component, no subsampling, no restart intervals — the shape this
pipeline's synthetic generator emits. The encoder writes bona fide
standard JPEGs (Annex K.1 luminance quantization table, Annex K.3/K.5
Huffman tables, JFIF APP0), so any conforming decoder reads them; the
decoder is generic over whatever DQT/DHT tables the stream declares, so
it also reads baseline grayscale JPEGs produced elsewhere. Progressive /
chroma-subsampled / 12-bit streams raise ``NotImplementedError`` at the
same documented seam as before — wire libjpeg there and every downstream
operator (schema, batching, partitioning) is unchanged.

Entropy coding is exact: ``decode_jpeg_pixels(encode_jpeg_pixels(img))``
equals the quantize→dequantize→IDCT reconstruction computed directly in
numpy, bit for bit (pinned in tests/test_pipeline.py) — only the DCT
quantization is lossy, never the Huffman/bit layer.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["encode_jpeg_pixels", "decode_jpeg_pixels", "decode_jpeg_meta"]

#: ITU-T T.81 Annex K.1 luminance quantization table, natural (row) order.
_QTABLE = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)

#: Annex K.3 — luminance DC: code-length counts (lengths 1..16) + symbols.
_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALS = tuple(range(12))

#: Annex K.5 — luminance AC: code-length counts + the standard 162 symbols.
_AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
# fmt: off
_AC_VALS = (
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
)
# fmt: on

#: zigzag scan order as 64 (row, col) pairs: anti-diagonals d = r+c,
#: even diagonals walked bottom-left→top-right (r descending), odd ones
#: the other way.
_ZIGZAG = [
    (r, d - r)
    for d in range(15)
    for r in (
        range(min(d, 7), max(0, d - 7) - 1, -1)
        if d % 2 == 0
        else range(max(0, d - 7), min(d, 7) + 1)
    )
]

#: orthonormal 8-point DCT-II basis: dct2d(B) = C @ B @ C.T (T.81 A.3.3).
_C = np.array(
    [
        [
            0.5 * (np.sqrt(0.5) if u == 0 else 1.0) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits, values):
    """{symbol: (length, code)} per the canonical assignment of T.81 C.2."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length: int, value: int) -> None:
        if length == 0:
            return
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        # pad the final partial byte with 1-bits (F.1.2.3)
        if self.n:
            self.write(8 - self.n, (1 << (8 - self.n)) - 1)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra-bits) for a coefficient per T.81 F.1.2.1: category
    is bit_length(|v|); negative values store v + 2^s - 1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def quantized_blocks(pixels: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Forward path shared by the encoder and the lossless-entropy test:
    edge-pad to 8x8 multiples, level-shift, DCT, quantize (round-half-even,
    numpy's default — an encoder-side free choice under the spec).
    Returns (blocks[by, bx, 8, 8] int32, height, width)."""
    h, w = pixels.shape
    h8, w8 = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.empty((h8, w8), dtype=np.float64)
    padded[:h, :w] = pixels
    padded[h:, :w] = pixels[h - 1 : h, :]  # replicate edges into the pad
    padded[:, w:] = padded[:, w - 1 : w]
    shifted = padded - 128.0
    by, bx = h8 // 8, w8 // 8
    blocks = shifted.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    dct = np.einsum("ux,abxy,vy->abuv", _C, blocks, _C)
    return np.round(dct / _QTABLE).astype(np.int32), h, w


def dequantize_reconstruct(
    blocks: np.ndarray, h: int, w: int, qtable: np.ndarray | None = None
) -> np.ndarray:
    """Inverse of :func:`quantized_blocks` minus the (lossy) rounding:
    dequantize (with ``qtable``, default the module's Annex K table),
    IDCT, level-unshift, clamp, crop. What any conforming decoder must
    produce for these coefficients — the decoder calls this with the
    stream's own table."""
    dct = (blocks * (_QTABLE if qtable is None else qtable)).astype(np.float64)
    spatial = np.einsum("xu,abuv,yv->abxy", _C.T, dct, _C.T)
    by, bx = blocks.shape[:2]
    img = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
    return np.clip(np.round(img), 0, 255).astype(np.uint8)[:h, :w]


def encode_jpeg_pixels(pixels: np.ndarray) -> bytes:
    """8-bit grayscale array (h, w) -> baseline JFIF bytes (SOI, APP0, DQT,
    SOF0, DHT x2, SOS, entropy-coded scan, EOI) with the Annex K tables."""
    blocks, h, w = quantized_blocks(np.asarray(pixels, dtype=np.uint8))
    dc_codes = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_codes = _canonical_codes(_AC_BITS, _AC_VALS)
    zz_rows = [p[0] for p in _ZIGZAG]
    zz_cols = [p[1] for p in _ZIGZAG]

    bw = _BitWriter()
    prev_dc = 0
    by, bx = blocks.shape[:2]
    for y in range(by):
        for x in range(bx):
            zz = blocks[y, x][zz_rows, zz_cols]
            s, extra = _magnitude(int(zz[0]) - prev_dc)
            prev_dc = int(zz[0])
            length, code = dc_codes[s]
            bw.write(length, code)
            bw.write(s, extra)
            run = 0
            last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
            for i in range(1, last_nz + 1):
                v = int(zz[i])
                if v == 0:
                    run += 1
                    continue
                while run >= 16:  # ZRL: sixteen zeros
                    length, code = ac_codes[0xF0]
                    bw.write(length, code)
                    run -= 16
                s, extra = _magnitude(v)
                length, code = ac_codes[(run << 4) | s]
                bw.write(length, code)
                bw.write(s, extra)
                run = 0
            if last_nz < 63:  # EOB
                length, code = ac_codes[0x00]
                bw.write(length, code)
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    zz_q = bytes(int(_QTABLE[r, c]) for r, c in _ZIGZAG)
    out = b"".join(
        [
            b"\xff\xd8",  # SOI
            seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
            seg(0xFFDB, b"\x00" + zz_q),  # DQT: Pq=0 Tq=0
            # SOF0: 8-bit, h x w, 1 component (id 1, 1x1 sampling, Tq 0)
            seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"),
            seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)),  # DHT DC 0
            seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS)),  # DHT AC 0
            # SOS: 1 component, DC table 0 / AC table 0, full spectral range
            seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00"),
            bytes(bw.buf),
            b"\xff\xd9",  # EOI
        ]
    )
    return out


class _BitReader:
    """MSB-first reader over entropy-coded data; un-stuffs 0xFF00 and stops
    at any real marker (T.81 F.2.2.5)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan data truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else None
                if nxt == 0x00:
                    self.pos += 1
                else:
                    raise ValueError("JPEG scan hit an unexpected marker")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _extend(extra: int, s: int) -> int:
    """Sign-extend a magnitude category's extra bits (T.81 F.2.2.1)."""
    if s == 0:
        return 0
    return extra if extra >= (1 << (s - 1)) else extra - (1 << s) + 1


def _huff_decode(br: _BitReader, table: dict) -> int:
    length, code = 0, 0
    while length < 16:
        code = (code << 1) | br.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Baseline grayscale JFIF bytes -> uint8 array (h, w). Generic over
    the stream's own DQT/DHT tables; non-baseline shapes raise."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> (len, code) -> sym
    h = w = None
    comp_q = dc_id = ac_id = None
    br = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte (B.1.1.2): extra 0xFF padding
            pos += 1
            continue
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:  # TEM / RSTn: standalone
            pos += 2
            continue
        (length,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                if pq != 0:
                    raise NotImplementedError("16-bit quantization tables")
                tbl = np.zeros((8, 8), dtype=np.int32)
                for i, (r, c) in enumerate(_ZIGZAG):
                    tbl[r, c] = body[off + 1 + i]
                qtables[tq] = tbl
                off += 65
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = body[off + 1 : off + 17]
                nvals = sum(bits)
                vals = body[off + 17 : off + 17 + nvals]
                codes = _canonical_codes(bits, vals)
                htables[(tc, th)] = {(l, c): s for s, (l, c) in codes.items()}
                off += 17 + nvals
        elif marker == 0xC0:  # SOF0 baseline
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            # component spec: id at body[6], HxV sampling at [7], Tq at [8]
            if precision != 8 or ncomp != 1 or body[7] != 0x11:
                raise NotImplementedError(
                    "built-in JPEG codec reads 8-bit single-component "
                    "baseline streams; wire libjpeg here for chroma/"
                    "subsampled shapes — downstream plumbing is unchanged"
                )
            comp_q = body[8]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError("only baseline sequential JPEG (SOF0)")
        elif marker == 0xDD:
            raise NotImplementedError("restart intervals not supported")
        elif marker == 0xDA:  # SOS — entropy data follows the header
            if body[0] != 1:
                raise NotImplementedError("single-component scans only")
            dc_id, ac_id = body[2] >> 4, body[2] & 0xF
            br = _BitReader(payload, pos + 2 + length)
            break
        pos += 2 + length
    if br is None or h is None:
        raise ValueError("JPEG stream missing SOF0 or SOS")
    try:
        qt = qtables[comp_q]
        dc_table, ac_table = htables[(0, dc_id)], htables[(1, ac_id)]
    except KeyError as missing:
        raise ValueError(
            f"JPEG scan references undeclared table {missing}"
        ) from None

    by, bx = -(-h // 8), -(-w // 8)
    blocks = np.zeros((by, bx, 8, 8), dtype=np.int32)
    zz_rows = [p[0] for p in _ZIGZAG]
    zz_cols = [p[1] for p in _ZIGZAG]
    prev_dc = 0
    for y in range(by):
        for x in range(bx):
            zz = np.zeros(64, dtype=np.int32)
            s = _huff_decode(br, dc_table)
            prev_dc += _extend(br.bits(s), s)
            zz[0] = prev_dc
            i = 1
            while i < 64:
                sym = _huff_decode(br, ac_table)
                if sym == 0x00:  # EOB
                    break
                if sym == 0xF0:  # ZRL
                    i += 16
                    continue
                run, s = sym >> 4, sym & 0xF
                i += run
                if i > 63:
                    raise ValueError("JPEG AC run past block end")
                zz[i] = _extend(br.bits(s), s)
                i += 1
            blocks[y, x][zz_rows, zz_cols] = zz
    # decoder dequantizes with the STREAM's table, not the module constant
    return dequantize_reconstruct(blocks, h, w, qtable=qt)


def decode_jpeg_meta(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_intensity) in the multimodal metadata shape."""
    px = decode_jpeg_pixels(payload)
    return int(px.shape[1]), int(px.shape[0]), float(px.mean()) / 255.0
