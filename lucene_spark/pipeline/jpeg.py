"""Baseline JFIF (JPEG) codec — pure stdlib + numpy, no libjpeg/PIL.

Fills the multimodal decode seam for the dominant web-corpus image format:
the pipeline's binary image columns cover an uncompressed format (BMP), a
lossless-compressed format (PNG/DEFLATE) and a lossy transform-coded
format (JPEG/DCT), all decoded from real bytes.

Scope: ITU-T T.81 *baseline sequential* process (SOF0), 8-bit samples,

- **grayscale** single-component streams, and
- **color** multi-component YCbCr streams with 4:4:4, 4:2:2 or 4:2:0
  chroma subsampling (arbitrary integer sampling factors whose ratio to
  Hmax/Vmax is integral), decoded through the interleaved-MCU layout of
  T.81 A.2.3 with per-component DC predictors,
- **restart intervals** (DRI / RSTn, T.81 B.2.4.4 + E.2.4): the decoder
  byte-aligns at each restart boundary, checks the modulo-8 marker
  sequence and resets the DC predictors; the encoder can emit them.

The encoder writes bona fide standard JPEGs (Annex K.1/K.2 quantization
tables, Annex K.3-K.6 Huffman tables, JFIF APP0, BT.601 full-range
YCbCr), so any conforming decoder reads them; the decoder is generic over
whatever DQT/DHT tables and sampling factors the stream declares, so it
also reads baseline JPEGs produced elsewhere (the single table-class
restriction left is 8-bit DQT precision).  Progressive (SOF2) and 12-bit
streams raise ``NotImplementedError`` at the same documented seam as
before — wire libjpeg there and every downstream operator (schema,
batching, partitioning) is unchanged.

Entropy coding is exact: ``decode_jpeg_pixels(encode_jpeg_pixels(img))``
equals the subsample→quantize→dequantize→IDCT→upsample reconstruction
computed directly in numpy (``reconstruct_rgb`` / the grayscale
quantize-reconstruct pair), bit for bit (pinned in
tests/test_pipeline.py) — only the DCT quantization and chroma
subsampling are lossy, never the Huffman/bit layer.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "encode_jpeg_pixels",
    "decode_jpeg_pixels",
    "decode_jpeg_meta",
    "quantized_blocks",
    "dequantize_reconstruct",
    "reconstruct_rgb",
    "rgb_to_ycbcr",
    "ycbcr_to_rgb",
]

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

#: ITU-T T.81 Annex K.2 chrominance quantization table, natural order.
_QTABLE_C = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

#: Annex K.3 — luminance DC: code-length counts (lengths 1..16) + symbols.
_DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
_DC_VALS = tuple(range(12))

#: Annex K.4 — chrominance DC.
_DC_BITS_C = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
_DC_VALS_C = tuple(range(12))

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

#: Annex K.6 — chrominance AC: code-length counts + the standard 162 symbols.
_AC_BITS_C = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
_AC_VALS_C = (
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
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
_ZZ_ROWS = [p[0] for p in _ZIGZAG]
_ZZ_COLS = [p[1] for p in _ZIGZAG]

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

#: chroma-subsampling name -> luma sampling factors (H, V); chroma is 1x1.
_SUBSAMPLING = {"4:4:4": (1, 1), "4:2:2": (2, 1), "4:2:0": (2, 2)}


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

    def restart(self, index: int) -> None:
        """Byte-align and emit RSTn, n = index mod 8 (E.2.4)."""
        self.flush()
        self.buf += bytes((0xFF, 0xD0 + (index & 7)))


def _magnitude(v: int) -> tuple[int, int]:
    """(category, extra-bits) for a coefficient per T.81 F.1.2.1: category
    is bit_length(|v|); negative values store v + 2^s - 1."""
    s = int(abs(v)).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


# ---- colorspace (JFIF: BT.601 full-range) -----------------------------------


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 RGB -> (h, w, 3) float64 YCbCr (JFIF / BT.601
    full-range, Cb/Cr centered at 128; not rounded — the DCT consumes
    floats)."""
    arr = np.asarray(rgb, dtype=np.float64)
    r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    """Full-resolution Y/Cb/Cr planes -> (h, w, 3) uint8 RGB (JFIF
    inverse transform, round-half-even + clamp like every plane here)."""
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    """Edge-replicate ``plane`` (float) up to multiples of (mh, mw)."""
    h, w = plane.shape
    h2, w2 = -(-h // mh) * mh, -(-w // mw) * mw
    if (h2, w2) == (h, w):
        return plane
    out = np.empty((h2, w2), dtype=np.float64)
    out[:h, :w] = plane
    out[h:, :w] = plane[h - 1 : h, :]
    out[:, w:] = out[:, w - 1 : w]
    return out


def _forward_blocks(plane: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """Float plane (already a multiple of 8x8) -> quantized coefficient
    blocks[by, bx, 8, 8] int32: level-shift, DCT, quantize
    (round-half-even, numpy's default — an encoder-side free choice under
    the spec)."""
    h, w = plane.shape
    shifted = plane - 128.0
    by, bx = h // 8, w // 8
    blocks = shifted.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3)
    dct = np.einsum("ux,abxy,vy->abuv", _C, blocks, _C)
    return np.round(dct / qtable).astype(np.int32)


def _inverse_plane(blocks: np.ndarray, qtable: np.ndarray) -> np.ndarray:
    """Quantized blocks -> reconstructed float plane in [0, 255]
    (dequantize, IDCT, level-unshift, round-half-even, clamp) — what any
    conforming decoder must produce for these coefficients."""
    dct = (blocks * qtable).astype(np.float64)
    spatial = np.einsum("xu,abuv,yv->abxy", _C.T, dct, _C.T)
    by, bx = blocks.shape[:2]
    img = spatial.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
    return np.clip(np.round(img), 0.0, 255.0)


def quantized_blocks(pixels: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Grayscale forward path shared by the encoder and the
    lossless-entropy test: edge-pad to 8x8 multiples, level-shift, DCT,
    quantize.  Returns (blocks[by, bx, 8, 8] int32, height, width)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape
    return _forward_blocks(_pad_edge(px.astype(np.float64), 8, 8), _QTABLE), h, w


def dequantize_reconstruct(
    blocks: np.ndarray, h: int, w: int, qtable: np.ndarray | None = None
) -> np.ndarray:
    """Inverse of :func:`quantized_blocks` minus the (lossy) rounding;
    the decoder calls this with the stream's own table."""
    qt = _QTABLE if qtable is None else qtable
    return _inverse_plane(blocks, qt).astype(np.uint8)[:h, :w]


def _subsample(plane: np.ndarray, hs: int, vs: int) -> np.ndarray:
    """Mean-pool a float plane by (vs, hs); plane dims must divide."""
    h, w = plane.shape
    return plane.reshape(h // vs, vs, w // hs, hs).mean(axis=(1, 3))


def _rgb_forward(
    rgb: np.ndarray, subsampling: str
) -> tuple[list[np.ndarray], int, int, int, int]:
    """RGB image -> ([Y, Cb, Cr] quantized block grids laid out for the
    interleaved scan], h, w, hs, vs)."""
    try:
        hs, vs = _SUBSAMPLING[subsampling]
    except KeyError:
        raise ValueError(
            f"subsampling must be one of {sorted(_SUBSAMPLING)}, got {subsampling!r}"
        ) from None
    px = np.asarray(rgb, dtype=np.uint8)
    h, w = px.shape[:2]
    ycc = rgb_to_ycbcr(px)
    # pad to whole MCUs BEFORE subsampling so chroma pooling windows are full
    yp = _pad_edge(ycc[..., 0], 8 * vs, 8 * hs)
    cbp = _pad_edge(ycc[..., 1], 8 * vs, 8 * hs)
    crp = _pad_edge(ycc[..., 2], 8 * vs, 8 * hs)
    comps = [
        _forward_blocks(yp, _QTABLE),
        _forward_blocks(_subsample(cbp, hs, vs), _QTABLE_C),
        _forward_blocks(_subsample(crp, hs, vs), _QTABLE_C),
    ]
    return comps, h, w, hs, vs


def _reconstruct_color(
    planes: list[np.ndarray],
    h: int,
    w: int,
    up: list[tuple[int, int]],
) -> np.ndarray:
    """Reconstructed component planes (float, [0,255], component
    resolution) + per-component (h_up, v_up) replication factors ->
    (h, w, 3) uint8 RGB.  Chroma upsampling is sample replication
    (nearest), the JFIF-common choice; both the decoder and the direct
    numpy reconstruction path call this, so the entropy-losslessness test
    compares bit-for-bit."""
    full = []
    for plane, (hu, vu) in zip(planes, up):
        if hu > 1 or vu > 1:
            plane = np.repeat(np.repeat(plane, vu, axis=0), hu, axis=1)
        full.append(plane[:h, :w])
    return ycbcr_to_rgb(full[0], full[1], full[2])


def reconstruct_rgb(rgb: np.ndarray, subsampling: str = "4:2:0") -> np.ndarray:
    """The decoded image any conforming decoder (with replicated-sample
    upsampling) produces for ``encode_jpeg_pixels(rgb, subsampling)`` —
    computed directly in numpy with no entropy layer.  The codec's
    Huffman/bit path is pinned bit-for-bit against this."""
    comps, h, w, hs, vs = _rgb_forward(rgb, subsampling)
    planes = [
        _inverse_plane(comps[0], _QTABLE),
        _inverse_plane(comps[1], _QTABLE_C),
        _inverse_plane(comps[2], _QTABLE_C),
    ]
    return _reconstruct_color(planes, h, w, [(1, 1), (hs, vs), (hs, vs)])


# ---- encoder ----------------------------------------------------------------


def _encode_scan(
    comps: list[dict],
    mcus_y: int,
    mcus_x: int,
    restart_interval: int,
) -> bytes:
    """Interleaved-MCU entropy coding (T.81 A.2.3 + F.1.2) over prepared
    components: each has blocks[by, bx, 8, 8], sampling (H, V) and its
    DC/AC code tables.  Single-component calls degrade to the raster
    scan.  Emits RSTn every ``restart_interval`` MCUs when non-zero."""
    bw = _BitWriter()
    prev_dc = [0] * len(comps)
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                bw.restart(rst)
                rst += 1
                prev_dc = [0] * len(comps)
            for ci, comp in enumerate(comps):
                ch, cv = comp["H"], comp["V"]
                dc_codes, ac_codes = comp["dc"], comp["ac"]
                blocks = comp["blocks"]
                for v in range(cv):
                    for u in range(ch):
                        zz = blocks[my * cv + v, mx * ch + u][_ZZ_ROWS, _ZZ_COLS]
                        s, extra = _magnitude(int(zz[0]) - prev_dc[ci])
                        prev_dc[ci] = int(zz[0])
                        length, code = dc_codes[s]
                        bw.write(length, code)
                        bw.write(s, extra)
                        run = 0
                        last_nz = (
                            int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                        )
                        for i in range(1, last_nz + 1):
                            coef = int(zz[i])
                            if coef == 0:
                                run += 1
                                continue
                            while run >= 16:  # ZRL: sixteen zeros
                                length, code = ac_codes[0xF0]
                                bw.write(length, code)
                                run -= 16
                            s, extra = _magnitude(coef)
                            length, code = ac_codes[(run << 4) | s]
                            bw.write(length, code)
                            bw.write(s, extra)
                            run = 0
                        if last_nz < 63:  # EOB
                            length, code = ac_codes[0x00]
                            bw.write(length, code)
            mcu_index += 1
    bw.flush()
    return bytes(bw.buf)


def _seg(marker: int, body: bytes) -> bytes:
    return struct.pack(">HH", marker, len(body) + 2) + body


def _zz_bytes(qtable: np.ndarray) -> bytes:
    return bytes(int(qtable[r, c]) for r, c in _ZIGZAG)


def encode_jpeg_pixels(
    pixels: np.ndarray,
    subsampling: str = "4:2:0",
    restart_interval: int = 0,
) -> bytes:
    """uint8 array -> baseline JFIF bytes with the Annex K tables.

    (h, w)     -> single-component grayscale SOF0 (as before);
    (h, w, 3)  -> RGB encoded as three-component YCbCr with the given
                  chroma ``subsampling`` ("4:2:0", "4:2:2" or "4:4:4"),
                  interleaved MCUs, luma tables 0 / chroma tables 1.
    ``restart_interval`` > 0 writes a DRI segment and RSTn markers every
    that many MCUs.
    """
    px = np.asarray(pixels, dtype=np.uint8)
    dc_l = _canonical_codes(_DC_BITS, _DC_VALS)
    ac_l = _canonical_codes(_AC_BITS, _AC_VALS)

    head = [
        b"\xff\xd8",  # SOI
        _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"),
    ]
    if restart_interval:
        head.append(_seg(0xFFDD, struct.pack(">H", restart_interval)))

    if px.ndim == 2:
        blocks, h, w = quantized_blocks(px)
        comps = [{"blocks": blocks, "H": 1, "V": 1, "dc": dc_l, "ac": ac_l}]
        scan = _encode_scan(comps, blocks.shape[0], blocks.shape[1], restart_interval)
        head += [
            _seg(0xFFDB, b"\x00" + _zz_bytes(_QTABLE)),  # DQT: Pq=0 Tq=0
            # SOF0: 8-bit, h x w, 1 component (id 1, 1x1 sampling, Tq 0)
            _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00"),
            _seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)),
            _seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS)),
            # SOS: 1 component, DC table 0 / AC table 0, full spectral range
            _seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00"),
            scan,
            b"\xff\xd9",
        ]
        return b"".join(head)

    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("pixels must be (h, w) grayscale or (h, w, 3) RGB")

    dc_c = _canonical_codes(_DC_BITS_C, _DC_VALS_C)
    ac_c = _canonical_codes(_AC_BITS_C, _AC_VALS_C)
    grids, h, w, hs, vs = _rgb_forward(px, subsampling)
    comps = [
        {"blocks": grids[0], "H": hs, "V": vs, "dc": dc_l, "ac": ac_l},
        {"blocks": grids[1], "H": 1, "V": 1, "dc": dc_c, "ac": ac_c},
        {"blocks": grids[2], "H": 1, "V": 1, "dc": dc_c, "ac": ac_c},
    ]
    mcus_y, mcus_x = grids[1].shape[:2]
    scan = _encode_scan(comps, mcus_y, mcus_x, restart_interval)
    sof = struct.pack(">BHHB", 8, h, w, 3) + bytes(
        [1, (hs << 4) | vs, 0, 2, 0x11, 1, 3, 0x11, 1]
    )
    head += [
        _seg(0xFFDB, b"\x00" + _zz_bytes(_QTABLE) + b"\x01" + _zz_bytes(_QTABLE_C)),
        _seg(0xFFC0, sof),
        _seg(0xFFC4, b"\x00" + bytes(_DC_BITS) + bytes(_DC_VALS)),
        _seg(0xFFC4, b"\x10" + bytes(_AC_BITS) + bytes(_AC_VALS)),
        _seg(0xFFC4, b"\x01" + bytes(_DC_BITS_C) + bytes(_DC_VALS_C)),
        _seg(0xFFC4, b"\x11" + bytes(_AC_BITS_C) + bytes(_AC_VALS_C)),
        # SOS: 3 components — Y tables 0/0, Cb and Cr tables 1/1
        _seg(0xFFDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 0x3F, 0])),
        scan,
        b"\xff\xd9",
    ]
    return b"".join(head)


# ---- decoder ----------------------------------------------------------------


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

    def restart(self, index: int) -> None:
        """Consume an RSTn at a restart boundary: discard padding bits to
        the byte boundary and check the marker's modulo-8 sequence number
        (T.81 E.2.4 / F.2.2.5)."""
        self.n = 0  # byte-align: drop any padding bits
        if self.pos + 2 > len(self.data):
            raise ValueError("JPEG scan truncated at restart boundary")
        m0, m1 = self.data[self.pos], self.data[self.pos + 1]
        if m0 != 0xFF or not (0xD0 <= m1 <= 0xD7):
            raise ValueError("expected RSTn marker at restart boundary")
        if (m1 - 0xD0) != (index & 7):
            raise ValueError(
                f"RST sequence error: expected RST{index & 7}, got RST{m1 - 0xD0}"
            )
        self.pos += 2


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


def _decode_block(br: _BitReader, dc_table: dict, ac_table: dict, prev_dc: int) -> tuple:
    """One 8x8 data unit -> (zigzag int32[64], new DC predictor)."""
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
    return zz, prev_dc


def decode_jpeg_pixels(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 array: (h, w) for single-component
    (grayscale) streams, (h, w, 3) RGB for three-component YCbCr streams
    (any integer sampling-factor ratios — 4:2:0 / 4:2:2 / 4:4:4 — decoded
    through the interleaved MCU layout; restart intervals honored).
    Generic over the stream's own DQT/DHT tables; progressive and 12-bit
    shapes raise at the documented seam."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}  # (class, id) -> (len, code) -> sym
    h = w = None
    frame_comps: list[dict] = []  # SOF order: {id, H, V, tq}
    scan_comps: list[dict] = []  # SOS order: frame comp + dc/ac table ids
    restart_interval = 0
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
        elif marker == 0xC0 or marker == 0xC1:  # baseline / extended sequential
            precision, h, w, ncomp = struct.unpack_from(">BHHB", body, 0)
            if precision != 8:
                raise NotImplementedError("only 8-bit sample precision")
            if ncomp not in (1, 3):
                raise NotImplementedError(
                    "single-component grayscale and three-component YCbCr "
                    "frames are supported; CMYK/4-component raises here"
                )
            for ci in range(ncomp):
                cid, hv, tq = body[6 + 3 * ci : 9 + 3 * ci]
                frame_comps.append(
                    {"id": cid, "H": hv >> 4, "V": hv & 0xF, "tq": tq}
                )
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA):
            raise NotImplementedError(
                "only baseline/extended sequential JPEG (SOF0/SOF1); "
                "progressive and lossless processes raise at this seam"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            if ns != len(frame_comps):
                raise NotImplementedError(
                    "multi-scan (non-interleaved) baseline streams are not "
                    "supported; all frame components must appear in one scan"
                )
            by_id = {c["id"]: c for c in frame_comps}
            for si in range(ns):
                cid, tbls = body[1 + 2 * si], body[2 + 2 * si]
                fc = by_id.get(cid)
                if fc is None:
                    raise ValueError(f"SOS references unknown component {cid}")
                scan_comps.append(dict(fc, dc=tbls >> 4, ac=tbls & 0xF))
            br = _BitReader(payload, pos + 2 + length)
            break
        pos += 2 + length
    if br is None or h is None:
        raise ValueError("JPEG stream missing SOF or SOS")

    hmax = max(c["H"] for c in scan_comps)
    vmax = max(c["V"] for c in scan_comps)
    for c in scan_comps:
        if c["H"] < 1 or c["V"] < 1 or hmax % c["H"] or vmax % c["V"]:
            raise NotImplementedError(
                "fractional chroma upsampling ratios are not supported"
            )
    interleaved = len(scan_comps) > 1
    if interleaved:
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        grids = [(mcus_y * c["V"], mcus_x * c["H"]) for c in scan_comps]
    else:
        # single-component scan: the MCU is one data unit over the
        # component's own grid (T.81 A.2.2)
        c = scan_comps[0]
        ch = -(-(h * c["V"]) // vmax)
        cw = -(-(w * c["H"]) // hmax)
        mcus_y, mcus_x = -(-ch // 8), -(-cw // 8)
        grids = [(mcus_y, mcus_x)]

    try:
        tables = [
            (htables[(0, c["dc"])], htables[(1, c["ac"])], qtables[c["tq"]])
            for c in scan_comps
        ]
    except KeyError as missing:
        raise ValueError(
            f"JPEG scan references undeclared table {missing}"
        ) from None

    blocks = [np.zeros((gy, gx, 8, 8), dtype=np.int32) for gy, gx in grids]
    prev_dc = [0] * len(scan_comps)
    mcu_index = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                br.restart(rst)
                rst += 1
                prev_dc = [0] * len(scan_comps)
            for ci, c in enumerate(scan_comps):
                ch_, cv_ = (c["H"], c["V"]) if interleaved else (1, 1)
                dc_t, ac_t, _ = tables[ci]
                for v in range(cv_):
                    for u in range(ch_):
                        zz, prev_dc[ci] = _decode_block(br, dc_t, ac_t, prev_dc[ci])
                        blocks[ci][my * cv_ + v, mx * ch_ + u][_ZZ_ROWS, _ZZ_COLS] = zz
            mcu_index += 1

    # decoder dequantizes with the STREAM's tables, not the module constants
    if len(scan_comps) == 1:
        return _inverse_plane(blocks[0], tables[0][2]).astype(np.uint8)[:h, :w]
    planes = []
    up = []
    for ci, c in enumerate(scan_comps):
        plane = _inverse_plane(blocks[ci], tables[ci][2])
        ch = -(-(h * c["V"]) // vmax)
        cw = -(-(w * c["H"]) // hmax)
        planes.append(plane[:ch, :cw])
        up.append((hmax // c["H"], vmax // c["V"]))
    return _reconstruct_color(planes, h, w, up)


def decode_jpeg_meta(payload: bytes) -> tuple[int, int, float]:
    """(width, height, mean_intensity) in the multimodal metadata shape;
    mean is over all channel bytes (so grayscale and RGB are uniform)."""
    px = decode_jpeg_pixels(payload)
    return int(px.shape[1]), int(px.shape[0]), float(px.mean()) / 255.0
