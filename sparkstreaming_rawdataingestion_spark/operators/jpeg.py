"""Pure-Python baseline JPEG codec (ITU T.81, JFIF) — stdlib + numpy.

The container has no Pillow/libav, so rounds 1-4 kept ``image/jpeg``
behind a documented ``NotImplementedError`` (multimodal.py). Baseline
sequential JPEG, however, needs nothing beyond ``struct`` for the marker
walk and numpy for the 8×8 DCT — so, like PNG/WAV (media_codecs.py),
it is decodable FOR REAL here: bytes in → verified markers → huffman
entropy decode → dequantize → IDCT → (optional chroma upsample +
YCbCr→RGB) → pixels out.

Scope (documented, enforced):
  * decode: baseline DCT (SOF0), 8-bit precision, 1 or 3 components,
    sampling factors h,v ∈ {1,2} (covers 4:4:4, 4:2:2, 4:2:0 and
    grayscale — the overwhelmingly common subset), optional restart
    markers (DRI/RSTn). Progressive (SOF2), arithmetic coding,
    12-bit, and 4-component CMYK raise ``ValueError`` so pipelines can
    quarantine instead of mis-decoding.
  * encode: grayscale, RGB 4:4:4, and RGB 4:2:0 with the standard
    Annex K quantization + huffman tables — enough to exercise every
    decoder path (interleaving, subsampling, restart intervals) with
    bytes WE did not also parse into existence: the encoder writes the
    spec's bit layout, the decoder re-derives it from the spec, and a
    hand-assembled known-vector test pins both against T.81 itself.

Determinism: quantization rounds half away from zero
(``trunc(x/q + copysign(0.5, x))``) and the final sample reconstruction
rounds half up after clamping — both pinned by tests, so solid-color
frames have CLOSED-FORM decoded statistics (only the DC coefficient is
nonzero: dc_q = round((v-128)·8 / Q₀₀), decoded value =
clamp(round(dc_q·Q₀₀/8) + 128)). That makes the full
huffman → dequantize → IDCT path oracle-checkable in exact integer
arithmetic (see multimodal.py's MJPEG roundtrip).

These functions are plain Python over bytes — Spark-free by design —
so they drop into Arrow-batched ``mapInPandas`` kernels where the
parallelism comes from input splits, not from this code.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Constant tables — ITU T.81 Annex K (the standard's own example tables,
# used by essentially every baseline encoder).
# ---------------------------------------------------------------------------

#: K.1 luminance quantization table, natural (row-major) order.
QUANT_LUMA = np.array(
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

#: K.2 chrominance quantization table.
QUANT_CHROMA = np.array(
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

#: Zig-zag scan: ZIGZAG[k] = row-major index of the k-th coefficient.
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Standard huffman table specs (BITS = #codes per length 1..16, then the
# symbol values in code order) — T.81 K.3.1/K.3.2.
DC_LUMA_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_LUMA_VALS = tuple(range(12))
DC_CHROMA_BITS = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_CHROMA_VALS = tuple(range(12))
AC_LUMA_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_LUMA_VALS = (
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
AC_CHROMA_BITS = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_CHROMA_VALS = (
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

# Orthonormal 8×8 DCT-II basis; M @ block @ M.T is exactly the T.81 FDCT
# (the 1/4·C(u)·C(v) normalization IS the orthonormal one).
_DCT_M = np.array(
    [
        [
            np.sqrt((1.0 if u == 0 else 2.0) / 8.0)
            * np.cos((2 * x + 1) * u * np.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)


def _canonical_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per the canonical construction (T.81 C.2)."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_ENC_TABLES = {
    ("dc", 0): _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
    ("ac", 0): _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
    ("dc", 1): _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS),
    ("ac", 1): _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS),
}


def _quantize(coefs: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Round half away from zero — deterministic and sign-symmetric
    (numpy's .round() would tie to even; the difference is observable on
    solid-color blocks, so the convention is pinned by tests)."""
    x = coefs / q
    return np.trunc(x + np.copysign(0.5, x)).astype(np.int32)


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """(by, bx, 8, 8) level-shifted spatial blocks → DCT coefficients."""
    return np.einsum("ux,...xy,vy->...uv", _DCT_M, plane, _DCT_M)


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    return np.einsum("xu,...uv,yv->...xy", _DCT_M.T, coefs, _DCT_M.T)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def pad_to_byte(self) -> None:
        """1-fill to a byte boundary (spec padding before a marker)."""
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended bits) for a DC difference / AC value."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << t) - 1
    return t, bits


def _encode_block(
    w: _BitWriter, zz: np.ndarray, pred: int, dc_tab: dict, ac_tab: dict
) -> int:
    """Huffman-encode one zigzagged quantized block; returns its DC."""
    dc = int(zz[0])
    t, bits = _magnitude(dc - pred)
    code, length = dc_tab[t]
    w.write(code, length)
    if t:
        w.write(bits, t)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:  # ZRL
            code, length = ac_tab[0xF0]
            w.write(code, length)
            run -= 16
        t, bits = _magnitude(v)
        code, length = ac_tab[(run << 4) | t]
        w.write(code, length)
        w.write(bits, t)
        run = 0
    if last_nz < 63:
        code, length = ac_tab[0x00]  # EOB
        w.write(code, length)
    return dc


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """HxW uint8 plane → (by, bx, 8, 8) float blocks, edge-replicated to
    a multiple of 8 (replication keeps block energy low at borders)."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(plane, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    bh, bw = padded.shape[0] // 8, padded.shape[1] // 8
    return (
        padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3) - 128.0
    )


def _subsample2(plane: np.ndarray) -> np.ndarray:
    """2×2 box-average chroma subsample (edge-replicated to even dims)."""
    h, w = plane.shape
    p = np.pad(plane, ((0, h % 2), (0, w % 2)), mode="edge").astype(np.float64)
    return (
        p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2).mean(axis=(1, 3))
    )


def rgb_to_ycbcr(rgb: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr (floats, not yet rounded)."""
    r, g, b = (rgb[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def ycbcr_to_rgb(ycc: np.ndarray) -> np.ndarray:
    y, cb, cr = (ycc[..., i] for i in range(3))
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def _dqt_segment() -> bytes:
    zz_l = QUANT_LUMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    zz_c = QUANT_CHROMA.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
    body = b"\x00" + zz_l + b"\x01" + zz_c
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _dht_segment() -> bytes:
    body = bytearray()
    for tc_th, bits, vals in (
        (0x00, DC_LUMA_BITS, DC_LUMA_VALS),
        (0x10, AC_LUMA_BITS, AC_LUMA_VALS),
        (0x01, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (0x11, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        body.append(tc_th)
        body += bytes(bits)
        body += bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + bytes(body)


def jpeg_encode(
    pixels: np.ndarray, subsample: bool = False, restart_interval: int = 0
) -> bytes:
    """Encode an (H, W) grayscale or (H, W, 3) RGB uint8 array as a
    baseline JFIF JPEG with the Annex K tables.

    ``subsample=True`` (color only) writes 4:2:0 (luma 2×2, chroma 1×1);
    otherwise 4:4:4 / grayscale. ``restart_interval`` > 0 emits DRI +
    RSTn markers every that-many MCUs (exercises the decoder's restart
    resync path).
    """
    pixels = np.asarray(pixels, dtype=np.uint8)
    gray = pixels.ndim == 2
    if not gray and (pixels.ndim != 3 or pixels.shape[2] != 3):
        raise ValueError("pixels must be (H, W) gray or (H, W, 3) RGB")
    h, w = pixels.shape[:2]
    if not h or not w:
        raise ValueError("empty image")
    if gray:
        comps = [(1, 1, 0, pixels.astype(np.float64))]  # (h, v, tq, plane)
    else:
        ycc = rgb_to_ycbcr(pixels)
        if subsample:
            comps = [
                (2, 2, 0, ycc[..., 0]),
                (1, 1, 1, _subsample2(ycc[..., 1])),
                (1, 1, 1, _subsample2(ycc[..., 2])),
            ]
        else:
            comps = [
                (1, 1, 0, ycc[..., 0]),
                (1, 1, 1, ycc[..., 1]),
                (1, 1, 1, ycc[..., 2]),
            ]

    # Per-component quantized blocks in (by, bx, 64) zigzag order.
    comp_blocks = []
    for _, _, tq, plane in comps:
        q = QUANT_LUMA if tq == 0 else QUANT_CHROMA
        blocks = _plane_blocks(np.asarray(plane))
        coefs = _quantize(_fdct_blocks(blocks), q.astype(np.float64))
        zz = coefs.reshape(*coefs.shape[:2], 64)[..., ZIGZAG]
        comp_blocks.append(zz)

    out = bytearray(b"\xff\xd8")  # SOI
    # JFIF APP0
    app0 = b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    out += b"\xff\xe0" + struct.pack(">H", len(app0) + 2) + app0
    out += _dqt_segment()
    # SOF0
    sof = bytearray(struct.pack(">BHHB", 8, h, w, len(comps)))
    for cid, (ch, cv, tq, _) in enumerate(comps, start=1):
        sof += bytes((cid, (ch << 4) | cv, tq))
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + bytes(sof)
    out += _dht_segment()
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    # SOS
    sos = bytearray([len(comps)])
    for cid, (_, _, tq, _) in enumerate(comps, start=1):
        sos += bytes((cid, 0x00 if tq == 0 else 0x11))
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + bytes(sos)

    max_h = max(c[0] for c in comps)
    max_v = max(c[1] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    writer = _BitWriter()
    preds = [0] * len(comps)
    rst = 0
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_index and mcu_index % restart_interval == 0:
                writer.pad_to_byte()
                out += writer.out
                writer = _BitWriter()
                out += bytes((0xFF, 0xD0 + rst))
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (ch, cv, tq, _) in enumerate(comps):
                zz = comp_blocks[ci]
                tab = 0 if tq == 0 else 1
                for by in range(cv):
                    for bx in range(ch):
                        ry = min(my * cv + by, zz.shape[0] - 1)
                        rx = min(mx * ch + bx, zz.shape[1] - 1)
                        preds[ci] = _encode_block(
                            writer,
                            zz[ry, rx],
                            preds[ci],
                            _ENC_TABLES[("dc", tab)],
                            _ENC_TABLES[("ac", tab)],
                        )
            mcu_index += 1
    writer.pad_to_byte()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing and marker stop."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("entropy data exhausted at marker")
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy-coded data")
        byte = self.data[self.pos]
        self.pos += 1
        if byte == 0xFF:
            if self.pos >= len(self.data):
                raise ValueError("truncated after 0xFF")
            nxt = self.data[self.pos]
            if nxt == 0x00:
                self.pos += 1  # stuffed
            else:
                self.marker = nxt
                self.pos += 1
                raise ValueError("entropy data exhausted at marker")
        self._acc = (self._acc << 8) | byte
        self._n += 8

    def read_bit(self) -> int:
        if not self._n:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_and_expect_rst(self, which: int) -> None:
        """Consume padding to the RSTn marker (restart resync)."""
        self._acc = 0
        self._n = 0
        if self.marker is None:
            # padding bits were already skipped by the byte-align reset;
            # the next bytes must be FF Dn
            if (
                self.pos + 1 >= len(self.data)
                or self.data[self.pos] != 0xFF
            ):
                raise ValueError("expected restart marker")
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        if self.marker != 0xD0 + which:
            raise ValueError(
                f"restart marker out of sequence: {self.marker:#x}"
            )
        self.marker = None


def _decode_huffman_tables(body: bytes) -> dict[tuple[int, int], dict]:
    """DHT body → {(class, id): {(code, length): symbol}} lookup maps."""
    tables: dict[tuple[int, int], dict] = {}
    pos = 0
    while pos < len(body):
        tc_th = body[pos]
        bits = body[pos + 1 : pos + 17]
        n = sum(bits)
        vals = body[pos + 17 : pos + 17 + n]
        if len(bits) != 16 or len(vals) != n:
            raise ValueError("truncated DHT segment")
        lut: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                lut[(code, length)] = vals[k]
                code += 1
                k += 1
            code <<= 1
        tables[(tc_th >> 4, tc_th & 0x0F)] = lut
        pos += 17 + n
    return tables


def _read_symbol(r: _BitReader, lut: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = lut.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _extend(bits: int, t: int) -> int:
    if t == 0:
        return 0
    return bits if bits >= (1 << (t - 1)) else bits - (1 << t) + 1


def jpeg_decode(data: bytes) -> dict:
    """Decode a baseline JFIF JPEG.

    Returns ``{width, height, n_components, subsampling, pixels}`` where
    ``pixels`` is (H, W) uint8 for grayscale or (H, W, 3) RGB, and
    ``subsampling`` is e.g. ``"4:4:4"`` / ``"4:2:0"`` / ``"gray"``.
    Progressive / arithmetic / 12-bit / >3-component files raise
    ``ValueError`` (quarantine, never mis-decode).
    """
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    sof = None
    restart_interval = 0
    while True:
        if pos + 2 > len(data):
            raise ValueError("truncated marker segment")
        if data[pos] != 0xFF:
            raise ValueError(f"expected marker at {pos}")
        # T.81 B.1.1.2: markers may be preceded by any number of 0xFF
        # fill bytes — skip to the last FF of the run
        while pos + 1 < len(data) and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > len(data):
            raise ValueError("truncated marker segment")
        marker = data[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD9:
            # standalone length-less markers (TEM, RSTn, SOI, EOI) carry
            # no segment body — treating them as length-bearing would
            # swallow the following segment
            pos += 2
            continue
        if pos + 4 > len(data):
            raise ValueError("truncated marker segment")
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                      0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG (non-baseline SOF marker {marker:#x} — "
                "progressive/extended/arithmetic)"
            )
        (seglen,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        body = data[pos + 4 : pos + 2 + seglen]
        if len(body) != seglen - 2:
            raise ValueError("truncated segment body")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(body):
                pq, tq = body[p] >> 4, body[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables unsupported")
                zz = np.frombuffer(body[p + 1 : p + 65], dtype=np.uint8)
                if zz.size != 64:
                    raise ValueError("truncated DQT table")
                nat = np.zeros(64, dtype=np.int32)
                nat[ZIGZAG] = zz
                qtables[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            htables.update(_decode_huffman_tables(body))
        elif marker == 0xC0:  # SOF0 baseline
            prec, height, width, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise ValueError(f"unsupported precision {prec}")
            if nc not in (1, 3):
                raise ValueError(f"unsupported component count {nc}")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                ch, cv = hv >> 4, hv & 0x0F
                if ch not in (1, 2) or cv not in (1, 2):
                    raise ValueError(f"unsupported sampling {ch}x{cv}")
                comps.append({"id": cid, "h": ch, "v": cv, "tq": tq})
            sof = {"width": width, "height": height, "comps": comps}
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if sof is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tabs = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in sof["comps"] if c["id"] == cs)
                scan.append((comp, tabs >> 4, tabs & 0x0F))
            pos = pos + 2 + seglen
            break
        # APPn / COM / anything else: skip
        pos += 2 + seglen

    w, h = sof["width"], sof["height"]
    comps = sof["comps"]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    # per-component coefficient planes in MCU-padded block units
    planes = {
        c["id"]: np.zeros(
            (mcus_y * c["v"] * 8, mcus_x * c["h"] * 8), dtype=np.float64
        )
        for c in comps
    }
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c in comps}
    rst = 0
    mcu_index = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if (
                restart_interval
                and mcu_index
                and mcu_index % restart_interval == 0
            ):
                reader.align_and_expect_rst(rst)
                rst = (rst + 1) % 8
                preds = {c["id"]: 0 for c in comps}
            for comp, td, ta in scan:
                dc_lut = htables.get((0, td))
                ac_lut = htables.get((1, ta))
                if dc_lut is None or ac_lut is None:
                    raise ValueError("scan references missing huffman table")
                q = qtables.get(comp["tq"])
                if q is None:
                    raise ValueError("scan references missing quant table")
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _read_symbol(reader, dc_lut)
                        diff = _extend(reader.read_bits(t), t)
                        preds[comp["id"]] += diff
                        zz[0] = preds[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _read_symbol(reader, ac_lut)
                            r_run, t = rs >> 4, rs & 0x0F
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += r_run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(reader.read_bits(t), t)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * q.reshape(-1)[ZIGZAG]
                        px = _idct_blocks(block.reshape(8, 8))
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0 : y0 + 8, x0 : x0 + 8] = px
            mcu_index += 1

    # reconstruct: +128, round half up, clamp, crop, upsample
    out_planes = []
    for c in comps:
        p = planes[c["id"]] + 128.0
        p = np.clip(np.floor(p + 0.5), 0, 255)
        cw = -(-w * c["h"] // max_h)
        chh = -(-h * c["v"] // max_v)
        p = p[:chh, :cw]
        if c["h"] != max_h or c["v"] != max_v:
            p = np.repeat(
                np.repeat(p, max_v // c["v"], axis=0), max_h // c["h"], axis=1
            )[:h, :w]
        else:
            p = p[:h, :w]
        out_planes.append(p)

    if len(comps) == 1:
        pixels = out_planes[0].astype(np.uint8)
        sub = "gray"
    else:
        ycc = np.stack(out_planes, axis=-1)
        pixels = ycbcr_to_rgb(ycc)
        sub = (
            "4:4:4"
            if max_h == 1 and max_v == 1
            else ("4:2:0" if (max_h, max_v) == (2, 2) else f"{max_h}x{max_v}")
        )
    return {
        "width": w,
        "height": h,
        "n_components": len(comps),
        "subsampling": sub,
        "pixels": pixels,
    }


def solid_decoded_value(v: int) -> int:
    """Closed-form decoded value of a solid grayscale image of value
    ``v`` under the Annex K luma table — the exact-integer oracle for
    the DC-only path (encoder rounds half away from zero, reconstruction
    rounds half up; both pinned by tests):

        dc   = (v - 128) * 8                 # orthonormal DC of a block
        dc_q = round_away(dc / 16)           # Q[0,0] = 16 → = round(v-128)/2
        out  = clamp(round_half_up(dc_q * 16 / 8) + 128)
    """
    dc = (v - 128) * 8.0
    x = dc / int(QUANT_LUMA[0, 0])
    dc_q = int(np.trunc(x + np.copysign(0.5, x))) if x else 0
    rec = dc_q * int(QUANT_LUMA[0, 0]) / 8.0 + 128.0
    return int(min(255, max(0, np.floor(rec + 0.5))))
