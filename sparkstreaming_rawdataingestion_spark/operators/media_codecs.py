"""Pure-stdlib media codecs: real PNG and WAV encode/decode, plus the
RIFF/AVI container for MJPEG video (frame payloads are opaque bytes
here; operators/jpeg.py decodes them).

The container has no Pillow/libav, but PNG and WAV are simple enough to
decode for real with only ``zlib`` + ``struct`` (PNG: chunk walk, CRC
verification, IDAT inflate, all five scanline filters) and the stdlib
``wave`` module (RIFF/WAVE PCM). These kernels replace the round-1
``NotImplementedError`` stub (see operators/multimodal.py) for the two
formats, making the multimodal decode path *real*: bytes in → verified
structure + pixel/sample statistics out. Round 5 extends the same
treatment to video: ``avi_mjpeg_encode``/``avi_mjpeg_frames`` walk the
RIFF chunk tree (LIST hdrl → avih/strl, LIST movi → 00dc frames) so
frame *sampling* — the access pattern a training pipeline actually
needs (grab every Nth frame, decode only those) — runs against a real
container, not a byte-offset stub.

Scope (documented, asserted): PNG bit depth 8, color types 0 (gray),
2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlacing — the overwhelmingly
common subset; WAV PCM 16-bit; AVI single-'vids'-stream MJPG. Anything
else raises ``ValueError`` so a pipeline can route unsupported payloads
to a quarantine column instead of silently mis-decoding.

These functions are plain Python on bytes — Spark-free by design — so
they drop into Arrow-batched ``mapInPandas`` kernels (multimodal.py)
where parallelism comes from input splits, not from this code.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type (bit depth 8, no palette)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _filter_scanline(ftype: int, cur: bytes, prior: bytes, bpp: int) -> bytes:
    """Apply PNG filter ``ftype`` to a raw scanline (encoder side)."""
    out = bytearray(len(cur))
    for i in range(len(cur)):
        a = cur[i - bpp] if i >= bpp else 0  # left
        b = prior[i]  # up
        c = prior[i - bpp] if i >= bpp else 0  # upper-left
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[i] = (cur[i] - pred) & 0xFF
    return bytes(out)


def _defilter_scanline(ftype: int, cur: bytes, prior: bytes, bpp: int) -> bytes:
    """Invert PNG filter ``ftype`` (decoder side). Reconstruction must be
    sequential — each byte depends on already-reconstructed neighbors."""
    out = bytearray(cur)
    for i in range(len(out)):
        a = out[i - bpp] if i >= bpp else 0
        b = prior[i]
        c = prior[i - bpp] if i >= bpp else 0
        if ftype == 0:
            pred = 0
        elif ftype == 1:
            pred = a
        elif ftype == 2:
            pred = b
        elif ftype == 3:
            pred = (a + b) // 2
        elif ftype == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[i] = (out[i] + pred) & 0xFF
    return bytes(out)


def png_encode(
    rows: list[bytes], color_type: int = 0, filter_type: int = 0
) -> bytes:
    """Encode raw 8-bit scanlines into a spec-compliant PNG.

    ``rows``: one ``bytes`` per scanline, each ``width * channels`` long.
    All five filter types are supported so the decoder's defiltering can
    be exercised for real.
    """
    channels = _PNG_CHANNELS[color_type]
    height = len(rows)
    if height == 0 or len(rows[0]) % channels:
        raise ValueError("rows must be non-empty and width*channels long")
    width = len(rows[0]) // channels
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    prior = b"\x00" * len(rows[0])
    raw = bytearray()
    for row in rows:
        if len(row) != len(prior):
            raise ValueError("ragged scanlines")
        raw.append(filter_type)
        raw += _filter_scanline(filter_type, row, prior, channels)
        prior = row  # filters reference the *raw* prior scanline
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def png_decode(data: bytes) -> dict:
    """Decode a PNG: verified chunk walk → IDAT inflate → defilter.

    Returns ``{width, height, bit_depth, color_type, channels, pixels}``
    with ``pixels`` the raw bytes in scanline order (filters removed).
    CRCs are checked; truncated / corrupt / unsupported files raise
    ``ValueError``.
    """
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat, ended = 8, None, bytearray(), False
    while pos < len(data):
        if pos + 8 > len(data):
            raise ValueError("truncated chunk header")
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(data):
            raise ValueError("truncated chunk body")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended:
        raise ValueError("missing IHDR or IEND")
    width, height, bit_depth, color_type, comp, filt, interlace = ihdr
    if bit_depth != 8 or color_type not in _PNG_CHANNELS:
        raise ValueError(
            f"unsupported PNG (bit_depth={bit_depth}, color_type={color_type})"
        )
    if comp or filt or interlace:
        raise ValueError("unsupported compression/filter/interlace method")
    channels = _PNG_CHANNELS[color_type]
    stride = width * channels
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT length does not match dimensions")
    prior = b"\x00" * stride
    pixels = bytearray()
    for y in range(height):
        line = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        cur = _defilter_scanline(line[0], line[1:], prior, channels)
        pixels += cur
        prior = cur
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "channels": channels,
        "pixels": bytes(pixels),
    }


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def wav_encode(samples, framerate: int = 8000) -> bytes:
    """Encode 16-bit signed mono PCM samples into a WAV file."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(framerate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def wav_decode(data: bytes) -> dict:
    """Decode a PCM WAV via the stdlib ``wave`` reader.

    Returns ``{n_channels, sample_width, framerate, n_frames, samples}``
    with ``samples`` a list of signed ints (16-bit PCM only).
    """
    with wave.open(io.BytesIO(data), "rb") as w:
        n_channels = w.getnchannels()
        sample_width = w.getsampwidth()
        framerate = w.getframerate()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    if sample_width != 2:
        raise ValueError(f"unsupported sample width {sample_width}")
    samples = list(struct.unpack(f"<{n_frames * n_channels}h", frames))
    return {
        "n_channels": n_channels,
        "sample_width": sample_width,
        "framerate": framerate,
        "n_frames": n_frames,
        "samples": samples,
    }


# ---------------------------------------------------------------------------
# AVI (RIFF) container — MJPEG video
# ---------------------------------------------------------------------------


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""  # RIFF chunks are word-aligned
    return fourcc + struct.pack("<I", len(body)) + body + pad


def _riff_list(list_type: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", list_type + body)


def avi_mjpeg_encode(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Pack JPEG frame payloads into a spec-shaped AVI: RIFF('AVI ') →
    LIST hdrl (avih + LIST strl(strh 'vids'/'MJPG' + strf BITMAPINFO-
    HEADER)) → LIST movi ('00dc' per frame) → idx1 index."""
    if not frames:
        raise ValueError("no frames")
    max_size = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # microseconds per frame
        max_size * fps,  # max bytes/sec (upper bound)
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # initial frames
        1,  # streams
        max_size,  # suggested buffer
        width,
        height,
        0, 0, 0, 0,  # reserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<10I4H",
            0, 0, 0,  # flags, priority+language, initial frames
            1, fps,  # scale, rate → fps frames/sec
            0, len(frames),  # start, length
            max_size, 0xFFFFFFFF, 0,  # buffer, quality(-1), sample size
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<I2i2H2I2i2I",
        40, width, height, 1, 24,
        int.from_bytes(b"MJPG", "little"), width * height * 3,
        0, 0, 0, 0,
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    movi_body = bytearray()
    offsets = []  # offset of each 00dc fourcc relative to 'movi' type word
    for f in frames:
        offsets.append(4 + len(movi_body))
        movi_body += _riff_chunk(b"00dc", f)
    movi = _riff_list(b"movi", bytes(movi_body))
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            b"00dc" + struct.pack("<3I", 0x10, off, len(f))
            for off, f in zip(offsets, frames)
        ),
    )
    return _riff_chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def avi_mjpeg_frames(data: bytes) -> dict:
    """Walk a RIFF/AVI container and extract the MJPEG frame payloads.

    Returns ``{width, height, fps, n_frames, frames}`` (``frames`` =
    list of JPEG bytes, in stream order). Validates the RIFF signature,
    the avih header, and the MJPG fourcc; truncated or non-MJPEG files
    raise ``ValueError``.
    """
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI (bad RIFF signature)")
    (riff_size,) = struct.unpack("<I", data[4:8])
    if riff_size + 8 > len(data):
        raise ValueError("truncated RIFF payload")

    avih = None
    compression = None
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal avih, compression
        while pos + 8 <= end:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
            body_start = pos + 8
            if body_start + size > end:
                raise ValueError(f"truncated {fourcc!r} chunk")
            if fourcc == b"LIST":
                walk(body_start + 4, body_start + size)  # skip list type
            elif fourcc == b"avih":
                # fixed-size reads must respect the DECLARED chunk size —
                # an undersized avih would otherwise read into the next
                # chunk, and a short buffer would raise struct.error
                # instead of the documented ValueError quarantine
                if size < 56:
                    raise ValueError(f"avih chunk too short ({size} < 56)")
                avih = struct.unpack("<14I", data[body_start : body_start + 56])
            elif fourcc == b"strf":
                if size < 20:
                    raise ValueError(f"strf chunk too short ({size} < 20)")
                compression = data[body_start + 16 : body_start + 20]
            elif fourcc[2:4] in (b"dc", b"db"):  # compressed/uncompressed frame
                frames.append(data[body_start : body_start + size])
            pos = body_start + size + (size % 2)

    walk(12, 8 + riff_size)
    if avih is None:
        raise ValueError("missing avih header")
    if compression != b"MJPG":
        raise ValueError(f"unsupported video codec {compression!r} (MJPG only)")
    us_per_frame, _, _, _, total_frames = avih[:5]
    if len(frames) != total_frames:
        raise ValueError(
            f"frame count mismatch: avih says {total_frames}, movi has {len(frames)}"
        )
    return {
        "width": avih[8],
        "height": avih[9],
        "fps": round(1_000_000 / us_per_frame) if us_per_frame else 0,
        "n_frames": total_frames,
        "frames": frames,
    }
