"""The T.81 known-vector + roundtrip pins jpeg.py's docstring promises.

The encoder writes the spec's bit layout and the decoder re-derives it
from the spec; this file pins BOTH against T.81 itself:

* a HAND-ASSEMBLED baseline JPEG (every marker segment written by the
  test from the standard's own Annex K tables, scan bytes computed by
  hand from the huffman codes) must decode to the predicted pixels;
* the encoder's entropy-coded scan for the same image must equal the
  same hand-computed bytes;
* roundtrips for grayscale / RGB 4:4:4 / RGB 4:2:0 / restart markers;
* the closed-form solid-frame DC oracle (``solid_decoded_value``);
* T.81 B.1.1.2 marker-walk edge cases (FF fill bytes, standalone TEM);
* the AVI container walk, including the short-avih/strf quarantine.

Spark-free on purpose — these are the byte-level kernels the
``multimodal_*`` mapInPandas stages call.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sparkstreaming_rawdataingestion_spark.operators import jpeg, media_codecs

# ---------------------------------------------------------------------------
# Hand-assembled known vector.
#
# Image: solid 8×8 grayscale, value 130. DCT (orthonormal, level-shifted):
# only DC ≠ 0: dc = (130-128)·8 = 16. Annex K luma Q[0,0] = 16 →
# dc_q = round_away(16/16) = 1 → category 1, value bit "1".
#
# Huffman (T.81 K.3.1): DC-luma BITS = (0,1,5,1,...) assigns code "00"
# to category 0 and the five 3-bit codes "010".."110" to categories 1-5,
# so category 1 = "010". AC-luma EOB (symbol 0x00) is the 4-bit "1010".
#
# Scan bitstream: 010 | 1 | 1010  =  0101 1010  =  0x5A (exactly one
# byte, no padding needed).
# ---------------------------------------------------------------------------

HAND_SCAN = b"\x5a"


def _dqt_segment() -> bytes:
    zz = bytes(int(jpeg.QUANT_LUMA.reshape(-1)[jpeg.ZIGZAG[k]]) for k in range(64))
    body = b"\x00" + zz  # Pq=0 (8-bit), Tq=0
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


def _sof0_segment(w: int, h: int) -> bytes:
    body = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    return b"\xff\xc0" + struct.pack(">H", 2 + len(body)) + body


def _dht_segment(tc: int, th: int, bits, vals) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _sos_segment() -> bytes:
    body = bytes([1, 1, 0x00, 0, 63, 0])  # 1 comp, DC/AC table 0
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def hand_assembled_jpeg(scan: bytes = HAND_SCAN) -> bytes:
    return (
        b"\xff\xd8"
        + _dqt_segment()
        + _sof0_segment(8, 8)
        + _dht_segment(0, 0, jpeg.DC_LUMA_BITS, jpeg.DC_LUMA_VALS)
        + _dht_segment(1, 0, jpeg.AC_LUMA_BITS, jpeg.AC_LUMA_VALS)
        + _sos_segment()
        + scan
        + b"\xff\xd9"
    )


def test_known_vector_decode():
    """T.81 pin #1: the hand-assembled file decodes to the predicted
    solid plane — dc_q·Q₀₀/8 + 128 = 16/8 + 128 = 130 exactly."""
    d = jpeg.jpeg_decode(hand_assembled_jpeg())
    assert (d["width"], d["height"], d["n_components"]) == (8, 8, 1)
    assert d["subsampling"] == "gray"
    assert d["pixels"].shape == (8, 8)
    assert np.all(d["pixels"] == 130)


def test_known_vector_encode():
    """T.81 pin #2: the encoder's entropy-coded scan for the same image
    equals the hand-computed bytes (encoder vs the spec, not encoder vs
    decoder)."""
    data = jpeg.jpeg_encode(np.full((8, 8), 130, dtype=np.uint8))
    # scan bytes = after the SOS segment, before EOI
    sos = data.index(b"\xff\xda")
    (seglen,) = struct.unpack(">H", data[sos + 2 : sos + 4])
    scan = data[sos + 2 + seglen : -2]
    assert data[-2:] == b"\xff\xd9"
    assert scan == HAND_SCAN


def test_solid_closed_form_matrix():
    """Closed-form DC oracle across the value range, including both
    rounding directions and the clamp ends."""
    for v in (0, 1, 7, 8, 9, 127, 128, 129, 130, 200, 254, 255):
        img = np.full((8, 8), v, dtype=np.uint8)
        out = jpeg.jpeg_decode(jpeg.jpeg_encode(img))["pixels"]
        assert np.all(out == jpeg.solid_decoded_value(v)), v


def test_roundtrip_gray_lossy_bound():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(21, 13), dtype=np.uint8)  # edge pad
    d = jpeg.jpeg_decode(jpeg.jpeg_encode(img))
    assert d["pixels"].shape == (21, 13)
    err = np.abs(d["pixels"].astype(int) - img.astype(int))
    # uniform noise is JPEG's worst case (no spectral structure to keep);
    # Annex-K-quality baseline lands ~13 mean abs err — bound well below
    # the 64 a broken DC path would produce
    assert err.mean() < 20


def test_roundtrip_rgb_444_and_420():
    rng = np.random.default_rng(11)
    # smooth gradient — subsampling error stays small
    y, x = np.mgrid[0:24, 0:17]
    img = np.stack(
        [(x * 7) % 256, (y * 5) % 256, ((x + y) * 3) % 256], axis=-1
    ).astype(np.uint8)
    for sub, tag in ((False, "4:4:4"), (True, "4:2:0")):
        d = jpeg.jpeg_decode(jpeg.jpeg_encode(img, subsample=sub))
        assert d["subsampling"] == tag
        assert d["pixels"].shape == (24, 17, 3)
        err = np.abs(d["pixels"].astype(int) - img.astype(int))
        assert err.mean() < 16, tag
    del rng


def test_roundtrip_restart_markers():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 256, size=(32, 40), dtype=np.uint8)  # 20 MCUs
    data = jpeg.jpeg_encode(img, restart_interval=3)
    assert b"\xff\xdd" in data  # DRI present
    assert any(bytes([0xFF, 0xD0 + i]) in data for i in range(8))
    base = jpeg.jpeg_decode(jpeg.jpeg_encode(img))["pixels"]
    assert np.array_equal(jpeg.jpeg_decode(data)["pixels"], base)


def test_marker_walk_fill_bytes_and_tem():
    """T.81 B.1.1.2: FF fill bytes before a marker and standalone
    length-less markers (TEM) are legal — the walk must skip them, not
    parse them as length-bearing segments."""
    base = hand_assembled_jpeg()
    sof = base.index(b"\xff\xc0")
    padded = base[:sof] + b"\xff\xff\xff" + base[sof:]  # fill before SOF
    assert np.all(jpeg.jpeg_decode(padded)["pixels"] == 130)
    with_tem = base[:sof] + b"\xff\x01" + base[sof:]  # standalone TEM
    assert np.all(jpeg.jpeg_decode(with_tem)["pixels"] == 130)


def test_non_baseline_quarantine():
    base = hand_assembled_jpeg()
    progressive = base.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="non-baseline"):
        jpeg.jpeg_decode(progressive)
    with pytest.raises(ValueError, match="SOI"):
        jpeg.jpeg_decode(b"\x00\x01\x02")


# ---------------------------------------------------------------------------
# AVI / MJPEG container walk
# ---------------------------------------------------------------------------


def _clip(n_frames: int = 4, w: int = 9, h: int = 8) -> bytes:
    frames = [
        jpeg.jpeg_encode(np.full((h, w), (40 * i) % 256, dtype=np.uint8))
        for i in range(n_frames)
    ]
    return media_codecs.avi_mjpeg_encode(frames, w, h, fps=10)


def test_avi_walk_roundtrip():
    data = _clip()
    clip = media_codecs.avi_mjpeg_frames(data)
    assert (clip["width"], clip["height"], clip["fps"], clip["n_frames"]) == (
        9, 8, 10, 4,
    )
    for i, fb in enumerate(clip["frames"]):
        d = jpeg.jpeg_decode(fb)
        assert np.all(d["pixels"] == jpeg.solid_decoded_value((40 * i) % 256))


def test_avi_short_header_quarantine():
    """ADVICE r5: undersized avih/strf chunks must raise the documented
    ValueError, not read into the next chunk or die on struct.error."""
    data = _clip()
    avih_at = data.index(b"avih")
    (size,) = struct.unpack("<I", data[avih_at + 4 : avih_at + 8])
    assert size >= 56
    short = bytearray(data)
    struct.pack_into("<I", short, avih_at + 4, 8)  # declare avih size 8
    with pytest.raises(ValueError):
        media_codecs.avi_mjpeg_frames(bytes(short))
    strf_at = data.index(b"strf")
    short2 = bytearray(data)
    struct.pack_into("<I", short2, strf_at + 4, 4)  # declare strf size 4
    with pytest.raises(ValueError):
        media_codecs.avi_mjpeg_frames(bytes(short2))


def test_avi_non_mjpeg_quarantine():
    data = bytearray(_clip())
    at = data.index(b"MJPG", data.index(b"strf"))  # strf compression
    data[at : at + 4] = b"H264"
    with pytest.raises(ValueError, match="MJPG"):
        media_codecs.avi_mjpeg_frames(bytes(data))
