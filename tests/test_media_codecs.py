"""Real PNG/WAV codec tests: spec round trips across every filter type
and color type, an externally-produced golden PNG, corruption detection,
and the Spark encode→decode round-trip queries vs closed-form values."""

from __future__ import annotations

import base64
import struct
import zlib

import numpy as np
import pytest

from sparkstreaming_rawdataingestion_spark.operators import media_codecs as mc
from sparkstreaming_rawdataingestion_spark.operators import multimodal

# A 1x1 RGBA PNG produced by an external encoder (the canonical tiny
# transparent pixel) — proves spec compliance, not just self-consistency.
GOLDEN_1X1_RGBA = base64.b64decode(
    "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJ"
    "AAAADUlEQVR42mNkYPhfDwAChwGA60e6kgAAAABJRU5ErkJggg=="
)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
@pytest.mark.parametrize("color_type", [0, 2, 4, 6])
def test_png_roundtrip_every_filter_and_color_type(filter_type, color_type):
    rng = np.random.RandomState(31 * filter_type + color_type)
    ch = mc._PNG_CHANNELS[color_type]
    w, h = 13, 7
    rows = [bytes(rng.randint(0, 256, w * ch, dtype=np.uint8)) for _ in range(h)]
    data = mc.png_encode(rows, color_type=color_type, filter_type=filter_type)
    d = mc.png_decode(data)
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert d["bit_depth"] == 8 and d["color_type"] == color_type
    assert d["pixels"] == b"".join(rows)


def test_png_golden_external_file():
    d = mc.png_decode(GOLDEN_1X1_RGBA)
    assert (d["width"], d["height"]) == (1, 1)
    assert d["color_type"] == 6 and d["channels"] == 4
    assert len(d["pixels"]) == 4


def test_png_rejects_corruption():
    good = mc.png_encode([b"\x01\x02\x03"], color_type=0, filter_type=1)
    with pytest.raises(ValueError, match="signature"):
        mc.png_decode(b"JUNK" + good[4:])
    # flip one byte inside IHDR data -> CRC mismatch
    bad = bytearray(good)
    bad[16] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        mc.png_decode(bytes(bad))
    with pytest.raises(ValueError, match="truncated"):
        mc.png_decode(good[:-6])


def test_png_rejects_unsupported_bit_depth():
    ihdr = struct.pack(">IIBBBBB", 1, 1, 16, 0, 0, 0, 0)
    data = (
        mc.PNG_SIGNATURE
        + mc._png_chunk(b"IHDR", ihdr)
        + mc._png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + mc._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        mc.png_decode(data)


def test_wav_roundtrip_exact_samples():
    rng = np.random.RandomState(7)
    samples = [int(x) for x in rng.randint(-32768, 32768, 1000)]
    d = mc.wav_decode(mc.wav_encode(samples, framerate=16000))
    assert d["n_channels"] == 1 and d["sample_width"] == 2
    assert d["framerate"] == 16000 and d["n_frames"] == 1000
    assert d["samples"] == samples


def test_decode_image_meta_real_path_on_png(spark, sf_dir):
    media = multimodal.synthesize_png_media(spark, sf_dir).limit(20)
    out = multimodal.decode_image_meta(media, fake=False).collect()
    assert len(out) == 20
    for r in out:
        assert r.width == 8 + r.media_id % 9
        assert r.height == 8 + r.media_id % 7
        assert r.channels == (1 if r.media_id % 2 == 0 else 3)


def test_decode_image_meta_real_path_rejects_non_png(spark, sf_dir):
    media = multimodal.documents_as_media(spark, sf_dir).limit(5)
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        multimodal.decode_image_meta(media, fake=False).collect()


def test_png_roundtrip_query_matches_closed_form(spark, sf_dir):
    rows = multimodal.QUERIES["multimodal_png_roundtrip"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        i = r.media_id
        w, h, base, ch = 8 + i % 9, 8 + i % 7, i % 180, 1 + (i % 2) * 2
        assert (r.width, r.height, r.channels) == (w, h, ch)
        assert r.n_pixels == w * h
        assert r.mean_byte == base + (w * ch - 1) / 2.0 + (h - 1)
        assert r.max_byte == base + (w * ch - 1) + 2 * (h - 1)
        assert r.min_byte == base


def test_wav_roundtrip_query_matches_closed_form(spark, sf_dir):
    rows = multimodal.QUERIES["multimodal_wav_roundtrip"](spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        amp = 1000 + (r.media_id % 50) * 100
        assert r.n_frames == 400 + r.media_id % 100
        assert r.rms == float(amp) and r.peak == amp
        assert r.duration_ms == r.n_frames / 8.0
