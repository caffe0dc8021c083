"""Multimodal column conventions — image/audio/video as opaque ``binary``
payloads with typed metadata (BASELINE.json north star).

This generalizes the reference's schemaless-payload pattern (the opaque
``sample`` JSON string, RawDataIngestion.java:140) to binary media: the
engine never imposes structure on the payload at rest; decode/feature
steps are explicit Arrow-batched ``mapInPandas`` stages.

PNG, WAV, JPEG and MJPEG/AVI are decoded FOR REAL with stdlib+numpy
codecs (operators/media_codecs.py: chunk walk + CRC verify + IDAT
inflate + all five scanline filters; RIFF/WAVE PCM; RIFF/AVI walk —
and operators/jpeg.py: baseline T.81 huffman + DCT, 4:4:4/4:2:0/gray,
restart markers) — see the ``*_roundtrip`` queries and the MJPEG
frame-sample stage below, whose decoded stats an arithmetic oracle
predicts exactly (solid frames exercise the DC path in closed form).
``decode_image_meta(..., fake=True)`` keeps the deterministic
pseudo-decode (byte-length arithmetic) used by the long-standing
``multimodal_decode_meta`` oracle row; ``fake=False`` routes PNG *and*
JPEG payloads through the real decoders and raises NotImplementedError
only for genuinely absent codecs (progressive JPEG, non-MJPEG video —
no Pillow/libav in this container). The Spark-side plumbing — binary
schema, Arrow batch transfer, UDF signatures, partition-parallel
decode — is identical either way.

Scale notes: payloads ride the scan as a single binary column (parquet
keeps them row-group-local); decode is a pure map (zero shuffle) whose
parallelism = input splits; Arrow batching amortizes Python crossing to
~10k rows per hop.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import (
    DataFrame,
    SparkSession,
    Window,
    functions as F,
    types as T,
)

from .. import catalog
from ..session import spread_small_scan

QUERIES: dict = {}
ORACLES: dict = {}


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# Convention: one row per media object.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("payload", T.BinaryType()),
    ]
)

DECODED_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


def documents_as_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixture adapter: documents' text bytes stand in for media payloads
    (no binary test table exists; the byte path is identical)."""
    d = catalog.load_table(spark, sf_dir, "documents")
    return spread_small_scan(d).select(
        F.col("doc_id").alias("media_id"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def decode_image_meta(
    media: DataFrame, fake: bool = True, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Arrow-batched decode stage: payload → (dims, channels).

    ``fake=True``: deterministic pseudo-decode from byte length (the
    oracle-checkable path). ``fake=False``: REAL decode — ``image/png``
    payloads go through media_codecs.png_decode (stdlib zlib/struct)
    and ``image/jpeg`` through jpeg.jpeg_decode (baseline T.81,
    operators/jpeg.py). Quarantine contract: payloads that are neither
    PNG nor JPEG raise NotImplementedError (no Pillow/libav in this
    container); JPEG-signature payloads the baseline decoder does not
    cover (progressive/arithmetic/12-bit/CMYK) raise **ValueError**
    from jpeg_decode — route on both exception types.
    ``carry``: extra input columns passed through the decode batch
    unchanged (the pattern a real pipeline needs to keep digests/ids
    alongside decoded metadata without a re-join).
    """
    out_schema = T.StructType(
        list(DECODED_META_SCHEMA.fields) + [media.schema[c] for c in carry]
    )

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            if not fake:
                from . import jpeg as jpeg_codec

                decoded = []
                for b in pdf["payload"]:
                    raw = bytes(b)
                    if raw[:8] == media_codecs.PNG_SIGNATURE:
                        d = media_codecs.png_decode(raw)
                        decoded.append(
                            (d["width"], d["height"], d["channels"])
                        )
                    elif raw[:2] == b"\xff\xd8":
                        d = jpeg_codec.jpeg_decode(raw)
                        decoded.append(
                            (d["width"], d["height"], d["n_components"])
                        )
                    else:
                        raise NotImplementedError(
                            "unrecognized image payload (PNG and baseline "
                            "JPEG decode natively; anything else needs "
                            "Pillow/libav, absent in this environment)"
                        )
                out = {
                    "media_id": pdf["media_id"],
                    "byte_len": pdf["payload"].map(len),
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "channels": [d[2] for d in decoded],
                }
                out.update({c: pdf[c] for c in carry})
                yield pd.DataFrame(out)
                continue
            lens = pdf["payload"].map(len)
            out = {
                "media_id": pdf["media_id"],
                "byte_len": lens,
                "width": 16 + lens % 64,
                "height": 16 + (lens // 64) % 64,
                "channels": 1 + lens % 3,
            }
            out.update({c: pdf[c] for c in carry})
            yield pd.DataFrame(out)

    return media.mapInPandas(decode_batches, schema=out_schema)


def sample_frames(media: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """Byte-offset frame-sampling sketch: one row per sampled 'frame'
    offset — the container-agnostic fan-out plumbing (1 payload → N
    rows). For REAL frame extraction from MJPEG/AVI payloads (container
    walk + per-frame JPEG decode) use ``sample_video_frames`` below;
    codecs beyond MJPEG would need libav, absent in this container."""
    n_frames = (F.octet_length("payload") / every_n_bytes).cast("int") + 1
    return media.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_idx"),
    ).select(
        "media_id",
        "frame_idx",
        (F.col("frame_idx") * every_n_bytes).alias("byte_offset"),
    )


@_register(
    "multimodal_binary_stats",
    """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS INTEGER) AS byte_len,
       sha256(text)                                AS payload_sha256,
       lower(hex(encode(substr(text, 1, 8))))      AS prefix_hex
FROM documents
""",
)
def q_multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-JVM binary column ops: length, digest, prefix — the metadata
    pass that runs before any Python decode at scale."""
    m = documents_as_media(spark, sf_dir)
    return m.select(
        "media_id",
        F.octet_length("payload").alias("byte_len"),
        F.sha2("payload", 256).alias("payload_sha256"),
        F.lower(F.hex(F.substring("payload", 1, 8))).alias("prefix_hex"),
    )


@_register(
    "multimodal_decode_meta",
    """
SELECT doc_id AS media_id,
       CAST(octet_length(encode(text)) AS INTEGER)            AS byte_len,
       CAST(16 + octet_length(encode(text)) % 64 AS INTEGER)  AS width,
       CAST(16 + (octet_length(encode(text)) // 64) % 64 AS INTEGER) AS height,
       CAST(1 + octet_length(encode(text)) % 3 AS INTEGER)    AS channels
FROM documents
""",
)
def q_multimodal_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode stage end-to-end (fake kernel): proves the
    Arrow round trip, batch schema, and deterministic output."""
    return decode_image_meta(documents_as_media(spark, sf_dir), fake=True)


# ---------------------------------------------------------------------------
# REAL codec round trips (media_codecs.py) — encode and decode are separate
# Arrow stages, so the decoder is exercised on actual PNG/WAV bytes, and an
# arithmetic oracle predicts every decoded statistic from doc_id alone.
# ---------------------------------------------------------------------------

PNG_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("bit_depth", T.IntegerType()),
        T.StructField("color_type", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_pixels", T.LongType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("min_byte", T.IntegerType()),
    ]
)


def synthesize_png_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode stage: one real PNG per document, parameterized by doc_id.

    byte(i, y) = base + i + 2*y over a width*channels stride — bounded
    so no mod-256 wrap occurs (base<=179, i<=47, 2y<=26 → max 252),
    keeping the decoded statistics closed-form. Filter type cycles
    through all five PNG filters; gray and RGB alternate.
    """
    d = catalog.load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (8 + F.col("doc_id") % 9).cast("int").alias("w"),
        (8 + F.col("doc_id") % 7).cast("int").alias("h"),
        (F.col("doc_id") % 180).cast("int").alias("base"),
        (F.col("doc_id") % 5).cast("int").alias("ftype"),
        (1 + (F.col("doc_id") % 2) * 2).cast("int").alias("ch"),
    )

    def encode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            payloads = []
            for r in pdf.itertuples():
                stride = r.w * r.ch
                rows = [
                    bytes((r.base + i + 2 * y) & 0xFF for i in range(stride))
                    for y in range(r.h)
                ]
                payloads.append(
                    media_codecs.png_encode(
                        rows,
                        color_type=0 if r.ch == 1 else 2,
                        filter_type=r.ftype,
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": "image/png",
                    "payload": payloads,
                }
            )

    # round 14: spread the single-partition documents scan before the
    # codec map so encode (and every downstream fingerprint stage that
    # inherits this partitioning) uses the whole session, not one core
    return spread_small_scan(d).mapInPandas(
        encode_batches, schema=MEDIA_SCHEMA
    )


def decode_png_stats(media: DataFrame) -> DataFrame:
    """Decode stage: real PNG parse (CRC check, inflate, defilter) →
    structure + pixel statistics. Pure map over splits — zero shuffle."""

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = media_codecs.png_decode(bytes(payload))
                px = d["pixels"]
                recs.append(
                    {
                        "media_id": mid,
                        "width": d["width"],
                        "height": d["height"],
                        "bit_depth": d["bit_depth"],
                        "color_type": d["color_type"],
                        "channels": d["channels"],
                        "n_pixels": d["width"] * d["height"],
                        "mean_byte": sum(px) / len(px),
                        "max_byte": max(px),
                        "min_byte": min(px),
                    }
                )
            yield pd.DataFrame.from_records(recs)

    return media.mapInPandas(decode_batches, schema=PNG_STATS_SCHEMA)


@_register(
    "multimodal_png_roundtrip",
    """
WITH p AS (
  SELECT doc_id,
         8 + doc_id % 9        AS w,
         8 + doc_id % 7        AS h,
         doc_id % 180          AS base,
         1 + (doc_id % 2) * 2  AS ch
  FROM documents
)
SELECT doc_id AS media_id,
       CAST(w AS INTEGER)  AS width,
       CAST(h AS INTEGER)  AS height,
       8                   AS bit_depth,
       CAST(CASE WHEN ch = 1 THEN 0 ELSE 2 END AS INTEGER) AS color_type,
       CAST(ch AS INTEGER) AS channels,
       CAST(w * h AS BIGINT) AS n_pixels,
       CAST(base + (w * ch - 1) / 2.0 + (h - 1) AS DOUBLE) AS mean_byte,
       CAST(base + (w * ch - 1) + 2 * (h - 1) AS INTEGER)  AS max_byte,
       CAST(base AS INTEGER) AS min_byte
FROM p
""",
)
def q_multimodal_png_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end-to-end: synthesize spec-compliant PNGs
    (all 5 filter types, gray + RGB), then decode them with the stdlib
    codec — the oracle predicts width/height/channels and exact pixel
    statistics arithmetically. Replaces round 1's NotImplementedError
    stub for the PNG format (VERDICT item 6)."""
    return decode_png_stats(synthesize_png_media(spark, sf_dir))


WAV_STATS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("sample_width", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_ms", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def synthesize_wav_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode stage: one real 16-bit PCM WAV per document — an
    alternating ±A square wave whose RMS is exactly A."""
    d = catalog.load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (400 + F.col("doc_id") % 100).cast("int").alias("n"),
        (1000 + (F.col("doc_id") % 50) * 100).cast("int").alias("amp"),
    )

    def encode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            payloads = [
                media_codecs.wav_encode(
                    [r.amp if i % 2 == 0 else -r.amp for i in range(r.n)]
                )
                for r in pdf.itertuples()
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": "audio/wav",
                    "payload": payloads,
                }
            )

    # round 14: spread the single-partition documents scan before the
    # codec map so encode (and every downstream fingerprint stage that
    # inherits this partitioning) uses the whole session, not one core
    return spread_small_scan(d).mapInPandas(
        encode_batches, schema=MEDIA_SCHEMA
    )


def decode_wav_stats(media: DataFrame) -> DataFrame:
    """Decode stage: stdlib RIFF/WAVE parse → format + signal stats."""

    def decode_batches(batches: Iterator) -> Iterator:
        import math

        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = media_codecs.wav_decode(bytes(payload))
                s = d["samples"]
                recs.append(
                    {
                        "media_id": mid,
                        "n_channels": d["n_channels"],
                        "sample_width": d["sample_width"],
                        "sample_rate": d["framerate"],
                        "n_frames": d["n_frames"],
                        "duration_ms": d["n_frames"] * 1000.0 / d["framerate"],
                        "rms": math.sqrt(sum(x * x for x in s) / len(s)),
                        "peak": max(abs(x) for x in s),
                    }
                )
            yield pd.DataFrame.from_records(recs)

    return media.mapInPandas(decode_batches, schema=WAV_STATS_SCHEMA)


@_register(
    "multimodal_wav_roundtrip",
    """
SELECT doc_id AS media_id,
       1    AS n_channels,
       2    AS sample_width,
       8000 AS sample_rate,
       CAST(400 + doc_id % 100 AS INTEGER) AS n_frames,
       CAST((400 + doc_id % 100) / 8.0 AS DOUBLE)      AS duration_ms,
       CAST(1000 + (doc_id % 50) * 100 AS DOUBLE)      AS rms,
       CAST(1000 + (doc_id % 50) * 100 AS INTEGER)     AS peak
FROM documents
""",
)
def q_multimodal_wav_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode, end-to-end: synthesize PCM WAVs, decode with
    the stdlib reader, report format + RMS/peak. A ±A square wave makes
    RMS exactly A, so the oracle is exact arithmetic (float64 sqrt of a
    perfect square is exact)."""
    return decode_wav_stats(synthesize_wav_media(spark, sf_dir))


# ---------------------------------------------------------------------------
# multimodal_image_resize — REAL decode + nearest-neighbor resize
# ---------------------------------------------------------------------------

RESIZE_TARGET = 4  # 4×4 thumbnails — every source dim ≥ 8, so no upsample

RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("min_byte", T.IntegerType()),
    ]
)


def resize_png_stats(media: DataFrame, target: int = RESIZE_TARGET) -> DataFrame:
    """Decode REAL PNG bytes, nearest-neighbor-resize to target×target
    (src index = ⌊dst·src_dim/target⌋ — the classic integer NN map, no
    imaging library), report thumbnail statistics. Pure map over splits."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        from . import media_codecs

        for pdf in it:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = media_codecs.png_decode(bytes(payload))
                w, h, ch = d["width"], d["height"], d["channels"]
                px = d["pixels"]  # row-major, stride w*ch
                out = [
                    px[(y * h // target) * w * ch + (x * w // target) * ch + c]
                    for y in range(target)
                    for x in range(target)
                    for c in range(ch)
                ]
                recs.append(
                    {
                        "media_id": mid,
                        "out_width": target,
                        "out_height": target,
                        "channels": ch,
                        "mean_byte": sum(out) / len(out),
                        "max_byte": max(out),
                        "min_byte": min(out),
                    }
                )
            yield pd.DataFrame.from_records(recs)

    return media.mapInPandas(batches, schema=RESIZE_SCHEMA)


@_register(
    "multimodal_image_resize",
    f"""
WITH p AS (
  SELECT doc_id,
         8 + doc_id % 9        AS w,
         8 + doc_id % 7        AS h,
         doc_id % 180          AS base,
         1 + (doc_id % 2) * 2  AS ch
  FROM documents
),
grid AS (
  SELECT p.*, (gx.x * w) // {RESIZE_TARGET} AS sx,
               (gy.y * h) // {RESIZE_TARGET} AS sy
  FROM p,
       generate_series(0, {RESIZE_TARGET - 1}) gx(x),
       generate_series(0, {RESIZE_TARGET - 1}) gy(y)
)
SELECT doc_id AS media_id,
       {RESIZE_TARGET} AS out_width,
       {RESIZE_TARGET} AS out_height,
       CAST(ch AS INTEGER) AS channels,
       CAST(sum(ch * (base + sx * ch + 2 * sy) + ch * (ch - 1) / 2)
            AS DOUBLE)
         / ({RESIZE_TARGET} * {RESIZE_TARGET} * max(ch))   AS mean_byte,
       CAST(max(base + sx * ch + (ch - 1) + 2 * sy) AS INTEGER) AS max_byte,
       CAST(min(base + sx * ch + 2 * sy) AS INTEGER)            AS min_byte
FROM grid
GROUP BY doc_id, ch
""",
)
def q_multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image resize, end-to-end: spec-compliant PNGs (all 5 filter
    types) decode via the stdlib codec, then nearest-neighbor downsample
    to {target}×{target} with pure integer index arithmetic — the
    thumbnail/preprocess stage of a vision-data pipeline, no imaging
    library required. The synthetic pixel field byte(x,y,c) =
    base + x·ch + c + 2·y is closed-form, so the oracle predicts every
    thumbnail statistic by replaying the SAME ⌊dst·src/target⌋ index
    map over a generated {target}×{target} grid — the resize kernel is
    verified pixel-exactly, not just shape-checked. Two Arrow map
    stages, zero shuffles, parallelism = input splits."""
    return resize_png_stats(synthesize_png_media(spark, sf_dir))


# ---------------------------------------------------------------------------
# multimodal_audio_frames — REAL decode + fixed-window frame features
# ---------------------------------------------------------------------------

FRAME_SIZE = 128  # samples per analysis frame

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def frame_wav_energy(media: DataFrame, frame: int = FRAME_SIZE) -> DataFrame:
    """Decode REAL WAV bytes and emit one row per fixed-size analysis
    frame with its RMS energy and peak — the 1 payload → N feature rows
    fan-out every audio pipeline (VAD, loudness normalization, segment
    selection) runs before a model sees the samples."""

    def batches(it: Iterator) -> Iterator:
        import math

        import pandas as pd

        from . import media_codecs

        for pdf in it:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = media_codecs.wav_decode(bytes(payload))
                s = d["samples"]
                for f in range(0, len(s), frame):
                    win = s[f : f + frame]
                    recs.append(
                        {
                            "media_id": mid,
                            "frame_idx": f // frame,
                            "n_samples": len(win),
                            "rms": math.sqrt(
                                sum(x * x for x in win) / len(win)
                            ),
                            "peak": max(abs(x) for x in win),
                        }
                    )
            yield pd.DataFrame.from_records(recs)

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


# ---------------------------------------------------------------------------
# multimodal_mjpeg_frame_sample — REAL video decode: AVI container walk +
# baseline JPEG frame decode (operators/jpeg.py), sampling every Nth frame.
# Registered in round 6 (it sat out round 5's full certification queue);
# tests/test_jpeg_codec.py pins the codec itself against hand-assembled
# T.81 vectors.
# ---------------------------------------------------------------------------

FRAME_SAMPLE_EVERY = 2  # decode every 2nd frame — the sampling pattern

VIDEO_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
        T.StructField("max_byte", T.IntegerType()),
        T.StructField("min_byte", T.IntegerType()),
    ]
)


def synthesize_mjpeg_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode stage: one real MJPEG/AVI clip per document — 3-6 solid
    grayscale JPEG frames (value (doc_id·31 + idx·17) % 256), dims
    parameterized off doc_id (not multiples of 8, so every frame
    exercises edge padding). Solid frames keep the decoded statistics
    closed-form: only the DC coefficient survives quantization, so
    decoded value = clamp(2·round_away((v-128)/2) + 128) exactly
    (jpeg.solid_decoded_value)."""
    d = catalog.load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (3 + F.col("doc_id") % 4).cast("int").alias("n_frames"),
        (9 + F.col("doc_id") % 8).cast("int").alias("w"),
        (8 + F.col("doc_id") % 5).cast("int").alias("h"),
    )

    def encode_batches(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from . import jpeg as jpeg_codec, media_codecs

        for pdf in batches:
            payloads = []
            for r in pdf.itertuples():
                frames = [
                    jpeg_codec.jpeg_encode(
                        np.full(
                            (r.h, r.w),
                            (r.media_id * 31 + i * 17) % 256,
                            dtype=np.uint8,
                        )
                    )
                    for i in range(r.n_frames)
                ]
                payloads.append(
                    media_codecs.avi_mjpeg_encode(frames, r.w, r.h, fps=10)
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": "video/x-msvideo",
                    "payload": payloads,
                }
            )

    # round 14: spread the single-partition documents scan before the
    # codec map so encode (and every downstream fingerprint stage that
    # inherits this partitioning) uses the whole session, not one core
    return spread_small_scan(d).mapInPandas(
        encode_batches, schema=MEDIA_SCHEMA
    )


def sample_video_frames(
    media: DataFrame, every_n: int = FRAME_SAMPLE_EVERY
) -> DataFrame:
    """REAL video frame sampling: walk the RIFF/AVI tree, take every
    ``every_n``-th MJPEG frame, decode ONLY those (baseline T.81 path),
    emit one row per sampled frame with pixel statistics. The skipped
    frames never leave the container bytes — at 100 TB that selective
    decode is the entire point of frame sampling. Pure map over input
    splits, zero shuffle."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        from . import jpeg as jpeg_codec, media_codecs

        for pdf in it:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                clip = media_codecs.avi_mjpeg_frames(bytes(payload))
                for idx in range(0, clip["n_frames"], every_n):
                    d = jpeg_codec.jpeg_decode(clip["frames"][idx])
                    px = d["pixels"]
                    recs.append(
                        {
                            "media_id": mid,
                            "frame_idx": idx,
                            "n_frames": clip["n_frames"],
                            "fps": clip["fps"],
                            "width": d["width"],
                            "height": d["height"],
                            "mean_byte": float(px.mean()),
                            "max_byte": int(px.max()),
                            "min_byte": int(px.min()),
                        }
                    )
            yield pd.DataFrame.from_records(recs)

    return media.mapInPandas(batches, schema=VIDEO_FRAME_SCHEMA)


def q_multimodal_mjpeg_frame_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REAL video decode, end-to-end: synthesize MJPEG/AVI clips, walk
    the container, decode every 2nd frame with the native baseline JPEG
    codec. Solid frames make every decoded statistic closed-form — the
    oracle replays the DC quantize→dequantize arithmetic in SQL, so the
    huffman + DCT + container path is verified value-exactly."""
    return sample_video_frames(synthesize_mjpeg_media(spark, sf_dir))


# Exact DC-path oracle: v = (doc_id*31 + idx*17) % 256; decoded constant
# = clamp(2 * round_away((v-128)/2) + 128, 0, 255) where round_away(n/2)
# = trunc((n + sign(n)) / 2) for integer n (encoder rounds half away
# from zero; reconstruction 2*dc_q + 128 is already integral).
MJPEG_FRAME_SAMPLE_ORACLE = f"""
WITH p AS (
  SELECT doc_id,
         3 + doc_id % 4 AS n_frames,
         9 + doc_id % 8 AS w,
         8 + doc_id % 5 AS h
  FROM documents
),
f AS (
  SELECT p.*, g.idx,
         (doc_id * 31 + g.idx * 17) % 256 - 128 AS n
  FROM p, generate_series(0, 5) g(idx)
  WHERE g.idx < n_frames AND g.idx % {FRAME_SAMPLE_EVERY} = 0
)
SELECT doc_id AS media_id,
       CAST(idx AS INTEGER)      AS frame_idx,
       CAST(n_frames AS INTEGER) AS n_frames,
       10                        AS fps,
       CAST(w AS INTEGER)        AS width,
       CAST(h AS INTEGER)        AS height,
       CAST(least(255, greatest(0,
            2 * CAST(TRUNC((n + SIGN(n)) / 2.0) AS INTEGER) + 128))
            AS DOUBLE)  AS mean_byte,
       CAST(least(255, greatest(0,
            2 * CAST(TRUNC((n + SIGN(n)) / 2.0) AS INTEGER) + 128))
            AS INTEGER) AS max_byte,
       CAST(least(255, greatest(0,
            2 * CAST(TRUNC((n + SIGN(n)) / 2.0) AS INTEGER) + 128))
            AS INTEGER) AS min_byte
FROM f
"""

# registered post-hoc: the oracle constant above is defined after the
# query function it certifies
_register("multimodal_mjpeg_frame_sample", MJPEG_FRAME_SAMPLE_ORACLE)(
    q_multimodal_mjpeg_frame_sample
)


@_register(
    "multimodal_audio_frames",
    f"""
WITH p AS (
  SELECT doc_id,
         400 + doc_id % 100           AS n,
         1000 + (doc_id % 50) * 100   AS amp
  FROM documents
)
SELECT doc_id AS media_id,
       CAST(g.f AS INTEGER) AS frame_idx,
       CAST(least({FRAME_SIZE}, n - g.f * {FRAME_SIZE}) AS INTEGER)
         AS n_samples,
       CAST(amp AS DOUBLE)  AS rms,
       CAST(amp AS INTEGER) AS peak
FROM p, generate_series(0, 7) g(f)
WHERE g.f <= (n - 1) // {FRAME_SIZE}
""",
)
def q_multimodal_audio_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio frame features, end-to-end: PCM WAVs decode via the
    stdlib reader and fan out to one row per {FRAME_SIZE}-sample frame
    with RMS and peak. The ±A square wave makes every frame's RMS
    exactly A (float64 sqrt of a perfect square), and the frame count /
    tail-frame length are integer arithmetic — so the oracle checks the
    framing boundaries AND the energy kernel exactly, including the
    partial last frame."""
    return frame_wav_energy(synthesize_wav_media(spark, sf_dir))


# ---------------------------------------------------------------------------
# multimodal_image_dhash_pairs — perceptual-hash image near-dup
# ---------------------------------------------------------------------------

# Image near-duplicate detection by difference hash (dHash, the
# perceptual-hash family's gradient member: downsample to a 9x8
# grayscale grid, hash = the 64 signs of horizontal neighbor
# differences). dHash is invariant to uniform brightness shift by
# construction — gradients are unchanged — which is exactly the
# "re-encoded / re-exposed copy" class a training-image dedup pass
# must catch and byte-level dedup cannot. Candidate generation reuses
# the repo's pigeonhole band discipline (dedup.py simhash kernel): the
# 64-bit hash splits into 4 x 16-bit bands, a pair at hamming <= 3 is
# GUARANTEED to agree on >= 1 whole band, so the equi-join on
# (band_idx, band_val) finds every qualifying pair and the exact
# hamming verify prunes band-collision noise.
DHASH_W, DHASH_H = 18, 16  # fixture frame: 2x2 blocks -> the 9x8 grid
DHASH_GRID_W, DHASH_GRID_H = 9, 8
DHASH_BANDS = 4
DHASH_MAX_HAMMING = 3  # pigeonhole: <= (bands - 1) band-misses covered
DHASH_FAMILY_VARIANTS = 4  # fixture: media_id // 4 = scene family


def _dhash_px(f: int, v: int, i: int, y: int) -> int:
    """The fixture pixel formula — Python twin of ``_dhash_px_sql``."""
    k1 = f * 977 + i * 7919 + y * 6271
    return (
        ((k1 * k1) % 65521) % 176
        + v * 8
        + (48 if v == 3 and i < 2 and y < 2 else 0)
    )


def synthesize_dhash_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode stage: one real 18x16 grayscale PNG per document.

    Pixel formula (all BIGINT arithmetic, replayed verbatim by the
    oracle): family f = media_id // 4, variant v = media_id % 4,

        k1 = f*977 + i*7919 + y*6271
        px(i, y) = ((k1*k1) % 65521) % 176 + v*8
                   + (48 if v == 3 and i < 2 and y < 2 else 0)

    The QUADRATIC mix matters: any formula linear in (f, i, y) makes
    families mere phase shifts of one shared sawtooth, so gradient
    signs barely depend on f and cross-family hashes collide en masse
    (measured: thousands of spurious pairs at sf0.01); squaring modulo
    a prime scatters the gradients — 1250/1250 distinct family hashes
    at sf0.1 with ZERO cross-family matches at the hamming bar, while
    a handful of 16-bit band collisions survive to exercise the
    verify-prune path. Variants 0-2 are uniform-brightness copies of
    the family scene (+8 gray levels each — dHash-identical by
    gradient invariance); variant 3 additionally brightens the 2x2
    corner block (+48), moving exactly one grid cell and at most one
    hash bit — the near-but-not-identical copy that exercises nonzero
    hamming (measured ~43% of families flip the bit). Bounded at
    175 + 24 + 48 = 247 < 256: no mod-256 wrap, so decoded bytes are
    exactly the formula values. Filter type cycles through all five
    PNG filters."""
    d = catalog.load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") / DHASH_FAMILY_VARIANTS)
        .cast("long")
        .alias("f"),
        (F.col("doc_id") % DHASH_FAMILY_VARIANTS).cast("long").alias("v"),
        (F.col("doc_id") % 5).cast("int").alias("ftype"),
    )

    def encode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            payloads = []
            for r in pdf.itertuples():
                rows = []
                for y in range(DHASH_H):
                    rows.append(
                        bytes(
                            _dhash_px(r.f, r.v, i, y)
                            for i in range(DHASH_W)
                        )
                    )
                payloads.append(
                    media_codecs.png_encode(
                        rows, color_type=0, filter_type=r.ftype
                    )
                )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": "image/png",
                    "payload": payloads,
                }
            )

    # round 14: spread the single-partition documents scan before the
    # codec map so encode (and every downstream fingerprint stage that
    # inherits this partitioning) uses the whole session, not one core
    return spread_small_scan(d).mapInPandas(
        encode_batches, schema=MEDIA_SCHEMA
    )


DHASH_BANDS_SCHEMA = T.StructType(
    [T.StructField("media_id", T.LongType())]
    + [
        T.StructField(f"band{k}", T.LongType())
        for k in range(DHASH_BANDS)
    ]
)


def image_dhash_bands(media: DataFrame) -> DataFrame:
    """Decode + hash stage: real PNG parse -> integer 2x2-block-mean
    grayscale downsample to the 9x8 dHash grid -> 64 gradient-sign bits
    packed as 4 x 16-bit band values (band k = grid rows 2k, 2k+1; bit
    (r, c) at weight 1 << ((r % 2) * 8 + c)). Integer arithmetic end to
    end — floor block means, strict > comparisons — so the oracle can
    replay the exact hash from the pixel formula. Pure map over splits:
    zero shuffle; at 100 TB the hash costs one scan.

    Grayscale inputs whose dims are exact grid multiples are required
    (the fixture's 18x16); a production pipeline resamples to the grid
    first — resampling kernels are codec territory, not hash territory.
    """

    def hash_batches(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = media_codecs.png_decode(bytes(payload))
                w, h = d["width"], d["height"]
                if (
                    d["channels"] != 1
                    or w % DHASH_GRID_W
                    or h % DHASH_GRID_H
                ):
                    raise ValueError(
                        "dHash expects grayscale with dims a multiple "
                        f"of the {DHASH_GRID_W}x{DHASH_GRID_H} grid, "
                        f"got {w}x{h}x{d['channels']}"
                    )
                bw, bh = w // DHASH_GRID_W, h // DHASH_GRID_H
                a = (
                    np.frombuffer(d["pixels"], dtype=np.uint8)
                    .reshape(h, w)
                    .astype(np.int64)
                )
                g = a.reshape(DHASH_GRID_H, bh, DHASH_GRID_W, bw).sum(
                    axis=(1, 3)
                ) // (bh * bw)
                bits = (g[:, 1:] > g[:, :-1]).astype(np.int64)  # 8x8
                weights = np.int64(1) << np.arange(8, dtype=np.int64)
                rowvals = bits @ weights  # one 8-bit value per grid row
                rec = {"media_id": mid}
                for k in range(DHASH_BANDS):
                    rec[f"band{k}"] = int(
                        rowvals[2 * k] + (rowvals[2 * k + 1] << 8)
                    )
                recs.append(rec)
            yield pd.DataFrame.from_records(recs)

    return media.mapInPandas(hash_batches, schema=DHASH_BANDS_SCHEMA)


def _dhash_px_sql(i: str, y: str) -> str:
    """The pixel formula as a SQL fragment — i/y are column expressions;
    SQL twin of ``_dhash_px``."""
    k1 = f"(f * 977 + ({i}) * 7919 + ({y}) * 6271)"
    return (
        f"((({k1} * {k1}) % 65521) % 176 + v * 8"
        f" + CASE WHEN v = 3 AND ({i}) < 2 AND ({y}) < 2"
        f"        THEN 48 ELSE 0 END)"
    )


def band_pairs_sql(pairs_name: str, max_hamming: int = DHASH_MAX_HAMMING) -> str:
    """Candidate + verified-pair CTEs over an upstream ``bands(media_id,
    band_idx, band_val)`` CTE — the SQL twin of ``dhash_band_pairs``,
    shared by the image dHash and audio fingerprint oracles (one pair
    algebra on the engine side, one on the oracle side)."""
    return f"""cand AS (
  SELECT DISTINCT a.media_id AS media_a, b.media_id AS media_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.media_id < b.media_id
),
{pairs_name} AS (
  SELECT c.media_a, c.media_b,
         CAST(sum(bit_count(xor(x.band_val, y.band_val))) AS BIGINT)
           AS hamming
  FROM cand c
  JOIN bands x ON x.media_id = c.media_a
  JOIN bands y ON y.media_id = c.media_b AND y.band_idx = x.band_idx
  GROUP BY 1, 2
  HAVING sum(bit_count(xor(x.band_val, y.band_val)))
           <= {max_hamming}
)"""


def _dhash_pairs_ctes() -> str:
    """The dHash pipeline as a composable CTE chain (p → cells → bits →
    bands → cand) plus a ``dpairs`` CTE holding the verified pairs —
    the greedy_fold_ctes discipline: the pairs oracle and every
    downstream consumer (the canonical-selection oracle) share ONE
    definition of pixels, hash, banding and verify."""
    return f"""p AS (
  SELECT doc_id AS media_id,
         doc_id // {DHASH_FAMILY_VARIANTS} AS f,
         doc_id %  {DHASH_FAMILY_VARIANTS} AS v
  FROM documents
),
cells AS (
  SELECT media_id, r.r AS r, c.c AS c,
         ({_dhash_px_sql("2*c.c", "2*r.r")}
          + {_dhash_px_sql("2*c.c + 1", "2*r.r")}
          + {_dhash_px_sql("2*c.c", "2*r.r + 1")}
          + {_dhash_px_sql("2*c.c + 1", "2*r.r + 1")}) // 4 AS g
  FROM p, range({DHASH_GRID_H}) r(r), range({DHASH_GRID_W}) c(c)
),
bits AS (
  SELECT media_id, r, c,
         CASE WHEN lead(g) OVER (PARTITION BY media_id, r ORDER BY c) > g
              THEN 1 ELSE 0 END AS bit
  FROM cells
),
bands AS (
  SELECT media_id, r // 2 AS band_idx,
         CAST(sum(bit * (1 << ((r % 2) * 8 + c))) AS BIGINT) AS band_val
  FROM bits WHERE c < 8
  GROUP BY media_id, r // 2
),
{band_pairs_sql("dpairs")}"""


_DHASH_ORACLE = f"""
WITH {_dhash_pairs_ctes()}
SELECT media_a, media_b, hamming FROM dpairs
"""


@_register("multimodal_image_dhash_pairs", _DHASH_ORACLE)
def q_multimodal_image_dhash_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Image near-dup pairs by perceptual dHash over REAL PNG decode:
    synthesize one 18x16 grayscale PNG per document (brightness-copy
    families of {DHASH_FAMILY_VARIANTS}), parse it back through the
    CRC-verified codec, hash to 64 gradient bits, and emit every pair
    at hamming <= {DHASH_MAX_HAMMING} via the pigeonhole band join.
    The oracle replays pixels -> grid -> bits -> bands -> pairs from
    the closed-form pixel formula, so the hash certifies codec
    roundtrip AND hash kernel AND pair algebra together."""
    return image_dhash_pairs(synthesize_dhash_media(spark, sf_dir))


def image_dhash_pairs(
    media: DataFrame, max_hamming: int = DHASH_MAX_HAMMING
) -> DataFrame:
    """Pair stage behind ``multimodal_image_dhash_pairs``: band-keyed
    candidate join + exact hamming verify.

    Scale shape: the hash stage is a pure map; the ONLY corpus-sized
    shuffle is the band equi-join on (band_idx, band_val) — candidates
    are bounded by band-bucket occupancy exactly like the simhash/LSH
    kernels, never n² — and the verify join carries 4 small ints per
    side. Staged once: the band frame feeds the two candidate legs and
    the two verify legs."""
    from ..session import stage

    bands = stage(image_dhash_bands(media))
    return dhash_band_pairs(bands, max_hamming=max_hamming)


def dhash_band_pairs(
    bands: DataFrame,
    other: DataFrame | None = None,
    max_hamming: int = DHASH_MAX_HAMMING,
    extra_key: tuple[str, ...] = (),
) -> DataFrame:
    """Band-keyed near-dup pairs between two BAND frames (media_id,
    [extra_key...,] band0..band{DHASH_BANDS - 1}).

    ``other=None``: self-pairs within ``bands`` (media_a < media_b —
    the batch form). ``other`` given: CROSS pairs — every row of
    ``bands`` paired against every ``other`` row it band-matches (no
    id ordering; the streaming archive check, where the archive always
    wins regardless of ids). ``extra_key``: additional print-identity
    columns (the windowed audio stage's ``win``) — candidates stay
    distinct and the verify joins key on the FULL composite, while the
    a<b ordering (and hence the no-self-pair guarantee) remains on
    media_id alone, so two prints of ONE clip never pair. Output rows
    carry ``<k>_a``/``<k>_b`` for each extra key. One pair algebra for
    the image batch query, the media stream and the windowed audio
    matcher."""
    key_a = ["media_a", *[f"{k}_a" for k in extra_key]]
    key_b = ["media_b", *[f"{k}_b" for k in extra_key]]
    # Round-14 optimization (guide §2.3/§2.4, measured): each side is
    # consumed exactly ONCE — the exploded band rows CARRY their print's
    # full band vector, so hamming is computed directly on the band-join
    # output and the former three-join shape (candidate join → distinct →
    # x verify join → y verify join) collapses to one join + one groupBy.
    # Before, an UNSTAGED input (the audio containment fingerprints) was
    # re-evaluated by every leg — the hop-1 probe MapInPandas ran twice
    # per query (plans/r14/multimodal_audio_subframe_containment_before
    # .txt operators 8/28 and 15/37). The exploded rows widen by
    # (DHASH_BANDS - 1) longs, but two verify-side exchanges/broadcasts
    # of the whole print table disappear and the fingerprint stage is
    # evaluated once per side; a pair matching in several bands is
    # deduped by the groupBy (hamming is identical within the group, so
    # min() is deterministic — the pre-groupBy hamming filter commutes
    # with the dedup).
    long_a = bands.select(
        F.col("media_id").alias("media_a"),
        *[F.col(k).alias(f"{k}_a") for k in extra_key],
        *[F.col(f"band{k}").alias(f"xb{k}") for k in range(DHASH_BANDS)],
        F.posexplode(
            F.array(*[F.col(f"band{k}") for k in range(DHASH_BANDS)])
        ).alias("band_idx", "band_val"),
    )
    long_b = (other if other is not None else bands).select(
        F.col("media_id").alias("media_b"),
        *[F.col(k).alias(f"{k}_b") for k in extra_key],
        *[F.col(f"band{k}").alias(f"yb{k}") for k in range(DHASH_BANDS)],
        F.posexplode(
            F.array(*[F.col(f"band{k}") for k in range(DHASH_BANDS)])
        ).alias("band_idx", "band_val"),
    )
    id_cond = (
        F.col("media_a") < F.col("media_b")
        if other is None
        else F.col("media_a").isNotNull()
    )
    hamming = sum(
        F.bit_count(F.col(f"xb{k}").bitwiseXOR(F.col(f"yb{k}")))
        for k in range(DHASH_BANDS)
    ).cast("long")
    return (
        long_a.join(long_b, ["band_idx", "band_val"])
        .where(id_cond)
        .select(*key_a, *key_b, hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
        .groupBy(*key_a, *key_b)
        .agg(F.min("hamming").alias("hamming"))
    )


# ---------------------------------------------------------------------------
# multimodal_image_dedup_clusters — near-dup families → canonical image
# ---------------------------------------------------------------------------

def _image_clusters_oracle() -> str:
    from .dedup import components_ctes

    return f"""
WITH RECURSIVE {_dhash_pairs_ctes()},
pairs AS (SELECT media_a, media_b FROM dpairs),
{components_ctes("media_a", "media_b")}
SELECT node AS media_id,
       min(dest) AS cluster_rep,
       (min(dest) = node) AS is_canonical
FROM reach
GROUP BY node
"""


@_register("multimodal_image_dedup_clusters", _image_clusters_oracle())
def q_multimodal_image_dedup_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The image-dedup ladder's last rung — dHash pairs → connected
    components → one canonical image per near-dup family (min media_id,
    the first-crawled-wins policy an image pipeline defaults to when no
    quality signal exists): every clustered image labeled with its
    family representative, ``is_canonical`` marking the keeper. The
    text ladder's ``dedup_clusters`` shape, re-instantiated over the
    perceptual-hash pair graph — pairs, components kernel
    (dedup.connected_components: min-label propagation, one join + one
    min-agg per iteration, diameter-bounded) and the recursive-CTE
    oracle are all the proven pieces, composed.

    Scale: pair discovery is the plan-pinned band join; the component
    loop runs over the PAIR graph only (near-dup families are tiny
    cliques — the fixture's are 4-cliques), never the full corpus."""
    from .dedup import connected_components

    pairs = image_dhash_pairs(synthesize_dhash_media(spark, sf_dir)).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    labels = connected_components(pairs)
    return labels.select(
        F.col("node").alias("media_id"),
        F.col("label").alias("cluster_rep"),
        (F.col("label") == F.col("node")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# multimodal_audio_fingerprint_pairs — perceptual audio near-dup
# ---------------------------------------------------------------------------

# Audio near-duplicate detection by a frame-energy delta fingerprint —
# the audio member of the perceptual-hash family (the shape of
# Haitsma-Kalker 2002's robust audio hash, reduced to the time-domain
# energy envelope so the signature stays INTEGER-exact end to end):
# decode PCM → frame the samples → per-frame energy (sum of |sample|,
# an integer) → 64 sign-of-delta bits (energy rises frame-to-frame or
# it doesn't) → the SAME 4×16-bit banding, pigeonhole candidate join
# and hamming verify as the image dHash (dhash_band_pairs, reused
# verbatim). The delta-sign envelope is invariant to uniform amplitude
# scaling by construction — every energy scales by the same positive
# factor, so every strict comparison is unchanged — which is exactly
# the "re-mastered / volume-normalized copy" class an audio dedup pass
# must catch and byte-level dedup cannot.
AFP_FRAMES = 65  # 64 delta bits
AFP_FRAME_SIZE = 8  # samples per frame → 520-sample clips
AFP_ENV_MOD = 1000
AFP_BUMP = 1500  # variant-3 frame-0 perturbation (see synth docstring)
AFP_FAMILY_VARIANTS = 4


def _afp_env(f: int, k: int) -> int:
    """The fixture envelope formula — Python twin of ``_afp_env_sql``."""
    q = f * 131 + k * 9176 + 77
    return ((q * q) % 65521) % AFP_ENV_MOD


def _afp_env_sql(k: str) -> str:
    """The envelope formula as a SQL fragment — SQL twin of ``_afp_env``."""
    q = f"(f * 131 + ({k}) * 9176 + 77)"
    return f"((({q} * {q}) % 65521) % {AFP_ENV_MOD})"


def synthesize_afp_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode stage: one real 16-bit PCM WAV per document.

    Clip formula (all integer arithmetic, replayed verbatim by the
    oracle): family f = media_id // 4, variant v = media_id % 4,
    per-frame envelope

        env(f, k) = (((f*131 + k*9176 + 77)^2) % 65521) % 1000

    (the dHash lesson applies unchanged: a QUADRATIC mix keeps families
    from being phase shifts of one shared sawtooth, so cross-family
    delta signs decorrelate). Frame k holds AFP_FRAME_SIZE alternating
    ±amp samples with

        amp = (env + (1500 if v == 3 and k == 0 else 0))
              * (1 if v == 3 else v + 1)

    Variants 0-2 are amplitude-scaled copies (×1/×2/×3 — fingerprint-
    identical by delta-sign invariance); variant 3 is unscaled but its
    FIRST frame is bumped far above the envelope range, flipping
    exactly bit 0 (frame 0 participates in no other delta) whenever the
    family's bit 0 was a rise — the near-but-not-identical copy that
    exercises nonzero hamming through the verify join. Bounded at
    (999 + 1500)·1 and 999·3 < 32767: no int16 wrap, so decoded
    samples are exactly the formula values."""
    d = catalog.load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") / AFP_FAMILY_VARIANTS).cast("long").alias("f"),
        (F.col("doc_id") % AFP_FAMILY_VARIANTS).cast("long").alias("v"),
    )

    def encode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            payloads = []
            for r in pdf.itertuples():
                scale = 1 if r.v == 3 else r.v + 1
                samples = []
                for k in range(AFP_FRAMES):
                    amp = (
                        _afp_env(r.f, k)
                        + (AFP_BUMP if r.v == 3 and k == 0 else 0)
                    ) * scale
                    samples.extend(
                        amp if t % 2 == 0 else -amp
                        for t in range(AFP_FRAME_SIZE)
                    )
                payloads.append(media_codecs.wav_encode(samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": "audio/wav",
                    "payload": payloads,
                }
            )

    # round 14: spread the single-partition documents scan before the
    # codec map so encode (and every downstream fingerprint stage that
    # inherits this partitioning) uses the whole session, not one core
    return spread_small_scan(d).mapInPandas(
        encode_batches, schema=MEDIA_SCHEMA
    )


def audio_fingerprint_bands(media: DataFrame) -> DataFrame:
    """Decode + fingerprint stage: real RIFF/WAVE parse → frame the
    samples (AFP_FRAMES × AFP_FRAME_SIZE) → integer frame energies
    (sum of |sample|) → 64 delta-sign bits packed as 4 × 16-bit band
    values (bit k at band k // 16, weight 1 << (k % 16)). Integer
    arithmetic end to end — strict > comparisons — so the oracle can
    replay the exact fingerprint from the clip formula. Pure map over
    splits: zero shuffle; at 100 TB the fingerprint costs one scan.

    Mono 16-bit clips of exactly AFP_FRAMES × AFP_FRAME_SIZE samples
    are required (the fixture's); a production pipeline resamples /
    windows to the frame grid first — resampling is codec territory,
    not fingerprint territory."""

    def hash_batches(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = media_codecs.wav_decode(bytes(payload))
                n = AFP_FRAMES * AFP_FRAME_SIZE
                if d["n_channels"] != 1 or len(d["samples"]) != n:
                    raise ValueError(
                        "audio fingerprint expects mono clips of "
                        f"{n} samples, got {d['n_channels']}ch × "
                        f"{len(d['samples'])}"
                    )
                e = (
                    np.abs(np.asarray(d["samples"], dtype=np.int64))
                    .reshape(AFP_FRAMES, AFP_FRAME_SIZE)
                    .sum(axis=1)
                )
                recs.append({"media_id": mid, **_energy_print_bands(e)})
            yield pd.DataFrame.from_records(recs)

    return media.mapInPandas(hash_batches, schema=DHASH_BANDS_SCHEMA)


def _energy_print_bands(e) -> dict:
    """THE fingerprint kernel, one definition for the fixed-length and
    windowed stages: a {AFP_FRAMES}-long frame-energy vector → 64
    delta-sign bits → {DHASH_BANDS} 16-bit band values (bit k at band
    k // 16, weight 1 << (k % 16)). Integer arithmetic, strict >."""
    import numpy as np

    bits = (e[1:] > e[:-1]).astype(np.int64)
    return {
        f"band{band}": int(
            (
                bits[16 * band : 16 * (band + 1)]
                << np.arange(16, dtype=np.int64)
            ).sum()
        )
        for band in range(DHASH_BANDS)
    }


def _afp_pairs_ctes() -> str:
    """The audio-fingerprint pipeline as a composable CTE chain (ap →
    fr → abits → bands) ending in the SHARED band_pairs_sql block —
    one pair algebra for image and audio, oracle side too."""
    energy = (
        f"8 * ({_afp_env_sql('k.k')}"
        f" + CASE WHEN v = 3 AND k.k = 0 THEN {AFP_BUMP} ELSE 0 END)"
        f" * (CASE WHEN v = 3 THEN 1 ELSE v + 1 END)"
    )
    return f"""ap AS (
  SELECT doc_id AS media_id,
         doc_id // {AFP_FAMILY_VARIANTS} AS f,
         doc_id %  {AFP_FAMILY_VARIANTS} AS v
  FROM documents
),
fr AS (
  SELECT media_id, k.k AS k, {energy} AS e
  FROM ap, range({AFP_FRAMES}) k(k)
),
abits AS (
  SELECT media_id, k,
         CASE WHEN lead(e) OVER (PARTITION BY media_id ORDER BY k) > e
              THEN 1 ELSE 0 END AS bit
  FROM fr
),
bands AS (
  SELECT media_id, k // 16 AS band_idx,
         CAST(sum(bit * (1 << (k % 16))) AS BIGINT) AS band_val
  FROM abits WHERE k < {AFP_FRAMES - 1}
  GROUP BY media_id, k // 16
),
{band_pairs_sql("apairs")}"""


_AFP_ORACLE = f"""
WITH {_afp_pairs_ctes()}
SELECT media_a, media_b, hamming FROM apairs
"""


@_register("multimodal_audio_fingerprint_pairs", _AFP_ORACLE)
def q_multimodal_audio_fingerprint_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Audio near-dup pairs by frame-energy delta fingerprint over REAL
    WAV decode: synthesize one 520-sample PCM clip per document
    (amplitude-scaled families of {AFP_FAMILY_VARIANTS}), parse it back
    through the stdlib RIFF/WAVE reader, fingerprint to 64 delta-sign
    bits, and emit every pair at hamming <= {DHASH_MAX_HAMMING} via the
    pigeonhole band join — dhash_band_pairs REUSED VERBATIM, the
    round-9 image-dedup pattern extended to the third modality. The
    oracle replays clip formula -> energies -> bits -> bands -> pairs,
    so the hash certifies codec roundtrip AND fingerprint kernel AND
    pair algebra together."""
    from ..session import stage

    bands = stage(
        audio_fingerprint_bands(synthesize_afp_media(spark, sf_dir))
    )
    return dhash_band_pairs(bands)


# ---------------------------------------------------------------------------
# multimodal_audio_dedup_clusters — audio near-dup families → canonical
# ---------------------------------------------------------------------------

def _audio_clusters_oracle() -> str:
    from .dedup import components_ctes

    return f"""
WITH RECURSIVE {_afp_pairs_ctes()},
pairs AS (SELECT media_a, media_b FROM apairs),
{components_ctes("media_a", "media_b")}
SELECT node AS media_id,
       min(dest) AS cluster_rep,
       (min(dest) = node) AS is_canonical
FROM reach
GROUP BY node
"""


@_register("multimodal_audio_dedup_clusters", _audio_clusters_oracle())
def q_multimodal_audio_dedup_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The audio-dedup ladder's last rung — fingerprint pairs →
    connected components → one canonical clip per near-dup family
    (min media_id, first-crawled-wins): every clustered clip labeled
    with its family representative, ``is_canonical`` marking the
    keeper. The image ladder's multimodal_image_dedup_clusters shape,
    re-instantiated over the audio fingerprint pair graph — fourth
    consumer of the shared components kernel and its recursive-CTE
    oracle (text LSH, semantic, image, audio: one closure algebra).

    Scale: pair discovery is the plan-pinned band join; the component
    loop runs over the PAIR graph only (near-dup families are tiny
    cliques — the fixture's are 4-cliques), never the full corpus."""
    from ..session import stage

    from .dedup import connected_components

    bands = stage(
        audio_fingerprint_bands(synthesize_afp_media(spark, sf_dir))
    )
    pairs = dhash_band_pairs(bands).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    labels = connected_components(pairs)
    return labels.select(
        F.col("node").alias("media_id"),
        F.col("label").alias("cluster_rep"),
        (F.col("label") == F.col("node")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# multimodal_audio_window_matches — variable-length clips, windowed prints
# ---------------------------------------------------------------------------
# Round-10's fingerprint required exact 65-frame clips; production audio
# is arbitrary-length. The Haitsma-Kalker production shape (2002): slide
# the 65-frame window over the frame grid at a fixed hop, emit one
# 64-bit print per hop, and match clips on shared window prints — the
# audio twin of winnowing's positional fingerprints. A short excerpt
# aligned to the hop grid is FOUND INSIDE the long original because its
# single window print equals one of the original's window prints
# (containment, not just whole-clip equality).

AFPW_HOP_FRAMES = 16  # frames between window starts (128 samples)
AFPW_MAX_FRAMES = AFP_FRAMES + 3 * AFPW_HOP_FRAMES  # fixture bound: 113
AFPW_MAX_WINDOWS = 4  # fixture bound — the kernel itself is unbounded

AFPW_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("win", T.IntegerType()),
    ]
    + [T.StructField(f"band{k}", T.LongType()) for k in range(DHASH_BANDS)]
)


def _afpw_amp(f: int, v: int, j: int) -> int:
    """Fixture amplitude for frame j of clip (f, v) — Python twin of
    the oracle's CASE (see _afpw_ctes): v0 full-length envelope, v1
    the first 65 frames at x2, v2 frames 16..80 at x3 (v0's window 1,
    rescaled), v3 the first 65 frames with frame 0 bumped (near-dup
    of v0's window 0 at hamming <= 1)."""
    if v == 0:
        return _afp_env(f, j)
    if v == 1:
        return _afp_env(f, j) * 2
    if v == 2:
        return _afp_env(f, j + AFPW_HOP_FRAMES) * 3
    return _afp_env(f, j) + (AFP_BUMP if j == 0 else 0)


def _afpw_n_frames(f: int, v: int) -> int:
    return (
        AFP_FRAMES + AFPW_HOP_FRAMES * ((f % 3) + 1) if v == 0 else AFP_FRAMES
    )


def synthesize_afpw_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIABLE-LENGTH clip fixture: one real PCM WAV per document,
    lengths 81/97/113 frames for variant 0 (by family), 65 frames for
    the excerpt/near-dup variants — every length a multiple of the
    frame size, every excerpt offset a multiple of the hop, so the
    oracle replays prints per hop from the closed-form envelope.
    Amplitudes bounded ((999 + 1500) and 999*3 < 32767): no int16
    wrap."""
    d = catalog.load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") / AFP_FAMILY_VARIANTS).cast("long").alias("f"),
        (F.col("doc_id") % AFP_FAMILY_VARIANTS).cast("long").alias("v"),
    )

    def encode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            payloads = []
            for r in pdf.itertuples():
                samples = []
                for j in range(_afpw_n_frames(r.f, r.v)):
                    amp = _afpw_amp(r.f, r.v, j)
                    samples.extend(
                        amp if t % 2 == 0 else -amp
                        for t in range(AFP_FRAME_SIZE)
                    )
                payloads.append(media_codecs.wav_encode(samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": "audio/wav",
                    "payload": payloads,
                }
            )

    # round 14: spread the single-partition documents scan before the
    # codec map so encode (and every downstream fingerprint stage that
    # inherits this partitioning) uses the whole session, not one core
    return spread_small_scan(d).mapInPandas(
        encode_batches, schema=MEDIA_SCHEMA
    )


def audio_windowed_fingerprint_bands(
    media: DataFrame, hop_frames: int = AFPW_HOP_FRAMES
) -> DataFrame:
    """Windowed fingerprint stage for ARBITRARY-length mono clips:
    decode → frame energies (integer |sample| sums per 8-sample
    frame) → slide the {AFP_FRAMES}-frame window at ``hop_frames`` →
    one 64-delta-sign-bit print per hop, packed as the usual 4x16-bit
    bands, one output ROW per (clip, window). Amplitude-scale
    invariance carries over per window (every energy in a window
    scales by the same positive factor).

    Scale shape: still a pure zero-shuffle Arrow map — rows out grow
    linearly with audio DURATION (one per hop), never quadratically;
    every window of a clip slices ONE decoded energy vector (decode
    and framing run once per clip, never per window). Clips shorter
    than one window or not on the frame grid are a caller bug
    (production resamples first) and raise."""

    def hash_batches(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            recs = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = media_codecs.wav_decode(bytes(payload))
                ns = len(d["samples"])
                if (
                    d["n_channels"] != 1
                    or ns % AFP_FRAME_SIZE != 0
                    or ns < AFP_FRAMES * AFP_FRAME_SIZE
                ):
                    raise ValueError(
                        "windowed audio fingerprint expects mono clips "
                        f"of >= {AFP_FRAMES} whole {AFP_FRAME_SIZE}-sample "
                        f"frames, got {d['n_channels']}ch x {ns}"
                    )
                e = (
                    np.abs(np.asarray(d["samples"], dtype=np.int64))
                    .reshape(-1, AFP_FRAME_SIZE)
                    .sum(axis=1)
                )
                n_frames = e.shape[0]
                for w in range(0, n_frames - AFP_FRAMES + 1, hop_frames):
                    recs.append(
                        {
                            "media_id": mid,
                            "win": w // hop_frames,
                            **_energy_print_bands(e[w : w + AFP_FRAMES]),
                        }
                    )
            yield pd.DataFrame.from_records(recs)

    return media.mapInPandas(hash_batches, schema=AFPW_BANDS_SCHEMA)


def audio_window_match_pairs(
    wbands: DataFrame, max_hamming: int = DHASH_MAX_HAMMING
) -> DataFrame:
    """Clip-level matches from window prints: band-keyed candidate join
    over (clip, window) print rows — same pigeonhole guarantee as
    dhash_band_pairs, the key just carries the window index — exact
    hamming verify per window pair, then per-clip-pair aggregation:
    how many window pairs matched and the best (min) hamming. Output
    (media_a, media_b, n_window_matches, min_hamming), media_a <
    media_b.

    Scale: candidates are bounded by band-bucket occupancy over the
    window-print population (linear in total audio duration); the
    verify join carries 4 small ints per side; the final exchange is
    keyed by clip pair. The within-clip self-match (a == b) is
    excluded by the id ordering, so a clip with internally repeating
    audio never floods the output.

    The window-pair leg IS dhash_band_pairs with ``win`` as an extra
    print-identity key — one pigeonhole pair algebra for image, audio
    and windowed audio; only the clip-level aggregation is new."""
    return (
        dhash_band_pairs(
            wbands, max_hamming=max_hamming, extra_key=("win",)
        )
        .groupBy("media_a", "media_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_window_matches"),
            F.min("hamming").alias("min_hamming"),
        )
    )


def _afpw_ctes() -> str:
    """The windowed pipeline as CTEs: clips → per-frame energies (from
    the closed-form envelope) → per-(clip, window) delta bits → band
    values → window-level band join + hamming verify → clip-pair
    aggregation. One definition of envelope, framing and banding,
    shared with the Python fixture twins above."""
    env_j = _afp_env_sql("j.j")
    env_j_off = _afp_env_sql(f"j.j + {AFPW_HOP_FRAMES}")
    amp = f"""CASE WHEN v = 0 THEN {env_j}
         WHEN v = 1 THEN {env_j} * 2
         WHEN v = 2 THEN {env_j_off} * 3
         ELSE {env_j} + CASE WHEN j.j = 0 THEN {AFP_BUMP} ELSE 0 END END"""
    return f"""awc AS (
  SELECT doc_id AS media_id,
         doc_id // {AFP_FAMILY_VARIANTS} AS f,
         doc_id %  {AFP_FAMILY_VARIANTS} AS v
  FROM documents
),
clips AS (
  SELECT media_id, f, v,
         CASE WHEN v = 0
              THEN {AFP_FRAMES} + {AFPW_HOP_FRAMES} * ((f % 3) + 1)
              ELSE {AFP_FRAMES} END AS nf
  FROM awc
),
en AS (
  SELECT c.media_id, j.j AS j, {AFP_FRAME_SIZE} * ({amp}) AS e
  FROM clips c, range({AFPW_MAX_FRAMES}) j(j)
  WHERE j.j < c.nf
),
wins AS (
  SELECT c.media_id, w.w AS w
  FROM clips c, range({AFPW_MAX_WINDOWS}) w(w)
  WHERE w.w <= (c.nf - {AFP_FRAMES}) // {AFPW_HOP_FRAMES}
),
wbits AS (
  SELECT win.media_id, win.w, k.k AS k,
         CASE WHEN e2.e > e1.e THEN 1 ELSE 0 END AS bit
  FROM wins win, range({AFP_FRAMES - 1}) k(k), en e1, en e2
  WHERE e1.media_id = win.media_id
    AND e1.j = win.w * {AFPW_HOP_FRAMES} + k.k
    AND e2.media_id = win.media_id
    AND e2.j = win.w * {AFPW_HOP_FRAMES} + k.k + 1
),
wbands AS (
  SELECT media_id, w, k // 16 AS band_idx,
         CAST(sum(bit * (1 << (k % 16))) AS BIGINT) AS band_val
  FROM wbits GROUP BY media_id, w, k // 16
),
wcand AS (
  SELECT DISTINCT a.media_id AS ma, a.w AS wa, b.media_id AS mb, b.w AS wb
  FROM wbands a JOIN wbands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
   AND a.media_id < b.media_id
),
wpairs AS (
  SELECT c.ma, c.wa, c.mb, c.wb,
         CAST(sum(bit_count(xor(x.band_val, y.band_val))) AS BIGINT)
           AS hamming
  FROM wcand c
  JOIN wbands x ON x.media_id = c.ma AND x.w = c.wa
  JOIN wbands y ON y.media_id = c.mb AND y.w = c.wb
                AND y.band_idx = x.band_idx
  GROUP BY 1, 2, 3, 4
  HAVING sum(bit_count(xor(x.band_val, y.band_val)))
           <= {DHASH_MAX_HAMMING}
)"""


_AFPW_ORACLE = f"""
WITH {_afpw_ctes()}
SELECT ma AS media_a, mb AS media_b,
       CAST(count(*) AS BIGINT) AS n_window_matches,
       min(hamming) AS min_hamming
FROM wpairs GROUP BY 1, 2
"""


@_register("multimodal_audio_window_matches", _AFPW_ORACLE)
def q_multimodal_audio_window_matches(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Variable-length audio near-dup/CONTAINMENT matching: synthesize
    clips of 81-113 frames (variant 0) alongside 65-frame excerpts —
    a rescaled head excerpt, a rescaled hop-aligned interior excerpt,
    and a first-frame-perturbed near-dup — fingerprint every
    65-frame window at a {AFPW_HOP_FRAMES}-frame hop through the REAL
    WAV codec, and report clip pairs sharing hamming-verified window
    prints. The excerpts are found INSIDE the long originals (the
    short clip's lone window print matches the original's window 0 or
    1) — the Haitsma-Kalker containment shape round-10's fixed-length
    fingerprint could not express. The oracle replays envelope →
    framing → windows → bands → pair algebra from the closed form, so
    the hash certifies codec, windowing, banding and aggregation
    together."""
    from ..session import stage

    wbands = stage(
        audio_windowed_fingerprint_bands(synthesize_afpw_media(spark, sf_dir))
    )
    return audio_window_match_pairs(wbands)


_AFPW_ALIGN_ORACLE = f"""
WITH {_afpw_ctes()},
offs AS (
  SELECT ma AS media_a, mb AS media_b, wa - wb AS offset_windows,
         CAST(count(*) AS BIGINT) AS n_aligned,
         min(hamming) AS min_hamming
  FROM wpairs GROUP BY 1, 2, 3
)
SELECT media_a, media_b,
       CAST(offset_windows AS BIGINT) AS offset_windows,
       n_aligned, min_hamming
FROM offs
QUALIFY row_number() OVER (PARTITION BY media_a, media_b
                           ORDER BY n_aligned DESC, offset_windows) = 1
"""


@_register("multimodal_audio_window_alignment", _AFPW_ALIGN_ORACLE)
def q_multimodal_audio_window_alignment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WHERE the match sits — the Haitsma-Kalker lookup's actual
    output: for every matched clip pair, the best ALIGNMENT offset.
    ``offset_windows`` is the SIGNED window shift ``win_a - win_b`` of
    the best-voted alignment (it can be negative when the higher-id
    clip's matching window sits later); in the single-window-excerpt
    case (win_b = 0) it reduces to the hop position where the excerpt
    begins inside the lower-id original. Also reported: how many
    window pairs agree on that shift, and the best hamming at it.
    The mode-offset vote is the standard fingerprint-lookup
    disambiguator: a true excerpt produces a RUN of window matches at
    ONE offset, while band-collision noise scatters across offsets —
    ties break to the smallest offset deterministically.

    Plan: the same staged window prints and the same generalized
    band-join kernel as multimodal_audio_window_matches (one pair
    algebra), then two bounded aggregations — per (pair, offset)
    counts, and the per-pair top-1 window rank. The oracle extends the
    shared wpairs CTE chain with the identical vote."""
    from ..session import stage

    wbands = stage(
        audio_windowed_fingerprint_bands(synthesize_afpw_media(spark, sf_dir))
    )
    return audio_window_alignment(wbands)


def audio_window_alignment(
    wbands: DataFrame, max_hamming: int = DHASH_MAX_HAMMING
) -> DataFrame:
    """The alignment vote over a window-print frame — THE single
    implementation, shared by the registry query and the hand-fixture
    test (so an edited tie-break or dropped cast cannot pass one while
    failing the other)."""
    wpairs = dhash_band_pairs(
        wbands, max_hamming=max_hamming, extra_key=("win",)
    )
    offs = wpairs.groupBy(
        "media_a",
        "media_b",
        (F.col("win_a") - F.col("win_b"))
        .cast("long")
        .alias("offset_windows"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_aligned"),
        F.min("hamming").alias("min_hamming"),
    )
    w = Window.partitionBy("media_a", "media_b").orderBy(
        F.desc("n_aligned"), "offset_windows"
    )
    return (
        offs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "media_a",
            "media_b",
            "offset_windows",
            "n_aligned",
            "min_hamming",
        )
    )


def _audio_window_clusters_oracle() -> str:
    from .dedup import components_ctes

    return f"""
WITH RECURSIVE {_afpw_ctes()},
pairs AS (SELECT DISTINCT ma AS media_a, mb AS media_b FROM wpairs),
{components_ctes("media_a", "media_b")}
SELECT node AS media_id,
       min(dest) AS cluster_rep,
       (min(dest) = node) AS is_canonical
FROM reach
GROUP BY node
"""


@_register(
    "multimodal_audio_window_dedup_clusters",
    _audio_window_clusters_oracle(),
)
def q_multimodal_audio_window_dedup_clusters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The windowed ladder's last rung — window-match pairs →
    connected components → one canonical clip per family (min
    media_id, first-crawled-wins): the fixed-length audio ladder's
    canonical selection, re-based on the CONTAINMENT-aware pair graph,
    so a family here unites the original with its excerpts and
    near-dups (variants the whole-clip fingerprint graph cannot even
    connect). FIFTH consumer of the shared components kernel and its
    recursive-CTE oracle (text LSH, semantic, image, audio, windowed
    audio: one closure algebra).

    Scale: pair discovery is the plan-pinned window band join; the
    component loop runs over the CLIP pair graph only (families are
    tiny cliques), never the corpus."""
    from ..session import stage

    from .dedup import connected_components

    wbands = stage(
        audio_windowed_fingerprint_bands(synthesize_afpw_media(spark, sf_dir))
    )
    pairs = audio_window_match_pairs(wbands).select(
        F.col("media_a").alias("doc_a"), F.col("media_b").alias("doc_b")
    )
    labels = connected_components(pairs)
    return labels.select(
        F.col("node").alias("media_id"),
        F.col("label").alias("cluster_rep"),
        (F.col("label") == F.col("node")).alias("is_canonical"),
    )


# ---------------------------------------------------------------------------
# multimodal_audio_asym_containment — NON-hop-aligned excerpt discovery
# ---------------------------------------------------------------------------

# The round-11 windowed ladder finds excerpts that start ON the archive
# hop grid. A real re-clipped segment starts at an arbitrary frame;
# Haitsma-Kalker's production answer is ASYMMETRIC hop density: the
# archive keeps one print per {AFPW_HOP_FRAMES}-frame hop (compact — it
# is the 100 TB side), while the QUERY side fingerprints at hop 1, so
# for any excerpt offset o there exists a probe window p ≡ -o (mod
# {AFPW_HOP_FRAMES}) that lands EXACTLY on an archived window (offsets
# are whole frames; sub-frame starts are resampling territory, not
# fingerprint territory). Probe cost is bounded by the query batch
# (x hop ratio), never by the archive.

AFPA_ORIG_FRAMES = AFP_FRAMES + 2 * AFPW_HOP_FRAMES  # originals: 97
AFPA_EXCERPT_FRAMES = AFP_FRAMES + AFPW_HOP_FRAMES - 1  # excerpts: 80
AFPA_MAX_PROBE_WINDOWS = AFPA_EXCERPT_FRAMES - AFP_FRAMES + 1  # 16


def _afpa_off(f: int) -> int:
    """Excerpt start frame for family f — 1, 6 or 11: never a multiple
    of the {AFPW_HOP_FRAMES}-frame hop, so the hop-aligned matcher is
    structurally blind to every one of these excerpts."""
    return 1 + (f % 3) * 5


def _afpa_amp(f: int, v: int, j: int) -> int:
    """Fixture amplitude for frame j of clip (f, v) — Python twin of
    the oracle's CASE: v0 the 97-frame original, v1 an 80-frame
    excerpt of it starting at the misaligned offset, rescaled x2
    (delta-sign invariance must still hold through the real codec)."""
    return _afp_env(f, j) if v == 0 else _afp_env(f, j + _afpa_off(f)) * 2


def synthesize_afpa_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MISALIGNED-excerpt fixture: one real PCM WAV per document,
    family f = doc_id // 2, variant v = doc_id % 2 — v0 a 97-frame
    original, v1 an 80-frame x2-rescaled excerpt starting _afpa_off(f)
    frames in (NOT on the hop grid). 80 frames guarantee the aligned
    probe window exists for any offset in [1, 15] (p = 16 - o <= 15 =
    80 - 65). Amplitudes bounded (999 * 2 < 32767): no int16 wrap."""
    d = catalog.load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") / 2).cast("long").alias("f"),
        (F.col("doc_id") % 2).cast("long").alias("v"),
    )

    def encode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            payloads = []
            for r in pdf.itertuples():
                nf = AFPA_ORIG_FRAMES if r.v == 0 else AFPA_EXCERPT_FRAMES
                samples = []
                for j in range(nf):
                    amp = _afpa_amp(r.f, r.v, j)
                    samples.extend(
                        amp if t % 2 == 0 else -amp
                        for t in range(AFP_FRAME_SIZE)
                    )
                payloads.append(media_codecs.wav_encode(samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": "audio/wav",
                    "payload": payloads,
                }
            )

    # round 14: spread the single-partition documents scan before the
    # codec map so encode (and every downstream fingerprint stage that
    # inherits this partitioning) uses the whole session, not one core
    return spread_small_scan(d).mapInPandas(
        encode_batches, schema=MEDIA_SCHEMA
    )


def _guarded_cross_pairs(
    probe_bands: DataFrame,
    archive_bands: DataFrame,
    max_hamming: int,
    extra_key: tuple[str, ...],
) -> DataFrame:
    """The shared candidate stage of both containment votes
    (frame-unit audio_probe_alignment and sample-unit
    audio_subframe_alignment): dhash_band_pairs in cross mode plus the
    self-pair guard — overlapping probe/archive media-id spaces must
    not emit trivial self-containment rows (hamming-0 votes at offset
    0); registry callers use disjoint id spaces, so this drops nothing
    there (r12 advice; ONE definition so a guard/verify fix cannot
    land in one vote and silently miss the other — r13 review)."""
    return dhash_band_pairs(
        probe_bands,
        archive_bands,
        max_hamming=max_hamming,
        extra_key=extra_key,
    ).where(F.col("media_a") != F.col("media_b"))


def audio_probe_alignment(
    probe_wbands: DataFrame,
    archive_wbands: DataFrame,
    probe_hop: int = 1,
    archive_hop: int = AFPW_HOP_FRAMES,
    max_hamming: int = DHASH_MAX_HAMMING,
) -> DataFrame:
    """Asymmetric containment vote: dense probe prints (hop
    ``probe_hop``) band-joined against sparse archive prints (hop
    ``archive_hop``) — the SAME generalized dhash_band_pairs kernel in
    cross mode — then the alignment vote in FRAME units:
    offset_frames = win_b * archive_hop - win_a * probe_hop is the
    frame at which the probe clip's content begins inside the archived
    clip (for a true containment; noise scatters). One row per matched
    (probe, archived) pair: the best-voted offset, its vote count and
    best hamming; ties break to the smallest offset.

    Scale: the archive side stays one print per {AFPW_HOP_FRAMES}
    frames — the dense side is the QUERY batch only; candidates remain
    band-bucketed (pigeonhole), no cartesian anywhere."""
    wpairs = _guarded_cross_pairs(
        probe_wbands, archive_wbands, max_hamming, ("win",)
    )
    offs = wpairs.groupBy(
        F.col("media_a").alias("media_q"),
        F.col("media_b").alias("media_r"),
        (
            F.col("win_b") * F.lit(archive_hop)
            - F.col("win_a") * F.lit(probe_hop)
        )
        .cast("long")
        .alias("offset_frames"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_aligned"),
        F.min("hamming").alias("min_hamming"),
    )
    w = Window.partitionBy("media_q", "media_r").orderBy(
        F.desc("n_aligned"), "offset_frames"
    )
    return (
        offs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "media_q", "media_r", "offset_frames", "n_aligned", "min_hamming"
        )
    )


def _afpa_ctes() -> str:
    """The asymmetric pipeline as CTEs: clips → closed-form energies →
    per-side windows (archive hop {AFPW_HOP_FRAMES} over v0, probe hop
    1 over v1) → band values → cross band join + hamming verify →
    frame-offset vote. Envelope/framing/banding definitions shared
    with every other audio oracle."""
    env_j = _afp_env_sql("j.j")
    env_j_off = _afp_env_sql("j.j + 1 + (f % 3) * 5")
    amp = f"CASE WHEN v = 0 THEN {env_j} ELSE ({env_j_off}) * 2 END"
    return f"""awc AS (
  SELECT doc_id AS media_id,
         doc_id // 2 AS f,
         doc_id %  2 AS v
  FROM documents
),
clips AS (
  SELECT media_id, f, v,
         CASE WHEN v = 0 THEN {AFPA_ORIG_FRAMES}
              ELSE {AFPA_EXCERPT_FRAMES} END AS nf,
         CASE WHEN v = 0 THEN {AFPW_HOP_FRAMES} ELSE 1 END AS hop
  FROM awc
),
en AS (
  SELECT c.media_id, j.j AS j, {AFP_FRAME_SIZE} * ({amp}) AS e
  FROM clips c, range({AFPA_ORIG_FRAMES}) j(j)
  WHERE j.j < c.nf
),
wins AS (
  SELECT c.media_id, c.v, c.hop, w.w AS w
  FROM clips c, range({AFPA_MAX_PROBE_WINDOWS}) w(w)
  WHERE w.w <= (c.nf - {AFP_FRAMES}) // c.hop
),
bits AS (
  -- delta-sign bit ONCE per frame position, then gathered per window:
  -- the four-relation computed-key join this replaces blew up the
  -- oracle engine's planner at sf0.1 (>30 min; this chain of single
  -- equi-joins replays identically in seconds)
  SELECT a.media_id, a.j,
         CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
  FROM en a JOIN en b ON b.media_id = a.media_id AND b.j = a.j + 1
),
wk AS (
  SELECT win.media_id, win.v, win.w, k.k AS k,
         win.w * win.hop + k.k AS j
  FROM wins win, range({AFP_FRAMES - 1}) k(k)
),
wbits AS (
  SELECT wk.media_id, wk.v, wk.w, wk.k, b.bit
  FROM wk JOIN bits b ON b.media_id = wk.media_id AND b.j = wk.j
),
wbands AS (
  SELECT media_id, v, w, k // 16 AS band_idx,
         CAST(sum(bit * (1 << (k % 16))) AS BIGINT) AS band_val
  FROM wbits GROUP BY media_id, v, w, k // 16
),
wcand AS (
  SELECT DISTINCT a.media_id AS mq, a.w AS wq, b.media_id AS mr, b.w AS wr
  FROM wbands a JOIN wbands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
  WHERE a.v = 1 AND b.v = 0
),
wpairs AS (
  SELECT c.mq, c.wq, c.mr, c.wr,
         CAST(sum(bit_count(xor(x.band_val, y.band_val))) AS BIGINT)
           AS hamming
  FROM wcand c
  JOIN wbands x ON x.media_id = c.mq AND x.w = c.wq
  JOIN wbands y ON y.media_id = c.mr AND y.w = c.wr
                AND y.band_idx = x.band_idx
  GROUP BY 1, 2, 3, 4
  HAVING sum(bit_count(xor(x.band_val, y.band_val)))
           <= {DHASH_MAX_HAMMING}
),
offs AS (
  SELECT mq AS media_q, mr AS media_r,
         CAST(wr * {AFPW_HOP_FRAMES} - wq AS BIGINT) AS offset_frames,
         CAST(count(*) AS BIGINT) AS n_aligned,
         min(hamming) AS min_hamming
  FROM wpairs GROUP BY 1, 2, 3
)"""


_AFPA_ORACLE = f"""
WITH {_afpa_ctes()}
SELECT media_q, media_r, offset_frames, n_aligned, min_hamming
FROM offs
QUALIFY row_number() OVER (PARTITION BY media_q, media_r
                           ORDER BY n_aligned DESC, offset_frames) = 1
"""


@_register("multimodal_audio_asym_containment", _AFPA_ORACLE)
def q_multimodal_audio_asym_containment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NON-hop-aligned audio containment: synthesize 97-frame originals
    alongside 80-frame x2-rescaled excerpts starting 1/6/11 frames in
    (never on the {AFPW_HOP_FRAMES}-frame hop grid — the class the
    round-11 hop-aligned matcher is structurally blind to),
    fingerprint the ARCHIVE side at the standard hop and the PROBE
    side at hop 1 through the real WAV codec, and report each
    excerpt's best-voted containment offset in frames. The expected
    signal — every excerpt finds its original at exactly
    offset_frames = _afpa_off(f) — is pinned by the hand fixture test;
    this registry entry hash-certifies the full algebra (codec,
    asymmetric windowing, banding, cross band join, frame-offset
    vote) against the closed-form oracle replay."""
    from ..session import stage

    media = stage(synthesize_afpa_media(spark, sf_dir))
    arch = audio_windowed_fingerprint_bands(
        media.where(F.col("media_id") % 2 == 0)
    )
    probe = audio_windowed_fingerprint_bands(
        media.where(F.col("media_id") % 2 == 1), hop_frames=1
    )
    return audio_probe_alignment(probe, arch)


# ---------------------------------------------------------------------------
# multimodal_audio_subframe_containment — SAMPLE-level (mid-frame)
# excerpt discovery
# ---------------------------------------------------------------------------

# The round-12 asymmetric matcher closes whole-FRAME offsets; an
# excerpt that starts mid-frame (offset not a multiple of the
# 8-sample frame) shifts every analysis-frame boundary, so every
# frame-grid energy is a blend of two original frames and the prints
# degrade — the documented blind class (ARCHITECTURE.md round 12).
# Haitsma-Kalker's production answer is OVERLAPPING ANALYSIS FRAMES on
# the probe side: fingerprint the query clip at a SAMPLE hop (here
# hop 1 — all 8 phases), so for any sample offset S there is a probe
# window starting at u = archive_window_start - S whose analysis
# frames land exactly on the original's frame grid. The archive side
# is untouched (still one print per 16-frame hop — the 100 TB side
# stays compact); densification cost rides the bounded query batch,
# now x8 over the round-12 probe (one print per sample instead of per
# frame).

AFPS_ORIG_FRAMES = AFP_FRAMES + 3 * AFPW_HOP_FRAMES  # originals: 113
AFPS_EXCERPT_FRAMES = AFP_FRAMES + 2 * AFPW_HOP_FRAMES + 1  # excerpts: 98
AFPS_EXCERPT_SAMPLES = AFPS_EXCERPT_FRAMES * AFP_FRAME_SIZE  # 784
# max probe window start (samples): 784 - 520 = 264
AFPS_MAX_PROBE_START = AFPS_EXCERPT_SAMPLES - AFP_FRAMES * AFP_FRAME_SIZE


def _afps_phase(f: int) -> int:
    """Sub-frame phase for family f — 1..7, NEVER 0: every excerpt
    starts mid-frame, so the frame-grid matcher is structurally blind
    (it cannot even represent the true offset, which is not a whole
    number of frames)."""
    return 1 + (f % 7)


def _afps_off_samples(f: int) -> int:
    """Excerpt start in SAMPLES for family f: the round-12 misaligned
    frame offset (1/6/11 — never on the hop grid) plus a nonzero
    sub-frame phase."""
    return AFP_FRAME_SIZE * _afpa_off(f) + _afps_phase(f)


def synthesize_afps_media(
    spark: SparkSession, sf_dir: str, rate: int = 1, rate_den: int = 1
) -> DataFrame:
    """SUB-FRAME-offset excerpt fixture: one real PCM WAV per document,
    family f = doc_id // 2, variant v = doc_id % 2 — v0 a 113-frame
    original with per-frame envelope amplitudes, v1 a 784-sample
    x2-rescaled TRUE SUBSEQUENCE of it starting _afps_off_samples(f)
    samples in (9..95, never a multiple of the 8-sample frame). TWO
    aligned probe windows exist for every S <= 95 (u = 128 - S and
    256 - S, both <= 264 = max start), so the true offset always
    collects n_aligned = 2: a phase-adjacent blended window can reach
    hamming 0 by delta-sign luck (measured 3/250 families at the
    1-vote design), but only a single vote — the 2-vote true offset
    out-votes it. Amplitudes bounded (999 * 2 <
    32767): no int16 wrap, so decoded samples are exactly the formula
    values and the oracle replays the blend arithmetic in closed
    form.

    ``rate`` (decimation rung): rate = d makes every v1 excerpt a
    d-x DECIMATED subsequence — sample t is orig[S + d*t] — of the
    same length in ORIGINAL time (len/d samples), the deterministic
    integer model of a downsampled re-post.

    ``rate_den`` (rational rung, round 14): rate/rate_den = q/p makes
    sample t = orig[S + (q*t)//p] — the upsample-by-p (zero-order
    hold) THEN decimate-by-q composition, the deterministic integer
    model of a nearest-neighbor fractional resampler. rate_den = 1
    reduces exactly to the integer path."""
    d = catalog.load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("media_id"),
        (F.col("doc_id") / 2).cast("long").alias("f"),
        (F.col("doc_id") % 2).cast("long").alias("v"),
    )

    def encode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        from . import media_codecs

        for pdf in batches:
            payloads = []
            for r in pdf.itertuples():
                if r.v == 0:
                    samples = []
                    for j in range(AFPS_ORIG_FRAMES):
                        amp = _afp_env(r.f, j)
                        samples.extend(
                            amp if t % 2 == 0 else -amp
                            for t in range(AFP_FRAME_SIZE)
                        )
                else:
                    s0 = _afps_off_samples(r.f)
                    idxs = [
                        s0 + (rate * t) // rate_den
                        for t in range(
                            (AFPS_EXCERPT_SAMPLES * rate_den) // rate
                        )
                    ]
                    samples = [
                        (
                            _afp_env(r.f, i // AFP_FRAME_SIZE)
                            * (1 if i % 2 == 0 else -1)
                            * 2
                        )
                        for i in idxs
                    ]
                payloads.append(media_codecs.wav_encode(samples))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": "audio/wav",
                    "payload": payloads,
                }
            )

    # round 14: spread the single-partition documents scan before the
    # codec map so encode (and every downstream fingerprint stage that
    # inherits this partitioning) uses the whole session, not one core
    return spread_small_scan(d).mapInPandas(
        encode_batches, schema=MEDIA_SCHEMA
    )


AFPS_BANDS_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("win", T.IntegerType()),
    ]
    + [T.StructField(f"band{k}", T.LongType()) for k in range(DHASH_BANDS)]
    + [
        T.StructField("e_head", T.LongType()),
        T.StructField("e_sum", T.LongType()),
    ]
)


def audio_subframe_fingerprint_bands(
    media: DataFrame,
    sample_hop: int = 1,
    frame_size: int = AFP_FRAME_SIZE,
    rate_num: int | None = None,
    rate_den: int = 1,
) -> DataFrame:
    """Overlapping-analysis-frame fingerprint stage: decode → |sample|
    prefix sums → slide the {AFP_FRAMES}-frame (520-sample) analysis
    window at ``sample_hop`` SAMPLES, one print per window, ``win`` =
    the window's start offset in SAMPLES (both sides of the sub-frame
    matcher use this stage: the archive at sample_hop = one full
    {AFPW_HOP_FRAMES}-frame hop — exactly as compact as the frame-grid
    archive — the probe at hop 1, every phase). Frame energies of
    every window come off one shared prefix-sum vector (decode runs
    once per clip; each window is one vectorized slice), so the stage
    stays a pure zero-shuffle Arrow map whose output grows linearly
    with clip duration x (frame_size / sample_hop).

    Besides the 4x16 delta-sign bands each print carries TWO exact
    integers — ``e_head`` (first frame energy) and ``e_sum`` (window
    energy) — the scale-consistency witness: a true alignment has all
    65 energies exactly proportional across the pair, so
    e_head_a * e_sum_b == e_sum_a * e_head_b in exact BIGINT
    cross-multiplication, while a sub-frame BLEND (whose delta SIGNS
    can all match by luck — measured ~1-4% of envelope families) has
    no rational scale relating it to the original. Sign bits find
    candidates; the integer invariant pins the exact phase.

    Unlike the frame-grid stage there is NO frame-alignment
    requirement on the clip length — that is the point: the probe
    clip was cut at an arbitrary sample. Mono and >= one whole window
    are still required.

    ``frame_size`` (round 13, decimation rung): probing a clip
    DECIMATED by integer factor d with analysis frames of
    {AFP_FRAME_SIZE}/d samples makes each probe frame span exactly
    one ORIGINAL frame of audio time, so delta signs line up with the
    archive prints and the energy witnesses stay exactly proportional
    (the scale invariant is RATE-invariant) — integer decimation
    stops being codec territory.

    ``rate_num``/``rate_den`` (round 14, rational rung): for a clip
    resampled at rational ratio q/p by zero-order hold
    (sample t = orig[(q*t)//p]), the one-original-frame span condition
    generalizes to frame_size * q == {AFP_FRAME_SIZE} * p — the frame
    grid still advances exactly {AFP_FRAME_SIZE} original samples per
    probe frame ((q*(u + fs*m))//p == (q*u)//p + {AFP_FRAME_SIZE}*m),
    so the per-window blend weights stay stationary and the scale
    invariant survives. Defaulting rate_num to
    {AFP_FRAME_SIZE} // frame_size keeps the integer-decimation
    contract (and its divisibility guard) unchanged. Nearest-neighbor
    (ZOH) resampling only: an interpolating resampler mixes adjacent
    original samples and leaves exact-integer territory — that
    boundary is adjudicated in ARCHITECTURE.md round 14."""

    if rate_num is None:
        if AFP_FRAME_SIZE % frame_size != 0:
            raise ValueError(
                f"frame_size must divide {AFP_FRAME_SIZE} (one probe "
                f"frame spans one original frame through integer "
                f"decimation), got {frame_size}"
            )
        rate_num = AFP_FRAME_SIZE // frame_size
        rate_den = 1
    if frame_size * rate_num != AFP_FRAME_SIZE * rate_den:
        raise ValueError(
            f"probe frame must span exactly one original frame: "
            f"frame_size * rate_num == {AFP_FRAME_SIZE} * rate_den, "
            f"got {frame_size} * {rate_num} != "
            f"{AFP_FRAME_SIZE} * {rate_den}"
        )

    def hash_batches(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from . import media_codecs

        win_samples = AFP_FRAMES * frame_size
        weights = 1 << (np.arange(AFP_FRAMES - 1, dtype=np.int64) % 16)
        for pdf in batches:
            frames = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                d = media_codecs.wav_decode(bytes(payload))
                ns = len(d["samples"])
                if d["n_channels"] != 1 or ns < win_samples:
                    raise ValueError(
                        "sub-frame audio fingerprint expects mono clips "
                        f"of >= {win_samples} samples, got "
                        f"{d['n_channels']}ch x {ns}"
                    )
                a = np.abs(np.asarray(d["samples"], dtype=np.int64))
                pref = np.concatenate(([0], np.cumsum(a)))
                starts = np.arange(0, ns - win_samples + 1, sample_hop)
                # frame-boundary prefix offsets per window: W x 66
                bounds = (
                    starts[:, None]
                    + np.arange(AFP_FRAMES + 1)[None, :] * frame_size
                )
                pb = pref[bounds]
                fe = np.diff(pb, axis=1)  # W x 65 frame energies
                bits = (fe[:, 1:] > fe[:, :-1]).astype(np.int64)
                packed = (
                    (bits * weights)
                    .reshape(len(starts), DHASH_BANDS, 16)
                    .sum(axis=2)
                )
                frames.append(
                    pd.DataFrame(
                        {
                            "media_id": mid,
                            "win": starts.astype("int32"),
                            **{
                                f"band{k}": packed[:, k]
                                for k in range(DHASH_BANDS)
                            },
                            "e_head": fe[:, 0],
                            "e_sum": pb[:, -1] - pb[:, 0],
                        }
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    return media.mapInPandas(hash_batches, schema=AFPS_BANDS_SCHEMA)


def audio_subframe_alignment(
    probe_sbands: DataFrame,
    archive_sbands: DataFrame,
    max_hamming: int = DHASH_MAX_HAMMING,
    probe_rate: int = 1,
    probe_rate_den: int = 1,
) -> DataFrame:
    """Sample-unit containment vote over sub-frame prints (both sides
    from audio_subframe_fingerprint_bands, ``win`` in SAMPLES): the
    same generalized dhash_band_pairs kernel in cross mode — the
    energy witnesses ride along as extra print-identity columns, they
    are functionally determined by (media_id, win) — then
    offset_samples = win_b - win_a, the SAMPLE at which the probe
    clip's content begins inside the archived clip. One row per
    matched (probe, archived) pair: the best-voted offset with
    ``n_exact`` counting the votes whose energies are EXACTLY
    proportional (BIGINT cross-multiplication — the scale-consistency
    invariant; see the fingerprint stage docstring). ``probe_rate``
    (round-13 decimation rung): when the probe clip is a d-x
    DECIMATED copy, one probe sample spans d original samples, so the
    vote maps probe window starts back to original time
    (offset_samples = win_b - d * win_a) — the invariant itself needs
    no change, proportional energies stay proportional through
    decimation. ``probe_rate_den`` (round-14 rational rung): a clip
    ZOH-resampled at ratio q/p puts probe sample u at original sample
    (q*u)//p EXACTLY (the ZOH index map), so the vote generalizes to
    offset_samples = win_b - (q*win_a)//p — still exact, no grid
    ambiguity beyond the map itself; den = 1 reduces to the integer
    path bit-for-bit.

    Ranking is the sub-frame lesson (measured on the fixture, r13):
    a phase-adjacent blended window tracks the original's delta signs
    (flip needs an opposing next-delta >7x larger, so whole FAMILIES
    go flip-free — 3/250 at 1 vote, 9/250 at 2: the luck is
    per-phase, CORRELATED across windows, so vote count cannot
    separate it) — but no blend has a rational scale, so n_exact
    DESC ranks the true phase first, then n_aligned, min_hamming,
    smallest offset. Archive stays compact (one print per
    {AFPW_HOP_FRAMES}-frame hop); candidates remain band-bucketed,
    no cartesian anywhere."""
    wpairs = _guarded_cross_pairs(
        probe_sbands, archive_sbands, max_hamming,
        ("win", "e_head", "e_sum"),
    )
    exact = (
        F.col("e_head_a") * F.col("e_sum_b")
        == F.col("e_sum_a") * F.col("e_head_b")
    )
    if probe_rate_den == 1:
        mapped = F.lit(probe_rate) * F.col("win_a")
    else:
        # win_a >= 0 always, so DIV == floor division == the ZOH map
        mapped = F.expr(f"({probe_rate} * win_a) DIV {probe_rate_den}")
    offs = wpairs.groupBy(
        F.col("media_a").alias("media_q"),
        F.col("media_b").alias("media_r"),
        (F.col("win_b") - mapped).cast("long").alias("offset_samples"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_aligned"),
        F.sum(F.when(exact, 1).otherwise(0)).cast("long").alias("n_exact"),
        F.min("hamming").alias("min_hamming"),
    )
    w = Window.partitionBy("media_q", "media_r").orderBy(
        F.desc("n_exact"), F.desc("n_aligned"), "min_hamming",
        "offset_samples",
    )
    return (
        offs.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select(
            "media_q",
            "media_r",
            "offset_samples",
            "n_aligned",
            "n_exact",
            "min_hamming",
        )
    )


def _afps_ctes(rate: int = 1, rate_den: int = 1) -> str:
    """The sub-frame pipeline as CTEs: excerpt start S(f) in samples →
    archive windows over closed-form frame energies (v0, one window
    per {AFPW_HOP_FRAMES}-frame hop, win in samples) → per-PHASE probe
    energies in closed form — an analysis frame starting at original
    sample 8*c0 + r sums (8 - r) samples of original frame c0 and r
    samples of frame c0 + 1, so E_p(m) = 2*((8-r)*env(c0+m) +
    r*env(c0+m+1)) with r, c0 constant per phase — → per-phase delta
    bits gathered per window → band values + energy witnesses → cross
    band join + hamming verify → SAMPLE-offset vote ranked by the
    exact-scale invariant first. Envelope and banding shared with
    every other audio oracle; chained two-relation equi-joins
    throughout (the four-relation computed-key form blew up the
    oracle planner at sf0.1 — ARCHITECTURE.md round 12).

    ``rate`` (decimation rung): with a d-x decimated excerpt the
    probe analysis frame is 8/d samples spanning 8 ORIGINAL samples,
    so a probe frame at phase r = (S + d*u) % 8 holds
    c = (7 - r) // d + 1 samples of original frame c0 + m and the
    rest of frame c0 + m + 1 — same per-phase stationary blend, just
    d-dependent weights; offsets map back to original time as
    ur - d * uq.

    ``rate_den`` (rational rung, round 14): a q/p ZOH-resampled
    excerpt (sample t = orig[S + (q*t)//p]) keeps the SAME stationary
    structure because the probe frame grid still advances exactly 8
    original samples per frame (fs*q == 8*p): phase quantities depend
    only on p0 = u mod fs — original start a0 = S + (p0*q)//p,
    r = a0 % 8, and the first-frame sample count generalizes from the
    closed form (7-r)//d + 1 to a counting CTE over the within-frame
    ZOH offsets ((w + t*q)//p with w = (p0*q) % p); the offset map
    becomes ur - (q*uq)//p. rate_den = 1 emits the integer-path SQL
    byte-for-byte."""
    if rate_den == 1 and AFP_FRAME_SIZE % rate != 0:
        raise ValueError(
            f"rate must divide {AFP_FRAME_SIZE}, got {rate}"
        )
    if (AFP_FRAME_SIZE * rate_den) % rate != 0:
        raise ValueError(
            f"rate/rate_den must satisfy rate | "
            f"{AFP_FRAME_SIZE} * rate_den, got {rate}/{rate_den}"
        )
    env_aj = _afp_env_sql("j.j")
    env_c0m = _afp_env_sql("c0 + m")
    env_c0m1 = _afp_env_sql("c0 + m + 1")
    n_arch_wins = (AFPS_ORIG_FRAMES - AFP_FRAMES) // AFPW_HOP_FRAMES + 1
    hop_samples = AFPW_HOP_FRAMES * AFP_FRAME_SIZE
    # probe analysis frame size: fs * rate == 8 * rate_den exactly
    fs = (AFP_FRAME_SIZE * rate_den) // rate
    n_probe = (AFPS_EXCERPT_SAMPLES * rate_den) // rate
    max_start = n_probe - AFP_FRAMES * fs
    max_m0 = max_start // fs             # 33 at every rate
    n_m = max_m0 + AFP_FRAMES + 1        # energies 0..max_m0+65
    if rate_den == 1:
        pen_block = f"""pen AS (
  -- per-phase probe frame energy: c of the frame's {{fs}} samples lie
  -- in original frame c0+m, the rest in c0+m+1 (c = (7-r)//rate + 1)
  SELECT q.media_id, q.p, q.m,
         2 * ((({AFP_FRAME_SIZE - 1} - q.r) // {rate} + 1) * ({env_c0m})
              + ({fs} - (({AFP_FRAME_SIZE - 1} - q.r) // {rate} + 1))
                * ({env_c0m1})) AS e
  FROM (
    SELECT pp.media_id, pp.f AS f, p.p AS p, m.m AS m,
           (pp.s0 + {rate} * p.p) % {AFP_FRAME_SIZE} AS r,
           (pp.s0 + {rate} * p.p) // {AFP_FRAME_SIZE} AS c0
    FROM pparm pp, range({fs}) p(p), range({n_m}) m(m)
  ) q
),"""
        offset_expr = f"ur - {rate} * uq"
    else:
        pen_block = f"""pphase AS (
  -- per-phase ZOH geometry: original start a0 = s0 + (p*q)//den,
  -- frame phase r = a0 % 8, within-frame ZOH residue w = (p*q) % den
  SELECT pp.media_id, pp.f AS f, p.p AS p,
         (pp.s0 + (p.p * {rate}) // {rate_den}) % {AFP_FRAME_SIZE} AS r,
         (pp.s0 + (p.p * {rate}) // {rate_den}) // {AFP_FRAME_SIZE} AS c0,
         (p.p * {rate}) % {rate_den} AS wr
  FROM pparm pp, range({fs}) p(p)
),
pcnt AS (
  -- c(p): how many of the frame's {fs} ZOH samples land in the FIRST
  -- spanned original frame (the rest land in the next one)
  SELECT ph.media_id, ph.p,
         CAST(sum(CASE WHEN ph.r + (ph.wr + t.t * {rate}) // {rate_den}
                         <= {AFP_FRAME_SIZE - 1} THEN 1 ELSE 0 END)
              AS BIGINT) AS c
  FROM pphase ph, range({fs}) t(t)
  GROUP BY 1, 2
),
pen AS (
  SELECT q.media_id, q.p, q.m,
         2 * (q.c * ({env_c0m})
              + ({fs} - q.c) * ({env_c0m1})) AS e
  FROM (
    SELECT ph.media_id, ph.f AS f, ph.p AS p, m.m AS m,
           ph.c0 AS c0, pc.c AS c
    FROM pphase ph
    JOIN pcnt pc ON pc.media_id = ph.media_id AND pc.p = ph.p,
         range({n_m}) m(m)
  ) q
),"""
        offset_expr = f"ur - ({rate} * uq) // {rate_den}"
    return f"""awc AS (
  SELECT doc_id AS media_id,
         doc_id // 2 AS f,
         doc_id %  2 AS v
  FROM documents
),
pparm AS (
  SELECT media_id, f,
         {AFP_FRAME_SIZE} * (1 + (f % 3) * 5) + 1 + (f % 7) AS s0
  FROM awc WHERE v = 1
),
aen AS (
  SELECT c.media_id, j.j AS j, {AFP_FRAME_SIZE} * ({env_aj}) AS e
  FROM awc c, range({AFPS_ORIG_FRAMES}) j(j)
  WHERE c.v = 0
),
abit AS (
  SELECT a.media_id, a.j, CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
  FROM aen a JOIN aen b ON b.media_id = a.media_id AND b.j = a.j + 1
),
awin AS (
  SELECT c.media_id, w.w AS w, w.w * {hop_samples} AS u
  FROM awc c, range({n_arch_wins}) w(w)
  WHERE c.v = 0
),
awk AS (
  SELECT win.media_id, win.u, k.k AS k,
         win.w * {AFPW_HOP_FRAMES} + k.k AS j
  FROM awin win, range({AFP_FRAMES - 1}) k(k)
),
awbits AS (
  SELECT wk.media_id, wk.u, wk.k, b.bit
  FROM awk wk JOIN abit b ON b.media_id = wk.media_id AND b.j = wk.j
),
abands AS (
  SELECT media_id, u, k // 16 AS band_idx,
         CAST(sum(bit * (1 << (k % 16))) AS BIGINT) AS band_val
  FROM awbits GROUP BY media_id, u, k // 16
),
awe AS (
  SELECT wk2.media_id, wk2.u,
         CAST(sum(CASE WHEN wk2.k = 0 THEN e.e ELSE 0 END) AS BIGINT)
           AS e_head,
         CAST(sum(e.e) AS BIGINT) AS e_sum
  FROM (
    SELECT win.media_id, win.u, k.k AS k,
           win.w * {AFPW_HOP_FRAMES} + k.k AS j
    FROM awin win, range({AFP_FRAMES}) k(k)
  ) wk2 JOIN aen e ON e.media_id = wk2.media_id AND e.j = wk2.j
  GROUP BY wk2.media_id, wk2.u
),
{pen_block}
pbit AS (
  SELECT a.media_id, a.p, a.m,
         CASE WHEN b.e > a.e THEN 1 ELSE 0 END AS bit
  FROM pen a JOIN pen b ON b.media_id = a.media_id AND b.p = a.p
                       AND b.m = a.m + 1
),
pwin AS (
  SELECT pp.media_id, p.p AS p, m0.m0 AS m0,
         p.p + {fs} * m0.m0 AS u
  FROM pparm pp, range({fs}) p(p), range({max_m0 + 1}) m0(m0)
  WHERE p.p + {fs} * m0.m0 <= {max_start}
),
pwk AS (
  SELECT win.media_id, win.u, win.p, win.m0 + k.k AS m, k.k AS k
  FROM pwin win, range({AFP_FRAMES - 1}) k(k)
),
pwbits AS (
  SELECT wk.media_id, wk.u, wk.k, b.bit
  FROM pwk wk JOIN pbit b ON b.media_id = wk.media_id AND b.p = wk.p
                         AND b.m = wk.m
),
pbands AS (
  SELECT media_id, u, k // 16 AS band_idx,
         CAST(sum(bit * (1 << (k % 16))) AS BIGINT) AS band_val
  FROM pwbits GROUP BY media_id, u, k // 16
),
pwe AS (
  SELECT wk2.media_id, wk2.u,
         CAST(sum(CASE WHEN wk2.k = 0 THEN e.e ELSE 0 END) AS BIGINT)
           AS e_head,
         CAST(sum(e.e) AS BIGINT) AS e_sum
  FROM (
    SELECT win.media_id, win.u, win.p, win.m0 + k.k AS m, k.k AS k
    FROM pwin win, range({AFP_FRAMES}) k(k)
  ) wk2 JOIN pen e ON e.media_id = wk2.media_id AND e.p = wk2.p
                  AND e.m = wk2.m
  GROUP BY wk2.media_id, wk2.u
),
scand AS (
  SELECT DISTINCT a.media_id AS mq, a.u AS uq, b.media_id AS mr,
                  b.u AS ur
  FROM pbands a JOIN abands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val
  WHERE a.media_id != b.media_id
),
spairs AS (
  SELECT c.mq, c.uq, c.mr, c.ur,
         CAST(sum(bit_count(xor(x.band_val, y.band_val))) AS BIGINT)
           AS hamming
  FROM scand c
  JOIN pbands x ON x.media_id = c.mq AND x.u = c.uq
  JOIN abands y ON y.media_id = c.mr AND y.u = c.ur
                AND y.band_idx = x.band_idx
  GROUP BY 1, 2, 3, 4
  HAVING sum(bit_count(xor(x.band_val, y.band_val)))
           <= {DHASH_MAX_HAMMING}
),
sver AS (
  SELECT s.mq, s.uq, s.mr, s.ur, s.hamming,
         CASE WHEN pe.e_head * ae.e_sum = pe.e_sum * ae.e_head
              THEN 1 ELSE 0 END AS exact_scale
  FROM spairs s
  JOIN pwe pe ON pe.media_id = s.mq AND pe.u = s.uq
  JOIN awe ae ON ae.media_id = s.mr AND ae.u = s.ur
),
soffs AS (
  SELECT mq AS media_q, mr AS media_r,
         CAST({offset_expr} AS BIGINT) AS offset_samples,
         CAST(count(*) AS BIGINT) AS n_aligned,
         CAST(sum(exact_scale) AS BIGINT) AS n_exact,
         min(hamming) AS min_hamming
  FROM sver GROUP BY 1, 2, 3
)"""


_AFPS_ORACLE = f"""
WITH {_afps_ctes()}
SELECT media_q, media_r, offset_samples, n_aligned, n_exact, min_hamming
FROM soffs
QUALIFY row_number() OVER (PARTITION BY media_q, media_r
                           ORDER BY n_exact DESC, n_aligned DESC,
                                    min_hamming, offset_samples) = 1
"""


@_register("multimodal_audio_subframe_containment", _AFPS_ORACLE)
def q_multimodal_audio_subframe_containment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MID-FRAME audio containment: synthesize 113-frame originals
    alongside 784-sample x2-rescaled true subsequences starting
    _afps_off_samples(f) samples in — never a whole number of frames,
    the class the round-12 frame-grid asymmetric matcher is
    structurally blind to (it votes in whole frames and cannot even
    represent the true offset). Both sides fingerprint with
    overlapping analysis frames through the real WAV codec
    (audio_subframe_fingerprint_bands): the ARCHIVE at one print per
    {AFPW_HOP_FRAMES}-frame hop (exactly as compact as the frame-grid
    archive), the PROBE at sample hop 1 — every phase; the vote
    reports each excerpt's best containment offset in SAMPLES, ranked
    by the exact-scale BIGINT invariant first (sub-frame blends can
    match all 64 delta SIGNS by luck, but never the energy
    proportions). The expected signal — every excerpt finds its
    original at exactly offset_samples = _afps_off_samples(f) with
    n_exact = 2 and min_hamming 0 — is pinned by the hand fixture
    test; this registry entry hash-certifies the full algebra (codec,
    sub-frame blend energies, banding, energy witnesses, cross band
    join, sample-offset vote) against the closed-form oracle
    replay."""
    from ..session import stage

    media = stage(synthesize_afps_media(spark, sf_dir))
    arch = audio_subframe_fingerprint_bands(
        media.where(F.col("media_id") % 2 == 0),
        sample_hop=AFPW_HOP_FRAMES * AFP_FRAME_SIZE,
    )
    probe = audio_subframe_fingerprint_bands(
        media.where(F.col("media_id") % 2 == 1)
    )
    return audio_subframe_alignment(probe, arch)


# ---------------------------------------------------------------------------
# multimodal_audio_decimated_containment — DOWNSAMPLED excerpt discovery
# ---------------------------------------------------------------------------

AFPD_RATE = 2  # decimation factor of the fixture's excerpts

_AFPD_ORACLE = f"""
WITH {_afps_ctes(rate=AFPD_RATE)}
SELECT media_q, media_r, offset_samples, n_aligned, n_exact, min_hamming
FROM soffs
QUALIFY row_number() OVER (PARTITION BY media_q, media_r
                           ORDER BY n_exact DESC, n_aligned DESC,
                                    min_hamming, offset_samples) = 1
"""


@_register("multimodal_audio_decimated_containment", _AFPD_ORACLE)
def q_multimodal_audio_decimated_containment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DOWNSAMPLED audio containment — the next rung after sub-frame
    offsets: every excerpt is a 2x-DECIMATED (every other sample)
    x2-rescaled subsequence of its original, starting
    _afps_off_samples(f) samples in (still never a whole frame). The
    probe fingerprints the decimated clip with 4-SAMPLE analysis
    frames (audio_subframe_fingerprint_bands frame_size=4): each
    probe frame spans exactly one ORIGINAL frame of audio time, so at
    the aligned phase the delta signs equal the archive print's and
    the energies stay exactly proportional — the scale invariant is
    RATE-invariant, so the same n_exact-first vote pins the true
    offset in ORIGINAL samples FLOORED TO THE DECIMATION GRID
    (offset = win_b - 2 * win_a = S - (S mod 2): a d-x decimated
    copy carries no information below d original samples — both
    sub-positions of a frame produce identical prints — so the
    reported offset is the exact grid point, pinned per family). The
    archive is UNTOUCHED (the same compact hop-128 prints serve
    native-rate, sub-frame and decimated probes — the whole point:
    query-side cost, archive-side stability). Closed-form oracle:
    the per-phase blend generalizes to c = (7 - r) // 2 + 1 samples
    of frame c0+m per probe frame; hand pins + registry pin in
    tests. Integer decimation only — fractional resampling remains
    codec territory."""
    from ..session import stage

    media = stage(synthesize_afps_media(spark, sf_dir, rate=AFPD_RATE))
    arch = audio_subframe_fingerprint_bands(
        media.where(F.col("media_id") % 2 == 0),
        sample_hop=AFPW_HOP_FRAMES * AFP_FRAME_SIZE,
    )
    probe = audio_subframe_fingerprint_bands(
        media.where(F.col("media_id") % 2 == 1),
        frame_size=AFP_FRAME_SIZE // AFPD_RATE,
    )
    return audio_subframe_alignment(probe, arch, probe_rate=AFPD_RATE)


# ---------------------------------------------------------------------------
# multimodal_audio_rational_containment — FRACTIONALLY-resampled excerpts
# ---------------------------------------------------------------------------

# Ratio q/p = 4/3: the excerpt is the original upsampled by 3 (zero-
# order hold) then decimated by 4 — probe sample t = orig[S + (4t)//3],
# a 4/3-x "slowed-capture" re-post. The supportable rational class is
# q | 8p with ZOH resampling: the probe analysis frame (fs = 8p/q
# samples) then spans exactly 8 original samples, the per-window blend
# weights are stationary (they depend only on u mod fs), and for every
# sub-frame phase class of the fixture exactly one window-residue
# family is PURE (all fs ZOH samples of each frame inside one original
# frame), exactly proportional to the untouched archive prints. An
# INTERPOLATING resampler leaves this class — the measured boundary is
# adjudicated in ARCHITECTURE.md round 14.

AFPR_NUM = 4   # resample ratio numerator (original samples ...)
AFPR_DEN = 3   # ... per rate_den probe samples: q/p = 4/3

_AFPR_ORACLE = f"""
WITH {_afps_ctes(rate=AFPR_NUM, rate_den=AFPR_DEN)}
SELECT media_q, media_r, offset_samples, n_aligned, n_exact, min_hamming
FROM soffs
QUALIFY row_number() OVER (PARTITION BY media_q, media_r
                           ORDER BY n_exact DESC, n_aligned DESC,
                                    min_hamming, offset_samples) = 1
"""


@_register("multimodal_audio_rational_containment", _AFPR_ORACLE)
def q_multimodal_audio_rational_containment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FRACTIONALLY-resampled audio containment — the rung after
    integer decimation: every excerpt is a 4/3-x ZOH-resampled
    (probe sample t = orig[S + (4t)//3]) x2-rescaled subsequence of
    its original starting _afps_off_samples(f) samples in (still
    never a whole frame). The probe fingerprints with 6-SAMPLE
    analysis frames (fs*4 == 8*3): each probe frame spans exactly one
    ORIGINAL frame of audio time, the ZOH frame grid advances 8
    original samples per frame, and for each family exactly one
    window-residue class is phase-PURE — its energies exactly
    proportional to the archive prints, so the n_exact-first vote
    pins the containment offset at the ZOH grid point
    S - (1 if S % 4 == 1 else 0) with n_exact = 2 (archive windows
    128 and 256), derived in closed form and pinned per family in
    tests. The archive is UNTOUCHED — the same compact hop-128
    prints now serve native-rate, sub-frame, integer-decimated AND
    rational-ZOH probes; all densification cost rides the bounded
    query batch. Closed-form oracle: the per-phase blend weight
    generalizes to a counting CTE over the within-frame ZOH offsets.
    ZOH (nearest-neighbor) resampling only — interpolating
    resamplers mix adjacent samples and are adjudicated out in
    ARCHITECTURE.md round 14."""
    from ..session import stage

    media = stage(
        synthesize_afps_media(
            spark, sf_dir, rate=AFPR_NUM, rate_den=AFPR_DEN
        )
    )
    arch = audio_subframe_fingerprint_bands(
        media.where(F.col("media_id") % 2 == 0),
        sample_hop=AFPW_HOP_FRAMES * AFP_FRAME_SIZE,
    )
    probe = audio_subframe_fingerprint_bands(
        media.where(F.col("media_id") % 2 == 1),
        frame_size=(AFP_FRAME_SIZE * AFPR_DEN) // AFPR_NUM,
        rate_num=AFPR_NUM,
        rate_den=AFPR_DEN,
    )
    return audio_subframe_alignment(
        probe, arch, probe_rate=AFPR_NUM, probe_rate_den=AFPR_DEN
    )
