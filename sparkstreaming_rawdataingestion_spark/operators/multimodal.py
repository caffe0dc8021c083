"""Multimodal column conventions — image/audio/video as opaque ``binary``
payloads with typed metadata (BASELINE.json north star).

This generalizes the reference's schemaless-payload pattern (the opaque
``sample`` JSON string, RawDataIngestion.java:140) to binary media: the
engine never imposes structure on the payload at rest; decode/feature
steps are explicit Arrow-batched ``mapInPandas`` stages.

The actual image/audio codecs are NOT in this container, so the decode
kernels are stubbed: ``decode_image_meta(..., fake=True)`` derives
deterministic pseudo-dimensions arithmetically (oracle-checkable), while
``fake=False`` raises NotImplementedError where Pillow/libav would be
called. The Spark-side plumbing — binary schema, Arrow batch transfer,
UDF signatures, partition-parallel decode — is real and tested.

Scale notes: payloads ride the scan as a single binary column (parquet
keeps them row-group-local); decode is a pure map (zero shuffle) whose
parallelism = input splits; Arrow batching amortizes Python crossing to
~10k rows per hop.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

from .. import catalog

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
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode("text", "UTF-8").alias("payload"),
    )


def decode_image_meta(
    media: DataFrame, fake: bool = True, carry: tuple[str, ...] = ()
) -> DataFrame:
    """Arrow-batched decode stage: payload → (dims, channels).

    ``fake=True``: deterministic pseudo-decode from byte length (the test
    path — container has no image codecs). ``fake=False``: the real
    Pillow decode, stubbed behind NotImplementedError here.
    ``carry``: extra input columns passed through the decode batch
    unchanged (the pattern a real pipeline needs to keep digests/ids
    alongside decoded metadata without a re-join).
    """
    out_schema = T.StructType(
        list(DECODED_META_SCHEMA.fields) + [media.schema[c] for c in carry]
    )

    def decode_batches(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                # Real path (requires Pillow, absent in this container):
                #   img = PIL.Image.open(io.BytesIO(b)); w, h = img.size ...
                raise NotImplementedError(
                    "image codecs not available in this environment"
                )
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
    """Video frame-sampling stub: emits one row per sampled 'frame' offset.
    Real frame extraction (libav) is NotImplemented; the fan-out plumbing
    (1 payload → N frame rows, offsets carried) is the real pattern."""
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
