"""Token-window chunking and greedy sequence packing — the operators that
turn curated documents into model-ready training sequences
(BASELINE.json north star).

Scale design:

- **chunking** is pure column algebra: per-doc chunk starts come from
  ``sequence``, each chunk is a ``slice`` + ``array_join`` — a map-only
  generator stage, zero shuffles, embarrassingly parallel over splits.
- **packing** is genuinely sequential within a stratum (each bin's fill
  depends on every prior document), so it runs as an Arrow-batched
  ``applyInPandas`` per language group — the one legitimate Python
  stage — with a deterministic doc_id order so output is reproducible
  under any partitioning. At 100 TB the stratum is the unit of
  parallelism (languages × shards); a global greedy pack would serialize
  the world, which no trainer needs.
"""

from __future__ import annotations

import pandas as pd
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


# ---------------------------------------------------------------------------
# chunk_documents — strided token windows (RAG/training chunking)
# ---------------------------------------------------------------------------

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@_register(
    "chunk_documents",
    f"""
SELECT doc_id,
       CAST(u.i AS INTEGER)                                  AS chunk_idx,
       CAST(len(toks[u.s : u.s + {CHUNK_TOKENS - 1}]) AS INTEGER)
                                                             AS n_chunk_tokens,
       array_to_string(toks[u.s : u.s + {CHUNK_TOKENS - 1}], ' ') AS chunk_text
FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
     unnest([{{'i': i, 's': 1 + i * {CHUNK_STRIDE}}}
             FOR i IN range(0, CAST(ceil(len(toks) / {CHUNK_STRIDE}.0) AS BIGINT))])
       AS u(u)
""",
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strided token-window chunking ({CHUNK_TOKENS} tokens, stride
    {CHUNK_STRIDE}): every token is covered (stride <= width), consecutive
    chunks overlap for context continuity, the final chunk may be short.
    Map-only generator — no shuffle, no Python."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n = F.size(toks)
    n_chunks = F.ceil(n / F.lit(float(CHUNK_STRIDE))).cast("int")
    base = d.select("doc_id", toks.alias("toks"), n_chunks.alias("nc"))
    idx = base.select(
        "doc_id",
        "toks",
        F.posexplode(F.sequence(F.lit(1), F.col("nc"))).alias("chunk_idx", "_"),
    )
    chunk = F.slice(
        F.col("toks"), F.col("chunk_idx") * CHUNK_STRIDE + 1, CHUNK_TOKENS
    )
    return idx.select(
        "doc_id",
        "chunk_idx",
        F.size(chunk).alias("n_chunk_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


# ---------------------------------------------------------------------------
# pack_documents — greedy sequential packing into token-budget bins
# ---------------------------------------------------------------------------

PACK_BUDGET = 512

_PACK_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.IntegerType()),
        T.StructField("bin_id", T.LongType()),
        T.StructField("bin_fill", T.IntegerType()),
    ]
)


def pack_documents(
    docs: DataFrame, budget: int = PACK_BUDGET, stratum: str = "lang"
) -> DataFrame:
    """Greedy first-fit-in-order packing of documents into bins of at most
    ``budget`` tokens, per stratum. Sequential by construction (bin state
    threads through the scan), hence an Arrow-batched applyInPandas per
    stratum with deterministic doc_id order. A document larger than the
    budget gets its own bin (never split here — splitting is
    chunk_documents' job upstream)."""

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_ids, fills = [], []
        bid, fill = 0, 0
        for n in pdf["n_tokens"]:
            if fill > 0 and fill + n > budget:
                bid += 1
                fill = 0
            fill += int(n)
            bin_ids.append(bid)
            fills.append(fill)
        pdf["bin_id"] = bin_ids
        pdf["bin_fill"] = fills
        return pdf[["lang", "doc_id", "n_tokens", "bin_id", "bin_fill"]]

    sized = docs.select(
        stratum,
        "doc_id",
        F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
    )
    return sized.groupBy(stratum).applyInPandas(pack, schema=_PACK_SCHEMA)


@_register("pack_documents")  # sequential state per stratum → rows-only
def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: per-language greedy bin assignment under
    a {PACK_BUDGET}-token budget. The bin id depends on every prior doc in
    the stratum (a running reset-on-overflow), which ANSI SQL window
    functions cannot express — invariants (coverage, budget, determinism)
    are pinned in tests/test_packing.py instead of a SQL oracle."""
    return pack_documents(catalog.load_table(spark, sf_dir, "documents"))
