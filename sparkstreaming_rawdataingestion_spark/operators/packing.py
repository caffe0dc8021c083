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
from pyspark.sql import DataFrame, SparkSession, Window, functions as F, types as T

from .. import catalog, session
from .profiling import _MMH2

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


# The running reset-on-overflow is beyond ANSI window functions but NOT
# beyond SQL: a recursive CTE threads (bin_id, bin_fill) row-by-row down
# each stratum's doc_id order — one recursion step per rank, all strata
# advancing in parallel. The seed row needs no fill > 0 overflow check
# (fill starts at its own n_tokens and never returns to 0), matching the
# Python kernel exactly, oversized-doc-gets-own-bin included.
_PACK_ORACLE = f"""
WITH RECURSIVE sized AS (
  SELECT lang, doc_id,
         CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
         row_number() OVER (PARTITION BY lang ORDER BY doc_id) AS rn
  FROM documents
),
packed AS (
  SELECT lang, doc_id, n_tokens, rn,
         CAST(0 AS BIGINT) AS bin_id, n_tokens AS bin_fill
  FROM sized WHERE rn = 1
  UNION ALL
  SELECT s.lang, s.doc_id, s.n_tokens, s.rn,
         CASE WHEN p.bin_fill + s.n_tokens > {PACK_BUDGET}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.bin_fill + s.n_tokens > {PACK_BUDGET}
              THEN s.n_tokens ELSE p.bin_fill + s.n_tokens END
  -- IS NOT DISTINCT FROM: a NULL-lang stratum must advance through the
  -- recursion like any other (NULL = NULL would stall it at rank 1 and
  -- silently drop the stratum's tail)
  FROM packed p
  JOIN sized s ON s.lang IS NOT DISTINCT FROM p.lang AND s.rn = p.rn + 1
)
SELECT lang, doc_id, n_tokens, bin_id, CAST(bin_fill AS INTEGER) AS bin_fill
FROM packed
"""


@_register("pack_documents", _PACK_ORACLE)
def q_pack_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence packing: per-language greedy bin assignment under
    a {PACK_BUDGET}-token budget. The bin id depends on every prior doc in
    the stratum (a running reset-on-overflow) — sequential per stratum in
    the engine (Arrow applyInPandas), and a recursive CTE on the DuckDB
    side, so the hash oracle covers the exact bin assignment; invariants
    (coverage, budget, determinism) are additionally pinned in
    tests/test_packing.py."""
    return pack_documents(catalog.load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# contrastive_negative_pairs — deterministic negative sampling
# ---------------------------------------------------------------------------

_NEG_K = 3  # negatives per anchor

_NEG_ORACLE = f"""
WITH idx AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY doc_id) - 1 AS rn,
         (SELECT count(*) FROM documents) AS n
  FROM documents
),
cand AS (
  SELECT a.doc_id AS anchor_id, j,
         ((a.rn + 1 + ((a.doc_id % 4294967296) * {_MMH2}
                       % 4294967296 + j * 2654435761) % (a.n - 1))
          % a.n) AS neg_rn
  FROM idx a CROSS JOIN generate_series(1, {_NEG_K}) AS t(j)
)
SELECT c.anchor_id, CAST(c.j AS INTEGER) AS neg_no, b.doc_id AS negative_id
FROM cand c JOIN idx b ON b.rn = c.neg_rn
"""


@_register("contrastive_negative_pairs", _NEG_ORACLE)
def q_contrastive_negative_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Deterministic negative sampling for contrastive training: each
    anchor document gets {_NEG_K} pseudo-random OTHER documents, chosen
    by multiplicative-hash arithmetic over the dense row index —
    reproducible across runs and engines (no RNG), and self-pairs are
    structurally impossible (the offset lives in [1, n−1], applied
    modulo n).

    Plan: the dense index is one dimension-sized ranking; candidates
    are a map-side 1→k fanout; the resolve step is a single equi-join
    on the integer index — no shuffle of document payloads."""
    d = catalog.load_table(spark, sf_dir, "documents").select("doc_id")
    n_total = d.agg(F.count(F.lit(1)).alias("n"))
    idx = session.stage(
        d.select(
            "doc_id",
            (F.row_number().over(Window.orderBy("doc_id")) - 1).alias("rn"),
        ).crossJoin(F.broadcast(n_total))
    )
    js = F.explode(
        F.array(*[F.lit(j) for j in range(1, _NEG_K + 1)])
    ).alias("j")
    h = (F.col("doc_id") % F.lit(4294967296)) * F.lit(_MMH2) % F.lit(
        4294967296
    )
    cand = idx.select("doc_id", "rn", "n", js).select(
        F.col("doc_id").alias("anchor_id"),
        "j",
        (
            (
                F.col("rn")
                + 1
                + (h + F.col("j") * F.lit(2654435761)) % (F.col("n") - 1)
            )
            % F.col("n")
        ).alias("neg_rn"),
    )
    b = idx.select(F.col("rn").alias("neg_rn"), F.col("doc_id").alias(
        "negative_id"
    ))
    return cand.join(b, "neg_rn").select(
        "anchor_id", F.col("j").cast("int").alias("neg_no"), "negative_id"
    )


# ---------------------------------------------------------------------------
# curriculum_interleave — difficulty-ordered, source-interleaved layout
# ---------------------------------------------------------------------------

_CURR_BUCKETS = 4

_CURR_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source, n_chars,
         ntile({_CURR_BUCKETS}) OVER (ORDER BY n_chars, doc_id)
           AS difficulty_bucket
  FROM documents
),
ranked AS (
  SELECT doc_id, source, difficulty_bucket,
         row_number() OVER (PARTITION BY difficulty_bucket
                            ORDER BY ((doc_id % 4294967296) * {_MMH2}
                                      % 4294967296), doc_id)
           AS pos_in_bucket
  FROM scored
)
SELECT doc_id, source, CAST(difficulty_bucket AS INTEGER)
         AS difficulty_bucket,
       CAST(pos_in_bucket AS BIGINT) AS pos_in_bucket,
       CAST((pos_in_bucket - 1) * {_CURR_BUCKETS} + difficulty_bucket
            AS BIGINT) AS global_pos
FROM ranked
"""


@_register("curriculum_interleave", _CURR_ORACLE)
def q_curriculum_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum layout: documents bucketed into {_CURR_BUCKETS}
    difficulty quartiles (length as the difficulty proxy, custkey-style
    tie-break), shuffled WITHIN each bucket by the deterministic
    multiplicative hash, then interleaved round-robin across buckets
    (global_pos = (pos−1)·K + bucket) so every training window sees the
    full difficulty spectrum — easy-to-hard ordering without
    batch-level difficulty collapse. All integer arithmetic."""
    d = catalog.load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.ntile(_CURR_BUCKETS)
        .over(Window.orderBy("n_chars", "doc_id"))
        .alias("difficulty_bucket"),
    )
    h = (F.col("doc_id") % F.lit(4294967296)) * F.lit(_MMH2) % F.lit(
        4294967296
    )
    ranked = scored.select(
        "doc_id",
        "source",
        "difficulty_bucket",
        F.row_number()
        .over(
            Window.partitionBy("difficulty_bucket").orderBy(
                h.alias("h"), "doc_id"
            )
        )
        .alias("pos_in_bucket"),
    )
    return ranked.select(
        "doc_id",
        "source",
        F.col("difficulty_bucket").cast("int").alias("difficulty_bucket"),
        F.col("pos_in_bucket").cast("long").alias("pos_in_bucket"),
        (
            (F.col("pos_in_bucket") - 1) * _CURR_BUCKETS
            + F.col("difficulty_bucket")
        )
        .cast("long")
        .alias("global_pos"),
    )
