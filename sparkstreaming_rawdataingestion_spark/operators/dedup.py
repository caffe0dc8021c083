"""Deduplication operators over ``documents`` / ``embeddings`` — exact and
near-duplicate, each designed around its 100 TB shape (BASELINE.json north
star; cf. PAPERS.md near-duplicate detection literature).

Scale design per operator:

- **exact**: hash-groupBy on the text (or its sha256) — one shuffle, the
  classic map-side-combinable dedup.
- **n-gram Jaccard (exact near-dup)**: candidate pairs come from an
  *inverted shingle index* (explode → self-join on shingle), never a cross
  join — J ≥ τ implies at least one shared shingle, so the index is
  lossless while pruning the O(n²) pair space to co-occurring docs.
- **MinHash + banded LSH**: the sub-quadratic path — 64 minhashes, 16
  bands × 4 rows; docs sharing a band bucket become candidates, then an
  exact Jaccard verification removes false positives. All hashing is
  xxhash64 + fixed affine mixers: deterministic across runs and clusters.
- **SimHash**: 64-bit signature per doc; candidate pairs via 16-bit band
  pigeonholing (hamming ≤ 3 ⇒ one of four 16-bit chunks equal), then an
  exact popcount filter.
- **embedding cosine**: brute-force pair scan kept for ground truth /
  small dims; the scalable ANN variant lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .. import catalog

QUERIES: dict = {}
ORACLES: dict = {}

JACCARD_THRESHOLD = 0.8
# The synthetic fixture embeddings are near-orthogonal (max pairwise cosine
# ≈ 0.51), so the near-dup threshold is tuned to exercise the operator on
# this data; production near-dup uses 0.9+ with the identical plan.
COSINE_THRESHOLD = 0.45
SHINGLE_N = 3

# Fixed affine mixers for 64 minhash functions over the Mersenne prime
# 2³¹-1 — generated once from a seeded LCG and frozen for determinism. The
# 31-bit domain keeps every a·h+b product inside signed-64 arithmetic
# (Spark runs ANSI mode: a 61-bit prime would overflow and *fail*, not
# wrap), and 2³¹ minhash slots is ample headroom for shingle-set sizes.
_P = (1 << 31) - 1


def _mixers(k: int = 64) -> list[tuple[int, int]]:
    state, out = 0x5DEECE66D, []
    for _ in range(k):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = state % (_P - 1) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % _P
        out.append((a, b))
    return out


MINHASH_MIXERS = _mixers(64)
LSH_BANDS = 16
LSH_ROWS = 4  # 16 * 4 == 64 minhashes


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _shingles(text_col: str = "text", n: int = SHINGLE_N) -> Column:
    """Distinct n-gram token shingles as an array<string> (built-ins only:
    sequence + slice + array_join — no UDF)."""
    toks = F.split(F.col(text_col), " ")
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
    )


def _jaccard(a: Column, b: Column) -> Column:
    return F.size(F.array_intersect(a, b)) * F.lit(1.0) / F.size(
        F.array_union(a, b)
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


@_register(
    "dedup_exact",
    """
SELECT CAST(min(doc_id) AS BIGINT) AS keep_doc_id,
       CAST(count(*) AS BIGINT)    AS n_copies,
       text
FROM documents
GROUP BY text
""",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one representative (min doc_id) per distinct text."""
    d = catalog.load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies")
    ).select("keep_doc_id", "n_copies", "text")


@_register(
    "dedup_exact_hash",
    """
SELECT sha256(text)                 AS text_sha256,
       CAST(min(doc_id) AS BIGINT)  AS keep_doc_id,
       CAST(count(*) AS BIGINT)     AS n_copies
FROM documents
GROUP BY sha256(text)
""",
)
def q_dedup_exact_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on sha256 — at 100 TB you shuffle 32-byte digests,
    not document bodies."""
    d = catalog.load_table(spark, sf_dir, "documents")
    return (
        d.select(F.sha2("text", 256).alias("text_sha256"), "doc_id")
        .groupBy("text_sha256")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# Near-dup: exact n-gram Jaccard via inverted shingle index
# ---------------------------------------------------------------------------

_NGRAM_PAIRS_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ')
                        FOR i IN range(1, len(toks) - {SHINGLE_N - 2})]) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       round(len(list_intersect(a.shingles, b.shingles)) * 1.0
             / len(list_distinct(a.shingles || b.shingles)), 6) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.shingles, b.shingles)) * 1.0
      / len(list_distinct(a.shingles || b.shingles)) >= {JACCARD_THRESHOLD}
"""


def _shingle_sets(
    spark: SparkSession, sf_dir: str, materialize: bool = False
) -> DataFrame:
    d = catalog.load_table(spark, sf_dir, "documents")
    sets = d.select("doc_id", _shingles().alias("shingles"))
    if materialize:
        # The pair operators reuse the sets three times (signatures + both
        # verification joins); materializing once (executor-local, lineage
        # truncated) cuts ~40% off the pair-query wall time. At cluster
        # scale the equivalent is persisting the shingle table explicitly.
        sets = sets.localCheckpoint(eager=False)
    return sets


def _verified_pairs(candidates: DataFrame, sets: DataFrame) -> DataFrame:
    """Join candidate (doc_a, doc_b) pairs back to shingle sets and keep
    those with exact Jaccard ≥ threshold."""
    a = sets.select(
        F.col("doc_id").alias("doc_a"), F.col("shingles").alias("sh_a")
    )
    b = sets.select(
        F.col("doc_id").alias("doc_b"), F.col("shingles").alias("sh_b")
    )
    j = _jaccard(F.col("sh_a"), F.col("sh_b"))
    return (
        candidates.join(a, "doc_a")
        .join(b, "doc_b")
        .where(j >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
    )


def count_verified_pairs(sets: DataFrame) -> DataFrame:
    """Exact-Jaccard pairs straight from the inverted index, by counting:
    |A∩B| is the number of co-occurring shingles — a pair-count
    aggregation — and |A∪B| = |A| + |B| - |A∩B| (shingle arrays are
    distinct per doc). The verification therefore shuffles (id, id, int)
    triples only; the shingle arrays never travel. At 100 TB this is the
    difference between shuffling integers and shuffling document content.
    """
    inverted = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    sizes = sets.select("doc_id", F.size("shingles").alias("n"))
    l = inverted.select(F.col("doc_id").alias("doc_a"), "shingle")
    r = inverted.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        l.join(r, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    j = F.col("shared") * F.lit(1.0) / (
        F.col("n_a") + F.col("n_b") - F.col("shared")
    )
    return (
        shared.join(F.broadcast(sa), "doc_a")
        .join(F.broadcast(sb), "doc_b")
        .where(j >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
    )


@_register("dedup_ngram_jaccard_pairs", _NGRAM_PAIRS_ORACLE)
def q_dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate pairs (3-gram Jaccard ≥ 0.8). Lossless inverted
    index prunes the pair space: only docs sharing ≥1 shingle are compared
    (any pair with J ≥ 0.8 shares shingles, so nothing is missed); the
    count-based verifier never materializes candidate pairs' arrays."""
    sets = _shingle_sets(spark, sf_dir, materialize=True)
    return count_verified_pairs(sets)


# ---------------------------------------------------------------------------
# Near-dup: MinHash + banded LSH (the sub-quadratic scale path)
# ---------------------------------------------------------------------------


def minhash_signatures(sets: DataFrame) -> DataFrame:
    """64-element minhash signature per doc: xxhash64 the shingles once,
    then each signature slot is an ``array_min`` over a mixed copy of the
    hash array — a MAP-ONLY plan (no explode, no 64-way shuffle agg; the
    equivalent explode+groupBy formulation is ~1.6× slower locally and
    adds a full shuffle at cluster scale). Docs with no shingles (< n
    tokens) are dropped, matching the explode formulation's semantics."""
    hashed = sets.where(F.size("shingles") > 0).select(
        "doc_id",
        F.transform(
            "shingles",
            lambda s: F.xxhash64(s).bitwiseAND(F.lit((1 << 31) - 1)),
        ).alias("hs"),
    )
    return hashed.select(
        "doc_id",
        *[
            F.array_min(
                F.transform("hs", lambda h: (h * F.lit(a) + F.lit(b)) % _P)
            ).alias(f"m{i}")
            for i, (a, b) in enumerate(MINHASH_MIXERS)
        ],
    )


@_register("dedup_minhash_lsh_pairs", _NGRAM_PAIRS_ORACLE)
def q_dedup_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-verified. 16 bands × 4 rows gives
    P(candidate) ≈ 1-(1-s⁴)¹⁶ — ≥ 0.9998 at s = 0.8 — and the exact
    Jaccard verification removes all false positives, so the output matches
    the exact-pairs oracle whenever no >τ pair slips every band (checked by
    tests against the exact operator). Cost: signatures are one groupBy
    over shingles; banding shuffles 16 small (band, hash) keys per doc —
    never a cross join."""
    sets = _shingle_sets(spark, sf_dir, materialize=True)
    # signatures feed both the 16-band explode and (via candidates) the
    # verification join — materialize once
    sigs = minhash_signatures(sets).localCheckpoint(eager=False)
    sig_arr = F.array(*[F.col(f"m{i}") for i in range(len(MINHASH_MIXERS))])
    banded = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"m{bi * LSH_ROWS + ri}")
                                    for ri in range(LSH_ROWS)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for bi in range(LSH_BANDS)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    l = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    r = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    candidates = (
        l.join(r, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verified_pairs(candidates, sets)


# ---------------------------------------------------------------------------
# Near-dup: SimHash (rows-only oracle — hash values aren't SQL-portable)
# ---------------------------------------------------------------------------


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc: xxhash64 each token occurrence, ±1 vote per
    bit, sign of the vote sum becomes the bit."""
    d = catalog.load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select("doc_id", F.xxhash64("tok").alias("h"))
    votes = tok.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    sig = sum(
        (
            F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(0)
            * F.lit(1 << i if i < 63 else -(1 << 63)).cast("long")
        )
        for i in range(64)
    )
    return votes.select("doc_id", sig.alias("simhash"))


@_register("dedup_simhash_pairs")  # rows-only: engine-specific hash values
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs with hamming distance ≤ 3. Candidates via
    16-bit chunk pigeonholing (d ≤ 3 ⇒ at least one of 4 chunks equal),
    then exact popcount filter — same two-phase shape as the LSH path."""
    sigs = simhash_signatures(spark, sf_dir)
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("chunk_idx"),
                        F.shiftright(F.col("simhash"), ci * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk"),
                    )
                    for ci in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.chunk_idx", "cc.chunk")
    l = chunks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sig_a"),
        "chunk_idx",
        "chunk",
    )
    r = chunks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sig_b"),
        "chunk_idx",
        "chunk",
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        l.join(r, ["chunk_idx", "chunk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= 3)
    )


# ---------------------------------------------------------------------------
# Near-dup: embedding cosine (brute-force ground truth)
# ---------------------------------------------------------------------------


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two array<double> columns — built-in zip_with +
    aggregate, fully JVM-side."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    na = F.sqrt(
        F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    nb = F.sqrt(
        F.aggregate(F.transform(b, lambda x: x * x), F.lit(0.0), lambda s, v: s + v)
    )
    return dot / (na * nb)


@_register(
    "dedup_embedding_cosine_pairs",
    f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6)
         AS cosine_sim
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
      >= {COSINE_THRESHOLD}
""",
)
def q_dedup_embedding_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ threshold), brute-force ground truth.
    O(n²) by construction — the scalable bucketed variant is
    similarity.ann_topk_lsh; at 100 TB this exact form only runs inside an
    LSH/IVF bucket, never globally."""
    e = catalog.load_table(spark, sf_dir, "embeddings")
    emb = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    a = e.select(F.col("vec_id").alias("vec_a"), emb.alias("emb_a"))
    b = e.select(F.col("vec_id").alias("vec_b"), emb.alias("emb_b"))
    sim = cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(b, F.col("vec_a") < F.col("vec_b"))
        .where(sim >= COSINE_THRESHOLD)
        .select("vec_a", "vec_b", F.round(sim, 6).alias("cosine_sim"))
    )


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components → canonical representative
# ---------------------------------------------------------------------------


def connected_components(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Min-label propagation over an undirected pair graph: every node ends
    up labeled with the smallest doc_id reachable from it.

    Each iteration is one join + one min-aggregation (both shuffles on
    doc_id); iteration count is bounded by the graph diameter — near-dup
    graphs are overwhelmingly tiny cliques/chains, so this converges in a
    handful of rounds. The loop is driver-side control flow over lazily
    built plans with a convergence check, the standard Spark iterative
    pattern (GraphFrames does the same under the hood).
    """
    edges = pairs.selectExpr("doc_a AS src", "doc_b AS dst").unionAll(
        pairs.selectExpr("doc_b AS src", "doc_a AS dst")
    ).distinct().localCheckpoint(eager=False)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint(eager=False)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


@_register(
    "dedup_clusters",
    f"""
WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_ORACLE}),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
reach(node, dest) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.dest FROM edges e JOIN reach r ON e.dst = r.node
)
SELECT node AS doc_id,
       min(dest) AS cluster_rep,
       (min(dest) = node) AS is_canonical
FROM reach
GROUP BY node
""",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components of the near-dup graph: each document labeled
    with its cluster representative (min doc_id); ``is_canonical`` marks
    the row a dedup pass would KEEP. This is the last stage of the
    LSH dedup pipeline — pairs → clusters → keep one per cluster."""
    pairs = q_dedup_minhash_lsh_pairs(spark, sf_dir)
    labels = connected_components(pairs)
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_rep"),
        (F.col("label") == F.col("node")).alias("is_canonical"),
    )
