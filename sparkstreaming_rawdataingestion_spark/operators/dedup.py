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

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from .. import catalog
from ..session import spread_small_scan, stage

QUERIES: dict = {}
ORACLES: dict = {}

JACCARD_THRESHOLD = 0.8
# Document-frequency cap on shingles entering the inverted-index self-join.
# A shingle shared by k docs yields k(k-1)/2 candidate rows, so one common
# 3-gram ("of the X") skew-explodes the shuffle at scale; capping df bounds
# the worst shingle's fan-out at max_df². Soundness bound: a J ≥ τ pair is
# missed only if EVERY shingle it shares has df > max_df — i.e. the pair
# sits inside a >max_df-sized template cluster, where pair enumeration is
# itself quadratic and the clustering path (dedup_clusters via LSH) is the
# right tool. Verification always counts |A∩B| against the FULL index, so
# every reported Jaccard stays exact. No-op at fixture scale (df ≪ 1000).
SHINGLE_MAX_DF = 1000
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
    from ..functions import seq1

    toks = F.split(F.col(text_col), " ")
    # seq1, NOT sequence(1, greatest(..., 0)): Spark's sequence(1, 0) is
    # the descending [1, 0] and slice(toks, 0, n) crashes — a sub-n-token
    # doc must yield the EMPTY shingle set (as the DuckDB oracles do)
    idx = seq1(F.size(toks) - (n - 1))
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

# Inverted-index formulation — the same algebra as the engine (|A∩B| by
# counting shared shingles, |A∪B| = |A|+|B|−|A∩B|), so DuckDB runs an
# equi-join + count instead of the O(n²) all-pairs list_intersect scan
# (the naive form was the gate's slowest oracle and impractical at sf0.1).
_NGRAM_PAIRS_ORACLE = f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ')
                        FOR i IN range(1, len(toks) - {SHINGLE_N - 2})]) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS shared
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(shared * 1.0 / (sa.n + sb.n - shared), 6) AS jaccard
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared * 1.0 / (sa.n + sb.n - shared) >= {JACCARD_THRESHOLD}
"""


def _shingle_sets(
    spark: SparkSession, sf_dir: str, materialize: bool = False
) -> DataFrame:
    d = catalog.load_table(spark, sf_dir, "documents")
    # round 14: the documents file scans as ONE partition locally, which
    # would serialize the shingle transform (the heavy map of every pair
    # query) onto one core — spread first (no-op at scale, session.py)
    sets = spread_small_scan(d).select("doc_id", _shingles().alias("shingles"))
    if materialize:
        # The pair operators reuse the sets three times (signatures + both
        # verification joins); persisting once cuts ~40% off the pair-query
        # wall time, and unlike localCheckpoint it survives executor loss
        # (lost partitions recompute from lineage).
        #
        # Sub-n-token docs have EMPTY shingle sets (seq1): they can never
        # verify against anything, and keeping them would let blocking-only
        # candidate pairs reach the Jaccard/containment ratios with union 0
        # (DIVIDE_BY_ZERO under ANSI). The DuckDB oracles generate no pairs
        # for them either — drop at the source, but only AFTER staging:
        # a filter placed before persist gets pushed beneath the
        # projection by Catalyst (alias substitution), evaluating the
        # whole shingle transform twice per row — measured 1.9× on
        # dedup_containment_pairs at sf0.1. Filtering the cached relation
        # costs one size() over an in-memory array instead.
        #
        # The non-materialized path (hot_shingle_report) explodes the
        # arrays — empties vanish on explode, no ratio is formed, so it
        # needs no filter and keeps its single-pass projection.
        return stage(sets).where(F.size("shingles") > 0)
    return sets


def _pair_shared_counts(candidates: DataFrame, inverted: DataFrame) -> DataFrame:
    """|A∩B| per candidate (doc_a, doc_b) pair, by counting co-occurring
    shingles of the candidate docs — the shuffle payload is (id, shingle)
    rows and (id, id, int) triples; shingle ARRAYS never travel.

    Round-14 optimization (guide §2.4): the former per-leg semi-join
    prunes (inverted ⋉ candidate ids, then the inner join) re-evaluated
    the whole CANDIDATE subplan twice more — the LSH banded join +
    distinct ran three times per query (plans/r14/
    dedup_minhash_lsh_pairs_before.txt operators 1-23, 29-48, 62-81;
    exchange reuse did not deduplicate them). The inner joins prune the
    index to candidate docs by themselves, over the same exchanges the
    semi-joins already paid (inverted moves once per leg either way, by
    doc key then by (doc, shingle)), so the prunes bought nothing and
    cost two extra candidate builds plus two id-distinct aggregations.
    Candidates are now consumed exactly once. Interleaved A/B at sf0.1:
    minhash 7.19 s → 6.26 s median (the signature pass, not the verify,
    dominates the remainder); outputs identical (oracle-verified)."""
    ia = inverted.select(F.col("doc_id").alias("doc_a"), "shingle")
    ib = inverted.select(F.col("doc_id").alias("doc_b"), "shingle")
    return (
        candidates.join(ia, "doc_a")
        .join(ib, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )


def _jaccard_from_counts(shared: DataFrame, sets: DataFrame) -> DataFrame:
    """(doc_a, doc_b, shared) → exact Jaccard via |A∪B| = |A|+|B|-|A∩B|
    (shingle arrays are distinct per doc). No broadcast hint: the sizes
    table is one row per doc — AQE broadcasts it while it fits and falls
    back to a shuffled join at scale, where a forced broadcast would OOM."""
    sizes = sets.select("doc_id", F.size("shingles").alias("n"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    # try_divide: duplicate doc_ids in a malformed corpus can inflate
    # |A∩B| past the union — emit NULL (filtered) instead of dying
    j = F.try_divide(
        F.col("shared") * F.lit(1.0),
        F.col("n_a") + F.col("n_b") - F.col("shared"),
    )
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(j >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(j, 6).alias("jaccard"))
    )


def verify_candidates(candidates: DataFrame, sets: DataFrame) -> DataFrame:
    """Exact-Jaccard verification of candidate pairs, count-based: the
    candidates (from LSH banding or the capped index) are joined to the
    full inverted index for exact |A∩B|, so no true pair among the
    candidates is mis-scored and no false positive survives."""
    inverted = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    return _jaccard_from_counts(_pair_shared_counts(candidates, inverted), sets)


def count_verified_pairs(
    sets: DataFrame, max_df: int | None = SHINGLE_MAX_DF
) -> DataFrame:
    """Exact-Jaccard pairs from the inverted shingle index, by counting.

    Candidate generation self-joins the index on shingle, with shingles of
    document frequency > ``max_df`` excluded to bound the per-shingle k²
    fan-out (see SHINGLE_MAX_DF for the soundness argument; pass
    ``max_df=None`` for the fully lossless join). Hot shingles still
    contribute to |A∩B| via a patch join against the discovered pairs
    only, so reported Jaccards are exact either way; when nothing is hot
    the plan degenerates to the lossless single-phase count plus one df
    aggregation.
    """
    inverted = sets.select("doc_id", F.explode("shingles").alias("shingle"))

    def single_phase(idx: DataFrame) -> DataFrame:
        l = idx.select(F.col("doc_id").alias("doc_a"), "shingle")
        r = idx.select(F.col("doc_id").alias("doc_b"), "shingle")
        return (
            l.join(r, "shingle")
            .where(F.col("doc_a") < F.col("doc_b"))
            .groupBy("doc_a", "doc_b")
            .agg(F.count("*").alias("shared"))
        )

    if max_df is None:
        return _jaccard_from_counts(single_phase(inverted), sets)

    # Rare/hot decomposition: the self-join + pair count runs only over
    # shingles with df <= max_df (the skew-bounded plan, identical to the
    # lossless one when nothing is hot); the few hot shingles contribute
    # |A∩B ∩ hot| via a join against just the discovered pairs, keeping
    # every reported Jaccard exact. df comes from an unordered window
    # count partitioned on shingle — the same hash partitioning the
    # self-join needs, so the split costs no extra exchange.
    # STAGED (round 14): the df-annotated index feeds FOUR legs (both
    # self-join sides + both hot-patch sides) — unstaged, the explode +
    # shingle-window subtree re-evaluated per leg (the exchange was
    # reused, the window pass was not). Interleaved A/B at sf0.1:
    # training build 5.2 s → 4.0 s med. At 100 TB this materializes the
    # posting list once (DISK_ONLY under SPARK_GRAFT_SCALE_MODE=disk —
    # the standard inverted-index build) and release_staged frees it at
    # the next query.
    windowed = stage(
        inverted.withColumn(
            "df", F.count("*").over(Window.partitionBy("shingle"))
        )
    )
    rare_idx = windowed.where(F.col("df") <= max_df).drop("df")
    # not staged: its two consumers (hot-patch join + final merge) share
    # the self-join's shuffle via ReusedExchange
    shared_rare = single_phase(rare_idx)
    hot_idx = windowed.where(F.col("df") > max_df).drop("df")
    ha = hot_idx.select(F.col("doc_id").alias("doc_a"), "shingle")
    hb = hot_idx.select(F.col("doc_id").alias("doc_b"), "shingle")
    hot_shared = (
        shared_rare.select("doc_a", "doc_b")
        .join(ha, "doc_a")
        .join(hb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("hot_n"))
    )
    shared = (
        shared_rare.join(hot_shared, ["doc_a", "doc_b"], "left")
        .select(
            "doc_a",
            "doc_b",
            (F.col("shared") + F.coalesce(F.col("hot_n"), F.lit(0))).alias(
                "shared"
            ),
        )
    )
    return _jaccard_from_counts(shared, sets)


def index_candidates(
    sets: DataFrame, max_df: int | None = SHINGLE_MAX_DF
) -> DataFrame:
    """Distinct (doc_a, doc_b) candidate pairs sharing ≥1 shingle of
    document frequency ≤ ``max_df``. The df count rides the same shingle
    hash-partitioning as the self-join (window count, filter, join — one
    exchange)."""
    inverted = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    if max_df is not None:
        inverted = (
            inverted.withColumn(
                "df", F.count("*").over(Window.partitionBy("shingle"))
            )
            .where(F.col("df") <= max_df)
            .drop("df")
        )
    l = inverted.select(F.col("doc_id").alias("doc_a"), "shingle")
    r = inverted.select(F.col("doc_id").alias("doc_b"), "shingle")
    return (
        l.join(r, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


@_register("dedup_ngram_jaccard_pairs", _NGRAM_PAIRS_ORACLE)
def q_dedup_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-duplicate pairs (3-gram Jaccard ≥ 0.8). The inverted
    shingle index prunes the pair space — only docs sharing ≥1 shingle
    are compared — and the count-based verifier scores every candidate
    against the full index, never materializing shingle arrays per pair.

    Runs LOSSLESS (``max_df=None``) so the operator matches its exact
    oracle at any corpus size; the skew-bounded variant (df-capped index,
    ``SHINGLE_MAX_DF``) is the scale default for the curation pipeline,
    and ``hot_shingle_report`` quantifies exactly what a given cap would
    exclude before anyone turns it on.

    VERIFICATION CORPORA ONLY: with ``max_df=None`` the candidate join is
    quadratic inside any template cluster larger than the cap — never
    point this parity form at an uncapped production corpus; production
    entry points (pipeline.py, curation_stream) keep ``SHINGLE_MAX_DF``."""
    sets = _shingle_sets(spark, sf_dir, materialize=True)
    return count_verified_pairs(sets, max_df=None)


@_register(
    "dedup_hot_shingle_report",
    f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ')
                        FOR i IN range(1, len(toks) - {SHINGLE_N - 2})]) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
dfreq AS (
  SELECT shingle, CAST(count(*) AS BIGINT) AS df
  FROM (SELECT doc_id, unnest(shingles) AS shingle FROM sh)
  GROUP BY shingle
)
SELECT CAST(2 AS BIGINT)                                   AS max_df,
       CAST(count(*) AS BIGINT)                            AS n_shingles,
       CAST(count(*) FILTER (WHERE df > 2) AS BIGINT)      AS n_hot_shingles,
       CAST(COALESCE(sum(df) FILTER (WHERE df > 2), 0) AS BIGINT)
                                                           AS hot_postings,
       CAST(max(df) AS BIGINT)                             AS max_doc_freq
FROM dfreq
""",
)
def q_dedup_hot_shingle_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Observability for the df-capped near-dup index: how many shingles a
    given ``max_df`` cap would exclude from candidate generation, and how
    many index postings they carry. Run this before enabling the cap on a
    new corpus — nonzero ``n_hot_shingles`` means pairs whose EVERY shared
    shingle is hot would be missed (the SHINGLE_MAX_DF soundness bound).
    One explode + one agg; the report itself is a single reduce at any
    scale. Fixture threshold 2 keeps the report non-trivial at sf0.01."""
    return hot_shingle_report(
        _shingle_sets(spark, sf_dir, materialize=False), max_df=2
    )


CONTAINMENT_THRESHOLD = 0.85


@_register(
    "dedup_containment_pairs",
    f"""
WITH sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ')
                        FOR i IN range(1, len(toks) - {SHINGLE_N - 2})]) AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
sizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
inv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
shared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(count(*) AS BIGINT) AS shared
  FROM inv a JOIN inv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(shared * 1.0 / least(sa.n, sb.n), 6) AS containment
FROM shared
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared * 1.0 / least(sa.n, sb.n) >= {CONTAINMENT_THRESHOLD}
""",
)
def q_dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment near-dup pairs: |A∩B| / min(|A|,|B|) ≥ 0.85 — the
    asymmetric overlap measure that catches a document NESTED inside a
    larger one (boilerplate-wrapped copies, quote-expanded posts), which
    symmetric Jaccard dilutes below threshold as the host grows. Same
    inverted-index + count-based kernel as the Jaccard path (the shuffle
    carries (id, id, int) triples); only the normalization differs, so
    the operator inherits the identical 100 TB shape — including the
    hot-shingle caveat: at scale, bound the self-join with the same
    df-cap candidate generation (SHINGLE_MAX_DF / index_candidates) and
    audit the cap with hot_shingle_report first. NB containment pairs
    within a >max_df template cluster need the clustering path, exactly
    as for Jaccard."""
    sets = _shingle_sets(spark, sf_dir, materialize=True)
    inverted = sets.select("doc_id", F.explode("shingles").alias("shingle"))
    l = inverted.select(F.col("doc_id").alias("doc_a"), "shingle")
    r = inverted.select(F.col("doc_id").alias("doc_b"), "shingle")
    shared = (
        l.join(r, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    sizes = sets.select("doc_id", F.size("shingles").alias("n"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    c = F.try_divide(
        F.col("shared") * F.lit(1.0), F.least(F.col("n_a"), F.col("n_b"))
    )
    return (
        shared.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(c >= CONTAINMENT_THRESHOLD)
        .select("doc_a", "doc_b", F.round(c, 6).alias("containment"))
    )


def hot_shingle_report(sets: DataFrame, max_df: int = SHINGLE_MAX_DF) -> DataFrame:
    """One-row df-distribution summary of the inverted shingle index
    relative to a candidate-generation cap (see q_dedup_hot_shingle_report)."""
    inverted = sets.select(F.explode("shingles").alias("shingle"))
    dfreq = inverted.groupBy("shingle").agg(F.count("*").alias("df"))
    hot = F.col("df") > max_df
    return dfreq.agg(
        F.lit(max_df).cast("long").alias("max_df"),
        F.count("*").alias("n_shingles"),
        F.count_if(hot).alias("n_hot_shingles"),
        F.coalesce(F.sum(F.when(hot, F.col("df"))), F.lit(0)).alias(
            "hot_postings"
        ),
        F.max("df").alias("max_doc_freq"),
    )


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
    # round 14: the 64 mixed-copy array_min columns are SQL strings
    # parsed JVM-side — the Column-algebra loop cost ~4 s of py4j plan
    # construction per invocation (the bench times plan build); the
    # parsed expressions are identical ({a}L/{b}L literals == F.lit
    # longs, % == pmod-free modulo in both forms).
    return hashed.select(
        "doc_id",
        *[
            F.expr(
                f"array_min(transform(hs, h -> (h * {a}L + {b}L) % {_P}L))"
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
    tests against the exact operator). Cost: signatures are a map-only
    pass; banding shuffles 16 small (band, hash) keys per doc — never a
    cross join — and verification counts shared shingles per candidate
    (verify_candidates), so the post-LSH shuffle carries (id, id, int)
    triples, not shingle arrays."""
    sets = _shingle_sets(spark, sf_dir, materialize=True)
    sigs = minhash_signatures(sets)
    # band structs as one JVM-parsed expression (round 14 — same py4j
    # plan-construction cut as minhash_signatures; identical SQL
    # functions: named_struct == F.struct, xxhash64/concat_ws match)
    band_structs = ",".join(
        "named_struct('band', {bi}, 'bucket', xxhash64(concat_ws(',', {cols})))".format(
            bi=bi,
            cols=",".join(
                f"m{bi * LSH_ROWS + ri}" for ri in range(LSH_ROWS)
            ),
        )
        for bi in range(LSH_BANDS)
    )
    banded = sigs.select(
        "doc_id",
        F.explode(F.expr(f"array({band_structs})")).alias("bb"),
    ).select("doc_id", "bb.band", "bb.bucket")
    l = banded.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    r = banded.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    # NOT staged although verification consumes it three times: the three
    # consumers share one shuffle via ReusedExchange (candidate staging
    # measured ~20% SLOWER end-to-end by serializing the cache write);
    # plan reuse is the cheaper dedup mechanism here.
    candidates = (
        l.join(r, ["band", "bucket"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )
    return verify_candidates(candidates, sets)


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
    # Round 15 (guide §4, py4j boundary): the 64 per-bit vote aggregates
    # and the 64-term signature sum are JVM-parsed SQL strings — one
    # round trip per expression instead of ~10 Column calls per bit
    # (~4 s of pure plan construction measured in the r15 sweep). The
    # parsed trees evaluate identically: CASE WHEN ≡ F.when/otherwise,
    # (h >> i) & 1 ≡ shiftright/bitwiseAND, and shiftleft(1L, i) yields
    # the same 2^i weights including the i=63 sign-bit value
    # −2^63 ≡ the old -(1 << 63) literal.
    votes = tok.groupBy("doc_id").agg(
        *[
            F.expr(
                f"sum(CASE WHEN (shiftright(h, {i}) & 1) = 1"
                f" THEN 1 ELSE -1 END) AS v{i}"
            )
            for i in range(64)
        ]
    )
    sig = F.expr(
        " + ".join(
            f"((CASE WHEN v{i} > 0 THEN CAST(1 AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
            f" * shiftleft(CAST(1 AS BIGINT), {i}))"
            for i in range(64)
        )
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
# Portable SimHash — the oracle-backed twin of dedup_simhash_pairs.
#
# The production variant above uses xxhash64 (fast, JVM-side) whose values
# no other engine reproduces, so it is rows-only at the driver gate. This
# twin swaps in the repo's cross-engine token hash (the polynomial
# rolling hash from text_fingerprint, mod 1e9+7) plus two multiplicative
# 32-bit mixing rounds — every operation is exact BIGINT arithmetic that
# DuckDB evaluates identically, so the full near-dup pair set
# hash-matches an ANSI-SQL oracle. Same plan shape as the fast variant:
# map-side signatures, 8-bit chunk pigeonholing (d ≤ 3 ⇒ one of 4 chunks
# equal), exact popcount verify.
# ---------------------------------------------------------------------------

SIMHASH_PORTABLE_BITS = 32
SIMHASH_PORTABLE_HAMMING = 3

_MIX1 = 2654435761  # Knuth multiplicative (2^32 golden ratio)
_MIX2 = 1540483477  # MurmurHash2 multiplier
_M32 = 4294967296

# per-bit extraction: bits 0-15 from m1's high half, 16-31 from m2's
_PORTABLE_BIT_SQL = [
    f"((m1 >> {16 + i}) & 1)" if i < 16 else f"((m2 >> {i}) & 1)"
    for i in range(SIMHASH_PORTABLE_BITS)
]

_SIMHASH_PORTABLE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
),
h AS (
  SELECT doc_id,
         list_reduce([0::BIGINT] ||
                     [ascii(c)::BIGINT % 256 FOR c IN string_split(tok, '')],
                     (acc, x) -> (acc * 31 + x) % 1000000007) AS h0
  FROM tok
),
mixed AS (
  SELECT doc_id,
         (h0 * {_MIX1}) % {_M32} AS m1,
         (((h0 * {_MIX1}) % {_M32}) * {_MIX2}) % {_M32} AS m2
  FROM h
),
votes AS (
  SELECT doc_id,
         {", ".join(f"sum(2 * {b} - 1) AS v{i}"
                    for i, b in enumerate(_PORTABLE_BIT_SQL))}
  FROM mixed GROUP BY doc_id
),
sig AS (
  SELECT doc_id,
         ({" + ".join(f"(CASE WHEN v{i} > 0 THEN {1 << i}::BIGINT"
                      f" ELSE 0 END)"
                      for i in range(SIMHASH_PORTABLE_BITS))}) AS simhash
  FROM votes
),
chunks AS (
  SELECT doc_id, simhash, ci, (simhash >> (ci * 8)) & 255 AS chunk
  FROM sig, unnest([0, 1, 2, 3]) AS u(ci)
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM chunks a JOIN chunks b ON a.ci = b.ci AND a.chunk = b.chunk
                           AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {SIMHASH_PORTABLE_HAMMING}
"""


def simhash_portable_signatures(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """32-bit portable SimHash per doc — cross-engine-exact arithmetic
    (docstring of the section above)."""
    d = catalog.load_table(spark, sf_dir, "documents")
    h0 = F.aggregate(
        F.split(F.col("tok"), ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c) % 256) % 1000000007,
    )
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("tok")
    ).select("doc_id", h0.alias("h0"))
    m1 = (F.col("h0") * _MIX1) % _M32
    mixed = tok.select(
        "doc_id", m1.alias("m1"), ((m1 * _MIX2) % _M32).alias("m2")
    )
    # Round 15 (guide §4): votes and signature as JVM-parsed SQL strings
    # (one py4j round trip per expression; same trees — shiftright/&/
    # CASE — as the former Column builds, so the oracle hash-match
    # holds; re-verified). Bit source matches _PORTABLE_BIT_SQL: bits
    # 0-15 from m1's high half, 16-31 from m2.
    bits = [
        f"(shiftright(m1, {16 + i}) & 1)"
        if i < 16
        else f"(shiftright(m2, {i}) & 1)"
        for i in range(SIMHASH_PORTABLE_BITS)
    ]
    votes = mixed.groupBy("doc_id").agg(
        *[
            F.expr(f"sum(2 * {b} - 1) AS v{i}")
            for i, b in enumerate(bits)
        ]
    )
    sig = F.expr(
        " + ".join(
            f"(CASE WHEN v{i} > 0 THEN CAST({1 << i} AS BIGINT)"
            f" ELSE CAST(0 AS BIGINT) END)"
            for i in range(SIMHASH_PORTABLE_BITS)
        )
    )
    return votes.select("doc_id", sig.alias("simhash"))


@_register("dedup_simhash_portable_pairs", _SIMHASH_PORTABLE_ORACLE)
def q_dedup_simhash_portable_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Portable SimHash near-dup pairs (hamming ≤ 3 over 32 bits) —
    the ORACLE-BACKED twin of ``dedup_simhash_pairs``: identical
    two-phase plan (8-bit chunk pigeonhole candidates → exact popcount
    verify), but with cross-engine-exact hashing so every pair
    hash-matches the DuckDB oracle. The xxhash64 variant remains the
    production path (JVM hash, no per-char fold); this one is the
    verification kernel that proves the algorithm, not just the row
    count."""
    sigs = stage(simhash_portable_signatures(spark, sf_dir))
    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("ci"),
                        F.shiftright(F.col("simhash"), ci * 8)
                        .bitwiseAND(F.lit(255))
                        .alias("chunk"),
                    )
                    for ci in range(4)
                ]
            )
        ).alias("cc"),
    ).select("doc_id", "simhash", "cc.ci", "cc.chunk")
    l = chunks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("simhash").alias("sig_a"),
        "ci",
        "chunk",
    )
    r = chunks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("simhash").alias("sig_b"),
        "ci",
        "chunk",
    )
    hamming = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        l.join(r, ["ci", "chunk"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", hamming.alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= SIMHASH_PORTABLE_HAMMING)
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
    # try_divide: a zero vector has norm 0 — cosine undefined → NULL
    # (threshold filters and DESC rankings both drop NULLs)
    return F.try_divide(dot, na * nb)


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
# Semantic dedup (SemDeDup, Abbas et al. 2023): k-means clusters bound the
# cosine pair join exactly the way source-blocking bounds the TF-IDF pairs
# ---------------------------------------------------------------------------

SEMDEDUP_K = 8  # cluster count; scales with the corpus (see docstring)
SEMDEDUP_THRESHOLD = COSINE_THRESHOLD  # within-cluster near-dup bar

_SEMDEDUP_ORACLE = f"""
WITH c AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
  FROM embeddings WHERE vec_id < {SEMDEDUP_K}
),
v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings),
d AS (
  -- |v-c|^2 via three ordered inner products (term-for-term the engine's
  -- kmeans_assign expression)
  SELECT v.vec_id, c.cid, ve,
         list_inner_product(ve, ve) + list_inner_product(ce, ce)
           - 2 * list_inner_product(ve, ce) AS d2
  FROM v, c
),
assigned AS (
  SELECT vec_id, cid, ve,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY round(d2, 9), cid) AS rk
  FROM d
)
SELECT a.cid AS cluster_id, a.vec_id AS vec_a, b.vec_id AS vec_b,
       round(list_cosine_similarity(a.ve, b.ve), 6) AS cosine_sim
FROM (SELECT * FROM assigned WHERE rk = 1) a
JOIN (SELECT * FROM assigned WHERE rk = 1) b
  ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.ve, b.ve) >= {SEMDEDUP_THRESHOLD}
"""


@_register("dedup_semantic_clusters", _SEMDEDUP_ORACLE)
def q_dedup_semantic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023): assign every
    embedding to its nearest deterministic k-means centroid
    (similarity.kmeans_assign — the Lloyd-step kernel), then emit
    near-dup pairs by exact cosine WITHIN each cluster only. The cluster
    id bounds the pair join exactly the way source-blocking bounds
    tfidf_cosine_pairs: candidates are (n/K)² per cluster, never n²
    globally, and a "keep lowest vec_id per pair" policy downstream
    (dedup_cluster_canonical composes directly) prunes the corpus.

    Scale shape: centroids broadcast (K-row model table), assignment is
    map-side; the pair join is an equi-join keyed on cluster_id. K
    scales with the corpus (SemDeDup runs 10k-100k clusters at web
    scale), so per-cluster pair work is bounded by the cluster size the
    operator is CONFIGURED for — the knob is explicit, not emergent.
    Cosines are exact (the dedup_embedding_cosine_pairs kernel), so the
    only approximation vs the brute-force ground truth is the documented
    SemDeDup one: cross-cluster near-dups are out of scope by design."""
    return semantic_cluster_pairs(
        catalog.load_table(spark, sf_dir, "embeddings")
    )


def semantic_cluster_pairs(
    e: DataFrame,
    k: int = SEMDEDUP_K,
    threshold: float = SEMDEDUP_THRESHOLD,
    restrict_to: DataFrame | None = None,
) -> DataFrame:
    """The parameterized kernel behind ``dedup_semantic_clusters`` —
    ``e`` is an embeddings table (vec_id, embedding); centroids are the
    deterministic vec_id < k seeds. ``restrict_to`` (a one-column
    ``vec_id`` frame) limits the ASSIGNED vector set — the pipeline's
    survivor-restricted semantic stage — while the centroid seeds stay
    the full-table model parameters, so restricting never moves the
    cluster geometry."""
    from .similarity import _emb_double, kmeans_assign

    cents = e.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), _emb_double().alias("ce")
    )
    vecs = e.select("vec_id", _emb_double().alias("ve"))
    if restrict_to is not None:
        vecs = vecs.join(restrict_to, "vec_id", "left_semi")
    # staged: consumed by both sides of the pair self-join — without it
    # the crossJoin+window assignment subtree would execute twice
    assigned = stage(kmeans_assign(vecs, cents).select("vec_id", "cid", "ve"))
    a = assigned.select(
        F.col("cid").alias("cluster_id"),
        F.col("vec_id").alias("vec_a"),
        F.col("ve").alias("emb_a"),
    )
    b = assigned.select(
        F.col("cid").alias("cluster_id"),
        F.col("vec_id").alias("vec_b"),
        F.col("ve").alias("emb_b"),
    )
    sim = cosine(F.col("emb_a"), F.col("emb_b"))
    return (
        a.join(b, "cluster_id")
        .where(F.col("vec_a") < F.col("vec_b"))
        .where(sim >= threshold)
        .select(
            "cluster_id",
            "vec_a",
            "vec_b",
            F.round(sim, 6).alias("cosine_sim"),
        )
    )


def components_ctes(a: str = "doc_a", b: str = "doc_b") -> str:
    """Oracle-side twin of ``connected_components`` — the edges + reach
    CTE pair over a preceding ``pairs`` CTE with endpoint columns
    (``a``, ``b``). ONE closure-algebra definition for every canonical/
    cluster oracle (this module ×3, profiling ×2, multimodal ×2 —
    image + audio clusters — and pipeline ×1, the semantic build
    splice: the greedy_fold_ctes consolidation discipline): a future
    fix to the reachability algebra moves all eight oracles together."""
    return f"""edges AS (
  SELECT {a} AS src, {b} AS dst FROM pairs
  UNION
  SELECT {b}, {a} FROM pairs
),
reach(node, dest) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, r.dest FROM edges e JOIN reach r ON e.dst = r.node
)"""


# ---------------------------------------------------------------------------
# dedup_semantic_canonical — SemDeDup's prune list
# ---------------------------------------------------------------------------

_SEM_CANONICAL_ORACLE = f"""
WITH RECURSIVE pairs AS ({_SEMDEDUP_ORACLE}),
{components_ctes("vec_a", "vec_b")}
SELECT node AS vec_id,
       min(dest) AS cluster_rep,
       (min(dest) = node) AS is_canonical
FROM reach
GROUP BY node
"""


@_register("dedup_semantic_canonical", _SEM_CANONICAL_ORACLE)
def q_dedup_semantic_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup's actual OUTPUT — the prune list: within-cluster cosine
    pairs (dedup_semantic_clusters) collapsed by connected components
    into one canonical embedding per semantic near-dup family (min
    vec_id, the policy the SemDeDup paper's keep-one rule defaults to);
    ``is_canonical`` marks the row a pruning pass keeps. Completes the
    semantic ladder exactly as dedup_clusters completes the LSH ladder
    and multimodal_image_dedup_clusters the perceptual one — the same
    components kernel and recursive-CTE oracle, third instantiation.

    Scale: pair discovery is the plan-pinned cluster-keyed join; the
    component loop runs over the pair graph only (semantic families
    are tiny cliques), never the full embedding set."""
    pairs = semantic_cluster_pairs(
        catalog.load_table(spark, sf_dir, "embeddings")
    ).select(
        F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b")
    )
    labels = connected_components(pairs)
    return labels.select(
        F.col("node").alias("vec_id"),
        F.col("label").alias("cluster_rep"),
        (F.col("label") == F.col("node")).alias("is_canonical"),
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
    # Both edge directions come from ONE explode over one pass of the
    # pairs plan — a unionAll of two selects would execute the (expensive)
    # pair-discovery subtree twice.
    edges = stage(
        pairs.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .distinct()
    )
    labels = staged_labels = stage(
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        new_label = F.least(
            F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
        )
        # The convergence probe rides the SAME staged step frame as a
        # ``moved`` flag (new != old ⇔ new < old, since least(old, x)
        # <= old) — round 14: the previous new-vs-old equality JOIN per
        # iteration re-scanned both label tables just to count changes;
        # the count over the cached flag is join-free.
        stepped = stage(
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                new_label.alias("label"),
                (new_label < F.col("label")).alias("moved"),
            )
        )
        changed = stepped.where("moved").count()
        staged_labels.unpersist()  # the PERSISTED frame, not a projection
        labels, staged_labels = stepped.select("node", "label"), stepped
        if changed == 0:
            break
    return labels


@_register(
    "dedup_clusters",
    f"""
WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_ORACLE}),
{components_ctes()}
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


# ---------------------------------------------------------------------------
# dedup_cluster_canonical — the deduplicated corpus (keep-best survivors)
# ---------------------------------------------------------------------------

_CANONICAL_ORACLE = f"""
WITH RECURSIVE pairs AS ({_NGRAM_PAIRS_ORACLE}),
{components_ctes()},
clusters AS (
  SELECT node AS doc_id, min(dest) AS cluster_rep
  FROM reach GROUP BY node
),
ranked AS (
  SELECT c.doc_id, c.cluster_rep,
         count(*)     OVER (PARTITION BY c.cluster_rep) AS cluster_size,
         row_number() OVER (PARTITION BY c.cluster_rep
                            ORDER BY d.n_chars DESC, c.doc_id) AS rk
  FROM clusters c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT d.doc_id, d.lang, d.source, d.n_chars,
       coalesce(r.cluster_size, 1)  AS cluster_size,
       (r.doc_id IS NOT NULL)       AS kept_from_cluster
FROM documents d
LEFT JOIN (SELECT * FROM ranked WHERE rk = 1) r ON r.doc_id = d.doc_id
WHERE r.doc_id IS NOT NULL
   OR d.doc_id NOT IN (SELECT doc_id FROM clusters)
"""


@_register("dedup_cluster_canonical", _CANONICAL_ORACLE)
def q_dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The DEDUPLICATED corpus — the artifact the whole near-dup ladder
    exists to produce: every unclustered document plus exactly one
    keep-best representative per near-dup cluster (longest text wins,
    doc_id breaks ties — a quality policy, unlike ``dedup_clusters``'s
    min-id labeling which is a graph artifact).

    Plan: clusters come from the same staged LSH → connected-components
    labels; the representative pick is one row_number window over the
    CLUSTERED docs only (a tiny fraction of the corpus), and survivors
    are a broadcast-able left anti join of the full corpus against the
    cluster membership plus the picked reps. At 100 TB the windows and
    joins all key on cluster/doc ids — text never shuffles."""
    d = stage(catalog.load_table(spark, sf_dir, "documents"))
    pairs = q_dedup_minhash_lsh_pairs(spark, sf_dir)
    clusters = stage(
        connected_components(pairs).select(
            F.col("node").alias("doc_id"), F.col("label").alias("cluster_rep")
        )
    )
    ranked = (
        clusters.join(d, "doc_id")
        .withColumn(
            "cluster_size",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_rep")),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("cluster_rep").orderBy(
                    F.col("n_chars").desc(), F.col("doc_id")
                )
            ),
        )
    )
    reps = ranked.where(F.col("rk") == 1).select(
        "doc_id", "cluster_size", F.lit(True).alias("kept_from_cluster")
    )
    singles = (
        d.join(clusters, "doc_id", "left_anti")
        .select(
            "doc_id",
            F.lit(1).cast("long").alias("cluster_size"),
            F.lit(False).alias("kept_from_cluster"),
        )
    )
    keep = reps.unionAll(singles)
    return keep.join(d, "doc_id").select(
        "doc_id", "lang", "source", "n_chars",
        "cluster_size", "kept_from_cluster",
    )


# ---------------------------------------------------------------------------
# url_canonical_dedup — URL normalization before exact dedup
# ---------------------------------------------------------------------------

_URL_ORACLE = """
WITH raw AS (
  -- deterministic synthetic crawl URLs: scheme/host case noise, an
  -- optional /index.html suffix, a tracking param and an optional
  -- fragment, all parameterized off doc_id so variants COLLIDE after
  -- canonicalization (doc_id mod 97 x mod 50 path/id space)
  SELECT doc_id, source,
         concat(
           CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://WWW.' ELSE 'https://www.' END,
           source, '.Example.com/page/', CAST(doc_id % 23 AS VARCHAR),
           CASE WHEN doc_id % 3 = 0 THEN '/index.html' ELSE '' END,
           '?utm_source=feed&utm_id=', CAST(doc_id % 50 AS VARCHAR),
           CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END
         ) AS url
  FROM documents
),
canon AS (
  -- the query string here is tracking-only, so canonicalization
  -- drops it wholesale: fragment, then query, then directory index,
  -- then the www. prefix
  SELECT doc_id, source,
         replace(replace(
           string_split(string_split(lower(url), '#')[1], '?')[1],
           '/index.html', ''),
           '://www.', '://') AS canonical_url
  FROM raw
)
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(min(doc_id) AS BIGINT) AS canonical_doc
FROM canon
GROUP BY canonical_url
"""


@_register("url_canonical_dedup", _URL_ORACLE)
def q_url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-style URL canonicalization, then exact dedup on the
    canonical form: lowercase, fragment stripped, tracking params
    removed, directory-index suffix and www. prefix dropped — the
    normalization every web-corpus pipeline runs before URL-level
    dedup (raw crawl frontiers are full of case/param/fragment
    variants of one page). Pure string algebra (whole-stage codegen)
    + one groupBy on the canonical key; the canonical-key shuffle
    carries short strings, not documents."""
    d = catalog.load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("HTTPS://WWW.")).otherwise(
            F.lit("https://www.")
        ),
        F.col("source"),
        F.lit(".Example.com/page/"),
        (F.col("doc_id") % 23).cast("string"),
        F.when(F.col("doc_id") % 3 == 0, F.lit("/index.html")).otherwise(
            F.lit("")
        ),
        F.lit("?utm_source=feed&utm_id="),
        (F.col("doc_id") % 50).cast("string"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    canonical = F.replace(
        F.replace(
            F.substring_index(
                F.substring_index(F.lower(url), "#", 1), "?", 1
            ),
            F.lit("/index.html"),
            F.lit(""),
        ),
        F.lit("://www."),
        F.lit("://"),
    )
    return (
        d.select("doc_id", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_variants"),
            F.min("doc_id").cast("long").alias("canonical_doc"),
        )
    )


# ---------------------------------------------------------------------------
# winnowing_candidate_pairs — Schleimer et al. 2003 local fingerprinting
# ---------------------------------------------------------------------------

WINNOW_K = 3       # k-gram width (tokens)
WINNOW_W = 4       # winnowing window (hashes)
WINNOW_MAX_DF = 20  # fingerprint document-frequency cap (hot-fp guard)
WINNOW_MIN_SHARED = 2

_WINNOW_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
),
grams AS (
  SELECT doc_id, i AS pos, array_to_string(t[i:i+{WINNOW_K - 1}], ' ') AS gram
  FROM toks, unnest(generate_series(1, len(t) - {WINNOW_K - 1})) AS g(i)
),
h AS (
  SELECT doc_id, pos,
         list_reduce([0::BIGINT] ||
                     [ascii(c)::BIGINT % 256 FOR c IN string_split(gram, '')],
                     (acc, x) -> (acc * 31 + x) % 1000000007) AS gh
  FROM grams
),
wins AS (
  SELECT doc_id, pos,
         min(gh) OVER (PARTITION BY doc_id ORDER BY pos
                       ROWS BETWEEN CURRENT ROW AND {WINNOW_W - 1} FOLLOWING)
           AS fp,
         count(*) OVER (PARTITION BY doc_id) AS n_grams
  FROM h
),
fps AS (
  SELECT doc_id, fp FROM wins
  WHERE pos <= n_grams - {WINNOW_W - 1}
  GROUP BY doc_id, fp
),
capped AS (
  SELECT doc_id, fp FROM (
    SELECT doc_id, fp, count(*) OVER (PARTITION BY fp) AS df FROM fps
  ) WHERE df <= {WINNOW_MAX_DF}
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(count(*) AS BIGINT) AS shared_fps
FROM capped a JOIN capped b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING count(*) >= {WINNOW_MIN_SHARED}
"""


@_register("winnowing_candidate_pairs", _WINNOW_ORACLE)
def q_winnowing_candidate_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD
    2003): hash every token {WINNOW_K}-gram with the cross-engine
    polynomial hash, keep the MINIMUM hash of each sliding
    {WINNOW_W}-window — the guarantee is that any shared substring of
    length ≥ w+k-1 tokens yields at least one shared fingerprint — and
    emit document pairs sharing ≥ {WINNOW_MIN_SHARED} fingerprints.
    The local-fingerprinting alternative to MinHash: position-aware
    (catches contiguous plagiarized spans, not just bag overlap) with a
    selection density guaranteed between 1/w and 2/(w+1).

    Scale shape mirrors the shingle index: fingerprints per doc are a
    bounded fraction (~2/w) of grams, the inverted fingerprint index is
    df-capped at {WINNOW_MAX_DF} before the pair join (hot boilerplate
    fingerprints can't own the shuffle — same soundness trade as
    SHINGLE_MAX_DF), and the pair aggregation shuffles (id, id) pairs
    only. The winnowing window itself is a per-doc ROWS frame —
    bounded by document length, embarrassingly parallel across docs."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.split("text", " ").alias("t"))
    from ..functions import seq1

    grams = toks.select(
        "doc_id",
        # seq1: docs shorter than WINNOW_K tokens get the EMPTY gram
        # list (sequence(1, 0) would descend and crash slice) — the
        # same guard every shingle consumer uses
        F.posexplode(
            F.transform(
                seq1(F.size("t") - (WINNOW_K - 1)),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("t"), i, WINNOW_K)
                ),
            )
        ).alias("pos0", "gram"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "gram")
    gh = F.aggregate(
        F.split("gram", ""),
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + F.ascii(c) % 256) % 1000000007,
    )
    h = grams.select("doc_id", "pos", gh.alias("gh"))
    wdoc = Window.partitionBy("doc_id")
    wmin = (
        wdoc.orderBy("pos").rowsBetween(Window.currentRow, WINNOW_W - 1)
    )
    wins = h.select(
        "doc_id",
        "pos",
        F.min("gh").over(wmin).alias("fp"),
        F.count(F.lit(1)).over(wdoc).alias("n_grams"),
    )
    fps = (
        wins.where(F.col("pos") <= F.col("n_grams") - (WINNOW_W - 1))
        .select("doc_id", "fp")
        .distinct()
    )
    wfp = Window.partitionBy("fp")
    capped = stage(
        fps.withColumn("df", F.count(F.lit(1)).over(wfp))
        .where(F.col("df") <= WINNOW_MAX_DF)
        .select("doc_id", "fp")
    )
    a = capped.select(F.col("doc_id").alias("doc_a"), "fp")
    b = capped.select(F.col("doc_id").alias("doc_b"), "fp")
    return (
        a.join(b, "fp")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_fps"))
        .where(F.col("shared_fps") >= WINNOW_MIN_SHARED)
    )


# ---------------------------------------------------------------------------
# decontamination_ngram_overlap — train/eval n-gram contamination probe
# ---------------------------------------------------------------------------

# 8-gram overlap is the published decontamination granularity (GPT-3
# appendix C / Brown et al. 2020 use 13-grams; The Pile and Gopher use 8-13;
# 8 fits the fixture's ~250-token docs). The EVAL side of a contamination
# probe is a benchmark — small by definition — so its inverted n-gram index
# broadcasts and the training corpus streams through a map-side join: the
# 100 TB scan never shuffles document payloads, and the pair aggregation
# carries (train_id, eval_id) pairs only, bounded by eval-set size.
DECON_N = 8
DECON_EVAL_MOD = 29  # fixture eval set: doc_id % 29 == 0 (~3% of corpus;
#   chosen so the sf0.01 gate sees real contaminated pairs, not 0 rows)

_DECON_ORACLE = f"""
WITH g AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+{DECON_N - 1}], ' ')
                        FOR i IN range(1, len(toks) - {DECON_N - 2})]) AS grams
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
ev AS (SELECT doc_id AS eval_doc_id, unnest(grams) AS gram
       FROM g WHERE doc_id % {DECON_EVAL_MOD} = 0),
evs AS (SELECT doc_id AS eval_doc_id, len(grams) AS n_eval
        FROM g WHERE doc_id % {DECON_EVAL_MOD} = 0),
tr AS (SELECT doc_id AS train_doc_id, unnest(grams) AS gram
       FROM g WHERE doc_id % {DECON_EVAL_MOD} <> 0),
shared AS (
  SELECT train_doc_id, eval_doc_id, CAST(count(*) AS BIGINT) AS shared_ngrams
  FROM tr JOIN ev USING (gram)
  GROUP BY 1, 2
)
SELECT s.train_doc_id, s.eval_doc_id, s.shared_ngrams,
       round(s.shared_ngrams * 1.0 / evs.n_eval, 6) AS eval_coverage
FROM shared s JOIN evs USING (eval_doc_id)
"""


@_register("decontamination_ngram_overlap", _DECON_ORACLE)
def q_decontamination_ngram_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Training-data decontamination probe: for every (train doc, eval
    doc) pair sharing at least one distinct {DECON_N}-gram, report the
    shared-gram count and the fraction of the eval doc's grams covered
    (the quantity a "remove if coverage > τ" policy thresholds on).
    Eval set = doc_id % {DECON_EVAL_MOD} == 0, standing in for a held-out
    benchmark. The eval index is broadcast (a benchmark is model-table
    sized); train grams never shuffle — the pair aggregation reduces
    (train_id, eval_id) keys only."""
    d = catalog.load_table(spark, sf_dir, "documents")
    is_eval = F.col("doc_id") % DECON_EVAL_MOD == 0
    ev, ev_sizes = build_eval_index(d.where(is_eval))
    return decontamination_pairs(d.where(~is_eval), ev, ev_sizes)


def build_eval_index(eval_docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(inverted distinct-{DECON_N}-gram index, per-doc gram counts) for
    an eval/benchmark corpus — the static, broadcastable side of the
    contamination probe. The streaming monitor stages both once and
    reuses them across every micro-batch."""
    grams8 = _shingles(n=DECON_N)
    ev = eval_docs.select(
        F.col("doc_id").alias("eval_doc_id"),
        F.explode(grams8).alias("gram"),
    )
    ev_sizes = eval_docs.select(
        F.col("doc_id").alias("eval_doc_id"),
        F.size(grams8).alias("n_eval"),
    )
    return ev, ev_sizes


def decontamination_pairs(
    train: DataFrame, ev: DataFrame, ev_sizes: DataFrame
) -> DataFrame:
    """The contamination kernel: (train, eval) pairs sharing ≥1 distinct
    {DECON_N}-gram with shared count + eval-coverage fraction. Shared
    between the batch query and streaming/decon_stream — both sides of
    the eval index broadcast, the train gram stream never shuffles.

    Broadcast ceiling (numeric contract): an eval gram row is ~80 bytes
    in the broadcast hashtable (8-byte id + ~50-char gram + overhead),
    so Spark's default 8 GiB broadcast-table hard limit accommodates
    roughly 100M distinct eval grams — about 500k benchmark documents of
    ~200 distinct {DECON_N}-grams each; a typical held-out suite (tens
    of thousands of docs) uses <1% of that. Past the ceiling the
    broadcast fails LOUDLY (it does not silently degrade); callers with
    a web-scale "eval" side should drop the two F.broadcast hints below
    and let the same equi-join run as a shuffle join — semantics are
    identical, only the train grams then shuffle on gram."""
    tr = train.select(
        F.col("doc_id").alias("train_doc_id"),
        F.explode(_shingles(n=DECON_N)).alias("gram"),
    )
    return (
        tr.join(F.broadcast(ev), "gram")
        .groupBy("train_doc_id", "eval_doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("shared_ngrams"))
        .join(F.broadcast(ev_sizes), "eval_doc_id")
        .select(
            "train_doc_id",
            "eval_doc_id",
            "shared_ngrams",
            F.round(
                F.col("shared_ngrams") * F.lit(1.0) / F.col("n_eval"), 6
            ).alias("eval_coverage"),
        )
    )


# ---------------------------------------------------------------------------
# decontamination_semantic_pairs — embedding-side contamination probe
# ---------------------------------------------------------------------------

# The n-gram probe above catches verbatim leakage only: a PARAPHRASED
# eval item shares no 8-gram with its training-set twin but sits right
# next to it in embedding space. The semantic probe composes the
# SemDeDup machinery (kmeans_assign + within-cluster exact cosine,
# dedup_semantic_clusters) with the decon eval/train split: eval
# embeddings are benchmark-sized — broadcast, like the gram index — and
# the cluster key bounds each train row's candidate eval set. The bar is
# LOWER than the near-dup threshold (0.35 vs COSINE_THRESHOLD's 0.45):
# paraphrases are semantically close but not near-identical, and a
# contamination sweep prefers recall (flagged pairs get human/ngram
# review; missed pairs leak into training).
SEMDECON_THRESHOLD = 0.35


def _semdecon_oracle(probes: int) -> str:
    """ONE oracle builder for both semantic decon probes (the
    greedy_fold_ctes discipline): the exact form is ``probes=1``, the
    multi-probe recall upgrade differs ONLY in the eval leg's rank
    filter — a threshold/tie-break/split fix moves both oracles."""
    return f"""
WITH c AS (
  SELECT vec_id AS cid, embedding::DOUBLE[] AS ce
  FROM embeddings WHERE vec_id < {SEMDEDUP_K}
),
v AS (SELECT vec_id, vec_id % {DECON_EVAL_MOD} = 0 AS is_eval,
             embedding::DOUBLE[] AS ve FROM embeddings),
d AS (
  -- |v-c|^2 via three ordered inner products (term-for-term the
  -- engine's kmeans_assign expression)
  SELECT v.vec_id, is_eval, c.cid, ve,
         list_inner_product(ve, ve) + list_inner_product(ce, ce)
           - 2 * list_inner_product(ve, ce) AS d2
  FROM v, c
),
assigned AS (
  SELECT vec_id, is_eval, cid, ve,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY round(d2, 9), cid) AS rk
  FROM d
)
SELECT e.vec_id AS eval_id, t.vec_id AS train_id, e.cid AS cluster_id,
       round(list_cosine_similarity(e.ve, t.ve), 6) AS cosine_sim
FROM (SELECT * FROM assigned WHERE rk <= {probes} AND is_eval) e
JOIN (SELECT * FROM assigned WHERE rk = 1 AND NOT is_eval) t
  ON e.cid = t.cid
WHERE list_cosine_similarity(e.ve, t.ve) >= {SEMDECON_THRESHOLD}
"""


_SEMDECON_ORACLE = _semdecon_oracle(1)


@_register("decontamination_semantic_pairs", _SEMDECON_ORACLE)
def q_decontamination_semantic_pairs(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-side decontamination: (train, eval) embedding pairs
    whose exact cosine clears the paraphrase bar, candidates bounded by
    a shared k-means cluster id — the leakage class the n-gram monitor
    cannot see. Eval set = vec_id % {DECON_EVAL_MOD} == 0 (the n-gram
    probe's split convention).

    Scale shape: centroids broadcast (K-row model table), assignment is
    map-side for BOTH sides; the eval side after assignment is
    benchmark-sized so it broadcasts too, making the cluster-keyed pair
    join itself map-side — the 100 TB train scan never shuffles. The
    documented SemDeDup approximation applies: a paraphrase pair whose
    members land in different clusters is out of scope; widening K (or
    probing multiple nearest clusters, the IVF trick) trades map-side
    work for recall."""
    return semantic_decon_pairs(
        catalog.load_table(spark, sf_dir, "embeddings")
    )


def semantic_decon_pairs(
    e: DataFrame,
    k: int = SEMDEDUP_K,
    eval_mod: int = DECON_EVAL_MOD,
    threshold: float = SEMDECON_THRESHOLD,
    probes: int = 1,
) -> DataFrame:
    """Parameterized kernel behind BOTH semantic decon probes —
    ``e`` is an embeddings table (vec_id, embedding); centroids are the
    deterministic vec_id < k seeds (the SemDeDup convention here).
    ``probes=1`` is the exact within-cluster form; ``probes>1`` lets
    the EVAL side additionally probe its next-nearest clusters (the
    IVF recall trick). The corpus is assigned in ONE staged pass with
    the rank kept: the train leg filters back to the home cluster
    (rk == 1), so recall never costs a second corpus scan."""
    from .similarity import _emb_double, kmeans_assign

    cents = e.where(F.col("vec_id") < k).select(
        F.col("vec_id").alias("cid"), _emb_double().alias("ce")
    )
    vecs = e.select(
        "vec_id",
        (F.col("vec_id") % eval_mod == 0).alias("is_eval"),
        _emb_double().alias("ve"),
    )
    # staged: both the eval and train legs read the ONE assignment
    assigned = stage(
        kmeans_assign(
            vecs, cents, probes=probes, keep_rank=True
        ).select("vec_id", "cid", "is_eval", "rk", "ve")
    )
    ev = assigned.where(F.col("is_eval")).select(
        F.col("cid").alias("cluster_id"),
        F.col("vec_id").alias("eval_id"),
        F.col("ve").alias("emb_e"),
    )
    tr = assigned.where(~F.col("is_eval") & (F.col("rk") == 1)).select(
        F.col("cid").alias("cluster_id"),
        F.col("vec_id").alias("train_id"),
        F.col("ve").alias("emb_t"),
    )
    sim = cosine(F.col("emb_e"), F.col("emb_t"))
    return (
        tr.join(F.broadcast(ev), "cluster_id")
        .where(sim >= threshold)
        .select(
            "eval_id",
            "train_id",
            "cluster_id",
            F.round(sim, 6).alias("cosine_sim"),
        )
    )


# ---------------------------------------------------------------------------
# decontamination_semantic_multiprobe — the documented recall upgrade
# ---------------------------------------------------------------------------

SEMDECON_PROBES = 2  # eval side probes its P nearest clusters (IVF trick)

_SEMDECON_MP_ORACLE = _semdecon_oracle(SEMDECON_PROBES)


@_register("decontamination_semantic_multiprobe", _SEMDECON_MP_ORACLE)
def q_decontamination_semantic_multiprobe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The semantic decon probe with the IVF multi-probe recall upgrade
    its sibling documents: the EVAL side is additionally assigned to
    its {SEMDECON_PROBES} nearest centroids, so a paraphrase pair split
    by a cluster boundary (the documented SemDeDup miss) is caught
    whenever the eval member's second-choice cluster is the train
    member's home. Superset of decontamination_semantic_pairs by
    construction.

    Scale shape: ONE staged corpus assignment shared by both legs (the
    train leg filters back to rk == 1, its home cluster), so the recall
    upgrade costs only the eval side's probes-times fan-out through the
    broadcast — never a second corpus scan. Engine AND oracle are the
    probes={SEMDECON_PROBES} instantiation of the exact probe's shared
    kernel/oracle builder — the two forms cannot drift."""
    return semantic_decon_multiprobe(
        catalog.load_table(spark, sf_dir, "embeddings")
    )


def semantic_decon_multiprobe(
    e: DataFrame,
    k: int = SEMDEDUP_K,
    eval_mod: int = DECON_EVAL_MOD,
    threshold: float = SEMDECON_THRESHOLD,
    probes: int = SEMDECON_PROBES,
) -> DataFrame:
    """The multi-probe instantiation of ``semantic_decon_pairs`` —
    one shared kernel, one knob."""
    return semantic_decon_pairs(
        e, k=k, eval_mod=eval_mod, threshold=threshold, probes=probes
    )


# ---------------------------------------------------------------------------
# dedup_exact_substring_chunks — chunk-granular exact duplication census
# ---------------------------------------------------------------------------

# Exact SUBSTRING duplication (Lee et al. 2021, "Deduplicating Training
# Data Makes Language Models Better") at chunk granularity: doc-level
# exact dedup misses boilerplate spans pasted into otherwise-distinct
# documents. Non-overlapping token windows are the tractable census: a
# span duplicated across docs shows up as >=1 duplicated chunk once it
# covers a window. 64 tokens matches chunk_documents' training-window
# width.
SUBSTR_CHUNK_TOKENS = 64

_SUBSTR_ORACLE = f"""
WITH c AS (
  SELECT doc_id,
         sha256(array_to_string(
             toks[1 + u.i * {SUBSTR_CHUNK_TOKENS}
                  : 1 + u.i * {SUBSTR_CHUNK_TOKENS}
                    + {SUBSTR_CHUNK_TOKENS - 1}], ' ')) AS chunk_sha256
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
       unnest([{{'i': i}} FOR i IN range(0,
           CAST(ceil(len(toks) / {SUBSTR_CHUNK_TOKENS}.0) AS BIGINT))])
         AS u(u)
)
SELECT chunk_sha256,
       CAST(count(*) AS BIGINT)                AS n_occurrences,
       CAST(count(DISTINCT doc_id) AS BIGINT)  AS n_docs
FROM c
GROUP BY chunk_sha256
HAVING count(*) > 1
"""


@_register("dedup_exact_substring_chunks", _SUBSTR_ORACLE)
def q_dedup_exact_substring_chunks(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicated {SUBSTR_CHUNK_TOKENS}-token chunks across the corpus:
    each non-overlapping window is keyed by its sha256 (the shuffle
    carries 32-byte digests, never chunk text — the dedup_exact_hash
    discipline), grouped, and reported where it occurs more than once.
    Map-only chunk generation (sequence + slice, zero Python), one
    digest-keyed aggregation; embarrassingly parallel at any corpus
    size."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n_chunks = F.ceil(
        F.size(toks) / F.lit(float(SUBSTR_CHUNK_TOKENS))
    ).cast("int")
    # explode over 0..n_chunks-1 states the 0-based index directly and
    # matches the oracle's range(0, ceil(len/64)); n_chunks >= 1 for any
    # non-null text, so the descending-sequence hazard (_shingles) never
    # applies here
    idx = d.select(
        "doc_id",
        toks.alias("toks"),
        F.explode(
            F.sequence(F.lit(0), n_chunks - F.lit(1))
        ).alias("chunk_idx"),
    )
    chunk = F.array_join(
        F.slice(
            F.col("toks"),
            F.col("chunk_idx") * SUBSTR_CHUNK_TOKENS + 1,
            SUBSTR_CHUNK_TOKENS,
        ),
        " ",
    )
    return (
        idx.select("doc_id", F.sha2(chunk, 256).alias("chunk_sha256"))
        .groupBy("chunk_sha256")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_occurrences"),
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
        )
        .where(F.col("n_occurrences") > 1)
    )


# ---------------------------------------------------------------------------
# dedup_line_level — CCNet/RefinedWeb-style duplicated-line removal
# ---------------------------------------------------------------------------

# Line-granular dedup WITH REASSEMBLY (CCNet, Wenzek et al. 2020;
# RefinedWeb, Penedo et al. 2023): a line duplicated across documents is
# boilerplate (headers, footers, nav text) — remove the LINE and keep
# the document, the transform that doc-level and chunk-census dedup both
# straddle. The fixture corpus has no newlines, so "lines" are
# deterministic non-overlapping {LINE_WORDS}-word segments (the same
# segmenter discipline as dedup_exact_substring_chunks); a real corpus
# would split on '\n' first and fall back to the segmenter for
# newline-free docs.
LINE_WORDS = 12
LINE_DF_MAX = 1  # keep a line only if NO other document contains it


def segment_lines(
    d: DataFrame, keys: tuple[str, ...], line_words: int = LINE_WORDS
) -> DataFrame:
    """THE segmenter: map-only ``line_words``-word segments of ``text``,
    one row per (keys..., line_no, line). Shared by ``dedup_line_level``
    and ``source_overlap_matrix`` (and mirrored by ``_segments_cte`` on
    the oracle side) so the dedup pass and the overlap census can never
    disagree about what a "line" is — change it once, both move.

    NULL text is coalesced to '' BEFORE tokenizing (one empty segment),
    so a NULL-text doc still yields a reassembly row — consistent with
    the NULL-text accounting in ``dedup_incremental_census`` — and the
    segment count is a plain expression over a non-NULL array,
    independent of the ANSI/``sizeOfNull`` config (under legacy
    ``size(NULL) = -1`` semantics a NULL array would otherwise emit a
    phantom descending ``sequence(0, -1) = [0, -1]`` pair of NULL
    segments that could fabricate cross-source pairs).

    Consumers must EXCLUDE the empty segment from any sharing census:
    an empty segment is the absence of content, not shareable content —
    two missing-text docs are not copies of each other. Both
    ``dedup_line_level`` (df census) and ``source_overlap_matrix``
    (presence sets) filter ``line != ''`` before counting, on engine
    and oracle sides alike; the empty segment survives only as the
    reassembly placeholder."""
    toks = F.split(F.coalesce(F.col("text"), F.lit("")), " ")
    n_lines = F.ceil(F.size(toks) / F.lit(float(line_words))).cast("int")
    idx = d.select(
        *keys,
        toks.alias("toks"),
        F.explode(F.sequence(F.lit(0), n_lines - F.lit(1))).alias(
            "line_no"
        ),
    )
    line = F.array_join(
        F.slice(
            F.col("toks"), F.col("line_no") * line_words + 1, line_words
        ),
        " ",
    )
    return idx.select(
        *keys,
        F.col("line_no").cast("long").alias("line_no"),
        line.alias("line"),
    )


def _segments_cte(key: str) -> str:
    """Oracle-side twin of ``segment_lines`` — the two leading CTEs
    (tokenize + segment), parameterized only by the carried key."""
    return f"""tokd AS (SELECT {key}, string_split(coalesce(text, ''), ' ') AS toks
              FROM documents),
lines AS (
  SELECT {key}, CAST(u.i AS BIGINT) AS line_no,
         array_to_string(
             toks[1 + u.i * {LINE_WORDS}
                  : u.i * {LINE_WORDS} + {LINE_WORDS}], ' ') AS line
  FROM tokd,
       unnest([{{'i': i}} FOR i IN range(0,
           CAST(ceil(len(toks) / {LINE_WORDS}.0) AS BIGINT))]) AS u(u)
)"""

_LINE_ORACLE = f"""
WITH {_segments_cte("doc_id")},
-- df over the line TEXT: equality classes are identical to the engine's
-- sha256-digest keys (digest equality == text equality). The EMPTY
-- segment (missing-text placeholder) is excluded from the census —
-- absence of content is not shareable content — so it left-joins to a
-- NULL df and is always kept.
dfl AS (SELECT line, count(DISTINCT doc_id) AS df FROM lines
        WHERE line <> '' GROUP BY line)
SELECT l.doc_id,
       coalesce(string_agg(CASE WHEN df IS NULL OR df <= {LINE_DF_MAX}
                                THEN l.line END,
                           ' ' ORDER BY l.line_no), '') AS clean_text,
       CAST(count(*) FILTER (df IS NULL OR df <= {LINE_DF_MAX}) AS BIGINT)
         AS n_kept,
       CAST(count(*) FILTER (df > {LINE_DF_MAX}) AS BIGINT)  AS n_dropped
FROM lines l LEFT JOIN dfl USING (line)
GROUP BY l.doc_id
"""


@_register("dedup_line_level", _LINE_ORACLE)
def q_dedup_line_level(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-line removal with document reassembly: every doc is
    split into {LINE_WORDS}-word lines, a line's document frequency is
    counted over sha256 digests (the shuffle carries 32-byte keys, never
    line text — the dedup_exact_hash discipline), lines with df >
    {LINE_DF_MAX} are dropped, and each document is reassembled from its
    surviving lines in order. Emits (doc_id, clean_text, n_kept,
    n_dropped) — a doc whose every line is boilerplate survives as the
    empty string with its drop count, so the caller can threshold.

    Scale shape: line generation is map-only (sequence + slice, zero
    Python); then ONE digest-keyed df aggregation, one digest-keyed
    join back, one doc-keyed reassembly aggregation — every shuffle key
    is either a fixed-width digest or doc_id. Reassembly order comes
    from array_sort over (line_no, ...) structs inside the aggregation,
    not a global sort."""
    return line_level_dedup(catalog.load_table(spark, sf_dir, "documents"))


def line_level_dedup(
    d: DataFrame,
    line_words: int = LINE_WORDS,
    max_line_df: int = LINE_DF_MAX,
) -> DataFrame:
    """The parameterized kernel behind ``dedup_line_level``."""
    # staged: consumed twice (df census + the reassembly join)
    lines = stage(
        segment_lines(d, ("doc_id",), line_words).withColumn(
            "h", F.sha2("line", 256)
        )
    )
    # empty segments (missing-text placeholders) stay OUT of the census
    # and left-join to a NULL df — always kept, never "boilerplate"
    dfl = lines.where(F.col("line") != "").groupBy("h").agg(
        F.countDistinct("doc_id").alias("df")
    )
    flagged = lines.join(dfl, "h", "left").select(
        "doc_id",
        "line_no",
        "line",
        (F.col("df").isNull() | (F.col("df") <= max_line_df)).alias("keep"),
    )
    entries = F.array_sort(
        F.collect_list(F.struct("line_no", "keep", "line"))
    )
    kept = F.filter(entries, lambda x: x["keep"])
    return flagged.groupBy("doc_id").agg(
        F.array_join(
            F.transform(kept, lambda x: x["line"]), " "
        ).alias("clean_text"),
        F.size(kept).cast("long").alias("n_kept"),
        (F.size(entries) - F.size(kept)).cast("long").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# dedup_rate_report — per-source duplication census
# ---------------------------------------------------------------------------

# THE per-(source, digest) copy-count kernel — shared by
# dedup_rate_report and dedup_incremental_census (engine helper +
# oracle CTE, the segment_lines discipline): change digest handling
# once, both censuses move together.
_PER_TEXT_CTE = """per_text AS (
  SELECT source, sha256(text) AS h, count(*) AS copies
  FROM documents GROUP BY source, sha256(text)
)"""


def per_source_digest_counts(d: DataFrame) -> DataFrame:
    """(source, h, copies) — one digest-keyed aggregation, the engine
    twin of ``_PER_TEXT_CTE``."""
    return d.groupBy("source", F.sha2("text", 256).alias("h")).agg(
        F.count(F.lit(1)).alias("copies")
    )


_DEDUP_RATE_ORACLE = f"""
WITH {_PER_TEXT_CTE}
SELECT source,
       CAST(sum(copies) AS BIGINT)   AS n_docs,
       CAST(count(*) AS BIGINT)      AS n_unique,
       round(1.0 - count(*) * 1.0 / sum(copies), 6) AS dup_rate,
       CAST(max(copies) AS BIGINT)   AS max_copies
FROM per_text
GROUP BY source
"""


@_register("dedup_rate_report", _DEDUP_RATE_ORACLE)
def q_dedup_rate_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The duplication census a curation run reads FIRST: per source,
    how many docs, how many unique texts, the dup rate, and the largest
    exact-copy cluster — the number that decides whether dedup is worth
    a pass at all and which sources are template farms. Two digest-keyed
    aggregations (the shuffle carries (source, 32-byte sha) pairs, never
    text — the dedup_exact_hash discipline), embarrassingly parallel."""
    d = catalog.load_table(spark, sf_dir, "documents")
    per_text = per_source_digest_counts(d)
    return per_text.groupBy("source").agg(
        F.sum("copies").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        F.round(
            F.lit(1.0)
            - F.count(F.lit(1)) * F.lit(1.0) / F.sum("copies"),
            6,
        ).alias("dup_rate"),
        F.max("copies").cast("long").alias("max_copies"),
    )


# ---------------------------------------------------------------------------
# source_overlap_matrix — pairwise cross-source boilerplate census
# ---------------------------------------------------------------------------

# Which sources duplicate into which: for every source pair, how many
# distinct LINE_WORDS-word segments (the dedup_line_level segmenter)
# both contain, plus each side's distinct-segment total and the segment
# Jaccard. The mirror/aggregator detector a curation run consults
# before deciding which source pairs are worth a cross-dedup pass —
# dedup_rate_report answers "is source X internally duplicated";
# this answers "is source X a copy OF source Y". Whole-document
# exact-hash overlap is too blunt for that (zero cross-source full-copy
# collisions even at sf0.01); shared boilerplate segments are the
# signal mirrors actually emit.
_OVERLAP_ORACLE = f"""
WITH {_segments_cte("source")},
-- the empty segment (missing-text placeholder) is not shareable
-- content: two sources of NULL-text docs must not register overlap
pres AS (SELECT DISTINCT source, line FROM lines WHERE line <> ''),
tot AS (SELECT source, count(*) AS n FROM pres GROUP BY source),
pr AS (
  -- equality on line TEXT == equality on the engine's sha256 keys
  SELECT a.source AS source_a, b.source AS source_b,
         count(*) AS shared_segments
  FROM pres a JOIN pres b ON a.line = b.line AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b,
       CAST(p.shared_segments AS BIGINT) AS shared_segments,
       CAST(ta.n AS BIGINT) AS n_segments_a,
       CAST(tb.n AS BIGINT) AS n_segments_b,
       round(CAST(p.shared_segments AS DOUBLE)
             / (ta.n + tb.n - p.shared_segments), 6) AS seg_jaccard
FROM pr p
JOIN tot ta ON ta.source = p.source_a
JOIN tot tb ON tb.source = p.source_b
"""


@_register("source_overlap_matrix", _OVERLAP_ORACLE)
def q_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplication matrix over line segments: one row per
    source pair sharing at least one segment, with the shared count,
    each side's distinct-segment total, and the segment Jaccard.

    Plan: segment generation is the map-only dedup_line_level shape;
    (source, digest) presence dedupes once (digest-keyed shuffle — the
    32-byte-key discipline), then per-digest source sets explode into
    pairs MAP-SIDE (the market_basket pattern: fan-out is bounded by
    |sources|² per digest, independent of corpus size — never a
    digest-keyed self-join row explosion), and totals join back as a
    |sources|-row broadcast. All outputs are exact integer counts; the
    one float is an integer-ratio division rounded once."""
    return source_overlap_matrix(
        catalog.load_table(spark, sf_dir, "documents")
    )


def source_overlap_matrix(
    d: DataFrame, line_words: int = LINE_WORDS
) -> DataFrame:
    """Parameterized kernel behind ``source_overlap_matrix``."""
    per = (
        segment_lines(d, ("source",), line_words)
        .where(F.col("line") != "")  # empty placeholder is not content
        .select("source", F.sha2("line", 256).alias("h"))
        .distinct()
    )
    tot = per.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    sets = (
        per.groupBy("h")
        .agg(F.collect_set("source").alias("ss"))
        .where(F.size("ss") >= 2)
    )
    pairs = (
        sets.select(F.col("ss"), F.explode("ss").alias("source_a"))
        .select("source_a", F.explode("ss").alias("source_b"))
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("shared_segments"))
    )
    ta = tot.select(
        F.col("source").alias("source_a"), F.col("n").alias("n_segments_a")
    )
    tb = tot.select(
        F.col("source").alias("source_b"), F.col("n").alias("n_segments_b")
    )
    return (
        pairs.join(F.broadcast(ta), "source_a")
        .join(F.broadcast(tb), "source_b")
        .select(
            "source_a",
            "source_b",
            F.col("shared_segments").cast("long").alias("shared_segments"),
            F.col("n_segments_a").cast("long").alias("n_segments_a"),
            F.col("n_segments_b").cast("long").alias("n_segments_b"),
            F.round(
                F.col("shared_segments").cast("double")
                / (
                    F.col("n_segments_a")
                    + F.col("n_segments_b")
                    - F.col("shared_segments")
                ),
                6,
            ).alias("seg_jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# dedup_incremental_census — ingest-order novelty accounting per source
# ---------------------------------------------------------------------------

# The incremental-ingest question at 100 TB: you never re-dedup the
# whole corpus — each arriving source is deduped against the archive of
# everything ingested BEFORE it. Modeling ingest order as lexicographic
# source order, classify every document: a duplicate of an EARLIER
# source (the cross-shard hit the archive check exists for), the first
# copy of a digest new to the corpus, or an extra copy within the
# digest's own first source (intra-shard dup). Exact integer counts
# with a per-source conservation law n_docs = dup_of_earlier +
# novel_unique + dup_within (pinned in the fixture test).
_INCR_ORACLE = f"""
WITH {_PER_TEXT_CTE},
first_seen AS (SELECT h, min(source) AS first_src
               FROM per_text GROUP BY h)
SELECT source,
       CAST(sum(copies) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN first_src < source THEN copies ELSE 0 END)
            AS BIGINT) AS n_dup_of_earlier,
       CAST(sum(CASE WHEN first_src = source THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel_unique,
       CAST(sum(CASE WHEN first_src = source THEN copies - 1 ELSE 0 END)
            AS BIGINT) AS n_dup_within
-- null-safe: a NULL-text doc has a NULL digest; plain equality would
-- silently drop it and n_docs would disagree with dedup_rate_report
FROM per_text p JOIN first_seen f ON p.h IS NOT DISTINCT FROM f.h
GROUP BY source
"""


@_register("dedup_incremental_census", _INCR_ORACLE)
def q_dedup_incremental_census(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source novelty census under ingest order (sources
    lexicographic): how many docs each source would contribute against
    the archive of earlier sources vs duplicate into it vs duplicate
    within itself — the accounting an incremental dedup pass reports.

    Plan: two digest-keyed aggregations and one digest-keyed join —
    the shuffles carry (source, 32-byte sha, count) triples, never
    text (the dedup_exact_hash discipline); the final reduce is
    sources-sized."""
    return incremental_census(
        catalog.load_table(spark, sf_dir, "documents")
    )


def incremental_census(d: DataFrame) -> DataFrame:
    """Parameterized kernel behind ``dedup_incremental_census``."""
    per = per_source_digest_counts(d)
    first_seen = per.groupBy("h").agg(F.min("source").alias("first_src"))
    earlier = F.col("first_src") < F.col("source")
    here = F.col("first_src") == F.col("source")
    return (
        # eqNullSafe: NULL-text docs (NULL digest) must not vanish in
        # the join — groupBy already treats NULL digests as one class
        per.join(
            first_seen,
            per["h"].eqNullSafe(first_seen["h"]),
        )
        .drop(first_seen["h"])
        .groupBy("source")
        .agg(
            F.sum("copies").cast("long").alias("n_docs"),
            F.sum(F.when(earlier, F.col("copies")).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_dup_of_earlier"),
            F.sum(F.when(here, F.lit(1)).otherwise(F.lit(0)))
            .cast("long")
            .alias("n_novel_unique"),
            F.sum(
                F.when(here, F.col("copies") - F.lit(1)).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("n_dup_within"),
        )
    )
