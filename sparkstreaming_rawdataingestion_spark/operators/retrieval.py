"""Retrieval / matching operators: BM25 keyword scoring and blocked
string-similarity self-join.

LLM-pipeline context: corpus-level keyword retrieval (BM25) is the
standard first-stage ranker for building eval sets and for
contamination probes ("which training docs score high against this
benchmark query?"); blocked edit-distance joins are the workhorse of
entity resolution in metadata curation.

Scale shape:
- **bm25_keyword_search**: per-term tf columns are computed by
  size(filter(tokens)) — no explode, no per-term shuffle. The corpus
  statistics (N, avgdl, per-term df) reduce to ONE single-row aggregate
  that is broadcast back; the scan is touched twice (once for stats,
  once for scoring) and both passes are full-codegen. Top-k via
  TakeOrderedAndProject — never a global sort.
- **string_similarity_join_brand**: the candidate space is blocked on
  brand equality (equi-join — hash-partitioned both sides) and a length
  filter; the quadratic levenshtein only runs inside a block. At 100 TB
  the block key bounds every task's pair count; a hot block shows up in
  key_skew_report and gets salted or df-capped like any other skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import catalog, session
from .dedup import cosine

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
# bm25_keyword_search — Okapi BM25 over the documents corpus
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75
BM25_TERMS = ("spark", "vector", "stream")
BM25_TOPK = 20


def _bm25_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, t -> t = '{term}')) AS tf_{i}"
        for i, term in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    # literals carry e0 suffixes so DuckDB evaluates in DOUBLE (not
    # DECIMAL) and the grouping parenthesization matches the Spark
    # expression exactly — bit-identical float algebra on both engines
    score_terms = " + ".join(
        f"""ln((stats.n - stats.df_{i} + 0.5e0) / (stats.df_{i} + 0.5e0) + 1.0e0)
            * ((d.tf_{i} * {BM25_K1 + 1}e0)
               / (d.tf_{i} + {BM25_K1}e0
                  * ((1e0 - {BM25_B}e0) + {BM25_B}e0 * d.dl / stats.avgdl)))"""
        for i in range(len(BM25_TERMS))
    )
    any_match = " + ".join(f"d.tf_{i}" for i in range(len(BM25_TERMS)))
    return f"""
WITH d AS (
  SELECT doc_id, len(toks) AS dl, {tf_cols}
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols} FROM d
)
SELECT d.doc_id, round({score_terms}, 6) AS bm25
FROM d, stats
WHERE {any_match} > 0
ORDER BY bm25 DESC, d.doc_id
LIMIT {BM25_TOPK}
"""


@_register("bm25_keyword_search", _bm25_oracle())
def q_bm25_keyword_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 (k1=1.2, b=0.75) top-20 for a fixed 3-term keyword
    query, scored over the whole corpus in two codegen passes.

    tf per term is size(filter(tokens)) — a per-row expression, no
    explode and no (doc, term) shuffle; document frequency, corpus size
    and average length reduce to ONE single-row aggregate cross-joined
    back as a broadcast. Deterministic tie-break on doc_id so the top-k
    edge is stable. The exact same algebra (and float rounding) runs on
    the DuckDB oracle."""
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(BM25_TOPK)
    )


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, bm25) for every document matching ≥1 query term —
    the shared scoring kernel of ``bm25_keyword_search`` and the RRF
    fusion. bm25 is rounded to 6 dp (identical algebra on DuckDB)."""
    docs = catalog.load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")

    def tf(term):
        # NB: the lambda must be unary — a second parameter (even a bound
        # default) makes pyspark pass the ELEMENT INDEX as arg 2
        return F.size(F.filter(toks, lambda t: t == F.lit(term)))

    d = docs.select(
        "doc_id",
        F.size(toks).alias("dl"),
        *[tf(term).alias(f"tf_{i}") for i, term in enumerate(BM25_TERMS)],
    )
    stats = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf_{i}") > 0, 1).otherwise(0)).alias(
                f"df_{i}"
            )
            for i in range(len(BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(BM25_TERMS)):
        idf = F.log(
            (F.col("n") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
            + 1.0
        )
        part = idf * (
            F.col(f"tf_{i}")
            * F.lit(BM25_K1 + 1)
            / (
                F.col(f"tf_{i}")
                + F.lit(BM25_K1)
                * (
                    1
                    - F.lit(BM25_B)
                    + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
                )
            )
        )
        score = part if score is None else score + part
    matched = sum(F.col(f"tf_{i}") for i in range(len(BM25_TERMS)))
    return (
        d.crossJoin(F.broadcast(stats))
        .where(matched > 0)
        .select("doc_id", F.round(score, 6).alias("bm25"))
    )


# ---------------------------------------------------------------------------
# string_similarity_join_brand — blocked edit-distance self-join
# ---------------------------------------------------------------------------

_SIMJOIN_ORACLE = """
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       a.p_name AS name_a, b.p_name AS name_b,
       CAST(levenshtein(a.p_name, b.p_name) AS INTEGER) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand
 AND a.p_partkey < b.p_partkey
 AND abs(length(a.p_name) - length(b.p_name)) <= 3
WHERE levenshtein(a.p_name, b.p_name) <= 3
"""


@_register("string_similarity_join_brand", _SIMJOIN_ORACLE)
def q_string_similarity_join_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Entity-resolution self-join: near-identical part names (edit
    distance ≤ 3) within a brand. Brand equality is the blocking key —
    the join is a plain hash equi-join on p_brand, and the O(block²)
    levenshtein work is confined to one task's block; the length
    pre-filter (|Δlen| ≤ 3 is NECESSARY for dist ≤ 3) prunes cheaply
    before the dynamic-programming distance runs. The same lossless
    blocking is in the oracle, so both engines score identical pairs."""
    p = catalog.load_table(spark, sf_dir, "part")
    # Score the expensive function on DISTINCT values, not rows: real
    # catalogs repeat names heavily, so the levenshtein matrix over
    # |distinct names|² is orders of magnitude smaller than over row
    # pairs (measured at sf0.1: ~10k name pairs vs 8M row pairs — 6.6 s
    # → 1.0 s). Worst case (all names unique) degenerates to the plain
    # blocked join, never worse. The 3-arg levenshtein computes only the
    # |i−j| ≤ threshold DP band and bails early with -1.
    names = p.select(F.col("p_name")).distinct()
    nx = names.select(F.col("p_name").alias("name_a"))
    ny = names.select(F.col("p_name").alias("name_b"))
    name_pairs = (
        nx.join(
            F.broadcast(ny),
            F.abs(F.length("name_a") - F.length("name_b")) <= 3,
        )
        .withColumn(
            "edit_dist",
            F.levenshtein(F.col("name_a"), F.col("name_b"), 3),
        )
        .where((F.col("edit_dist") >= 0) & (F.col("edit_dist") <= 3))
    )
    a = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_a"),
        F.col("p_name").alias("name_a"),
    )
    b = p.select(
        F.col("p_brand").alias("brand"),
        F.col("p_partkey").alias("key_b"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(F.broadcast(name_pairs), "name_a")
        .join(b, ["brand", "name_b"])
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )


# ---------------------------------------------------------------------------
# hybrid_rank_fusion — reciprocal-rank fusion of lexical + dense retrieval
# ---------------------------------------------------------------------------

RRF_K = 60          # standard RRF damping constant
RRF_LIST_N = 50     # per-ranker candidate list depth
RRF_TOPK = 20
RRF_QUERY_VEC = 0   # query-by-example: the embedding of vec_id 0


def _rrf_oracle() -> str:
    tf_cols = ", ".join(
        f"len(list_filter(toks, t -> t = '{term}')) AS tf_{i}"
        for i, term in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS df_{i}"
        for i in range(len(BM25_TERMS))
    )
    score_terms = " + ".join(
        f"""ln((stats.n - stats.df_{i} + 0.5e0) / (stats.df_{i} + 0.5e0) + 1.0e0)
            * ((d.tf_{i} * {BM25_K1 + 1}e0)
               / (d.tf_{i} + {BM25_K1}e0
                  * ((1e0 - {BM25_B}e0) + {BM25_B}e0 * d.dl / stats.avgdl)))"""
        for i in range(len(BM25_TERMS))
    )
    any_match = " + ".join(f"d.tf_{i}" for i in range(len(BM25_TERMS)))
    return f"""
WITH d AS (
  SELECT doc_id, len(toks) AS dl, {tf_cols}
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
),
stats AS (
  SELECT count(*) AS n, avg(dl) AS avgdl, {df_cols} FROM d
),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS lex_rk
  FROM (
    SELECT d.doc_id, round({score_terms}, 6) AS bm25
    FROM d, stats WHERE {any_match} > 0
    ORDER BY bm25 DESC, d.doc_id LIMIT {RRF_LIST_N})
),
qv AS (
  SELECT embedding::DOUBLE[] AS q FROM embeddings
  WHERE vec_id = {RRF_QUERY_VEC}
),
dense AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY s9 DESC, doc_id) AS dense_rk
  FROM (
    SELECT v.vec_id AS doc_id,
           round(list_cosine_similarity(v.embedding::DOUBLE[], qv.q), 9) AS s9
    FROM embeddings v, qv
    ORDER BY s9 DESC, v.vec_id LIMIT {RRF_LIST_N})
)
SELECT doc_id,
       CAST(coalesce(lex.lex_rk, -1) AS BIGINT) AS lex_rk,
       CAST(coalesce(dense.dense_rk, -1) AS BIGINT) AS dense_rk,
       round(coalesce(1e0 / ({RRF_K} + lex.lex_rk), 0e0)
             + coalesce(1e0 / ({RRF_K} + dense.dense_rk), 0e0), 6) AS rrf
FROM lex FULL OUTER JOIN dense USING (doc_id)
ORDER BY (coalesce(1e0 / ({RRF_K} + lex.lex_rk), 0e0)
          + coalesce(1e0 / ({RRF_K} + dense.dense_rk), 0e0)) DESC, doc_id
LIMIT {RRF_TOPK}
"""


@_register("hybrid_rank_fusion", _rrf_oracle())
def q_hybrid_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: fuse the lexical BM25 ranking (the 3-term
    keyword query) with a dense query-by-example ranking (cosine to the
    embedding of vec_id 0 — the corpus models one embedding per
    document, doc_id = vec_id) via reciprocal-rank fusion,
    RRF(d) = Σ_r 1/(60 + rank_r(d)) over the rankers whose top-50 list
    contains d. The standard zero-tuning hybrid-search combiner: rank
    positions, not incomparable raw scores, are what fuse.

    Plan: each ranker produces its candidate list with
    TakeOrderedAndProject (top-50 heaps per partition, no global sort of
    the corpus); rank assignment then runs a window over the ALREADY
    LIMITED 50-row lists (a bounded single-partition step by
    construction, independent of corpus size). The fusion is a
    full-outer join of two 50-row sets — AQE broadcasts it. Rank order
    inside each list repeats the list's own selection order (bm25 is
    identical 6-dp-rounded algebra on both engines; cosine ranks on the
    9-dp rounding like ``similarity_topk_bruteforce``), and RRF adds two
    correctly rounded divisions in a fixed order → bit-identical
    cross-engine."""
    lex_pool = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("bm25"), F.asc("doc_id"))
        .limit(RRF_LIST_N)
    )
    lex = lex_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc("doc_id")))
        .alias("lex_rk"),
    )

    emb = catalog.load_table(spark, sf_dir, "embeddings")
    as_double = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    qv = (
        emb.where(F.col("vec_id") == RRF_QUERY_VEC)
        .select(as_double.alias("q"))
    )
    dense_pool = (
        emb.crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(cosine(as_double, F.col("q")), 9).alias("s9"),
        )
        .orderBy(F.desc("s9"), F.asc("doc_id"))
        .limit(RRF_LIST_N)
    )
    dense = dense_pool.select(
        "doc_id",
        F.row_number()
        .over(Window.orderBy(F.desc("s9"), F.asc("doc_id")))
        .alias("dense_rk"),
    )

    rrf = (
        F.coalesce(1.0 / (F.lit(RRF_K) + F.col("lex_rk")), F.lit(0.0))
        + F.coalesce(1.0 / (F.lit(RRF_K) + F.col("dense_rk")), F.lit(0.0))
    )
    return (
        lex.join(dense, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rk", F.lit(-1)).cast("long").alias("lex_rk"),
            F.coalesce("dense_rk", F.lit(-1)).cast("long").alias("dense_rk"),
            F.round(rrf, 6).alias("rrf"),
            rrf.alias("_ord"),
        )
        .orderBy(F.desc("_ord"), F.asc("doc_id"))
        .limit(RRF_TOPK)
        .drop("_ord")
    )


# ---------------------------------------------------------------------------
# blocking_quality_report — does the ER blocking key actually block?
# ---------------------------------------------------------------------------

_BLOCKING_ORACLE = """
WITH b AS (
  SELECT p_brand AS block, count(*) AS n
  FROM part GROUP BY p_brand
),
t AS (
  SELECT sum(n * (n - 1) / 2)                AS cand_pairs,
         sum(n) * (sum(n) - 1) / 2           AS all_pairs
  FROM b
)
SELECT b.block,
       CAST(b.n AS BIGINT)                   AS n_records,
       CAST(b.n * (b.n - 1) / 2 AS BIGINT)   AS n_candidate_pairs,
       round(CAST(b.n * (b.n - 1) / 2 AS DOUBLE) / t.cand_pairs, 6)
         AS share_of_candidates,
       round(1.0e0 - CAST(t.cand_pairs AS DOUBLE) / t.all_pairs, 6)
         AS reduction_ratio
FROM b CROSS JOIN t
"""


@_register("blocking_quality_report", _BLOCKING_ORACLE)
def q_blocking_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking diagnostics for the entity-resolution join
    (string_similarity_join_brand): per-block record and candidate-pair
    counts, each block's share of the total O(block²) comparison work,
    and the global reduction ratio (1 − candidates/all-pairs — the
    standard blocking-quality metric, cf. Christen, "A Survey of
    Indexing Techniques for Scalable Record Linkage", TKDE 2012). A
    skewed share column is the early warning that one block will own
    the levenshtein wall-clock; a low reduction ratio means the key
    barely blocks at all.

    One grouped count (|blocks| keys), a 1-row broadcast total —
    integer pair algebra until the two final ratios."""
    p = catalog.load_table(spark, sf_dir, "part")
    b = session.stage(
        p.groupBy(F.col("p_brand").alias("block")).agg(
            F.count(F.lit(1)).alias("n")
        )
    )
    pairs = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    t = b.agg(
        F.sum((F.col("n") * (F.col("n") - 1) / 2).cast("long"))
        .alias("cand_pairs"),
        (
            F.sum("n").cast("long")
            * (F.sum("n").cast("long") - 1)
            / 2
        ).cast("long").alias("all_pairs"),
    )
    return b.crossJoin(F.broadcast(t)).select(
        "block",
        F.col("n").cast("long").alias("n_records"),
        pairs.alias("n_candidate_pairs"),
        F.round(
            pairs.cast("double") / F.col("cand_pairs"), 6
        ).alias("share_of_candidates"),
        F.round(
            F.lit(1.0)
            - F.col("cand_pairs").cast("double") / F.col("all_pairs"),
            6,
        ).alias("reduction_ratio"),
    )


# ---------------------------------------------------------------------------
# tfidf_cosine_pairs — exact sparse-vector similarity, blocked on source
# ---------------------------------------------------------------------------

TFIDF_COSINE_THRESHOLD = 0.6
# A term shared by k docs of one source block yields k² join rows in the
# pair join regardless of how many pairs survive the threshold — one
# stopword-like term skew-explodes the shuffle at scale (the SHINGLE_MAX_DF
# problem, dedup.py:36). Two-layer guard: (1) corpus-universal terms
# (df == n_docs) weigh exactly tf·ln(1) = 0, so pruning them before ANY
# downstream op is exactness-preserving — zero contribution to every norm
# and dot product; (2) terms with df > TFIDF_MAX_DF are excluded from
# CANDIDATE generation (bounding the worst term's fan-out at max_df²) but
# patch their exact weight products into the discovered pairs afterwards,
# so every reported cosine stays exact. Soundness bound, same as the
# shingle index: a qualifying pair is missed only if EVERY term it shares
# has df > max_df — i.e. the pair lives inside a >max_df-sized template
# cluster, where pair enumeration is itself quadratic and the LSH/cluster
# path is the right tool. 4000 bounds the worst term's join fan-out at
# max_df² = 16M rows however many docs the block holds, while staying a
# no-op on the fixture (max term df = 3923 at sf0.1 — the synthetic corpus
# is template-heavy, so its qualifying pairs lean on those hot terms and a
# binding cap would change real output; the patch path is exercised by
# tests/test_round7_ops.py with a lowered cap instead).
TFIDF_MAX_DF = 4000

_TFIDF_PAIRS_ORACLE = f"""
WITH tc AS (
  SELECT doc_id, source, tok AS term, CAST(count(*) AS DOUBLE) AS tf
  FROM (SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
        FROM documents)
  GROUP BY doc_id, source, tok
),
dfreq AS (SELECT term, count(*) AS df FROM tc GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
w AS (
  SELECT tc.doc_id, tc.source, tc.term,
         tc.tf * ln(CAST((SELECT n_docs FROM n) AS DOUBLE) / df) AS w
  FROM tc JOIN dfreq USING (term)
  -- corpus-universal terms weigh exactly tf*ln(1) = 0: pruning them is
  -- exactness-preserving (mirrors the engine's df < n_docs prune)
  WHERE df < (SELECT n_docs FROM n)
),
norms AS (
  SELECT doc_id, sqrt(CAST(sum(CAST(w * w AS DECIMAL(32, 18))) AS DOUBLE))
           AS nrm
  FROM w GROUP BY doc_id
),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(sum(CAST(a.w * b.w AS DECIMAL(32, 18))) AS DOUBLE) AS dot
  FROM w a JOIN w b
    ON a.term = b.term AND a.source = b.source AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       -- nullif: a doc built entirely of corpus-universal terms has
       -- TF-IDF norm exactly 0 (tf*ln(1)); its pairs must drop as NULL,
       -- not DIVIDE_BY_ZERO (NULL >= threshold filters false)
       round(dot / nullif(na.nrm * nb.nrm, 0), 6) AS cosine_sim
FROM dots
JOIN norms na ON na.doc_id = doc_a
JOIN norms nb ON nb.doc_id = doc_b
WHERE round(dot / nullif(na.nrm * nb.nrm, 0), 6) >= {TFIDF_COSINE_THRESHOLD}
"""


@_register("tfidf_cosine_pairs", _TFIDF_PAIRS_ORACLE)
def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact sparse TF-IDF cosine pairs, blocked on ``source`` — the
    sparse-vector sibling of dedup_embedding_cosine_pairs: candidate
    pairs come from an inverted term index joined WITHIN a blocking key,
    so every task's pair count is bounded by block size (the
    string_similarity_join_brand pattern); cross-block near-dups are the
    LSH family's job. Dot products and squared norms accumulate in
    DECIMAL(32,18), so the sparse sums are exact under ANY reduction
    order — the float-sum-order trap that would otherwise make a
    cross-engine (or cross-partitioning) hash impossible. IDF uses the
    same ln(N/df) expression on both engines (bit-identical, as BM25
    already pins).

    Registered form is the LOSSLESS kernel (``max_df=None``), matching
    the ``count_verified_pairs`` convention: oracle parity must not
    depend on the fixture's term-frequency profile (the capped kernel
    agrees with the uncapped oracle only while no term's df exceeds
    TFIDF_MAX_DF — 2% headroom at sf0.1). Pipeline/scale callers keep
    the default-capped kernel below: corpus-universal terms are pruned
    before the index is even staged (weight exactly 0 — contributes
    nothing to any norm or dot product), the pair join runs only over
    terms with df <= TFIDF_MAX_DF, and hotter terms patch their exact
    products into the discovered candidates via a pair-keyed join whose
    fan-out is bounded by hot-terms-per-doc, never df². Contributions
    accumulate in DECIMAL throughout, so the split sum equals the
    oracle's single all-terms sum exactly."""
    return tfidf_cosine_pairs(
        catalog.load_table(spark, sf_dir, "documents"), max_df=None
    )


def tfidf_cosine_pairs(
    d: DataFrame,
    max_df: int | None = TFIDF_MAX_DF,
    threshold: float = TFIDF_COSINE_THRESHOLD,
) -> DataFrame:
    """The parameterized kernel behind ``tfidf_cosine_pairs`` — see the
    registered query's docstring for semantics and the skew guard;
    ``max_df=None`` runs the fully lossless pair join (verification
    corpora only, like ``count_verified_pairs(max_df=None)``)."""
    dec = "decimal(32,18)"
    tc = (
        d.select(
            "doc_id", "source", F.explode(F.split("text", " ")).alias("term")
        )
        .groupBy("doc_id", "source", "term")
        .agg(F.count(F.lit(1)).cast("double").alias("tf"))
    )
    dfreq = tc.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = d.agg(F.count(F.lit(1)).alias("n_docs"))
    w = session.stage(
        tc.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        # zero-weight prune: df == n_docs ⇒ w = tf·ln(1) = 0 exactly
        .where(F.col("df") < F.col("n_docs"))
        .select(
            "doc_id",
            "source",
            "term",
            "df",
            (
                F.col("tf")
                * F.log(F.col("n_docs").cast("double") / F.col("df"))
            ).alias("w"),
        )
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(
            F.sum((F.col("w") * F.col("w")).cast(dec)).cast(
                "double"
            )
        ).alias("nrm")
    )
    # candidate generation over rare terms only — filtered AFTER stage()
    # so both branches scan the cached df column
    cap = F.lit(max_df) if max_df is not None else F.col("df")
    rare = w.where(F.col("df") <= cap)
    hot = w.where(F.col("df") > cap)
    a = rare.select(
        F.col("doc_id").alias("doc_a"), "source", "term",
        F.col("w").alias("wa"),
    )
    b = rare.select(
        F.col("doc_id").alias("doc_b"), "source", "term",
        F.col("w").alias("wb"),
    )
    # staged: consumed twice (union input + the hot patch's candidate
    # list) — without this the pair join would execute twice
    rare_dots = session.stage(
        a.join(b, ["term", "source"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.sum((F.col("wa") * F.col("wb")).cast(dec)).alias("contrib"))
    )
    # exact hot patch: the few >max_df terms join against the discovered
    # pairs only, keyed on doc id (fan-out = hot-terms-per-doc, never df²)
    ha = hot.select(
        F.col("doc_id").alias("doc_a"), "term", F.col("w").alias("wa")
    )
    hb = hot.select(
        F.col("doc_id").alias("doc_b"), "term", F.col("w").alias("wb")
    )
    hot_contribs = (
        rare_dots.select("doc_a", "doc_b")
        .join(ha, "doc_a")
        .join(hb, ["doc_b", "term"])
        .select(
            "doc_a",
            "doc_b",
            (F.col("wa") * F.col("wb")).cast(dec).alias("contrib"),
        )
    )
    # one final DECIMAL re-sum over both contribution streams: decimal
    # addition is exact, so this equals the oracle's single sum
    dots = (
        rare_dots.select(
            "doc_a", "doc_b", F.col("contrib").cast(dec).alias("contrib")
        )
        .unionByName(hot_contribs)
        .groupBy("doc_a", "doc_b")
        .agg(F.sum("contrib").cast("double").alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("doc_a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("doc_b"), F.col("nrm").alias("nb"))
    # try_divide: a zero-norm doc (all terms corpus-universal, weights
    # tf*ln(1) = 0) yields NULL cosine → the pair drops at the threshold
    # filter instead of killing the query under ANSI
    cos = F.round(F.try_divide(F.col("dot"), F.col("na") * F.col("nb")), 6)
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .where(cos >= threshold)
        .select("doc_a", "doc_b", cos.alias("cosine_sim"))
    )
