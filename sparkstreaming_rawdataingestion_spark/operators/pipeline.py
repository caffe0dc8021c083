"""End-to-end training-data curation pipeline over ``documents`` — the
flagship composition of the north-star operators (BASELINE.json): language
ID → quality filter → exact dedup → near-dup removal, as ONE declarative
DataFrame expression with a full DuckDB oracle.

This is the query shape an LLM-pretraining data pipeline actually runs at
100 TB, and the composition matters: every stage is built-in column
algebra (no Python UDFs), so Catalyst fuses the langid + quality maps into
one codegen stage over the scan, the exact-dedup window shuffles 32-byte
keys once, and only the (tiny) post-filter survivor set pays the near-dup
pair join. Filtering *before* dedup is the right order at scale — each
stage shrinks the data the next (more expensive) stage touches.

Stage semantics (deterministic, engine-portable):
1. langid   — marker-token heuristic (operators/text.py), keep 'en'.
2. quality  — Gopher/C4-style weighted score (operators/text.py), keep
              rounded score ≥ 0.85 (≈ median of the fixture corpus).
3. exact    — keep min doc_id per identical text (window, not groupBy, so
              the surviving row keeps its per-doc stage columns).
4. near-dup — 3-gram Jaccard ≥ 0.8 via the lossless inverted shingle
              index (operators/dedup.py); greedy keep-lowest-doc_id: a doc
              is dropped iff it is the higher id of any qualifying pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

from .. import catalog, session
from ..session import stage
from .dedup import JACCARD_THRESHOLD, SHINGLE_N, _shingles, count_verified_pairs
from .text import LANG_MARKERS, STOPWORDS, _sql_list

QUERIES: dict = {}
ORACLES: dict = {}

QUALITY_MIN = 0.85


def _register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Shared stage expressions (Spark side) — mirror operators/text.py exactly.
# ---------------------------------------------------------------------------


def _predicted_lang(toks: Column) -> Column:
    s = {
        lang: F.size(F.filter(toks, lambda t: t.isin(LANG_MARKERS[lang])))
        for lang in ("en", "de", "es")
    }
    return (
        F.when((s["en"] == 0) & (s["de"] == 0) & (s["es"] == 0), "und")
        .when((s["en"] >= s["de"]) & (s["en"] >= s["es"]), "en")
        .when(s["de"] >= s["es"], "de")
        .otherwise("es")
    )


def _quality(toks: Column) -> Column:
    n_tokens = F.size(toks)
    stop_ratio = (
        F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))) * F.lit(1.0) / n_tokens
    )
    uniq_ratio = F.size(F.array_distinct(toks)) * F.lit(1.0) / n_tokens
    punct_ratio = (
        F.length(F.regexp_replace(F.col("text"), "[a-zA-Z0-9 ]", ""))
        * F.lit(1.0)
        / F.length("text")
    )
    return F.round(
        F.lit(0.25) * F.when((n_tokens >= 20) & (n_tokens <= 1000), 1.0).otherwise(0.0)
        + F.lit(0.25) * F.when(stop_ratio >= 0.01, 1.0).otherwise(0.0)
        + F.lit(0.25) * uniq_ratio
        + F.lit(0.25) * (F.lit(1.0) - punct_ratio),
        6,
    )


def score_documents(d: DataFrame) -> DataFrame:
    """Stage-1+2 annotations for any documents-shaped DataFrame (batch or
    micro-batch): predicted language + quality score."""
    toks = F.split(F.col("text"), " ")
    return d.select(
        "doc_id",
        "text",
        _predicted_lang(toks).alias("predicted_lang"),
        _quality(toks).alias("quality_score"),
    )


def _scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread (round-14 A/B): the curation chain consumes the scored
    # frame from several stages, so a spread repartition here multiplies
    # exchanges instead of parallelizing one heavy map — measured SLOWER
    # interleaved at sf0.1 (curation 4.0 s → 4.7 s, training build
    # 5.6 s → 8.0 s); the chain's own sha2 window exchange already
    # redistributes before the expensive near-dup stages.
    return score_documents(catalog.load_table(spark, sf_dir, "documents"))


def _exact_kept(qual_kept: DataFrame) -> DataFrame:
    """Exact-dedup keeper selection, windowed over sha2(text) rather than
    the raw text: rows still carry the text forward, but the PARTITIONER
    hashes a fixed 64-hex-char digest instead of arbitrary-length bodies,
    keeping shuffle-key work bounded and skew-resistant at 100 TB.
    (Digest equality == text equality for dedup purposes; SHA-256
    collisions are below hardware-error rates — same contract as
    dedup_exact_hash, dedup.py.)"""
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    # One Window pass, not two: row_number and the copy count share the
    # same (partition, order) spec — the count pins an explicit
    # unbounded frame (identical value to the unordered count) so both
    # expressions land in a single Window operator (round 14, guide
    # §1.2: two passes over the same exchange merged into one).
    return (
        qual_kept.withColumn("rn", F.row_number().over(w))
        .withColumn(
            "n_copies",
            F.count("*").over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


def _near_dropped(exact_kept: DataFrame) -> DataFrame:
    """doc_ids that lose the greedy near-dup resolution (higher id of any
    Jaccard ≥ threshold pair), via the lossless inverted shingle index
    with count-based verification (dedup.count_verified_pairs — shuffles
    (id, id, int) triples, never the shingle arrays)."""
    sets = stage(exact_kept.select("doc_id", _shingles().alias("shingles")))
    return (
        count_verified_pairs(sets)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )


def _stages(
    spark: SparkSession, sf_dir: str, classifier_gate: bool = False
) -> dict[str, DataFrame]:
    """``classifier_gate=True`` inserts the model-based quality stage
    (text.quality_classifier_score keep flag, a left-semi join on
    doc_id) between the heuristic quality filter and exact dedup — the
    production ordering: cheap heuristics first, the classifier on the
    reduced set, dedup on what the model keeps."""
    scored = _scored(spark, sf_dir)
    lang_kept = scored.where(F.col("predicted_lang") == "en")
    qual_kept = lang_kept.where(F.col("quality_score") >= QUALITY_MIN)
    stages = {
        "total": scored,
        "lang_en": lang_kept,
        "quality": qual_kept,
    }
    if classifier_gate:
        from .text import quality_classifier_score

        # score the heuristic SURVIVORS, not a fresh full-corpus scan:
        # the keep flag is per-doc independent, so the semi-join result
        # is identical, and the stage ordering's whole point is that
        # model inference (feature hashing + the weight join) runs on
        # the reduced set
        keep_ids = (
            quality_classifier_score(qual_kept.select("doc_id", "text"))
            .where(F.col("keep"))
            .select("doc_id")
        )
        qual_kept = qual_kept.join(keep_ids, "doc_id", "left_semi")
        stages["classifier"] = qual_kept
    # NOT staged (round-14 A/B): exact_kept feeds both the near-dup
    # shingle sets and the final anti-join, so the sha2 window chain
    # executes twice per query — but persisting it means caching the
    # full text bodies, which measured SLOWER interleaved at sf0.1
    # (curation 8.3 s → 11.1 s median) and at scale trades a cheap
    # keyed recompute for corpus-sized cache I/O. Recompute wins.
    # Round-15 rejection (measured): the chain-once variant — stage ONE
    # text-free keeper frame (doc_id, lang, score, n_copies, shingles)
    # serving as both the near-dup index input and the anti-join left —
    # removed the second chain run (curation plan: 38 → 27 Window
    # reprints) but interleaved A/B read training_build 3.75 → 4.78 s
    # med (6/6 pairs slower; AQE query stages 74 → 124 — every consumer
    # of the fat cache plans behind extra stage boundaries) and
    # curation flat (4.83 vs 4.88). The recompute form stands.
    exact_kept = _exact_kept(qual_kept)
    final = exact_kept.join(_near_dropped(exact_kept), "doc_id", "left_anti")
    stages["exact_dedup"] = exact_kept
    stages["near_dedup"] = final
    return stages


# ---------------------------------------------------------------------------
# Shared oracle CTE chain (DuckDB) — stage-for-stage mirror of the above.
# ---------------------------------------------------------------------------

_ORACLE_STAGES = f"""
WITH tokd AS (
  SELECT doc_id, text, string_split(text, ' ') AS toks FROM documents),
scored AS (
  SELECT doc_id, text, toks,
         CASE WHEN s_en = 0 AND s_de = 0 AND s_es = 0 THEN 'und'
              WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
              WHEN s_de >= s_es THEN 'de' ELSE 'es' END AS predicted_lang,
         round(0.25 * CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1.0 ELSE 0.0 END
             + 0.25 * CASE WHEN stop_ratio >= 0.01 THEN 1.0 ELSE 0.0 END
             + 0.25 * uniq_ratio
             + 0.25 * (1.0 - punct_ratio), 6) AS quality_score
  FROM (
    SELECT doc_id, text, toks,
           len(list_filter(toks, t -> t IN ({_sql_list(LANG_MARKERS["en"])}))) AS s_en,
           len(list_filter(toks, t -> t IN ({_sql_list(LANG_MARKERS["de"])}))) AS s_de,
           len(list_filter(toks, t -> t IN ({_sql_list(LANG_MARKERS["es"])}))) AS s_es,
           CAST(len(toks) AS INTEGER) AS n_tokens,
           len(list_filter(toks, t -> t IN ({_sql_list(STOPWORDS)}))) * 1.0
             / len(toks)                                       AS stop_ratio,
           len(list_distinct(toks)) * 1.0 / len(toks)          AS uniq_ratio,
           length(regexp_replace(text, '[a-zA-Z0-9 ]', '', 'g')) * 1.0
             / length(text)                                    AS punct_ratio
    FROM tokd)),
lang_kept AS (SELECT * FROM scored WHERE predicted_lang = 'en'),
qual_kept AS (SELECT * FROM lang_kept WHERE quality_score >= {QUALITY_MIN}),
exact_kept AS (
  SELECT doc_id, text, toks, predicted_lang, quality_score, n_copies FROM (
    SELECT *,
           row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn,
           CAST(count(*) OVER (PARTITION BY text) AS BIGINT)     AS n_copies
    FROM qual_kept) WHERE rn = 1),
sh AS (
  SELECT doc_id,
         list_distinct([array_to_string(toks[i:i+{SHINGLE_N - 1}], ' ')
                        FOR i IN range(1, len(toks) - {SHINGLE_N - 2})]) AS shingles
  FROM exact_kept),
psizes AS (SELECT doc_id, len(shingles) AS n FROM sh),
pinv AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
pshared AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM pinv a JOIN pinv b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
near_dropped AS (
  -- inverted-index algebra (|A∪B| = |A|+|B|−|A∩B|): identical result to
  -- the all-pairs list_intersect form, minus its O(n²) cost
  SELECT DISTINCT doc_b AS doc_id
  FROM pshared
  JOIN psizes sa ON sa.doc_id = doc_a
  JOIN psizes sb ON sb.doc_id = doc_b
  WHERE shared * 1.0 / (sa.n + sb.n - shared) >= {JACCARD_THRESHOLD}),
final AS (
  SELECT * FROM exact_kept
  WHERE doc_id NOT IN (SELECT doc_id FROM near_dropped))
"""


@_register(
    "pipeline_curation",
    _ORACLE_STAGES
    + """
SELECT doc_id, predicted_lang, quality_score, n_copies FROM final
""",
)
def q_pipeline_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curated output set: every document that survives all four
    stages, with its language, quality score, and exact-copy count."""
    final = _stages(spark, sf_dir)["near_dedup"]
    return final.select("doc_id", "predicted_lang", "quality_score", "n_copies")


@_register(
    "pipeline_curation_funnel",
    _ORACLE_STAGES
    + """
SELECT 1 AS stage_no, 'total'       AS stage, (SELECT CAST(count(*) AS BIGINT) FROM scored)     AS n_docs
UNION ALL
SELECT 2, 'lang_en',     (SELECT CAST(count(*) AS BIGINT) FROM lang_kept)
UNION ALL
SELECT 3, 'quality',     (SELECT CAST(count(*) AS BIGINT) FROM qual_kept)
UNION ALL
SELECT 4, 'exact_dedup', (SELECT CAST(count(*) AS BIGINT) FROM exact_kept)
UNION ALL
SELECT 5, 'near_dedup',  (SELECT CAST(count(*) AS BIGINT) FROM final)
""",
)
def q_pipeline_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage retention funnel — the monitoring view a curation job
    emits. Expressed as a union of aggregates (one Spark job, no
    driver-side counting loop)."""
    stages = _stages(spark, sf_dir)
    parts = [
        df.agg(
            F.lit(i + 1).alias("stage_no"),
            F.lit(name).alias("stage"),
            F.count("*").alias("n_docs"),
        )
        for i, (name, df) in enumerate(stages.items())
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# pipeline_curation_classified — curation with the model-based quality gate
# ---------------------------------------------------------------------------

# The classified chain = the standard chain with a classifier CTE spliced
# between qual_kept and exact_dedup (same stage order as the Spark side).
# Built by substitution on the shared template so the two chains can
# never drift stage-for-stage.
_CLF_CTES = """,
clf AS (SELECT doc_id FROM ({clf_sql}) WHERE keep),
clf_kept AS (
  SELECT * FROM qual_kept WHERE doc_id IN (SELECT doc_id FROM clf))"""


def _classified_stages_sql() -> str:
    from .text import _QUALITY_ORACLE

    qual_cte = f"qual_kept AS (SELECT * FROM lang_kept WHERE quality_score >= {QUALITY_MIN})"
    # explicit raise, not assert: under ``python -O`` an assert is
    # stripped and a drifted _ORACLE_STAGES template would silently
    # yield an oracle missing the classifier stage (replace() no-ops)
    if qual_cte not in _ORACLE_STAGES or (
        "FROM qual_kept) WHERE rn = 1)" not in _ORACLE_STAGES
    ):
        raise RuntimeError(
            "_ORACLE_STAGES drifted: classifier-splice anchors missing"
        )
    return _ORACLE_STAGES.replace(
        qual_cte, qual_cte + _CLF_CTES.format(clf_sql=_QUALITY_ORACLE)
    ).replace("FROM qual_kept) WHERE rn = 1)", "FROM clf_kept) WHERE rn = 1)")


@_register(
    "pipeline_curation_classified",
    _classified_stages_sql()
    + """
SELECT doc_id, predicted_lang, quality_score, n_copies FROM final
""",
)
def q_pipeline_curation_classified(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The curation pipeline with the model-based quality stage wired in
    (VERDICT r7 item 4): heuristic filters first, then the broadcast-
    weight classifier's keep flag (text.quality_classifier_score) as a
    left-semi join on doc_id, then both dedup stages on the reduced
    set — the production ordering (cheap rules prune before the model
    runs; the model prunes before the expensive pair joins)."""
    final = _stages(spark, sf_dir, classifier_gate=True)["near_dedup"]
    return final.select(
        "doc_id", "predicted_lang", "quality_score", "n_copies"
    )


# ---------------------------------------------------------------------------
# pipeline_training_build — curation → mix → shuffle: the training manifest
# ---------------------------------------------------------------------------

_BUILD_TARGET = 150     # documents the mix rates aim for
_BUILD_BUCKETS = 8      # trainer-reader parallelism

_BUILD_ORACLE_TAIL = f"""
, manifest_src AS (
  SELECT f.doc_id, d.source
  FROM final f JOIN documents d USING (doc_id)),
mn AS (SELECT source, count(*) AS n_s FROM manifest_src GROUP BY source),
mw AS (
  SELECT source, n_s,
         CAST(round(sqrt(CAST(n_s AS DOUBLE)), 9) AS DOUBLE)        AS w_l,
         CAST(round(sqrt(CAST(n_s AS DOUBLE)), 9) AS DECIMAL(18,9)) AS w_dec
  FROM mn),
mr AS (
  SELECT source, n_s,
         least(1.0e0,
               (({_BUILD_TARGET}.0e0 * w_l)
                / CAST((SELECT sum(w_dec) FROM mw) AS DOUBLE)) / n_s) AS rate
  FROM mw),
kept AS (
  SELECT ms.doc_id, ms.source
  FROM manifest_src ms JOIN mr ON mr.source = ms.source
  WHERE ((((ms.doc_id % 4294967296) * 1540483477 % 4294967296) + 0.5e0)
         / 4294967296.0e0) < mr.rate),
sh2 AS (
  SELECT doc_id, source,
         (((doc_id % 4294967296) * 1540483477 % 4294967296)
          * 1540483477 % 4294967296) AS h
  FROM kept)
SELECT doc_id, source,
       CAST(h % {_BUILD_BUCKETS} AS BIGINT) AS bucket,
       CAST(row_number() OVER (PARTITION BY h % {_BUILD_BUCKETS}
                               ORDER BY h, doc_id) AS BIGINT) AS pos
FROM sh2
"""


@_register("pipeline_training_build", _ORACLE_STAGES + _BUILD_ORACLE_TAIL)
def q_pipeline_training_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw documents → shuffled training manifest, ONE declarative query:
    the four curation stages above, then temperature-scaled source
    rebalancing (mining.temperature_mix_sample's algebra, rates computed
    from the SURVIVORS — curation changes the domain balance, so mixing
    must run after it), then the deterministic epoch-shuffle layout
    (mining.training_shuffle_order's hash, epoch 0) emitting the
    (bucket, pos) manifest a trainer consumes.

    This is the full dataset-build a pretraining pipeline runs nightly,
    and the stage ORDER is load-bearing at 100 TB: filters shrink what
    dedup shuffles, dedup shrinks what mixing counts, and only the final
    kept set pays the shuffle-rank sort — each stage's output is the
    next stage's (smaller) input. Every stage is built-in column algebra
    riding the plans already pinned for its standalone operator."""
    final = _stages(spark, sf_dir)["near_dedup"].select("doc_id")
    return _build_manifest(spark, sf_dir, final)


def _build_manifest(
    spark: SparkSession, sf_dir: str, final: DataFrame
) -> DataFrame:
    """Mix + shuffle tail shared by both training builds: temperature-
    scaled source rebalancing over the survivor set, then the
    deterministic epoch-shuffle (bucket, pos) manifest."""
    from .mining import _MMH2

    src = catalog.load_table(spark, sf_dir, "documents").select(
        "doc_id", "source"
    )
    # Staged: the curation survivors feed BOTH the per-source count agg
    # (which fixes the mix rates) and the rate join below — without the
    # materialization point the whole curation + near-dedup plan (the
    # expensive part of this build) executes twice.
    cur = stage(final.join(src, "doc_id"))
    n = cur.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    w_l = F.round(F.sqrt(F.col("n_s").cast("double")), 9)
    w = n.select(
        "source", "n_s", w_l.alias("w_l"),
        w_l.cast("decimal(18,9)").alias("w_dec"),
    )
    sumw = w.agg(F.sum("w_dec").cast("double").alias("sum_w"))
    rates = w.crossJoin(F.broadcast(sumw)).select(
        "source",
        F.least(
            F.lit(1.0),
            (F.lit(float(_BUILD_TARGET)) * F.col("w_l") / F.col("sum_w"))
            / F.col("n_s"),
        ).alias("rate"),
    )
    u = (
        (
            (F.col("doc_id") % F.lit(4294967296))
            * F.lit(_MMH2)
            % F.lit(4294967296)
        )
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    kept = cur.join(F.broadcast(rates), "source").where(u < F.col("rate"))
    h = (
        (F.col("doc_id") % F.lit(4294967296))
        * F.lit(_MMH2)
        % F.lit(4294967296)
        * F.lit(_MMH2)
        % F.lit(4294967296)
    )
    sh = kept.select("doc_id", "source", h.alias("h"))
    wpos = Window.partitionBy(F.col("h") % _BUILD_BUCKETS).orderBy(
        "h", "doc_id"
    )
    return sh.select(
        "doc_id",
        "source",
        (F.col("h") % _BUILD_BUCKETS).alias("bucket"),
        F.row_number().over(wpos).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# pipeline_training_build_semantic — + the SemDeDup prune as a stage
# ---------------------------------------------------------------------------


def _semantic_build_oracle() -> str:
    """The training-build oracle with the SemDeDup prune spliced in as
    a stage between near-dedup and the mix tail — the
    _classified_stages_sql anchor discipline (explicit raise on drift,
    never a silent no-op replace). Three splices:

    1. the survivor restriction: _SEMDEDUP_ORACLE's ``v`` CTE gains
       ``WHERE vec_id IN (SELECT doc_id FROM final)`` (centroid seeds
       stay the full-table model parameters — restricting must not
       move the cluster geometry);
    2. the spliced pair SQL + the SHARED components_ctes reachability
       kernel + the prune (drop every non-component-min survivor)
       appended after ``final``;
    3. the build tail re-anchored from ``final`` to ``sem_final``, and
       the chain promoted to WITH RECURSIVE for ``reach``."""
    from .dedup import _SEMDEDUP_ORACLE, components_ctes

    v_cte = "v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings)"
    head_anchor = "WITH tokd AS ("
    tail_anchor = "FROM final f JOIN documents d USING (doc_id))"
    if (
        v_cte not in _SEMDEDUP_ORACLE
        or head_anchor not in _ORACLE_STAGES
        or tail_anchor not in _BUILD_ORACLE_TAIL
    ):
        raise RuntimeError(
            "semantic-build splice anchors missing: an upstream oracle "
            "template drifted"
        )
    pairs_sql = _SEMDEDUP_ORACLE.replace(
        v_cte,
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS ve FROM embeddings"
        "\n     WHERE vec_id IN (SELECT doc_id FROM final))",
    )
    sem_stage = f"""
, pairs AS ({pairs_sql}),
{components_ctes("vec_a", "vec_b")},
sem_dropped AS (
  SELECT node AS doc_id FROM reach GROUP BY node HAVING min(dest) <> node),
sem_final AS (
  SELECT * FROM final
  WHERE doc_id NOT IN (SELECT doc_id FROM sem_dropped))
"""
    return (
        _ORACLE_STAGES.replace(head_anchor, "WITH RECURSIVE tokd AS (", 1)
        + sem_stage
        + _BUILD_ORACLE_TAIL.replace(
            tail_anchor,
            "FROM sem_final f JOIN documents d USING (doc_id))",
        )
    )


@_register("pipeline_training_build_semantic", _semantic_build_oracle())
def q_pipeline_training_build_semantic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The training build with SemDeDup as a fifth curation stage
    (Abbas et al. 2023 report semantic dedup ON TOP of exact/near-dup
    removal improves downstream efficiency): heuristics → exact dedup
    → near-dup removal → SEMANTIC prune → mix → shuffle. The semantic
    stage embeds the SURVIVORS (vec_id = doc_id, the retrieval.py
    convention), keeps the centroid seeds as full-table model
    parameters, finds within-cluster cosine pairs among survivors only
    (dedup.semantic_cluster_pairs with restrict_to — the standalone
    kernel, parameterized, not a copy), collapses them by the shared
    connected-components kernel, and drops every non-component-min
    survivor — so every semantic family present in the survivor set
    keeps exactly one member, even when the corpus-global canonical
    died in an earlier stage.

    Stage-order economics at 100 TB, extended: the embedding
    assignment (broadcast K centroids, map-side) runs only on curation
    survivors; the cosine pair join is cluster-bounded over that
    reduced set; the component loop touches the pair graph only. The
    mix tail then counts the semantically-pruned set — rates move when
    semantic families collapse, which is the point of ordering mixing
    last."""
    from .dedup import connected_components, semantic_cluster_pairs

    # staged: the survivor set feeds the embedding semi-join, the prune
    # anti-join AND the manifest join
    final = stage(_stages(spark, sf_dir)["near_dedup"].select("doc_id"))
    emb = catalog.load_table(spark, sf_dir, "embeddings")
    pairs = semantic_cluster_pairs(
        emb,
        restrict_to=final.select(F.col("doc_id").alias("vec_id")),
    ).select(F.col("vec_a").alias("doc_a"), F.col("vec_b").alias("doc_b"))
    sem_dropped = (
        connected_components(pairs)
        .where(F.col("label") != F.col("node"))
        .select(F.col("node").alias("doc_id"))
        # LOGICAL-PLAN TRUNCATION, deliberate (and measured): the CC
        # loop's label lineage references its own prior iterations and
        # the pair subtree multiple times per level, so composing the
        # raw frame into the multi-reference mix tail compounds the
        # logical TREE (not the runtime — every subtree is staged)
        # into thousands of cache-scan references: ~37 s of physical
        # planning + ~109 s of per-reference scheduling per action at
        # sf0.01. localCheckpoint collapses the drop list (bare ids, a
        # fraction of the survivor set) to a plan leaf — the same
        # trade GraphX/MLlib make for iterative lineage, accepted HERE
        # ONLY because persist cannot shrink the logical tree; the
        # session-wide staging rule (session.py) still prefers persist
        # everywhere composition stays linear.
        .localCheckpoint()
    )
    sem_final = final.join(sem_dropped, "doc_id", "left_anti")
    return _build_manifest(spark, sf_dir, sem_final)


# ---------------------------------------------------------------------------
# mixture_reweight_plan — per-source sampling rates toward a target mix
# ---------------------------------------------------------------------------

_MIXTURE_ORACLE = """
WITH per_source AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (
  SELECT sum(n_tokens) AS total_tokens,
         count(*)      AS n_sources
  FROM per_source
)
SELECT source, n_docs, n_tokens,
       round(n_tokens / CAST(total_tokens AS DOUBLE), 6) AS actual_share,
       round(1.0 / n_sources, 6)                         AS target_share,
       round(least(1.0, (total_tokens / CAST(n_sources AS DOUBLE))
                        / n_tokens), 6)                  AS sample_rate,
       round((total_tokens / CAST(n_sources AS DOUBLE)) / n_tokens, 6)
                                                         AS epochs
FROM per_source, tot
"""


@_register("mixture_reweight_plan", _MIXTURE_ORACLE)
def q_mixture_reweight_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture planning: given the observed per-source token counts and
    a target mix (uniform here), emit each source's sampling rate
    (downsample overrepresented sources) and epoch factor (repeat
    underrepresented ones > 1x) — the table a corpus-assembly run feeds
    into weighted sampling. The token census is ONE grouped aggregation
    (map-side combine on source); everything after operates on the
    sources-sized model table against a broadcast 1-row total."""
    d = catalog.load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens"),
    )
    tot = per_source.agg(
        F.sum("n_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    target_tokens = F.col("total_tokens") / F.col("n_sources").cast("double")
    return per_source.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "n_tokens",
        F.round(
            F.col("n_tokens") / F.col("total_tokens").cast("double"), 6
        ).alias("actual_share"),
        F.round(F.lit(1.0) / F.col("n_sources"), 6).alias("target_share"),
        F.round(
            F.least(F.lit(1.0), target_tokens / F.col("n_tokens")), 6
        ).alias("sample_rate"),
        F.round(target_tokens / F.col("n_tokens"), 6).alias("epochs"),
    )


# ---------------------------------------------------------------------------
# temperature_mixture_weights — exponential-smoothing corpus mix (T = 2)
# ---------------------------------------------------------------------------

# Temperature-based sampling (Lample & Conneau 2019 / XLM; mT5 uses the
# same q_i ∝ p_i^(1/T) rule): smooth the empirical source shares toward
# uniform with exponent 1/T, so low-resource sources are upsampled without
# flattening the mix entirely. T = 2 ⇒ exponent 0.5, computed as sqrt()
# on BOTH engines — sqrt is IEEE-correctly-rounded where pow(x, 0.5) has
# no such guarantee, which keeps the oracle hash bit-stable (other T
# values would use pow and a looser comparison).
MIX_TEMPERATURE = 2.0

_TEMP_MIX_ORACLE = """
WITH per_source AS (
  SELECT source,
         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
),
tot AS (SELECT sum(n_tokens) AS total_tokens FROM per_source),
smoothed AS (
  SELECT source, n_tokens,
         n_tokens / CAST(total_tokens AS DOUBLE) AS share,
         sqrt(n_tokens / CAST(total_tokens AS DOUBLE)) AS q
  FROM per_source, tot
),
z AS (SELECT CAST(sum(CAST(q AS DECIMAL(32, 18))) AS DOUBLE) AS zq
     FROM smoothed)
SELECT source, n_tokens,
       round(share, 6)                            AS share,
       round(q / zq, 6)                           AS temp_weight,
       round((q / zq) / share, 6)                 AS epochs
FROM smoothed, z
"""


@_register("temperature_mixture_weights", _TEMP_MIX_ORACLE)
def q_temperature_mixture_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Temperature-smoothed sampling weights per source (T = 2): weight
    ∝ share^(1/T), renormalized; ``epochs`` = weight/share is the repeat
    factor the assembly run applies to each source. Complements
    mining.temperature_mix_sample (the ROW-level doc sampler at n_docs^τ
    per lang) and mixture_reweight_plan (uniform target): this is the
    token-budget PLAN table for the smoothed mix. One grouped token
    census (map-side combine on source), then everything runs on the
    sources-sized model table against two broadcast 1-row totals — the
    corpus is scanned exactly once regardless of size."""
    d = catalog.load_table(spark, sf_dir, "documents")
    per_source = d.groupBy("source").agg(
        F.sum(F.size(F.split("text", " "))).cast("long").alias("n_tokens")
    )
    tot = per_source.agg(F.sum("n_tokens").alias("total_tokens"))
    smoothed = session.stage(
        per_source.crossJoin(F.broadcast(tot)).select(
            "source",
            "n_tokens",
            F.try_divide(
                F.col("n_tokens"), F.col("total_tokens").cast("double")
            ).alias("share"),
            F.sqrt(
                F.try_divide(
                    F.col("n_tokens"), F.col("total_tokens").cast("double")
                )
            ).alias("q"),
        )
    )
    # DECIMAL accumulation: the normalizer is the one cross-row sum in
    # this kernel — double addition is order-dependent (partial-agg order
    # vs DuckDB scan order), and a q/zq on a 0.5e-6 boundary would flip
    # round(,6); DECIMAL(32,18) makes the sum reduction-order-exact
    z = smoothed.agg(
        F.sum(F.col("q").cast("decimal(32,18)")).cast("double").alias("zq")
    )
    return smoothed.crossJoin(F.broadcast(z)).select(
        "source",
        "n_tokens",
        F.round("share", 6).alias("share"),
        F.round(F.try_divide(F.col("q"), F.col("zq")), 6).alias(
            "temp_weight"
        ),
        F.round(
            F.try_divide(
                F.try_divide(F.col("q"), F.col("zq")), F.col("share")
            ),
            6,
        ).alias("epochs"),
    )
