"""Model-evaluation operators: confusion matrices, threshold metrics,
exact AUC, and score calibration — computed AS QUERIES over the lake.

An ML platform evaluates classifiers where the labels live: in the
warehouse, at full scale, not in a notebook sample. These operators make
the standard evaluation suite a set of declarative Spark queries with
exact DuckDB oracles. The running example scores events (``value`` as
the score, purchase as the positive class) and audits the language-ID
classifier against its stored labels; the shapes transfer to any
(score, label) pair.

Scale shape: every operator reduces facts to metric-sized output in one
or two grouped/windowed passes —

- **langid_confusion_matrix**: one grouped count over (truth, pred)
  (≤ |langs|² keys) + a truth-side total window.
- **classifier_eval_metrics**: one exact-percentile scalar (broadcast)
  + ONE conditional-sum aggregation for the whole confusion tableau.
- **ranking_auc_report**: exact Mann-Whitney AUC from ONE rank window
  (midranks resolve score ties) — no pairwise positive×negative join,
  which is the naive quadratic formulation.
- **score_calibration_bins**: 1-row min/max broadcast, map-side bin
  arithmetic, one (bin) aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import catalog, session

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
# langid_confusion_matrix — audit the language-ID classifier
# ---------------------------------------------------------------------------


def _langid_pred_sql() -> str:
    from .text import LANG_MARKERS, _sql_list

    return f"""
  SELECT doc_id, lang AS labeled_lang,
         CASE
           WHEN s_en = 0 AND s_de = 0 AND s_es = 0 THEN 'und'
           WHEN s_en >= s_de AND s_en >= s_es THEN 'en'
           WHEN s_de >= s_es THEN 'de'
           ELSE 'es'
         END AS predicted_lang
  FROM (
    SELECT doc_id, lang,
           len(list_filter(toks, t -> t IN ({_sql_list(LANG_MARKERS["en"])}))) AS s_en,
           len(list_filter(toks, t -> t IN ({_sql_list(LANG_MARKERS["de"])}))) AS s_de,
           len(list_filter(toks, t -> t IN ({_sql_list(LANG_MARKERS["es"])}))) AS s_es
    FROM (SELECT doc_id, lang, string_split(text, ' ') AS toks
          FROM documents))
"""


_CONFUSION_ORACLE_TEMPLATE = """
WITH pred AS ({pred}),
cm AS (
  SELECT labeled_lang, predicted_lang, count(*) AS n
  FROM pred GROUP BY 1, 2
)
SELECT labeled_lang, predicted_lang, CAST(n AS BIGINT) AS n,
       round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY labeled_lang) AS DOUBLE),
             6) AS share_of_truth
FROM cm
"""


@_register("langid_confusion_matrix")
def q_langid_confusion_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the marker-based language-ID against the
    stored labels: per (truth, prediction) count and its share of the
    truth class (the per-class recall diagonal). One grouped count over
    ≤ |langs|² keys + a truth-total window over that tiny matrix."""
    from .text import q_text_langid

    pred = q_text_langid(spark, sf_dir)
    cm = pred.groupBy("labeled_lang", "predicted_lang").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("labeled_lang")
    return cm.select(
        "labeled_lang",
        "predicted_lang",
        F.col("n").cast("long").alias("n"),
        F.round(
            F.col("n").cast("double") / F.sum("n").over(w).cast("double"), 6
        ).alias("share_of_truth"),
    )


ORACLES["langid_confusion_matrix"] = _CONFUSION_ORACLE_TEMPLATE.format(
    pred=_langid_pred_sql()
)


# ---------------------------------------------------------------------------
# classifier_eval_metrics — threshold metrics at the median score
# ---------------------------------------------------------------------------

_EVAL_ORACLE = """
WITH med AS (SELECT quantile_cont(value, 0.5) AS m FROM events),
scored AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         CASE WHEN value >= (SELECT m FROM med) THEN 1 ELSE 0 END AS yhat
  FROM events
),
c AS (
  SELECT sum(y * yhat)             AS tp,
         sum((1 - y) * yhat)       AS fp,
         sum(y * (1 - yhat))       AS fn,
         sum((1 - y) * (1 - yhat)) AS tn
  FROM scored
)
SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       CAST(fn AS BIGINT) AS fn, CAST(tn AS BIGINT) AS tn,
       round(CAST(tp AS DOUBLE) / nullif(tp + fp, 0), 6) AS precision_,
       round(CAST(tp AS DOUBLE) / nullif(tp + fn, 0), 6) AS recall_,
       round(2.0 * tp / nullif(2.0 * tp + fp + fn, 0), 6) AS f1,
       round(CAST(tp + tn AS DOUBLE) / nullif(tp + fp + fn + tn, 0), 6)
         AS accuracy
FROM c
"""


@_register("classifier_eval_metrics", _EVAL_ORACLE)
def q_classifier_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full threshold-classifier tableau in ONE conditional-sum
    aggregation (tp/fp/fn/tn as products of 0/1 indicators — no four
    separate filtered passes), thresholded at the exact median score
    (a 1-row broadcast scalar)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    med = ev.agg(F.percentile("value", F.lit(0.5)).alias("m"))
    scored = ev.crossJoin(F.broadcast(med)).select(
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
        F.when(F.col("value") >= F.col("m"), 1).otherwise(0).alias("yhat"),
    )
    c = scored.agg(
        F.sum(F.col("y") * F.col("yhat")).alias("tp"),
        F.sum((1 - F.col("y")) * F.col("yhat")).alias("fp"),
        F.sum(F.col("y") * (1 - F.col("yhat"))).alias("fn"),
        F.sum((1 - F.col("y")) * (1 - F.col("yhat"))).alias("tn"),
    )
    tp, fp, fn, tn = (F.col(c_) for c_ in ("tp", "fp", "fn", "tn"))
    return c.select(
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        fn.cast("long").alias("fn"),
        tn.cast("long").alias("tn"),
        # try_divide (NULL on zero, mirrored by nullif in the oracle):
        # under ANSI mode a degenerate slice — one class absent — must
        # yield NULL metrics, not DIVIDE_BY_ZERO
        F.round(F.try_divide(tp.cast("double"), tp + fp), 6)
        .alias("precision_"),
        F.round(F.try_divide(tp.cast("double"), tp + fn), 6)
        .alias("recall_"),
        F.round(F.try_divide(2.0 * tp, 2.0 * tp + fp + fn), 6).alias("f1"),
        F.round(
            F.try_divide((tp + tn).cast("double"), tp + fp + fn + tn), 6
        ).alias("accuracy"),
    )


# ---------------------------------------------------------------------------
# ranking_auc_report — exact AUC via midranks (Mann-Whitney)
# ---------------------------------------------------------------------------

_AUC_ORACLE = """
WITH scored AS (
  SELECT value AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
ranked AS (
  SELECT y,
         rank() OVER (ORDER BY s)
           + (count(*) OVER (PARTITION BY s) - 1) / 2.0e0 AS midrank
  FROM scored
),
agg AS (
  SELECT sum(CASE WHEN y = 1 THEN midrank END) AS rsum,
         sum(y)            AS np,
         sum(1 - y)        AS nn
  FROM ranked
)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       round((rsum - np * (np + 1) / 2.0e0)
             / nullif(np * CAST(nn AS DOUBLE), 0), 6)
         AS auc
FROM agg
"""


@_register("ranking_auc_report", _AUC_ORACLE)
def q_ranking_auc_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC from ONE rank window via the Mann-Whitney identity
    AUC = (Σ midranks₊ − n₊(n₊+1)/2)/(n₊·n₋), with midranks resolving
    score ties (rank() + (ties−1)/2) — the linear-scan formulation of
    what is naively a quadratic positive×negative comparison. Both
    engines rank the identical sorted multiset, so the result is
    engine-exact.

    The rank window is a GLOBAL sort of the score column — the honest
    cost of an exact AUC. At firehose scale run
    ``ranking_auc_histogram`` (below) instead — one grouped agg over
    ~4k bins, error O(1/bins), pinned against this exact kernel in
    tests/test_scale_twins.py."""
    ev = catalog.load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.col("value").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    midrank = (
        F.rank().over(Window.orderBy("s"))
        + (F.count(F.lit(1)).over(Window.partitionBy("s")) - 1) / 2.0
    )
    ranked = scored.select("y", midrank.alias("midrank"))
    agg = ranked.agg(
        F.sum(F.when(F.col("y") == 1, F.col("midrank"))).alias("rsum"),
        F.sum("y").alias("np"),
        F.sum(1 - F.col("y")).alias("nn"),
    )
    np_, nn = F.col("np"), F.col("nn")
    return agg.select(
        np_.cast("long").alias("n_pos"),
        nn.cast("long").alias("n_neg"),
        # try_divide: a one-class slice has no defined AUC → NULL
        # (mirrors the histogram twin's guard)
        F.round(
            F.try_divide(
                F.col("rsum") - np_ * (np_ + 1) / 2.0,
                np_ * nn.cast("double"),
            ),
            6,
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# ranking_auc_histogram — the 100 TB path for the same metric
# ---------------------------------------------------------------------------

AUC_BINS = 4096

_AUC_HIST_ORACLE = f"""
WITH scored AS (
  SELECT value AS s,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
bounds AS (SELECT min(s) AS lo, max(s) AS hi FROM scored),
binned AS (
  -- coalesce/nullif: an all-equal-scores slice has hi = lo; every row
  -- lands in bin 0 (all tied), never DIVIDE_BY_ZERO
  SELECT least(CAST(floor(coalesce(
                   (s - (SELECT lo FROM bounds))
                   / nullif((SELECT hi FROM bounds)
                            - (SELECT lo FROM bounds), 0), 0.0e0)
                   * {AUC_BINS}) AS INTEGER), {AUC_BINS} - 1) AS bin, y
  FROM scored
),
hist AS (
  SELECT bin, sum(y) AS pos, sum(1 - y) AS neg
  FROM binned GROUP BY bin
),
cum AS (
  SELECT pos, neg,
         sum(neg) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS neg_below
  FROM hist
),
agg AS (
  SELECT sum(pos * (COALESCE(neg_below, 0) + neg / 2.0e0)) AS u,
         sum(pos) AS np, sum(neg) AS nn
  FROM cum
)
SELECT CAST(np AS BIGINT) AS n_pos, CAST(nn AS BIGINT) AS n_neg,
       -- nullif: AUC is undefined with an absent class → NULL
       round(u / nullif(np * CAST(nn AS DOUBLE), 0), 6) AS auc_est
FROM agg
"""


@_register("ranking_auc_histogram", _AUC_HIST_ORACLE)
def q_ranking_auc_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale twin of ``ranking_auc_report``: scores bin into
    {AUC_BINS} equal-width buckets (1-row bounds broadcast, map-side bin
    arithmetic), then AUC comes from the Mann-Whitney identity applied
    to the HISTOGRAM — every score in a bucket is treated as tied, so
    U = Σ_b pos_b·(neg_below_b + neg_b/2). The only window runs over the
    ≤{AUC_BINS}-row histogram (a model table), never the events — one
    grouped aggregation at any scale. |auc_est − exact| ≤ within-bin
    discordance, O(1/bins); pinned in tests/test_scale_twins.py. The
    binning is deterministic, so the oracle replays it exactly."""
    ev = catalog.load_table(spark, sf_dir, "events")
    scored = ev.select(
        F.col("value").alias("s"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    bounds = scored.agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
    binned = scored.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor(
                # all-equal-scores slice: hi = lo → every row in bin 0
                # (all tied), never DIVIDE_BY_ZERO under ANSI
                F.coalesce(
                    F.try_divide(
                        F.col("s") - F.col("lo"),
                        F.col("hi") - F.col("lo"),
                    ),
                    F.lit(0.0),
                )
                * AUC_BINS
            ).cast("int"),
            F.lit(AUC_BINS - 1),
        ).alias("bin"),
        "y",
    )
    hist = binned.groupBy("bin").agg(
        F.sum("y").alias("pos"), F.sum(1 - F.col("y")).alias("neg")
    )
    neg_below = F.sum("neg").over(
        Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = hist.select(
        "pos", "neg", F.coalesce(neg_below, F.lit(0)).alias("neg_below")
    )
    agg = cum.agg(
        F.sum(
            F.col("pos") * (F.col("neg_below") + F.col("neg") / 2.0)
        ).alias("u"),
        F.sum("pos").alias("np"),
        F.sum("neg").alias("nn"),
    )
    return agg.select(
        F.col("np").cast("long").alias("n_pos"),
        F.col("nn").cast("long").alias("n_neg"),
        # try_divide: one-class slices have no defined AUC → NULL
        F.round(
            F.try_divide(
                F.col("u"), F.col("np") * F.col("nn").cast("double")
            ), 6
        ).alias("auc_est"),
    )



# ---------------------------------------------------------------------------
# Shared reliability layout: min-max-normalized scores in equal bins
# ---------------------------------------------------------------------------

def _minmax_binned_sql(bins: int) -> str:
    """The oracle-side of `_minmax_binned` — shared CTE prefix so the
    reliability layout (normalization, zero-range fallback, clamped top
    bin) stays identical by construction across every consumer."""
    return f"""
WITH bounds AS (SELECT min(value) AS lo, max(value) AS hi FROM events),
scored AS (
  -- coalesce/nullif: all-equal scores → p = 0 for every row, never
  -- DIVIDE_BY_ZERO
  SELECT coalesce((value - (SELECT lo FROM bounds))
           / nullif((SELECT hi FROM bounds)
                    - (SELECT lo FROM bounds), 0), 0.0e0) AS p,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
  FROM events
),
binned AS (
  SELECT least(CAST(floor(p * {bins}) AS INTEGER), {bins} - 1) AS bin, p, y
  FROM scored
)"""


def _minmax_binned(ev: DataFrame, bins: int) -> DataFrame:
    """(bin, p, y): min-max-normalized event scores in ``bins`` equal
    bins, purchase as the positive class — the reliability layout shared
    by score_calibration_bins, threshold_sweep_pr and
    calibration_ece_report (one bounds broadcast, map-side bin
    arithmetic; an all-equal-scores slice lands wholly in bin 0)."""
    bounds = ev.agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    scored = ev.crossJoin(F.broadcast(bounds)).select(
        F.coalesce(
            F.try_divide(
                F.col("value") - F.col("lo"), F.col("hi") - F.col("lo")
            ),
            F.lit(0.0),
        ).alias("p"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    )
    return scored.select(
        F.least(
            F.floor(F.col("p") * bins).cast("int"), F.lit(bins - 1)
        ).alias("bin"),
        "p",
        "y",
    )


# ---------------------------------------------------------------------------
# score_calibration_bins — reliability diagram data
# ---------------------------------------------------------------------------

_CALIB_ORACLE = _minmax_binned_sql(10) + """
SELECT bin,
       CAST(count(*) AS BIGINT) AS n,
       round(avg(p), 6) AS mean_score,
       round(avg(CAST(y AS DOUBLE)), 6) AS positive_rate
FROM binned GROUP BY bin
"""


@_register("score_calibration_bins", _CALIB_ORACLE)
def q_score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability-diagram data: min-max-normalized scores in 10 equal
    bins, observed positive rate vs mean score per bin (a calibrated
    scorer tracks the diagonal). 1-row bounds broadcast, map-side bin
    arithmetic, one 10-key aggregation."""
    ev = catalog.load_table(spark, sf_dir, "events")
    binned = _minmax_binned(ev, 10)
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(F.avg("p"), 6).alias("mean_score"),
        F.round(F.avg(F.col("y").cast("double")), 6).alias("positive_rate"),
    )


# ---------------------------------------------------------------------------
# decile_lift_table — ranked gains/lift readout
# ---------------------------------------------------------------------------

_LIFT_ORACLE = """
WITH scored AS (
  SELECT event_id, value AS score,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         ntile(10) OVER (ORDER BY value DESC, event_id) AS decile
  FROM events
),
d AS (
  SELECT decile, count(*) AS n, sum(y) AS n_pos
  FROM scored GROUP BY decile
),
t AS (SELECT sum(n) AS n_total, sum(n_pos) AS pos_total FROM d)
SELECT decile,
       CAST(n AS BIGINT)     AS n,
       CAST(n_pos AS BIGINT) AS n_pos,
       round(CAST(n_pos AS DOUBLE) / n, 6) AS pos_rate,
       round(CAST(sum(n_pos) OVER (ORDER BY decile
                                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
             / nullif(t.pos_total, 0), 6) AS cum_capture,
       round((CAST(n_pos AS DOUBLE) / n)
             / nullif(CAST(t.pos_total AS DOUBLE) / t.n_total, 0), 6)
         AS lift
FROM d CROSS JOIN t
"""


@_register("decile_lift_table", _LIFT_ORACLE)
def q_decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains/lift table — the campaign-targeting readout that completes
    the evaluation suite (confusion tableau, AUC, calibration): rank by
    score, cut into deciles, and report each decile's positive rate,
    cumulative capture of all positives, and lift over the base rate.

    Ranking ties break on event_id so the ntile assignment is one
    deterministic total order on both engines. The global ntile sort is
    the same honest cost as ``ranking_auc_report`` (documented there);
    everything downstream is 10-row algebra — the decile rollup
    broadcasts against its own 1-row total. try_divide/nullif guard the
    degenerate no-positives slice (NULL capture/lift, per the ANSI
    guard convention)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    scored = ev.select(
        "event_id",
        F.col("value").alias("score"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("y"),
    ).withColumn(
        "decile",
        F.ntile(10).over(
            Window.orderBy(F.col("score").desc(), F.col("event_id"))
        ),
    )
    d = session.stage(
        scored.groupBy("decile").agg(
            F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos")
        )
    )
    t = d.agg(
        F.sum("n").alias("n_total"), F.sum("n_pos").alias("pos_total")
    )
    cum = F.sum("n_pos").over(
        Window.orderBy("decile").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
    )
    return (
        d.crossJoin(F.broadcast(t))
        .select(
            "decile",
            F.col("n").cast("long").alias("n"),
            F.col("n_pos").cast("long").alias("n_pos"),
            F.round(F.col("n_pos").cast("double") / F.col("n"), 6)
            .alias("pos_rate"),
            F.round(
                F.try_divide(cum.cast("double"), F.col("pos_total")), 6
            ).alias("cum_capture"),
            F.round(
                F.try_divide(
                    F.col("n_pos").cast("double") / F.col("n"),
                    F.col("pos_total").cast("double") / F.col("n_total"),
                ),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# threshold_sweep_pr — precision/recall/F1 across the operating range
# ---------------------------------------------------------------------------

SWEEP_STEPS = 20  # thresholds k/20, k = 0..19

_SWEEP_ORACLE = _minmax_binned_sql(SWEEP_STEPS) + f""",
hist AS (
  SELECT bin, sum(y) AS pos, sum(1 - y) AS neg
  FROM binned GROUP BY 1
),
grid AS (SELECT g.k FROM generate_series(0, {SWEEP_STEPS} - 1) g(k)),
cum AS (
  SELECT k,
         sum(CASE WHEN bin >= k THEN pos ELSE 0 END) AS tp,
         sum(CASE WHEN bin >= k THEN neg ELSE 0 END) AS fp,
         sum(pos) AS np
  FROM grid, hist GROUP BY k
)
SELECT round(k / CAST({SWEEP_STEPS} AS DOUBLE), 6) AS threshold,
       CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
       -- nullif: a no-positives slice (np = 0) or an empty tail bucket
       -- must yield NULL metrics, not DIVIDE_BY_ZERO
       round(tp / nullif(CAST(tp + fp AS DOUBLE), 0), 6) AS precision_at,
       round(tp / nullif(CAST(np AS DOUBLE), 0), 6)      AS recall_at,
       round(2.0 * tp
             / nullif(CAST(2 * tp + fp + (np - tp) AS DOUBLE), 0), 6) AS f1
FROM cum
"""


@_register("threshold_sweep_pr", _SWEEP_ORACLE)
def q_threshold_sweep_pr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Operating-point selection: precision / recall / F1 at every
    threshold k/{SWEEP_STEPS} over the min-max-normalized score. The
    sweep is EXACT, not sampled: thresholds align with histogram bin
    edges, so 'score >= t' is a suffix-sum over the {SWEEP_STEPS}-row
    histogram — one grouped agg over the events, then all arithmetic on
    the model table against a broadcast grid. The quality-classifier
    tuning loop (choose the threshold that hits a precision target)
    reads straight off this table."""
    ev = catalog.load_table(spark, sf_dir, "events")
    hist = (
        _minmax_binned(ev, SWEEP_STEPS)
        .select("bin", "y")
        .groupBy("bin")
        .agg(F.sum("y").alias("pos"), F.sum(1 - F.col("y")).alias("neg"))
    )
    grid = spark.range(SWEEP_STEPS).select(F.col("id").cast("int").alias("k"))
    cum = (
        grid.crossJoin(F.broadcast(hist))
        .groupBy("k")
        .agg(
            F.sum(F.when(F.col("bin") >= F.col("k"), F.col("pos")).otherwise(0)).alias("tp"),
            F.sum(F.when(F.col("bin") >= F.col("k"), F.col("neg")).otherwise(0)).alias("fp"),
            F.sum("pos").alias("np"),
        )
    )
    tp, fp, np_ = F.col("tp"), F.col("fp"), F.col("np")
    return cum.select(
        F.round(F.col("k") / float(SWEEP_STEPS), 6).alias("threshold"),
        tp.cast("long").alias("tp"),
        fp.cast("long").alias("fp"),
        # try_divide: NULL metrics on degenerate slices (oracle nullif)
        F.round(
            F.try_divide(tp, (tp + fp).cast("double")), 6
        ).alias("precision_at"),
        F.round(F.try_divide(tp, np_.cast("double")), 6).alias("recall_at"),
        F.round(
            F.try_divide(2.0 * tp, (2 * tp + fp + (np_ - tp)).cast("double")),
            6,
        ).alias("f1"),
    )


# ---------------------------------------------------------------------------
# ndcg_ranking_quality — NDCG@10 per user, exact, user-keyed windows
# ---------------------------------------------------------------------------

NDCG_K = 10
# 1/log2(rn+1) for rn = 1..10 and their cumulative sums, precomputed
# ONCE in Python and inlined as DECIMAL(32,18) literals into BOTH the
# Spark plan and the DuckDB oracle: no engine libm log2 in the hot
# path, and the per-user DCG sum is a sum of exact decimals —
# reduction-order-exact on both engines (the same discipline as the
# sparse TF-IDF dot products).
_NDCG_DISC = (
    "1.000000000000000000",
    "0.630929753571457530",
    "0.500000000000000000",
    "0.430676558073393057",
    "0.386852807234541629",
    "0.356207187108022183",
    "0.333333333333333315",
    "0.315464876785728765",
    "0.301029995663981198",
    "0.289064826317887880",
)
_NDCG_IDCG = (
    "1.000000000000000000",
    "1.630929753571457530",
    "2.130929753571457530",
    "2.561606311644850587",
    "2.948459118879392216",
    "3.304666305987414399",
    "3.637999639320747714",
    "3.953464516106476479",
    "4.254494511770457677",
    "4.543559338088345557",
)

_NDCG_DISC_SQL = "CASE rn " + " ".join(
    f"WHEN {i + 1} THEN CAST({d} AS DECIMAL(32,18))"
    for i, d in enumerate(_NDCG_DISC)
) + " END"
_NDCG_IDCG_SQL = "CASE least(npos, 10) " + " ".join(
    f"WHEN {i + 1} THEN CAST({c} AS DECIMAL(32,18))"
    for i, c in enumerate(_NDCG_IDCG)
) + " END"

_NDCG_ORACLE = f"""
WITH ranked AS (
  SELECT user_id,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id) AS npos
  FROM events
),
per_user AS (
  SELECT user_id,
         max(npos) AS npos,
         sum(CASE WHEN y = 1 THEN {_NDCG_DISC_SQL}
                  ELSE CAST(0 AS DECIMAL(32,18)) END) AS dcg
  FROM ranked
  WHERE rn <= {NDCG_K}
  GROUP BY user_id
),
scored AS (
  SELECT user_id, dcg,
         {_NDCG_IDCG_SQL} AS idcg
  FROM per_user
  WHERE npos >= 1
),
nd AS (
  SELECT user_id,
         round(CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE), 6) AS ndcg,
         CASE WHEN dcg = idcg THEN 1 ELSE 0 END AS perfect
  FROM scored
)
SELECT CAST(count(*) AS BIGINT) AS n_users,
       round(CAST(sum(CAST(ndcg AS DECIMAL(18,6))) AS DOUBLE)
             / count(*), 6) AS mean_ndcg,
       CAST(sum(perfect) AS BIGINT) AS n_perfect
FROM nd
"""


@_register("ndcg_ranking_quality", _NDCG_ORACLE)
def q_ndcg_ranking_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact NDCG@10 per user (score = ``value``, binary relevance =
    purchase), reported as corpus mean + perfect-ranking count — the
    standard offline ranking-quality gate (Järvelin & Kekäläinen 2002).

    Engine-exactness: the rank discounts 1/log2(rn+1) and their ideal
    cumulative sums are Python-precomputed DECIMAL literals inlined
    into both engines, so no libm log2 is evaluated at query time and
    every per-user DCG is a reduction-order-exact decimal sum; the only
    float ops are the final identical-term divisions.

    Scale shape: one user-keyed window (bounded partitions — no global
    sort), one grouped reduce to users, one reduce to the 1-row report.
    Per-user NDCG means accumulate via the DECIMAL(18,6) exact-sum
    trick rather than an order-dependent float mean."""
    ev = catalog.load_table(spark, sf_dir, "events")
    y = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    w = Window.partitionBy("user_id").orderBy(
        F.col("value").desc(), "event_id"
    )
    ranked = ev.select(
        "user_id",
        y.alias("y"),
        F.row_number().over(w).alias("rn"),
        F.sum(y)
        .over(Window.partitionBy("user_id"))
        .alias("npos"),
    ).where(F.col("rn") <= NDCG_K)

    disc = F.expr(_NDCG_DISC_SQL)
    per_user = ranked.groupBy("user_id").agg(
        F.max("npos").alias("npos"),
        F.sum(
            F.when(F.col("y") == 1, disc).otherwise(
                F.expr("CAST(0 AS DECIMAL(32,18))")
            )
        ).alias("dcg"),
    )
    scored = per_user.where(F.col("npos") >= 1).select(
        "user_id", "dcg", F.expr(_NDCG_IDCG_SQL).alias("idcg")
    )
    nd = scored.select(
        F.round(
            F.col("dcg").cast("double") / F.col("idcg").cast("double"), 6
        ).alias("ndcg"),
        F.when(F.col("dcg") == F.col("idcg"), 1).otherwise(0).alias(
            "perfect"
        ),
    )
    return nd.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        F.round(
            F.sum(F.col("ndcg").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_ndcg"),
        F.sum("perfect").cast("long").alias("n_perfect"),
    )


# ---------------------------------------------------------------------------
# ctr_wilson_bounds — daily conversion rate with Wilson 95% interval
# ---------------------------------------------------------------------------

_WILSON_Z = "CAST(1.96 AS DOUBLE)"  # explicit double literal: a bare 1.96
_WILSON_Z2 = "CAST(3.8416 AS DOUBLE)"  # parses as DECIMAL with engine-
# specific division semantics; the cast pins both engines to the same
# IEEE double (z² is a literal too — never recomputed)

_WILSON_ORACLE = f"""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(count(*) AS BIGINT) AS n_trials,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_success
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
)
SELECT day, n_trials, n_success,
       round(CAST(n_success AS DOUBLE) / n_trials, 6) AS p_hat,
       round(
         ((CAST(n_success AS DOUBLE) / n_trials) + {_WILSON_Z2} / (2 * n_trials)
          - {_WILSON_Z} * sqrt(
              ((CAST(n_success AS DOUBLE) / n_trials)
               * (1 - (CAST(n_success AS DOUBLE) / n_trials))
               + {_WILSON_Z2} / (4 * CAST(n_trials AS DOUBLE)))
              / n_trials))
         / (1 + {_WILSON_Z2} / n_trials), 6) AS wilson_lo,
       round(
         ((CAST(n_success AS DOUBLE) / n_trials) + {_WILSON_Z2} / (2 * n_trials)
          + {_WILSON_Z} * sqrt(
              ((CAST(n_success AS DOUBLE) / n_trials)
               * (1 - (CAST(n_success AS DOUBLE) / n_trials))
               + {_WILSON_Z2} / (4 * CAST(n_trials AS DOUBLE)))
              / n_trials))
         / (1 + {_WILSON_Z2} / n_trials), 6) AS wilson_hi
FROM daily
"""


def wilson_cols(n_col: str = "n_trials", s_col: str = "n_success"):
    """(p_hat, wilson_lo, wilson_hi) column triple from trial/success
    count columns — the single home of the formula, shared by the batch
    query and the streaming twin (streaming/ctr_stream.py) so the two
    can never drift. z/z² are double literals (never recomputed)."""
    n = F.col(n_col)
    phat = F.col(s_col).cast("double") / n
    z = F.lit(1.96)   # Python float → DoubleType literal
    z2 = F.lit(3.8416)
    center = phat + z2 / (2 * n)
    margin = z * F.sqrt(
        (phat * (1 - phat) + z2 / (4 * n.cast("double"))) / n
    )
    denom = 1 + z2 / n
    return (
        F.round(phat, 6).alias("p_hat"),
        F.round((center - margin) / denom, 6).alias("wilson_lo"),
        F.round((center + margin) / denom, 6).alias("wilson_hi"),
    )


@_register("ctr_wilson_bounds", _WILSON_ORACLE)
def q_ctr_wilson_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily click→purchase conversion rate with the Wilson 95% score
    interval (Wilson 1927) — the interval that stays honest at small n
    and extreme rates, which is why ranking-by-lower-bound uses it.

    Engine-exactness: z and z² are shared double literals (never
    recomputed), every term appears in the identical algebraic order on
    both engines, and sqrt is IEEE-correctly-rounded everywhere — so
    the doubles match bit-for-bit. Scale shape: one grouped count per
    day (map-side combine; keys = days), then closed-form map-side
    arithmetic on the tiny daily table."""
    ev = catalog.load_table(spark, sf_dir, "events")
    daily = (
        ev.where(F.col("event_type").isin("click", "purchase"))
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_trials"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_success"),
        )
    )
    return daily.select(
        "day", "n_trials", "n_success", *wilson_cols()
    )


# ---------------------------------------------------------------------------
# label_agreement_kappa — chance-corrected rater agreement (Cohen 1960)
# ---------------------------------------------------------------------------

_KAPPA_ORACLE_TEMPLATE = """
WITH pred AS ({pred}),
cm AS (
  SELECT labeled_lang AS truth, predicted_lang AS pred,
         count(*) AS n
  FROM pred GROUP BY 1, 2
),
tot AS (
  SELECT sum(n) AS n_docs,
         sum(CASE WHEN truth = pred THEN n ELSE 0 END) AS n_agree
  FROM cm
),
marg AS (
  SELECT coalesce(r.lang, c.lang) AS lang,
         coalesce(r.n_row, 0) AS n_row,
         coalesce(c.n_col, 0) AS n_col
  FROM (SELECT truth AS lang, sum(n) AS n_row FROM cm GROUP BY 1) r
  FULL OUTER JOIN
       (SELECT pred AS lang, sum(n) AS n_col FROM cm GROUP BY 1) c
  USING (lang)
),
pe AS (SELECT sum(n_row * n_col) AS pe_num FROM marg)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       round(CAST(n_agree AS DOUBLE) / n_docs, 6) AS observed_agreement,
       round(CAST(pe_num AS DOUBLE) / (CAST(n_docs AS DOUBLE) * n_docs), 6)
         AS expected_agreement,
       -- nullif: a single-class corpus has pe = 1 (kappa undefined);
       -- both engines must emit NULL, not DIVIDE_BY_ZERO / inf
       round(
         ((CAST(n_agree AS DOUBLE) / n_docs)
          - (CAST(pe_num AS DOUBLE) / (CAST(n_docs AS DOUBLE) * n_docs)))
         / nullif(1 - (CAST(pe_num AS DOUBLE)
                       / (CAST(n_docs AS DOUBLE) * n_docs)), 0.0), 6)
         AS kappa
FROM tot, pe
"""


@_register("label_agreement_kappa")
def q_label_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between the stored language labels and
    the marker-based language-ID — the chance-corrected agreement scalar
    a labeling pipeline gates re-annotation on (raw agreement flatters
    skewed label distributions; kappa does not).

    All inputs are exact integer counts from ONE grouped pass over the
    ≤|langs|² confusion cells; marginal products stay integers until
    the final identical-term double formula. Scale shape: the documents
    scan reduces immediately to the tiny confusion matrix — everything
    downstream is constant-size."""
    from .text import q_text_langid

    pred = q_text_langid(spark, sf_dir)
    cm = pred.groupBy(
        F.col("labeled_lang").alias("truth"),
        F.col("predicted_lang").alias("pred"),
    ).agg(F.count(F.lit(1)).alias("n"))

    tot = cm.agg(
        F.sum("n").alias("n_docs"),
        F.sum(
            F.when(F.col("truth") == F.col("pred"), F.col("n")).otherwise(0)
        ).alias("n_agree"),
    )
    rows = cm.groupBy(F.col("truth").alias("lang")).agg(
        F.sum("n").alias("n_row")
    )
    cols = cm.groupBy(F.col("pred").alias("lang")).agg(
        F.sum("n").alias("n_col")
    )
    marg = rows.join(cols, "lang", "full_outer").select(
        F.coalesce("n_row", F.lit(0)).alias("n_row"),
        F.coalesce("n_col", F.lit(0)).alias("n_col"),
    )
    pe = marg.agg(F.sum(F.col("n_row") * F.col("n_col")).alias("pe_num"))

    j = tot.crossJoin(F.broadcast(pe))
    n_docs = F.col("n_docs")
    po = F.col("n_agree").cast("double") / n_docs
    pe_v = F.col("pe_num").cast("double") / (n_docs.cast("double") * n_docs)
    return j.select(
        n_docs.cast("long").alias("n_docs"),
        F.round(po, 6).alias("observed_agreement"),
        F.round(pe_v, 6).alias("expected_agreement"),
        # try_divide: pe = 1 on a single-class corpus → NULL kappa,
        # never DIVIDE_BY_ZERO (ANSI session; guard-tested)
        F.round(F.try_divide(po - pe_v, 1 - pe_v), 6).alias("kappa"),
    )


ORACLES["label_agreement_kappa"] = _KAPPA_ORACLE_TEMPLATE.format(
    pred=_langid_pred_sql()
)


# ---------------------------------------------------------------------------
# calibration_ece_report — ECE / MCE / Brier one-row summary
# ---------------------------------------------------------------------------

_ECE_ORACLE = _minmax_binned_sql(10) + """,
b AS (
  SELECT bin, count(*) AS n,
         CAST(sum(CAST(p AS DECIMAL(32, 18))) AS DOUBLE) AS sp,
         CAST(sum(y) AS DOUBLE) AS sy
  FROM binned GROUP BY bin
),
t AS (SELECT CAST(sum(n) AS DOUBLE) AS n_total,
             CAST(sum(n) AS BIGINT) AS n_events FROM b),
gaps AS (SELECT n, abs(sy / n - sp / n) AS gap FROM b),
brier AS (
  SELECT CAST(sum(CAST((p - y) * (p - y) AS DECIMAL(32, 18))) AS DOUBLE)
           AS sq
  FROM binned
)
SELECT round(CAST(sum(CAST(gap * n AS DECIMAL(32, 18))) AS DOUBLE)
             / t.n_total, 6)                       AS ece,
       round(max(gap), 6)                          AS mce,
       round(brier.sq / t.n_total, 6)              AS brier,
       t.n_events                                  AS n_events
FROM gaps, t, brier
GROUP BY t.n_total, t.n_events, brier.sq
"""


@_register("calibration_ece_report", _ECE_ORACLE)
def q_calibration_ece_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expected Calibration Error (Naeini et al. 2015 / Guo et al. 2017)
    over the same 10-bin reliability layout as score_calibration_bins,
    plus MCE (the worst bin's gap) and the Brier score — the one-row
    acceptance gate a model-eval pipeline thresholds on.

    Per-bin score mass and the squared-error total accumulate in
    DECIMAL(32,18), so every cross-row sum is reduction-order-exact and
    the final ratios hash cross-engine; the per-bin gap |acc − conf| is
    pure per-row double algebra on identical inputs. Plan: one 10-key
    aggregation + two broadcast 1-row totals — corpus scanned once."""
    dec = "decimal(32,18)"
    ev = catalog.load_table(spark, sf_dir, "events")
    binned = session.stage(_minmax_binned(ev, 10))
    b = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("p").cast(dec)).cast("double").alias("sp"),
        F.sum("y").cast("double").alias("sy"),
    )
    gaps = b.select(
        "n",
        F.abs(
            F.col("sy") / F.col("n") - F.col("sp") / F.col("n")
        ).alias("gap"),
    )
    t = b.agg(
        F.sum("n").cast("double").alias("n_total"),
        F.sum("n").cast("long").alias("n_events"),
    )
    brier = binned.agg(
        F.sum(((F.col("p") - F.col("y")) * (F.col("p") - F.col("y"))).cast(dec))
        .cast("double")
        .alias("sq")
    )
    return (
        gaps.crossJoin(F.broadcast(t))
        .crossJoin(F.broadcast(brier))
        .groupBy("n_total", "n_events", "sq")
        .agg(
            F.round(
                F.sum((F.col("gap") * F.col("n")).cast(dec)).cast("double")
                / F.first("n_total"),
                6,
            ).alias("ece"),
            F.round(F.max("gap"), 6).alias("mce"),
        )
        .select(
            "ece",
            "mce",
            F.round(F.col("sq") / F.col("n_total"), 6).alias("brier"),
            "n_events",
        )
    )


# ---------------------------------------------------------------------------
# eval_pass_at_k — unbiased pass@k estimator (Chen et al. 2021, Codex)
# ---------------------------------------------------------------------------

PASS_AT_KS: tuple[int, ...] = (1, 5, 10)
PASS_MIN_SAMPLES = 10  # tasks need n >= max(k) for the estimator

# pass@k = 1 - C(n-c, k)/C(n, k), computed the numerically-stable way
# the original release does: 1 - prod_{i=0..k-1} (n-c-i)/(n-i). Each
# task's product is a PER-ROW ordered left fold of correctly-rounded
# double ops on exact integer inputs — bit-identical across engines by
# IEEE 754, no cross-row float accumulation at all. When n-c < k the
# fold hits an exactly-zero factor and the product collapses to 0
# (pass@k = 1), which is the estimator's own boundary semantics — no
# clamp needed.


def _pass_product_sql(k: int) -> str:
    return (
        f"round(1.0e0 - list_reduce([1.0e0] || "
        f"[CAST(n - c - i AS DOUBLE) / (n - i) FOR i IN range(0, {k})], "
        f"(acc, x) -> acc * x), 6)"
    )


_PASS_ORACLE = f"""
WITH t AS (
  SELECT user_id AS task_id,
         count(*) AS n,
         sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS c
  FROM events GROUP BY user_id
)
SELECT task_id,
       CAST(n AS BIGINT) AS n_samples,
       CAST(c AS BIGINT) AS n_correct,
       {", ".join(f"{_pass_product_sql(k)} AS pass_at_{k}"
                  for k in PASS_AT_KS)}
FROM t WHERE n >= {max(PASS_MIN_SAMPLES, max(PASS_AT_KS))}
"""


@_register("eval_pass_at_k", _PASS_ORACLE)
def q_eval_pass_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pass@k over the events fixture: each user is a "task", each
    event a "sample", purchases are "correct" — the unbiased estimator
    every code-eval harness reports (Chen et al. 2021, HumanEval).

    Plan: ONE grouped count pass over events (n, c per task), then the
    k-fold product is pure per-row map work — the eval table is
    tasks-sized, so at any corpus scale the cost is the single
    events aggregation."""
    return eval_pass_at_k(catalog.load_table(spark, sf_dir, "events"))


def eval_pass_at_k(
    ev: DataFrame,
    ks: tuple[int, ...] = PASS_AT_KS,
    min_samples: int = PASS_MIN_SAMPLES,
) -> DataFrame:
    """Parameterized kernel behind ``eval_pass_at_k``. Tasks must have
    n >= max(ks) for every fold denominator to stay positive, so the
    effective sample floor is max(min_samples, max(ks))."""
    min_samples = max(min_samples, max(ks))

    def pass_at(k: int):
        fold = F.aggregate(
            F.sequence(F.lit(0), F.lit(k - 1)),
            F.lit(1.0),
            lambda acc, i: acc
            * (
                (F.col("n") - F.col("c") - i).cast("double")
                / (F.col("n") - i)
            ),
        )
        return F.round(F.lit(1.0) - fold, 6)

    t = ev.groupBy(F.col("user_id").alias("task_id")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("c"),
    )
    return t.where(F.col("n") >= min_samples).select(
        "task_id",
        F.col("n").cast("long").alias("n_samples"),
        F.col("c").cast("long").alias("n_correct"),
        *[pass_at(k).alias(f"pass_at_{k}") for k in ks],
    )
