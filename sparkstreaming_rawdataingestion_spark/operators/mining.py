"""Pattern-mining / dataset-preparation operators.

Once the reference's ingest lands per-user event streams and a document
corpus in the warehouse (RawDataIngestion.java:134-152 → DataPoint rows),
the next consumer layer asks mining-shaped questions: which events
co-occur, how do users transition between states, has the value
distribution drifted, and how do we draw weighted / shuffled training
samples from the corpus. Everything here is built-in column algebra —
no Python in any hot path except the one declared sequential recurrence
(EWMA), which runs as an Arrow-batched ``applyInPandas`` kernel.

Scale shape per operator:

- **market_basket_pairs**: the item-pair self-join is keyed on the
  basket id (user_id, day) — co-partitioned, so the quadratic blowup is
  bounded by the per-basket distinct-item count (≤ |event types|, a
  small constant), never by corpus size. Item totals are a
  |item|-row aggregate → broadcast back.
- **markov_transitions**: one per-user window (local sorts), one
  (cur, next) count aggregation, one |states|-row totals broadcast.
- **psi_drift**: fixed-width binning against reference-cohort bounds —
  counts shuffle (type, cohort, bin) triples only; the bin grid is
  generated, not scanned. Per-bin terms accumulate in DECIMAL so the
  sum is exact under any reduction order.
- **weighted_sample_poisson**: sequential Poisson sampling (Ohlsson) —
  a pure map assigns each row priority u/w from an overflow-safe
  multiplicative hash, then one TakeOrderedAndProject picks k. No joins,
  no global sort (top-k heap per partition + driver merge of k·p rows).
- **training_shuffle_order**: deterministic epoch shuffle as hash-range
  layout — rank runs INSIDE (epoch, bucket) partitions, so there is no
  single-partition global row_number bottleneck; bucket files are the
  unit a trainer reads.
- **unigram_logprob_quality**: corpus LM scoring — token frequencies are
  one vocabulary-sized aggregate joined back on the token key; per-doc
  mean log-probability accumulates in DECIMAL (order-independent).
- **bigram_logprob_quality**: second-order corpus LM scoring — bigram
  extraction is a per-doc ``lead`` window (local sorts inside doc_id
  partitions, no self-join); the bigram-count model is an
  observed-bigram-sized aggregate (≪ corpus, bounded by V² but in
  practice Heaps-law small) staged once; scoring joins the corpus
  bigram stream against it co-partitioned on the (w1, w2) key. Context
  totals and the vocabulary size derive from the staged model table,
  never from extra corpus scans.
- **ewma_smoothing**: the one genuinely sequential recurrence
  (y_t = α·x_t + (1-α)·y_{t-1}); closed-form window tricks overflow
  (1-α)^-t at real stream lengths, so it runs per-key in Arrow batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .. import catalog
from .profiling import _MMH2, _bucket_col, _bucket_sql

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
# market_basket_pairs — event-type co-occurrence with support and lift
# ---------------------------------------------------------------------------

_BASKET_ORACLE = """
WITH baskets AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d, event_type
  FROM events
),
n AS (
  SELECT count(*) AS n_baskets
  FROM (SELECT DISTINCT user_id, d FROM baskets)
),
items AS (
  SELECT event_type, count(*) AS n_item FROM baskets GROUP BY event_type
),
pairs AS (
  SELECT a.event_type AS item_a, b.event_type AS item_b,
         count(*) AS n_pair
  FROM baskets a
  JOIN baskets b ON a.user_id = b.user_id AND a.d = b.d
                AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.item_a, p.item_b,
       CAST(p.n_pair AS BIGINT) AS n_pair,
       CAST(ia.n_item AS BIGINT) AS n_a,
       CAST(ib.n_item AS BIGINT) AS n_b,
       round(CAST(p.n_pair AS DOUBLE) / n.n_baskets, 6) AS support,
       round(CAST(p.n_pair * n.n_baskets AS DOUBLE)
             / CAST(ia.n_item * ib.n_item AS DOUBLE), 6) AS lift
FROM pairs p
JOIN items ia ON ia.event_type = p.item_a
JOIN items ib ON ib.event_type = p.item_b
CROSS JOIN n
"""


@_register("market_basket_pairs", _BASKET_ORACLE)
def q_market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence: baskets are (user, day) activity
    sets; for every unordered event-type pair report how many baskets
    contain both, the pair's support, and its lift
    (P(a,b) / (P(a)·P(b)) — >1 means the events attract).

    Plan: ONE scan and ONE shuffle — the per-basket item sets
    materialize once (grouped collect_set, staged for the three
    consumers); pair enumeration is a map-side double explode of each
    basket's set (fan-out C(k,2) with k ≤ |event types|, independent of
    corpus size — no self-join at all), and item totals / the basket
    count are tiny aggregates over the same staged sets, broadcast back
    onto the pair counts. (The self-join-on-basket-key spelling was
    rejected: without staging Catalyst planned it as FOUR separate
    scans + distinct shuffles of the basket matrix.) Lift's
    numerator/denominator are exact BIGINT products; only the final
    division is float (correctly rounded identically on both
    engines)."""
    from .. import session

    ev = catalog.load_table(spark, sf_dir, "events")
    sets = session.stage(
        ev.groupBy("user_id", F.to_date("ts").alias("d")).agg(
            F.collect_set("event_type").alias("items")
        )
    )
    n_baskets = sets.agg(F.count(F.lit(1)).alias("n_baskets"))
    items = sets.select(F.explode("items").alias("event_type")).groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).alias("n_item"))
    pairs = (
        sets.select(F.col("items"), F.explode("items").alias("item_a"))
        .select("item_a", F.explode("items").alias("item_b"))
        .where(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_pair"))
    )
    ia = items.select(
        F.col("event_type").alias("item_a"), F.col("n_item").alias("n_a")
    )
    ib = items.select(
        F.col("event_type").alias("item_b"), F.col("n_item").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(n_baskets))
        .select(
            "item_a",
            "item_b",
            "n_pair",
            "n_a",
            "n_b",
            F.round(
                F.col("n_pair").cast("double") / F.col("n_baskets"), 6
            ).alias("support"),
            F.round(
                (F.col("n_pair") * F.col("n_baskets")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double"),
                6,
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# markov_transitions — first-order state-transition matrix
# ---------------------------------------------------------------------------

_MARKOV_ORACLE = """
WITH seq AS (
  SELECT event_type AS cur_state,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_state
  FROM events
),
t AS (
  SELECT cur_state, next_state, count(*) AS n_trans
  FROM seq WHERE next_state IS NOT NULL
  GROUP BY 1, 2
)
SELECT cur_state, next_state,
       CAST(n_trans AS BIGINT) AS n_trans,
       round(CAST(n_trans AS DOUBLE)
             / sum(n_trans) OVER (PARTITION BY cur_state), 6) AS prob
FROM t
"""


@_register("markov_transitions", _MARKOV_ORACLE)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current event type), with counts.

    Plan: one per-user lead window (per-key local sorts), one
    (cur, next) count aggregation — |states|² rows — and the row
    normalization is a window over that tiny matrix (sum per cur_state),
    not a second pass over events. Probabilities divide exact BIGINT
    counts as doubles; division is correctly rounded identically on
    both engines."""
    ev = catalog.load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("cur_state"),
        F.lead("event_type").over(w).alias("next_state"),
    ).where(F.col("next_state").isNotNull())
    t = seq.groupBy("cur_state", "next_state").agg(
        F.count(F.lit(1)).alias("n_trans")
    )
    wrow = Window.partitionBy("cur_state")
    return t.select(
        "cur_state",
        "next_state",
        "n_trans",
        F.round(
            F.col("n_trans").cast("double") / F.sum("n_trans").over(wrow), 6
        ).alias("prob"),
    )


# ---------------------------------------------------------------------------
# psi_drift — population stability index per series (ref vs current)
# ---------------------------------------------------------------------------

# Cohort split: first half of January is the reference window, the rest is
# the current window (the fixture stream spans 2024-01-01 .. 2024-01-30).
_PSI_SPLIT = "2024-01-16"
_PSI_BINS = 10

_PSI_ORACLE = f"""
WITH tagged AS (
  SELECT event_type, value,
         CASE WHEN ts < TIMESTAMP '{_PSI_SPLIT} 00:00:00'
              THEN 0 ELSE 1 END AS cohort
  FROM events WHERE value IS NOT NULL
),
bounds AS (
  SELECT event_type, min(value) AS lo, max(value) AS hi
  FROM tagged WHERE cohort = 0 GROUP BY event_type
),
binned AS (
  SELECT t.event_type, t.cohort,
         least({_PSI_BINS - 1}, greatest(0, CAST(floor(
             coalesce((t.value - b.lo)
                      / nullif((b.hi - b.lo) / {_PSI_BINS}.0e0, 0), 0.0e0)
         ) AS BIGINT))) AS bin
  FROM tagged t JOIN bounds b ON b.event_type = t.event_type
),
grid AS (
  SELECT event_type, c.cohort, g.bin
  FROM bounds,
       (SELECT unnest(range(2)) AS cohort) c,
       (SELECT unnest(range({_PSI_BINS})) AS bin) g
),
counts AS (
  SELECT g.event_type, g.cohort, g.bin,
         count(b.event_type) AS cnt
  FROM grid g
  LEFT JOIN binned b ON b.event_type = g.event_type
                    AND b.cohort = g.cohort AND b.bin = g.bin
  GROUP BY 1, 2, 3
),
totals AS (
  SELECT event_type, cohort, sum(cnt) AS n
  FROM counts GROUP BY 1, 2
),
props AS (
  SELECT c.event_type, c.bin,
         max(CASE WHEN c.cohort = 0 THEN
             (c.cnt + 0.5e0) / (t.n + {_PSI_BINS / 2.0}e0) END) AS p_ref,
         max(CASE WHEN c.cohort = 1 THEN
             (c.cnt + 0.5e0) / (t.n + {_PSI_BINS / 2.0}e0) END) AS p_cur
  FROM counts c
  JOIN totals t ON t.event_type = c.event_type AND t.cohort = c.cohort
  GROUP BY 1, 2
)
SELECT event_type,
       round(CAST(sum(CAST(round((p_cur - p_ref) * ln(p_cur / p_ref), 9)
                          AS DECIMAL(18,9))) AS DOUBLE), 6) AS psi,
       CAST(round(CAST(sum(CAST(round((p_cur - p_ref) * ln(p_cur / p_ref), 9)
                          AS DECIMAL(18,9))) AS DOUBLE), 6) > 0.1
            AS BOOLEAN) AS drifted
FROM props
GROUP BY event_type
"""


@_register("psi_drift", _PSI_ORACLE)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index per series: bin each series' values
    into 10 fixed-width bins sized on the REFERENCE cohort (first half
    of the stream), Laplace-smooth both cohorts' bin proportions
    (+0.5/bin, so empty bins never hit ln(0)) and report
    PSI = Σ (p_cur − p_ref)·ln(p_cur/p_ref) with the standard
    PSI > 0.1 drift flag. Complements distribution_drift_ks: PSI is the
    binned, smoothed industry form (robust to tails, cheap to maintain
    incrementally), KS the exact nonparametric one.

    Plan: bounds are a |series|-row reference aggregate broadcast onto
    a single binning pass; counts shuffle (series, cohort, bin) triples
    only; the dense bin grid is GENERATED (sequence × series) and
    left-joined so absent bins count 0 on both engines. Per-bin terms
    are rounded to 9 dp and summed as DECIMAL(18,9) — exact under any
    reduction order (the stats_moments_pack engineering) — before the
    final 6 dp rounding."""
    ev = catalog.load_table(spark, sf_dir, "events")
    tagged = ev.where(F.col("value").isNotNull()).select(
        "event_type",
        "value",
        F.when(
            F.col("ts") < F.lit(f"{_PSI_SPLIT} 00:00:00").cast(
                "timestamp_ntz"
            ),
            0,
        )
        .otherwise(1)
        .alias("cohort"),
    )
    bounds = (
        tagged.where(F.col("cohort") == 0)
        .groupBy("event_type")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
    )
    width = (F.col("hi") - F.col("lo")) / F.lit(float(_PSI_BINS))
    binned = tagged.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "cohort",
        F.least(
            F.lit(_PSI_BINS - 1),
            F.greatest(
                F.lit(0),
                # coalesce(try_divide): a constant-valued type has
                # width 0 → every row in bin 0 (oracle mirrors)
                F.floor(
                    F.coalesce(
                        F.try_divide(F.col("value") - F.col("lo"), width),
                        F.lit(0.0),
                    )
                ).cast("long"),
            ),
        ).alias("bin"),
    )
    grid = (
        bounds.select("event_type")
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(2).select(
                    F.col("id").cast("int").alias("cohort")
                )
            )
        )
        .crossJoin(
            F.broadcast(
                ev.sparkSession.range(_PSI_BINS).select(
                    F.col("id").alias("bin")
                )
            )
        )
    )
    counts = (
        grid.join(
            binned.groupBy("event_type", "cohort", "bin").agg(
                F.count(F.lit(1)).alias("c")
            ),
            ["event_type", "cohort", "bin"],
            "left",
        )
        .select(
            "event_type",
            "cohort",
            "bin",
            F.coalesce(F.col("c"), F.lit(0)).alias("cnt"),
        )
    )
    wtot = Window.partitionBy("event_type", "cohort")
    smooth = F.lit(_PSI_BINS / 2.0)
    props = (
        counts.select(
            "event_type",
            "cohort",
            "bin",
            (
                (F.col("cnt") + F.lit(0.5))
                / (F.sum("cnt").over(wtot) + smooth)
            ).alias("p"),
        )
        .groupBy("event_type", "bin")
        .agg(
            F.max(F.when(F.col("cohort") == 0, F.col("p"))).alias("p_ref"),
            F.max(F.when(F.col("cohort") == 1, F.col("p"))).alias("p_cur"),
        )
    )
    term = F.round(
        (F.col("p_cur") - F.col("p_ref"))
        * F.log(F.col("p_cur") / F.col("p_ref")),
        9,
    ).cast("decimal(18,9)")
    psi = F.round(F.sum(term).cast("double"), 6)
    return props.groupBy("event_type").agg(
        psi.alias("psi"), (psi > F.lit(0.1)).alias("drifted")
    )


# ---------------------------------------------------------------------------
# weighted_sample_poisson — sequential Poisson weighted sampling
# ---------------------------------------------------------------------------

_WSAMPLE_K = 100

# Priority = u / w with u a deterministic uniform from the overflow-safe
# multiplicative hash (profiling._MMH2 rationale). Division of IEEE doubles
# is correctly rounded, so priorities — and therefore the selected set —
# are bit-identical across engines; no transcendental (the -ln(u)/w
# exponential-key variant would ride libm differences).
_WSAMPLE_PRIORITY_SQL = f"""
(((doc_id % 4294967296) * {_MMH2} % 4294967296) + 0.5e0) / 4294967296.0e0
  / nullif(n_chars, 0)
"""

_WSAMPLE_ORACLE = f"""
SELECT doc_id, CAST(n_chars AS BIGINT) AS weight,
       round({_WSAMPLE_PRIORITY_SQL} * 1.0e6, 6) AS priority_ppm
FROM documents
ORDER BY {_WSAMPLE_PRIORITY_SQL}, doc_id
LIMIT {_WSAMPLE_K}
"""


@_register("weighted_sample_poisson", _WSAMPLE_ORACLE)
def q_weighted_sample_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample of k=100 documents, selection probability
    ≈ proportional to length (n_chars) — sequential Poisson sampling
    (Ohlsson 1998): priority = u/w for a deterministic per-key uniform
    u, keep the k smallest. Reproducible across runs, engines and
    cluster sizes, and mergeable: the k smallest of a union is the
    k smallest of each part's k smallest, so the plan is a
    TakeOrderedAndProject (per-partition top-k heaps + driver merge of
    k·p candidates), never a global sort.

    The uniform comes from the overflow-safe multiplicative hash
    (mod 2³² before a sub-2³¹ multiplier — profiling.py rationale);
    priority uses only IEEE-exact ops (add/divide), so both engines
    compute bit-identical keys. doc_id breaks (impossible-in-fixture)
    priority ties deterministically."""
    d = catalog.load_table(spark, sf_dir, "documents")
    u = (
        (
            (F.col("doc_id") % F.lit(4294967296))
            * F.lit(_MMH2)
            % F.lit(4294967296)
        )
        + F.lit(0.5)
    ) / F.lit(4294967296.0)
    # try_divide: a zero-length doc has weight 0 → NULL priority (it
    # sorts last under DESC and is never sampled; oracle mirrors)
    priority = F.try_divide(u, F.col("n_chars"))
    return (
        d.select(
            "doc_id",
            F.col("n_chars").alias("weight"),
            F.round(priority * F.lit(1.0e6), 6).alias("priority_ppm"),
            priority.alias("_p"),
        )
        .orderBy("_p", "doc_id")
        .limit(_WSAMPLE_K)
        .drop("_p")
    )


# ---------------------------------------------------------------------------
# training_shuffle_order — deterministic epoch shuffle as hash-range layout
# ---------------------------------------------------------------------------

_SHUFFLE_EPOCHS = 2
_SHUFFLE_BUCKETS = 8

# Two multiplicative rounds over (doc_id + epoch); every intermediate stays
# below 2^63 (operand reduced mod 2^32 before the sub-2^31 multiplier).
_SHUFFLE_HASH_SQL = (
    f"((((doc_id % 4294967296) + epoch) * {_MMH2} % 4294967296)"
    f" * {_MMH2} % 4294967296)"
)

_SHUFFLE_ORACLE = f"""
WITH e AS (
  SELECT d.doc_id, c.epoch,
         {_SHUFFLE_HASH_SQL} AS h
  FROM documents d, (SELECT unnest(range({_SHUFFLE_EPOCHS})) AS epoch) c
)
SELECT epoch, doc_id,
       CAST(h % {_SHUFFLE_BUCKETS} AS BIGINT) AS bucket,
       CAST(row_number() OVER (
           PARTITION BY epoch, h % {_SHUFFLE_BUCKETS}
           ORDER BY h, doc_id) AS BIGINT) AS pos
FROM e
"""


@_register("training_shuffle_order", _SHUFFLE_ORACLE)
def q_training_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-epoch training shuffle: every document gets a
    hash position for each epoch, materialized as (bucket, pos) — the
    layout a trainer consumes by reading bucket files in pos order.
    Re-running yields byte-identical epochs (resumable training);
    different epochs decorrelate via the epoch-mixed two-round
    multiplicative hash.

    Scale design: the rank runs INSIDE (epoch, bucket) hash partitions
    — a global ORDER BY row_number would serialize 100 TB through one
    partition; here each bucket sorts locally and in parallel, and the
    bucket count is the only knob (set it to the trainer's reader
    parallelism). Integer-only arithmetic, overflow-safe at any int64
    doc_id (mod-2³² reduction before each sub-2³¹ multiplier)."""
    d = catalog.load_table(spark, sf_dir, "documents")
    epochs = d.sparkSession.range(_SHUFFLE_EPOCHS).select(
        F.col("id").alias("epoch")
    )
    h = (
        ((F.col("doc_id") % F.lit(4294967296)) + F.col("epoch"))
        * F.lit(_MMH2)
        % F.lit(4294967296)
        * F.lit(_MMH2)
        % F.lit(4294967296)
    )
    e = d.select("doc_id").crossJoin(F.broadcast(epochs)).select(
        "epoch", "doc_id", h.alias("h")
    )
    w = Window.partitionBy("epoch", F.col("h") % _SHUFFLE_BUCKETS).orderBy(
        "h", "doc_id"
    )
    return e.select(
        "epoch",
        "doc_id",
        (F.col("h") % _SHUFFLE_BUCKETS).alias("bucket"),
        F.row_number().over(w).cast("long").alias("pos"),
    )


# ---------------------------------------------------------------------------
# unigram_logprob_quality — corpus-LM document scoring
# ---------------------------------------------------------------------------

_UNIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
freq AS (
  SELECT tok, count(*) AS n_tok FROM toks GROUP BY tok
),
n AS (SELECT count(*) AS n_total FROM toks),
scored AS (
  SELECT t.doc_id,
         CAST(round(ln(CAST(f.n_tok AS DOUBLE) / n.n_total), 9)
              AS DECIMAL(18,9)) AS lp
  FROM toks t JOIN freq f ON f.tok = t.tok CROSS JOIN n
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_tokens,
       round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob
FROM scored
GROUP BY doc_id
"""


@_register("unigram_logprob_quality", _UNIGRAM_ORACLE)
def q_unigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-LM quality score: train a unigram language model on the
    corpus itself (token frequency / total tokens) and score each
    document by its mean token log-probability — the classic cheap
    perplexity proxy for surfacing gibberish / outlier documents before
    expensive model-based filters.

    Plan: two corpus passes total — one explode feeding the
    vocabulary-sized frequency aggregate (vocabulary ≪ corpus — Heaps'
    law), one explode joined back on the token key (AQE broadcasts the
    frequency table when small); per-doc aggregation shuffles
    (doc_id, logprob) pairs. The frequency table is STAGED (persisted)
    so the corpus token total is a sum over the cached vocabulary, not a
    third corpus scan. Per-token log-probs round
    to 9 dp and accumulate in DECIMAL(18,9), so the per-doc mean is
    exact under any reduction order; ln/division inputs are identical
    exact BIGINT ratios on both engines."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    from .. import session

    freq = session.stage(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    )
    n = freq.agg(F.sum("n_tok").cast("long").alias("n_total"))
    lp = F.round(
        F.log(F.col("n_tok").cast("double") / F.col("n_total")), 9
    ).cast("decimal(18,9)")
    return (
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(n))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(
                F.sum("lp").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# dsir_importance_weights — domain-targeted data selection (DSIR)
# ---------------------------------------------------------------------------

# Data Selection via Importance Resampling (Xie et al. 2023): score every
# RAW-pool document by the log importance weight of a target-domain
# unigram LM over a raw-pool unigram LM, log w(d) = Σ_tok tf·(ln p_T −
# ln p_R), both Laplace-smoothed over the shared vocabulary. The fixture
# target domain is source = 'src0' (a 5% in-domain exemplar, the DSIR
# setup: small target, big raw pool).
DSIR_TARGET_SOURCE = "src0"

_DSIR_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
tf AS (
  SELECT doc_id, source, tok, count(*) AS tf
  FROM toks GROUP BY doc_id, source, tok
),
tc AS (
  SELECT tok,
         sum(CASE WHEN source = '{DSIR_TARGET_SOURCE}' THEN tf ELSE 0 END)
           AS ct,
         sum(CASE WHEN source <> '{DSIR_TARGET_SOURCE}' THEN tf ELSE 0 END)
           AS cr
  FROM tf GROUP BY tok
),
totals AS (
  SELECT sum(ct) AS nt, sum(cr) AS nr, count(*) AS vocab FROM tc
),
-- per-token log ratio rounded to 9 dp and accumulated in DECIMAL(18,9),
-- the unigram_logprob_quality discipline: ln inputs are identical exact
-- integer ratios on both engines
model AS (
  SELECT tok,
         CAST(round(ln((ct + 1.0e0) / (nt + vocab))
                    - ln((cr + 1.0e0) / (nr + vocab)), 9)
              AS DECIMAL(18,9)) AS lr
  FROM tc CROSS JOIN totals
)
-- round the exact DECIMAL sum BEFORE the double cast: the sum lives on
-- the 1e-9 grid, so ...500-ending values are common and round(DOUBLE,6)
-- breaks those ties differently per engine (Spark rounds the shortest
-- decimal repr, DuckDB the binary double); DECIMAL round is half-away
-- -from-zero and exact on both
SELECT f.doc_id,
       CAST(round(sum(CAST(f.tf AS DECIMAL(10,0)) * m.lr), 6) AS DOUBLE)
         AS log_weight,
       CAST(sum(f.tf) AS BIGINT)                  AS n_tokens
FROM tf f JOIN model m USING (tok)
WHERE f.source <> '{DSIR_TARGET_SOURCE}'
GROUP BY f.doc_id
"""


@_register("dsir_importance_weights", _DSIR_ORACLE)
def q_dsir_importance_weights(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): every raw-pool doc
    scored by Σ tf·(ln p_target − ln p_raw) under Laplace-smoothed
    unigram LMs — the principled replacement for "just take everything"
    when a pipeline wants web data that LOOKS like a curated target
    domain; downstream, sampling ∝ exp(log_weight) is temperature_mix's
    job.

    Plan: one explode feeding the (doc, tok) tf aggregation; the token
    model is the vocabulary-sized tc table (staged once — its totals
    come from a sum over the cached vocabulary, never a second corpus
    scan) joined back on the token key; the final reduce is doc-keyed.
    Per-token log ratios round to 9 dp and accumulate in DECIMAL(18,9)
    (the unigram_logprob_quality discipline), so the per-doc sum is
    exact under any reduction order. At 100 TB the model table is
    vocabulary-sized (Heaps' law ≪ corpus) — broadcast or shuffle join,
    either way the corpus tokens shuffle once."""
    return dsir_importance_weights(
        catalog.load_table(spark, sf_dir, "documents")
    )


def dsir_importance_weights(
    d: DataFrame, target_source: str = DSIR_TARGET_SOURCE
) -> DataFrame:
    """The parameterized kernel behind ``dsir_importance_weights``."""
    from .. import session

    toks = d.select(
        "doc_id",
        "source",
        F.explode(F.split(F.col("text"), " ")).alias("tok"),
    )
    tf = session.stage(
        toks.groupBy("doc_id", "source", "tok").agg(
            F.count(F.lit(1)).alias("tf")
        )
    )
    is_t = F.col("source") == target_source
    tc = session.stage(
        tf.groupBy("tok").agg(
            F.sum(F.when(is_t, F.col("tf")).otherwise(F.lit(0))).alias("ct"),
            F.sum(F.when(~is_t, F.col("tf")).otherwise(F.lit(0))).alias("cr"),
        )
    )
    totals = tc.agg(
        F.sum("ct").alias("nt"),
        F.sum("cr").alias("nr"),
        F.count(F.lit(1)).alias("vocab"),
    )
    lr = F.round(
        F.log((F.col("ct") + F.lit(1.0)) / (F.col("nt") + F.col("vocab")))
        - F.log((F.col("cr") + F.lit(1.0)) / (F.col("nr") + F.col("vocab"))),
        9,
    ).cast("decimal(18,9)")
    model = tc.crossJoin(F.broadcast(totals)).select("tok", lr.alias("lr"))
    return (
        tf.where(~is_t)
        .join(model, "tok")
        .groupBy("doc_id")
        .agg(
            # tf must be DECIMAL(10,0): bigint×decimal(18,9) widens past
            # precision 38 and Spark REDUCES the result scale to 8,
            # rounding every term at 1e-8. round the exact DECIMAL sum,
            # THEN cast: sums live on the 1e-9 grid where 6-dp ties are
            # common, and double-round tie-breaking is engine-specific
            F.round(
                F.sum(F.col("tf").cast("decimal(10,0)") * F.col("lr")), 6
            )
            .cast("double")
            .alias("log_weight"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# ccnet_perplexity_buckets — per-language head/middle/tail LM terciles
# ---------------------------------------------------------------------------

# CCNet (Wenzek et al. 2020): bucket each document into head / middle /
# tail by language-model perplexity terciles WITHIN its language — the
# standard web-corpus quality partitioning (head feeds pretraining,
# tail gets dropped or re-filtered). Our LM is the in-repo corpus
# unigram model (the unigram_logprob_quality score; higher avg_logprob
# = lower perplexity = better). Tercile cutpoints come from a
# DETERMINISTIC 20% hash sample — CCNet itself computes cutoffs on a
# sample, and at 100 TB per-language rank windows over the full corpus
# would funnel each language into one task; the sample bounds that
# window while bucketing stays a map-side comparison against two
# broadcast cutpoints per language.
CCNET_SAMPLE_PCT = 20

_CCNET_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
  FROM documents
),
freq AS (
  SELECT tok, count(*) AS n_tok FROM toks GROUP BY tok
),
n AS (SELECT sum(n_tok) AS n_total FROM freq),
scored AS (
  SELECT t.doc_id, t.lang,
         CAST(round(ln(CAST(f.n_tok AS DOUBLE) / n.n_total), 9)
              AS DECIMAL(18,9)) AS lp
  FROM toks t JOIN freq f ON f.tok = t.tok CROSS JOIN n
),
docs AS (
  SELECT doc_id, lang,
         round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob
  FROM scored GROUP BY doc_id, lang
),
ranked AS (
  SELECT lang, avg_logprob,
         row_number() OVER (PARTITION BY lang
                            ORDER BY avg_logprob DESC, doc_id) AS rn,
         count(*) OVER (PARTITION BY lang) AS n
  FROM docs
  WHERE {_bucket_sql("doc_id")} < {CCNET_SAMPLE_PCT}
),
cuts AS (
  SELECT lang,
         max(CASE WHEN rn = (n + 2) // 3 THEN avg_logprob END)
           AS cut_head,
         max(CASE WHEN rn = (2 * n + 2) // 3 THEN avg_logprob END)
           AS cut_middle
  FROM ranked GROUP BY lang
)
SELECT d.doc_id, d.lang, d.avg_logprob,
       CASE WHEN c.cut_head IS NOT NULL
                 AND d.avg_logprob >= c.cut_head THEN 'head'
            WHEN c.cut_middle IS NOT NULL
                 AND d.avg_logprob >= c.cut_middle THEN 'middle'
            ELSE 'tail' END AS bucket
FROM docs d LEFT JOIN cuts c USING (lang)
"""


@_register("ccnet_perplexity_buckets", _CCNET_ORACLE)
def q_ccnet_perplexity_buckets(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CCNet head/middle/tail partitioning (Wenzek et al. 2020): every
    document bucketed by corpus-LM quality terciles within its
    language. Cutpoints are discrete sample values (percentile_disc
    semantics via rank arithmetic — an actual score from the sample,
    never an interpolated float), so cross-engine parity needs no new
    float algebra: the score is the hash-green unigram_logprob_quality
    expression, and every comparison is between doubles both engines
    already agree on bit-for-bit.

    Plan: the scored frame stages once (one corpus explode + the
    vocabulary-sized model join); the rank window runs over the 20%
    hash sample only (per-language task bounded by the sample, the
    documented CCNet approach); cutpoints are a |langs|-row broadcast
    and final bucketing is a map-side CASE. Ties at a cutpoint go to
    the better bucket deterministically (>= against a discrete sample
    value)."""
    return ccnet_perplexity_buckets(
        catalog.load_table(spark, sf_dir, "documents")
    )


def ccnet_perplexity_buckets(
    d: DataFrame, sample_pct: int = CCNET_SAMPLE_PCT
) -> DataFrame:
    """Parameterized kernel behind ``ccnet_perplexity_buckets``
    (fixtures pass sample_pct=100 so cutpoints are exact terciles of
    the whole corpus)."""
    from .. import session

    toks = d.select(
        "doc_id", "lang", F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    freq = session.stage(
        toks.groupBy("tok").agg(F.count(F.lit(1)).alias("n_tok"))
    )
    n = freq.agg(F.sum("n_tok").cast("long").alias("n_total"))
    lp = F.round(
        F.log(F.col("n_tok").cast("double") / F.col("n_total")), 9
    ).cast("decimal(18,9)")
    docs = session.stage(
        toks.join(freq, "tok")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "lang", lp.alias("lp"))
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.sum("lp").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob")
        )
    )
    w = Window.partitionBy("lang").orderBy(
        F.desc("avg_logprob"), F.asc("doc_id")
    )
    ranked = (
        docs.where(_bucket_col(F.col("doc_id")) < sample_pct)
        .select(
            "lang",
            "avg_logprob",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n"),
        )
    )
    cuts = ranked.groupBy("lang").agg(
        F.max(
            F.when(F.col("rn") == F.expr("(n + 2) div 3"), F.col("avg_logprob"))
        ).alias("cut_head"),
        F.max(
            F.when(
                F.col("rn") == F.expr("(2 * n + 2) div 3"),
                F.col("avg_logprob"),
            )
        ).alias("cut_middle"),
    )
    bucket = (
        F.when(
            F.col("cut_head").isNotNull()
            & (F.col("avg_logprob") >= F.col("cut_head")),
            F.lit("head"),
        )
        .when(
            F.col("cut_middle").isNotNull()
            & (F.col("avg_logprob") >= F.col("cut_middle")),
            F.lit("middle"),
        )
        .otherwise(F.lit("tail"))
    )
    return docs.join(F.broadcast(cuts), "lang", "left").select(
        "doc_id", "lang", "avg_logprob", bucket.alias("bucket")
    )


# ---------------------------------------------------------------------------
# ewma_smoothing — exponentially weighted moving average (stateful recurrence)
# ---------------------------------------------------------------------------

_EWMA_ALPHA = 0.3

# The oracle replays the recurrence with a recursive CTE; the engine side
# replays it with the SAME double expression (0.3·x + 0.7·y), so results
# are bit-identical (both multiply-adds are individually correctly
# rounded with identical operands — no libm involvement).
_EWMA_ORACLE = f"""
WITH RECURSIVE seq AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
ew AS (
  SELECT user_id, event_id, rn, value AS y
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn,
         {_EWMA_ALPHA}e0 * s.value + {1 - _EWMA_ALPHA}e0 * ew.y
  FROM seq s JOIN ew ON s.user_id = ew.user_id AND s.rn = ew.rn + 1
)
SELECT user_id, event_id, round(y, 6) AS ewma
FROM ew
"""


@_register("ewma_smoothing", _EWMA_ORACLE)
def q_ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user EWMA smoothing of the value stream —
    y_t = α·x_t + (1−α)·y_{t−1}, α = 0.3 — the standard denoiser for
    irregular sensor streams (and the batch twin of what a stateful
    streaming smoother keeps in its key state).

    This is the one genuinely sequential recurrence in the repo: the
    closed-form window spelling y_t = Σ α(1−α)^{t−i}x_i needs
    (1−α)^{−i} factors that overflow double past ~2¹⁰ elements, so it
    cannot ship at real per-key stream lengths. Instead each key's
    series runs through an Arrow-batched ``applyInPandas`` kernel —
    keys process in parallel (the shuffle is the groupBy), state is
    O(1) per key, and the recurrence uses the exact double expression
    the oracle's recursive CTE uses (bit-identical results; both
    multiply-adds are correctly rounded with identical operands)."""
    ev = catalog.load_table(spark, sf_dir, "events")

    def smooth(pdf):
        import numpy as np

        pdf = pdf.sort_values(["ts", "event_id"])
        x = pdf["value"].to_numpy(dtype="float64")
        y = np.empty_like(x)
        acc = x[0] if len(x) else 0.0
        for i, v in enumerate(x):
            acc = v if i == 0 else _EWMA_ALPHA * v + (1 - _EWMA_ALPHA) * acc
            y[i] = acc
        out = pdf[["user_id", "event_id"]].copy()
        out["ewma"] = np.floor(y * 1e6 + 0.5) / 1e6
        return out

    return (
        ev.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(smooth, "user_id long, event_id long, ewma double")
    )


# ---------------------------------------------------------------------------
# temperature_mix_sample — temperature-scaled domain rebalancing
# ---------------------------------------------------------------------------

_MIX_TAU_NOTE = "tau = 0.5 (sqrt scaling)"
_MIX_TARGET = 250  # sampled corpus size the rates aim for

_TEMP_MIX_ORACLE = f"""
WITH n AS (
  SELECT lang, count(*) AS n_l FROM documents GROUP BY lang
),
w AS (
  SELECT lang, n_l,
         CAST(round(sqrt(CAST(n_l AS DOUBLE)), 9) AS DOUBLE) AS w_l,
         CAST(round(sqrt(CAST(n_l AS DOUBLE)), 9)
              AS DECIMAL(18,9)) AS w_dec
  FROM n
),
r AS (
  SELECT lang, n_l,
         least(1.0e0,
               (({_MIX_TARGET}.0e0 * w_l)
                / CAST((SELECT sum(w_dec) FROM w) AS DOUBLE)) / n_l)
           AS rate
  FROM w
)
SELECT d.doc_id, d.lang, round(r.rate, 6) AS rate
FROM documents d JOIN r ON r.lang = d.lang
WHERE ((((d.doc_id % 4294967296) * {_MMH2} % 4294967296) + 0.5e0)
       / 4294967296.0e0) < r.rate
"""


@_register("temperature_mix_sample", _TEMP_MIX_ORACLE)
def q_temperature_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled training-mix sampling: per-domain keep rates
    derived from the corpus itself — domain weight n^τ with τ = 0.5, so
    small domains are up-weighted relative to their share (the standard
    multilingual/multi-domain rebalancing; τ = 1 is proportional, τ = 0
    uniform) — then a deterministic per-row hash filter at the derived
    rate. Complements stratified_sample, whose rates are a FIXED recipe;
    here they are computed from the data.

    Determinism engineering: the only non-algebraic step is sqrt (IEEE
    correctly rounded — bit-identical cross-engine); per-domain weights
    round to 9 dp and SUM as DECIMAL (order-independent), and every
    remaining op (multiply/divide/compare against the exact hash
    uniform) is correctly rounded, so the kept SET is bit-identical on
    both engines. Plan: domain weights are a |domains|-row aggregate
    broadcast back onto a single scan filter — embarrassingly parallel,
    like every sampler here."""
    d = catalog.load_table(spark, sf_dir, "documents")
    n = d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l"))
    w_l = F.round(F.sqrt(F.col("n_l").cast("double")), 9)
    w = n.select(
        "lang",
        "n_l",
        w_l.alias("w_l"),
        w_l.cast("decimal(18,9)").alias("w_dec"),
    )
    sumw = w.agg(F.sum("w_dec").cast("double").alias("sum_w"))
    r = w.crossJoin(F.broadcast(sumw)).select(
        "lang",
        F.least(
            F.lit(1.0),
            (F.lit(float(_MIX_TARGET)) * F.col("w_l") / F.col("sum_w"))
            / F.col("n_l"),
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
    return (
        d.join(F.broadcast(r), "lang")
        .where(u < F.col("rate"))
        .select("doc_id", "lang", F.round("rate", 6).alias("rate"))
    )


# ---------------------------------------------------------------------------
# sample_exact_k_per_group — deterministic fixed-size per-stratum sample
# ---------------------------------------------------------------------------

_EXACT_K = 20

_EXACTK_ORACLE = f"""
SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ((doc_id % 4294967296) * {_MMH2} % 4294967296), doc_id
         ) AS rk
  FROM documents)
WHERE rk <= {_EXACT_K}
"""


@_register("sample_exact_k_per_group", _EXACTK_ORACLE)
def q_sample_exact_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACTLY k documents per stratum (min(k, |stratum|)) — the balanced
    eval-set primitive the Bernoulli samplers cannot give (their counts
    are binomial-variable): rank each stratum by the deterministic key
    hash and keep the first k. Reproducible across runs, engines and
    cluster sizes, and uniform within the stratum (the hash order is a
    fixed pseudo-random permutation).

    Plan: the rank-≤-k filter compiles to WindowGroupLimit — per-stratum
    top-k heaps inside the (lang) partitions, never a full per-stratum
    sort (pinned in test_plans). Integer-only key hash, overflow-safe at
    any int64 id."""
    d = catalog.load_table(spark, sf_dir, "documents")
    h = (
        (F.col("doc_id") % F.lit(4294967296))
        * F.lit(_MMH2)
        % F.lit(4294967296)
    )
    w = Window.partitionBy("lang").orderBy(h, "doc_id")
    return (
        d.select("doc_id", "lang", F.row_number().over(w).alias("rk"))
        .where(F.col("rk") <= _EXACT_K)
        .select("doc_id", "lang", F.col("rk").cast("long").alias("rk"))
    )


# ---------------------------------------------------------------------------
# bigram_logprob_quality — second-order corpus-LM document scoring
# ---------------------------------------------------------------------------

_BIGRAM_ALPHA_NUM = 1  # add-α smoothing as an exact rational: α = 1/2
_BIGRAM_ALPHA_DEN = 2

_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
bigrams AS (
  SELECT doc_id, tok AS w1,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
bg AS (
  SELECT w1, w2, count(*) AS c12
  FROM bigrams WHERE w2 IS NOT NULL GROUP BY w1, w2
),
ctx AS (
  SELECT w1, sum(c12) AS c1 FROM bg GROUP BY w1
),
v AS (
  SELECT count(DISTINCT tok) AS vocab FROM toks
),
scored AS (
  SELECT b.doc_id,
         CAST(round(ln(
             (2e0 * bg.c12 + 1e0) / (2e0 * ctx.c1 + 1e0 * v.vocab)
         ), 9) AS DECIMAL(18,9)) AS lp
  FROM bigrams b
  JOIN bg  ON bg.w1 = b.w1 AND bg.w2 = b.w2
  JOIN ctx ON ctx.w1 = b.w1
  CROSS JOIN v
  WHERE b.w2 IS NOT NULL
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_bigrams,
       round(CAST(sum(lp) AS DOUBLE) / count(*), 6) AS avg_logprob
FROM scored
GROUP BY doc_id
"""


@_register("bigram_logprob_quality", _BIGRAM_ORACLE)
def q_bigram_logprob_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second-order corpus-LM quality score: train an add-α-smoothed
    bigram model on the corpus itself and score each document by its
    mean bigram log-probability ln P(w_i | w_{i-1}) — a sharper
    perplexity proxy than ``unigram_logprob_quality`` (it penalizes
    shuffled/templated token soups the unigram model scores as fluent),
    the standard second step of the cheap LM-filter ladder.

    Model: P(w2|w1) = (c(w1,w2) + α) / (c(w1,·) + α·V), α = 1/2,
    V = corpus vocabulary size, c(w1,·) = Σ_w2 c(w1,w2) (exact context
    totals — the last token of a doc is not a context). Both the
    numerator and denominator are spelled as the exact integer algebra
    2·c12 + 1 / 2·c1 + V so ln's operand is the identical correctly
    rounded double on both engines; per-bigram log-probs round to 9 dp
    and accumulate in DECIMAL(18,9) → order-independent per-doc means.

    Plan: bigram extraction is ONE per-doc ``lead`` window (local sorts
    within doc_id partitions — no positional self-join); the bigram
    stream is STAGED and feeds (a) the observed-bigram count aggregate
    (also staged — it is the model), (b) the scoring join, keyed
    (w1, w2) → co-partitioned with the counts. Context totals and V are
    model-table-sized reductions over the cached aggregate (V additionally
    counts last-position-only tokens via one distinct over the same
    staged bigram columns plus doc tails — spelled as a distinct over
    the token stream, a vocabulary-sized Heaps-law aggregate AQE
    broadcasts). No corpus scan runs more than twice."""
    from .. import session

    d = catalog.load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = session.stage(
        toks.select(
            "doc_id",
            F.col("tok").alias("w1"),
            F.lead("tok").over(w).alias("w2"),
        ).where(F.col("w2").isNotNull())
    )
    bg = session.stage(
        bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    )
    ctx = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = toks.agg(
        F.countDistinct("tok").cast("long").alias("vocab")
    )
    lp = F.round(
        F.log(
            (2.0 * F.col("c12") + 1.0)
            / (2.0 * F.col("c1") + 1.0 * F.col("vocab"))
        ),
        9,
    ).cast("decimal(18,9)")
    return (
        bigrams.join(bg, ["w1", "w2"])
        .join(ctx, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", lp.alias("lp"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("lp").cast("double") / F.count(F.lit(1)), 6
            ).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# holt_linear_smoothing — double exponential smoothing (level + trend)
# ---------------------------------------------------------------------------

_HOLT_ALPHA = 0.4
_HOLT_BETA = 0.2

_HOLT_ORACLE = f"""
WITH RECURSIVE seq AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
),
h AS (
  SELECT user_id, event_id, rn,
         value AS l, 0.0e0 AS b
  FROM seq WHERE rn = 1
  UNION ALL
  SELECT s.user_id, s.event_id, s.rn,
         {_HOLT_ALPHA}e0 * s.value + {1 - _HOLT_ALPHA}e0 * (h.l + h.b),
         {_HOLT_BETA}e0 * (({_HOLT_ALPHA}e0 * s.value
                            + {1 - _HOLT_ALPHA}e0 * (h.l + h.b)) - h.l)
           + {1 - _HOLT_BETA}e0 * h.b
  FROM seq s JOIN h ON s.user_id = h.user_id AND s.rn = h.rn + 1
)
SELECT user_id, event_id,
       floor(l * 1000000 + 0.5) / 1000000.0e0       AS level,
       floor(b * 1000000 + 0.5) / 1000000.0e0       AS trend,
       floor((l + b) * 1000000 + 0.5) / 1000000.0e0 AS forecast_1
FROM h
"""


@_register("holt_linear_smoothing", _HOLT_ORACLE)
def q_holt_linear_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt's linear (double exponential) smoothing per user —
    lₜ = α·xₜ + (1−α)(lₜ₋₁+bₜ₋₁), bₜ = β(lₜ−lₜ₋₁) + (1−β)bₜ₋₁ with
    l₁ = x₁, b₁ = 0 — plus the one-step-ahead forecast l+b (Holt 1957;
    the trend-aware sibling of ``q_ewma_smoothing``).

    Like EWMA/CUSUM this is a genuinely sequential recurrence: an
    Arrow-batched ``applyInPandas`` kernel per key (O(1) state — two
    doubles) against a recursive-CTE oracle carrying (l, b); both
    engines apply the identical multiply-add expressions so raw state
    is bit-equal and the 6 dp outputs hash-match."""
    ev = catalog.load_table(spark, sf_dir, "events")

    def holt(pdf):
        import math

        pdf = pdf.sort_values(["ts", "event_id"])
        xs = pdf["value"].to_numpy(dtype="float64")
        out_l, out_b, out_f = [], [], []
        l = b = 0.0
        for i, x in enumerate(xs):
            if i == 0:
                l, b = x, 0.0
            else:
                l_new = _HOLT_ALPHA * x + (1 - _HOLT_ALPHA) * (l + b)
                b = _HOLT_BETA * (l_new - l) + (1 - _HOLT_BETA) * b
                l = l_new
            out_l.append(math.floor(l * 1e6 + 0.5) / 1e6)
            out_b.append(math.floor(b * 1e6 + 0.5) / 1e6)
            out_f.append(math.floor((l + b) * 1e6 + 0.5) / 1e6)
        res = pdf[["user_id", "event_id"]].copy()
        res["level"] = out_l
        res["trend"] = out_b
        res["forecast_1"] = out_f
        return res

    return (
        ev.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(
            holt,
            "user_id long, event_id long, level double, trend double, "
            "forecast_1 double",
        )
    )


# ---------------------------------------------------------------------------
# collocation_pmi_bigrams — PMI-scored adjacent-token collocations
# ---------------------------------------------------------------------------

_PMI_MIN_COUNT = 5  # support floor: rare bigrams have unstable PMI

_PMI_ORACLE = f"""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
),
bigrams AS (
  SELECT doc_id, tok AS w1,
         lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
),
bg AS (
  SELECT w1, w2, count(*) AS c12
  FROM bigrams WHERE w2 IS NOT NULL GROUP BY w1, w2
),
lm AS (SELECT w1, sum(c12) AS c1 FROM bg GROUP BY w1),
rm AS (SELECT w2, sum(c12) AS c2 FROM bg GROUP BY w2),
n AS (SELECT sum(c12) AS n FROM bg)
SELECT bg.w1, bg.w2, CAST(bg.c12 AS BIGINT) AS c12,
       round(ln(CAST(bg.c12 * n.n AS DOUBLE)
                / CAST(lm.c1 * rm.c2 AS DOUBLE)), 6) AS pmi
FROM bg
JOIN lm ON lm.w1 = bg.w1
JOIN rm ON rm.w2 = bg.w2
CROSS JOIN n
WHERE bg.c12 >= {_PMI_MIN_COUNT}
"""


@_register("collocation_pmi_bigrams", _PMI_ORACLE)
def q_collocation_pmi_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocation mining: pointwise mutual information of adjacent
    token pairs, PMI = ln(P(w1,w2) / (P(w1·)·P(·w2))) over the corpus
    bigram distribution — the classic phrase/multi-word-expression
    detector (Church & Hanks, "Word Association Norms, Mutual
    Information, and Lexicography", CL 1990) used to decide which
    n-grams deserve single tokens in a tokenizer vocabulary.

    Marginals are the LEFT/RIGHT margins of the bigram table itself
    (exact, and derived from the model aggregate — no extra corpus
    scan); PMI's ln operand is spelled as one exact-integer ratio so
    both engines round the identical double. The ``c12 >= 5`` support
    floor (standard: PMI is unstable on rare pairs) keeps the output
    the interesting collocations and bounds it at scale.

    Plan: bigram extraction is the same per-doc ``lead`` window as
    ``bigram_logprob_quality`` (no positional self-join); everything
    after is model-table-sized — the bigram aggregate is staged once
    and its three reductions (left margin, right margin, grand total)
    broadcast back onto it. The corpus is scanned exactly once."""
    from .. import session

    d = catalog.load_table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.posexplode(F.split(F.col("text"), " ")).alias("pos", "tok"),
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    bigrams = toks.select(
        "doc_id",
        F.col("tok").alias("w1"),
        F.lead("tok").over(w).alias("w2"),
    ).where(F.col("w2").isNotNull())
    bg = session.stage(
        bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    )
    lm = bg.groupBy("w1").agg(F.sum("c12").alias("c1"))
    rm = bg.groupBy("w2").agg(F.sum("c12").alias("c2"))
    n = bg.agg(F.sum("c12").alias("n"))
    return (
        bg.where(F.col("c12") >= _PMI_MIN_COUNT)
        .join(lm, "w1")
        .join(rm, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("long").alias("c12"),
            F.round(
                F.log(
                    (F.col("c12") * F.col("n")).cast("double")
                    / (F.col("c1") * F.col("c2")).cast("double")
                ),
                6,
            ).alias("pmi"),
        )
    )


# ---------------------------------------------------------------------------
# tokens_zipf_fit — corpus-health check: does the vocabulary obey Zipf?
# ---------------------------------------------------------------------------

_ZIPF_TOP = 200  # fit over the head of the distribution

_ZIPF_ORACLE = f"""
WITH freq AS (
  SELECT tok, count(*) AS c
  FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY tok
),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS r
  FROM freq
),
pts AS (
  SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(c AS DOUBLE)) AS y
  FROM ranked WHERE r <= {_ZIPF_TOP}
)
SELECT CAST(count(*) AS BIGINT) AS n_points,
       round(covar_pop(x, y) / nullif(var_pop(x), 0), 6)  AS zipf_slope,
       round(avg(y) - covar_pop(x, y) / nullif(var_pop(x), 0) * avg(x), 6)
         AS intercept,
       round(corr(x, y) * corr(x, y), 6) AS r2
FROM pts
"""


@_register("tokens_zipf_fit", _ZIPF_ORACLE)
def q_tokens_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-statistics health check: OLS fit of log-frequency on
    log-rank over the top-{_ZIPF_TOP} vocabulary head. Natural text
    fits slope ≈ −1 with high R² (Zipf, "Human Behavior and the
    Principle of Least Effort", 1949); a flat slope or poor fit is the
    classic signature of templated/synthetic/boilerplate contamination
    — a one-row dashboard number for an LLM-corpus intake gate.

    Plan: one token-frequency aggregate (vocabulary-sized), a top-k
    rank over it with a deterministic (count desc, token) order, and a
    1-row sufficient-statistics fit. The corpus is scanned once; the
    fit input is {_ZIPF_TOP} rows."""
    d = catalog.load_table(spark, sf_dir, "documents")
    freq = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    ).groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    ranked = freq.select(
        "c",
        F.row_number()
        .over(Window.orderBy(F.col("c").desc(), F.col("tok")))
        .alias("r"),
    ).where(F.col("r") <= _ZIPF_TOP)
    pts = ranked.select(
        F.log(F.col("r").cast("double")).alias("x"),
        F.log(F.col("c").cast("double")).alias("y"),
    )
    slope = F.try_divide(F.covar_pop("x", "y"), F.var_pop("x"))
    return pts.agg(
        F.count(F.lit(1)).cast("long").alias("n_points"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(F.avg("y") - slope * F.avg("x"), 6).alias("intercept"),
        F.round(F.corr("x", "y") * F.corr("x", "y"), 6).alias("r2"),
    )
