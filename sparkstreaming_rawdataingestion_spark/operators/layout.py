"""Data-layout operators: Z-order (Morton) clustering for multi-column
data skipping.

At 100 TB a scan's cost is dominated by how many files/row-groups the
predicate can SKIP via parquet min/max statistics. Sorting by one column
gives perfect skipping on that column and none on the others; Z-ordering
interleaves the bits of several quantized columns so that a range
predicate on ANY subset of them maps to a small number of contiguous
z-ranges — every dimension gets usable min/max locality in the same
single layout.

Everything here is pure JVM column algebra (shift/and/or — inside
whole-stage codegen); the layout write is one range-repartition + local
sort, exactly the shuffle a layout job must pay. No UDFs, no driver-side
work beyond a 1-row min/max bounds aggregate.

Generalizes the reference's single-column day-partitioned layout
(RawDataIngestion.java:137,152 — day buckets as the only pruning axis)
to multi-dimensional locality.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession, Window, functions as F

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


def interleave_bits(cols: list[Column], bits: int = 8) -> Column:
    """Morton-interleave ``bits`` low bits of each (non-negative int)
    column: bit ``b`` of column ``i`` lands at output bit
    ``b * len(cols) + i``. Unrolled shift/and/or — stays in codegen."""
    n = len(cols)
    parts = [
        F.shiftleft(
            F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1)),
            b * n + i,
        )
        for i, c in enumerate(cols)
        for b in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def quantize(c: Column, lo: Column, hi: Column, bits: int = 8) -> Column:
    """Scale a numeric column into ``[0, 2**bits)`` given bounds.
    Degenerate ranges (lo == hi) map to bucket 0."""
    buckets = F.lit(2**bits)
    span = (hi.cast("double") - lo.cast("double"))
    raw = F.floor((c.cast("double") - lo) / span * buckets)
    return (
        F.when(span == 0, F.lit(0))
        .otherwise(F.least(raw, buckets - 1))
        .cast("long")
    )


def zorder_layout(
    df: DataFrame, cols: list[str], bits: int = 8, n_files: int = 32
) -> DataFrame:
    """Cluster ``df`` for writing: quantize ``cols`` against their
    observed min/max (one tiny agg, broadcast back), Morton-interleave,
    range-partition on the z-value and sort within partitions. The
    result streams straight into ``.write.parquet`` — each output file
    covers a compact z-range, so min/max stats on EVERY z-ordered
    column become selective.

    The bounds agg is a 1-row broadcast join — at 100 TB that is one
    cheap extra pass (or reuse catalog stats); the range partition is
    the same shuffle any layout rewrite pays."""
    bounds = df.agg(
        *[F.min(c).alias(f"__lo_{c}") for c in cols],
        *[F.max(c).alias(f"__hi_{c}") for c in cols],
    )
    with_bounds = df.join(F.broadcast(bounds))
    z = interleave_bits(
        [
            quantize(
                F.col(c), F.col(f"__lo_{c}"), F.col(f"__hi_{c}"), bits
            )
            for c in cols
        ],
        bits,
    )
    return (
        with_bounds.withColumn("_zorder", z)
        .drop(*[f"__lo_{c}" for c in cols], *[f"__hi_{c}" for c in cols])
        .repartitionByRange(n_files, "_zorder")
        .sortWithinPartitions("_zorder")
    )


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "day",
    target_files: int = 1,
    partitions: list[str] | None = None,
) -> None:
    """Small-file compaction for append-mode (streaming) sinks.

    A micro-batch file sink writes one-or-more files per trigger, so a
    day partition accumulates hundreds of small files — at 100 TB the
    scan's task-scheduling and footer-read overhead comes to dominate.
    This maintenance pass rewrites the targeted partitions with at most
    ``target_files`` files each and leaves every other partition's files
    untouched (dynamic partition overwrite — the same mechanism as the
    upsert sink, sinks.py).

    Layout mechanics: rows are shuffled on (partition, bucket) where
    bucket is a DETERMINISTIC hash of the data columns mod
    ``target_files`` — each partition's rows land in ≤ target_files
    reduce tasks, hence ≤ target_files output files, and a re-run
    produces the identical layout (idempotent maintenance).

    Durability: the compacted data is first written COMPLETELY to a
    sibling temp directory (the source partitions stay untouched while
    the job runs — no read-your-own-overwrite, no checkpointing), then
    each partition directory is swapped in with two filesystem metadata
    ops (delete old, rename new). A failure during the write phase
    leaves the table intact; a failure mid-swap can lose at most the one
    partition whose delete committed before its rename — its files
    remain in the temp directory for recovery, and the temp directory is
    only removed after every swap succeeds. (Plain parquet has no atomic
    multi-file commit; a table format — Delta/Iceberg — is the fully
    atomic version of this maintenance pass.)
    """
    df = spark.read.parquet(path)
    if partitions is not None:
        df = df.where(F.col(partition_col).isin(partitions))
    data_cols = [c for c in df.columns if c != partition_col]
    bucket = F.pmod(F.xxhash64(*[F.col(c) for c in data_cols]), target_files)
    tmp = path.rstrip("/") + "._compact_tmp"
    (
        df.repartition(F.col(partition_col), bucket)
        .write.partitionBy(partition_col)
        .mode("overwrite")
        .parquet(tmp)
    )
    jvm = spark._jvm
    HPath = jvm.org.apache.hadoop.fs.Path
    fs = HPath(tmp).getFileSystem(spark._jsc.hadoopConfiguration())
    for status in fs.listStatus(HPath(tmp)):
        name = status.getPath().getName()
        if not (status.isDirectory() and name.startswith(f"{partition_col}=")):
            continue
        dest = HPath(path.rstrip("/"), name)
        fs.delete(dest, True)
        fs.rename(status.getPath(), dest)
    # all swaps committed — the temp dir (now only _SUCCESS etc.) can go;
    # on a mid-swap failure this line is never reached and the temp dir
    # keeps the recovery copy.
    fs.delete(HPath(tmp), True)


@_register(
    "layout_zorder_key",
    """
WITH q AS (
  SELECT o_orderkey,
         o_orderkey % 256 AS x,
         o_custkey  % 256 AS y
  FROM orders
)
SELECT o_orderkey,
       CAST(x AS BIGINT) AS x,
       CAST(y AS BIGINT) AS y,
       CAST(
         (((x >> 0) & 1) << 0)  + (((y >> 0) & 1) << 1)  +
         (((x >> 1) & 1) << 2)  + (((y >> 1) & 1) << 3)  +
         (((x >> 2) & 1) << 4)  + (((y >> 2) & 1) << 5)  +
         (((x >> 3) & 1) << 6)  + (((y >> 3) & 1) << 7)  +
         (((x >> 4) & 1) << 8)  + (((y >> 4) & 1) << 9)  +
         (((x >> 5) & 1) << 10) + (((y >> 5) & 1) << 11) +
         (((x >> 6) & 1) << 12) + (((y >> 6) & 1) << 13) +
         (((x >> 7) & 1) << 14) + (((y >> 7) & 1) << 15)
       AS BIGINT) AS zval
FROM q
""",
)
def q_layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Morton interleave itself, verified bit-for-bit against the
    oracle's explicit shift/mask arithmetic (8 bits × 2 dims)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    x = (F.col("o_orderkey") % 256).cast("long")
    y = (F.col("o_custkey") % 256).cast("long")
    return o.select(
        "o_orderkey",
        x.alias("x"),
        y.alias("y"),
        interleave_bits([x, y], bits=8).alias("zval"),
    )


# ---------------------------------------------------------------------------
# train_val_test_split — deterministic portable holdout assignment
# ---------------------------------------------------------------------------

_SPLIT_TRAIN_PCT = 80
_SPLIT_VAL_PCT = 10  # test gets the remainder


def _split_oracle() -> str:
    from .profiling import _bucket_sql

    b = _bucket_sql("doc_id")
    return f"""
SELECT doc_id, lang, source,
       CASE WHEN {b} < {_SPLIT_TRAIN_PCT} THEN 'train'
            WHEN {b} < {_SPLIT_TRAIN_PCT + _SPLIT_VAL_PCT} THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


@_register("train_val_test_split", _split_oracle())
def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 holdout manifest: each document's split
    follows from a portable multiplicative hash of its id — stable
    across runs, engines, cluster sizes and data order, so the test set
    never bleeds into training when the corpus is re-processed (the
    property a ``rand()``-based split silently lacks), and an appended
    document joins a split without moving any existing one.

    Pure map over the scan (codegen, no shuffle, no state); the
    manifest joins back to any derived table on doc_id. The same
    mod-2³² multiplicative hash as the stratified/temperature samplers
    (profiling._bucket_sql) — one shared hash family keeps every
    sampling/split decision reproducible from doc_id alone."""
    from .profiling import _bucket_col

    d = catalog.load_table(spark, sf_dir, "documents")
    b = _bucket_col(F.col("doc_id"))
    return d.select(
        "doc_id",
        "lang",
        "source",
        F.when(b < _SPLIT_TRAIN_PCT, F.lit("train"))
        .when(b < _SPLIT_TRAIN_PCT + _SPLIT_VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


# ---------------------------------------------------------------------------
# tokens_budget_allocation — greedy per-source token budget by quality
# ---------------------------------------------------------------------------

TOKEN_BUDGET_PER_SOURCE = 300

_BUDGET_ORACLE = f"""
WITH scored AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
         n_chars AS quality
  FROM documents
),
ranked AS (
  SELECT *,
         sum(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM scored
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM ranked
WHERE cum_tokens - n_tokens < {TOKEN_BUDGET_PER_SOURCE}
"""


@_register("tokens_budget_allocation", _BUDGET_ORACLE)
def q_tokens_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget selection: within each source, take documents
    in quality order (n_chars proxy, doc_id tiebreak) until the source's
    token budget is exhausted — a document is admitted iff the budget
    was not already spent when its turn came (so the last admitted doc
    may overshoot; the standard greedy-prefix semantics). This is the
    per-source allocation step of a corpus-assembly run: budgets come
    from the mixture plan, selection must be deterministic and
    replayable.

    One per-source window (bounded by source size) over a pre-reduced
    (doc, tokens) projection — token counting never leaves the scan
    stage, and no global ordering exists anywhere in the plan."""
    d = catalog.load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        F.col("n_chars").alias("quality"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return ranked.where(
        F.col("cum_tokens") - F.col("n_tokens") < TOKEN_BUDGET_PER_SOURCE
    ).select(
        "doc_id", "source", "n_tokens",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )


# ---------------------------------------------------------------------------
# tokens_budget_subword — the same greedy budget, in REAL tokenizer units
# ---------------------------------------------------------------------------

# Production budgets are counted in tokenizer tokens, not whitespace
# words — this is the subword upgrade of tokens_budget_allocation
# promised by text.tokenizer_greedy_subword's docstring. The budget is
# larger than the word budget because every multi-piece word inflates
# the count (the fixture vocab averages ~1.2 pieces/word).
SUBWORD_BUDGET_PER_SOURCE = 360


def _subword_budget_oracle() -> str:
    from .text import greedy_fold_ctes

    return f"""
WITH RECURSIVE
{greedy_fold_ctes()},
doc_toks AS (
  SELECT doc_id, CAST(sum(n_tok) AS BIGINT) AS n_tokens
  FROM words JOIN fin USING (w) GROUP BY doc_id
),
scored AS (
  SELECT d.doc_id, d.source, t.n_tokens, d.n_chars AS quality
  FROM documents d JOIN doc_toks t USING (doc_id)
),
ranked AS (
  SELECT *,
         sum(n_tokens) OVER (PARTITION BY source
                             ORDER BY quality DESC, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum_tokens
  FROM scored
)
SELECT doc_id, source, n_tokens, CAST(cum_tokens AS BIGINT) AS cum_tokens
FROM ranked
WHERE cum_tokens - n_tokens < {SUBWORD_BUDGET_PER_SOURCE}
"""


@_register("tokens_budget_subword", _subword_budget_oracle())
def q_tokens_budget_subword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy per-source budget selection in SUBWORD tokens: identical
    admission rule to tokens_budget_allocation (quality order, doc_id
    tiebreak, admitted iff the budget wasn't spent when its turn came)
    but n_tokens comes from the frozen-vocab greedy encoder — the unit
    production data mixes are actually planned in.

    Plan shape: the tokenizer is a pure map CARRYING (source, quality)
    through the batch (no re-join against documents — the carry
    pattern), so the whole operator is one scan + one per-source
    window, exactly the word-budget plan with the encoder fused into
    the scan stage. The oracle composes the SHARED greedy-fold CTE
    chain (text.greedy_fold_ctes — one fold definition for every
    consumer) with the same window SQL."""
    d = catalog.load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "source", F.col("n_chars")
    )
    return subword_budget_allocation(d)


def subword_budget_allocation(
    d: DataFrame,
    budget: int = SUBWORD_BUDGET_PER_SOURCE,
    pieces: tuple[str, ...] | None = None,
) -> DataFrame:
    """Parameterized kernel behind ``tokens_budget_subword`` — ``d``
    needs (doc_id, text, source, n_chars)."""
    from .text import VOCAB_GREEDY_PIECES, tokenizer_greedy_subword

    toks = tokenizer_greedy_subword(
        d,
        pieces=pieces or VOCAB_GREEDY_PIECES,
        carry=("source", "n_chars"),
    ).withColumnRenamed("n_chars", "quality")
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("quality").desc(), "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = toks.withColumn("cum_tokens", F.sum("n_tokens").over(w))
    return ranked.where(
        F.col("cum_tokens") - F.col("n_tokens") < budget
    ).select(
        "doc_id", "source", "n_tokens",
        F.col("cum_tokens").cast("long").alias("cum_tokens"),
    )
