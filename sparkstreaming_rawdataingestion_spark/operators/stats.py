"""Statistical & collection aggregates, unpivot, pattern-match filters.

Variance/correlation are computed from *exact decimal power sums* and only
converted to float at the last step — the same bits under any partitioning
(Welford-style streaming moments would be order-dependent and can't be
hash-compared across engines; the power-sum form is the distributed-safe
formulation and is numerically fine at these magnitudes).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

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


def _dsum(c: Column) -> Column:
    return F.sum(c.cast("decimal(18,4)")).cast("double")


def _dsum2(a: Column, b: Column) -> Column:
    return F.sum(
        a.cast("decimal(18,4)") * b.cast("decimal(18,4)")
    ).cast("double")


@_register(
    "stats_moments_pack",
    """
SELECT o_orderstatus,
       CAST(n AS BIGINT) AS n,
       round(sx / n, 6)                                   AS mean_price,
       round((sxx - sx * sx / n) / (n - 1), 4)            AS var_price,
       round(sqrt((sxx - sx * sx / n) / (n - 1)), 6)      AS stddev_price,
       round((n * sxy - sx * sy)
             / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6)
                                                          AS corr_price_key
FROM (
  SELECT o_orderstatus,
         count(*)::DOUBLE                                          AS n,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)  AS sx,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                * CAST(o_totalprice AS DECIMAL(19,4))) AS DOUBLE)  AS sxx,
         CAST(SUM(CAST(o_custkey AS DECIMAL(18,4))) AS DOUBLE)     AS sy,
         CAST(SUM(CAST(o_custkey AS DECIMAL(19,4))
                * CAST(o_custkey AS DECIMAL(19,4))) AS DOUBLE)     AS syy,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(19,4))
                * CAST(o_custkey AS DECIMAL(19,4))) AS DOUBLE)     AS sxy
  FROM orders GROUP BY o_orderstatus)
""",
)
def q_stats_moments_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean / sample variance / stddev / Pearson correlation from exact
    decimal power sums (one shuffle, map-side combinable, order-exact)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    price, key = F.col("o_totalprice"), F.col("o_custkey")
    agg = o.groupBy("o_orderstatus").agg(
        F.count("*").cast("double").alias("n"),
        _dsum(price).alias("sx"),
        _dsum2(price, price).alias("sxx"),
        _dsum(key).alias("sy"),
        _dsum2(key, key).alias("syy"),
        _dsum2(price, key).alias("sxy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy = F.col("sy"), F.col("syy"), F.col("sxy")
    var = (sxx - sx * sx / n) / (n - 1)
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)
    )
    return agg.select(
        "o_orderstatus",
        n.cast("long").alias("n"),
        F.round(sx / n, 6).alias("mean_price"),
        F.round(var, 4).alias("var_price"),
        F.round(F.sqrt(var), 6).alias("stddev_price"),
        F.round(corr, 6).alias("corr_price_key"),
    )


@_register(
    "agg_argminmax_collect",
    """
SELECT user_id,
       arg_max(event_id, ts)                              AS latest_event_id,
       arg_min(event_id, ts)                              AS first_event_id,
       CAST(max_by_v AS DOUBLE)                           AS top_value,
       array_to_string(list_sort(list(DISTINCT event_type)), '|') AS types_sorted,
       string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types_csv,
       bool_or(event_type = 'error')                      AS had_error,
       bool_and(value >= 0)                               AS all_nonneg
FROM events
JOIN (SELECT user_id AS u2, max(value) AS max_by_v FROM events GROUP BY user_id)
  ON u2 = user_id
GROUP BY user_id, max_by_v
""",
)
def q_agg_argminmax_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """min_by/max_by, sorted collect_set, ordered string_agg, bool
    aggregates. (ts is unique per user in the fixtures, so arg_min/arg_max
    are deterministic.) The collect_set result is serialized via
    array_join — scalar output columns only, for the driver canonicalizer."""
    ev = catalog.load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.max_by("event_id", "ts").alias("latest_event_id"),
        F.min_by("event_id", "ts").alias("first_event_id"),
        F.max("value").alias("top_value"),
        F.array_join(F.sort_array(F.collect_set("event_type")), "|").alias(
            "types_sorted"
        ),
        F.array_join(F.sort_array(F.collect_set("event_type")), ",").alias(
            "types_csv"
        ),
        F.bool_or(F.col("event_type") == "error").alias("had_error"),
        F.bool_and(F.col("value") >= 0).alias("all_nonneg"),
    )


@_register(
    "unpivot_measures",
    """
SELECT l_orderkey, l_linenumber, measure, round(val, 4) AS val
FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS measure, l_quantity AS val
  FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount', l_discount FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'tax', l_tax FROM lineitem)
WHERE l_orderkey % 101 = 0
""",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """unpivot/melt: wide measures → long (measure, value) rows."""
    li = catalog.load_table(spark, sf_dir, "lineitem").where(
        F.col("l_orderkey") % 101 == 0
    )
    out = li.unpivot(
        ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "val",
    )
    mapping = F.create_map(
        F.lit("l_quantity"), F.lit("quantity"),
        F.lit("l_discount"), F.lit("discount"),
        F.lit("l_tax"), F.lit("tax"),
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.element_at(mapping, F.col("measure")).alias("measure"),
        F.round("val", 4).alias("val"),
    )


@_register(
    "pattern_match_filters",
    """
SELECT p_partkey, p_name, p_type
FROM part
WHERE p_name LIKE '%spark%'
   OR p_name ILIKE '%RED%'
   OR regexp_matches(p_type, '^(small|large).*[0-9]$')
   OR starts_with(p_brand, 'brand1')
   OR p_type SIMILAR TO '.*(steel|brass)'
""",
)
def q_pattern_match_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE / ILIKE / regexp / prefix predicates (disjunctive — cannot all
    push to parquet, but each is codegen'd; selective LIKEs that can push
    do: see filter_project_pushdown for the pushdown-verified case)."""
    p = catalog.load_table(spark, sf_dir, "part")
    return p.where(
        F.col("p_name").like("%spark%")
        | F.col("p_name").ilike("%RED%")
        | F.col("p_type").rlike("^(small|large).*[0-9]$")
        | F.col("p_brand").startswith("brand1")
        | F.col("p_type").rlike(".*(steel|brass)$")
    ).select("p_partkey", "p_name", "p_type")


# ---------------------------------------------------------------------------
# Mergeable sketches — the scale-native distinct aggregation
# ---------------------------------------------------------------------------


@_register("sketch_mergeable_hll")  # estimates engine-specific → rows-only
def q_sketch_mergeable_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DataSketches HLL re-aggregation: per-day customer sketches merged up
    to per-status totals via hll_union_agg. The point is mergeability —
    daily DISTINCT COUNTS cannot be re-aggregated (they double-count),
    daily SKETCHES can, which is how a 100 TB pipeline serves distinct
    counts at any rollup level from one pass of partials. The estimate
    error vs the exact distinct is pinned in tests (rows-only to the
    driver: sketch binary/estimates are engine-specific)."""
    o = catalog.load_table(spark, sf_dir, "orders")
    o.createOrReplaceTempView("orders_sk")
    return spark.sql(
        """
        WITH daily AS (
          SELECT date_trunc('day', o_orderdate) AS d, o_orderstatus,
                 hll_sketch_agg(o_custkey) AS sk,
                 count(DISTINCT o_custkey) AS day_exact
          FROM orders_sk GROUP BY 1, 2
        )
        SELECT o_orderstatus,
               CAST(hll_sketch_estimate(hll_union_agg(sk)) AS BIGINT)
                 AS approx_customers,
               CAST(sum(day_exact) AS BIGINT) AS naive_sum_of_daily_distincts
        FROM daily GROUP BY 1
        """
    )


# ---------------------------------------------------------------------------
# sketch_hll_portable — the HLL MECHANISM, hash-checkable end to end
# ---------------------------------------------------------------------------

# Flajolet et al. 2007 HyperLogLog with every engine-specific piece
# replaced by a deterministic, SQL-replayable twin (the portable-PQ
# precedent): multiplicative integer hash (Knuth mix, the _pqp_centroid
# pattern) -> top-HLLP_P-bit bucket / leading-one rank of the low bits
# via length(bin(w)) (integer-exact on both engines; no float log2) ->
# max-per-register -> harmonic estimate with the register sum kept an
# exact BIGINT (sum of 1 << (27 - M)) until ONE final double division.
# The production path (sketch_mergeable_hll, DataSketches) keeps real
# estimator quality; THIS entry makes the mechanism — bucketing, rank,
# register max, union=max mergeability, small-range linear counting —
# certifiable by the driver's value hash.

HLLP_P = 6                      # 2^6 = 64 registers
HLLP_M = 1 << HLLP_P
HLLP_ALPHA = 0.709              # the published alpha_64 constant
HLLP_WBITS = 32 - HLLP_P        # 26 low bits feed the rank
_HLLP_M32 = 4294967296
# m^2 * 2^(WBITS+1) = 4096 * 2^27 = 2^39 — exact in a double
_HLLP_NUM = float(HLLP_M * HLLP_M * (1 << (HLLP_WBITS + 1)))

# xorshift-multiply finalizer: a single multiplicative mix leaves the
# LOW bits — the rank bits — barely mixed (measured ~+90% estimate
# bias). This is the published lowbias 32-bit integer hash
# (xor-fold >> 16, * 0x45d9f3b, twice, final fold) — the multiplier
# stays under 2^31 so every intermediate product fits a signed int64
# on BOTH engines (no silent wrap on Spark, no overflow error on
# DuckDB). The SAME schedule drives the Column twin and the SQL twin
# below (kept adjacent — the _afp_env / _afp_env_sql convention).
_HLLP_MUL = 0x45D9F3B
_HLLP_FOLD = 16
_HLLP_ROUNDS = 2


def _hllp_hash_sql(x: str) -> str:
    """DuckDB replay of the 32-bit mix (xor() — DuckDB's ^ is power).
    The argument is parenthesized BEFORE the reduction: % and * share
    precedence, so "k + r*SALT % M" would bind the modulus to the
    salt product only — identical to the engine for small keys (the
    test scales) but divergent once key + (r*SALT % M) crosses 2^32
    (~1.85e9 at r=3; r13 review, verified against live DuckDB)."""
    h = f"(({x}) % {_HLLP_M32})"
    for _ in range(_HLLP_ROUNDS):
        h = f"(xor({h}, {h} // {1 << _HLLP_FOLD}) * {_HLLP_MUL} % {_HLLP_M32})"
    return f"xor({h}, {h} // {1 << _HLLP_FOLD})"


def _hllp_hash_col(x: Column) -> Column:
    """Spark Column twin of the mix — same schedule, bitwiseXOR +
    shiftright (values stay non-negative, so // 2^s == >> s)."""
    h = F.pmod(x, F.lit(_HLLP_M32))
    for _ in range(_HLLP_ROUNDS):
        h = F.pmod(
            h.bitwiseXOR(F.shiftright(h, _HLLP_FOLD)) * F.lit(_HLLP_MUL),
            F.lit(_HLLP_M32),
        )
    return h.bitwiseXOR(F.shiftright(h, _HLLP_FOLD))

_HLLP_ORACLE = f"""
WITH hashed AS (
  SELECT o_orderstatus,
         CAST(o_orderdate AS DATE) AS d,
         {_hllp_hash_sql("o_custkey")} AS h
  FROM orders
),
ranked AS (
  SELECT o_orderstatus, d,
         h // {1 << HLLP_WBITS} AS bucket,
         {HLLP_WBITS} + 1 - CASE WHEN h % {1 << HLLP_WBITS} = 0 THEN 0
              ELSE length(bin(h % {1 << HLLP_WBITS})) END AS rank
  FROM hashed
),
daily AS (
  SELECT o_orderstatus, d, bucket, max(rank) AS m
  FROM ranked GROUP BY 1, 2, 3
),
spine AS (
  SELECT DISTINCT r.o_orderstatus, b.b AS bucket
  FROM ranked r, range({HLLP_M}) b(b)
),
regs AS (
  SELECT s.o_orderstatus, s.bucket,
         coalesce(max(d.m), 0) AS m_merged,
         coalesce(max(r.rank), 0) AS m_direct
  FROM spine s
  LEFT JOIN daily d ON d.o_orderstatus = s.o_orderstatus
                   AND d.bucket = s.bucket
  LEFT JOIN ranked r ON r.o_orderstatus = s.o_orderstatus
                    AND r.bucket = s.bucket
  GROUP BY 1, 2
),
est AS (
  SELECT o_orderstatus,
         CAST(sum(1::BIGINT << ({HLLP_WBITS} + 1 - m_merged)) AS BIGINT)
           AS denom,
         CAST(sum(CASE WHEN m_merged = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS zeros,
         CAST(sum(CASE WHEN m_merged = m_direct THEN 1 ELSE 0 END)
              AS BIGINT) AS n_regs_union_eq_direct
  FROM regs GROUP BY 1
),
fin AS (
  SELECT o_orderstatus, n_regs_union_eq_direct,
         {HLLP_ALPHA} * ({_HLLP_NUM} / denom) AS raw,
         zeros
  FROM est
)
SELECT f.o_orderstatus,
       round(CASE WHEN f.raw <= 2.5 * {HLLP_M} AND f.zeros > 0
                  THEN {HLLP_M}.0 * ln({HLLP_M}.0 / f.zeros)
                  ELSE f.raw END, 4) AS approx_customers,
       f.n_regs_union_eq_direct,
       x.exact_customers
FROM fin f
JOIN (SELECT o_orderstatus,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_customers
      FROM orders GROUP BY 1) x USING (o_orderstatus)
"""


@_register("sketch_hll_portable", _HLLP_ORACLE)
def q_sketch_hll_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable-integer HyperLogLog twin: per-status distinct-customer
    estimates whose EVERY step — hash, bucket, rank, per-day register
    tables, the max-merge union, the harmonic sum, the small-range
    linear-counting branch — is replayed verbatim by the DuckDB
    oracle, so the value hash certifies the whole HLL mechanism the
    production DataSketches path (sketch_mergeable_hll) can only
    rows-only-check. MERGEABILITY is certified inside the row:
    ``n_regs_union_eq_direct`` counts registers where max-merging the
    per-day tables equals the direct per-status register — always
    {HLLP_M} (union = max, the property that lets a 100 TB pipeline
    re-aggregate daily partials to any rollup level).

    Plan: one scan -> two bounded register aggregations (vocab = 64
    registers x statuses) -> broadcast-sized spine join; the exact
    integer register sum (sum of 1 << (27 - M)) defers floating point
    to ONE final division + one multiply on the harmonic branch, so
    those doubles are bit-identical on both engines (the portable-PQ
    discipline). The small-range LINEAR-COUNTING branch is the one
    transcendental (m * ln(m/V)) — the same cross-engine ln the
    logprob-quality oracles already rely on, with round(., 4) giving
    ~1e12x headroom over libm ulp divergence; the branch never fires
    on the registry fixtures (statuses are too distinct-heavy), so
    tests/test_round12_ops.py exercises it cross-engine on a tiny
    corpus directly."""
    o = catalog.load_table(spark, sf_dir, "orders")
    h = _hllp_hash_col(F.col("o_custkey"))
    w = F.pmod(h, F.lit(1 << HLLP_WBITS))
    ranked = o.select(
        "o_orderstatus",
        F.col("o_orderdate").cast("date").alias("d"),
        F.shiftright(h, HLLP_WBITS).alias("bucket"),
        (
            F.lit(HLLP_WBITS + 1)
            - F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
        ).alias("rank"),
    )
    from ..session import stage

    ranked = stage(ranked)
    daily = ranked.groupBy("o_orderstatus", "d", "bucket").agg(
        F.max("rank").alias("m")
    )
    merged = daily.groupBy("o_orderstatus", "bucket").agg(
        F.max("m").alias("m_merged")
    )
    direct = ranked.groupBy("o_orderstatus", "bucket").agg(
        F.max("rank").alias("m_direct")
    )
    spine = (
        ranked.select("o_orderstatus")
        .distinct()
        .select(
            "o_orderstatus",
            F.explode(F.sequence(F.lit(0), F.lit(HLLP_M - 1))).alias(
                "bucket"
            ),
        )
    )
    regs = (
        spine.join(merged, ["o_orderstatus", "bucket"], "left")
        .join(direct, ["o_orderstatus", "bucket"], "left")
        .select(
            "o_orderstatus",
            F.coalesce("m_merged", F.lit(0)).alias("m_merged"),
            F.coalesce("m_direct", F.lit(0)).alias("m_direct"),
        )
    )
    est = regs.groupBy("o_orderstatus").agg(
        F.sum(
            # SQL form: the Python shiftleft wrapper wants literal bits
            F.expr(f"shiftleft(CAST(1 AS BIGINT), {HLLP_WBITS + 1} - m_merged)")
        )
        .cast("long")
        .alias("denom"),
        F.sum(F.when(F.col("m_merged") == 0, 1).otherwise(0))
        .cast("long")
        .alias("zeros"),
        F.sum(
            F.when(F.col("m_merged") == F.col("m_direct"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_regs_union_eq_direct"),
    )
    raw = F.lit(HLLP_ALPHA) * (F.lit(_HLLP_NUM) / F.col("denom"))
    approx = F.when(
        (raw <= 2.5 * HLLP_M) & (F.col("zeros") > 0),
        F.lit(float(HLLP_M))
        * F.log(F.lit(float(HLLP_M)) / F.col("zeros")),
    ).otherwise(raw)
    exact = o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").cast("long").alias("exact_customers")
    )
    return (
        est.select(
            "o_orderstatus",
            F.round(approx, 4).alias("approx_customers"),
            "n_regs_union_eq_direct",
        )
        .join(exact, "o_orderstatus")
        .select(
            "o_orderstatus",
            "approx_customers",
            "n_regs_union_eq_direct",
            "exact_customers",
        )
    )


# ---------------------------------------------------------------------------
# sketch_countmin_portable — the count-min MECHANISM, integer-exact
# ---------------------------------------------------------------------------

# Cormode & Muthukrishnan 2005 count-min sketch with deterministic
# integer hashes (the lowbias mix above, salted per row) — unlike HLL
# there is NO float anywhere: counters, point estimates (min over d
# counters), the overestimate gap and the mergeability census are all
# BIGINTs, so the whole sketch mechanism is hash-certifiable without
# even a rounding convention. The production heavy-hitters path
# (sketch_heavy_hitters, approx_count estimates) keeps its engine
# sketches; THIS entry certifies the mechanism.

CMP_D = 4            # hash rows
CMP_W = 512          # counters per row
CMP_TOPK = 20        # report the exact top-K keys' estimates
_CMP_SALT = 2654435761


def _salted_pos_sql(key: str, r: str, salt: int, m: int) -> str:
    """Salted lowbias position in [0, m) — ONE definition for every
    sketch that derives per-row positions (count-min buckets, Bloom
    bits), SQL side."""
    return f"({_hllp_hash_sql(f'({key}) + ({r}) * {salt}')}) % {m}"


def _salted_pos_col(key: Column, r: Column, salt: int, m: int) -> Column:
    """Spark Column twin of _salted_pos_sql (kept adjacent)."""
    return F.pmod(_hllp_hash_col(key + r * F.lit(salt)), F.lit(m))


def _cmp_bucket_sql(key: str, r: str) -> str:
    return _salted_pos_sql(key, r, _CMP_SALT, CMP_W)


def _cmp_bucket_col(key: Column, r: Column) -> Column:
    return _salted_pos_col(key, r, _CMP_SALT, CMP_W)


_CMP_ORACLE = f"""
WITH rows_in AS (
  SELECT l_partkey AS k, CAST(l_shipdate AS DATE) AS d FROM lineitem
),
hashed AS (
  SELECT k, d, r.r AS r, {_cmp_bucket_sql("k", "r.r")} AS bucket
  FROM rows_in, range({CMP_D}) r(r)
),
direct AS (
  SELECT r, bucket, CAST(count(*) AS BIGINT) AS c
  FROM hashed GROUP BY 1, 2
),
daily AS (
  SELECT d, r, bucket, CAST(count(*) AS BIGINT) AS c
  FROM hashed GROUP BY 1, 2, 3
),
merged AS (
  SELECT r, bucket, CAST(sum(c) AS BIGINT) AS c
  FROM daily GROUP BY 1, 2
),
mstat AS (
  SELECT CAST(count(*) AS BIGINT) AS n_counters,
         CAST(sum(CASE WHEN di.c = me.c THEN 1 ELSE 0 END) AS BIGINT)
           AS n_counters_merge_eq_direct
  FROM direct di JOIN merged me USING (r, bucket)
),
exact AS (
  SELECT k, CAST(count(*) AS BIGINT) AS exact_count
  FROM rows_in GROUP BY 1
),
topk AS (
  SELECT k, exact_count FROM exact
  QUALIFY row_number() OVER (ORDER BY exact_count DESC, k) <= {CMP_TOPK}
),
probes AS (
  -- mirror of the Spark side's probes frame (r12 advice: an explicit
  -- derived table with the bucket expression projected, then a plain
  -- equi-join — no lateral reference out of a comma join)
  SELECT t.k, r.r AS r, {_cmp_bucket_sql("t.k", "r.r")} AS bucket
  FROM topk t CROSS JOIN range({CMP_D}) r(r)
),
est AS (
  SELECT p.k, min(di.c) AS cm_estimate
  FROM probes p JOIN direct di ON di.r = p.r AND di.bucket = p.bucket
  GROUP BY 1
)
SELECT t.k AS l_partkey, t.exact_count,
       CAST(e.cm_estimate AS BIGINT) AS cm_estimate,
       CAST(e.cm_estimate - t.exact_count AS BIGINT) AS overestimate,
       m.n_counters, m.n_counters_merge_eq_direct
FROM topk t JOIN est e ON e.k = t.k CROSS JOIN mstat m
"""


@_register("sketch_countmin_portable", _CMP_ORACLE)
def q_sketch_countmin_portable(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Portable count-min sketch twin: a {CMP_D} x {CMP_W} counter
    array over lineitem part keys under salted lowbias integer hashes,
    point estimates (min over the {CMP_D} counters) reported for the
    exact top-{CMP_TOPK} keys next to their true counts and the
    overestimate gap (cm >= exact ALWAYS — the count-min guarantee,
    pinned in tests). MERGEABILITY is certified inside the row:
    per-day counter partials summed up equal the directly-built
    counters on every occupied cell (n_counters ==
    n_counters_merge_eq_direct — counter ADDITIVITY, the property
    that lets 1000 executors sketch shards independently and add).
    Everything is BIGINT — no float enters the query at all, the
    strongest portability tier in the sketch family.

    Plan: one scan fans out x{CMP_D} map-side, two bounded counter
    aggregations ({CMP_D * CMP_W} cells), the exact top-K (one
    grouped count + TakeOrdered-sized window), and a broadcast-sized
    probe join; the mergeability census is a {CMP_D * CMP_W}-row
    join folded to one scalar row."""
    li = catalog.load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("k"),
        F.col("l_shipdate").cast("date").alias("d"),
    )
    from ..session import stage

    rs = F.explode(
        F.sequence(F.lit(0), F.lit(CMP_D - 1))
    ).alias("r")
    hashed = stage(
        li.select(
            "k", "d", rs
        ).withColumn("bucket", _cmp_bucket_col(F.col("k"), F.col("r")))
    )
    direct = stage(
        hashed.groupBy("r", "bucket").agg(
            F.count(F.lit(1)).cast("long").alias("c")
        )
    )
    merged = (
        hashed.groupBy("d", "r", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .groupBy("r", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    mstat = (
        direct.alias("di")
        .join(merged.alias("me"), ["r", "bucket"])
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_counters"),
            F.sum(
                F.when(F.col("di.c") == F.col("me.c"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_counters_merge_eq_direct"),
        )
    )
    exact = li.groupBy("k").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    w = Window.orderBy(F.desc("exact_count"), "k")
    topk = stage(
        exact.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= CMP_TOPK)
        .drop("rk")
    )
    probes = topk.select(
        "k",
        F.explode(F.sequence(F.lit(0), F.lit(CMP_D - 1))).alias("r"),
    ).withColumn("bucket", _cmp_bucket_col(F.col("k"), F.col("r")))
    est = (
        probes.join(direct, ["r", "bucket"])
        .groupBy("k")
        .agg(F.min("c").cast("long").alias("cm_estimate"))
    )
    return (
        topk.join(est, "k")
        .crossJoin(F.broadcast(mstat))
        .select(
            F.col("k").alias("l_partkey"),
            "exact_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("exact_count"))
            .cast("long")
            .alias("overestimate"),
            "n_counters",
            "n_counters_merge_eq_direct",
        )
    )


# ---------------------------------------------------------------------------
# sketch_bloom_portable — the Bloom-filter MECHANISM, integer-exact
# ---------------------------------------------------------------------------

# Bloom 1970 membership filter with deterministic integer hashes (the
# lowbias mix above, salted per hash row) — the classic distributed
# anti-join/dedup pruning primitive (Spark's own runtime row-filter
# pruning is a Bloom). Like count-min there is NO float anywhere:
# the bitset is BIGINT words (63 usable bits per word — bit 63 stays
# clear so no value ever relies on sign-bit shift semantics, which
# differ across engines), membership tests are bitwise ANDs, the
# observed false-positive rate is a fixed-point integer, and
# OR-MERGEABILITY (monthly partial filters OR'd == the directly built
# filter on every occupied word — the property that lets 1000
# executors filter shards independently and OR) is certified inside
# the one hashed report row. The Bloom GUARANTEE — zero false
# negatives — is also a hashed column (n_true_and_member == n_true).

BLM_WORDS = 1024          # bitset words
BLM_WBITS = 63            # usable bits per word (sign bit never set)
BLM_BITS = BLM_WORDS * BLM_WBITS
BLM_K = 4                 # hash rows
_BLM_SALT = 2246822519    # xxhash PRIME32_2 — public constant


def _blm_pos_sql(key: str, r: str) -> str:
    return _salted_pos_sql(key, r, _BLM_SALT, BLM_BITS)


_BLM_ORACLE = f"""
WITH ka AS (
  SELECT DISTINCT o_custkey AS k, year(CAST(o_orderdate AS DATE)) AS y,
         month(CAST(o_orderdate AS DATE)) AS mo
  FROM orders
),
build AS (SELECT DISTINCT k FROM ka WHERE y = 1995),
probe AS (SELECT DISTINCT k FROM ka WHERE y = 1996),
bbits AS (
  SELECT b.k, r.r AS r, {_blm_pos_sql("b.k", "r.r")} AS idx
  FROM build b, range({BLM_K}) r(r)
),
bloom AS (
  SELECT idx // {BLM_WBITS} AS w,
         bit_or(CAST(1 AS BIGINT) << (idx % {BLM_WBITS})) AS word
  FROM bbits GROUP BY 1
),
monthly AS (
  SELECT mw.mo, mw.w, bit_or(mw.mask) AS word FROM (
    SELECT a.mo, ({_blm_pos_sql("a.k", "r.r")}) // {BLM_WBITS} AS w,
           CAST(1 AS BIGINT)
             << (({_blm_pos_sql("a.k", "r.r")}) % {BLM_WBITS}) AS mask
    FROM (SELECT DISTINCT k, mo FROM ka WHERE y = 1995) a,
         range({BLM_K}) r(r)
  ) mw GROUP BY 1, 2
),
merged AS (SELECT w, bit_or(word) AS word FROM monthly GROUP BY 1),
mstat AS (
  SELECT CAST(count(*) AS BIGINT) AS n_words,
         CAST(sum(CASE WHEN b.word = m.word THEN 1 ELSE 0 END)
              AS BIGINT) AS n_words_merge_eq_direct
  FROM bloom b JOIN merged m USING (w)
),
pbits AS (
  SELECT p.k, r.r AS r,
         ({_blm_pos_sql("p.k", "r.r")}) // {BLM_WBITS} AS w,
         CAST(1 AS BIGINT)
           << (({_blm_pos_sql("p.k", "r.r")}) % {BLM_WBITS}) AS mask
  FROM probe p, range({BLM_K}) r(r)
),
tested AS (
  SELECT pb.k,
         min(CASE WHEN (COALESCE(bl.word, 0) & pb.mask) != 0
                  THEN 1 ELSE 0 END) AS member
  FROM pbits pb LEFT JOIN bloom bl ON bl.w = pb.w
  GROUP BY pb.k
),
verdicts AS (
  SELECT t.k, t.member,
         CASE WHEN b.k IS NULL THEN 0 ELSE 1 END AS truth
  FROM tested t LEFT JOIN build b ON b.k = t.k
)
SELECT v.n_probed, v.n_true, v.n_true_and_member, v.n_false_pos,
       v.fpr_micros, m.n_words, m.n_words_merge_eq_direct
FROM (
  -- aggregate WITHOUT grouping: exactly one row even on a corpus
  -- with no probe-year orders, matching the engine's .agg() shape
  -- (the grouped CROSS JOIN form emitted zero rows there — r13
  -- review)
  SELECT CAST(count(*) AS BIGINT) AS n_probed,
         CAST(sum(truth) AS BIGINT) AS n_true,
         CAST(sum(truth * member) AS BIGINT) AS n_true_and_member,
         CAST(sum((1 - truth) * member) AS BIGINT) AS n_false_pos,
         CAST(sum((1 - truth) * member) * 1000000
              // GREATEST(sum(1 - truth), 1) AS BIGINT) AS fpr_micros
  FROM verdicts
) v CROSS JOIN mstat m
"""


@_register("sketch_bloom_portable", _BLM_ORACLE)
def q_sketch_bloom_portable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom-filter twin: a {BLM_WORDS}x{BLM_WBITS}-bit
    bitset over the custkeys with 1995 orders under {BLM_K} salted
    lowbias integer hashes, probed with the distinct 1996 custkeys.
    One hashed report row certifies the whole mechanism: the Bloom
    GUARANTEE in-row (n_true_and_member == n_true — zero false
    negatives), the observed false-positive rate as fixed-point
    micros (bounded by the m/n/k design point, pinned in tests), and
    OR-mergeability in-row (monthly partial filters OR'd equal the
    direct filter on every occupied word — n_words ==
    n_words_merge_eq_direct). Only 63 bits per word are used so no
    mask ever touches the sign bit (shift-into-sign semantics differ
    across engines); everything is BIGINT, no float anywhere.

    Plan: two distinct-key scans, a bounded word aggregation
    (<= {BLM_WORDS} rows — bit_or is the map-side-combinable OR), a
    broadcast-sized word join for the probe, and 1-row aggregates;
    at 100 TB the filter is the standard shuffle-avoiding anti-join
    prune: build on the small side's executors, OR the partials, ship
    {BLM_WORDS} words to every scanner."""
    o = catalog.load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k"),
        F.year(F.col("o_orderdate").cast("date")).alias("y"),
        F.month(F.col("o_orderdate").cast("date")).alias("mo"),
    )
    from ..session import stage

    rs = F.explode(F.sequence(F.lit(0), F.lit(BLM_K - 1))).alias("r")

    def pos(key: Column, r: Column) -> Column:
        return _salted_pos_col(key, r, _BLM_SALT, BLM_BITS)

    # SQL form: the Python F.shiftleft only takes a literal bit count
    mask = F.expr(
        f"SHIFTLEFT(CAST(1 AS BIGINT), CAST(idx % {BLM_WBITS} AS INT))"
    )
    ka95 = stage(
        o.where(F.col("y") == 1995).select("k", "mo").distinct()
    )
    build = stage(ka95.select("k").distinct())
    bbits = build.select("k", rs).withColumn(
        "idx", pos(F.col("k"), F.col("r"))
    )
    bloom = stage(
        bbits.select(
            F.expr(f"idx DIV {BLM_WBITS}").alias("w"), mask.alias("mask")
        )
        .groupBy("w")
        .agg(F.bit_or("mask").alias("word"))
    )
    monthly = (
        ka95.select("k", "mo", rs)
        .withColumn("idx", pos(F.col("k"), F.col("r")))
        .select(
            "mo", F.expr(f"idx DIV {BLM_WBITS}").alias("w"),
            mask.alias("mask"),
        )
        .groupBy("mo", "w")
        .agg(F.bit_or("mask").alias("word"))
        .groupBy("w")
        .agg(F.bit_or("word").alias("word"))
    )
    mstat = (
        bloom.alias("b")
        .join(monthly.alias("m"), "w")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(
                F.when(F.col("b.word") == F.col("m.word"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_words_merge_eq_direct"),
        )
    )
    probe = o.where(F.col("y") == 1996).select("k").distinct()
    pbits = probe.select("k", rs).withColumn(
        "idx", pos(F.col("k"), F.col("r"))
    ).select(
        "k", F.expr(f"idx DIV {BLM_WBITS}").alias("w"), mask.alias("mask")
    )
    tested = (
        pbits.join(F.broadcast(bloom), "w", "left")
        .select(
            "k",
            F.when(
                (F.coalesce(F.col("word"), F.lit(0)).bitwiseAND(
                    F.col("mask")
                ))
                != 0,
                1,
            )
            .otherwise(0)
            .alias("set"),
        )
        .groupBy("k")
        .agg(F.min("set").alias("member"))
    )
    verdicts = tested.join(
        build.withColumn("truth", F.lit(1)), "k", "left"
    ).select(
        "member", F.coalesce(F.col("truth"), F.lit(0)).alias("truth")
    )
    return (
        verdicts.agg(
            F.count(F.lit(1)).cast("long").alias("n_probed"),
            F.sum("truth").cast("long").alias("n_true"),
            F.sum(F.col("truth") * F.col("member"))
            .cast("long")
            .alias("n_true_and_member"),
            F.sum((1 - F.col("truth")) * F.col("member"))
            .cast("long")
            .alias("n_false_pos"),
        )
        .withColumn(
            "fpr_micros",
            F.expr(
                "(n_false_pos * 1000000)"
                " DIV GREATEST(n_probed - n_true, 1)"
            ),
        )
        .crossJoin(F.broadcast(mstat))
        .select(
            "n_probed",
            "n_true",
            "n_true_and_member",
            "n_false_pos",
            "fpr_micros",
            "n_words",
            "n_words_merge_eq_direct",
        )
    )


# ---------------------------------------------------------------------------
# sketch_mg_portable_heavyhitters — the Misra-Gries MECHANISM, integer-exact
# ---------------------------------------------------------------------------

# Misra & Gries 1982 frequent-items summary in its MERGEABLE form
# (Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries",
# PODS 2012): a K-counter summary is PRUNED by subtracting the
# (K+1)-th largest counter value and dropping non-positives; merging
# two summaries = add counters, prune again. The production path
# (sketch_heavy_hitters above) runs the classic streaming MG whose
# final counter values depend on partition/arrival order — rows-only
# to the driver by design. THIS twin removes the order dependence:
# each deterministic shard's summary is the prune of its EXACT counts
# (the canonical mergeable summary for that shard — what a 1000-
# executor job would compute per partition), and one merge level
# combines them. Every value is a BIGINT; the MG guarantees become
# hash-certifiable columns:
#   * mg_estimate <= exact_count            (underestimate — the sign
#     opposite of count-min's, so the two twins bracket the key),
#   * exact_count - mg_estimate <= deficit_budget, where
#     deficit_budget = sum(per-shard prune) + final prune, and
#     (K+1) * deficit_budget <= n_rows      (the mergeable-summaries
#     telescoping argument: each prune by t removes >= (K+1)*t weight,
#     and total removed weight cannot exceed n),
#   * every item with exact_count*(K+1) > n_rows is RETAINED
#     (n_true_heavy == n_true_heavy_retained — the heavy-hitter
#     guarantee).
# The workload is the canonical heavy-hitter input: a deterministic
# Zipf(~1) item-popularity map item = C // (1 + lowbias(event_id) % C)
# (item 1 draws ~half the stream, item k ~ 1/(k(k+1))), so the prune
# machinery is genuinely exercised (>= 50 distinct items per shard vs
# K = 16 counters) and true heavies exist at every test scale.

MGP_K = 16            # counters per summary
MGP_S = 8             # deterministic shards (models executors)
MGP_ZIPF_C = 1000     # Zipf item-domain constant
_MGP_SALT = 3266489917  # xxhash PRIME32_3 — public constant


def mg_portable_summary(
    rows: DataFrame, k: int = MGP_K
) -> tuple[DataFrame, DataFrame]:
    """The deterministic mergeable-MG pipeline over ``rows`` with
    columns (item BIGINT, shard) — exposed module-level so the
    closed-form fixture test can feed hand-built (item, shard) rows
    and check the summary against pencil-and-paper expectations
    without either engine's hash in the way.

    Returns ``(summary, stats)``: summary = (item, mg_estimate) — the
    merged-and-pruned K-counter state; stats = one row
    (n_rows, deficit_budget).

    Scale shape: one grouped count per (shard, item); the per-shard
    rank window partitions by shard (parallel); the only global
    window ranks the MERGED partials, which are bounded by S*K rows
    (<= 128 here — at most K counts per shard survive a strict prune),
    so the single-reducer sort is over a constant-size frame, never
    data-scale."""
    shard_counts = rows.groupBy("shard", "item").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w = Window.partitionBy("shard").orderBy(F.desc("c"), "item")
    ranked = shard_counts.withColumn("rk", F.row_number().over(w))
    shard_t = ranked.groupBy("shard").agg(
        F.coalesce(
            F.max(F.when(F.col("rk") == k + 1, F.col("c"))),
            F.lit(0),
        )
        .cast("long")
        .alias("t")
    )
    partials = (
        shard_counts.join(shard_t, "shard")
        .select("item", (F.col("c") - F.col("t")).alias("m"))
        .where(F.col("m") > 0)
    )
    merged = partials.groupBy("item").agg(
        F.sum("m").cast("long").alias("g")
    )
    wg = Window.orderBy(F.desc("g"), "item")
    final_t = (
        merged.withColumn("rk", F.row_number().over(wg))
        .agg(
            F.coalesce(
                F.max(F.when(F.col("rk") == k + 1, F.col("g"))),
                F.lit(0),
            )
            .cast("long")
            .alias("t2")
        )
    )
    summary = (
        merged.crossJoin(F.broadcast(final_t))
        .select(
            "item",
            (F.col("g") - F.col("t2")).cast("long").alias("mg_estimate"),
        )
        .where(F.col("mg_estimate") > 0)
    )
    sum_t = shard_t.agg(
        F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("sum_t")
    )
    stats = (
        rows.agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
        .crossJoin(F.broadcast(sum_t))
        .crossJoin(F.broadcast(final_t))
        .select(
            "n_rows",
            (F.col("sum_t") + F.col("t2"))
            .cast("long")
            .alias("deficit_budget"),
        )
    )
    return summary, stats


_MGP_K1 = MGP_K + 1
_MGP_ITEM_SQL = (
    f"CAST({MGP_ZIPF_C} // "
    f"(1 + (({_hllp_hash_sql('event_id')}) % {MGP_ZIPF_C})) AS BIGINT)"
)
_MGP_SHARD_SQL = _salted_pos_sql("event_id", "1", _MGP_SALT, MGP_S)

_MGP_ORACLE = f"""
WITH rows_in AS (
  SELECT {_MGP_ITEM_SQL} AS item,
         {_MGP_SHARD_SQL} AS shard
  FROM events
),
shard_counts AS (
  SELECT shard, item, CAST(count(*) AS BIGINT) AS c
  FROM rows_in GROUP BY 1, 2
),
shard_t AS (
  SELECT shard,
         CAST(COALESCE(max(CASE WHEN rk = {_MGP_K1} THEN c END), 0)
              AS BIGINT) AS t
  FROM (
    SELECT shard, c,
           row_number() OVER (PARTITION BY shard
                              ORDER BY c DESC, item) AS rk
    FROM shard_counts
  ) GROUP BY shard
),
partials AS (
  SELECT sc.item, sc.c - st.t AS m
  FROM shard_counts sc JOIN shard_t st USING (shard)
  WHERE sc.c - st.t > 0
),
merged AS (SELECT item, CAST(sum(m) AS BIGINT) AS g FROM partials GROUP BY 1),
final_t AS (
  SELECT CAST(COALESCE(max(CASE WHEN rk = {_MGP_K1} THEN g END), 0)
              AS BIGINT) AS t2
  FROM (
    SELECT g, row_number() OVER (ORDER BY g DESC, item) AS rk FROM merged
  )
),
summary AS (
  SELECT m.item, CAST(m.g - ft.t2 AS BIGINT) AS mg_estimate
  FROM merged m CROSS JOIN final_t ft
  WHERE m.g - ft.t2 > 0
),
exact AS (
  SELECT item, CAST(count(*) AS BIGINT) AS exact_count
  FROM rows_in GROUP BY 1
),
stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST((SELECT COALESCE(sum(t), 0) FROM shard_t)
              + (SELECT t2 FROM final_t) AS BIGINT) AS deficit_budget
  FROM rows_in
),
heavies AS (
  SELECT CAST(count(*) AS BIGINT) AS n_true_heavy,
         CAST(COALESCE(sum(CASE WHEN s.item IS NOT NULL
                                THEN 1 ELSE 0 END), 0) AS BIGINT)
           AS n_true_heavy_retained
  FROM exact e CROSS JOIN stats st
  LEFT JOIN summary s ON s.item = e.item
  WHERE e.exact_count * {_MGP_K1} > st.n_rows
)
SELECT s.item, e.exact_count, s.mg_estimate,
       CAST(e.exact_count - s.mg_estimate AS BIGINT) AS deficit,
       st.n_rows, st.deficit_budget, h.n_true_heavy, h.n_true_heavy_retained
FROM summary s JOIN exact e USING (item)
CROSS JOIN stats st CROSS JOIN heavies h
"""


@_register("sketch_mg_portable_heavyhitters", _MGP_ORACLE)
def q_sketch_mg_portable_heavyhitters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Portable Misra-Gries heavy-hitters twin: {MGP_S} deterministic
    shards each prune their EXACT item counts to a {MGP_K}-counter
    mergeable summary (subtract the (K+1)-th largest, keep positives
    — the Mergeable Summaries prune operator), one merge level adds
    the partials and prunes again. Reported next to the exact counts
    with the MG guarantees as hashed BIGINT columns: mg_estimate <=
    exact_count per row (deficit >= 0), deficit <= deficit_budget
    with (K+1)*deficit_budget <= n_rows (both pinned in tests), and
    every true heavy hitter (count*(K+1) > n) retained
    (n_true_heavy == n_true_heavy_retained). The production
    order-dependent streaming MG (sketch_heavy_hitters) is untouched
    and stays rows-only; THIS entry hash-certifies the mechanism.

    Plan: one scan derives (item, shard) map-side from integer
    hashes; one grouped count per (shard, item); a shard-partitioned
    rank window (parallel across shards); the only global window
    ranks <= S*K = {MGP_S * MGP_K} merged partials — constant-size,
    never data-scale; stats/heavies are 1-row broadcast joins. At
    100 TB this is exactly the per-executor-summarize-then-merge
    shape the mergeability theorem licenses."""
    ev = catalog.load_table(spark, sf_dir, "events").select("event_id")
    from ..session import stage

    h = _hllp_hash_col(F.col("event_id"))
    rows = stage(
        ev.select(
            h.alias("h"),
            _salted_pos_col(
                F.col("event_id"), F.lit(1), _MGP_SALT, MGP_S
            ).alias("shard"),
        ).select(
            F.expr(
                f"CAST({MGP_ZIPF_C} DIV"
                f" (1 + pmod(h, {MGP_ZIPF_C})) AS BIGINT)"
            ).alias("item"),
            "shard",
        )
    )
    summary, stats = mg_portable_summary(rows)
    summary = stage(summary)
    exact = rows.groupBy("item").agg(
        F.count(F.lit(1)).cast("long").alias("exact_count")
    )
    heavies = (
        exact.crossJoin(F.broadcast(stats))
        .where(F.col("exact_count") * (MGP_K + 1) > F.col("n_rows"))
        .join(
            summary.select("item", F.lit(1).alias("ret")), "item", "left"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_true_heavy"),
            F.coalesce(F.sum("ret"), F.lit(0))
            .cast("long")
            .alias("n_true_heavy_retained"),
        )
    )
    return (
        summary.join(exact, "item")
        .crossJoin(F.broadcast(stats))
        .crossJoin(F.broadcast(heavies))
        .select(
            "item",
            "exact_count",
            "mg_estimate",
            (F.col("exact_count") - F.col("mg_estimate"))
            .cast("long")
            .alias("deficit"),
            "n_rows",
            "deficit_budget",
            "n_true_heavy",
            "n_true_heavy_retained",
        )
    )


# ---------------------------------------------------------------------------
# winsorize_robust_scale — percentile clipping + robust standardization
# ---------------------------------------------------------------------------

_WINSORIZE_ORACLE = """
WITH b AS (
  SELECT event_type,
         quantile_cont(value, 0.05e0) AS p05,
         quantile_cont(value, 0.95e0) AS p95,
         median(value)                AS med
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type,
       round(e.value, 6) AS value,
       round(CASE WHEN e.value < b.p05 THEN b.p05
                  WHEN e.value > b.p95 THEN b.p95
                  ELSE e.value END, 6) AS clipped,
       -- nullif: constant slices have p95 = p05 → NULL robust z
       round((CASE WHEN e.value < b.p05 THEN b.p05
                   WHEN e.value > b.p95 THEN b.p95
                   ELSE e.value END - b.med) / nullif(b.p95 - b.p05, 0), 6)
         AS robust_z
FROM events e JOIN b ON b.event_type = e.event_type
WHERE e.event_id % 7 = 0
"""


@_register("winsorize_robust_scale", _WINSORIZE_ORACLE)
def q_winsorize_robust_scale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier treatment for feature columns: winsorize at the per-key
    p05/p95 (exact interpolated percentiles — Spark ``percentile`` and
    DuckDB ``quantile_cont`` agree to the ulp) and standardize by the
    robust (median / percentile-range) location-scale pair.

    The per-key bounds are ONE grouped percentile pass over the fact
    table — a table of |keys| rows joined back broadcast; the clip and
    scale are then map-side expressions. No window pass, no global sort:
    the classic two-scan robust-scaling shape that survives any data
    volume (contrast a per-row percent_rank window, which would sort
    every key group for the same answer)."""
    ev = catalog.load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", 0.05).alias("p05"),
        F.percentile("value", 0.95).alias("p95"),
        F.median("value").alias("med"),
    )
    clipped = (
        F.when(F.col("value") < F.col("p05"), F.col("p05"))
        .when(F.col("value") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("value"))
    )
    return (
        ev.where(F.col("event_id") % 7 == 0)
        .join(F.broadcast(bounds), "event_type")
        .select(
            "event_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.round(clipped, 6).alias("clipped"),
            # try_divide: constant slice → p95 = p05 → NULL robust z
            F.round(
                F.try_divide(
                    clipped - F.col("med"), F.col("p95") - F.col("p05")
                ),
                6,
            ).alias("robust_z"),
        )
    )


MG_K = 8        # Misra-Gries counters per partition summary
MG_TOP = 20     # reported heavy hitters


def mg_partial_summaries(toks: DataFrame, k: int = MG_K) -> DataFrame:
    """Per-partition Misra-Gries summaries over a single ``tok`` column:
    each task keeps at most ``k`` counters regardless of how many rows
    or distinct items it sees — O(k) memory at ANY partition size, the
    property exact per-partition counting cannot give on a skewed
    100 TB token stream. Emitted as (tok, est) rows plus one NULL-tok
    sentinel per partition carrying the task's total decrement (the
    summary's undercount bound).

    Arrow-vectorized: per batch the counting is ``value_counts`` (C
    speed); Python touches only the ≤ k + |batch vocabulary| merged
    counters, never rows."""

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        decr = 0
        for pdf in batches:
            for tok, c in pdf["tok"].value_counts().items():
                counters[tok] = counters.get(tok, 0) + int(c)
            # batched MG decrement: drop the min, subtract it everywhere
            while len(counters) > k:
                m = min(counters.values())
                decr += m
                counters = {
                    t: c - m for t, c in counters.items() if c > m
                }
        yield pd.DataFrame(
            {
                "tok": list(counters) + [None],
                "est": list(counters.values()) + [0],
                "decr": [0] * len(counters) + [decr],
            }
        )

    return toks.mapInPandas(summarize, "tok string, est long, decr long")


@_register("sketch_heavy_hitters")  # partition-order-dependent → rows-only
def q_sketch_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable heavy-hitters sketch (Misra-Gries) over the corpus token
    stream: per-partition k-counter summaries merge by summing per-item
    estimates — the frequent-items counterpart to the HLL sketch above,
    and the same mergeability argument: exact per-day top-k lists cannot
    be re-aggregated, k-counter summaries can.

    Guarantees carried to the output: est ≤ true, true − est ≤
    max_undercount (the summed per-partition decrements, itself ≤
    n/(k+1)), and every item with true frequency > n/(k+1) is present.
    Pinned in tests against exact counts — including on a skewed corpus;
    the near-uniform fixture is the adversarial no-heavy-hitter case.
    Rows-only to the driver: estimates depend on partition layout."""
    d = catalog.load_table(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.col("text"), " ")).alias("tok")
    )
    partials = mg_partial_summaries(toks)
    summary = (
        partials.where(F.col("tok").isNotNull())
        .groupBy("tok")
        .agg(F.sum("est").alias("est_count"))
    )
    err = partials.agg(F.sum("decr").alias("max_undercount"))
    return (
        summary.crossJoin(F.broadcast(err))
        .orderBy(F.col("est_count").desc(), "tok")
        .limit(MG_TOP)
    )


# ---------------------------------------------------------------------------
# percentile_disc_pack — discrete (witnessed) percentiles per group
# ---------------------------------------------------------------------------

_PDISC_ORACLE = """
SELECT event_type,
       quantile_disc(value, 0.25) AS p25_disc,
       quantile_disc(value, 0.5)  AS p50_disc,
       quantile_disc(value, 0.75) AS p75_disc,
       round(quantile_cont(value, 0.5), 6) AS p50_cont
FROM events GROUP BY event_type
"""


@_register("percentile_disc_pack", _PDISC_ORACLE)
def q_percentile_disc_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete percentiles: the WITNESSED value at each quantile (the
    SQL-standard ``PERCENTILE_DISC`` inverse-distribution semantics —
    actual data points, where ``cont`` interpolates between them; both
    engines pick the same witness because the sorted multiset is
    identical). One grouped pass, map-side combinable."""
    ev = catalog.load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY value)")
        .alias("p25_disc"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY value)")
        .alias("p50_disc"),
        F.expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY value)")
        .alias("p75_disc"),
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50_cont"),
    )


# ---------------------------------------------------------------------------
# shipping_sla_percentiles — order-to-ship latency SLA readout
# ---------------------------------------------------------------------------

_SLA_ORACLE = """
WITH d AS (
  SELECT o.o_orderpriority,
         date_diff('day', o.o_orderdate, l.l_shipdate) AS delay_days
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
)
SELECT o_orderpriority,
       CAST(count(*) AS BIGINT)               AS n,
       CAST(quantile_disc(delay_days, 0.5)  AS BIGINT) AS p50_days,
       CAST(quantile_disc(delay_days, 0.9)  AS BIGINT) AS p90_days,
       CAST(quantile_disc(delay_days, 0.99) AS BIGINT) AS p99_days,
       CAST(max(delay_days) AS BIGINT)        AS max_days
FROM d GROUP BY o_orderpriority
"""


@_register("shipping_sla_percentiles", _SLA_ORACLE)
def q_shipping_sla_percentiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-ship latency SLA per order priority: discrete
    (witnessed) p50/p90/p99 and the worst case, over integer day
    delays — the operational latency readout, tail-first, with the
    p99/max spread that separates a systemic SLA miss from stragglers.

    The fact-fact join shuffles on the natural o_orderkey/l_orderkey
    key (bucketing both facts on it makes this shuffle-free, per
    join_fact_fact_revenue); delays are exact integer day diffs so the
    discrete percentiles are engine-parity-trivial; the group count is
    |priorities| = 5."""
    o = catalog.load_table(spark, sf_dir, "orders")
    li = catalog.load_table(spark, sf_dir, "lineitem")
    d = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
        .alias("delay_days"),
    )
    return d.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY delay_days)")
        .cast("long")
        .alias("p50_days"),
        F.expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY delay_days)")
        .cast("long")
        .alias("p90_days"),
        F.expr("percentile_disc(0.99) WITHIN GROUP (ORDER BY delay_days)")
        .cast("long")
        .alias("p99_days"),
        F.max("delay_days").cast("long").alias("max_days"),
    )
