"""Scale-pattern proofs: bucketed co-located joins, salted aggregation,
deterministic sampling stability — the rewrites a 100 TB deployment runs
on, each verified for plan shape and/or value equivalence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkstreaming_rawdataingestion_spark import catalog, plans
from sparkstreaming_rawdataingestion_spark.operators import extras

SF01 = "/root/testdata/sf0.01"


def test_bucketed_join_is_shuffle_free(spark):
    """Both facts bucketed on the join key → sort-merge join with ZERO
    exchanges. This is the layout decision that removes the dominant
    shuffle of fact-fact joins at 100 TB (ARCHITECTURE.md 'Joins').
    (Tables land in the session's default warehouse dir — gitignored.)"""
    import shutil

    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")
    # the in-memory catalog forgets tables between sessions but their
    # warehouse directories persist — clear them or saveAsTable errors
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("orders_b", "lineitem_b"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    o = catalog.load_table(spark, SF01, "orders")
    li = catalog.load_table(spark, SF01, "lineitem")
    (
        o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("orders_b")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("lineitem_b")
    )
    ob, lb = spark.table("orders_b"), spark.table("lineitem_b")
    joined = ob.join(lb, lb.l_orderkey == ob.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("n"))
    n_exchanges = plans.count_exchanges(joined)
    # the only allowed exchange is the final 5-group aggregate
    assert n_exchanges <= 1, plans.executed_plan(joined)
    # and values equal the unbucketed join
    plain = o.join(li, li.l_orderkey == o.o_orderkey).groupBy(
        "o_orderpriority"
    ).agg(F.count("*").alias("n"))
    assert sorted(map(tuple, joined.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_salted_agg_splits_hot_keys(spark):
    """The salted rewrite's phase-1 key space must actually spread rows:
    every (event_type, salt) group is far smaller than its parent group."""
    ev = catalog.load_table(spark, SF01, "events")
    salted = ev.withColumn(
        "salt", (F.xxhash64("event_id") % extras.SALT_BUCKETS).cast("int")
    )
    parent = {r["event_type"]: r["n"] for r in
              ev.groupBy("event_type").agg(F.count("*").alias("n")).collect()}
    phase1 = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("n")
    ).collect()
    for r in phase1:
        assert r["n"] < parent[r["event_type"]] * 0.5


def test_deterministic_sample_is_stable(spark):
    a = extras.q_deterministic_sample(spark, SF01).collect()
    b = extras.q_deterministic_sample(spark, SF01).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
    # roughly 5% (hash-uniform over orderkeys)
    total = catalog.load_table(spark, SF01, "lineitem").count()
    assert 0.02 < len(a) / total < 0.09


def test_gapfill_grid_is_dense(spark):
    out = extras.q_downsample_gapfill(spark, SF01)
    n_days = out.select("bucket_start").distinct().count()
    n_users = out.select("user_id").distinct().count()
    assert out.count() == n_days * n_users  # dense grid, gaps zero-filled
    assert out.where(F.col("n_events") == 0).count() > 0


def test_runtime_bloom_filter_prunes_probe_side(spark):
    """A selective dim-side filter should inject a runtime bloom filter
    into the fact scan (Spark's InjectRuntimeFilter) — at 100 TB this
    skips most of the probe-side shuffle for free. The size thresholds
    that gate it in production are lowered to make the tiny fixture
    qualify; the assertion is that the rewrite fires at all."""
    conf = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in conf}
    try:
        for k, v in conf.items():
            spark.conf.set(k, v)
        o = catalog.load_table(spark, SF01, "orders").where(
            "o_totalprice > 24000"  # selective creation side
        )
        li = catalog.load_table(spark, SF01, "lineitem")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy(
            "o_orderstatus"
        ).agg(F.count("*").alias("n"))
        plan = plans.executed_plan(joined)
        assert "might_contain" in plan.lower(), plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_runs_shuffled_and_spreads_keys(spark):
    """The salted join must be a genuine SortMergeJoin on (key, salt) —
    broadcast would defeat the salting — and every salt bucket must
    carry rows (the hot key actually spreads)."""
    from sparkstreaming_rawdataingestion_spark.operators import extras

    df = extras.QUERIES["salted_join_equivalence"](spark, SF01)
    plan = plans.executed_plan(df)
    assert "SortMergeJoin" in plan
    li = catalog.load_table(spark, SF01, "lineitem")
    n_buckets = (
        li.select(
            F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), F.lit(8)).alias("s")
        )
        .distinct()
        .count()
    )
    assert n_buckets == 8


def test_release_staged_between_registry_queries(spark, sf_dir):
    """A long-lived session running registry queries back to back must not
    accumulate persisted staging: the registry wrapper releases the
    previous query's stage() output at the next query's entry."""
    from sparkstreaming_rawdataingestion_spark import session
    from sparkstreaming_rawdataingestion_spark.queries import all_queries

    reg = all_queries()
    session.release_staged()
    assert reg["dedup_ngram_jaccard_pairs"](spark, sf_dir).count() > 0
    staged = list(session._STAGED)
    assert staged, "near-dup query should stage its shingle sets"
    # a stage()-less query's entry drops the previous staging
    assert reg["having_filter"](spark, sf_dir).count() > 0
    assert not session._STAGED
    for df in staged:
        lvl = df.storageLevel
        assert not (lvl.useMemory or lvl.useDisk)


def test_bucketed_fact_join_is_shuffle_free(spark, tmp_path):
    """The ARCHITECTURE claim behind join_fact_fact_revenue: bucketing
    both facts on the join key removes the join's exchanges entirely.
    Written as saveAsTable(bucketBy) + a joined read whose executed plan
    must contain NO Exchange on either side."""
    import uuid

    from pyspark.sql import functions as F

    from sparkstreaming_rawdataingestion_spark import plans

    sf = "/root/testdata/sf0.001"
    suffix = uuid.uuid4().hex[:8]
    o_tab, l_tab = f"o_bkt_{suffix}", f"l_bkt_{suffix}"
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "true"
    )
    # at sf0.001 AQE would broadcast the small side (a BroadcastExchange)
    # — force the sort-merge path this test exists to prove bucketable
    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        (
            spark.read.parquet(f"{sf}/orders.parquet")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(o_tab)
        )
        (
            spark.read.parquet(f"{sf}/lineitem.parquet")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(l_tab)
        )
        joined = (
            spark.table(l_tab)
            .join(
                spark.table(o_tab),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderpriority")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        n = joined.count()
        assert n > 0
        plan = plans.executed_plan(joined)
        # the join itself must not shuffle either bucketed side: the
        # only allowed exchange is the final single aggregation
        join_part = plan.split("HashAggregate")[-1]
        assert "Exchange" not in join_part, join_part
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
        spark.sql(f"DROP TABLE IF EXISTS {o_tab}")
        spark.sql(f"DROP TABLE IF EXISTS {l_tab}")
