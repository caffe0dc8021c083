"""User-facing engine facade.

A user of the reference ran one program: consume Kafka JSON → normalized
day-bucketed table. This class packages that pipeline plus the full
analytics surface (SQL over every table, the operator packs, streaming
start/stop) behind one object:

    eng = Engine(spark, sf_dir="/root/testdata/sf0.1")
    eng.register_views()                      # SQL frontend over all tables
    eng.sql("SELECT count(*) FROM lineitem")
    dp  = eng.ingest_batch(messages_df)       # value:string → DataPoint rows
    q   = eng.ingest_stream(path, sink, ckpt) # the reference job, streaming
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import catalog
from .operators.ingest import ingest_normalize
from .schemas import TABLES
from .session import tune_for_session
from .sinks import write_datapoints
from .sources import kafka
from .streaming import ingest_stream as _stream


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str | None = None) -> None:
        self.spark = tune_for_session(spark)
        self.sf_dir = sf_dir or catalog.DEFAULT_SF_DIR

    # -- catalog / SQL frontend --------------------------------------------

    def table(self, name: str) -> DataFrame:
        return catalog.load_table(self.spark, self.sf_dir, name)

    def register_views(self) -> None:
        """Expose every synthetic table as a temp view → full Spark SQL
        text access (the engine's SQL frontend)."""
        for name in TABLES:
            self.table(name).createOrReplaceTempView(name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    # -- the reference pipeline --------------------------------------------

    def ingest_batch(self, values: DataFrame) -> DataFrame:
        """value:string messages → normalized DataPoint rows (ops 3-10)."""
        return ingest_normalize(values)

    def ingest_to_table(self, values: DataFrame, path: str) -> None:
        """Batch ingest + idempotent day-partitioned sink (op 11)."""
        write_datapoints(ingest_normalize(values), path)

    def ingest_stream(
        self,
        source_path: str,
        sink_path: str,
        checkpoint_path: str,
        trigger_seconds: int | None = _stream.DEFAULT_TRIGGER_SECONDS,
        kafka_servers: str | None = None,
        kafka_topics: str | None = None,
        sim_log_dir: str | None = None,
    ):
        """The reference job: streaming messages → normalized parquet.
        With ``kafka_servers``/``kafka_topics`` the source is a real Kafka
        subscription (ops 1-2); with ``sim_log_dir`` it is the simulated
        broker (``sources/kafka_sim.py`` — same contract, no
        infrastructure) subscribing to ``kafka_topics`` or
        ``source_path`` as the topic list; otherwise ``source_path`` is a
        message file directory (the test stand-in)."""
        if kafka_servers and kafka_topics:
            values = kafka.kafka_value_stream(
                self.spark, kafka_servers, kafka_topics
            )
        elif sim_log_dir:
            values = kafka.kafka_sim_value_stream(
                self.spark, sim_log_dir, kafka_topics or source_path
            )
        else:
            values = kafka.message_file_stream(self.spark, source_path)
        return _stream.start_ingest_file_sink(
            values, sink_path, checkpoint_path, trigger_seconds
        )

    # -- named analytics queries -------------------------------------------

    def query(self, name: str) -> DataFrame:
        """Run any registered operator query by name against this
        engine's tables (`queries.all_queries` is the full inventory)."""
        from .queries import all_queries

        return all_queries()[name](self.spark, self.sf_dir)

    def query_names(self) -> list[str]:
        from .queries import all_queries

        return list(all_queries())

    # -- maintenance -------------------------------------------------------

    def compact(
        self,
        path: str,
        partitions: list[str] | None = None,
        target_files: int = 1,
    ) -> None:
        """Small-file compaction of a day-partitioned sink
        (operators/layout.py::compact_partitions)."""
        from .operators.layout import compact_partitions

        compact_partitions(
            self.spark,
            path,
            partition_col="day",
            target_files=target_files,
            partitions=partitions,
        )

    # -- CDC maintenance ---------------------------------------------------

    def cdc_apply_stream(
        self,
        changes: DataFrame,
        base_path: str,
        checkpoint_path: str,
        trigger_seconds: float | None = None,
    ):
        """MERGE-semantics maintenance of a keyed table from an I/U/D
        change stream (streaming/cdc_stream.py); seed the table first
        with ``cdc_stream.seed_base_table``."""
        from .streaming.cdc_stream import start_cdc_apply_stream

        return start_cdc_apply_stream(
            changes, base_path, checkpoint_path, trigger_seconds
        )

    # -- streaming smoothing ----------------------------------------------

    def ewma_stream(self, events: DataFrame) -> DataFrame:
        """Per-key streaming EWMA of ``value`` (streaming/ewma_stream.py)
        — the O(1)-state incremental twin of the ``ewma_smoothing``
        batch query; returns the smoothed-value stream to hand to
        ``writeStream``."""
        from .streaming.ewma_stream import ewma_stream

        return ewma_stream(events)

    def cusum_stream(
        self, events: DataFrame, baseline: DataFrame
    ) -> DataFrame:
        """Per-key streaming CUSUM monitoring against an offline-trained
        (user_id, mu, sd) baseline (streaming/cusum_stream.py) — the
        incremental twin of the ``cusum_changepoint`` batch query;
        returns the per-event (cusum, alarm) stream."""
        from .streaming.cusum_stream import cusum_stream

        return cusum_stream(events, baseline)

    def eval_stream(
        self, events: DataFrame, threshold: float
    ) -> DataFrame:
        """Streaming model-quality monitor (streaming/eval_stream.py):
        per-event-time-window confusion tableau + precision/recall for
        a frozen decision threshold; append-mode finalized windows."""
        from .streaming.eval_stream import eval_stream

        return eval_stream(events, threshold)

    def debounce_stream(self, events: DataFrame) -> DataFrame:
        """Streaming burst debounce (streaming/debounce_stream.py) —
        emits only burst-START events per (user, type); the incremental
        twin of the ``debounce_events`` batch query."""
        from .streaming.debounce_stream import debounce_stream

        return debounce_stream(events)

    def funnel_stream(self, events: DataFrame) -> DataFrame:
        """Streaming ordered-funnel completion (streaming/
        funnel_stream.py) — the incremental twin of the
        ``funnel_pattern_match`` batch query; emits one final row per
        user when view → click → purchase closes."""
        from .streaming.funnel_stream import funnel_stream

        return funnel_stream(events)

    # -- streaming drift monitoring ---------------------------------------

    def drift_monitor(
        self,
        events: DataFrame,
        profile: DataFrame,
        counts_dir: str,
        report_dir: str,
        checkpoint_path: str,
        window: str = "1 day",
        trigger_seconds: float | None = None,
    ):
        """Incremental PSI drift monitoring (streaming/drift_stream.py):
        maintains per-(window, series, bin) counts from the stream and
        rewrites the PSI report each batch. Freeze ``profile`` first
        with ``drift_stream.reference_profile``."""
        from .streaming.drift_stream import start_drift_monitor

        return start_drift_monitor(
            events, profile, counts_dir, report_dir, checkpoint_path,
            window=window, trigger_seconds=trigger_seconds,
        )

    # -- streaming dataset construction -----------------------------------

    def split_router(
        self,
        docs: DataFrame,
        sink_dir: str,
        checkpoint_path: str,
        trigger_seconds: int | None = None,
    ):
        """Route a document stream into split-partitioned parquet with
        the batch manifest's exact portable-hash assignment
        (streaming/split_stream.py) — the incremental twin of the
        ``train_val_test_split`` query; leakage-free by construction."""
        from .streaming.split_stream import start_split_router

        return start_split_router(
            docs, sink_dir, checkpoint_path, trigger_seconds
        )

    # -- streaming heavy hitters ------------------------------------------

    def heavy_hitters_stream(
        self, toks: DataFrame, sketch_path: str, checkpoint_path: str,
        **trigger,
    ):
        """Streaming Misra-Gries heavy hitters (streaming/topk_stream.py):
        maintains a bucket-partitioned O(k·B) sketch table from a
        streaming ``tok`` column; query it with
        ``topk_stream.heavy_hitters_report``. The incremental twin of
        the ``sketch_heavy_hitters`` batch query with a per-item
        undercount bound tightened to the item's own bucket."""
        from .streaming.topk_stream import (
            heavy_hitters_stream,
            start_sketch_maintenance,
        )

        return start_sketch_maintenance(
            heavy_hitters_stream(toks), sketch_path, checkpoint_path,
            **trigger,
        )

    # -- streaming uncertainty --------------------------------------------

    def bootstrap_ci_stream(self, events: DataFrame) -> DataFrame:
        """Streaming Poisson-bootstrap replica state (streaming/
        bootstrap_stream.py) — the incremental twin of the
        ``bootstrap_mean_ci`` query. Returns the B-row running-sums
        aggregation; run it with ``outputMode("complete")`` and reduce
        each emission to the 1-row CI via
        ``bootstrap_stream.ci_of_batch`` inside ``foreachBatch``."""
        from .streaming.bootstrap_stream import bootstrap_sums_stream

        return bootstrap_sums_stream(events)

    def ctr_wilson_stream(self, events: DataFrame) -> DataFrame:
        """Streaming daily conversion-rate monitor with Wilson 95%
        bounds (streaming/ctr_stream.py) — the incremental twin of the
        ``ctr_wilson_bounds`` query; append-mode windowed counts with
        the batch query's exact interval expressions."""
        from .streaming.ctr_stream import ctr_wilson_stream

        return ctr_wilson_stream(events)
