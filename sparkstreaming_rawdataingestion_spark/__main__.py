"""CLI entry point — the engine's equivalent of the reference's
``spark-submit RawDataIngestion.jar <keyspace> <topics>``
(RawDataIngestion.java:72-83).

    python -m sparkstreaming_rawdataingestion_spark SINK SOURCE [options]

SINK    output table root (parquet, day-partitioned) — stands in for the
        reference's Cassandra keyspace arg (args[0])
SOURCE  message source: a directory of JSON-line message files; Kafka
        topics when --kafka-servers is given; or simulated-broker topics
        when --sim-log-dir is given (args[1], comma-separated — the
        reference's arg-count bug, which crashed on exactly one arg, is
        fixed by actual argument parsing; SURVEY §0)

The query runs on the reference's 5 s processing-time cadence and blocks
(``awaitTermination``, op 15) unless --available-now is passed, which
drains the source once and exits (backfill mode).
"""

from __future__ import annotations

import argparse


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="sparkstreaming_rawdataingestion_spark",
        description="Streaming raw-data ingestion: JSON sensor messages → "
        "normalized day-partitioned datapoints",
    )
    p.add_argument("sink", help="output table root (parquet)")
    p.add_argument(
        "source",
        help="message file directory, or comma-separated Kafka topics with "
        "--kafka-servers",
    )
    p.add_argument("--checkpoint", default=None,
                   help="checkpoint dir (default: <sink>/_checkpoint)")
    p.add_argument("--trigger-seconds", type=int, default=5,
                   help="processing-time trigger (reference cadence: 5)")
    p.add_argument("--available-now", action="store_true",
                   help="drain available input once and exit (backfill)")
    broker = p.add_mutually_exclusive_group()
    broker.add_argument("--kafka-servers", default=None,
                        help="bootstrap servers; SOURCE becomes the topic "
                        "list")
    broker.add_argument("--sim-log-dir", default=None,
                        help="simulated-broker log dir (sources/kafka_sim); "
                        "SOURCE becomes the topic list — the full reference "
                        "job with zero infrastructure")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from .api import Engine
    from .session import get_spark

    eng = Engine(get_spark(app_name="rawdata-ingestion"))
    query = eng.ingest_stream(
        source_path=args.source,
        sink_path=args.sink,
        checkpoint_path=args.checkpoint or f"{args.sink}/_checkpoint",
        trigger_seconds=None if args.available_now else args.trigger_seconds,
        kafka_servers=args.kafka_servers,
        kafka_topics=(
            args.source if (args.kafka_servers or args.sim_log_dir) else None
        ),
        sim_log_dir=args.sim_log_dir,
    )
    query.awaitTermination()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
