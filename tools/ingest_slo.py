"""Measure the reference job's implied ingest SLO on its own axis.

The reference publishes no benchmark numbers; its one hard requirement
is operational: with a 5 s processing-time trigger, batch time must stay
under the trigger interval or the job falls behind (the DStream
stability rule; RawDataIngestion.java:61,91). This tool measures that
directly: fixture messages at a chosen scale factor go into a
3-partition simulated-broker log, the ACTUAL job (sim source → value
projection → normalize → day-partitioned parquet sink, i.e. the CLI
path) runs on the 5 s cadence under a sweep of maxRecordsPerBatch caps,
and per-batch trigger-execution times come from the streaming progress
events.

Usage:
    python tools/ingest_slo.py [sf_dir]       # default /root/testdata/sf0.1

Prints one JSON line per cap plus a summary; paste the table into
BASELINE.md. Run alone — a concurrent Spark session skews timings.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

REPO = __file__.rsplit("/", 2)[0]
sys.path.insert(0, REPO)


def run(sf_dir: str) -> list[dict]:
    from sparkstreaming_rawdataingestion_spark.session import get_spark
    from sparkstreaming_rawdataingestion_spark.sources import fixtures, kafka
    from sparkstreaming_rawdataingestion_spark.streaming.ingest_stream import (
        drain_progress,
        start_ingest_file_sink,
    )

    spark = get_spark(app_name="ingest-slo")
    log = fixtures.sim_message_log(spark, sf_dir)
    n_messages = fixtures.sim_message_count(log)
    results = []
    # caps are per partition per batch (the maxOffsetsPerTrigger twin);
    # None = the whole backlog in one batch (the restart worst case).
    # "warmup" is a discarded first pass: the very first streaming query
    # in a session pays plan compilation + sink/codegen init (~4 s on
    # local[32]) that belongs to the session, not the batch — without it
    # the first measured cap conflates session start with batch time.
    for cap in ("warmup", None, 32, 128, 512):
        warmup = cap == "warmup"
        if warmup:
            cap = None
        work = tempfile.mkdtemp(prefix="ingest_slo_")
        values = kafka.kafka_sim_value_stream(
            spark, log, fixtures.SIM_TOPIC, cap,
            group_id=f"slo-{'warmup' if warmup else cap}",
        )
        q = start_ingest_file_sink(
            values, f"{work}/sink", f"{work}/ckpt", trigger_seconds=5
        )
        try:
            progress = drain_progress(q, n_messages, timeout_s=300)
        finally:
            q.stop()
            shutil.rmtree(work, ignore_errors=True)
        if warmup:
            continue
        durs = [p["durationMs"]["triggerExecution"] / 1000.0 for p in progress]
        rows = sum(p["numInputRows"] for p in progress)
        rec = {
            "cap_per_partition": cap,
            "messages": rows,
            "batches": len(durs),
            "max_batch_s": round(max(durs), 3),
            "mean_batch_s": round(sum(durs) / len(durs), 3),
            "messages_per_s": round(rows / sum(durs), 1),
            "slo_met": max(durs) < 5.0,
        }
        print(json.dumps(rec))
        results.append(rec)
    return results


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    res = run(sf)
    ok = all(r["slo_met"] for r in res)
    print(f"SLO (max batch < 5 s trigger): {'MET' if ok else 'MISSED'}")
    sys.exit(0 if ok else 1)
