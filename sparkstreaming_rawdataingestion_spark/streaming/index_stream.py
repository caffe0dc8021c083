"""Streaming ANN-index maintenance — incremental IVF inverted-list build.

The batch IVF operator (operators/similarity.py) trains a coarse
quantizer and buckets the corpus by nearest centroid; at 100 TB the
corpus doesn't arrive as one batch — embeddings stream in (new documents
get embedded continuously) and the inverted lists must stay current
without retraining or full rebuilds. This module is that maintenance
path:

- the quantizer is TRAINED OFFLINE on a corpus sample (``ivf_centroids``)
  and held fixed — the standard IVF contract (retraining moves bucket
  boundaries and would strand previously indexed vectors);
- each micro-batch assigns its vectors to their nearest centroid (the
  same broadcast + ``max_by`` kernel as the batch operator — one scan,
  no shuffle of the corpus) and appends them to a ``cluster_id``-
  partitioned parquet index, so every inverted list is a partition
  directory and a query's nprobe-list read is partition pruning;
- delivery is at-least-once (file-sink append inside ``foreachBatch``);
  the checkpoint prevents re-processing on restart, and vectors carry
  their id so an exact-once read is one ``dropDuplicates`` away —
  mirroring the reference's Cassandra-upsert recovery contract
  (RawDataIngestion.java:152).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.similarity import assign_clusters


def start_ivf_index_stream(
    embeddings: DataFrame,
    centroids: DataFrame,
    index_path: str,
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Maintain a cluster_id-partitioned IVF index from an embedding
    stream. ``centroids`` is the frozen offline-trained quantizer;
    ``embeddings`` must carry (neighbor_id, v_emb)."""

    def append_assignments(batch_df: DataFrame, _batch_id: int) -> None:
        (
            assign_clusters(batch_df, centroids)
            .write.mode("append")
            .partitionBy("cluster_id")
            .parquet(index_path)
        )

    writer = (
        embeddings.writeStream.foreachBatch(append_assignments)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
