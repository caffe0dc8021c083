"""Streaming Poisson-bootstrap CI — the incremental twin of
``operators/experiments.py::q_bootstrap_mean_ci``.

Chamandy et al. 2012 ("Estimating uncertainty for massive data
streams") designed the Poisson bootstrap for EXACTLY this execution
mode: because each unit's replica weight is an independent function of
the unit alone (here a deterministic hash of (event_id, b)), the
per-replica sufficient statistics are plain sums — mergeable across
micro-batches with bounded state (B rows of (Σw·value, Σw)). No
resampling pass ever revisits old data.

Shape: explode the B replica weights map-side (the SAME
``boot_weighted_replicas`` the batch query uses), keep a streaming
groupBy(b) aggregation as the state, and let ``foreachBatch`` reduce
the B-row state to the 1-row CI after each micro-batch — the CI time
series tightens as data arrives, and after the final batch it equals
the batch kernel's answer on the same rows exactly (pytest parity).

The two-stage aggregate (per-replica sums → percentile across
replicas) cannot be one streaming query (aggregate-after-aggregate is
unsupported); the B-row complete-mode output is tiny, so the second
stage runs per-batch on the driver-side micro-batch DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.experiments import (
    boot_ci_from_sums,
    boot_replica_sums,
    boot_weighted_replicas,
)


def bootstrap_sums_stream(events: DataFrame) -> DataFrame:
    """Streaming per-replica running sums: (b, swv, sw), B rows of
    state, exact DECIMAL/integer accumulators (merge-safe). Use with
    ``outputMode("complete")`` — the state IS the output."""
    u = events.select("event_id", "value")
    return boot_replica_sums(boot_weighted_replicas(u))


def ci_of_batch(sums_batch: DataFrame) -> DataFrame:
    """Reduce one emitted B-row state snapshot to the 1-row CI —
    the same final math as the batch kernel (and its DuckDB oracle)."""
    return boot_ci_from_sums(sums_batch)
