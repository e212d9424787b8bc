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


# (the Pipeline commit pass now builds the per-run metrics rows from
# its single (part_id, sink) aggregation — see plans/pipeline.py)
