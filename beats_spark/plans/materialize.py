"""Config-selected lineage-cut tier for multi-pass intermediates.

Iterative and multi-consumer operators (the LSH shingle table, the
connected-components frontier, k-means training tables, the
classifier feature table) must cut lineage between passes — both to
stop Catalyst re-inlining the expensive upstream chain into every
consumer and to keep iterative plans from growing without bound.

``localCheckpoint()`` does that by truncating lineage into
EXECUTOR-LOCAL storage blocks: fastest, and fine on ``local[N]``
where executors never die — but on a real cluster an executor loss
mid-job makes the truncated lineage unrecoverable (job FAILURE, not
recompute; r4 verdict finding #2). The tier is therefore selected per
session with one config knob::

    spark.beats.materialize = local | reliable | disk

- ``local`` (default): ``localCheckpoint()`` — single-node / dev.
- ``reliable``: ``checkpoint()`` — lineage truncated into the
  fault-tolerant checkpoint dir (``sc.setCheckpointDir`` to HDFS/S3
  first). The cluster-scale tier for ITERATIVE operators, whose
  plans must truncate each round.
- ``disk``: ``persist(DISK_ONLY)`` — no truncation, fully
  RECOMPUTABLE on executor loss. Right for single-reuse fan-in
  tables when no checkpoint dir exists; iterative loops still grow
  their plans under this tier (bounded by each operator's
  ``max_iter``).

Usage: ``df.select(...).transform(materialize)``.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame

CONF_KEY = "spark.beats.materialize"


def materialize(df: DataFrame) -> DataFrame:
    """Cut/park lineage for a frame consumed by multiple passes —
    tier per the session's ``spark.beats.materialize`` (module
    docstring)."""
    mode = df.sparkSession.conf.get(CONF_KEY, "local")
    if mode == "local":
        return df.localCheckpoint()
    if mode == "reliable":
        return df.checkpoint()
    if mode == "disk":
        return df.persist(StorageLevel.DISK_ONLY)
    raise ValueError(
        f"{CONF_KEY}: unknown tier {mode!r} (local|reliable|disk)"
    )
