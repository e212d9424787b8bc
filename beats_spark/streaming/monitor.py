"""Streaming frequency monitor: count-min registers over a stream.

The batch heavy-hitter tooling (operators/heavyhitters.py) rests on
one property: CMS registers are LINEAR — registers built on disjoint
slices SUM to the whole-corpus registers. That is exactly the
contract a micro-batch stream needs: build the d×w register frame
per batch (one map-side-combining agg, constant output size), merge
it into a running store by element-wise sum, and any point in time
the store answers "how often has this term streamed past so far"
without ever keying state by term (the stateful-agg alternative —
``groupBy(term).count`` in update mode — carries one state row per
DISTINCT term forever; the sketch carries d·w longs, period).

Sink idempotence follows the incremental curator's pattern
(streaming/curate.py): each micro-batch writes its OWN registers to a
``batch_id=N`` partition with dynamic partition overwrite, so an
at-least-once foreachBatch replay rewrites identical bytes instead
of double-counting. The merged view is a read-time SUM over
partitions — cheap (n_batches × d×w bounded rows) and always
consistent with exactly the set of committed batches.

Reference analog: the pipeline observer's event tallies
(`/root/reference/libbeat/monitoring/report/log/log.go:95-118`
periodic metrics snapshots); the sketch is the scale-safe form for
per-TERM frequencies rather than per-counter totals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.heavyhitters import CMS_DEPTH, CMS_WIDTH, cms_registers


class StreamingCms:
    """foreachBatch sink: per-batch CMS registers into an idempotent
    ``batch_id``-partitioned store; ``merged_registers`` reads back
    the running sketch."""

    def __init__(
        self,
        output_root: str,
        depth: int = CMS_DEPTH,
        width: int = CMS_WIDTH,
        text_col: str = "text",
    ) -> None:
        self.output_root = output_root
        self.depth = depth
        self.width = width
        self.text_col = text_col

    # -- write side ------------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        regs = cms_registers(
            batch_df,
            depth=self.depth,
            width=self.width,
            text_col=self.text_col,
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        (
            regs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{self.output_root}/registers")
        )

    def attach(self, stream_df: DataFrame, checkpoint: str):
        """Wire onto a streaming DataFrame; returns the query."""
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- read side -------------------------------------------------------

    def merged_registers(self, spark: SparkSession) -> DataFrame:
        """The running sketch: element-wise sum over all committed
        batch partitions (bounded: n_batches × d×w rows in, d×w out)."""
        return (
            spark.read.parquet(f"{self.output_root}/registers")
            .groupBy("i", "j")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def estimates(
        self, spark: SparkSession, probe_terms: DataFrame
    ) -> DataFrame:
        """Point-query estimates against the merged sketch."""
        from ..operators.heavyhitters import cms_estimate

        return cms_estimate(
            self.merged_registers(spark),
            probe_terms,
            depth=self.depth,
            width=self.width,
        )


class StreamingHll:
    """foreachBatch sink: per-batch HLL registers into the same
    idempotent ``batch_id``-partitioned store shape — the continuous
    "distinct conversations/documents seen so far" companion to
    :class:`StreamingCms`.

    Where CMS registers merge by SUM (linear), HLL registers merge by
    element-wise MAX (operators/sketch.py merge property) — so the
    read-time merge is a ``groupBy(register).max`` over committed
    batch partitions, and an at-least-once replay of a batch is
    DOUBLY harmless: the partition overwrite rewrites identical
    bytes, and even a hypothetical duplicate register row cannot
    move a max. State is ≤ 2^p longs per batch partition, never one
    row per distinct key."""

    def __init__(
        self,
        output_root: str,
        value_col: str = "conv_id",
        p: int = 8,
    ) -> None:
        self.output_root = output_root
        self.value_col = value_col
        self.p = p

    # -- write side ------------------------------------------------------

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.sketch import hll_registers

        regs = hll_registers(
            batch_df, F.col(self.value_col), p=self.p
        ).withColumn("batch_id", F.lit(int(batch_id)).cast("long"))
        (
            regs.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(f"{self.output_root}/registers")
        )

    def attach(self, stream_df: DataFrame, checkpoint: str):
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    # -- read side -------------------------------------------------------

    def merged_registers(self, spark: SparkSession) -> DataFrame:
        return (
            spark.read.parquet(f"{self.output_root}/registers")
            .groupBy("register")
            .agg(F.max("max_rho").alias("max_rho"))
        )

    def estimate(self, spark: SparkSession) -> DataFrame:
        """One-row (m, n_nonzero, estimate) over everything committed."""
        from ..operators.sketch import hll_estimate

        return hll_estimate(self.merged_registers(spark), p=self.p)
