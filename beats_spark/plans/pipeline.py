"""The Pipeline plan: parse → enrich → route → aggregate.

This is the libbeat publisher pipeline re-expressed as one Spark job
(SURVEY.md §3.1 restatement):

  input scan            ← filebeat harvester/prospector
  processor chain       ← libbeat processors (client.go:67-135 order)
  enrich lookups        ← add_*_metadata cached lookups
  selector → sink col   ← outil.Selector (select.go:94-96)
  fan-out write         ← per-output workers + bulk sinks
  metrics + manifest    ← pipeline observer + registrar ACK/checkpoint

Everything before the write is lazily-composed Column expressions, so
Catalyst handles pushdown/pruning/reordering; the write is ONE pass
(partitioned by sink × bucket); metrics ride on Observations (no extra
scan); the manifest aggregation re-reads only 3 columns of the written
parquet (column pruning makes it ~free relative to the main pass).

Scale notes (100 TB): the only shuffle is the pre-write repartition by
(sink, part_id), which is required anyway to control output file
counts, and it keys on the bucket — not raw conv_id — so hot
conversations spread across no more than one bucket; AQE skew handling
plus the quadratic-hash bucket spread keep reducers balanced. The
enrich joins are broadcast (no shuffle). Input→bucket mapping is a
hash, so rerunning any subset of buckets is deterministic.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass, field as dc_field
from typing import Mapping, Sequence

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ..operators.actions import Processor, apply_chain
from ..operators.manifest import append_manifest, read_done_parts
from ..operators.router import (
    PART_COL,
    ROW_HASH_COL,
    with_partition_id,
    with_row_hash,
    write_fanout,
)
from ..operators.selector import Rule, compile_selector


def _clear_output(spark: SparkSession, output_root: str) -> None:
    """Delete a previous run's data/manifest/metrics under the root.

    A FRESH (resume=False) run means full replace: with dynamic
    partition overwrite now pinned in write_fanout, partitions the new
    run doesn't produce would otherwise survive on disk and the commit
    aggregation would attribute their rows to the new run_id — and a
    stale manifest would poison a later resume. Hadoop FS API, so any
    warehouse scheme works."""
    jconf = spark._jsc.hadoopConfiguration()
    jvm = spark._jvm
    for sub in ("data", "_manifest", "_metrics"):
        path = jvm.org.apache.hadoop.fs.Path(f"{output_root}/{sub}")
        fs = path.getFileSystem(jconf)
        if fs.exists(path):
            fs.delete(path, True)


@dataclass
class RunResult:
    run_id: str
    events_total: int
    events_filtered: int
    events_published: int
    sinks_root: str
    skipped_parts: int = 0


@dataclass
class Pipeline:
    """Compiled pipeline config (the reference's YAML surface)."""

    processors: Sequence[Processor] = dc_field(default_factory=tuple)
    routes: Sequence[Rule | Mapping] = dc_field(default_factory=tuple)
    default_sink: str = "default"
    n_buckets: int = 64
    #: spread hot conversations over ≤salt writer tasks per bucket
    #: (see router.sort_for_fanout); None = no salting; "auto" =
    #: derive ceil(max/mean) from the input's conv_id distribution
    #: (router.recommend_salt — one extra counting pass over the
    #: input before the write)
    salt: int | str | None = None

    # -- lazy plan ----------------------------------------------------------

    def transform(self, df: DataFrame) -> DataFrame:
        """parse + enrich + route: pure DataFrame transform, no action.
        Exposed separately so tests/bench can measure or explain() the
        plan without writing."""
        df = apply_chain(df, self.processors)
        return df.withColumn(
            "sink",
            compile_selector(
                list(self.routes), default=self.default_sink, df=df
            ),
        )

    # -- materializing run --------------------------------------------------

    def run(
        self,
        spark: SparkSession,
        df: DataFrame,
        output_root: str,
        run_id: str | None = None,
        resume: bool = False,
    ) -> RunResult:
        run_id = run_id or uuid.uuid4().hex[:12]
        df = with_partition_id(df, self.n_buckets)

        skipped = 0
        done: list[int] = []
        if not resume:
            _clear_output(spark, output_root)
        if resume:
            done = read_done_parts(spark, output_root)
            if done:
                skipped = len(done)
                df = df.filter(~F.col(PART_COL).isin(*done))
                if df.isEmpty():
                    # everything already committed — don't launch a write
                    return RunResult(
                        run_id=run_id,
                        events_total=0,
                        events_filtered=0,
                        events_published=0,
                        sinks_root=f"{output_root}/data",
                        skipped_parts=skipped,
                    )

        # observation names must be unique within a SparkSession
        obs_in = Observation(f"events_in_{run_id}_{uuid.uuid4().hex[:6]}")
        df = df.observe(obs_in, F.count(F.lit(1)).alias("n"))

        routed = self.transform(df)
        routed = with_row_hash(routed)

        obs_out = Observation(f"events_out_{run_id}_{uuid.uuid4().hex[:6]}")
        routed = routed.observe(obs_out, F.count(F.lit(1)).alias("n"))

        data_root = f"{output_root}/data"
        salt = self.salt
        if salt == "auto":
            from beats_spark.operators.router import recommend_salt

            salt = recommend_salt(df, "conv_id")
        write_fanout(routed, data_root, mode="overwrite", salt=salt)

        # Observation rows are missing when the observed subtree saw no
        # rows (e.g. cached-empty input); fall back to on-disk counts.
        try:
            events_total = int(obs_in.get["n"])
        except Exception:
            events_total = 0
        try:
            events_published = int(obs_out.get["n"])
        except Exception:
            events_published = 0
        events_filtered = events_total - events_published

        # ONE column-pruned re-read of the written parquet feeds both
        # the manifest (per-bucket) and the metrics (per-sink): the
        # (part_id, sink) aggregate is at most buckets × sinks rows, so
        # both rollups happen on the driver.
        # rows_in ≈ routed rows per bucket; when the chain drops rows
        # the true rows_in is total pre-drop — tracked via the
        # observation; per-bucket pre-drop counts would need a second
        # input scan, so the manifest stores post-route counts and the
        # run-level metrics carry the drop tally.
        commit_src = spark.read.parquet(data_root).select(
            PART_COL, "sink", ROW_HASH_COL
        )
        if done:
            # a partial resume commits only the buckets THIS run wrote:
            # skipped buckets keep their original manifest rows (their
            # run_id stays attributable) and the per-sink metrics count
            # only rows published by this run
            commit_src = commit_src.filter(~F.col(PART_COL).isin(*done))
        per = (
            commit_src.groupBy(PART_COL, "sink")
            .agg(
                F.count("*").alias("n"),
                F.expr(f"bit_xor({ROW_HASH_COL})").alias("chk"),
            )
            .collect()
        )
        by_part: dict[int, list[int]] = {}
        by_sink: dict[str, int] = {}
        for r in per:
            rows, chk = by_part.setdefault(r[PART_COL], [0, 0])
            by_part[r[PART_COL]] = [rows + r["n"], chk ^ r["chk"]]
            by_sink[r["sink"]] = by_sink.get(r["sink"], 0) + r["n"]

        from pyspark.sql import types as T

        from ..schema import MANIFEST_SCHEMA, METRICS_SCHEMA

        manifest_schema = T.StructType(
            [f for f in MANIFEST_SCHEMA.fields if f.name != "updated_ts"]
        )
        manifest_rows = spark.createDataFrame(
            [
                # uppercase hex matches the conv(...,10,16) format of
                # pre-refactor manifest generations
                (run_id, int(p), "done", rows, rows, format(chk & (2**64 - 1), "X"))
                for p, (rows, chk) in sorted(by_part.items())
            ],
            manifest_schema,
        ).withColumn("updated_ts", F.current_timestamp())
        append_manifest(manifest_rows, output_root)

        metrics = spark.createDataFrame(
            [
                (run_id, s, events_total, events_filtered, n, 0)
                for s, n in sorted(by_sink.items())
            ],
            METRICS_SCHEMA,
        )
        metrics.write.mode("append").parquet(f"{output_root}/_metrics")

        return RunResult(
            run_id=run_id,
            events_total=events_total,
            events_filtered=events_filtered,
            events_published=events_published,
            sinks_root=data_root,
            skipped_parts=skipped,
        )
