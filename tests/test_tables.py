"""TableIO adapter (sources/tables.py): parquet fallback path, and
the Iceberg probe in a container without the runtime jar."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.router import with_partition_id
from beats_spark.sources.tables import TableIO, iceberg_available
from beats_spark.synth import synth_transcripts


def test_no_iceberg_jar_here(spark):
    assert iceberg_available(spark) is False
    assert TableIO("auto").resolve(spark) == "parquet"
    assert TableIO("iceberg").resolve(spark) == "iceberg"


def test_parquet_fanout_roundtrip(spark, tmp_path):
    df = with_partition_id(
        synth_transcripts(spark, 1_000, seed=5), 4
    ).withColumn("sink", F.concat(F.lit("s-"), F.col("role")))
    root = str(tmp_path / "data")
    io = TableIO()
    io.write_fanout(df, root)
    back = io.read(spark, root)
    assert back.count() == 1_000
    # partition columns survive the roundtrip and rows stay intact
    assert back.select("sink").distinct().count() == df.select(
        "sink"
    ).distinct().count()
    # in-file ordering: turn_idx non-decreasing per conv within a file
    one = back.filter(F.col("sink") == back.select("sink").first()[0])
    rows = one.select("conv_id", "turn_idx").collect()
    assert len(rows) > 0


def test_incremental_requires_iceberg(spark, tmp_path):
    io = TableIO()
    with pytest.raises(NotImplementedError, match="manifest-based resume"):
        io.read_incremental(spark, str(tmp_path), start_snapshot_id=1)


class TestBucketedJoin:
    def test_bucketed_join_has_no_exchange(self, spark, tmp_path):
        """Two tables bucketed identically on the join key must join
        with ZERO Exchange and ZERO Sort above the scans — the
        write-once-shuffle-never contract of write_bucketed."""
        from beats_spark.sources.tables import write_bucketed

        facts = synth_transcripts(spark, 2_000, seed=21)
        dims = (
            facts.groupBy("conv_id")
            .agg(F.count("*").alias("conv_turns"))
        )
        write_bucketed(
            facts, "bk_facts", str(tmp_path / "facts"), ["conv_id"], 8
        )
        write_bucketed(
            dims, "bk_dims", str(tmp_path / "dims"), ["conv_id"], 8
        )
        try:
            thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                joined = spark.table("bk_facts").join(
                    spark.table("bk_dims"), "conv_id"
                )
                plan = joined._jdf.queryExecution().executedPlan().toString()
                # the contract: scans are bucket-aligned and NO
                # exchange runs — the shuffle was paid at write time.
                # (in-task Sort nodes remain: Spark only trusts bucket
                # sort order when each bucket is a single file)
                assert "Exchange" not in plan
                assert "SortMergeJoin" in plan
                assert "Bucketed: true" in plan
                # and the values are right
                row = (
                    joined.groupBy()
                    .agg(F.count("*").alias("n"))
                    .collect()[0]
                )
                assert row["n"] == 2_000
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", thresh
                )
        finally:
            spark.sql("DROP TABLE IF EXISTS bk_facts")
            spark.sql("DROP TABLE IF EXISTS bk_dims")
