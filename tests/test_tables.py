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
