"""Salted fan-out for hot conversations (router.sort_for_fanout)."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from beats_spark.operators.router import with_partition_id, write_fanout


def _skewed_df(spark, n=20_000, hot_frac=0.8):
    """One conversation owns hot_frac of all rows."""
    n_hot = int(n * hot_frac)
    df = spark.range(n).select(
        F.when(F.col("id") < n_hot, "conv-hot")
        .otherwise(F.concat(F.lit("conv-"), (F.col("id") % 50).cast("string")))
        .alias("conv_id"),
        F.col("id").cast("int").alias("turn_idx"),
        F.lit("user").alias("role"),
        F.concat(F.lit("text "), F.col("id")).alias("text"),
    )
    return with_partition_id(df, 8).withColumn("sink", F.lit("s"))


def _hot_bucket_files(root: str) -> dict[str, int]:
    out = {}
    for d in glob.glob(f"{root}/sink=*/part_id=*"):
        out[d] = len(glob.glob(f"{d}/*.parquet"))
    return out


class TestSaltedFanout:
    def test_salt_spreads_hot_bucket(self, spark, tmp_path):
        df = _skewed_df(spark)
        unsalted = str(tmp_path / "u")
        salted = str(tmp_path / "s")
        # AQE rightly coalesces the tiny salted partitions at toy
        # scale (a 100 TB hot bucket would stay split); turn the
        # coalescer off to observe the spread itself
        key = "spark.sql.adaptive.coalescePartitions.enabled"
        spark.conf.set(key, "false")
        try:
            write_fanout(df, unsalted)
            write_fanout(df, salted, salt=4)
        finally:
            spark.conf.set(key, "true")

        # the hot conversation's bucket: one file without salt, several
        # (≤4, >1) with — i.e. it was written by multiple tasks
        hot_u = max(_hot_bucket_files(unsalted).values())
        hot_s = max(_hot_bucket_files(salted).values())
        assert hot_u == 1
        assert 1 < hot_s <= 4

    def test_salting_preserves_content_and_order(self, spark, tmp_path):
        df = _skewed_df(spark, n=5_000)
        salted = str(tmp_path / "s2")
        write_fanout(df, salted, salt=4)
        back = spark.read.parquet(salted)
        assert back.count() == 5_000
        # the invariant is defined over (conv_id, turn_idx)-sorted
        # reads: same rows, same order, salt or no salt
        got = [
            (r["conv_id"], r["turn_idx"])
            for r in back.orderBy("conv_id", "turn_idx").collect()
        ]
        want = [
            (r["conv_id"], r["turn_idx"])
            for r in df.orderBy("conv_id", "turn_idx").collect()
        ]
        assert got == want
