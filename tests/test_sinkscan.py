"""ES bulk-failure classification + kafka fnv32a partitioner
(operators/sinkscan.py) vs pure-Python reference implementations."""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.operators.sinkscan import (
    ACKED,
    DROP_NON_INDEXABLE,
    DUPLICATE,
    RETRY_SERVER_ERROR,
    RETRY_TOO_MANY,
    classify_bulk_status,
    fnv32a,
    is_retryable,
    kafka_partition,
)


def _py_fnv32a(s: str) -> int:
    h = 2166136261
    for ch in s.encode():
        h = ((h ^ ch) * 16777619) % (1 << 32)
    return h


def _py_partition(s: str, n: int) -> int:
    h = _py_fnv32a(s)
    i32 = h - (1 << 32) if h >= (1 << 31) else h
    return abs(i32) % n


class TestBulkScan:
    def test_dispositions(self, spark):
        cases = [200, 201, 299, 409, 429, 400, 404, 499, 500, 503]
        df = spark.createDataFrame([(s,) for s in cases], "status int")
        out = {
            r["status"]: (r["d"], r["retry"])
            for r in df.select(
                "status",
                classify_bulk_status(F.col("status")).alias("d"),
                is_retryable(F.col("status")).alias("retry"),
            ).collect()
        }
        for s in (200, 201, 299):
            assert out[s] == (ACKED, False)
        assert out[409] == (DUPLICATE, False)
        assert out[429] == (RETRY_TOO_MANY, True)
        for s in (400, 404, 499):
            assert out[s] == (DROP_NON_INDEXABLE, False)
        for s in (500, 503):
            assert out[s] == (RETRY_SERVER_ERROR, True)


class TestKafkaPartitioner:
    def test_fnv32a_matches_python(self, spark):
        keys = ["", "a", "user-1", "user-42", "conv-000123", "x" * 50]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        got = {
            r["k"]: r["h"]
            for r in df.select("k", fnv32a(F.col("k")).alias("h")).collect()
        }
        for k in keys:
            assert got[k] == _py_fnv32a(k), k

    def test_partition_matches_python(self, spark):
        keys = [f"user-{i}" for i in range(100)]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        got = {
            r["k"]: r["p"]
            for r in df.select(
                "k", kafka_partition(F.col("k"), 12).alias("p")
            ).collect()
        }
        for k in keys:
            assert got[k] == _py_partition(k, 12), k
        assert set(got.values()) <= set(range(12))

    def test_null_key_stays_null(self, spark):
        df = spark.createDataFrame([(None,)], "k string")
        assert (
            df.select(kafka_partition(F.col("k"), 12).alias("p")).collect()[0]["p"]
            is None
        )
