"""Sink result semantics: ES bulk-failure classification and the
kafka hash partitioner (SURVEY.md §2.7).

- :func:`classify_bulk_status` — the per-item disposition logic of
  ``bulkCollectPublishFails`` (outputs/elasticsearch/client.go:461-527):
  <300 acked; 409 duplicate (ok); 429 retry (tooMany); other 4xx
  dropped (nonIndexable); ≥500 retry (fails). The retryable subset is
  what the reference feeds back into the pipeline's retry loop.
- :func:`fnv32a` / :func:`kafka_partition` — the kafka output's
  ``partition.hash`` (outputs/kafka/partition.go:216-275): FNV-1a
  32-bit over the message key, then ``hash2Partition`` (reinterpret
  as int32, absolute value, mod partitions). Column-only arithmetic;
  byte-exact for ASCII keys (multi-byte UTF-8 would need the raw
  encoded bytes, which Spark SQL cannot iterate without a UDF).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: disposition → (counts toward, retried?)
ACKED = "acked"
DUPLICATE = "duplicate"
RETRY_TOO_MANY = "retry_too_many"
DROP_NON_INDEXABLE = "drop_non_indexable"
RETRY_SERVER_ERROR = "retry_server_error"

_FNV_OFFSET = 2166136261
_FNV_PRIME = 16777619
_U32 = 1 << 32


def classify_bulk_status(status: Column) -> Column:
    """HTTP item status → disposition label (client.go:512-527)."""
    return (
        F.when(status < 300, ACKED)
        .when(status == 409, DUPLICATE)
        .when(status == 429, RETRY_TOO_MANY)
        .when(status < 500, DROP_NON_INDEXABLE)
        .otherwise(RETRY_SERVER_ERROR)
    )


def is_retryable(status: Column) -> Column:
    """The subset returned for retry: 429 and 5xx."""
    return (status == 429) | (status >= 500)


def classify_bulk_status_sql(status_expr: str) -> str:
    """DuckDB mirror (lock-step with :func:`classify_bulk_status`)."""
    return f"""
CASE WHEN {status_expr} < 300 THEN '{ACKED}'
     WHEN {status_expr} = 409 THEN '{DUPLICATE}'
     WHEN {status_expr} = 429 THEN '{RETRY_TOO_MANY}'
     WHEN {status_expr} < 500 THEN '{DROP_NON_INDEXABLE}'
     ELSE '{RETRY_SERVER_ERROR}' END
"""


def fnv32a(c: Column) -> Column:
    """FNV-1a 32-bit over the chars of an ASCII string — a sequential
    fold, expressed as ``aggregate`` over character positions (stays
    in whole-stage codegen; intermediate fits in 64-bit: 2^32 · prime
    < 2^57)."""
    folded = F.aggregate(
        F.sequence(F.lit(1), F.length(c)),
        F.lit(_FNV_OFFSET).cast("long"),
        lambda h, i: F.pmod(
            h.bitwiseXOR(F.ascii(F.substring(c, i, F.lit(1))).cast("long"))
            * F.lit(_FNV_PRIME),
            F.lit(_U32),
        ),
    )
    # sequence(1, 0) DESCENDS in Spark rather than being empty — an
    # empty key must fold zero bytes and return the offset basis
    return F.when(F.length(c) == 0, F.lit(_FNV_OFFSET).cast("long")).otherwise(
        folded
    )


def fnv32a_sql(expr: str) -> str:
    """DuckDB mirror: same fold, seed prepended into the list because
    DuckDB's list_reduce has no initial-value form."""
    codes = (
        f"list_transform(range(1, length({expr}) + 1),"
        f" i -> ascii(substr({expr}, i::INT, 1))::BIGINT)"
    )
    return (
        f"list_reduce(list_prepend({_FNV_OFFSET}::BIGINT, {codes}),"
        f" (h, c) -> (xor(h, c) * {_FNV_PRIME}) % {_U32})"
    )


def kafka_partition(key: Column, num_partitions: int) -> Column:
    """hash2Partition (partition.go:272-277): reinterpret the uint32
    as int32, absolute value (in 64-bit — no MinInt32 overflow), mod
    partitions. ``|int32(h)| = min(h, 2^32 - h)`` for h in [0, 2^32),
    which is branch-free — the expensive per-char fold appears only in
    least()'s two arguments, which codegen subexpression elimination
    shares (WHEN branches would not be). NULL keys keep NULL (the
    reference falls back to a random partition; randomness is banned
    here — route NULLs explicitly upstream)."""
    h = fnv32a(key)
    p = F.least(h, F.lit(_U32) - h) % num_partitions
    return F.when(key.isNotNull(), p).cast("int")


def kafka_partition_sql(expr: str, num_partitions: int) -> str:
    h = fnv32a_sql(expr)
    return f"""
CAST(CASE WHEN {expr} IS NULL THEN NULL ELSE
  least(({h}), {_U32} - ({h})) % {num_partitions} END AS INTEGER)
"""
