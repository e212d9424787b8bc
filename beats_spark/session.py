"""SparkSession factory tuned for the pipeline.

Local-mode defaults match the sandbox (one JVM, N threads); the same
configs are what we would pass to ``spark-submit`` on a real cluster —
AQE (incl. skew-join splitting), Arrow for pandas UDFs, UTC session
time zone (required for DuckDB-oracle comparison), and shuffle
partitions sized to parallelism instead of the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def build_session(
    app_name: str = "beats_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cores = cores or DEFAULT_CPUS
    # Rule of thumb: shuffle partitions ≈ 2× cores locally. On a real
    # cluster this is executors × cores × 2-3, or left to AQE coalesce.
    shuffle_partitions = shuffle_partitions or max(2 * cores, 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("BEATS_SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        # Dynamic partition overwrite: resume replaces only the sink
        # partitions it recomputes (idempotent fan-out, FIXTURES.md §6).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Multi-byte reader codecs (framing.decode_blob: gbk,
        # shift-jis, euc-*, big5, ebcdic-1047): Spark 4 restricts
        # decode() to 7 charsets unless the legacy JVM set is opened,
        # and ANSI decode aborts the job on malformed bytes — the
        # reference line reader replaces with U+FFFD instead.
        .config("spark.sql.legacy.javaCharsets", "true")
        .config("spark.sql.legacy.codingErrorAction", "true")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
