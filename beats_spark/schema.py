"""Schemas for the transcript pipeline.

The input table shape is fixed by the engine contract (BASELINE.json
input_hint): multi-turn conversation / agent transcripts. The event
data model mirrors the reference's ``beat.Event`` (libbeat/beat/
event.go:35-40): known columns are typed (the Fields that every module
emits), dynamic parse products go to a ``map<string,string>`` overflow
column — lossless because dissect values are always strings
(libbeat/processors/dissect/dissect.go:23 ``Map = map[string]string``).
"""

from __future__ import annotations

from pyspark.sql import types as T

# Input: transcripts table (conv_id, turn_idx) is the stable ordering key.
TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampType(), True),
    ]
)

# Pipeline metrics row — counter names mirror the reference's pipeline
# observer (libbeat/publisher/pipeline/monitoring.go:88-97).
METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("sink", T.StringType(), False),
        T.StructField("events_total", T.LongType(), False),
        T.StructField("events_filtered", T.LongType(), False),
        T.StructField("events_published", T.LongType(), False),
        T.StructField("events_failed", T.LongType(), False),
    ]
)

# Manifest row — registrar-style checkpoint per input partition
# (filebeat/registrar/registrar.go:277-313, input/file/state.go:32-43).
MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("status", T.StringType(), False),
        T.StructField("rows_in", T.LongType(), False),
        T.StructField("rows_routed", T.LongType(), False),
        T.StructField("checksum", T.StringType(), True),
        T.StructField("updated_ts", T.TimestampType(), True),
    ]
)

FLAGS_FIELD = "log_flags"  # reference: beat.FlagField = "log.flags"
