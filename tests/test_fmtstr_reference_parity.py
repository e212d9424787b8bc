"""fmtstr parity with the reference's formatevents test table
(libbeat/common/fmtstr/formatevents_test.go:31-128). Each case names
the `title` it reproduces. The event timestamp is 2015-05-01
20:12:34 UTC (the Go table uses time.Local; our engine pins UTC).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.fmtstr import compile_fmtstr, is_const


def _render(spark, fmt: str, event: dict) -> str:
    df = spark.createDataFrame(
        [
            (
                event.get("key"),
                event.get("key1"),
                event.get("key2"),
                {"key": event["nested.key"]} if "nested.key" in event else None,
            )
        ],
        "key string, key1 string, key2 string, nested struct<key:string>",
    ).withColumn("ts", F.to_timestamp(F.lit("2015-05-01 20:12:34")))
    return df.select(compile_fmtstr(fmt).alias("out")).collect()[0]["out"]


CASES = [
    # "no fields configured"
    ("no fields configured", "format string", {}, "format string"),
    # "expand event field"
    ("expand event field", "%{[key]}", {"key": "value"}, "value"),
    # "expand with default" (missing → NULL → default)
    ("expand with default", "%{[key]:default}", {}, "default"),
    # "expand nested event field"
    ("nested field", "%{[nested.key]}", {"nested.key": "value"}, "value"),
    # "expand nested event field (alt. syntax)"
    ("nested alt syntax", "%{[nested][key]}", {"nested.key": "value"}, "value"),
    # "multiple event fields"
    (
        "multiple fields",
        "%{[key1]} - %{[key2]}",
        {"key1": "v1", "key2": "v2"},
        "v1 - v2",
    ),
    # "same fields"
    ("same fields", "%{[key]} - %{[key]}", {"key": "value"}, "value - value"),
    # "same fields with default (first)"
    (
        "default first",
        "%{[key]:default} - %{[key]}",
        {"key": "value"},
        "value - value",
    ),
    # "same fields with default (second)"
    (
        "default second",
        "%{[key]} - %{[key]:default}",
        {"key": "value"},
        "value - value",
    ),
    # "test timestamp formatter" (Joda YYYY → java.time yyyy)
    (
        "timestamp formatter",
        "%{[key]}: %{+yyyy.MM.dd}",
        {"key": "timestamp"},
        "timestamp: 2015.05.01",
    ),
    # "test timestamp formatter" (@timestamp ISO millis)
    (
        "@timestamp iso",
        "%{[@timestamp]}: %{+yyyy.MM.dd}",
        {"key": "timestamp"},
        "2015-05-01T20:12:34.000Z: 2015.05.01",
    ),
]


@pytest.mark.parametrize(
    "title,fmt,event,expected", CASES, ids=[c[0] for c in CASES]
)
def test_fmtstr_reference_parity(spark, title, fmt, event, expected):
    assert _render(spark, fmt, event) == expected


def test_is_const():
    assert is_const("plain")
    assert not is_const("%{[key]}")
    assert not is_const("x-%{+yyyy}")
