"""TCP delimiter framing parity — filebeat/inputsource/tcp/scan.go.

Expectation tables transcribed from the reference's scanner tests
(inputsource/tcp/scan_test.go TestCustomDelimiter) plus the Go
bufio.Scanner edge semantics the batch port must reproduce.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.framing import (
    frame_datagrams,
    frame_delimited,
    frame_events,
)


def _frames(spark, blob, delimiter="\n"):
    df = spark.createDataFrame([(blob,)], "blob string")
    return df.select(
        frame_delimited(F.col("blob"), delimiter).alias("f")
    ).collect()[0].f


@pytest.mark.parametrize(
    "blob,delim,expect",
    [
        # scan_test.go "split multiple lines"
        ("hello\nworld\n", "\n", ["hello", "world"]),
        # EOF remainder IS a token (scan.go:34-36)
        ("hello\nworld", "\n", ["hello", "world"]),
        # empty token between back-to-back delimiters is emitted
        ("a\n\nb", "\n", ["a", "", "b"]),
        # ...but a trailing empty after the final delimiter is NOT
        # (eof && len(data)==0 → stop)
        ("a\n\n", "\n", ["a", ""]),
        # scan_test.go "Delimiter end of string" / multibyte delimiter
        ("hello<END>world<END>", "<END>", ["hello", "world"]),
        ("hello<END>world", "<END>", ["hello", "world"]),
        # empty stream → zero frames
        ("", "\n", []),
        # delimiter-only stream → one empty frame
        ("\n", "\n", [""]),
        # regex metachars in the delimiter are literal
        ("a|b|c", "|", ["a", "b", "c"]),
    ],
)
def test_frame_delimited(spark, blob, delim, expect):
    assert _frames(spark, blob, delim) == expect


def test_frame_events_order_and_size_flag(spark):
    df = spark.createDataFrame(
        [("c1", "short\n" + "x" * 32 + "\ntail")],
        "conn string, blob string",
    )
    out = (
        frame_events(df, max_message_size=10)
        .orderBy("frame_idx")
        .collect()
    )
    assert [(r.message[:5], r.frame_idx, r.frame_too_long) for r in out] == [
        ("short", 0, False),
        ("xxxxx", 1, True),
        ("tail", 2, False),
    ]


def test_frame_datagrams_truncates(spark):
    df = spark.createDataFrame(
        [("d" * 20,), ("ok",)], "payload string"
    )
    out = frame_datagrams(df, max_message_size=8).collect()
    assert sorted(r.message for r in out) == ["d" * 8, "ok"]
