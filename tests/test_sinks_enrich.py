"""Codecs/sinks (§2.7), dns enrich, truncate flag."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.actions import TruncateFields, apply_chain
from beats_spark.operators.codecs import (
    codec_format,
    codec_json,
    console_lines,
    write_ndjson,
)
from beats_spark.operators.enrich import DnsEnrich


class TestCodecs:
    def test_json_codec_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("c1", 0, "hello")], "conv_id string, turn_idx int, text string"
        )
        out = str(tmp_path / "nd")
        write_ndjson(df, out)
        lines = [
            json.loads(r["value"])
            for r in spark.read.text(out).collect()
        ]
        assert lines == [{"conv_id": "c1", "turn_idx": 0, "text": "hello"}]

    def test_format_codec(self, spark):
        df = spark.createDataFrame(
            [("c1", "user")], "conv_id string, role string"
        ).withColumn("ts", F.to_timestamp(F.lit("2024-01-02 03:04:05")))
        line = df.select(
            codec_format("%{[role]}@%{[conv_id]}-%{+yyyy.MM.dd}").alias("l")
        ).collect()[0]["l"]
        assert line == "user@c1-2024.01.02"

    def test_console_lines(self, spark):
        df = spark.createDataFrame([("a",), ("b",)], "x string")
        lines = console_lines(df)
        assert sorted(lines) == ['{"x":"a"}', '{"x":"b"}']


class TestDnsEnrich:
    def test_append_deterministic(self, spark):
        df = spark.createDataFrame(
            [("host-a",), ("host-b",), ("host-a",), (None,)], "host string"
        )
        out = DnsEnrich(field="host").apply(df).collect()
        by_host = {}
        for r in out:
            by_host.setdefault(r["host"], set()).add(r["dns_resolved"])
        # same name always resolves identically; nulls stay unresolved
        assert len(by_host["host-a"]) == 1
        assert by_host["host-a"] != by_host["host-b"]
        assert by_host[None] == {None}
        assert next(iter(by_host["host-a"])).startswith("10.")

    def test_replace_action(self, spark):
        df = spark.createDataFrame([("host-a",)], "host string")
        out = DnsEnrich(field="host", action="replace").apply(df)
        assert out.columns == ["host"]
        assert out.collect()[0]["host"].startswith("10.")

    def test_custom_resolver(self, spark):
        df = spark.createDataFrame([("a",), ("b",)], "host string")
        out = DnsEnrich(
            field="host", resolver=lambda names: [f"ip-{n}" for n in names]
        ).apply(df).collect()
        assert {r["host"]: r["dns_resolved"] for r in out} == {
            "a": "ip-a",
            "b": "ip-b",
        }


class TestDecodeJsonErrorKey:
    def test_tags_only_decode_failures(self, spark):
        from beats_spark.operators.actions import DecodeJsonFields

        df = spark.createDataFrame(
            [('{"a":"1"}',), ("not json",), (None,)], "props string"
        )
        out = apply_chain(
            df, [DecodeJsonFields(fields=["props"], add_error_key=True)]
        ).collect()
        rows = {r["props"]: (r["props_json"], r["log_flags"]) for r in out}
        assert rows['{"a":"1"}'] == ({"a": "1"}, [])
        assert rows["not json"] == (None, ["json_decode_error"])
        assert rows[None] == (None, [])  # null input is not an error

    def test_json_null_literal_is_not_an_error(self, spark):
        # 'null' is a LEGAL JSON document that decodes to NULL — it
        # must not be tagged (readjson only tags actual parse errors)
        from beats_spark.operators.actions import DecodeJsonFields

        df = spark.createDataFrame(
            [("null",), ("  null ",), ("null\n",), ("\tnull",),
             ("null garbage",)],
            "props string",
        )
        out = apply_chain(
            df, [DecodeJsonFields(fields=["props"], add_error_key=True)]
        ).collect()
        rows = {r["props"]: r["log_flags"] for r in out}
        assert rows["null"] == []
        assert rows["  null "] == []  # space padding
        assert rows["null\n"] == []  # JSON whitespace incl. newline
        assert rows["\tnull"] == []  # and tab
        assert rows["null garbage"] == ["json_decode_error"]

    def test_target_equals_source_rejected(self, spark):
        from beats_spark.operators.actions import DecodeJsonFields

        df = spark.createDataFrame([("{}",)], "props string")
        with pytest.raises(ValueError, match="target == source"):
            DecodeJsonFields(fields=["props"], target="props").apply(df)


class TestTruncateFlag:
    def test_flag_only_when_truncated(self, spark):
        df = spark.createDataFrame(
            [("longer than ten",), ("short",)], "text string"
        )
        out = apply_chain(df, [TruncateFields(fields=["text"], max_characters=10)])
        rows = {r["text"]: r["log_flags"] for r in out.collect()}
        assert rows["longer tha"] == ["truncated"]
        assert rows["short"] == []
        assert "_trunc_changed" not in out.columns
