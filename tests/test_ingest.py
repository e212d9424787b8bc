"""ES ingest-pipeline step executor tests (operators/ingest.py),
modeled on the reference apache module program
(filebeat/module/apache/access/ingest/default.json:1-60)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.ingest import (
    IngestError,
    IngestPipeline,
    translate_joda,
)

APACHE = (
    "%{IPV4:source.address} - %{USER:user.name} "
    "\\[%{HTTPDATE:apache.access.time}\\] "
    '"%{WORD:http.request.method} %{NOTSPACE:url.original} '
    'HTTP/%{NUMBER:http.version}" '
    "%{INT:http.response.status_code:int} %{INT:http.response.body.bytes:long}"
)

APACHE_STEPS = [
    {"grok": {"field": "message", "patterns": [APACHE], "ignore_missing": True}},
    {"remove": {"field": "message"}},
    {"date": {"field": "apache.access.time", "target_field": "@timestamp",
              "formats": ["dd/MMM/yyyy:H:m:s Z"], "ignore_failure": True}},
    {"remove": {"field": "apache.access.time", "ignore_failure": True}},
    # module programs end with processors we can't run — must be skipped
    {"user_agent": {"field": "user_agent.original", "ignore_failure": True}},
    {"geoip": {"field": "source.ip", "target_field": "source.geo",
               "ignore_missing": True}},
]


@pytest.fixture(scope="module")
def lines(spark):
    return spark.createDataFrame(
        [
            (1, '10.0.1.2 - alice [10/Oct/2000:13:55:36 -0700] '
                '"GET /x HTTP/1.1" 200 1234'),
            (2, '10.0.1.3 - bob [01/Jan/2024:00:05:09 +0530] '
                '"POST /y HTTP/1.1" 404 77'),
            (3, "unparseable"),
        ],
        "event_id long, message string",
    )


class TestApachePipeline:
    def test_full_program(self, spark, lines):
        out = IngestPipeline(APACHE_STEPS).apply(lines)
        rows = {
            r["event_id"]: r
            for r in out.select(
                "event_id",
                F.col("`source.address`").alias("addr"),
                F.col("`http.response.status_code`").alias("status"),
                F.unix_timestamp("`@timestamp`").alias("epoch"),
            ).collect()
        }
        assert rows[1]["addr"] == "10.0.1.2"
        assert rows[1]["status"] == 200
        # 13:55:36 -0700 == 20:55:36 UTC on 2000-10-10
        assert rows[1]["epoch"] == 971211336
        # +0530 offset crosses the date line backwards
        assert rows[2]["epoch"] == 1704047709
        # unparseable row: grok leaves NULLs, date yields NULL
        assert rows[3]["addr"] is None and rows[3]["epoch"] is None
        # removes dropped both intermediates; ignored processors are gone
        assert "message" not in out.columns
        assert "apache.access.time" not in out.columns

    def test_grok_failure_flagged(self, spark, lines):
        out = IngestPipeline(APACHE_STEPS).apply(lines)
        flags = {r["event_id"]: r["log_flags"] for r in out.collect()}
        assert "grok_parsing_error" in flags[3]
        assert "grok_parsing_error" not in flags[1]


class TestSteps:
    def test_date_multi_format_first_wins(self, spark):
        df = spark.createDataFrame(
            [("2024-01-01T12:00:00+00:00",), ("01/Jan/2024:12:00:00 +0000",)],
            "t string",
        )
        out = IngestPipeline(
            [{"date": {"field": "t", "formats":
                       ["ISO8601", "dd/MMM/yyyy:H:m:s Z"]}}]
        ).apply(df)
        got = sorted(
            r[0] for r in out.select(F.unix_timestamp("`@timestamp`")).collect()
        )
        assert got == [1704110400, 1704110400]

    def test_date_epoch_formats(self, spark):
        df = spark.createDataFrame([("1704110400",)], "t string")
        out = IngestPipeline(
            [{"date": {"field": "t", "formats": ["UNIX"]}}]
        ).apply(df)
        assert out.select(
            F.unix_timestamp("`@timestamp`")
        ).first()[0] == 1704110400

    def test_date_dirty_value_fails_document_not_job(self, spark):
        # ANSI cast would abort the whole job on one malformed value;
        # ingest date fails only the document (NULL here)
        df = spark.createDataFrame(
            [("1704110400",), ("not-a-number",)], "t string"
        )
        out = IngestPipeline(
            [{"date": {"field": "t", "formats": ["UNIX"],
                       "ignore_failure": True}}]
        ).apply(df)
        got = sorted(
            (r[0] for r in out.select(
                F.unix_timestamp("`@timestamp`")).collect()),
            key=lambda x: (x is None, x),
        )
        assert got == [1704110400, None]

    def test_date_mixed_formats_fall_through(self, spark):
        # a non-numeric value must fall through UNIX to the next format
        df = spark.createDataFrame(
            [("1704110400",), ("2024-01-01T12:00:00+00:00",)], "t string"
        )
        out = IngestPipeline(
            [{"date": {"field": "t", "formats": ["UNIX", "ISO8601"]}}]
        ).apply(df)
        got = {r[0] for r in out.select(F.unix_timestamp("`@timestamp`")).collect()}
        assert got == {1704110400, 1704110400}

    def test_date_unix_ms_keeps_millis(self, spark):
        df = spark.createDataFrame([("1704110400123",)], "t string")
        out = IngestPipeline(
            [{"date": {"field": "t", "formats": ["UNIX_MS"]}}]
        ).apply(df)
        micros = out.select(
            (F.unix_micros("`@timestamp`")).alias("us")
        ).first()["us"]
        assert micros == 1704110400123000

    def test_convert_dirty_value_nulls_not_crashes(self, spark):
        df = spark.createDataFrame([("abc",), ("42",)], "n string")
        out = IngestPipeline(
            [{"convert": {"field": "n", "type": "long",
                          "ignore_failure": True}}]
        ).apply(df)
        assert {r["n"] for r in out.collect()} == {None, 42}

    def test_rename_target_exists_ignore_failure(self, spark):
        df = spark.createDataFrame([(1, 2)], "a long, b long")
        out = IngestPipeline(
            [{"rename": {"field": "a", "target_field": "b",
                         "ignore_failure": True}}]
        ).apply(df)
        assert out.columns == ["a", "b"]  # document passes unchanged
        with pytest.raises(IngestError):
            IngestPipeline(
                [{"rename": {"field": "a", "target_field": "b"}}]
            ).apply(df)

    def test_ignore_processors_skips_supported_steps_too(self, spark):
        df = spark.createDataFrame([(1,)], "a long")
        out = IngestPipeline(
            [{"set": {"field": "tag", "value": "x"}}],
            ignore_processors=("set",),
        ).apply(df)
        assert out.columns == ["a"]  # step skipped, not applied

    def test_convert_rename_set_case(self, spark):
        df = spark.createDataFrame([("42", "AbC")], "n string, s string")
        out = IngestPipeline(
            [
                {"convert": {"field": "n", "type": "long"}},
                {"rename": {"field": "n", "target_field": "count"}},
                {"set": {"field": "tag", "value": "x"}},
                {"lowercase": {"field": "s"}},
            ]
        ).apply(df)
        r = out.first()
        assert r["count"] == 42 and out.schema["count"].dataType.simpleString() == "bigint"
        assert r["tag"] == "x"
        assert r["s"] == "abc"

    def test_missing_field_policies(self, spark):
        df = spark.createDataFrame([(1,)], "a long")
        # ignore_missing skips; absence of it raises
        for step in (
            {"grok": {"field": "nope", "patterns": ["%{INT:x}"],
                      "ignore_missing": True}},
            {"remove": {"field": "nope", "ignore_missing": True}},
            {"rename": {"field": "nope", "target_field": "b",
                        "ignore_missing": True}},
            {"date": {"field": "nope", "formats": ["UNIX"],
                      "ignore_failure": True}},
            {"convert": {"field": "nope", "type": "long",
                         "ignore_missing": True}},
        ):
            assert IngestPipeline([step]).apply(df).columns == ["a"]
        with pytest.raises(IngestError):
            IngestPipeline([{"remove": {"field": "nope"}}]).apply(df)
        with pytest.raises(IngestError):
            IngestPipeline([{"frobnicate": {"field": "a"}}]).apply(df)

    def test_load_pipeline_document(self, spark, lines):
        # the module-pipeline JSON format loads directly (shape of
        # filebeat/module/apache/access/ingest/default.json)
        import json

        from beats_spark.operators.ingest import load_ingest_pipeline

        doc = json.dumps(
            {
                "description": "test program",
                "processors": APACHE_STEPS,
                "on_failure": [
                    {"set": {"field": "error.message",
                             "value": "{{ _ingest.on_failure_message }}"}}
                ],
            }
        )
        out = load_ingest_pipeline(doc).apply(lines)
        assert "message" not in out.columns
        assert "@timestamp" in out.columns
        from beats_spark.operators.ingest import IngestError

        with pytest.raises(IngestError):
            load_ingest_pipeline("{}")

    def test_translate_joda(self):
        assert translate_joda("dd/MMM/yyyy:H:m:s Z") == "dd/MMM/yyyy:H:m:s Z"
        assert translate_joda("yyyy-MM-dd HH:mm:ss ZZ") == "yyyy-MM-dd HH:mm:ss XXX"
        assert translate_joda("UNIX") == "epoch-seconds"
