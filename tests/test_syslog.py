"""RFC3164 syslog parse (functions/syslog.py) vs the reference's
parser/createEvent semantics (filebeat/input/syslog/{parser.go,
input.go:50-61, event.go:224-238})."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from beats_spark.functions.syslog import syslog_parse


def _parse(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], "line string")
    p = syslog_parse(F.col("line"), year=2024)
    return df.select(
        "line", *[c.alias(k) for k, c in p.items()]
    ).collect()


def test_full_line_with_pid(spark):
    (r,) = _parse(
        spark, ["<34>Oct 11 22:14:15 mymachine su[230]: 'su root' failed"]
    )
    assert r["pri"] == 34
    assert r["severity"] == 2 and r["severity_label"] == "Critical"
    assert r["facility"] == 4  # security/authorization
    assert r["hostname"] == "mymachine"
    assert r["program"] == "su"
    assert r["pid"] == 230
    assert r["msg"] == "'su root' failed"
    assert r["ts_syslog"] == datetime(2024, 10, 11, 22, 14, 15)


def test_line_without_pid(spark):
    (r,) = _parse(spark, ["<13>Feb 05 17:32:18 host-1 app: up and running"])
    assert r["pri"] == 13 and r["severity_label"] == "Notice"
    assert r["pid"] is None
    assert r["program"] == "app"
    assert r["msg"] == "up and running"


def test_space_padded_and_single_digit_day(spark):
    # RFC3164 pads single-digit days with a space ("Oct  5"); unpadded
    # also appears in the wild — both must parse, neither may throw
    # under ANSI mode
    rows = _parse(
        spark,
        [
            "<13>Oct  5 01:02:03 h su: m",
            "<13>Oct 5 01:02:03 h su: m",
        ],
    )
    for r in rows:
        assert r["syslog_ok"] is True
        assert r["ts_syslog"] == datetime(2024, 10, 5, 1, 2, 3)


def test_facility_label_table_is_complete():
    from beats_spark.functions.syslog import FACILITY_LABELS

    assert len(FACILITY_LABELS) == 24  # RFC3164 facilities 0-23
    assert FACILITY_LABELS[10] == "security/authorization"  # authpriv
    assert FACILITY_LABELS[16] == "local0"
    assert FACILITY_LABELS[23] == "local7"


def test_garbage_yields_nulls_and_flag(spark):
    (r,) = _parse(spark, ["not a syslog line"])
    assert r["syslog_ok"] is False
    assert r["pri"] is None and r["hostname"] is None and r["msg"] is None
