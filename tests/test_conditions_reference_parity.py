"""Condition-engine parity with the reference's OWN test expectations.

Events and expected outcomes vendored from
libbeat/conditions/{conditions,equals,matcher,range}_test.go (the
`secdTestEvent` at conditions_test.go:54-77 and
`httpResponseTestEvent` at conditions_test.go:79-118); each case cites
the Go test it reproduces. Nested MapStr fields become nested struct
columns — dotted condition paths resolve through them natively.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.conditions import compile_condition

SECD_SCHEMA = (
    "proc struct<cmdline:string,cpu:struct<start_time:string,system:long,"
    "total:long,total_p:double,user:long>,name:string,pid:long,ppid:long,"
    "state:string,username:string,keywords:array<string>>, "
    "tags array<string>, type string, final boolean"
)

SECD = {
    "proc": {
        "cmdline": "/usr/libexec/secd",
        "cpu": {
            "start_time": "Apr10",
            "system": 1988,
            "total": 6029,
            "total_p": 0.08,
            "user": 4041,
        },
        "name": "secd",
        "pid": 305,
        "ppid": 1,
        "state": "running",
        "username": "monica",
        "keywords": ["foo", "bar"],
    },
    "tags": ["auditbeat", "prod", "security"],
    "type": "process",
    "final": False,
}

HTTP_SCHEMA = (
    "bytes_in long, bytes_out long, client_ip string, "
    "http struct<code:long,phrase:string>, status long, type string, "
    "source string, message string, responsetime long"
)

HTTP = {
    "bytes_in": 126,
    "bytes_out": 28033,
    "client_ip": "127.0.0.1",
    "http": {"code": 200, "phrase": "OK"},
    "status": 200,
    "type": "http",
    "source": "/var/log/apache2/error.log",
    "message": (
        "[Fri Dec 16 01:46:23 2005] [error] [client 1.2.3.4] "
        "Directory index forbidden by rule: /home/test/"
    ),
    "responsetime": 30,
}


def _check(spark, event, schema, cond) -> bool:
    df = spark.createDataFrame([event], schema)
    col = compile_condition(cond, df)
    return df.select(col.alias("m")).collect()[0]["m"]


# (reference test name @ file:line, event, condition, expected)
CASES = [
    # equals_test.go:37 TestEqualsSingleFieldPositiveMatch
    ("equals_single", SECD, SECD_SCHEMA, {"equals": {"type": "process"}}, True),
    # equals_test.go:45 TestEqualsBooleanFieldNegativeMatch
    ("equals_bool_neg", SECD, SECD_SCHEMA, {"equals": {"final": True}}, False),
    # equals_test.go:53 TestEqualsMultiFieldAndTypePositiveMatch
    (
        "equals_multi",
        SECD,
        SECD_SCHEMA,
        {"equals": {"type": "process", "proc.pid": 305}},
        True,
    ),
    # matcher_test.go:41 TestContainsMultiFieldPositiveMatch
    (
        "contains_multi",
        SECD,
        SECD_SCHEMA,
        {"contains": {"proc.name": "sec", "proc.username": "monica"}},
        True,
    ),
    # matcher_test.go:50 TestContainsMultiFieldNegativeMatch
    (
        "contains_multi_neg",
        SECD,
        SECD_SCHEMA,
        {"contains": {"type": "process", "proc.name": "secddd"}},
        False,
    ),
    # matcher_test.go:59 TestContainsSingleFieldPositiveMatch (array)
    (
        "contains_array_keywords",
        SECD,
        SECD_SCHEMA,
        {"contains": {"proc.keywords": "bar"}},
        True,
    ),
    # matcher_test.go:67 TestContainsArrayOfStringPositiveMatch
    ("contains_tags", SECD, SECD_SCHEMA, {"contains": {"tags": "prod"}}, True),
    # matcher_test.go:75 TestRegexpCondition (error source matches)
    (
        "regexp_error_source",
        HTTP,
        HTTP_SCHEMA,
        {"regexp": {"source": "apache2/error.*"}},
        True,
    ),
    (
        "regexp_access_source_neg",
        HTTP,
        HTTP_SCHEMA,
        {"regexp": {"source": "apache2/access.*"}},
        False,
    ),
    # range_test.go:49 TestRangeSingleFieldNegativeMatch
    (
        "range_total_p_neg",
        SECD,
        SECD_SCHEMA,
        {"range": {"proc.cpu.total_p.gt": 0.5}},
        False,
    ),
    # range_test.go:57 TestClosedRangeConditionPositiveMatch
    (
        "range_closed",
        HTTP,
        HTTP_SCHEMA,
        {"range": {"http.code": {"gte": 100, "lt": 300}}},
        True,
    ),
    # range_test.go:66 TestOpenRangeConditionPositiveMatch
    ("range_open", HTTP, HTTP_SCHEMA, {"range": {"bytes_out.gte": 2800}}, True),
    # range_test.go:74 TestMultipleOpenRangeConditionNegativeMatch
    (
        "range_multi_neg",
        HTTP,
        HTTP_SCHEMA,
        {"range": {"bytes_out.gte": 2800, "responsetime.gt": 30}},
        False,
    ),
    # conditions_test.go:~120 combined OR(range, AND(equals, equals))
    (
        "or_and_combined",
        HTTP,
        HTTP_SCHEMA,
        {
            "or": [
                {"range": {"http.code": {"gte": 100, "lt": 300}}},
                {
                    "and": [
                        {"equals": {"status": 200}},
                        {"equals": {"type": "http"}},
                    ]
                },
            ]
        },
        True,
    ),
]


@pytest.mark.parametrize(
    "name,event,schema,cond,expected",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_reference_condition_parity(spark, name, event, schema, cond, expected):
    assert _check(spark, event, schema, cond) is expected
