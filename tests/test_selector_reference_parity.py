"""Selector parity with the reference's outil.Selector test table
(libbeat/outputs/outil/select_test.go:34-185 — every case below names
the `title` it reproduces; all expect "value").

One documented divergence: the reference evaluates `%{[field]}` on a
MISSING field to "" at run time; our engine has a fixed schema, so the
column exists with NULL — the fall-through behavior (rule yields
nothing → default / next rule) is identical.
"""

from __future__ import annotations

import pytest

from beats_spark.operators.selector import Rule, compile_selector


def _select(spark, rules, event: dict, default=None) -> str:
    df = spark.createDataFrame(
        [
            (
                event.get("key"),
                event.get("test"),
            )
        ],
        "key string, test string",
    )
    return df.select(
        compile_selector(rules, default=default).alias("sink")
    ).collect()[0]["sink"]


CASES = [
    # "constant key"
    ("constant key", [Rule(value="value")], {}),
    # "format string key"
    ("format string key", [Rule(value="%{[key]}")], {"key": "value"}),
    # "constant in multi key"
    ("constant in multi key", [Rule(value="value")], {}),
    # "missing format string key with default in rule"
    (
        "missing fmtstr with rule default",
        [Rule(value="%{[key]}", default="value")],
        {},
    ),
    # "empty format string key with default in rule"
    (
        "empty fmtstr with rule default",
        [Rule(value="%{[key]}", default="value")],
        {"key": ""},
    ),
    # "missing format string key with constant in next rule"
    (
        "missing fmtstr, constant next rule",
        [Rule(value="%{[key]}"), Rule(value="value")],
        {},
    ),
    # "apply mapping"
    (
        "apply mapping",
        [Rule(value="%{[key]}", mappings={"v": "value"})],
        {"key": "v"},
    ),
    # "apply mapping with default on empty key"
    (
        "mapping default on empty key",
        [Rule(value="%{[key]}", default="value", mappings={"v": "v"})],
        {"key": ""},
    ),
    # "apply mapping with default on empty lookup"
    (
        "mapping default on empty lookup",
        [Rule(value="%{[key]}", default="value", mappings={"v": ""})],
        {"key": "v"},
    ),
    # "apply mapping without match"
    (
        "mapping without match falls through",
        [Rule(value="%{[key]}", mappings={"v": ""}), Rule(value="value")],
        {"key": "x"},
    ),
    # "mapping with constant key"
    (
        "mapping with constant key",
        [Rule(value="k", mappings={"k": "value"})],
        {},
    ),
    # "mapping with missing constant key"
    (
        "mapping with missing constant key",
        [Rule(value="unknown", mappings={"k": "wrong"}), Rule(value="value")],
        {},
    ),
    # "mapping with missing constant key, but default"
    (
        "mapping missing key but default",
        [Rule(value="unknown", default="value", mappings={"k": "wrong"})],
        {},
    ),
    # "matching condition"
    (
        "matching condition",
        [Rule(value="value", when={"equals": {"test": "test"}})],
        {"test": "test"},
    ),
    # "failing condition"
    (
        "failing condition",
        [
            Rule(value="wrong", when={"equals": {"test": "test"}}),
            Rule(value="value"),
        ],
        {"test": "x"},
    ),
]


@pytest.mark.parametrize("title,rules,event", CASES, ids=[c[0] for c in CASES])
def test_selector_reference_parity(spark, title, rules, event):
    assert _select(spark, rules, event) == "value"
