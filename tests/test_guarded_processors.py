"""when:-guarded processors leave non-matching rows untouched
(processors/conditionals.go:59-91) — incl. the parse processors whose
flags columns interact with the guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.operators.actions import (
    AddFields,
    Dissect,
    Grok,
    TruncateFields,
    When,
    apply_chain,
)


def test_guarded_dissect_only_touches_matching_rows(spark):
    df = spark.createDataFrame(
        [
            ("log", "level=info msg=ok"),
            ("raw", "level=warn msg=skipme"),
        ],
        "kind string, text string",
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=Dissect(tokenizer="level=%{level} msg=%{msg}"),
            )
        ],
    ).collect()
    rows = {r["kind"]: r for r in out}
    assert rows["log"]["level"] == "info" and rows["log"]["msg"] == "ok"
    # guarded-out row: no parse products, no flags
    assert rows["raw"]["level"] is None and rows["raw"]["msg"] is None
    assert rows["raw"]["log_flags"] is None


def test_guarded_dissect_failure_tags_only_matching(spark):
    df = spark.createDataFrame(
        [("log", "garbage"), ("raw", "garbage")], "kind string, text string"
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=Dissect(tokenizer="level=%{level} msg=%{msg}"),
            )
        ],
    ).collect()
    rows = {r["kind"]: r["log_flags"] for r in out}
    assert rows["log"] == ["dissect_parsing_error"]
    assert rows["raw"] is None


def test_guarded_addfields_and_truncate(spark):
    df = spark.createDataFrame(
        [("a", "long text here"), ("b", "long text here")],
        "k string, text string",
    )
    out = apply_chain(
        df,
        [
            When(condition={"equals": {"k": "a"}}, then=AddFields(fields={"tag": "x"})),
            When(
                condition={"equals": {"k": "a"}},
                then=TruncateFields(fields=["text"], max_characters=4),
            ),
        ],
    ).collect()
    rows = {r["k"]: r for r in out}
    assert rows["a"]["tag"] == "x" and rows["a"]["text"] == "long"
    assert rows["b"]["tag"] is None and rows["b"]["text"] == "long text here"


def test_guarded_grok(spark):
    df = spark.createDataFrame(
        [("p", "code 200"), ("q", "code 500")], "k string, text string"
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"k": "p"}},
                then=Grok(patterns=["code %{INT:code:int}"]),
            )
        ],
    ).collect()
    rows = {r["k"]: r["code"] for r in out}
    assert rows["p"] == 200
    assert rows["q"] is None
