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


def test_when_contains_on_array_column_matches_per_element(spark):
    # matcher.go:71-105: 'contains' over an array matches ANY ELEMENT
    # containing the substring. The probe value "n, w" would match the
    # STRING RENDERING "[production, web]" but no element — so this
    # test fails if the guard compiles without the DataFrame schema.
    df = spark.createDataFrame(
        [(1, ["production", "web"]), (2, ["staging"])],
        "id long, tags array<string>",
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"contains": {"tags": "n, w"}},
                then=AddFields({"hit": "y"}),
            ),
            When(
                condition={"contains": {"tags": "prod"}},
                then=AddFields({"element_hit": "y"}),
            ),
        ],
    ).collect()
    rows = {r["id"]: r for r in out}
    assert rows[1]["hit"] is None  # rendered-string match must NOT fire
    assert rows[1]["element_hit"] == "y"  # per-element substring does
    assert rows[2]["element_hit"] is None


def test_selector_rule_contains_on_array_column(spark):
    from beats_spark.operators.selector import Rule, compile_selector

    df = spark.createDataFrame(
        [(1, ["production", "web"]), (2, ["staging"])],
        "id long, tags array<string>",
    )
    sel = compile_selector(
        [Rule(value="prod-sink", when={"contains": {"tags": "prod"}})],
        default="misc",
        df=df,
    )
    got = {r["id"]: r["sink"] for r in df.withColumn("sink", sel).collect()}
    assert got == {1: "prod-sink", 2: "misc"}
