"""Dissect kernel conformance — pure Python, no Spark session needed.

Corpus: tests/data/dissect_corpus.json, vendored from the reference's
shared logstash-filter-dissect conformance suite
(libbeat/processors/dissect/testdata/dissect_tests.json; harness at
libbeat/processors/dissect/dissect_test.go:36-91).
"""

from __future__ import annotations

import json
import pathlib
import re

import pytest

from beats_spark.functions.dissect import DissectError, Dissector, compile_tokenizer

CORPUS = json.loads(
    (pathlib.Path(__file__).parent / "data" / "dissect_corpus.json").read_text()
)


@pytest.mark.parametrize("case", CORPUS, ids=[c["name"] for c in CORPUS])
def test_corpus_kernel(case):
    if case.get("skip"):
        pytest.skip("skipped in reference corpus")
    d = Dissector(case["tok"])
    got = d.dissect(case["msg"])
    if case["fail"]:
        assert got is None
    else:
        assert got == case["expected"]


@pytest.mark.parametrize("case", CORPUS, ids=[c["name"] for c in CORPUS])
def test_corpus_regex_lowering(case):
    """Where the tokenizer lowers to a regex, the regex must agree
    byte-for-byte with the kernel (and thus the corpus)."""
    if case.get("skip"):
        pytest.skip("skipped in reference corpus")
    d = Dissector(case["tok"])
    if not d.lowerable():
        pytest.skip("tokenizer uses modifiers → pandas tier")
    pattern, names = d.to_regex()
    m = re.compile(pattern).match(case["msg"])
    if case["fail"]:
        assert m is None
    else:
        got = {
            name: m.group(i + 1)
            for i, name in enumerate(names)
            if name is not None
        }
        assert m is not None
        assert got == case["expected"]


ADVERSARIAL = [
    # (tok, msg, expected or None)
    ("%{a} %{b}", "x ", {"a": "x", "b": ""}),           # last key empty via default position
    ("%{a} %{b}", "x", None),                            # delimiter missing → fail
    ("%{a}|%{b}-%{c}", "x-y|z", None),                  # first-occurrence commit: no backtrack
    ("%{a}%{b}", "xyz", {"a": "", "b": "xyz"}),         # zero-width mid delimiter
    ("%{a} %{b}", "", None),                             # empty input fails
    ("a-%{x}-b", "a-mid-b tail", {"x": "mid"}),         # trailing content ignored
    ("%{a->} %{b}", "x      y", {"a": "x", "b": "y"}),  # left-run consume
    ("%{a} %{b->} ", "x y    ", {"a": "x", "b": "y"}),  # padded last key with trailing delim
    ("[%{ts}] %{msg}", "[t1] hello [x]", {"ts": "t1", "msg": "hello [x]"}),
    ("%{+k} %{+k}", "p q", {"k": "p q"}),
    # append join uses the field's own preceding delimiter: %{+k/2} is
    # preceded by the zero-width start delimiter → default " " join
    ("%{+k/2},%{+k/1}", "b,a", {"k": "a b"}),
    ("%{*k} %{&k}", "color blue", {"color": "blue"}),
]


@pytest.mark.parametrize("tok,msg,expected", ADVERSARIAL)
def test_adversarial_kernel(tok, msg, expected):
    d = compile_tokenizer(tok)
    assert d.dissect(msg) == expected


@pytest.mark.parametrize("tok,msg,expected", ADVERSARIAL)
def test_adversarial_regex_agrees(tok, msg, expected):
    d = compile_tokenizer(tok)
    if not d.lowerable():
        pytest.skip("modifier tokenizer")
    pattern, names = d.to_regex()
    m = re.compile(pattern).match(msg)
    if expected is None or msg == "":
        assert m is None or msg == ""
    else:
        assert m is not None
        got = {n: m.group(i + 1) for i, n in enumerate(names) if n is not None}
        assert got == expected


def test_append_ordinal_ordering():
    d = Dissector("%{+key/3} %{+key/1} %{+key/2}")
    assert d.dissect("1 2 3") == {"key": "2 3 1"}


def test_invalid_tokenizer():
    with pytest.raises(DissectError):
        Dissector("no references at all")
    with pytest.raises(DissectError):
        Dissector("%{+&bad}")


class TestSinglePass:
    """dissect_single_pass: one regexp_replace+split per row instead
    of one regexp_extract per key, with per-row fallback when field
    text contains the \\x1e\\x17 separator."""

    def test_matches_per_key_extraction(self, spark):
        from pyspark.sql import functions as F
        from beats_spark.functions.dissect import (
            dissect_columns,
            dissect_single_pass,
        )

        tok = "%{a} %{b}=%{c}"
        df = spark.createDataFrame(
            [("x y=z",), ("p q=r extra",), ("nodissect",), ("",), (None,)],
            "text string",
        )
        cols, ok = dissect_columns(F.col("text"), tok)
        want = df.select(
            *[c.alias(k) for k, c in cols.items()], ok.alias("ok")
        ).collect()
        df2, cols2, ok2, tmps = dissect_single_pass(df, "text", tok)
        got = df2.select(
            *[c.alias(k) for k, c in cols2.items()], ok2.alias("ok")
        ).collect()
        assert [tuple(r) for r in got] == [tuple(r) for r in want]

    def test_separator_collision_falls_back(self, spark):
        from beats_spark.functions.dissect import dissect_single_pass

        evil = "a\x1e\x17b"
        df = spark.createDataFrame(
            [(f"{evil} k=v",), ("plain k=v",)], "text string"
        )
        df2, cols, ok, tmps = dissect_single_pass(df, "text", "%{a} %{b}=%{c}")
        rows = df2.select(
            cols["a"].alias("a"), cols["c"].alias("c")
        ).collect()
        assert (rows[0]["a"], rows[0]["c"]) == (evil, "v")
        assert (rows[1]["a"], rows[1]["c"]) == ("plain", "v")
