"""Painless-subset compiler tests (functions/painless.py): the
expression grammar of the module corpus's step-level ``if`` guards,
the statement subset of its ``script`` steps, and the three
recognized loop-script translations.

Semantics pinned against the painless language spec (== lowers to
Objects.equals → null-safe) and the module JSONs the shapes come from
(cited per case)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.painless import (
    PainlessError,
    compile_expression,
    compile_recognized_script,
    compile_statements,
)


def _eval(spark, src, rows, schema, params=None):
    df = spark.createDataFrame(rows, schema)
    col = compile_expression(src, df.columns, params)
    return [r["r"] for r in df.select(col.alias("r")).collect()]


class TestExpressions:
    def test_null_safe_equality(self, spark):
        # painless == is Objects.equals: null == null → true,
        # null != 'x' → true (NOT SQL three-valued logic)
        got = _eval(
            spark,
            "ctx.a == ctx.b",
            [("x", "x"), ("x", "y"), (None, None), (None, "x")],
            "a string, b string",
        )
        assert got == [True, False, True, False]
        got = _eval(
            spark, "ctx.a != 'x'", [("x",), ("y",), (None,)], "a string"
        )
        assert got == [False, True, True]

    def test_null_safe_path(self, spark):
        # ctx.a?.b reads NULL (not error) when the parent is absent —
        # elasticsearch/slowlog: ctx.elasticsearch.slowlog?.duration
        got = _eval(
            spark, "ctx.a?.b != null", [(1,), (None,)], "`a.b` long"
        )
        assert got == [True, False]

    def test_contains_key(self, spark):
        # kibana/log pipeline.json: ctx.kibana.log.meta.containsKey('req')
        got = _eval(
            spark,
            "ctx.containsKey('a')",
            [(1, "z"), (None, "z")],
            "a long, b string",
        )
        assert got == [True, False]
        # a missing column is statically absent → false everywhere
        got = _eval(spark, "ctx.containsKey('nope')", [(1,)], "a long")
        assert got == [False]

    def test_boolean_operators_and_relational(self, spark):
        got = _eval(
            spark,
            "ctx.n >= 10 && !(ctx.s == 'skip') || ctx.n < 0",
            [(12, "go"), (12, "skip"), (-3, "skip"), (5, "go")],
            "n long, s string",
        )
        assert got == [True, False, True, False]

    def test_params_and_literals(self, spark):
        got = _eval(
            spark,
            "ctx.unit == params.seconds_unit",
            [("s",), ("ms",)],
            "unit string",
            params={"seconds_unit": "s"},
        )
        assert got == [True, False]

    def test_first_char_brace_guard(self, spark):
        # elasticsearch/server pipeline.json: ctx.first_char != '{'
        got = _eval(
            spark, "ctx.first_char != '{'", [("{",), ("[",), (None,)],
            "first_char string",
        )
        assert got == [False, True, True]

    def test_unsupported_raises(self):
        with pytest.raises(PainlessError):
            compile_expression("for (x in ctx.l) {}", ["l"])
        with pytest.raises(PainlessError):
            compile_expression("ctx.a ==", ["a"])


class TestStatements:
    def test_if_else_chain_folds_to_case(self, spark):
        # nats/log pipeline.json log-level remap shape
        src = """
        if (ctx.log.level == params.inf) { ctx.log.level = params.info; }
        else if (ctx.log.level == params.dbg) { ctx.log.level = params.debug; }
        else { ctx.log.level = 'other'; }
        """
        df = spark.createDataFrame([("INF",), ("DBG",), ("ERR",)], "`log.level` string")
        assigns = compile_statements(
            src, df.columns,
            {"inf": "INF", "info": "information",
             "dbg": "DBG", "debug": "debug"},
        )
        assert set(assigns) == {"log.level"}
        got = [r[0] for r in df.select(assigns["log.level"]).collect()]
        assert got == ["information", "debug", "other"]

    def test_read_after_write_store_forwarding(self, spark):
        src = "ctx.a = 'x'; ctx.b = ctx.a + '!';"
        df = spark.createDataFrame([("orig",)], "a string")
        assigns = compile_statements(src, df.columns)
        got = df.select(
            assigns["a"].alias("a"), assigns["b"].alias("b")
        ).collect()[0]
        assert (got["a"], got["b"]) == ("x", "x!")

    def test_guarded_assign_keeps_previous(self, spark):
        src = "if (ctx.n > 1) { ctx.tag = 'big'; }"
        df = spark.createDataFrame([(2, "old"), (0, "old")], "n long, tag string")
        assigns = compile_statements(src, df.columns)
        got = [r[0] for r in df.select(assigns["tag"]).collect()]
        assert got == ["big", "old"]

    def test_unit_scale_round(self, spark):
        # elasticsearch/slowlog pipeline.json:
        # ctx.event.duration = Math.round(ctx...duration * params.scale)
        src = "ctx.event.duration = Math.round(ctx.d * params.scale)"
        df = spark.createDataFrame([(1.5,), (None,)], "d double")
        assigns = compile_statements(src, df.columns, {"scale": 1000000})
        got = [r[0] for r in df.select(assigns["event.duration"]).collect()]
        assert got == [1500000, None]


class TestRecognizedScripts:
    def test_field_remap_loop(self, spark):
        # mysql/slowlog pipeline.json shape
        src = ("for (field in params.fields) { "
               "def v = ctx.mysql.slowlog.get(field); if (v != null) { "
               "ctx.mysql.slowlog.put(field, params.mapping.get(v)) } }")
        df = spark.createDataFrame(
            [("YES", None)],
            "`mysql.slowlog.qc_hit` string, `mysql.slowlog.tmp` string",
        )
        assigns = compile_recognized_script(
            src,
            {"fields": ["qc_hit", "tmp"], "mapping": {"YES": "true"}},
            df.columns,
        )
        assert assigns is not None
        row = df.select(
            assigns["mysql.slowlog.qc_hit"].alias("a"),
            assigns["mysql.slowlog.tmp"].alias("b"),
        ).collect()[0]
        assert row["a"] == "true"  # remapped
        assert row["b"] is None    # absent stays absent

    def test_first_public_ip_ipv6_is_not_private(self, spark):
        # nginx/access default.json: the try/catch makes a
        # non-IPv4-parseable entry (IPv6) NOT private → selected
        src = ('boolean isPrivate(def ip) { try { '
               'if (ip.startsWith("10.") || ip.startsWith("192.168.")) '
               '{ return true } } catch (Exception e) { return false } '
               'return false } '
               'for (def item : ctx.remote_ip_list) { '
               'if (!isPrivate(item)) { ctx.source.ip = item; break } } '
               'if (ctx.source.ip == null) '
               '{ ctx.source.ip = ctx.remote_ip_list[0] }')
        df = spark.createDataFrame(
            [
                (["10.0.0.1", "8.8.8.8"],),
                (["::1", "10.2.2.1"],),    # IPv6 first → chosen
                (["10.0.0.1", "127.0.0.1"],),  # all private → entry 0
            ],
            "remote_ip_list array<string>",
        )
        assigns = compile_recognized_script(src, {}, df.columns)
        assert assigns is not None
        got = [r[0] for r in df.select(assigns["source.ip"]).collect()]
        assert got == ["8.8.8.8", "::1", "10.0.0.1"]

    def test_unrecognized_returns_none(self):
        assert compile_recognized_script("while (true) {}", {}, []) is None


class TestParserRobustness:
    def test_fuzz_never_crashes_uncleanly(self):
        """Hypothesis sweep over token soup: the parser/compiler must
        either produce a result or raise PainlessError — never an
        uncaught IndexError/RecursionError/etc. (a module pipeline
        with a typo'd script should fail with a diagnosable message,
        not a stack trace from parser internals)."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from beats_spark.functions.painless import (
            PainlessError,
            _Parser,
            _tokenize,
        )

        tokens = st.sampled_from(
            ["ctx", ".", "a", "b", "=", "==", "(", ")", "[", "]", "'x'",
             "1", "if", "else", "{", "}", ";", "&&", "null", "remove",
             "new", "HashMap", "def", "+", "?.", ",", "contains",
             "charAt", "substring", "(long)", "!"]
        )

        @settings(max_examples=300, deadline=None)
        @given(st.lists(tokens, min_size=1, max_size=12))
        def run(parts):
            src = " ".join(parts)
            try:
                _Parser(_tokenize(src), {}).parse_program()
            except PainlessError:
                pass  # the clean failure mode

        run()

    def test_fuzz_expressions(self, spark):
        # spark fixture: Column construction needs an active session
        from hypothesis import given, settings
        from hypothesis import strategies as st

        from beats_spark.functions.painless import (
            PainlessError,
            compile_expression,
        )

        @settings(max_examples=150, deadline=None)
        @given(st.text(alphabet="ctx.ab=!&|'\"()[]0123 <>?", max_size=30))
        def run(src):
            try:
                compile_expression(src, ["a", "b"])
            except PainlessError:
                pass

        run()
