"""process(event) migration adapter (operators/jsevent.py): the three
worked JS programs from the reference docs
(libbeat/docs/processors-using.asciidoc:1420-1485) ported 1:1 and
parity-tested on their golden in/out pairs, plus the beatevent_v0
API-semantics table
(libbeat/processors/script/javascript/beatevent_v0_test.go:46-140)."""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.operators.actions import Script
from beats_spark.operators.jsevent import Event, process_event_script


class TestEventApi:
    """beatevent_v0_test.go semantics, case for case (flat-column
    field model: dotted names ARE the column names)."""

    def test_put_returns_previous_and_sets(self):
        e = Event({"hello": None})
        assert e.Put("hello", "world") is None
        assert e.Get("hello") == "world"
        assert e.Put("hello", "again") == "world"

    def test_get_undefined_key_is_none(self):
        assert Event({}).Get("source.ip") is None

    def test_get_without_key_returns_fields(self):
        e = Event({"source.ip": "192.0.2.1"})
        assert e.Get() == {"source.ip": "192.0.2.1"}

    def test_delete(self):
        e = Event({"source.ip": "192.0.2.1"})
        assert e.Delete("source.ip") is True
        assert e.Get("source.ip") is None
        assert e.Delete("source.ip") is False  # already gone

    def test_rename_refuses_occupied_target_and_absent_source(self):
        # "Fields cannot be overwritten. Either the target field has
        # to be deleted or renamed." — beatevent_v0.go:167-171
        e = Event({"a": 1, "b": 2})
        assert e.Rename("a", "b") is False
        assert e.Rename("missing", "c") is False
        e2 = Event({"source.ip": "192.0.2.1", "destination.ip": None})
        assert e2.Rename("source.ip", "destination.ip") is True
        assert e2.Get("destination.ip") == "192.0.2.1"
        assert e2.Get("source.ip") is None

    def test_tag_appends_and_dedups(self):
        e = Event({"tags": None})
        e.Tag("js")
        e.Tag("js")
        e.Tag("prod")
        assert e.Get("tags") == ["js", "prod"]

    def test_append_to(self):
        e = Event({"related.ip": ["10.0.0.1"]})
        e.AppendTo("related.ip", "10.0.0.2")
        assert e.Get("related.ip") == ["10.0.0.1", "10.0.0.2"]

    def test_cancel(self):
        e = Event({})
        e.Cancel()
        assert e._cancelled


class TestWorkedPrograms:
    """The reference docs' own programs, run through Script +
    process_event_script over a DataFrame; goldens are the asciidoc's
    stated outcomes."""

    def test_tag_js_program(self, spark):
        # processors-using.asciidoc:1427-1429: process = event.Tag("js")
        def process(event):
            event.Tag("js")

        df = spark.createDataFrame(
            [(1, ["existing"]), (2, None)],
            "id long, tags array<string>",
        )
        out = {
            r["id"]: r["tags"]
            for r in Script(fn=process_event_script(process))
            .apply(df)
            .collect()
        }
        assert out[1] == ["existing", "js"]
        assert out[2] == ["js"]

    def test_severity_threshold_cancel_with_register(self, spark):
        # processors-using.asciidoc:1449-1465: register(params) sets
        # the threshold, process cancels events below it
        state = {"threshold": 42}

        def register(script_params):
            state.update(script_params)

        def process(event):
            if event.Get("severity") < state["threshold"]:
                event.Cancel()

        fn = process_event_script(
            process, register=register, params={"threshold": 15}
        )
        df = spark.createDataFrame(
            [(1, 10), (2, 15), (3, 99)], "id long, severity long"
        )
        got = sorted(r["id"] for r in Script(fn=fn).apply(df).collect())
        assert got == [2, 3]  # 1 cancelled (10 < 15); params won

    def test_event_code_1102_golden_pair(self, spark):
        # processors-using.asciidoc:1473-1485 — the script's own
        # test(): in {event.code: 1102} -> event.action == "cleared"
        def process(event):
            if event.Get("event.code") == 1102:
                event.Put("event.action", "cleared")

        df = spark.createDataFrame(
            [(1, 1102), (2, 4625)], "id long, `event.code` long"
        )
        out = {
            r["id"]: r["event.action"]
            for r in Script(
                fn=process_event_script(
                    process, added={"event.action": "string"}
                )
            )
            .apply(df)
            .collect()
        }
        assert out[1] == "cleared"
        assert out[2] is None

    def test_runs_arrow_batched(self, spark):
        # the adapter is mapInPandas (Arrow), never row-at-a-time UDF
        def process(event):
            event.Put("x", 1)

        df = spark.createDataFrame([(1,)], "id long")
        plan = (
            process_event_script(process, added={"x": "int"})(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "MapInPandas" in plan
        assert "BatchEvalPython" not in plan
