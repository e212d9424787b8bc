"""Docker/CRI log reader parity — libbeat/reader/readjson/docker_json.go.

Expectation tables transcribed from the reference's reader tests
(libbeat/reader/readjson/docker_json_test.go): json-file partial join,
CRI flag parsing, per-line format autodetect, stream filtering on the
ASSEMBLED event, first-line timestamp / last-line stream.
"""

from __future__ import annotations

import json

import pytest

from beats_spark.sources.docker import docker_logs


def _lines(spark, rows):
    return spark.createDataFrame(
        [("f1", i, line) for i, line in enumerate(rows)],
        "file string, seq long, line string",
    )


def _j(log, stream="stdout", time="2017-09-12T22:32:21.212861448Z"):
    return json.dumps({"log": log, "stream": stream, "time": time})


class TestDockerJson:
    def test_full_lines_pass_through(self, spark):
        out = docker_logs(
            _lines(spark, [_j("line a\n"), _j("line b\n")])
        ).orderBy("first_seq").collect()
        assert [(r.text, r.n_lines, r.terminated) for r in out] == [
            ("line a", 1, True),
            ("line b", 1, True),
        ]

    def test_partial_chain_joins_with_terminator(self, spark):
        # docker_json_test.go "Split lines": partial (no trailing \n)
        # lines join with the full line that terminates the chain
        out = docker_logs(
            _lines(
                spark,
                [_j("1:M 09 Nov 13:27:36.276 # User requested "),
                 _j("shutdown...\n"),
                 _j("next line\n")],
            )
        ).orderBy("first_seq").collect()
        assert [(r.text, r.n_lines) for r in out] == [
            ("1:M 09 Nov 13:27:36.276 # User requested shutdown...", 2),
            ("next line", 1),
        ]

    def test_first_ts_last_stream(self, spark):
        # the assembled event keeps the FIRST line's time (the join
        # loop parses into `next`, never back into `message` —
        # docker_json.go:192-208) and filters on the LAST line's
        # stream (docker_json.go:210)
        out = docker_logs(
            _lines(
                spark,
                [_j("a", time="2020-01-01T00:00:01Z"),
                 _j("b\n", time="2020-01-01T00:00:02Z")],
            )
        ).collect()
        assert len(out) == 1
        assert out[0].time_raw == "2020-01-01T00:00:01Z"

    def test_stream_filter_on_assembled_event(self, spark):
        out = docker_logs(
            _lines(
                spark,
                [_j("keep\n", stream="stderr"), _j("drop\n", stream="stdout")],
            ),
            stream="stderr",
        ).collect()
        assert [r.text for r in out] == ["keep"]

    def test_combine_partial_false_publishes_every_line(self, spark):
        out = docker_logs(
            _lines(spark, [_j("a"), _j("b\n")]), partial=False
        ).orderBy("first_seq").collect()
        assert [(r.text, r.n_lines) for r in out] == [("a", 1), ("b", 1)]

    def test_unterminated_tail_flagged(self, spark):
        # divergence from the Go reader documented in the module
        # docstring: EOF tails are emitted with terminated=false
        # instead of being silently dropped
        out = docker_logs(
            _lines(spark, [_j("done\n"), _j("dangling ")])
        ).orderBy("first_seq").collect()
        assert [(r.text, r.terminated) for r in out] == [
            ("done", True),
            ("dangling ", False),
        ]

    def test_invalid_json_line_flagged(self, spark):
        out = docker_logs(_lines(spark, ['{"not docker"}\n'])).collect()
        assert [r.valid for r in out] == [False]


class TestCri:
    def test_cri_flags_partial_join(self, spark):
        # docker_json_test.go CRI cases: P(artial) tag joins, F(ull)
        # terminates; content is the untouched rest of the line
        out = docker_logs(
            _lines(
                spark,
                ["2017-09-12T22:32:21.212861448Z stdout P 2017-09-12 22:32:21.212 [INFO][88] ",
                 "2017-09-12T22:32:21.212999999Z stdout F table.go 710: Invalidating dataplane cache"],
            )
        ).collect()
        assert len(out) == 1
        r = out[0]
        assert r.text == (
            "2017-09-12 22:32:21.212 [INFO][88] "
            "table.go 710: Invalidating dataplane cache"
        )
        assert r.time_raw == "2017-09-12T22:32:21.212861448Z"
        assert r.stream == "stdout"

    def test_cri_without_flags(self, spark):
        out = docker_logs(
            _lines(
                spark,
                ["2017-10-12T13:32:21.232861448Z stdout 2017-10-12 13:32:21.212 [ERROR] err"],
            ),
            cri_flags=False,
        ).collect()
        assert [r.text for r in out] == [
            "2017-10-12 13:32:21.212 [ERROR] err"
        ]

    def test_autodetect_mixes_formats(self, spark):
        # format is detected per LINE by the '{' prefix
        # (docker_json.go:163-170)
        out = docker_logs(
            _lines(
                spark,
                [_j("json line\n"),
                 "2017-09-12T22:32:21.212861448Z stderr F cri line"],
            )
        ).orderBy("first_seq").collect()
        assert [(r.text, r.stream) for r in out] == [
            ("json line", "stdout"),
            ("cri line", "stderr"),
        ]

    def test_force_cri(self, spark):
        # forceCRI parses even '{'-prefixed content as CRI
        out = docker_logs(
            _lines(spark, ['2017-09-12T22:32:21Z stdout F {"a": 1}']),
            force_cri=True,
        ).collect()
        assert [r.text for r in out] == ['{"a": 1}']


@pytest.mark.parametrize("stream", ["all", "stdout", "stderr"])
def test_stream_values(spark, stream):
    rows = [_j("a\n", stream="stdout"), _j("b\n", stream="stderr")]
    out = docker_logs(_lines(spark, rows), stream=stream).collect()
    expect = {"all": 2, "stdout": 1, "stderr": 1}[stream]
    assert len(out) == expect
