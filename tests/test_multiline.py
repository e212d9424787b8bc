"""Content-based multiline combine (streaming/multiline.py) vs the
reference reader semantics (libbeat/reader/multiline/multiline.go)."""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from beats_spark.streaming.multiline import combine_lines, multiline_batch


class TestStateMachine:
    def test_after_continuation(self):
        # java-stacktrace style: indented lines continue the event
        lines = [
            (0, "Exception in thread main"),
            (1, "  at Foo.bar"),
            (2, "  at Baz.qux"),
            (3, "next event"),
        ]
        events, tail = combine_lines(lines, r"^\s", match="after")
        assert events == [
            (0, "Exception in thread main\n  at Foo.bar\n  at Baz.qux", 3)
        ]
        assert tail == (3, ["next event"])

    def test_after_negate(self):
        # negate: lines NOT starting a new record continue (the classic
        # "^[0-9]{4}-" timestamp anchor with negate: true)
        lines = [
            (0, "2024-01-01 start"),
            (1, "continuation"),
            (2, "2024-01-02 second"),
        ]
        events, tail = combine_lines(
            lines, r"^\d{4}-", match="after", negate=True
        )
        assert events == [(0, "2024-01-01 start\ncontinuation", 2)]
        assert tail == (2, ["2024-01-02 second"])

    def test_before_terminator(self):
        # match: before — matching lines buffer until a non-matching
        # terminator closes the event as its last line
        lines = [(0, "part \\"), (1, "part \\"), (2, "end;"), (3, "next \\")]
        events, tail = combine_lines(lines, r"\\$", match="before")
        assert events == [(0, "part \\\npart \\\nend;", 3)]
        assert tail == (3, ["next \\"])

    def test_max_lines_cap_bounds_buffer(self):
        lines = [(i, "  cont") for i in range(10)]
        lines[0] = (0, "head")
        events, tail = combine_lines(lines, r"^\s", match="after", max_lines=3)
        assert events == []
        first, buf = tail
        # cap applies while BUFFERING (multiline.go skips past
        # max_lines) — a hot conversation can't grow streaming state
        assert len(buf) == 3
        ev, _ = combine_lines(lines + [(99, "boundary")], r"^\s", max_lines=3)
        assert ev[0][2] == 3

    def test_bad_match_raises(self):
        with pytest.raises(ValueError):
            combine_lines([], "x", match="sideways")


class TestBatchCombine:
    def test_per_conversation_groups(self, spark):
        rows = [
            ("c1", 0, "start one"),
            ("c1", 1, "  cont"),
            ("c1", 2, "start two"),
            ("c2", 0, "solo"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string"
        )
        out = {
            (r["conv_id"], r["first_turn_idx"]): (r["doc"], r["n_lines"])
            for r in multiline_batch(df, r"^\s", match="after").collect()
        }
        assert out[("c1", 0)] == ("start one\n  cont", 2)
        assert out[("c1", 2)] == ("start two", 1)  # tail flushes at EOF
        assert out[("c2", 0)] == ("solo", 1)


class TestStreamCombine:
    def test_closed_events_emit_tail_withheld_then_timeout(
        self, spark, tmp_path
    ):
        from beats_spark.streaming.multiline import multiline_stream

        # one conversation → 2 state-store partitions suffice; 8 adds
        # ~×4 state-commit overhead per micro-batch to this test
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            self._run(spark, tmp_path, multiline_stream)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")

    @staticmethod
    def _run(spark, tmp_path, multiline_stream):
        in_dir = str(tmp_path / "in")
        ckpt = str(tmp_path / "ckpt")
        rows = [
            ("c1", 0, "user", "head one", "none"),
            ("c1", 1, "user", "  cont", "none"),
            ("c1", 2, "user", "head two", "none"),  # stays buffered
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, tool string"
        ).withColumn("ts", F.current_timestamp())
        df.write.parquet(in_dir)

        out_dir = str(tmp_path / "out")

        def run_query(until):
            # a stateful query with processing-time timeouts does not
            # self-terminate under availableNow (pending timeouts keep
            # it alive) — poll for the expected output, then stop
            q = (
                multiline_stream(
                    spark.readStream.schema(df.schema).parquet(in_dir),
                    r"^\s",
                    match="after",
                    timeout_ms=1000,
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", ckpt)
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            try:
                deadline = time.monotonic() + 90
                while time.monotonic() < deadline:
                    try:
                        if until(spark.read.parquet(out_dir)):
                            return
                    except Exception:
                        pass
                    if q.awaitTermination(2):
                        return
            finally:
                q.stop()

        run_query(lambda out: out.count() >= 1)
        got = {
            r["first_turn_idx"]: r["doc"]
            for r in spark.read.parquet(out_dir).collect()
        }
        # the closed event emits in the first batch; the dangling tail
        # either sits in state or — if a trailing empty micro-batch ran
        # after the 1 s timeout — was already timeout-flushed
        assert got[0] == "head one\n  cont"
        assert set(got) <= {0, 2}

        # a later micro-batch after the timeout flushes the tail
        time.sleep(1.5)
        spark.createDataFrame(
            [("c9", 0, "user", "other", "none")],
            "conv_id string, turn_idx int, role string, text string, tool string",
        ).withColumn("ts", F.current_timestamp()).write.mode("append").parquet(in_dir)
        run_query(
            lambda out: "head two" in {r["doc"] for r in out.collect()}
        )
        docs = {r["doc"] for r in spark.read.parquet(out_dir).collect()}
        assert "head two" in docs  # timeout-flushed tail
        assert "head one\n  cont" in docs
