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

    def test_flush_pattern_closes_with_line(self):
        # multiline.go:218-231 — the flush line JOINS the event as its
        # final line, and the next line starts fresh
        lines = [
            (0, "begin"),
            (1, "  cont"),
            (2, "  END mark"),
            (3, "  more"),
        ]
        events, tail = combine_lines(
            lines, r"^\s", match="after", flush_pattern=r"END"
        )
        assert events == [(0, "begin\n  cont\n  END mark", 3)]
        assert tail == (3, ["  more"])

    def test_flush_pattern_first_line_never_flush_checked(self):
        # readFirst loads without a flush check: a flush-matching line
        # that OPENS an event keeps it open
        lines = [(0, "END start"), (1, "  cont"), (2, "  END close")]
        events, tail = combine_lines(
            lines, r"^\s", match="after", flush_pattern=r"END"
        )
        assert events == [(0, "END start\n  cont\n  END close", 3)]
        assert tail is None

    def test_flush_pattern_consecutive_flush_lines_alternate(self):
        # f closes; next f opens (no check on first line); next f closes
        lines = [(0, "a"), (1, "END"), (2, "END"), (3, "END")]
        events, tail = combine_lines(
            lines, r".", match="after", flush_pattern=r"END"
        )
        assert events == [(0, "a\nEND", 2), (2, "END\nEND", 2)]
        assert tail is None

    def test_flush_beats_head_check(self):
        # flush precedence: a line matching BOTH head and flush joins
        # and closes the open event (the flush check runs first)
        lines = [(0, "head one"), (1, "head END")]
        events, tail = combine_lines(
            lines, r"^\s", match="after", flush_pattern=r"END"
        )
        assert events == [(0, "head one\nhead END", 2)]
        assert tail is None

    def test_timeout_gap_flush(self):
        # batch replay of the idle timeout (multiline.go:107-117): a
        # gap > timeout between line timestamps flushes the open buffer
        lines = [
            (0, "begin", 100.0),
            (1, "  cont", 101.0),
            (2, "  late", 110.0),  # 9s gap > 5s -> flush before this
            (3, "  tail", 111.0),
        ]
        events, tail = combine_lines(
            lines, r"^\s", match="after", timeout=5.0
        )
        assert events == [(0, "begin\n  cont", 2)]
        # the late line starts a NEW event even though it matches the
        # continuation pattern (exactly as after a live timeout fire)
        assert tail == (2, ["  late", "  tail"])

    def test_timeout_none_ignores_timestamps(self):
        lines = [(0, "begin", 100.0), (1, "  cont", 1000.0)]
        events, tail = combine_lines(lines, r"^\s", match="after")
        assert events == [] and tail == (0, ["begin", "  cont"])


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

    def test_batch_timeout_gap_via_ts_col(self, spark):
        rows = [
            ("c1", 0, "start", 100.0),
            ("c1", 1, "  cont", 101.0),
            ("c1", 2, "  late", 200.0),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, text string, ts double"
        )
        out = {
            r["first_turn_idx"]: r["n_lines"]
            for r in multiline_batch(
                df, r"^\s", match="after", timeout=5.0, ts_col="ts"
            ).collect()
        }
        assert out == {0: 2, 2: 1}
        with pytest.raises(ValueError):
            multiline_batch(df, r"^\s", timeout=5.0)  # ts_col required


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


class TestStreamEventTimeTimeout:
    def test_gap_flushes_and_query_terminates(self, spark, tmp_path):
        """r2 verdict item #7: an event-time gap > timeout flushes the
        open tail WITHOUT a flush_pattern line, and — unlike the
        processing-time variant — the availableNow run terminates on
        its own (due timeouts fire in the trailing no-data batch)."""
        from beats_spark.streaming.multiline import multiline_stream_eventtime

        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            in_dir = str(tmp_path / "in")
            schema = (
                "conv_id string, turn_idx int, text string, ts timestamp"
            )
            t0 = "2024-01-01 00:00:{:02d}"
            f1 = spark.createDataFrame(
                [
                    ("c1", 0, "head one", t0.format(0)),
                    ("c1", 1, "  cont", t0.format(2)),
                ],
                "conv_id string, turn_idx int, text string, ts string",
            ).withColumn("ts", F.col("ts").cast("timestamp"))
            # ONE file: both c1 rows must share a micro-batch — the
            # file source's tie-break on same-mtime files is path order
            # (random part names), so two files could arrive reversed
            f1.coalesce(1).write.parquet(in_dir)
            # second file 100 s later on another conversation: advances
            # the watermark well past c1's last-seen + 5 s timeout
            spark.createDataFrame(
                [("c2", 0, "other head", "2024-01-01 00:01:40")],
                "conv_id string, turn_idx int, text string, ts string",
            ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
                "append"
            ).parquet(in_dir)

            out_dir = str(tmp_path / "out")
            q = (
                multiline_stream_eventtime(
                    spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", "1")
                    .parquet(in_dir),
                    r"^\s",
                    match="after",
                    timeout_s=5.0,
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            # self-termination is the point — no poll-and-stop
            assert q.awaitTermination(120)
            docs = {r["doc"] for r in spark.read.parquet(out_dir).collect()}
            # c1's tail: flushed by the event-time timeout alone
            assert "head one\n  cont" in docs
            # c2's open tail is younger than the final watermark —
            # still in state, correctly NOT emitted
            assert "other head" not in docs
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")

    def test_intra_batch_gap_flush(self, spark, tmp_path):
        """A gap recorded INSIDE one micro-batch flushes via the state
        machine's ts-gap replay — same semantics as the batch path."""
        from beats_spark.streaming.multiline import multiline_stream_eventtime

        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            in_dir = str(tmp_path / "in")
            schema = (
                "conv_id string, turn_idx int, text string, ts timestamp"
            )
            spark.createDataFrame(
                [
                    ("c1", 0, "head one", "2024-01-01 00:00:00"),
                    ("c1", 1, "  cont", "2024-01-01 00:00:02"),
                    # 60 s gap > 5 s timeout: previous event flushes,
                    # this CONTINUATION line starts a fresh event
                    ("c1", 2, "  late cont", "2024-01-01 00:01:02"),
                    ("c1", 3, "head two", "2024-01-01 00:01:03"),
                ],
                "conv_id string, turn_idx int, text string, ts string",
            ).withColumn("ts", F.col("ts").cast("timestamp")).write.parquet(
                in_dir
            )
            out_dir = str(tmp_path / "out")
            q = (
                multiline_stream_eventtime(
                    spark.readStream.schema(schema).parquet(in_dir),
                    r"^\s",
                    match="after",
                    timeout_s=5.0,
                )
                .writeStream.format("parquet")
                .option("path", out_dir)
                .option("checkpointLocation", str(tmp_path / "ckpt"))
                .outputMode("append")
                .trigger(availableNow=True)
                .start()
            )
            assert q.awaitTermination(120)
            docs = {r["doc"] for r in spark.read.parquet(out_dir).collect()}
            assert "head one\n  cont" in docs
            assert "  late cont" in docs  # gap-started fresh event
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", "8")
