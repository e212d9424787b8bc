"""TCP delimiter framing parity — filebeat/inputsource/tcp/scan.go.

Expectation tables transcribed from the reference's scanner tests
(inputsource/tcp/scan_test.go TestCustomDelimiter) plus the Go
bufio.Scanner edge semantics the batch port must reproduce.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.framing import (
    frame_datagrams,
    frame_delimited,
    frame_events,
)


def _frames(spark, blob, delimiter="\n"):
    df = spark.createDataFrame([(blob,)], "blob string")
    return df.select(
        frame_delimited(F.col("blob"), delimiter).alias("f")
    ).collect()[0].f


@pytest.mark.parametrize(
    "blob,delim,expect",
    [
        # scan_test.go "split multiple lines"
        ("hello\nworld\n", "\n", ["hello", "world"]),
        # EOF remainder IS a token (scan.go:34-36)
        ("hello\nworld", "\n", ["hello", "world"]),
        # empty token between back-to-back delimiters is emitted
        ("a\n\nb", "\n", ["a", "", "b"]),
        # ...but a trailing empty after the final delimiter is NOT
        # (eof && len(data)==0 → stop)
        ("a\n\n", "\n", ["a", ""]),
        # scan_test.go "Delimiter end of string" / multibyte delimiter
        ("hello<END>world<END>", "<END>", ["hello", "world"]),
        ("hello<END>world", "<END>", ["hello", "world"]),
        # empty stream → zero frames
        ("", "\n", []),
        # delimiter-only stream → one empty frame
        ("\n", "\n", [""]),
        # regex metachars in the delimiter are literal
        ("a|b|c", "|", ["a", "b", "c"]),
    ],
)
def test_frame_delimited(spark, blob, delim, expect):
    assert _frames(spark, blob, delim) == expect


def test_frame_events_order_and_size_flag(spark):
    df = spark.createDataFrame(
        [("c1", "short\n" + "x" * 32 + "\ntail")],
        "conn string, blob string",
    )
    out = (
        frame_events(df, max_message_size=10)
        .orderBy("frame_idx")
        .collect()
    )
    assert [(r.message[:5], r.frame_idx, r.frame_too_long) for r in out] == [
        ("short", 0, False),
        ("xxxxx", 1, True),
        ("tail", 2, False),
    ]


def test_frame_datagrams_truncates(spark):
    df = spark.createDataFrame(
        [("d" * 20,), ("ok",)], "payload string"
    )
    out = frame_datagrams(df, max_message_size=8).collect()
    assert sorted(r.message for r in out) == ["d" * 8, "ok"]


class TestDecodeBlob:
    """decode_blob — the line reader's charset tier
    (libbeat/reader/readfile/encoding/): UTF-16 BOM detect + strip
    with endianness fallback, Replacement-semantics UTF-8, latin-1.
    Goldens are Python's codecs (same Unicode behavior Go x/text
    implements) plus explicit BOM-offset cases from utf16.go:86-125."""

    def _dec(self, spark, payload: bytes, charset: str):
        from beats_spark.functions.framing import decode_blob

        df = spark.createDataFrame([(payload,)], "b binary")
        return df.select(decode_blob(F.col("b"), charset).alias("s")).first()["s"]

    def test_utf16le_with_and_without_bom(self, spark):
        text = "héllo\nwörld"
        # BOM present: detected, STRIPPED (the reader keeps the
        # post-BOM offset — utf16.go:120-125)
        assert self._dec(
            spark, b"\xff\xfe" + text.encode("utf-16-le"), "utf-16le"
        ) == text
        # BOM absent: fall back to the configured endianness
        assert self._dec(
            spark, text.encode("utf-16-le"), "utf-16le"
        ) == text
        # OPPOSITE BOM wins over the fallback
        assert self._dec(
            spark, b"\xfe\xff" + text.encode("utf-16-be"), "utf-16le"
        ) == text

    def test_utf16be_with_and_without_bom(self, spark):
        text = "log line α"
        assert self._dec(
            spark, b"\xfe\xff" + text.encode("utf-16-be"), "utf-16be"
        ) == text
        assert self._dec(
            spark, text.encode("utf-16-be"), "utf-16be"
        ) == text

    def test_utf16_bom_required(self, spark):
        text = "x"
        # utf16BOMRequired: no fallback — the reference refuses the
        # source; the batch analog is NULL
        assert self._dec(spark, text.encode("utf-16-le"), "utf-16") is None
        assert self._dec(
            spark, b"\xff\xfe" + text.encode("utf-16-le"), "utf-16"
        ) == text

    def test_utf8_replacement_semantics(self, spark):
        # encoding/mixed.go: invalid UTF-8 bytes become U+FFFD, the
        # rest is copied — never a job abort
        assert self._dec(spark, b"a\xffb", "utf-8") == "a�b"
        # a UTF-8 BOM is NOT stripped (no BOM handling in the utf8
        # codec — it decodes to U+FEFF like Go's Replacement path)
        assert self._dec(spark, b"\xef\xbb\xbfhi", "plain") == "﻿hi"

    def test_latin1(self, spark):
        assert self._dec(spark, bytes([0xE9, 0x20, 0x61]), "latin1") == "\xe9 a"

    def test_unsupported_charset_raises(self, spark):
        from beats_spark.functions.framing import decode_blob

        with pytest.raises(ValueError, match="unsupported"):
            decode_blob(F.col("b"), "no-such-charset")

    def test_every_reference_charmap_decodes_all_256_bytes(self, spark):
        """Per-charset round-trip vectors mirroring the reference
        registry table (encoding.go:47-104): every single-byte charmap
        decodes all 256 byte values exactly like the published code
        page (Python codecs == x/text charmap tables), undefined
        bytes included (→ U+FFFD)."""
        from beats_spark.functions.framing import _CHARMAPS, decode_blob

        payload = bytes(range(256))
        df = spark.createDataFrame([(payload,)], "b binary")
        cols = [
            decode_blob(F.col("b"), cs).alias(f"c{i}")
            for i, cs in enumerate(_CHARMAPS)
        ]
        row = df.select(*cols).first()
        for i, (cs, codec) in enumerate(_CHARMAPS.items()):
            want = payload.decode(codec, errors="replace")
            assert row[f"c{i}"] == want, cs

    def test_multibyte_jvm_codecs(self, spark):
        """gbk (registry) + the htmlindex-fallback multi-byte codecs
        decode valid sequences identically to the published codecs
        (JVM charset == Python codec for well-formed input)."""
        cases = [
            ("gbk", "中文日志", "gbk"),
            ("shift-jis", "ログ出力", "shift_jis"),
            ("euc-jp", "ログ出力", "euc_jp"),
            ("euc-kr", "로그라인", "euc_kr"),
            ("big5", "日誌輸出", "big5"),
            ("gb18030", "中文日志€", "gb18030"),
        ]
        for cs, text, codec in cases:
            assert self._dec(spark, text.encode(codec), cs) == text, cs

    def test_ebcdic(self, spark):
        assert (
            self._dec(spark, "HELLO 123".encode("cp037"), "ebcdic-037")
            == "HELLO 123"
        )
        # the reference maps the NAME ebcdic-1040 to code page 1140
        assert (
            self._dec(spark, "A@B".encode("cp1140"), "ebcdic-1040")
            == "A@B"
        )
        assert (
            self._dec(spark, bytes([0xC8, 0xC9]), "ebcdic-1047") == "HI"
        )

    def test_frame_events_charset_tier(self, spark):
        # raw UTF-16LE connection blob with BOM → decode, then the Go
        # scanner framing over the DECODED text (line.go frames on the
        # encoded newline then decodes — same frames either way)
        from beats_spark.functions.framing import frame_events

        blob = b"\xff\xfe" + "first\nsecond\n".encode("utf-16-le")
        df = spark.createDataFrame([(1, blob)], "conn long, blob binary")
        rows = frame_events(df, charset="utf-16le").orderBy("frame_idx").collect()
        assert [(r["frame_idx"], r["message"]) for r in rows] == [
            (0, "first"),
            (1, "second"),
        ]
        # still map-side: no exchange in the framing pass
        plan = (
            frame_events(df, charset="utf-16le")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_malformed_utf16_with_replace_conf(self, spark):
        # Spark 4 ANSI decode aborts on malformed input; the
        # documented conf restores the reference's replace behavior
        spark.conf.set("spark.sql.legacy.codingErrorAction", "true")
        try:
            got = self._dec(
                spark, "hi".encode("utf-16-be") + b"\x00", "utf-16be"
            )
            assert got == "hi�"
        finally:
            spark.conf.unset("spark.sql.legacy.codingErrorAction")
