"""TCP/UDP byte-stream framing — the reference's socket-input message
splitting as Column transforms over connection blobs.

The reference's tcp input frames each connection's byte stream with a
custom multi-byte delimiter scanner
(filebeat/inputsource/tcp/scan.go:27-40 factoryDelimiter, wired with
``line_delimiter: "\\n"`` default and ``max_message_size: 20MiB`` by
filebeat/input/tcp/config.go:33-44):

- a token is the bytes before each delimiter occurrence, delimiter
  stripped; empty tokens between back-to-back delimiters ARE emitted
  (bufio.Scanner calls the callback for them — inputsource/tcp/
  client.go:77-93);
- at EOF a non-empty remainder is emitted as a final token, but an
  empty remainder is NOT (scan.go:29-31) — i.e. a blob ending with the
  delimiter yields no trailing empty message;
- a frame longer than ``max_message_size`` errors the whole connection
  (client.go:86-89 IsMaxReadBufferErr). The batch analog marks the
  oversize frame instead of killing sibling rows — the caller decides.

The udp input has no framing: one datagram = one event, read into a
``max_message_size`` buffer so longer datagrams are silently truncated
(filebeat/inputsource/udp/server.go).

The socket TRANSPORTS themselves are out of scope (rows arrive in the
input table — SURVEY §2.1); this module is the content work they add.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


#: UTF-16 byte-order marks (encoding/utf16.go:113-118)
_BOM_BE = bytes([0xFE, 0xFF])
_BOM_LE = bytes([0xFF, 0xFE])

#: max bytes a substring "to end of blob" can cover
_MAX_LEN = (1 << 31) - 1


def decode_blob(blob: Column, charset: str = "utf-8") -> Column:
    """Charset-decode a raw connection/file BLOB (binary) to text —
    the line reader's decode tier
    (libbeat/reader/readfile/encoding/encoding.go:34-121,
    utf16.go:86-125) as pure Column work, run AHEAD of
    :func:`frame_delimited` (the reference frames on the ENCODED
    newline then decodes each line — readfile/line.go:46-67;
    decode-then-frame commutes because no UTF-16 code unit of '\\n'
    can appear inside another character's units).

    Charsets, mirroring the reference's registry semantics:

    - ``plain`` / ``nop`` / ``utf-8``: invalid sequences become U+FFFD
      (the reference's Replacement-based ``utf8Encoding``,
      encoding/mixed.go) — conf-free via ``make_valid_utf8``.
    - ``utf-16le`` / ``utf-16be``: BOM OPTIONAL. A leading BOM decides
      the endianness and is STRIPPED (utf16.go: the reader keeps its
      post-BOM offset only when a BOM was found); otherwise the named
      endianness decodes the whole blob, nothing stripped.
    - ``utf-16``: BOM REQUIRED (``utf16BOMRequired`` — no fallback).
      The reference fails the file open; the batch analog yields NULL
      for the caller to flag/route.
    - ``iso8859-1`` / ``latin1``: single-byte charmap.

    Spark 4 ANSI gotcha: ``decode()`` ABORTS THE JOB on malformed
    UTF-16 input. On dirty transports set
    ``spark.sql.legacy.codingErrorAction=true`` to get the
    reference's replace-with-U+FFFD behavior (the UTF-8 path never
    needs it)."""
    cs = charset.lower().replace("_", "-")
    if cs in ("plain", "nop", "utf-8", "utf8", "unicode-1-1-utf-8"):
        return F.call_function("make_valid_utf8", blob.cast("string"))
    if cs in ("iso8859-1", "iso-8859-1", "latin1"):
        return F.decode(blob, "ISO-8859-1")
    if cs in ("utf-16le", "utf-16be", "utf-16"):
        bom2 = F.substring(blob, 1, 2)
        rest = F.substring(blob, 3, _MAX_LEN)
        detected = F.when(
            bom2 == F.lit(_BOM_BE), F.decode(rest, "UTF-16BE")
        ).when(bom2 == F.lit(_BOM_LE), F.decode(rest, "UTF-16LE"))
        if cs == "utf-16be":
            return detected.otherwise(F.decode(blob, "UTF-16BE"))
        if cs == "utf-16le":
            return detected.otherwise(F.decode(blob, "UTF-16LE"))
        return detected  # BOM required: NULL when absent
    raise ValueError(f"unsupported charset: {charset}")


def frame_delimited(blob: Column, delimiter: str = "\n") -> Column:
    """Split one connection blob into an array of framed messages with
    Go-scanner semantics (scan.go:27-40): empties between back-to-back
    delimiters kept, ONE trailing empty (blob ends with delimiter)
    dropped, empty blob → zero frames.

    Java's ``split`` default drops ALL trailing empties — a silent
    divergence for ``"a\\n\\n"`` (Go: ``["a", ""]``, Java default:
    ``["a"]``) — so this splits with ``limit=-1`` and trims exactly
    one trailing empty when the blob ends with the delimiter.

    (scan.go's dropDelimiter would also strip a delimiter-suffixed
    token, but a token produced by splitting on the first occurrence
    can never contain the delimiter — dead code there, none here.)
    """
    quoted = re.escape(delimiter)
    toks = F.split(blob, quoted, -1)
    toks = (
        F.when(blob == "", F.array().cast("array<string>"))
        .when(
            blob.endswith(delimiter),
            F.slice(toks, 1, F.size(toks) - 1),
        )
        .otherwise(toks)
    )
    return toks


def frame_events(
    df: DataFrame,
    blob_col: str = "blob",
    delimiter: str = "\n",
    max_message_size: int | None = None,
    out_col: str = "message",
    charset: str | None = None,
) -> DataFrame:
    """Explode connection blobs into one row per framed message, in
    stream order (``frame_idx``). ``frame_too_long`` marks frames past
    ``max_message_size`` — the reference kills the connection there
    (client.go:86-89); a batch job marks and routes instead.
    ``charset`` set = ``blob_col`` holds RAW BYTES: run the
    :func:`decode_blob` tier first (BOM strip + endianness fallback).
    """
    blob = F.col(blob_col)
    if charset is not None:
        blob = decode_blob(blob, charset)
    framed = df.select(
        "*",
        F.posexplode(frame_delimited(blob, delimiter)).alias(
            "frame_idx", out_col
        ),
    ).drop(blob_col)
    if max_message_size is not None:
        framed = framed.withColumn(
            "frame_too_long", F.length(out_col) > max_message_size
        )
    return framed


def frame_datagrams(
    df: DataFrame,
    payload_col: str = "payload",
    max_message_size: int = 10 * 1024,
    out_col: str = "message",
) -> DataFrame:
    """udp input: one datagram = one message, truncated to the read
    buffer size (inputsource/udp/server.go reads into a fixed
    ``max_message_size`` buffer; the tail of a longer datagram is
    silently gone)."""
    return df.withColumn(
        out_col, F.substring(F.col(payload_col), 1, max_message_size)
    )
