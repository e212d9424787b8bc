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
    - ``iso8859-1`` / ``latin1``: single-byte charmap (conf-free JVM
      decode).
    - every other single-byte charmap in the reference registry
      (iso8859-2..16 + 6e/6i/8e/8i, cp437..866, ebcdic-037/1040,
      koi8r/u, macintosh(+cyrillic), windows1250..1258, windows874):
      conf-free via ISO-8859-1 pass-through + one ``F.translate``
      built from the published byte table (``_CHARMAPS``).
    - multi-byte codecs (gbk from the registry; shift-jis / euc-jp /
      euc-kr / big5 / gb18030 via the reference's htmlindex fallback;
      ebcdic-1047): JVM decode — needs
      ``spark.sql.legacy.javaCharsets=true`` (and codingErrorAction
      for replace-on-malformed); :func:`session.build_session` sets
      both.

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
    if cs in ("utf-16le", "utf-16be", "utf-16",
              "utf-16le-bom", "utf-16be-bom", "utf-16-bom"):
        bom2 = F.substring(blob, 1, 2)
        rest = F.substring(blob, 3, _MAX_LEN)
        detected = F.when(
            bom2 == F.lit(_BOM_BE), F.decode(rest, "UTF-16BE")
        ).when(bom2 == F.lit(_BOM_LE), F.decode(rest, "UTF-16LE"))
        if cs in ("utf-16be", "utf-16be-bom"):
            return detected.otherwise(F.decode(blob, "UTF-16BE"))
        if cs in ("utf-16le", "utf-16le-bom"):
            return detected.otherwise(F.decode(blob, "UTF-16LE"))
        return detected  # BOM required: NULL when absent
    codec = _CHARMAPS.get(cs)
    if codec is not None:
        return _charmap_translate(blob, codec)
    jvm = _JVM_MULTIBYTE.get(cs)
    if jvm is not None:
        # multi-byte stateful codecs can't be a 1:1 byte translate —
        # the JVM decodes them, gated behind Spark 4's
        # spark.sql.legacy.javaCharsets=true (+ codingErrorAction for
        # replace-on-malformed); build_session sets both.
        return F.decode(blob, jvm)
    raise ValueError(f"unsupported charset: {charset}")


#: reference charset name → Python codec name for every SINGLE-BYTE
#: charmap in the reference registry (encoding.go:47-104). Each
#: decodes conf-free on the Spark side: bytes pass through the
#: allowed ISO-8859-1 decode (byte b → char U+00b), then ONE
#: ``F.translate`` rewrites the bytes whose target differs, with the
#: same undefined-byte → U+FFFD rule as x/text charmaps. The 6e/6i
#: and 8e/8i bidi variants share their base charmap's byte table.
_CHARMAPS = {
    "iso8859-2": "iso8859_2", "iso8859-3": "iso8859_3",
    "iso8859-4": "iso8859_4", "iso8859-5": "iso8859_5",
    "iso8859-6": "iso8859_6", "iso8859-7": "iso8859_7",
    "iso8859-8": "iso8859_8", "iso8859-9": "iso8859_9",
    "iso8859-10": "iso8859_10", "iso8859-13": "iso8859_13",
    "iso8859-14": "iso8859_14", "iso8859-15": "iso8859_15",
    "iso8859-16": "iso8859_16",
    "iso8859-6e": "iso8859_6", "iso8859-6i": "iso8859_6",
    "iso8859-8e": "iso8859_8", "iso8859-8i": "iso8859_8",
    "cp437": "cp437", "cp850": "cp850", "cp852": "cp852",
    "cp855": "cp855", "cp858": "cp858", "cp860": "cp860",
    "cp862": "cp862", "cp863": "cp863", "cp865": "cp865",
    "cp866": "cp866",
    "ebcdic-037": "cp037",
    # the reference's own registry maps the name "ebcdic-1040" to
    # CodePage1140 (encoding.go:81) — mirrored verbatim
    "ebcdic-1040": "cp1140",
    "koi8r": "koi8_r", "koi8u": "koi8_u",
    "macintosh": "mac_roman", "macintosh-cyrillic": "mac_cyrillic",
    # htmlindex-fallback spellings (encoding.go:128: any WHATWG
    # name resolves too — the dashed forms are the common ones)
    "koi8-r": "koi8_r", "koi8-u": "koi8_u",
    "windows-874": "cp874",
    "windows-1250": "cp1250", "windows-1251": "cp1251",
    "windows-1252": "cp1252", "windows-1253": "cp1253",
    "windows-1254": "cp1254", "windows-1255": "cp1255",
    "windows-1256": "cp1256", "windows-1257": "cp1257",
    "windows-1258": "cp1258",
    "windows1250": "cp1250", "windows1251": "cp1251",
    "windows1252": "cp1252", "windows1253": "cp1253",
    "windows1254": "cp1254", "windows1255": "cp1255",
    "windows1256": "cp1256", "windows1257": "cp1257",
    "windows1258": "cp1258", "windows874": "cp874",
}

#: multi-byte codecs (reference: gbk in the registry, the rest via
#: the htmlindex fallback, encoding.go:128-132) → JVM charset names.
#: ebcdic-1047 has no Python codec; the JVM carries it.
_JVM_MULTIBYTE = {
    "gbk": "GBK",
    "shift-jis": "Shift_JIS", "shiftjis": "Shift_JIS",
    "sjis": "Shift_JIS",
    "euc-jp": "EUC-JP", "euc-kr": "EUC-KR",
    "big5": "Big5", "gb18030": "GB18030",
    "ebcdic-1047": "IBM1047",
}


def _charmap_translate(blob: Column, codec: str):
    """Single-byte charmap decode as ISO-8859-1 + one ``translate``
    (module table above). Built at compile time from the Python
    codec's byte table — identical mapping to x/text's charmap
    package (both implement the same published code pages)."""
    latin = F.decode(blob, "ISO-8859-1")
    src, dst = [], []
    for b in range(256):
        ch = bytes([b]).decode(codec, errors="replace")
        if ch != chr(b):
            src.append(chr(b))
            dst.append(ch)
    if not src:
        return latin
    return F.translate(latin, "".join(src), "".join(dst))


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
