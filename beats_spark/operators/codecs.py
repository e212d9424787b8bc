"""Output codecs + byte-stream sinks (SURVEY.md §2.7).

The reference serializes events per output through a codec:

- ``json``   (libbeat/outputs/codec/json/json.go:52,91): event →
  one JSON object per line (NDJSON in the file/console outputs).
- ``format`` (libbeat/outputs/codec/format/format.go:38,56): event →
  one formatted line from an event-format string.

Spark-native: both are Column expressions (``to_json(struct(*))`` /
the compiled fmtstr), so encoding rides inside whole-stage codegen and
the sink write is ``df.write.text`` — file rotation, load-balancing
and retry/backoff (fileout/file.go:84-100, pipeline/retry.go) are
Spark task/commit machinery.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.fmtstr import compile_fmtstr


def codec_json(columns: Sequence[str] | None = None) -> Column:
    """JSON codec: serialize the given columns (default all, via
    struct(*)) to one JSON object per row."""
    inner = F.struct(*columns) if columns else F.struct("*")
    return F.to_json(inner)


def codec_format(fmt: str, ts_col: str = "ts") -> Column:
    """format codec: one line per row from an event-format string
    (``%{[field]}`` / ``%{+yyyy.MM.dd}`` syntax)."""
    return compile_fmtstr(fmt, ts_col=ts_col)


def write_ndjson(
    df: DataFrame,
    path: str,
    columns: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """file output (outputs/fileout/file.go:34): NDJSON lines. Spark
    writes one file per partition — `rotate_every_kb` becomes partition
    sizing."""
    df.select(codec_json(columns).alias("value")).write.mode(mode).text(path)


def console_lines(df: DataFrame, n: int = 20) -> list[str]:
    """console output (outputs/console/console.go:52): NDJSON to
    stdout — test/debug surface only, never the scale path."""
    return [r["value"] for r in df.select(codec_json().alias("value")).limit(n).collect()]
