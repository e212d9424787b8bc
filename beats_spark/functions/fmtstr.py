"""Event format strings → Column.

Re-implements the reference's fmtstr syntax
(libbeat/common/fmtstr/formatevents.go:36-49):

- ``%{[field.path]}``          field interpolation
- ``%{[nested][key]}``         alternate nested syntax (≡ nested.key)
- ``%{[field.path]:default}``  with default when the field is missing
- ``%{[@timestamp]}``          the event timestamp, ISO-8601 millis
                               (event.go:56-66 / formatevents_test.go)
- ``%{+yyyy.MM.dd}``           event-timestamp formatting (Joda-style
                               pattern; subset maps 1:1 onto Spark's
                               ``date_format`` / java.time patterns)

Compiled to a single ``F.concat`` — constant-only format strings fold
to a literal, mirroring the reference's const-expression optimization
(libbeat/outputs/outil/select.go:159-169) which Catalyst's constant
folding reproduces for free.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_FMT_RE = re.compile(r"%\{(?:((?:\[[^\]]+\])+)(?::([^}]*))?|\+([^}]+))\}")

#: the reference marshals @timestamp as ISO-8601 with millisecond
#: precision in UTC (common.Time, libbeat/common/datetime.go)
_TS_ISO = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def compile_fmtstr(fmt: str, ts_col: str = "ts", df=None) -> Column:
    """Compile a format string into a string Column.

    Pass ``df`` so a ``%{[field]}`` whose dotted name is a FLAT column
    (enricher outputs like ``container.name``) resolves to that column
    instead of a struct path — the same precedence the conditions
    engine and ingest._read_field apply."""
    parts: list[Column] = []
    pos = 0
    for m in _FMT_RE.finditer(fmt):
        if m.start() > pos:
            parts.append(F.lit(fmt[pos : m.start()]))
        field, default, ts_fmt = m.group(1), m.group(2), m.group(3)
        if ts_fmt is not None:
            parts.append(F.date_format(F.col(ts_col), ts_fmt))
        else:
            # "[a][b]" and "[a.b]" both address nested field a.b
            name = field[1:-1].replace("][", ".")
            if name == "@timestamp":
                col = F.date_format(F.col(ts_col), _TS_ISO)
            elif df is not None and name in df.columns:
                col = F.col(f"`{name}`").cast("string")
            else:
                col = F.col(name).cast("string")
            if default is not None:
                col = F.coalesce(col, F.lit(default))
            parts.append(col)
        pos = m.end()
    if pos < len(fmt):
        parts.append(F.lit(fmt[pos:]))
    if not parts:
        return F.lit("")
    if len(parts) == 1:
        return parts[0]
    return F.concat(*parts)


def is_const(fmt: str) -> bool:
    return _FMT_RE.search(fmt) is None
