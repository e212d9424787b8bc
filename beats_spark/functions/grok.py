"""Grok: named-pattern regex parse compiled to JVM-side extracts.

The reference doesn't execute grok itself — filebeat modules ship grok
programs for the ES ingest node (e.g.
``filebeat/module/apache/access/ingest/default.json:3-27``: patterns +
``convert`` types + multi-pattern fallback). This module re-expresses
that surface natively: a ``%{PATTERN:field:type}`` expression expands
to a single Java regex; each field becomes one ``regexp_extract``
column (whole-stage codegen, no Python); multi-pattern programs
become per-field ``coalesce`` over the alternatives — the ingest
node's first-match-wins.

The pattern library is a from-scratch subset of the public grok
pattern names (the names are an ecosystem convention; the regexes
below are written fresh and kept RE2/Java-compatible, with no
capturing groups so group numbering stays ours).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

# Library patterns MUST NOT contain capturing groups — only (?:...).
PATTERNS: dict[str, str] = {
    "WORD": r"\w+",
    "NOTSPACE": r"\S+",
    "SPACE": r"\s*",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"(?:[+-]?\d+)",
    "NONNEGINT": r"\d+",
    "BASE10NUM": r"(?:[+-]?(?:\d+(?:\.\d+)?|\.\d+))",
    "NUMBER": r"(?:[+-]?(?:\d+(?:\.\d+)?|\.\d+))",
    "POSINT": r"[1-9]\d*",
    "YEAR": r"(?:\d{4})",
    "MONTHNUM": r"(?:0?[1-9]|1[0-2])",
    "MONTHDAY": r"(?:0?[1-9]|[12]\d|3[01])",
    "HOUR": r"(?:[01]?\d|2[0-3])",
    "MINUTE": r"[0-5]\d",
    "SECOND": r"(?:[0-5]\d(?:\.\d+)?|60)",
    "TIME": r"(?:%{HOUR}:%{MINUTE}:%{SECOND})",
    "TIMESTAMP_ISO8601": (
        r"(?:%{YEAR}-%{MONTHNUM}-%{MONTHDAY}[T ]%{HOUR}:%{MINUTE}"
        r"(?::%{SECOND})?(?:Z|[+-]%{HOUR}(?::?%{MINUTE})?)?)"
    ),
    "MONTH": (
        r"(?:Jan(?:uary)?|Feb(?:ruary)?|Mar(?:ch)?|Apr(?:il)?|May|"
        r"Jun(?:e)?|Jul(?:y)?|Aug(?:ust)?|Sep(?:tember)?|Oct(?:ober)?|"
        r"Nov(?:ember)?|Dec(?:ember)?)"
    ),
    "HTTPDATE": r"(?:%{MONTHDAY}/%{MONTH}/%{YEAR}:%{TIME} [+-]\d{4})",
    "IPV4": (
        r"(?:(?:25[0-5]|2[0-4]\d|[01]?\d{1,2})\.){3}"
        r"(?:25[0-5]|2[0-4]\d|[01]?\d{1,2})"
    ),
    "IP": r"%{IPV4}",
    "HOSTNAME": r"(?:[A-Za-z0-9][A-Za-z0-9\-]*(?:\.[A-Za-z0-9][A-Za-z0-9\-]*)*)",
    "IPORHOST": r"(?:%{IP}|%{HOSTNAME})",
    "USERNAME": r"[A-Za-z0-9._-]+",
    "USER": r"%{USERNAME}",
    "LOGLEVEL": (
        r"(?:[Tt]race|TRACE|[Dd]ebug|DEBUG|[Ii]nfo|INFO|[Nn]otice|NOTICE|"
        r"[Ww]arn(?:ing)?|WARN(?:ING)?|[Ee]rr(?:or)?|ERR(?:OR)?|"
        r"[Cc]rit(?:ical)?|CRIT(?:ICAL)?|[Ff]atal|FATAL)"
    ),
    "QS": r'(?:"(?:[^"\\]|\\.)*")',
    "UUID": r"[0-9a-fA-F]{8}-(?:[0-9a-fA-F]{4}-){3}[0-9a-fA-F]{12}",
    # composites used by the reference's module ingest pipelines
    # (filebeat/module/system/syslog/ingest/pipeline.json,
    # filebeat/module/apache/access/ingest/default.json)
    "SYSLOGTIMESTAMP": r"(?:%{MONTH} +%{MONTHDAY} %{TIME})",
    "PROG": r"[\x21-\x5a\x5c\x5e-\x7e]+",
    "SYSLOGPROG": r"(?:%{PROG}(?:\[\d+\])?)",
    "HTTPVERSION": r"(?:HTTP/\d+\.\d+)",
    "PATH": r"(?:/[^\s?#]*)",
    "URIPARAM": r"(?:\?[^\s#]*)",
}

_REF_RE = re.compile(r"%\{(\w+)(?::([\w.\[\]@]+))?(?::(\w+))?\}")

_TYPES = {"int": "long", "long": "long", "float": "double", "double": "double"}


class GrokError(ValueError):
    pass


@dataclass
class CompiledGrok:
    pattern: str
    #: (field_name, group_index, spark_cast_type|None) per named capture
    fields: list[tuple[str, int, str | None]]


def _expand_library(pat: str, depth: int = 0) -> str:
    """Resolve %{NAME} refs inside library patterns (non-capturing)."""
    if depth > 10:
        raise GrokError("grok pattern recursion too deep")

    def sub(m: re.Match) -> str:
        name = m.group(1)
        if name not in PATTERNS:
            raise GrokError(f"unknown grok pattern: %{{{name}}}")
        return _expand_library(PATTERNS[name], depth + 1)

    return _REF_RE.sub(sub, pat)


def _count_capturing(segment: str) -> int:
    """Count CAPTURING groups a passthrough regex segment opens.

    Module grok programs embed raw-regex groups in the non-%{} text —
    apache access pattern 1 wraps its optional referrer/user_agent
    tails in plain ``( \"...\")?`` (default.json:8) — and every such
    ``(`` shifts Java's group numbering past the numbers we assign to
    named fields. Skips escapes, character classes, and ``(?``
    constructs (except ``(?<name>``, which does capture)."""
    n = 0
    i = 0
    in_class = False
    while i < len(segment):
        c = segment[i]
        if c == "\\":
            i += 2
            continue
        if in_class:
            if c == "]":
                in_class = False
        elif c == "[":
            in_class = True
        elif c == "(":
            if not segment.startswith("(?", i):
                n += 1
            elif segment.startswith("(?<", i) and not segment.startswith(
                ("(?<=", "(?<!"), i
            ):
                n += 1
        i += 1
    return n


def compile_grok(expr: str) -> CompiledGrok:
    """Expand a grok expression into one anchored Java/RE2 regex with
    numbered capture groups for the named fields."""
    out: list[str] = []
    fields: list[tuple[str, int, str | None]] = []
    group = 0
    pos = 0
    # non-%{} text is regex, not literal (grok convention: programs
    # embed regex like \[ directly) — pass through verbatim, but any
    # capturing group it opens claims the next group number(s)
    for m in _REF_RE.finditer(expr):
        seg = expr[pos : m.start()]
        group += _count_capturing(seg)
        out.append(seg)
        pname, fname, ftype = m.group(1), m.group(2), m.group(3)
        if pname not in PATTERNS:
            raise GrokError(f"unknown grok pattern: %{{{pname}}}")
        body = _expand_library(PATTERNS[pname])
        if fname:
            group += 1
            fields.append((fname, group, _TYPES.get(ftype) if ftype else None))
            out.append(f"({body})")
        else:
            out.append(f"(?:{body})")
        pos = m.end()
    out.append(expr[pos:])
    return CompiledGrok(pattern="".join(out), fields=fields)


def grok_columns(col: Column, expr: str) -> tuple[dict[str, Column], Column]:
    """One pattern → dict of field Columns + an ``_ok`` match Column.
    Non-matching rows yield NULL fields (ingest node sets nothing and
    fails the document; callers tag via the ok column)."""
    g = compile_grok(expr)
    anchored = f"^(?s:{g.pattern})$"
    ok = col.rlike(anchored)
    cols: dict[str, Column] = {}
    for name, idx, cast in g.fields:
        c = F.when(ok, F.regexp_extract(col, anchored, idx))
        if cast:
            c = c.cast(cast)
        cols[name] = c
    return cols, ok


def grok_first_match(col: Column, exprs: list[str]) -> tuple[dict[str, Column], Column]:
    """Multi-pattern program: first matching pattern wins per row
    (ES ingest grok semantics) — per-field coalesce over alternatives
    guarded by each pattern's match flag."""
    compiled = [grok_columns(col, e) for e in exprs]
    any_ok = compiled[0][1]
    for _, ok in compiled[1:]:
        any_ok = any_ok | ok
    all_fields: list[str] = []
    for cols, _ in compiled:
        for k in cols:
            if k not in all_fields:
                all_fields.append(k)
    out: dict[str, Column] = {}
    prev_not: Column | None = None
    for cols, ok in compiled:
        gate = ok if prev_not is None else prev_not & ok
        for k in all_fields:
            if k in cols:
                c = F.when(gate, cols[k])
                out[k] = c if k not in out else F.coalesce(out[k], c)
        prev_not = ~ok if prev_not is None else prev_not & ~ok
    return out, any_ok
