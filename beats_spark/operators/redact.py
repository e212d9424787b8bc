"""PII detection and redaction over text columns.

A training-data pipeline scrubs personally-identifying strings before
anything else sees the text. The reference has no PII surface (its
events are operational logs), so this is a pure training-data
extension (brief: "operations a large-scale training-data pipeline
would need"), built the same way as the parse operators: anchored
regexes evaluated JVM-side, one ``regexp_replace`` chain per kind —
no Python in the hot path, trivially scalable (per-row, no shuffle).

Patterns are deliberately conservative RE2-compatible syntax so the
DuckDB oracle runs the identical expressions: no lookarounds, no
backreferences, ``\\b`` word boundaries only.

Kinds (applied in declaration order — CARD before PHONE so a 16-digit
card is not half-eaten as a phone number):

- ``email``  : RFC-casual mailbox@domain.tld
- ``card``   : 13–16 digits with optional space/dash separators
- ``ssn``    : US-style NNN-NN-NNNN
- ``phone``  : international-ish +CC / (NNN) NNN-NNNN forms, ≥ 7 digits
- ``ipv4``   : dotted quad
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: kind → RE2/Java-compatible pattern (ORDER MATTERS — dict order is
#: application order)
PII_PATTERNS: dict[str, str] = {
    "email": r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b",
    "card": r"\b\d{4}[ -]?\d{4}[ -]?\d{4}[ -]?\d{1,4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    # \b before the area-code digits: without it the pattern matches
    # MID-digit-run and half-redacts serial numbers ('ref 91234-...')
    "phone": r"(\+\d{1,3}[ -]?)?\(?\b\d{3}\)?[ -]\d{3}[ -]\d{4}\b",
    "ipv4": r"\b(\d{1,3}\.){3}\d{1,3}\b",
}


def redact_text(
    c: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)
) -> Column:
    """Replace each PII match with ``[KIND]`` (uppercased tag), kinds
    applied in :data:`PII_PATTERNS` order."""
    for kind in kinds:
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return c


def pii_counts(c: Column, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> list[Column]:
    """Per-kind match counts, each counted on the text AFTER earlier
    kinds were redacted (mirrors what redact_text actually replaces, so
    counts sum to the number of substitutions)."""
    out = []
    for kind in kinds:
        out.append(
            F.regexp_count(c, F.lit(PII_PATTERNS[kind])).alias(f"n_{kind}")
        )
        c = F.regexp_replace(c, PII_PATTERNS[kind], f"[{kind.upper()}]")
    return out


def redact_sql(col_expr: str, kinds: tuple[str, ...] = tuple(PII_PATTERNS)) -> str:
    """DuckDB twin of :func:`redact_text` (identical patterns, 'g')."""
    out = col_expr
    for kind in kinds:
        out = (
            f"regexp_replace({out}, '{PII_PATTERNS[kind]}',"
            f" '[{kind.upper()}]', 'g')"
        )
    return out


def pii_counts_sql(
    col_expr: str, kinds: tuple[str, ...] = tuple(PII_PATTERNS)
) -> list[str]:
    """DuckDB twin of :func:`pii_counts` (sequential post-redaction
    counts, lock-step with the Spark side)."""
    out = []
    cur = col_expr
    for kind in kinds:
        out.append(
            f"CAST(len(regexp_extract_all({cur}, '{PII_PATTERNS[kind]}'))"
            f" AS BIGINT) AS n_{kind}"
        )
        cur = (
            f"regexp_replace({cur}, '{PII_PATTERNS[kind]}',"
            f" '[{kind.upper()}]', 'g')"
        )
    return out
