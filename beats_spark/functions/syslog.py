"""RFC3164 syslog parse — the filebeat syslog input re-expressed.

The reference parses datagrams with a ragel-generated state machine
(filebeat/input/syslog/parser.go, ~2900 generated LoC) and maps
priority → severity/facility labels in createEvent
(filebeat/input/syslog/input.go:50-61,204+; event.go:224-238). The
Spark-native form is one anchored regex evaluated JVM-side plus
integer arithmetic — regex-per-field with whole-stage codegen replaces
the hand-built DFA (SURVEY.md §2.1).

Timestamp: RFC3164 has no year; the reference infers the current year
(syslog/event.go:70). We take the year as a parameter so results are
deterministic and testable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: ``<PRI>Mmm dd HH:MM:SS host program[pid]: message``
#: (pid and the colon are optional, like the reference's grammar)
SYSLOG_RE = (
    r"^<(\d{1,3})>"
    r"([A-Z][a-z]{2}\s+\d{1,2} \d{2}:\d{2}:\d{2}) "
    r"(\S+) "
    r"([^\s:\[]+)(?:\[(\d+)\])?:?\s?"
    r"(.*)$"
)

SEVERITY_LABELS = [
    "Emergency", "Alert", "Critical", "Error",
    "Warning", "Notice", "Informational", "Debug",
]

#: RFC3164 §4.1.1 — 24 facilities, 0-23
FACILITY_LABELS = [
    "kernel", "user-level", "mail", "system", "security/authorization",
    "syslogd", "line printer", "network news", "UUCP", "clock",
    "security/authorization", "FTP", "NTP", "log audit", "log alert",
    "clock", "local0", "local1", "local2", "local3", "local4",
    "local5", "local6", "local7",
]


def syslog_parse(
    c: Column, year: int = 2024, tz: str = "UTC"
) -> dict[str, Column]:
    """Parse an RFC3164 line into typed columns. Non-matching rows
    yield NULLs (callers tag them, mirroring the reference's parse
    error path)."""
    ok = c.rlike(SYSLOG_RE)

    def g(i: int) -> Column:
        return F.when(ok, F.regexp_extract(c, SYSLOG_RE, i))

    pri = g(1).cast("int")
    sev = F.pmod(pri, F.lit(8)).cast("int")
    fac = (pri / 8).cast("int")
    sev_labels = F.array(*[F.lit(s) for s in SEVERITY_LABELS])
    # RFC3164 days may be space-padded ("Oct  5") or unpadded; collapse
    # runs of spaces and parse with single-'d' (1-2 digits).
    # try_to_timestamp: a malformed-but-regex-matching date must yield
    # NULL, not an ANSI-mode SparkDateTimeException killing the job.
    ts = F.try_to_timestamp(
        F.concat(
            F.lit(f"{year} "), F.regexp_replace(g(2), r"\s+", " ")
        ),
        F.lit("yyyy MMM d HH:mm:ss"),
    )
    return {
        "pri": pri,
        "severity": sev,
        "severity_label": F.element_at(sev_labels, sev + 1),
        "facility": fac,
        "ts_syslog": ts,
        "hostname": g(3),
        "program": g(4),
        # non-participating optional group extracts "" — ANSI cast of
        # '' to int throws, so null it first
        "pid": F.nullif(g(5), F.lit("")).cast("int"),
        "msg": g(6),
        "syslog_ok": ok,
    }


def syslog_parse_sql(col_expr: str, year: int = 2024) -> str:
    """DuckDB mirror (lock-step with :func:`syslog_parse`) — used by
    the oracle. Returns a SELECT fragment of aliased columns."""
    rx = SYSLOG_RE.replace("'", "''")
    g = lambda i: f"regexp_extract({col_expr}, '{rx}', {i})"  # noqa: E731
    return f"""
  CAST({g(1)} AS INTEGER) AS pri,
  CAST({g(1)} AS INTEGER) % 8 AS severity,
  (['Emergency','Alert','Critical','Error','Warning','Notice',
    'Informational','Debug'])[CAST({g(1)} AS INTEGER) % 8 + 1]
    AS severity_label,
  CAST({g(1)} AS INTEGER) // 8 AS facility,
  CAST(epoch(strptime('{year} ' || {g(2)}, '%Y %b %d %H:%M:%S'))
    AS BIGINT) AS ts_epoch,
  {g(3)} AS hostname,
  {g(4)} AS program,
  CAST(nullif({g(5)}, '') AS INTEGER) AS pid,
  {g(6)} AS msg
"""
