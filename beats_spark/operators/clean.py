"""Text normalization for web-scale corpus ingestion ("fix-text").

Every real pretraining pipeline runs a normalization pass before any
quality/dedup stage (C4 strips control pages, CCNet/ftfy-style fixers
repair whitespace and invisible characters): crawl text carries
zero-width joiners, soft hyphens, NBSP variants, stray control bytes,
and CRLF soup that would otherwise make identical documents hash
differently and skew token statistics.

This is that pass as a pure Column regexp chain (one codegen stage,
no Python), with a DuckDB twin built from the SAME pattern strings so
both engines transform identically. For raw-crawl inputs an optional
HTML boilerplate strip (C4 §2.1: drop script/style/comments, break on
block tags, delete remaining tags, decode the common entities) runs
in front of the same chain (:func:`html_strip`):

1. CRLF / lone CR → LF
2. delete zero-width + soft-hyphen characters and C0/C1 controls
   (TAB and LF survive — TAB is folded by step 4)
3. unicode space separators (NBSP, en/em/thin/ideographic…) → ASCII
   space
4. runs of spaces/tabs → one space
5. 3+ newlines → exactly 2 (paragraph break preserved)
6. trim outer whitespace

Returns the cleaned text plus audit columns (chars removed, changed
flag) — the funnel-style contract the curation job uses everywhere.

No reference-repo counterpart (training-data extension per the
brief; the closest beats concept is the line-reader's BOM strip,
filebeat/input/log/harvester.go:288-290).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: invisible characters deleted outright: soft hyphen, zero-width
#: space/non-joiner/joiner, BOM/zero-width-no-break
ZERO_WIDTH = "­​‌‍﻿"
#: C0 controls minus TAB(09)/LF(0a)/CR(0d handled first), plus DEL
CONTROLS = (
    "".join(chr(c) for c in range(0x00, 0x09))
    + "\x0b\x0c"
    + "".join(chr(c) for c in range(0x0e, 0x20))
    + "\x7f"
)
#: unicode space separators normalized to ASCII space
UNISPACES = (
    "          "
    "     　"
)

def _cls(chars: str) -> str:
    """Character class spelled entirely with ``\\x{HH}`` escapes —
    Java regex and RE2 read them identically, and the pattern string
    stays printable ASCII (raw control bytes inside a SQL literal are
    a parse error; a NUL is one in any engine)."""
    return "[" + "".join(f"\\x{{{ord(c):x}}}" for c in chars) + "]"


#: (pattern, replacement) — applied in order; the SQL twin uses the
#: identical strings, so the engines cannot drift. The last step is
#: the outer trim as a regex (plain trim() strips only 0x20 on both
#: engines and would leave leading/trailing newlines behind).
CLEAN_STEPS: list[tuple[str, str]] = [
    ("\\x{d}\\x{a}|\\x{d}", "\n"),
    (_cls(ZERO_WIDTH + CONTROLS), ""),
    (_cls(UNISPACES), " "),
    ("[ \\x{9}]+", " "),
    ("\\x{a}{3,}", "\n\n"),
    ("^[ \\x{a}]+|[ \\x{a}]+$", ""),
]


#: HTML → text extraction (C4 §2.1-style boilerplate strip) applied
#: BEFORE the normalization chain. RE2 (DuckDB) has no backreferences,
#: so the script/style containers are spelled out instead of using
#: ``</\1>``; replacements avoid ``$`` and ``\`` so Java's
#: appendReplacement and RE2's substitution read them identically.
#: Order matters: containers and comments vanish with their contents,
#: block-closing tags become line breaks (adjacent cells/paragraphs
#: must not fuse into one word), remaining tags are deleted, and only
#: THEN entities decode — so a decoded ``&lt;`` can never be
#: re-stripped as a tag, and ``&amp;`` decodes LAST so double-escaped
#: text decodes exactly one level (the HTML5 rule).
HTML_STEPS: list[tuple[str, str]] = [
    ("(?is)<script\\b[^>]*>.*?</script\\s*>", ""),
    ("(?is)<style\\b[^>]*>.*?</style\\s*>", ""),
    ("(?s)<!--.*?-->", ""),
    (
        "(?i)<(?:br|hr)\\s*/?>"
        "|</(?:p|div|h[1-6]|li|tr|td|th|dd|dt|table|ul|ol|blockquote"
        "|section|article)\\s*>",
        "\n",
    ),
    # any remaining tag, incl. opening block tags; the [a-zA-Z/!]
    # guard keeps bare '<' in prose ("a < b") intact
    ("(?s)<[a-zA-Z/!][^>]*>", ""),
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;|&apos;", "'"),
    ("&amp;", "&"),
]


def clean_text(c: Column) -> Column:
    """The normalization chain as one Column expression."""
    out = c
    for pat, rep in CLEAN_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def html_strip(c: Column) -> Column:
    """HTML boilerplate strip + the normalization chain, one Column
    expression (still a single codegen stage, no Python)."""
    out = c
    for pat, rep in HTML_STEPS + CLEAN_STEPS:
        out = F.regexp_replace(out, pat, rep)
    return out


def _steps_sql(expr: str, steps: list[tuple[str, str]]) -> str:
    out = expr
    for pat, rep in steps:
        p = pat.replace("'", "''")
        r = rep.replace("'", "''")
        out = f"regexp_replace({out}, '{p}', '{r}', 'g')"
    return out


def clean_text_sql(expr: str) -> str:
    """DuckDB twin of :func:`clean_text` (same pattern strings)."""
    return _steps_sql(expr, CLEAN_STEPS)


def html_strip_sql(expr: str) -> str:
    """DuckDB twin of :func:`html_strip` (same pattern strings)."""
    return _steps_sql(expr, HTML_STEPS + CLEAN_STEPS)


def clean_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    html: bool = False,
) -> DataFrame:
    """Per-row normalization with audit columns: (id, cleaned,
    n_removed, changed). Map-side only — one codegen stage, no
    shuffle, nothing leaves the row. ``html=True`` prepends the
    boilerplate strip for raw-crawl inputs."""
    fix = html_strip if html else clean_text
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("_raw"),
        fix(F.col(text_col)).alias("cleaned"),
    )
    return staged.select(
        id_col,
        "cleaned",
        (F.length("_raw") - F.length("cleaned")).cast("long").alias(
            "n_removed"
        ),
        (F.col("_raw") != F.col("cleaned")).alias("changed"),
    )


# ---------------------------------------------------------------------------
# C4 line-level filter (Raffel et al. 2020 §2.2)

#: a retained line must end in a terminal punctuation mark
C4_TERMINAL_RE = '[.!?"]$'
#: page-level kill terms (C4 drops the whole page on sight)
C4_PAGE_LOREM = "lorem ipsum"
C4_PAGE_BRACE = "{"
#: line-level kill term, case-insensitive ("any line with the word
#: Javascript" — C4 §2.2)
C4_LINE_JS = "javascript"


def _c4_line_ok(min_words: int):
    """Closure factory (lambda-arity gotcha: no default args in
    higher-order-function lambdas): keep a line iff it ends in
    terminal punctuation, has >= min_words whitespace-separated
    words, and does not mention javascript."""

    def ok(line: Column) -> Column:
        t = F.trim(line)
        n_words = F.size(
            F.filter(F.split(t, " "), lambda w: w != F.lit(""))
        )
        return (
            t.rlike(C4_TERMINAL_RE)
            & (n_words >= F.lit(min_words))
            & ~F.lower(t).contains(C4_LINE_JS)
        )

    return ok


def c4_line_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_sentences: int = 5,
) -> DataFrame:
    """C4's line-level cleaning (§2.2) as pure Column work — the stage
    every C4-derived corpus runs between HTML extraction and dedup.

    Line rules (each line judged independently): keep iff it ends in
    terminal punctuation (. ! ? "), has >= ``min_words`` words, and
    does not contain "javascript" (case-insensitive). Page rules:
    ``page_kept`` is False when the RAW page mentions "lorem ipsum"
    (any case) or a curly bracket, or when the KEPT text has fewer
    than ``min_sentences`` sentence terminators — C4 discards those
    pages outright; here the flag is a funnel column so the audit
    table can count the gate (the curate-job contract).

    Output: (id, cleaned, n_removed, changed, n_kept, page_kept).
    Map-side only — split/filter/join per row, no shuffle, no Python.
    The kept-lines array and the joined text are materialized in
    their own select() steps (expression-reuse gotcha: a Column
    reused in k outputs is recomputed k times).

    No reference-repo counterpart (training-data extension per the
    brief; closest beats concept is exclude_lines filtering,
    filebeat/harvester.go:403-421 — there a line filter drops whole
    events, here it edits the document).
    """
    staged = df.select(
        F.col(id_col),
        F.col(text_col).alias("_raw"),
        F.filter(
            F.split(F.col(text_col), "\n"), _c4_line_ok(min_words)
        ).alias("_kept"),
    )
    joined = staged.select(
        id_col,
        "_raw",
        F.array_join("_kept", "\n").alias("cleaned"),
        F.size("_kept").cast("long").alias("n_kept"),
    )
    n_sent = F.regexp_count(F.col("cleaned"), F.lit("[.!?]"))
    page_ok = (
        ~F.lower("_raw").contains(C4_PAGE_LOREM)
        & ~F.col("_raw").contains(C4_PAGE_BRACE)
        & (n_sent >= F.lit(min_sentences))
    )
    return joined.select(
        id_col,
        "cleaned",
        (F.length("_raw") - F.length("cleaned")).cast("long").alias(
            "n_removed"
        ),
        (F.col("_raw") != F.col("cleaned")).alias("changed"),
        "n_kept",
        page_ok.alias("page_kept"),
    )


def c4_line_filter_sql(
    table: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 3,
    min_sentences: int = 5,
) -> str:
    """DuckDB twin of :func:`c4_line_filter` (same predicate strings).
    ``array_to_string([],sep)`` is NULL in DuckDB where Spark's
    array_join is '' — coalesced (the urltools gotcha). The joined
    text is staged through a MATERIALIZED CTE (DuckDB re-runs inlined
    expressions per reference, the repetition_oracle gotcha)."""
    pred = (
        f"regexp_matches(trim(l), '{C4_TERMINAL_RE}') AND "
        "len(list_filter(string_split(trim(l), ' '), w -> w <> ''))"
        f" >= {min_words} AND "
        f"NOT contains(lower(trim(l)), '{C4_LINE_JS}')"
    )
    return f"""
WITH _c4k AS MATERIALIZED (
  SELECT {id_col}, {text_col} AS _raw,
         list_filter(string_split({text_col}, chr(10)), l -> {pred})
           AS _kept
  FROM {table}
),
_c4j AS MATERIALIZED (
  SELECT {id_col}, _raw,
         coalesce(array_to_string(_kept, chr(10)), '') AS cleaned,
         CAST(len(_kept) AS BIGINT) AS n_kept
  FROM _c4k
)
SELECT {id_col}, cleaned,
       CAST(length(_raw) - length(cleaned) AS BIGINT) AS n_removed,
       _raw <> cleaned AS changed,
       n_kept,
       (NOT contains(lower(_raw), '{C4_PAGE_LOREM}')
        AND NOT contains(_raw, '{C4_PAGE_BRACE}')
        AND len(regexp_extract_all(cleaned, '[.!?]'))
            >= {min_sentences}) AS page_kept
FROM _c4j
"""
