"""Docker / CRI container-log reader — the reference's `docker` input
as pure Column transforms over a line table.

The reference wraps the log input with a per-line parser + partial-line
joiner (libbeat/reader/readjson/docker_json.go:132-215, wired by
filebeat/input/docker/input.go:40-107):

- **json-file** lines (``{"log": "...", "stream": "stdout", "time":
  RFC3339}``): a line is PARTIAL when its ``log`` payload does not end
  with ``\\n`` (docker splits container writes past 16 KB this way) —
  docker_json.go:153.
- **CRI** lines (``TS STREAM P|F CONTENT``): the ``P`` tag marks a
  partial line (docker_json.go:98-110); without ``criflags`` the tag
  column is absent and every line is full.
- Format is AUTODETECTED per line: ``{`` prefix → json-file, else CRI
  (docker_json.go:163-170).
- Consecutive partial lines are joined, in order, together with the
  full line that terminates the chain (docker_json.go:192-208). The
  assembled event keeps the FIRST line's timestamp (the partial loop
  parses into ``next``, never back into ``message``) and the LAST
  line's stream (the filter reads ``logLine.Stream`` after the loop —
  docker_json.go:210).
- The ``stream`` filter (``all``/``stdout``/``stderr``) applies to the
  ASSEMBLED event, not per line (docker_json.go:210-212).

Spark-native form: one window (running count of terminator lines per
file) assigns every line its chain id, one groupBy assembles — the
same two-exchange shape at 100 TB as the multiline batch combiner,
with the window and groupBy sharing the ``file`` hash partitioning so
AQE plans a single shuffle of the line table.

Divergence (documented): at EOF the reference RETURNS the dangling
partial chain with the reader error attached, and the harvester drops
it — the bytes are re-read once the file grows (docker_json.go:173-183
+ input/log/harvester.go). A bounded batch has no "file grows" later,
so the assembled tail is emitted with ``terminated = false`` and the
caller chooses (the sanctioned resume path is the manifest table, not
silent data loss).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: json-file log line payload (docker_json.go:52-58)
_JSON_SCHEMA = T.StructType(
    [
        T.StructField("log", T.StringType()),
        T.StructField("stream", T.StringType()),
        T.StructField("time", T.StringType()),
    ]
)

#: CRI with flags:    TS STREAM TAG CONTENT   (split = 4)
#: CRI without flags: TS STREAM CONTENT       (split = 3)
#: SplitN semantics: CONTENT is the untouched rest of the line.
_CRI_FLAGS_RX = r"^(\S+) (\S+) ([^ ]+)(?: (.*))?$"
_CRI_PLAIN_RX = r"^(\S+) (\S+)(?: (.*))?$"


def docker_parse_lines(
    df: DataFrame,
    line_col: str = "line",
    force_cri: bool = False,
    cri_flags: bool = True,
) -> DataFrame:
    """Per-line parse stage: adds ``content`` / ``stream`` / ``time_raw``
    / ``partial`` / ``valid`` columns (docker_json.go parseLine).

    ``content`` keeps the json-file trailing ``\\n`` exactly like the
    Go reader keeps ``msg.Log`` verbatim — the newline is what makes
    the terminator detectable, and the assembler strips the final one
    (the reference stacks a StripNewline reader above this one).
    """
    line = F.col(line_col)
    is_json = (~F.lit(force_cri)) & line.startswith("{")

    j = F.from_json(line, _JSON_SCHEMA)
    # ES/Go json decoding is strict here: a '{' line that is not valid
    # docker JSON is an error row (Next() propagates it) — from_json
    # gives null struct/fields, which we surface as valid=false
    j_ok = j.isNotNull() & j["log"].isNotNull() & j["time"].isNotNull()

    cri_rx = _CRI_FLAGS_RX if cri_flags else _CRI_PLAIN_RX
    c_ts = F.regexp_extract(line, cri_rx, 1)
    c_stream = F.regexp_extract(line, cri_rx, 2)
    c_tag = F.regexp_extract(line, cri_rx, 3) if cri_flags else F.lit("")
    c_content = F.regexp_extract(line, cri_rx, 4 if cri_flags else 3)
    c_ok = c_ts != ""
    # currently only P(artial) or F(ull) are available
    # (docker_json.go:104-110); tags are ':'-separated
    c_partial = (
        F.arrays_overlap(F.split(c_tag, ":"), F.array(F.lit("P")))
        if cri_flags
        else F.lit(False)
    )

    return df.select(
        "*",
        F.when(is_json, j["log"]).otherwise(c_content).alias("content"),
        F.when(is_json, j["stream"]).otherwise(c_stream).alias("stream"),
        F.when(is_json, j["time"]).otherwise(c_ts).alias("time_raw"),
        # coalesce: an invalid json line has NULL log → NULL endswith;
        # the row is already valid=false, but a NULL partial would
        # poison the chain window — treat it as a full line so the
        # damage stays on the bad row
        F.coalesce(
            F.when(is_json, ~j["log"].endswith("\n")).otherwise(c_partial),
            F.lit(False),
        ).alias("partial"),
        F.when(is_json, j_ok).otherwise(c_ok).alias("valid"),
    )


def docker_assemble(
    parsed: DataFrame,
    file_col: str = "file",
    seq_col: str = "seq",
    stream: str = "all",
) -> DataFrame:
    """Join partial chains and apply the stream filter
    (docker_json.go:172-215).

    Output: one row per assembled event with ``first_seq``, ``text``
    (trailing newline stripped, as the reference's StripNewline reader
    above this one does), ``stream`` (last line's), ``time_raw``
    (first line's), ``n_lines``, ``terminated``.
    """
    w = (
        Window.partitionBy(file_col)
        .orderBy(seq_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # chain id = number of terminator (full) lines strictly before this
    # row: partials and their terminating full line share an id
    chained = parsed.withColumn(
        "_chain",
        F.coalesce(F.sum((~F.col("partial")).cast("long")).over(w), F.lit(0)),
    )
    rec = F.struct(
        F.col(seq_col).alias("seq"),
        "content",
        "stream",
        "time_raw",
        "partial",
        "valid",
    )
    events = (
        chained.groupBy(file_col, "_chain")
        .agg(F.array_sort(F.collect_list(rec)).alias("recs"))
        .select(
            file_col,
            F.element_at("recs", 1)["seq"].alias("first_seq"),
            F.regexp_replace(
                F.aggregate(
                    "recs", F.lit(""), lambda acc, r: F.concat(acc, r["content"])
                ),
                r"\n$",
                "",
            ).alias("text"),
            F.element_at("recs", -1)["stream"].alias("stream"),
            F.element_at("recs", 1)["time_raw"].alias("time_raw"),
            F.size("recs").alias("n_lines"),
            (~F.element_at("recs", -1)["partial"]).alias("terminated"),
            F.forall("recs", lambda r: r["valid"]).alias("valid"),
        )
    )
    if stream != "all":
        events = events.filter(F.col("stream") == stream)
    return events


def docker_logs(
    df: DataFrame,
    file_col: str = "file",
    seq_col: str = "seq",
    line_col: str = "line",
    stream: str = "all",
    partial: bool = True,
    force_cri: bool = False,
    cri_flags: bool = True,
) -> DataFrame:
    """The full docker input: parse + partial join + stream filter.

    ``partial=False`` (config ``combine_partial: false``) publishes
    every line as its own event, exactly as the Go reader skips the
    join loop.
    """
    parsed = docker_parse_lines(
        df, line_col=line_col, force_cri=force_cri, cri_flags=cri_flags
    )
    if not partial:
        parsed = parsed.withColumn("partial", F.lit(False))
    return docker_assemble(
        parsed, file_col=file_col, seq_col=seq_col, stream=stream
    )
