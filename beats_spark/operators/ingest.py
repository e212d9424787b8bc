"""ES ingest-pipeline step executor for module pipelines.

The reference's filebeat modules do their parsing in Elasticsearch
ingest-node programs that beats uploads at setup
(``/root/reference/filebeat/fileset/pipelines.go:60-120``); the
canonical example is the apache access pipeline
(``/root/reference/filebeat/module/apache/access/ingest/default.json:1-60``):
grok → remove → grok → rename → date → remove → user_agent → geoip.

Here the step list compiles to DataFrame transforms, all JVM-side:

- ``grok``      → :class:`~beats_spark.operators.actions.Grok`
                  (first-match-wins, ``:type`` suffix casts)
- ``date``      → per-format ``try_to_timestamp`` coalesced in order
                  (ingest's first-parseable-format-wins), joda-style
                  format strings translated to Spark/java.time
- ``convert``   → ``cast`` (integer/long/float/double/string/boolean)
- ``remove`` / ``rename`` / ``set`` / ``lowercase`` / ``uppercase``
                  → projections

``user_agent`` and ``geoip`` require databases the ingest node ships;
they are out of scope here (a broadcast-lookup enrich covers the same
shape — operators/enrich.py).

Field names keep the reference's dotted ECS spelling
(``source.address``) as FLAT column names; every internal reference is
backtick-quoted so Spark never treats the dot as a struct accessor.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class IngestError(ValueError):
    pass


def load_ingest_pipeline(
    source: str | Mapping[str, Any],
    ignore_processors: Sequence[str] = ("user_agent", "geoip"),
) -> "IngestPipeline":
    """Build an :class:`IngestPipeline` from an ES ingest-pipeline
    document — the JSON format filebeat modules ship and upload at
    setup (``/root/reference/filebeat/fileset/pipelines.go:60-120``):
    ``{"description": ..., "processors": [...], "on_failure": [...]}``.

    Accepts a JSON string or an already-parsed mapping. ``on_failure``
    handlers are driver-level error routing in the ingest node; our
    step compilation surfaces failures as NULLs/flags instead, so the
    block is validated for shape but not executed (documented
    divergence, not a silent drop)."""
    import json

    if isinstance(source, str):
        try:
            doc = json.loads(source)
        except json.JSONDecodeError as e:
            raise IngestError(f"invalid pipeline JSON: {e}") from e
    else:
        doc = source
    if not isinstance(doc, Mapping) or "processors" not in doc:
        raise IngestError("ingest pipeline document has no 'processors'")
    if not isinstance(doc["processors"], list):
        raise IngestError("'processors' must be a list of steps")
    on_failure = doc.get("on_failure", [])
    if not isinstance(on_failure, list):
        raise IngestError("'on_failure' must be a list of steps")
    return IngestPipeline(
        steps=list(doc["processors"]), ignore_processors=ignore_processors
    )


def _fcol(name: str) -> Column:
    return F.col("`" + name + "`")


#: joda-time pattern fragments whose java.time spelling differs.
#: Module pipelines use a narrow dialect (dd/MMM/yyyy:H:m:s Z,
#: ISO8601, UNIX, TAI64N); the overlap with java.time is exact except
#: for the offset spellings below.
_JODA_TO_JAVA = {
    "ZZ": "XXX",  # +07:00 (joda extended offset)
}


def translate_joda(fmt: str) -> str:
    """Translate a joda-time date format (what ingest ``date`` takes:
    org.elasticsearch ingest common DateFormat) to a Spark/java.time
    pattern. Identity for the shared subset; named formats map to
    their java.time equivalents."""
    named = {
        "ISO8601": "yyyy-MM-dd'T'HH:mm:ss[.SSS]XXX",
        "UNIX": "epoch-seconds",  # handled in _date_parse
        "UNIX_MS": "epoch-millis",
    }
    if fmt in named:
        return named[fmt]
    out = fmt
    for joda, java in _JODA_TO_JAVA.items():
        out = out.replace(joda, java)
    return out


def _date_parse(col: Column, formats: Sequence[str]) -> Column:
    """First-parseable-format-wins (ingest date processor semantics):
    per-format try-parse, coalesced in declaration order. Epoch forms
    use try_cast (ANSI cast would abort the JOB on one dirty value,
    where ingest fails only the document) and timestamp_seconds/
    timestamp_millis (exact — no string round-trip truncating
    millisecond precision)."""
    alts = []
    for f in formats:
        j = translate_joda(f)
        if j == "epoch-seconds":
            alts.append(F.timestamp_seconds(col.try_cast("long")))
        elif j == "epoch-millis":
            alts.append(F.timestamp_millis(col.try_cast("long")))
        else:
            alts.append(F.try_to_timestamp(col, F.lit(j)))
    return F.coalesce(*alts) if len(alts) > 1 else alts[0]


_CONVERT_TYPES = {
    "integer": "int",
    "long": "long",
    "float": "float",
    "double": "double",
    "string": "string",
    "boolean": "boolean",
}


@dataclass
class IngestPipeline:
    """Compile an ES ingest processor list (parsed pipeline JSON) to a
    DataFrame transform. Steps are applied in order; unknown processor
    names raise (never silently skipped) unless listed in
    ``ignore_processors`` (for module programs carrying user_agent /
    geoip steps we can't run)."""

    steps: Sequence[Mapping[str, Mapping[str, Any]]]
    ignore_processors: Sequence[str] = ("user_agent", "geoip")

    def apply(self, df: DataFrame) -> DataFrame:
        for step in self.steps:
            if len(step) != 1:
                raise IngestError(f"each step must have one processor: {step}")
            (name, conf), = step.items()
            # the skip list wins even over supported processors, so a
            # caller can run a module program minus steps they can't
            # or won't support
            if name in self.ignore_processors:
                continue
            handler = getattr(self, f"_step_{name}", None)
            if handler is None:
                raise IngestError(f"unsupported ingest processor: {name}")
            df = handler(df, conf)
        return df

    # -- steps ----------------------------------------------------------

    def _step_grok(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        from .actions import Grok

        field = conf["field"]
        if field not in df.columns:
            if conf.get("ignore_missing"):
                return df
            raise IngestError(f"grok field missing: {field}")
        return Grok(patterns=list(conf["patterns"]), field=field).apply(df)

    def _step_remove(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        fields = conf["field"]
        if isinstance(fields, str):
            fields = [fields]
        missing = [f for f in fields if f not in df.columns]
        if missing and not (
            conf.get("ignore_missing") or conf.get("ignore_failure")
        ):
            raise IngestError(f"remove field missing: {missing}")
        present = [f for f in fields if f in df.columns]
        return df.drop(*[_fcol(f) for f in present]) if present else df

    def _step_rename(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        src, dst = conf["field"], conf["target_field"]
        if src not in df.columns:
            if conf.get("ignore_missing") or conf.get("ignore_failure"):
                return df
            raise IngestError(f"rename field missing: {src}")
        if dst in df.columns:
            # ES rename fails when the target exists; with
            # ignore_failure the document passes through unchanged
            if conf.get("ignore_failure"):
                return df
            raise IngestError(f"rename target exists: {dst}")
        return df.withColumnRenamed(src, dst)

    def _step_set(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        return df.withColumn(conf["field"], F.lit(conf["value"]))

    def _step_date(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        field = conf["field"]
        if field not in df.columns:
            if conf.get("ignore_missing") or conf.get("ignore_failure"):
                return df
            raise IngestError(f"date field missing: {field}")
        target = conf.get("target_field", "@timestamp")
        ts = _date_parse(_fcol(field), conf["formats"])
        # ingest `timezone` shifts zone-less formats; our supported
        # formats carry their own offset or are epoch-based, so a
        # requested timezone on a zoned format is a config error.
        if conf.get("timezone") not in (None, "UTC"):
            raise IngestError("date: only UTC/offset-carrying formats supported")
        return df.withColumn(target, ts)

    def _step_convert(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        field = conf["field"]
        if field not in df.columns:
            if conf.get("ignore_missing") or conf.get("ignore_failure"):
                return df
            raise IngestError(f"convert field missing: {field}")
        typ = conf["type"]
        if typ not in _CONVERT_TYPES:
            raise IngestError(f"convert: unsupported type {typ}")
        target = conf.get("target_field", field)
        # try_cast: ANSI cast aborts the whole job on one malformed
        # value; ES convert fails only the single document (NULL here)
        return df.withColumn(target, _fcol(field).try_cast(_CONVERT_TYPES[typ]))

    def _step_lowercase(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        return self._case(df, conf, F.lower)

    def _step_uppercase(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        return self._case(df, conf, F.upper)

    def _case(self, df, conf, fn) -> DataFrame:
        field = conf["field"]
        if field not in df.columns:
            if conf.get("ignore_missing") or conf.get("ignore_failure"):
                return df
            raise IngestError(f"case field missing: {field}")
        return df.withColumn(field, fn(_fcol(field)))


class IngestProcessor:
    """Processor-chain adapter so a module ingest program slots into a
    YAML pipeline config (``- ingest_pipeline: {steps: [...]}`` or
    ``{document: <pipeline JSON mapping>}``). Whole-frame transform —
    a ``when:`` guard is rejected (ES runs ingest per index request,
    not per-event-conditionally)."""

    def __init__(
        self,
        steps: Sequence[Mapping[str, Any]] | None = None,
        document: Mapping[str, Any] | str | None = None,
    ) -> None:
        if (steps is None) == (document is None):
            raise IngestError(
                "ingest_pipeline needs exactly one of steps/document"
            )
        self._pipeline = (
            IngestPipeline(steps=list(steps))
            if steps is not None
            else load_ingest_pipeline(document)
        )

    def apply(self, df: DataFrame, guard=None) -> DataFrame:
        if guard is not None:
            raise NotImplementedError(
                "ingest_pipeline under a when: guard is not supported"
            )
        return self._pipeline.apply(df)
