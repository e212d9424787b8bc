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
- ``split`` / ``kv`` / ``json`` / ``append`` / ``dot_expander``
                  → pure Column array/map/projection work
- ``drop``      → filter over the module-pipeline painless subset
- ``user_agent`` / ``geoip``
                  → broadcast-dimension enriches (operators/enrich.py
                  UserAgentEnrich / GeoIPEnrich) when the caller
                  provides ``ua_dim`` / ``geo_dim`` — the ingest node
                  ships regexes.yaml / GeoLite2 databases; here the
                  database IS a dimension table
- ``on_failure`` → executed as per-row error routing (failure message
                  column populated on exactly the failed rows)

Field names keep the reference's dotted ECS spelling
(``source.address``) as FLAT column names; every internal reference is
backtick-quoted so Spark never treats the dot as a struct accessor.
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass
from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class IngestError(ValueError):
    pass


def load_ingest_pipeline(
    source: str | Mapping[str, Any],
    ignore_processors: Sequence[str] = ("user_agent", "geoip"),
    ua_dim: Any = None,
    geo_dim: Any = None,
) -> "IngestPipeline":
    """Build an :class:`IngestPipeline` from an ES ingest-pipeline
    document — the JSON format filebeat modules ship and upload at
    setup (``/root/reference/filebeat/fileset/pipelines.go:60-120``):
    ``{"description": ..., "processors": [...], "on_failure": [...]}``.

    Accepts a JSON string or an already-parsed mapping. The
    ``on_failure`` block is EXECUTED as per-row error routing (see
    :class:`IngestPipeline`): rows whose grok/date/convert/json step
    fails carry the first failure message, and the handler steps
    (the modules' ``set error.message`` shape) populate their columns
    on exactly those rows."""
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
        steps=list(doc["processors"]),
        ignore_processors=ignore_processors,
        on_failure=tuple(on_failure),
        ua_dim=ua_dim,
        geo_dim=geo_dim,
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
        "ISO8601": "iso8601",  # handled in _date_parse (two alternatives)
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
    millisecond precision). ISO8601 tries the offset-carrying spelling
    first, then the zone-less one interpreted in the session timezone
    (pinned UTC) — the ES date processor accepts both and defaults
    zone-less input to UTC; r2's offset-only pattern silently parsed
    legal zone-less strings to NULL."""
    alts = []
    for f in formats:
        j = translate_joda(f)
        if j == "epoch-seconds":
            alts.append(F.timestamp_seconds(col.try_cast("long")))
        elif j == "epoch-millis":
            alts.append(F.timestamp_millis(col.try_cast("long")))
        elif j == "iso8601":
            alts.append(
                F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSS]XXX"))
            )
            alts.append(
                F.try_to_timestamp(col, F.lit("yyyy-MM-dd'T'HH:mm:ss[.SSS]"))
            )
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

#: hidden per-row column carrying the FIRST failure message while an
#: ``on_failure`` block is in effect (dropped before returning)
_ERR_COL = "_ingest_error"

#: painless subset accepted by the ``drop``/conditional steps: the
#: comparison shapes module pipelines actually use
#: (``ctx.a.b != 'x'``, ``== null``, chained with && / ||) — counted
#: across /root/reference/filebeat/module/*/*/ingest/*.json `if`
#: fields. Anything else raises rather than mis-evaluating.
_PAINLESS_CMP = _re.compile(
    r"^ctx\.([A-Za-z_][\w.]*)\s*(==|!=)\s*('(?:[^'\\]|\\.)*'|null|-?\d+)$"
)


def painless_condition(expr: str, df: DataFrame) -> Column:
    """Compile the module-pipeline painless subset to a Column.

    Null handling follows painless object equality (Objects.equals —
    ``null != 'x'`` is TRUE), which is ``eqNullSafe`` here, NOT Spark's
    three-valued ``=``. A ``ctx.`` path with no matching column
    compiles to NULL (the document simply lacks the field)."""

    def compile_cmp(s: str) -> Column:
        m = _PAINLESS_CMP.match(s.strip())
        if not m:
            raise IngestError(f"unsupported painless condition: {s!r}")
        path, op, lit = m.groups()
        col = _fcol(path) if path in df.columns else F.lit(None).cast("string")
        if lit == "null":
            rhs = F.lit(None).cast("string")
        elif lit.startswith("'"):
            rhs = F.lit(lit[1:-1].replace("\\'", "'"))
        else:
            rhs = F.lit(int(lit))
        eq = col.eqNullSafe(rhs)
        return eq if op == "==" else ~eq

    def compile_and(s: str) -> Column:
        out = None
        for part in s.split("&&"):
            c = compile_cmp(part)
            out = c if out is None else out & c
        return out

    out = None
    for part in expr.split("||"):
        c = compile_and(part)
        out = c if out is None else out | c
    return out


#: shape A — duration scaling:
#:   ctx.T = Math.round(ctx.S * params.scale)        (iis, traefik,
#:   haproxy, kibana, icinga: default.json script steps)
#:   ctx.T = Math.round(ctx.S * 1000000) * 1000      (mysql/slowlog)
_SCRIPT_ROUND = _re.compile(
    r"^ctx\.([\w.]+)\s*=\s*Math\.round\(\s*ctx\.([\w.]+)\s*\*\s*"
    r"(params\.(\w+)|[0-9.eE+]+)\s*\)(?:\s*\*\s*([0-9]+))?;?$"
)

#: shape B — one branch of a same-field value-remap chain:
#:   if (ctx.F == params.a) { ctx.F = params.b; } else if ...
#:   (redis/log, nats/log: level and msg-type normalization)
_SCRIPT_REMAP_BRANCH = _re.compile(
    r"(?:else\s+)?if\s*\(\s*ctx\.([\w.]+)\s*==\s*params\.(\w+)\s*\)\s*"
    r"\{\s*ctx\.\1\s*=\s*params\.(\w+)\s*;?\s*\}"
)


def compile_painless_script(
    source: str, params: Mapping[str, Any], df: DataFrame
) -> tuple[str, Column]:
    """Compile the two painless ``script`` shapes that account for
    12 of the 14 script steps across the reference's module ingest
    programs (counted over filebeat/module/*/*/ingest/*.json) into a
    single Column assignment:

    - **round-scale**: ``ctx.t = Math.round(ctx.s * scale)[ * m]`` →
      ``round(s * scale) * m`` as a long (painless Math.round is
      half-up on the positive durations these steps scale; so are
      Spark's and DuckDB's round).
    - **value remap**: an if/else-if chain testing and reassigning the
      SAME field against params → one CASE expression; unmatched
      values keep the original (the chain has no else).

    Anything else — the auditd hex decoder, the mysql map-loop —
    raises :class:`IngestError` rather than mis-executing; route those
    through the pandas escape hatch (operators/actions.py
    ``PandasMap``) or list ``script`` in ``ignore_processors``.

    Returns (target_column_name, value_column).
    """
    src = " ".join(source.split())

    m = _SCRIPT_ROUND.match(src)
    if m:
        target, field, scale_expr, scale_param, mult = m.groups()
        if scale_param:
            if scale_param not in params:
                raise IngestError(f"script: missing param {scale_param!r}")
            scale = float(params[scale_param])
        else:
            scale = float(scale_expr)
        if field not in df.columns:
            raise IngestError(f"script: field missing: {field}")
        v = F.round(_fcol(field) * F.lit(scale), 0).cast("long")
        if mult:
            v = v * int(mult)
        return target, v

    branches = list(_SCRIPT_REMAP_BRANCH.finditer(src))
    if branches:
        covered = "".join(b.group(0) for b in branches)
        if "".join(covered.split()) != "".join(src.split()):
            raise IngestError(
                f"unsupported painless script (partial remap-chain match): "
                f"{source[:120]!r}"
            )
        field = branches[0].group(1)
        if any(b.group(1) != field for b in branches):
            raise IngestError("script: remap chain must test one field")
        col = (
            _fcol(field)
            if field in df.columns
            else F.lit(None).cast("string")
        )
        v: Column | None = None
        for b in branches:
            _, cond_key, val_key = b.groups()
            for k in (cond_key, val_key):
                if k not in params:
                    raise IngestError(f"script: missing param {k!r}")
            w = F.when(col == F.lit(params[cond_key]), F.lit(params[val_key]))
            v = w if v is None else v.when(
                col == F.lit(params[cond_key]), F.lit(params[val_key])
            )
        return field, v.otherwise(col)

    raise IngestError(f"unsupported painless script: {source[:120]!r}")


@dataclass
class IngestPipeline:
    """Compile an ES ingest processor list (parsed pipeline JSON) to a
    DataFrame transform. Steps are applied in order; unknown processor
    names raise (never silently skipped) unless listed in
    ``ignore_processors`` (for module programs carrying user_agent /
    geoip steps without dimension tables — pass ``ua_dim`` /
    ``geo_dim`` to execute those too, see operators/enrich.py).

    ``on_failure`` (pipeline-level handler steps, e.g. the apache
    module's ``set error.message = {{ _ingest.on_failure_message }}``
    — /root/reference/filebeat/module/apache/access/ingest/default.json)
    is EXECUTED: grok/date/convert/json steps record a per-row failure
    message (first failure wins), and after the chain the handler
    steps populate their target columns on exactly the failed rows.
    Documented divergence from the ingest node: subsequent steps are
    not per-row SKIPPED after a failure — they operate on the NULLs
    the failed step produced (for module programs the downstream steps
    chain on the failed step's outputs, so the observable result
    matches)."""

    steps: Sequence[Mapping[str, Mapping[str, Any]]]
    ignore_processors: Sequence[str] = ("user_agent", "geoip")
    on_failure: Sequence[Mapping[str, Mapping[str, Any]]] = ()
    ua_dim: Any = None
    geo_dim: Any = None

    def apply(self, df: DataFrame) -> DataFrame:
        if self.on_failure:
            df = df.withColumn(_ERR_COL, F.lit(None).cast("string"))
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
        if self.on_failure:
            df = self._apply_on_failure(df)
        return df

    # -- failure routing ------------------------------------------------

    def _record_failure(
        self, df: DataFrame, conf: Mapping[str, Any], fail: Column, msg: str
    ) -> DataFrame:
        """First-failure-wins error capture (only while an on_failure
        block is in effect; ``ignore_failure`` suppresses the record,
        mirroring the ingest node)."""
        if not self.on_failure or conf.get("ignore_failure"):
            return df
        return df.withColumn(
            _ERR_COL, F.coalesce(F.col(_ERR_COL), F.when(fail, F.lit(msg)))
        )

    def _apply_on_failure(self, df: DataFrame) -> DataFrame:
        failed = F.col(_ERR_COL).isNotNull()
        for step in self.on_failure:
            if len(step) != 1:
                raise IngestError(f"on_failure step must have one processor: {step}")
            (name, conf), = step.items()
            if name not in ("set", "append"):
                raise IngestError(f"unsupported on_failure processor: {name}")
            field = conf["field"]
            val = conf["value"]
            if isinstance(val, str) and "_ingest.on_failure_message" in val:
                v: Column = F.col(_ERR_COL)
            else:
                v = F.lit(val)
            existing = (
                _fcol(field)
                if field in df.columns
                else F.lit(None).cast("string")
            )
            if name == "append":
                v = F.array(v)
                existing = (
                    _fcol(field)
                    if field in df.columns
                    else F.lit(None).cast("array<string>")
                )
            df = df.withColumn(field, F.when(failed, v).otherwise(existing))
        return df.drop(_ERR_COL)

    # -- steps ----------------------------------------------------------

    def _step_grok(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        from .actions import Grok

        field = conf["field"]
        if field not in df.columns:
            if conf.get("ignore_missing"):
                return df
            raise IngestError(f"grok field missing: {field}")
        out = Grok(patterns=list(conf["patterns"]), field=field).apply(df)
        if self.on_failure:
            from ..functions.grok import grok_first_match

            _, ok = grok_first_match(_fcol(field), list(conf["patterns"]))
            fail = _fcol(field).isNotNull() & ~F.coalesce(ok, F.lit(False))
            out = self._record_failure(
                out, conf,
                fail, f"Provided Grok expressions do not match field [{field}]",
            )
        return out

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
        df = self._record_failure(
            df, conf,
            _fcol(field).isNotNull() & ts.isNull(),
            f"unable to parse date [{field}]",
        )
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
        cast = _fcol(field).try_cast(_CONVERT_TYPES[typ])
        df = self._record_failure(
            df, conf,
            _fcol(field).isNotNull() & cast.isNull(),
            f"unable to convert [{field}] to {typ}",
        )
        return df.withColumn(target, cast)

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

    def _step_dot_expander(
        self, df: DataFrame, conf: Mapping[str, Any]
    ) -> DataFrame:
        """``dot_expander`` turns a literal dotted KEY into the nested
        object path (the most-used absent step in r2 — 22 uses across
        module ingest JSONs, e.g.
        /root/reference/filebeat/module/elasticsearch/audit/ingest/pipeline.json).
        Our execution model keeps ECS fields as FLAT dotted column
        names, where the literal-dotted-key and nested spellings are
        the SAME column — so the step validates addressability and is
        the identity transform. ``path`` scopes the field under a
        parent object, i.e. the flat name ``path + '.' + field``."""
        field = conf["field"]
        if field == "*":
            return df
        path = conf.get("path")
        flat = f"{path}.{field}" if path else field
        if flat not in df.columns:
            # ES dot_expander is a no-op when the field is absent
            return df
        return df

    def _step_split(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        """``split`` divides a string field into an array on a regex
        separator (ingest-common SplitProcessor — Java ``String.split``
        semantics: trailing empty strings dropped unless
        ``preserve_trailing``; an empty input yields ``[""]``)."""
        field = conf["field"]
        if field not in df.columns:
            if conf.get("ignore_missing") or conf.get("ignore_failure"):
                return df
            raise IngestError(f"split field missing: {field}")
        target = conf.get("target_field", field)
        col = _fcol(field)
        arr = F.split(col, conf["separator"], -1)
        if not conf.get("preserve_trailing"):
            # index of the last non-empty element; slice keeps [1..n]
            n = F.array_max(
                F.zip_with(
                    arr,
                    F.sequence(F.lit(1), F.greatest(F.size(arr), F.lit(1))),
                    lambda x, i: F.when(x != "", i).otherwise(F.lit(0)),
                )
            )
            arr = F.when(col == "", F.array(F.lit(""))).otherwise(
                F.slice(arr, 1, F.greatest(n, F.lit(0)))
            )
        return df.withColumn(target, arr)

    def _step_json(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        """``json`` parses a JSON-string field. With a ``schema``
        (Spark DDL struct string — our documented extension, since the
        ingest node discovers keys per document and a Spark plan needs
        the schema up front) the parsed top-level keys become FLAT
        dotted columns ``<target>.<key>``; without one the target
        becomes a ``map<string,string>`` column (scalar values only).
        A non-parseable non-null document records a failure for
        ``on_failure``."""
        field = conf["field"]
        if field not in df.columns:
            if conf.get("ignore_missing") or conf.get("ignore_failure"):
                return df
            raise IngestError(f"json field missing: {field}")
        if conf.get("add_to_root"):
            raise IngestError("json: add_to_root needs a schema'd target; "
                              "use target_field + schema")
        target = conf.get("target_field", field)
        col = _fcol(field)
        schema = conf.get("schema")
        parsed = F.from_json(
            col, schema if schema else "map<string,string>"
        )
        # from_json returns an all-NULL struct (not NULL) for malformed
        # input under a struct schema — probe validity separately
        df = self._record_failure(
            df, conf,
            col.isNotNull() & F.try_parse_json(col).isNull(),
            f"unable to parse JSON [{field}]",
        )
        if not schema:
            return df.withColumn(target, parsed)
        df = df.withColumn("_json_tmp", parsed)
        from pyspark.sql.types import StructType

        struct: StructType = df.schema["_json_tmp"].dataType  # type: ignore[assignment]
        for sub in struct.fieldNames():
            df = df.withColumn(f"{target}.{sub}", F.col("_json_tmp")[sub])
        return df.drop("_json_tmp")

    def _step_kv(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        """``kv`` splits key=value text (ingest-common KeyValueProcessor,
        e.g. /root/reference/filebeat/module/auditd/log/ingest/pipeline.json:
        field_split \\s+, value_split =). With ``include_keys`` each
        listed key becomes a FLAT dotted column ``<target>.<key>``
        (plan-time schema); without it the target holds the full
        ``map<string,string>``."""
        field = conf["field"]
        if field not in df.columns:
            if conf.get("ignore_missing") or conf.get("ignore_failure"):
                return df
            raise IngestError(f"kv field missing: {field}")
        target = conf.get("target_field", field)
        m = F.str_to_map(
            _fcol(field), F.lit(conf["field_split"]), F.lit(conf["value_split"])
        )
        include = conf.get("include_keys")
        if not include:
            return df.withColumn(target, m)
        df = df.withColumn("_kv_tmp", m)
        for key in include:
            df = df.withColumn(f"{target}.{key}", F.col("_kv_tmp")[key])
        return df.drop("_kv_tmp")

    def _step_drop(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        """``drop`` discards documents matching the painless ``if``
        condition (module usage shape:
        ``ctx.elasticsearch.server.type != 'server'``)."""
        cond = painless_condition(conf["if"], df)
        return df.where(~cond)

    def _step_append(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        """``append`` adds value(s) to a field, promoting a scalar to
        an array and creating the field when absent (ES semantics)."""
        field = conf["field"]
        val = conf["value"]
        vals = val if isinstance(val, list) else [val]
        if any(isinstance(v, str) and "{{" in v for v in vals):
            raise IngestError("append: template values not supported")
        add = F.array(*[F.lit(v) for v in vals])
        if field not in df.columns:
            return df.withColumn(field, add)
        existing = _fcol(field)
        from pyspark.sql.types import ArrayType

        if isinstance(df.schema[field].dataType, ArrayType):
            combined = F.concat(existing, add)
        else:
            combined = F.concat(F.array(existing), add)
        return df.withColumn(field, combined)

    def _step_script(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        """``script`` (painless) compiled to a Column assignment for
        the recognized module shapes — see
        :func:`compile_painless_script`. Unsupported scripts raise."""
        lang = conf.get("lang", "painless")
        if lang != "painless":
            raise IngestError(f"script: unsupported lang {lang!r}")
        source = conf.get("source") or conf.get("inline")
        if not source:
            raise IngestError("script: missing source")
        target, value = compile_painless_script(
            source, conf.get("params", {}), df
        )
        return df.withColumn(target, value)

    def _step_user_agent(
        self, df: DataFrame, conf: Mapping[str, Any]
    ) -> DataFrame:
        """``user_agent`` as a broadcast-dimension enrich: the ingest
        node ships a regexes.yaml database; here the parsed fields come
        from a caller-provided dimension table (``ua_dim``) joined
        broadcast on the exact UA string (operators/enrich.py
        UserAgentEnrich). Without a dim the step raises — add
        'user_agent' to ignore_processors to skip instead."""
        if self.ua_dim is None:
            raise IngestError(
                "user_agent step needs ua_dim (or list it in "
                "ignore_processors)"
            )
        from .enrich import UserAgentEnrich

        return UserAgentEnrich(
            dim=self.ua_dim,
            field=conf.get("field", "user_agent"),
            target_prefix=conf.get("target_field", "user_agent"),
        ).apply(df)

    def _step_geoip(self, df: DataFrame, conf: Mapping[str, Any]) -> DataFrame:
        """``geoip`` as a broadcast CIDR-dimension enrich: longest-
        prefix match against a caller-provided (cidr → geo) table
        (operators/enrich.py GeoIPEnrich — per-prefix-length equi-join,
        never a nested-loop range join). Without a dim the step raises —
        add 'geoip' to ignore_processors to skip instead."""
        if self.geo_dim is None:
            raise IngestError(
                "geoip step needs geo_dim (or list it in ignore_processors)"
            )
        from .enrich import GeoIPEnrich

        return GeoIPEnrich(
            dim=self.geo_dim,
            field=conf["field"],
            target_prefix=conf.get("target_field", "geoip"),
        ).apply(df)


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
