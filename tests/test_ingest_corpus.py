"""Whole-corpus conformance: every reference module ingest pipeline
loads, compiles, and applies; golden-file value parity for single-line
modules.

The reference ships 42 ingest JSONs under
``filebeat/module/*/*/ingest/*.json`` (34 entry pipelines + 8
sub-pipelines referenced via ``{< IngestPipeline >}``), and per-module
golden fixtures under ``filebeat/module/*/*/test/`` — a sample log
plus the event the FULL pipeline should produce
(``*-expected.json``, flat dotted keys, matching our flat-column
model). Tests read the corpus directly from ``/root/reference``
(read-only) and skip when it's absent."""

from __future__ import annotations

import glob
import json
import os
import re

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.fileset import (
    load_fileset_pipeline,
    render_fileset_template,
)
from beats_spark.operators.ingest import IngestError

MODULES = "/root/reference/filebeat/module"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MODULES), reason="reference module corpus not present"
)


def _entry_pipelines() -> list[str]:
    all_files = sorted(glob.glob(f"{MODULES}/*/*/ingest/*.json"))
    referenced: set[str] = set()
    for p in all_files:
        for m in re.finditer(
            r'\{<\s*IngestPipeline "([-\w]+)"\s*>\}', open(p).read()
        ):
            referenced.add(os.path.join(os.path.dirname(p), m.group(1) + ".json"))
    return [p for p in all_files if p not in referenced]


def _load(path: str, variables: dict | None = None, **kwargs):
    return load_fileset_pipeline(
        path,
        variables={"convert_timezone": False, "log_level": 7,
                   **(variables or {})},
        ignore_processors=("user_agent", "geoip"),
        **kwargs,
    )


@pytest.fixture(scope="module")
def probe_frame(spark):
    return spark.createDataFrame(
        [
            (
                "dummy log line",
                "2024-01-01T00:00:00.000Z",
                "fbtest",
                "host1",
                {"type": "log"},
            )
        ],
        "message string, `@timestamp` string, `fileset.name` string, "
        "`host.name` string, json map<string,string>",
    )


def test_template_renderer_rejects_unknown_directive():
    with pytest.raises(IngestError, match="template directive"):
        render_fileset_template('{"a": {< range .x >}1{< end >}}')


def test_every_entry_pipeline_loads_and_applies(spark, probe_frame):
    """All 34 entry pipelines (42 files with subs) compile to a plan
    and execute over a one-row frame — no unsupported step, grok
    pattern, painless script, or template directive anywhere in the
    corpus."""
    entries = _entry_pipelines()
    assert len(entries) >= 34
    failures = []
    for path in entries:
        short = path.split("module/")[1]
        try:
            out = _load(path).apply(probe_frame)
            out.count()
        except Exception as e:  # noqa: BLE001 - collecting a report
            failures.append(f"{short}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


# -- golden-file value parity ------------------------------------------

#: fields the pipeline can't reproduce here: filebeat-side metadata
#: (offset/input/service/dataset...), the UA/geo enriches we run only
#: with dimension tables, host-locale-dependent, and read-time values
_SKIP = re.compile(
    r"^(user_agent\.|.*\.geo\.|input\.|log\.offset|log\.file\.|service\.|"
    r"event\.(module|dataset|created|timezone)|fileset\.|ecs\.|agent\.|"
    r"host\.|error\.)"
)


def _dig(got: dict, key: str):
    """Resolve a flat dotted golden key against a row dict whose value
    may live inside a map column (dict) or nested-JSON text (the
    map<string,string> model keeps sub-objects as JSON strings).
    Returns (found, value)."""
    if got.get(key) is not None:
        return True, got[key]
    parts = key.split(".")
    # longest existing column prefix first (e.g. `osquery.result`)
    for i in range(len(parts) - 1, 0, -1):
        head = ".".join(parts[:i])
        if head not in got or got[head] is None:
            continue
        val = got[head]
        rest = parts[i:]
        j = 0
        dead = False
        while j < len(rest):
            if isinstance(val, str):
                try:
                    val = json.loads(val)
                except ValueError:
                    dead = True
                    break
            if not isinstance(val, dict):
                dead = True
                break
            hit = False
            for k in range(len(rest), j, -1):  # dotted map keys allowed
                kk = ".".join(rest[j:k])
                if kk in val:
                    val, j, hit = val[kk], k, True
                    break
            if not hit:
                dead = True
                break
        if not dead:
            return True, val
    # a flat column that exists but is NULL (and no map fallback)
    if key in got:
        return True, got[key]
    return False, None


def _golden_case(
    spark, module, fileset, logname, pipename="pipeline.json",
    multiline=None, json_decode=False, variables=None, exclude_lines=None,
    modules=MODULES, pre=None, skip=None, allow_extra_rows=False,
    default_year=None,
):
    logpath = f"{modules}/{module}/{fileset}/test/{logname}"
    expath = logpath + "-expected.json"
    if not (os.path.exists(logpath) and os.path.exists(expath)):
        pytest.skip(f"fixture missing: {logpath}")
    lines = open(logpath, encoding="utf-8").read().splitlines()
    expected = json.load(open(expath, encoding="utf-8"))
    if multiline:
        # the fileset's filebeat-side multiline reader runs BEFORE the
        # ingest pipeline (module config/*.yml `multiline:` block)
        from beats_spark.streaming.multiline import multiline_batch

        raw = spark.createDataFrame(
            [("f0", i, ln) for i, ln in enumerate(lines)],
            "conv_id string, turn_idx int, text string",
        )
        events = multiline_batch(raw, **multiline)
        df = events.select(
            F.col("first_turn_idx").alias("rowid"),
            F.col("doc").alias("message"),
            F.lit("2024-01-01T00:00:00.000Z").alias("@timestamp"),
            # filebeat tags joined events (harvester log.flags)
            F.when(
                F.col("n_lines") > 1, F.array(F.lit("multiline"))
            ).alias("log.flags"),
        )
    else:
        df = spark.createDataFrame(
            [(i, ln, "2024-01-01T00:00:00.000Z") for i, ln in enumerate(lines)],
            "rowid long, message string, `@timestamp` string",
        )
    # the harvester drops empty EVENTS and applies exclude_lines to the
    # ASSEMBLED message — both run AFTER the multiline reader, so a
    # blank line inside a joined stack trace survives (kafka
    # state-change-2.0.0) while a standalone blank line is dropped
    # (haproxy httplog-no-headers), and a multi-line mysql version
    # header is excluded as ONE event
    # (filebeat/input/log/harvester.go:308,403-421)
    df = df.filter(F.length("message") > 0)
    if exclude_lines:
        df = df.filter(~F.col("message").rlike(exclude_lines))
    if json_decode:
        # filebeat-side json reader (fileset config `json.*` options):
        # the event carries the parsed object under `json`, and with
        # keys_under_root:false there is NO message field at all — the
        # raw line survives only on decode error
        # (libbeat/reader/readjson/json.go:117-128)
        df = df.withColumn(
            "json", F.from_json("message", "map<string,string>")
        ).withColumn(
            "message",
            F.when(F.col("json").isNull(), F.col("message")),
        )
    if pre is not None:
        df = pre(spark, df)
    pipe = _load(
        f"{modules}/{module}/{fileset}/ingest/{pipename}", variables,
        default_year=default_year,
    )
    out = pipe.apply(df).orderBy("rowid")
    rows = [r.asDict() for r in out.collect()]
    if allow_extra_rows:
        # some x-pack fixtures are internally stale: the shipped
        # golden was generated before lines were appended to the log
        # (zeek http/files/ssl carry N+1 lines vs N golden events) —
        # compare positionally over the golden's extent
        assert len(rows) >= len(expected)
    else:
        assert len(rows) == len(expected)
    mismatches = []
    for i, (got, want) in enumerate(zip(rows, expected)):
        for key, wval in want.items():
            if _SKIP.match(key) or (skip and skip.match(key)):
                continue
            found, gval = _dig(got, key)
            if not found:
                mismatches.append(f"row {i}: column missing: {key}")
                continue
            import datetime

            if isinstance(gval, datetime.datetime):
                gval = gval.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3] + "Z"
            if isinstance(gval, str) and isinstance(wval, (dict, list)):
                # a map<string,string> keeps nested objects as their
                # JSON text; the golden file has the parsed object
                try:
                    gval = json.loads(gval)
                except ValueError:
                    pass
            if isinstance(gval, str) and isinstance(
                wval, (int, float, bool)
            ):
                # a leaf read out of the filebeat json reader keeps its
                # JSON-text lexical form in our map<string,string>
                # model (kibana renames res.statusCode → 304 the ES
                # side, "304" ours); numeric identity is checked by
                # parsing the text back
                try:
                    gval = json.loads(gval)
                except ValueError:
                    pass
            if isinstance(gval, (int, float)) and isinstance(
                wval, (int, float)
            ) and not isinstance(gval, bool) and not isinstance(wval, bool):
                # relative 2e-6: ES stores grok :float as float32 and
                # different ES versions ran the duration-scale painless
                # in float or double — the goldens carry both roundings
                # (mysql 178306016000 is float math, postgresql
                # 26082001 is double math on the same script shape);
                # 2e-6 absorbs float32 epsilon, real defects are off by
                # orders of magnitude
                w = float(wval)
                ok = abs(gval - w) <= max(1e-9, 2e-6 * abs(w))
            elif gval is None and key == "@timestamp" and wval is None:
                ok = True
            else:
                ok = gval == wval
            if not ok:
                mismatches.append(f"row {i} {key}: got {gval!r} want {wval!r}")
    assert not mismatches, "\n".join(mismatches[:25])


def test_golden_nginx_access(spark):
    """nginx access: grok + the first-public-IP painless script +
    split remote_ip_list (module/nginx/access/ingest/default.json)."""
    _golden_case(spark, "nginx", "access", "test.log", "default.json")


def test_golden_apache_access(spark):
    _golden_case(spark, "apache", "access", "test.log", "default.json")


def test_golden_traefik_access(spark):
    _golden_case(spark, "traefik", "access", "test.log")


def test_golden_redis_log(spark):
    _golden_case(spark, "redis", "log", "redis-5.0.3.log")


def test_golden_icinga_main(spark):
    """icinga joins continuation lines with the fileset's multiline
    reader (module/icinga/main/config/main.yml: pattern ^\\[, negate,
    match after) before the ingest grok."""
    _golden_case(
        spark, "icinga", "main", "test.log",
        multiline={"pattern": r"^\[", "negate": True, "match": "after"},
    )


def test_golden_nats_log(spark):
    _golden_case(spark, "nats", "log", "test.log")


def test_golden_mongodb_log(spark):
    _golden_case(spark, "mongodb", "log", "mongodb-debian-3.2.11.log")


def test_golden_haproxy_log(spark):
    _golden_case(spark, "haproxy", "log", "default.log")


def test_golden_santa_log(spark):
    _golden_case(spark, "santa", "log", "santa.log")


def test_golden_osquery_result(spark):
    """osquery: json-decode of message into a map target, the
    namespace-move painless script (use_namespace=true, the manifest
    default), renames out of the map
    (module/osquery/result/ingest/pipeline.json)."""
    _golden_case(
        spark, "osquery", "result", "test.log", json_decode=True,
        variables={"use_namespace": True},
    )


def test_golden_mysql_error(spark):
    _golden_case(spark, "mysql", "error", "error.log")


def test_golden_suse_syslog(spark):
    """system/syslog: year-less SYSLOGTIMESTAMP date parse."""
    _golden_case(spark, "system", "syslog", "suse-syslog.log")


def test_golden_auditd_log(spark):
    """auditd: kv-parse + the kv-normalize painless script (hex→ASCII
    exe/cmd, quote trim, arch remap)."""
    _golden_case(spark, "auditd", "log", "audit-rhel6.log")


def test_golden_nginx_error(spark):
    _golden_case(spark, "nginx", "error", "error.log")


def test_golden_apache_error(spark):
    _golden_case(spark, "apache", "error", "test.log")


def test_golden_iis_access(spark):
    _golden_case(spark, "iis", "access", "test-iis-7.5.log", "default.json",
                 exclude_lines=r"^#")


def test_golden_iis_error(spark):
    _golden_case(spark, "iis", "error", "test.log", "default.json",
                 exclude_lines=r"^#")


def test_golden_elasticsearch_audit(spark):
    _golden_case(spark, "elasticsearch", "audit", "test-audit.log")


def test_golden_logstash_slowlog_plain(spark):
    _golden_case(spark, "logstash", "slowlog", "slowlog-plain.log",
                 "pipeline-plain.json")


# -- multiline module goldens -------------------------------------------


def test_golden_kafka_log(spark):
    """kafka: stack-trace continuation lines joined by the fileset's
    multiline reader, then grok + date."""
    _golden_case(
        spark, "kafka", "log", "server.log",
        multiline={"pattern": r"^\[", "negate": True, "match": "after"},
    )


def test_golden_elasticsearch_server(spark):
    """es/server: multiline + plaintext/json sub-pipeline routing."""
    _golden_case(
        spark, "elasticsearch", "server", "test.log",
        multiline={
            "pattern": r"^(\[[0-9]{4}-[0-9]{2}-[0-9]{2}|\{)",
            "negate": True, "match": "after",
        },
    )


def test_golden_elasticsearch_gc(spark):
    _golden_case(
        spark, "elasticsearch", "gc", "test.log",
        multiline={
            "pattern": r"^\[?[0-9]{4}-[0-9]{2}-[0-9]{2}",
            "negate": True, "match": "after",
        },
    )


def test_golden_elasticsearch_deprecation(spark):
    _golden_case(
        spark, "elasticsearch", "deprecation",
        "elasticsearch_deprecation.log",
        multiline={
            "pattern": r"^(\[[0-9]{4}-[0-9]{2}-[0-9]{2}|\{)",
            "negate": True, "match": "after",
        },
    )


def test_golden_elasticsearch_slowlog(spark):
    _golden_case(
        spark, "elasticsearch", "slowlog",
        "auditlog_index_indexing_slowlog.log",
        multiline={
            "pattern": r"^(\[?[0-9]{4}-[0-9]{2}-[0-9]{2}|\{)",
            "negate": True, "match": "after",
        },
    )


def test_golden_postgresql_log(spark):
    _golden_case(
        spark, "postgresql", "log", "postgresql-9.6-new-timestamp.log",
        multiline={"pattern": r"^[-0-9]* ", "negate": True, "match": "after"},
    )


def test_golden_mysql_slowlog(spark):
    """mysql/slowlog: multiline + header exclude_lines + the
    params-driven field-remap painless loop."""
    _golden_case(
        spark, "mysql", "slowlog", "mariadb-10.1.21.log",
        multiline={
            "pattern": r"^(# User@Host: |# Time: )",
            "negate": True, "match": "after",
        },
        exclude_lines=(
            r"(^[\/\w\.]+, Version: .* started with:.*|^# Time:.*)"
        ),
    )


def test_golden_icinga_startup(spark):
    _golden_case(
        spark, "icinga", "startup", "test.log",
        multiline={
            "pattern": r"^[a-z]*\/[a-zA-Z]*:", "negate": True,
            "match": "after",
        },
    )


def test_golden_icinga_debug(spark):
    _golden_case(
        spark, "icinga", "debug", "test.log",
        multiline={"pattern": r"^\[", "negate": True, "match": "after"},
    )


def test_golden_logstash_log_plain(spark):
    _golden_case(
        spark, "logstash", "log", "logstash-plain.log", "pipeline-plain.json",
        multiline={
            "pattern": r"^\[[0-9]{4}-[0-9]{2}-[0-9]{2}",
            "negate": True, "match": "after",
        },
    )


def test_golden_system_auth(spark):
    _golden_case(
        spark, "system", "auth", "test.log",
        multiline={"pattern": r"^\s", "negate": False, "match": "after"},
    )


def test_golden_kibana_log(spark):
    """kibana: filebeat json reader (keys_under_root false) feeding a
    json-map-addressing pipeline."""
    _golden_case(spark, "kibana", "log", "test.log", json_decode=True)


# -- full-corpus sweep: every remaining golden fixture -------------------
#
# The named tests above document one fixture per semantic novelty; this
# table sweeps the REST of the reference's test/*-expected.json corpus
# so the claim is "every golden fixture passes", not "one per module".
# Reader kwargs come from each fileset's config/*.yml (multiline /
# exclude_lines / json) — same sources as the named tests.

_ML = {
    "kafka": {"pattern": r"^\[", "negate": True, "match": "after"},
    "es-server": {
        "pattern": r"^(\[[0-9]{4}-[0-9]{2}-[0-9]{2}|\{)",
        "negate": True, "match": "after",
    },
    "es-slowlog": {
        "pattern": r"^(\[?[0-9]{4}-[0-9]{2}-[0-9]{2}|\{)",
        "negate": True, "match": "after",
    },
    "mysql-slowlog": {
        "pattern": r"^(# User@Host: |# Time: )",
        "negate": True, "match": "after",
    },
    "pg": {"pattern": r"^[-0-9]* ", "negate": True, "match": "after"},
    "indent": {"pattern": r"^\s", "negate": False, "match": "after"},
}
_MYSQL_EXC = r"(^[\/\w\.]+, Version: .* started with:.*|^# Time:.*)"

_SWEEP = [
    ("apache", "access", "ssl-request.log", {"pipename": "default.json"}),
    ("auditd", "log", "test.log", {}),
    ("elasticsearch", "audit", "test-access.log", {}),
    ("elasticsearch", "deprecation", "other_elasticsearch_deprecation.log",
     {"multiline": _ML["es-server"]}),
    ("elasticsearch", "deprecation", "test-json.log",
     {"multiline": _ML["es-server"]}),
    ("elasticsearch", "server", "test-json.log",
     {"multiline": _ML["es-server"]}),
    ("elasticsearch", "slowlog", "es_index_indexing_slowlog-json.log",
     {"multiline": _ML["es-slowlog"]}),
    ("elasticsearch", "slowlog", "es_index_search_slowlog-json.log",
     {"multiline": _ML["es-slowlog"]}),
    ("elasticsearch", "slowlog", "test.log",
     {"multiline": _ML["es-slowlog"]}),
    ("haproxy", "log", "haproxy.log", {}),
    ("haproxy", "log", "tcplog.log", {}),
    ("haproxy", "log", "httplog-no-headers.log", {}),
    ("iis", "access", "test.log",
     {"pipename": "default.json", "exclude_lines": r"^#"}),
    ("iis", "access", "test-ipv6zone.log",
     {"pipename": "default.json", "exclude_lines": r"^#"}),
    ("iis", "error", "ipv6_zone_id.log",
     {"pipename": "default.json", "exclude_lines": r"^#"}),
    ("kafka", "log", "controller.log", {"multiline": _ML["kafka"]}),
    ("kafka", "log", "state-change.log", {"multiline": _ML["kafka"]}),
    ("kafka", "log", "state-change-1.1.0.log", {"multiline": _ML["kafka"]}),
    ("kafka", "log", "state-change-2.0.0.log", {"multiline": _ML["kafka"]}),
    # logstash's json format has no filebeat-side json reader — the
    # pipeline's own `json` processor parses `message`
    ("logstash", "log", "logstash-json.log",
     {"pipename": "pipeline-json.json"}),
    ("logstash", "slowlog", "slowlog-json.log",
     {"pipename": "pipeline-json.json"}),
    ("mysql", "slowlog", "mariadb-10.2.12.log",
     {"multiline": _ML["mysql-slowlog"], "exclude_lines": _MYSQL_EXC}),
    ("mysql", "slowlog", "mariadb-explain.log",
     {"multiline": _ML["mysql-slowlog"], "exclude_lines": _MYSQL_EXC}),
    ("mysql", "slowlog", "mysql-5.7.22.log",
     {"multiline": _ML["mysql-slowlog"], "exclude_lines": _MYSQL_EXC}),
    ("mysql", "slowlog", "mysql-ubuntu-8.0.15.log",
     {"multiline": _ML["mysql-slowlog"], "exclude_lines": _MYSQL_EXC}),
    ("mysql", "slowlog", "percona-ubuntu-5.7.19-innodb.log",
     {"multiline": _ML["mysql-slowlog"], "exclude_lines": _MYSQL_EXC}),
    ("mysql", "slowlog", "percona-ubuntu-8.0.15.log",
     {"multiline": _ML["mysql-slowlog"], "exclude_lines": _MYSQL_EXC}),
    ("postgresql", "log", "postgresql-9.6-debian-with-slowlog.log",
     {"multiline": _ML["pg"]}),
    ("postgresql", "log", "postgresql-9.6-multi-core.log",
     {"multiline": _ML["pg"]}),
    ("redis", "log", "test.log", {}),
    ("system", "syslog", "darwin-syslog-sample.log",
     {"multiline": _ML["indent"]}),
]


@pytest.mark.parametrize(
    "module,fileset,logname,kw",
    _SWEEP,
    ids=[f"{m}-{fs}-{ln}" for m, fs, ln, _ in _SWEEP],
)
def test_golden_sweep(spark, module, fileset, logname, kw):
    kw = dict(kw)
    pipename = kw.pop("pipename", "pipeline.json")
    _golden_case(spark, module, fileset, logname, pipename, **kw)


def test_module_ingest_job_end_to_end(spark, tmp_path):
    """jobs/module_ingest_job.py over the apache access fixture: the
    deployable module path (harvester semantics → ingest pipeline →
    parquet), checked through an independent reader."""
    import duckdb

    from jobs.module_ingest_job import run

    out = str(tmp_path / "mod_out")
    stats = run(
        spark,
        f"{MODULES}/apache/access/ingest/default.json",
        f"{MODULES}/apache/access/test/test.log",
        out,
    )
    assert stats["rows"] > 0 and stats["errors"] == 0
    n, codes = duckdb.sql(
        f"""SELECT count(*), count("http.response.status_code")
            FROM parquet_scan('{out}/*.parquet')"""
    ).fetchall()[0]
    assert n == stats["rows"] and codes == n
