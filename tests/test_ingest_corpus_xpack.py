"""x-pack module corpus conformance (r4 verdict #2): the six
commercial-tier filebeat modules under
``/root/reference/x-pack/filebeat/module/`` — cisco/asa (the one YAML
pipeline in the corpus), coredns, iptables, netflow, suricata, zeek
(7 filesets) — compile, apply, and match their shipped
``test/*.log-expected.json`` goldens value-for-value like the OSS 62.

The json-input modules (suricata, zeek) configure
``json.keys_under_root: false`` plus FILEBEAT-side ``drop_fields`` /
``rename`` processors in their ``config/*.yml`` (e.g.
zeek/dns/config/dns.yml renames ``json`` → ``zeek.dns`` and the
literally-dotted ``id.orig_h`` keys to ECS addresses). Those configs
are read straight from the reference and translated to the map-aware
ingest ``remove``/``rename`` steps (libbeat's processors resolve the
same GetValue paths through the event map)."""

from __future__ import annotations

import glob
import json
import os
import re

import pytest
import yaml
from pyspark.sql import functions as F

from beats_spark.operators.fileset import load_fileset_pipeline
from beats_spark.operators.ingest import IngestPipeline

from tests.test_ingest_corpus import _golden_case

XMODULES = "/root/reference/x-pack/filebeat/module"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(XMODULES),
    reason="x-pack reference module corpus not present",
)

#: fields the x-pack goldens carry that this harness can't reproduce:
#: filebeat-side tags/prospector metadata. network.community_id IS
#: reproduced byte-exactly (community_id_spec, golden-verified).
_XSKIP = re.compile(r"^(tags|event\.severity$)")


def _entry_pipelines() -> list[str]:
    all_files = sorted(glob.glob(f"{XMODULES}/*/*/ingest/*"))
    referenced: set[str] = set()
    for p in all_files:
        for m in re.finditer(
            r'\{<\s*IngestPipeline "([-\w]+)"\s*>\}', open(p).read()
        ):
            base = os.path.join(os.path.dirname(p), m.group(1))
            referenced.add(base + ".json")
            referenced.add(base + ".yml")
    return [p for p in all_files if p not in referenced]


def _community_id_pre(conf: dict):
    """The config's ``community_id`` processor (suricata reads the
    json map's src/dest tuple; zeek connection branches icmp type/code
    into the port slots) → the byte-exact spec hash, reading each
    configured field through the map-aware resolver."""
    from beats_spark.operators.actions import community_id_spec
    from beats_spark.operators.ingest import _read_field

    fields = {
        "source_ip": "source.ip", "source_port": "source.port",
        "destination_ip": "destination.ip",
        "destination_port": "destination.port",
        "transport": "network.transport",
        **(conf.get("fields") or {}),
    }

    def pre(spark, df):
        def rd(name):
            c = _read_field(df, fields[name])
            return c if c is not None else F.lit(None)

        return df.withColumn(
            "network.community_id",
            community_id_spec(
                rd("source_ip").cast("string"),
                rd("source_port"),
                rd("destination_ip").cast("string"),
                rd("destination_port"),
                rd("transport"),
            ),
        )

    return pre


def _config_pre_steps(module: str, fileset: str) -> list[dict]:
    """Read the fileset's ``config/*.yml``, strip the Go-template
    lines (``{{ ... }}`` — paths/tags interpolation and conditional
    blocks), and translate its FILEBEAT-side processors to the
    map-aware ingest equivalents: ``drop_fields`` → ``remove``
    (non-fatal), ``rename`` → per-pair ``rename`` steps."""
    cfgs = glob.glob(f"{XMODULES}/{module}/{fileset}/config/*.yml")
    assert cfgs, f"no config for {module}/{fileset}"
    raw = open(cfgs[0]).read()
    kept = "\n".join(
        ln for ln in raw.splitlines() if "{{" not in ln and "}}" not in ln
    )
    doc = yaml.safe_load(kept) or {}
    steps: list[dict] = []
    cid_confs: list[dict] = []
    # constant `fields:` (zeek http/ssl pin network.transport: tcp);
    # fields_under_root: true puts them at the event root
    prefix = "" if doc.get("fields_under_root") else "fields."
    for k, v in (doc.get("fields") or {}).items():
        steps.append({"set": {"field": f"{prefix}{k}", "value": v}})
    for proc in doc.get("processors") or []:
        if "if" in proc:
            # conditional wrapper — the corpus only uses it around
            # community_id (zeek connection's icmp branch maps
            # type/code into the SAME port slots the else branch
            # reads, and community_id_spec handles the icmp pseudo-
            # port rules itself, so one unconditional hash suffices)
            leaves = set()
            for branch in ("then", "else"):
                b = proc.get(branch)
                if isinstance(b, dict):
                    leaves |= set(b.keys())
            assert leaves <= {"community_id"}, proc
            cid_confs.append(proc.get("else", {}).get("community_id", {}))
            continue
        ((name, conf),) = proc.items()
        if name == "drop_fields":
            steps.append(
                {
                    "remove": {
                        "field": list(conf["fields"]),
                        "ignore_missing": True,
                    }
                }
            )
        elif name == "rename":
            for pair in conf["fields"]:
                steps.append(
                    {
                        "rename": {
                            "field": pair["from"],
                            "target_field": pair["to"],
                            "ignore_missing": True,
                        }
                    }
                )
        elif name == "community_id":
            cid_confs.append(conf or {})
            continue
        else:  # pragma: no cover - corpus drift guard
            raise AssertionError(f"untranslated config processor {name}")
    return steps, cid_confs


def _json_pre(module: str, fileset: str):
    """Per-case `pre` hook: apply the fileset config's translated
    processor steps over the json-decoded frame, then its
    community_id processors (they sit last in every config that has
    one)."""
    steps, cid_confs = _config_pre_steps(module, fileset)

    def pre(spark, df):
        if steps:
            df = IngestPipeline(steps=steps).apply(df)
        for conf in cid_confs:
            df = _community_id_pre(conf)(spark, df)
        return df

    return pre


def test_every_xpack_entry_pipeline_loads_and_applies(spark):
    """All 11 x-pack entry pipelines (13 files with the coredns subs)
    compile to a plan and execute — YAML pipeline, template var
    substitution, guarded dissects, bracket-path painless, the
    iptables/suricata loop shapes."""
    entries = _entry_pipelines()
    assert len(entries) == 11
    probe = spark.createDataFrame(
        [
            (
                "dummy log line",
                "2024-01-01T00:00:00.000Z",
                "fbtest",
                {"type": "log"},
            )
        ],
        "message string, `@timestamp` string, `fileset.name` string, "
        "json map<string,string>",
    )
    failures = []
    for path in entries:
        short = path.split("module/")[1]
        try:
            pipe = load_fileset_pipeline(
                path,
                variables={"convert_timezone": False, "log_level": 7},
                ignore_processors=("user_agent", "geoip"),
            )
            pipe.apply(probe).count()
        except Exception as e:  # noqa: BLE001 - collecting a report
            failures.append(f"{short}: {type(e).__name__}: {e}")
    assert not failures, "\n".join(failures)


# -- goldens ----------------------------------------------------------


def _xgold(spark, module, fileset, logname, **kw):
    kw.setdefault("skip", _XSKIP)
    return _golden_case(
        spark, module, fileset, logname, modules=XMODULES, **kw
    )


def test_golden_cisco_asa(spark):
    # the upstream golden generator caps expected events at 100
    # (asa.log carries 268 lines) — positional compare over the
    # golden's extent
    _xgold(
        spark, "cisco", "asa", "asa.log", pipename="pipeline.yml",
        default_year=2019, allow_extra_rows=True,
    )


def test_golden_cisco_asa_sample(spark):
    _xgold(
        spark, "cisco", "asa", "sample.log", pipename="pipeline.yml",
        default_year=2019,
    )


def test_golden_cisco_asa_filtered(spark):
    """filtered.log exercises the {< .log_level >} drop guard at the
    manifest default (7): the severity-8 line drops, the severity-7
    line survives."""
    _xgold(
        spark, "cisco", "asa", "filtered.log", pipename="pipeline.yml",
        default_year=2019,
    )


def test_golden_coredns_plain(spark):
    _xgold(
        spark, "coredns", "log", "coredns.log",
        pipename="pipeline-entry.json",
    )


def test_golden_coredns_json(spark):
    _xgold(
        spark, "coredns", "log", "coredns-json.log",
        pipename="pipeline-entry.json",
    )


def _iptables_cid_pre(spark, df):
    """The iptables config's community_id block (config/log.yml behind
    the community_id var, default on): filebeat-side dissects pull
    SRC/DST/PROTO and ports (or ICMP TYPE/CODE) from the RAW message,
    then the processor hashes the tuple — all before the ingest
    pipeline runs. community_id_spec's icmp rules take the type/code
    pair directly in the port slots."""
    from beats_spark.operators.actions import community_id_spec

    m = F.col("message")
    ex = lambda p: F.nullif(F.regexp_extract(m, p, 1), F.lit(""))  # noqa: E731
    proto = F.lower(ex(r" PROTO=(\S+) "))
    is_icmp = proto.isin("icmp", "icmpv6")
    sport = F.when(is_icmp, ex(r" TYPE=(\d+) ")).otherwise(
        ex(r" SPT=(\d+) ")
    )
    dport = F.when(is_icmp, ex(r" CODE=(\d+) ")).otherwise(
        ex(r" DPT=(\d+) ")
    )
    return df.withColumn(
        "network.community_id",
        community_id_spec(
            ex(r" SRC=(\S+) "), sport, ex(r" DST=(\S+) "), dport, proto
        ),
    )


@pytest.mark.parametrize(
    "logname",
    ["iptables.log", "icmp.log", "geo.log", "ipv6.log", "ubiquiti.log"],
)
def test_golden_iptables(spark, logname):
    # goldens generated in 2019: the ES date processor defaults the
    # year-less syslog stamp to the ingest-time year
    _xgold(
        spark, "iptables", "log", logname, default_year=2019,
        pre=_iptables_cid_pre,
    )


@pytest.mark.parametrize("logname", ["eve-small.log", "eve-alerts.log"])
def test_golden_suricata_eve(spark, logname):
    _xgold(
        spark, "suricata", "eve", logname,
        json_decode=True, pre=_json_pre("suricata", "eve"),
    )


@pytest.mark.parametrize(
    "fileset,logname",
    [
        ("connection", "connection-json.log"),
        ("dns", "dns-json.log"),
        ("files", "files-json.log"),
        ("http", "http-json.log"),
        ("notice", "notice-json.log"),
        ("ssl", "ssl-json.log"),
    ],
)
def test_golden_zeek(spark, fileset, logname):
    _xgold(
        spark, "zeek", fileset, logname,
        json_decode=True, pre=_json_pre("zeek", fileset),
        # http/files/ssl ship one more log line than golden events
        # (stale fixtures — golden never regenerated upstream)
        allow_extra_rows=fileset in ("http", "files", "ssl"),
    )
