"""when:-guarded processors leave non-matching rows untouched
(processors/conditionals.go:59-91) — incl. the parse processors whose
flags columns interact with the guard."""

from __future__ import annotations

from pyspark.sql import functions as F

from beats_spark.operators.actions import (
    AddFields,
    Dissect,
    Grok,
    TruncateFields,
    When,
    apply_chain,
)


def test_guarded_dissect_only_touches_matching_rows(spark):
    df = spark.createDataFrame(
        [
            ("log", "level=info msg=ok"),
            ("raw", "level=warn msg=skipme"),
        ],
        "kind string, text string",
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=Dissect(tokenizer="level=%{level} msg=%{msg}"),
            )
        ],
    ).collect()
    rows = {r["kind"]: r for r in out}
    assert rows["log"]["level"] == "info" and rows["log"]["msg"] == "ok"
    # guarded-out row: no parse products, no flags
    assert rows["raw"]["level"] is None and rows["raw"]["msg"] is None
    assert rows["raw"]["log_flags"] is None


def test_guarded_dissect_failure_tags_only_matching(spark):
    df = spark.createDataFrame(
        [("log", "garbage"), ("raw", "garbage")], "kind string, text string"
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=Dissect(tokenizer="level=%{level} msg=%{msg}"),
            )
        ],
    ).collect()
    rows = {r["kind"]: r["log_flags"] for r in out}
    assert rows["log"] == ["dissect_parsing_error"]
    assert rows["raw"] is None


def test_guarded_addfields_and_truncate(spark):
    df = spark.createDataFrame(
        [("a", "long text here"), ("b", "long text here")],
        "k string, text string",
    )
    out = apply_chain(
        df,
        [
            When(condition={"equals": {"k": "a"}}, then=AddFields(fields={"tag": "x"})),
            When(
                condition={"equals": {"k": "a"}},
                then=TruncateFields(fields=["text"], max_characters=4),
            ),
        ],
    ).collect()
    rows = {r["k"]: r for r in out}
    assert rows["a"]["tag"] == "x" and rows["a"]["text"] == "long"
    assert rows["b"]["tag"] is None and rows["b"]["text"] == "long text here"


def test_guarded_grok(spark):
    df = spark.createDataFrame(
        [("p", "code 200"), ("q", "code 500")], "k string, text string"
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"k": "p"}},
                then=Grok(patterns=["code %{INT:code:int}"]),
            )
        ],
    ).collect()
    rows = {r["k"]: r["code"] for r in out}
    assert rows["p"] == 200
    assert rows["q"] is None


def test_when_contains_on_array_column_matches_per_element(spark):
    # matcher.go:71-105: 'contains' over an array matches ANY ELEMENT
    # containing the substring. The probe value "n, w" would match the
    # STRING RENDERING "[production, web]" but no element — so this
    # test fails if the guard compiles without the DataFrame schema.
    df = spark.createDataFrame(
        [(1, ["production", "web"]), (2, ["staging"])],
        "id long, tags array<string>",
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"contains": {"tags": "n, w"}},
                then=AddFields({"hit": "y"}),
            ),
            When(
                condition={"contains": {"tags": "prod"}},
                then=AddFields({"element_hit": "y"}),
            ),
        ],
    ).collect()
    rows = {r["id"]: r for r in out}
    assert rows[1]["hit"] is None  # rendered-string match must NOT fire
    assert rows[1]["element_hit"] == "y"  # per-element substring does
    assert rows[2]["element_hit"] is None


def test_selector_rule_contains_on_array_column(spark):
    from beats_spark.operators.selector import Rule, compile_selector

    df = spark.createDataFrame(
        [(1, ["production", "web"]), (2, ["staging"])],
        "id long, tags array<string>",
    )
    sel = compile_selector(
        [Rule(value="prod-sink", when={"contains": {"tags": "prod"}})],
        default="misc",
        df=df,
    )
    got = {r["id"]: r["sink"] for r in df.withColumn("sink", sel).collect()}
    assert got == {1: "prod-sink", 2: "misc"}


# ---------------------------------------------------------------------------
# r4 verdict #3: the five processor kinds that used to REFUSE a when:
# guard. Each test runs guarded vs the reference rule: matching rows
# behave exactly like the unguarded processor; non-matching rows are
# byte-identical to the input.


def test_guarded_rename_moves_only_matching(spark):
    from beats_spark.operators.actions import Rename

    df = spark.createDataFrame(
        [("log", "payload-a"), ("raw", "payload-b")],
        "kind string, src string",
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=Rename(fields=[{"from": "src", "to": "dst"}]),
            )
        ],
    ).collect()
    rows = {r["kind"]: r for r in out}
    assert rows["log"]["dst"] == "payload-a" and rows["log"]["src"] is None
    assert rows["raw"]["src"] == "payload-b" and rows["raw"]["dst"] is None


def test_guarded_rename_still_validates(spark):
    import pytest
    from beats_spark.operators.actions import Rename

    df = spark.createDataFrame([("log", "x", "y")], "kind string, src string, dst string")
    with pytest.raises(ValueError, match="target column exists"):
        apply_chain(
            df,
            [
                When(
                    condition={"equals": {"kind": "log"}},
                    then=Rename(fields=[{"from": "src", "to": "dst"}]),
                )
            ],
        )


def test_guarded_drop_fields_nulls_only_matching(spark):
    from beats_spark.operators.actions import DropFields

    df = spark.createDataFrame(
        [("log", "secret", 1), ("raw", "keepme", 2)],
        "kind string, token string, n long",
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=DropFields(fields=["token", "missing_col"]),
            )
        ],
    ).collect()
    rows = {r["kind"]: r for r in out}
    assert rows["log"]["token"] is None and rows["log"]["n"] == 1
    assert rows["raw"]["token"] == "keepme" and rows["raw"]["n"] == 2


def test_guarded_include_fields_masks_only_matching(spark):
    from beats_spark.operators.actions import IncludeFields

    df = spark.createDataFrame(
        [
            (1, 0, "t", "log", "keep", "drop", ("in", "out")),
            (2, 0, "t", "raw", "keep", "drop", ("in", "out")),
        ],
        "conv_id long, turn_idx long, ts string, kind string, "
        "a string, b string, s struct<x:string,y:string>",
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=IncludeFields(fields=["kind", "a", "s.x"]),
            )
        ],
    ).collect()
    rows = {r["kind"]: r for r in out}
    # matching: whitelist kept, others nulled, struct masked in place
    assert rows["log"]["a"] == "keep" and rows["log"]["b"] is None
    assert rows["log"]["s"]["x"] == "in" and rows["log"]["s"]["y"] is None
    assert rows["log"]["conv_id"] == 1  # always_keep
    # non-matching: untouched
    assert rows["raw"]["b"] == "drop" and rows["raw"]["s"]["y"] == "out"


def test_guarded_script_runs_only_on_matching(spark):
    from beats_spark.operators.actions import Script
    from pyspark.sql import functions as F

    def fn(df):
        return df.withColumn("text", F.upper("text")).withColumn(
            "scored", F.length("text")
        )

    df = spark.createDataFrame(
        [("log", "abc"), ("raw", "xyz")], "kind string, text string"
    )
    out = apply_chain(
        df,
        [When(condition={"equals": {"kind": "log"}}, then=Script(fn=fn))],
    ).collect()
    rows = {r["kind"]: r for r in out}
    assert rows["log"]["text"] == "ABC" and rows["log"]["scored"] == 3
    assert rows["raw"]["text"] == "xyz" and rows["raw"]["scored"] is None


def test_guarded_broadcast_lookup_enriches_only_matching(spark):
    from beats_spark.operators.enrich import BroadcastLookup

    dim = spark.createDataFrame(
        [("h1", "us-east")], "host string, region string"
    )
    df = spark.createDataFrame(
        [("log", "h1"), ("raw", "h1")], "kind string, host string"
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=BroadcastLookup(dim=dim, on=["host"]),
            )
        ],
    ).collect()
    rows = {r["kind"]: r for r in out}
    assert rows["log"]["region"] == "us-east"
    assert rows["raw"]["region"] is None  # dim hit suppressed by guard


def test_guarded_dns_replace_and_append(spark):
    from beats_spark.operators.enrich import DnsEnrich

    df = spark.createDataFrame(
        [("log", "db.internal"), ("raw", "db.internal")],
        "kind string, server string",
    )
    app = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=DnsEnrich(field="server", action="append"),
            )
        ],
    ).collect()
    rows = {r["kind"]: r for r in app}
    assert rows["log"]["dns_resolved"].startswith("10.")
    assert rows["raw"]["dns_resolved"] is None

    rep = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=DnsEnrich(field="server", action="replace"),
            )
        ],
    ).collect()
    rows = {r["kind"]: r for r in rep}
    assert rows["log"]["server"].startswith("10.")
    assert rows["raw"]["server"] == "db.internal"


def test_guarded_asof_lookup(spark):
    from beats_spark.operators.enrich import AsofLookup

    dim = spark.createDataFrame(
        [("h1", 10, "v1"), ("h1", 20, "v2")],
        "host string, version_ts long, cfg string",
    )
    df = spark.createDataFrame(
        [("log", "h1", 15), ("raw", "h1", 25)],
        "kind string, host string, ts long",
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=AsofLookup(dim=dim, on=["host"]),
            )
        ],
    ).collect()
    rows = {r["kind"]: r for r in out}
    assert rows["log"]["cfg"] == "v1"   # as-of ts=15 → version 10
    assert rows["raw"]["cfg"] is None   # guarded out (would be v2)


def test_guarded_user_agent_and_geoip(spark):
    from beats_spark.operators.enrich import (
        GeoIPEnrich,
        UserAgentEnrich,
        dim_geoip,
        dim_user_agents,
    )

    df = spark.createDataFrame(
        [("log", "curl/8.4.0", "8.8.8.8"), ("raw", "curl/8.4.0", "8.8.8.8")],
        "kind string, user_agent string, ip string",
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=UserAgentEnrich(dim=dim_user_agents(df.sparkSession)),
            ),
            When(
                condition={"equals": {"kind": "log"}},
                then=GeoIPEnrich(dim=dim_geoip(df.sparkSession)),
            ),
        ],
    ).collect()
    rows = {r["kind"]: r for r in out}
    assert rows["log"]["user_agent.name"] == "curl"
    assert rows["raw"]["user_agent.name"] is None
    assert rows["log"]["geoip.city"] is not None
    assert rows["raw"]["geoip.city"] is None


def test_guarded_metadata_enrichers(spark):
    from beats_spark.operators.metadata import (
        AddDockerMetadata,
        AddProcessMetadata,
    )

    cid = "a" * 64
    ddim = spark.createDataFrame(
        [(cid, "web", "nginx:1", {"io.k8s": "x"})],
        "id string, name string, image string, labels map<string,string>",
    )
    path = f"/var/lib/docker/containers/{cid}/x.log"
    df = spark.createDataFrame(
        [("log", path, 42), ("raw", path, 42)],
        "kind string, `log.file.path` string, `process.pid` long",
    )
    out = apply_chain(
        df,
        [
            When(
                condition={"equals": {"kind": "log"}},
                then=AddDockerMetadata(dim=ddim),
            ),
            When(
                condition={"equals": {"kind": "log"}},
                then=AddProcessMetadata(
                    dim=spark.createDataFrame(
                        [(42, "svc")], "pid long, name string"
                    ),
                    match_pids=["process.pid"],
                    include_fields=["name"],
                ),
            ),
        ],
    ).collect()
    rows = {r["kind"]: r for r in out}
    assert rows["log"]["container.name"] == "web"
    assert rows["raw"]["container.name"] is None
    assert rows["log"]["process.name"] == "svc"
    assert rows["raw"]["process.name"] is None


def test_community_id_spec_published_vector(spark):
    """community_id_spec reproduces the spec's canonical example
    (corelight/community-id-spec README: 128.232.110.120:34855 →
    66.35.250.204:80/tcp = 1:LQU9qZlK+B5F3KDmev6m5PMibrg=), plus
    direction invariance and the ICMP one-way rule."""
    from beats_spark.operators.actions import CommunityID

    df = spark.createDataFrame(
        [
            (1, "128.232.110.120", 34855, "66.35.250.204", 80, "tcp"),
            # reversed direction must hash identically
            (2, "66.35.250.204", 80, "128.232.110.120", 34855, "tcp"),
            # icmp echo (type 8 ↔ 0 equivalence, two-way)
            (3, "192.168.0.89", 8, "192.168.0.1", 0, "icmp"),
            (4, "192.168.0.1", 0, "192.168.0.89", 8, "icmp"),
        ],
        "i long, source_ip string, source_port long, "
        "dest_ip string, dest_port long, proto string",
    )
    out = {
        r["i"]: r["community_id"]
        for r in CommunityID(spec=True).apply(df).collect()
    }
    assert out[1] == "1:LQU9qZlK+B5F3KDmev6m5PMibrg="
    assert out[2] == out[1]
    assert out[3] == out[4]
