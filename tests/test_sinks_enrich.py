"""Codecs/sinks (§2.7), dns enrich, truncate flag."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.actions import TruncateFields, apply_chain
from beats_spark.operators.codecs import (
    codec_format,
    codec_json,
    console_lines,
    write_ndjson,
)
from beats_spark.operators.enrich import DnsEnrich


class TestCodecs:
    def test_json_codec_roundtrip(self, spark, tmp_path):
        df = spark.createDataFrame(
            [("c1", 0, "hello")], "conv_id string, turn_idx int, text string"
        )
        out = str(tmp_path / "nd")
        write_ndjson(df, out)
        lines = [
            json.loads(r["value"])
            for r in spark.read.text(out).collect()
        ]
        assert lines == [{"conv_id": "c1", "turn_idx": 0, "text": "hello"}]

    def test_format_codec(self, spark):
        df = spark.createDataFrame(
            [("c1", "user")], "conv_id string, role string"
        ).withColumn("ts", F.to_timestamp(F.lit("2024-01-02 03:04:05")))
        line = df.select(
            codec_format("%{[role]}@%{[conv_id]}-%{+yyyy.MM.dd}").alias("l")
        ).collect()[0]["l"]
        assert line == "user@c1-2024.01.02"

    def test_console_lines(self, spark):
        df = spark.createDataFrame([("a",), ("b",)], "x string")
        lines = console_lines(df)
        assert sorted(lines) == ['{"x":"a"}', '{"x":"b"}']


class TestDnsEnrich:
    def test_append_deterministic(self, spark):
        df = spark.createDataFrame(
            [("host-a",), ("host-b",), ("host-a",), (None,)], "host string"
        )
        out = DnsEnrich(field="host").apply(df).collect()
        by_host = {}
        for r in out:
            by_host.setdefault(r["host"], set()).add(r["dns_resolved"])
        # same name always resolves identically; nulls stay unresolved
        assert len(by_host["host-a"]) == 1
        assert by_host["host-a"] != by_host["host-b"]
        assert by_host[None] == {None}
        assert next(iter(by_host["host-a"])).startswith("10.")

    def test_replace_action(self, spark):
        df = spark.createDataFrame([("host-a",)], "host string")
        out = DnsEnrich(field="host", action="replace").apply(df)
        assert out.columns == ["host"]
        assert out.collect()[0]["host"].startswith("10.")

    def test_custom_resolver(self, spark):
        df = spark.createDataFrame([("a",), ("b",)], "host string")
        out = DnsEnrich(
            field="host", resolver=lambda names: [f"ip-{n}" for n in names]
        ).apply(df).collect()
        assert {r["host"]: r["dns_resolved"] for r in out} == {
            "a": "ip-a",
            "b": "ip-b",
        }


class TestDecodeJsonErrorKey:
    def test_tags_only_decode_failures(self, spark):
        from beats_spark.operators.actions import DecodeJsonFields

        df = spark.createDataFrame(
            [('{"a":"1"}',), ("not json",), (None,)], "props string"
        )
        out = apply_chain(
            df, [DecodeJsonFields(fields=["props"], add_error_key=True)]
        ).collect()
        rows = {r["props"]: (r["props_json"], r["log_flags"]) for r in out}
        assert rows['{"a":"1"}'] == ({"a": "1"}, [])
        assert rows["not json"] == (None, ["json_decode_error"])
        assert rows[None] == (None, [])  # null input is not an error

    def test_json_null_literal_is_not_an_error(self, spark):
        # 'null' is a LEGAL JSON document that decodes to NULL — it
        # must not be tagged (readjson only tags actual parse errors)
        from beats_spark.operators.actions import DecodeJsonFields

        df = spark.createDataFrame(
            [("null",), ("  null ",), ("null\n",), ("\tnull",),
             ("null garbage",)],
            "props string",
        )
        out = apply_chain(
            df, [DecodeJsonFields(fields=["props"], add_error_key=True)]
        ).collect()
        rows = {r["props"]: r["log_flags"] for r in out}
        assert rows["null"] == []
        assert rows["  null "] == []  # space padding
        assert rows["null\n"] == []  # JSON whitespace incl. newline
        assert rows["\tnull"] == []  # and tab
        assert rows["null garbage"] == ["json_decode_error"]

    def test_target_equals_source_rejected(self, spark):
        from beats_spark.operators.actions import DecodeJsonFields

        df = spark.createDataFrame([("{}",)], "props string")
        with pytest.raises(ValueError, match="target == source"):
            DecodeJsonFields(fields=["props"], target="props").apply(df)


class TestTruncateFlag:
    def test_flag_only_when_truncated(self, spark):
        df = spark.createDataFrame(
            [("longer than ten",), ("short",)], "text string"
        )
        out = apply_chain(df, [TruncateFields(fields=["text"], max_characters=10)])
        rows = {r["text"]: r["log_flags"] for r in out.collect()}
        assert rows["longer tha"] == ["truncated"]
        assert rows["short"] == []
        assert "_trunc_changed" not in out.columns


class TestAsofLookup:
    def _dim(self, spark):
        return spark.createDataFrame(
            [
                ("a", "2024-01-01 00:00:00", 1),
                ("a", "2024-01-10 00:00:00", 2),
                ("b", "2024-01-05 00:00:00", 7),
            ],
            "k string, vts string, rev long",
        ).select(
            "k", F.to_timestamp("vts").alias("version_ts"), "rev"
        )

    def _facts(self, spark):
        return spark.createDataFrame(
            [
                (1, "a", "2024-01-02 12:00:00"),  # after v1, before v2
                (2, "a", "2024-01-10 00:00:00"),  # exactly v2 (<=)
                (3, "a", "2024-01-20 00:00:00"),  # after v2
                (4, "b", "2024-01-01 00:00:00"),  # before b's first -> NULL
                (5, "c", "2024-01-15 00:00:00"),  # no dim key -> NULL
            ],
            "id long, k string, tss string",
        ).select("id", "k", F.to_timestamp("tss").alias("ts"))

    def test_picks_latest_version_at_or_before_ts(self, spark):
        from beats_spark.operators.enrich import AsofLookup

        out = {
            r["id"]: r["rev"]
            for r in AsofLookup(dim=self._dim(spark), on=["k"])
            .apply(self._facts(spark))
            .collect()
        }
        assert out == {1: 1, 2: 2, 3: 2, 4: None, 5: None}

    def test_duckdb_asof_join_parity(self, spark):
        import duckdb

        from beats_spark.operators.enrich import AsofLookup

        got = sorted(
            (r["id"], r["rev"])
            for r in AsofLookup(dim=self._dim(spark), on=["k"])
            .apply(self._facts(spark))
            .collect()
        )
        con = duckdb.connect()
        want = sorted(
            con.execute(
                """
WITH d AS (SELECT * FROM (VALUES
  ('a', TIMESTAMP '2024-01-01 00:00:00', 1),
  ('a', TIMESTAMP '2024-01-10 00:00:00', 2),
  ('b', TIMESTAMP '2024-01-05 00:00:00', 7)) v(k, version_ts, rev)),
f AS (SELECT * FROM (VALUES
  (1, 'a', TIMESTAMP '2024-01-02 12:00:00'),
  (2, 'a', TIMESTAMP '2024-01-10 00:00:00'),
  (3, 'a', TIMESTAMP '2024-01-20 00:00:00'),
  (4, 'b', TIMESTAMP '2024-01-01 00:00:00'),
  (5, 'c', TIMESTAMP '2024-01-15 00:00:00')) v(id, k, ts))
SELECT f.id, d.rev FROM f ASOF LEFT JOIN d
  ON f.k = d.k AND f.ts >= d.version_ts
"""
            ).fetchall()
        )
        assert got == want

    def test_plan_is_broadcast_no_fact_shuffle(self, spark):
        """The fact side must not shuffle: dim history collapses
        pre-broadcast, the pick is map-side Column work."""
        from beats_spark.operators.enrich import AsofLookup

        out = AsofLookup(dim=self._dim(spark), on=["k"]).apply(
            self._facts(spark)
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan
        assert "Python" not in plan

    def test_prefix_and_multi_payload(self, spark):
        from beats_spark.operators.enrich import AsofLookup

        dim = self._dim(spark).withColumn(
            "tag", F.concat(F.lit("r"), F.col("rev"))
        )
        out = (
            AsofLookup(dim=dim, on=["k"], prefix="cfg_")
            .apply(self._facts(spark))
            .where(F.col("id") == 3)
            .collect()[0]
        )
        assert out["cfg_rev"] == 2 and out["cfg_tag"] == "r2"


class TestUARegexTier:
    def test_unseen_ua_resolves_and_engines_agree(self, spark):
        """r4 verdict #6: the exact-string dim is only the cache tier;
        a dim MISS falls through to the bounded uap-core-style regex
        tables — first match wins, both engines share the table."""
        import duckdb
        from pyspark.sql import functions as F
        from beats_spark.operators.enrich import (
            UserAgentEnrich,
            dim_user_agents,
            ua_regex_sql,
        )

        uas = [
            "Mozilla/5.0 (Windows NT 10.0; Win64; x64) Chrome/120.0",
            "UnknownBot/0.1",
            "Mozilla/5.0 (X11; Linux x86_64; rv:109.0) Firefox/115.0",
            "Mozilla/5.0 (Linux; Android 13) Chrome/118.0 Mobile Safari",
            "Wget/1.21.3",
            "customtool/2.0",
            "???",
            None,
        ]
        df = spark.createDataFrame(
            [(i, u) for i, u in enumerate(uas)], "i long, user_agent string"
        )
        out = UserAgentEnrich(
            dim=dim_user_agents(spark), regex_fallback=True
        ).apply(df)
        rows = {r["i"]: r for r in out.collect()}
        # dim hit wins (cache tier)
        assert rows[0]["user_agent.name"] == "Chrome"
        # unseen strings RESOLVE (the r3/r4 semantic gap)
        assert rows[1]["user_agent.name"] == "Spider"
        assert rows[1]["user_agent.device"] == "spider"
        assert rows[2]["user_agent.name"] == "Firefox"
        assert rows[2]["user_agent.os"] == "Linux"
        assert rows[3]["user_agent.name"] == "Chrome Mobile"
        assert rows[3]["user_agent.device"] == "mobile"
        assert rows[4]["user_agent.name"] == "Wget"
        # generic product-token fallback
        assert rows[5]["user_agent.name"] == "customtool"
        # unparseable: family NULL, os/device fall back to Other
        assert rows[6]["user_agent.name"] is None
        assert rows[6]["user_agent.os"] == "Other"
        assert rows[7]["user_agent.name"] is None

        con = duckdb.connect()
        con.register("t", df.toPandas())
        rx = ua_regex_sql("user_agent")
        want = con.execute(
            f"SELECT i, {rx['name']}, {rx['os']}, {rx['device']} "
            "FROM t ORDER BY i"
        ).fetchall()
        # rows 1.. have no dim hit: regex result must match per engine
        for i, n, o, d in want:
            if i == 0:
                continue
            assert rows[i]["user_agent.name"] == n, i
            assert rows[i]["user_agent.os"] == o, i
            assert rows[i]["user_agent.device"] == d, i

    def test_first_match_priority_order(self, spark):
        """Chrome UAs also contain 'Safari/' — table order must give
        Chrome (uap-core first-match semantics)."""
        from beats_spark.operators.enrich import ua_regex_columns
        from pyspark.sql import functions as F

        df = spark.createDataFrame(
            [("Mozilla/5.0 Chrome/120.0 Safari/537.36",),
             ("Mozilla/5.0 Version/16.5 Safari/605.1",)],
            "ua string",
        )
        cols = ua_regex_columns(F.col("ua"))
        got = [r["n"] for r in df.select(cols["name"].alias("n")).collect()]
        assert got == ["Chrome", "Safari"]


class TestGeoIPv6:
    def test_dual_stack_longest_prefix(self, spark):
        """r5: the geoip enrich matches IPv6 CIDRs through the same
        bounded per-prefix-length equi-join strategy (GeoLite2 is
        dual-stack); longest prefix wins within each family and the
        fact side still never shuffles."""
        from beats_spark.operators.enrich import GeoIPEnrich

        dim = spark.createDataFrame(
            [
                ("8.8.8.0/24", "US", "MountainView"),
                ("8.0.0.0/8", "US", "Level3"),
                ("2001:db8::/32", "EU", "DocNet"),
                ("2001:db8:aaaa::/48", "DE", "DocSub"),
                ("fd00::/8", "ZZ", "ULA"),
                # non-nibble-aligned prefix
                ("fe80::/10", "LL", "LinkLocal"),
            ],
            "cidr string, country string, city string",
        )
        df = spark.createDataFrame(
            [
                (1, "8.8.8.8"),
                (2, "8.1.2.3"),
                (3, "2001:db8:aaaa::5"),
                (4, "2001:db8:bbbb::5"),
                (5, "fd12::9"),
                (6, "fe80::fada:cff:fedc:87f1"),
                (7, "febf::1"),   # still fe80::/10
                (8, "fec0::1"),   # NOT fe80::/10
                (9, "9.9.9.9"),
                (10, None),
            ],
            "id long, ip string",
        )
        out = {
            r["id"]: (r["geoip.country"], r["geoip.city"])
            for r in GeoIPEnrich(dim=dim).apply(df).collect()
        }
        assert out[1] == ("US", "MountainView")   # /24 beats /8
        assert out[2] == ("US", "Level3")
        assert out[3] == ("DE", "DocSub")         # /48 beats /32
        assert out[4] == ("EU", "DocNet")
        assert out[5] == ("ZZ", "ULA")
        assert out[6] == ("LL", "LinkLocal")
        assert out[7] == ("LL", "LinkLocal")
        assert out[8] == (None, None)
        assert out[9] == (None, None)
        assert out[10] == (None, None)

        plan = (
            GeoIPEnrich(dim=dim)
            .apply(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert "Exchange hashpartitioning" not in plan  # map-side only
