"""network condition (conditions/network.go) + new action processors
(add_labels, community_id)."""

from __future__ import annotations

import base64
import hashlib

import pytest
from pyspark.sql import functions as F

from beats_spark.functions.conditions import ConditionError, compile_condition
from beats_spark.operators.actions import AddLabels, CommunityID, apply_chain


def _matches(spark, ips: list[str | None], cond) -> list[bool]:
    df = spark.createDataFrame([(ip,) for ip in ips], "ip string")
    col = compile_condition(cond)
    return [r["m"] for r in df.select(col.alias("m")).collect()]


class TestNetworkCondition:
    def test_cidr_containment(self, spark):
        got = _matches(
            spark,
            ["10.1.2.3", "10.255.255.255", "11.0.0.0", "9.255.255.255"],
            {"network": {"ip": "10.0.0.0/8"}},
        )
        assert got == [True, True, False, False]

    def test_named_private(self, spark):
        got = _matches(
            spark,
            ["10.0.0.1", "172.16.0.1", "172.32.0.1", "192.168.9.9", "8.8.8.8"],
            {"network": {"ip": "private"}},
        )
        assert got == [True, True, False, True, False]

    def test_loopback_and_list(self, spark):
        got = _matches(
            spark,
            ["127.0.0.1", "128.0.0.1"],
            {"network": {"ip": ["loopback", "192.0.2.0/24"]}},
        )
        assert got == [True, False]

    def test_exact_host_slash32(self, spark):
        got = _matches(
            spark, ["1.2.3.4", "1.2.3.5"], {"network": {"ip": "1.2.3.4/32"}}
        )
        assert got == [True, False]

    def test_garbage_and_null_are_false(self, spark):
        # missing/invalid field evaluates false (reference leaf semantics)
        got = _matches(
            spark,
            [None, "not-an-ip", "300.1.2.3", "1.2.3"],
            {"network": {"ip": "0.0.0.0/0"}},
        )
        assert got == [False, False, False, False]

    def test_not_of_missing_is_true(self, spark):
        got = _matches(
            spark, [None, "10.0.0.1"], {"not": {"network": {"ip": "10.0.0.0/8"}}}
        )
        assert got == [True, False]

    def test_bad_cidr_raises(self):
        with pytest.raises(ConditionError):
            compile_condition({"network": {"ip": "10.0.0.0/40"}})
        with pytest.raises(ConditionError):
            compile_condition({"network": {"ip": "10.0.0/8"}})
        with pytest.raises(ConditionError, match="at least one range"):
            compile_condition({"network": {"ip": []}})


class TestAddLabels:
    def test_flattens_nested(self, spark):
        df = spark.createDataFrame([("a",)], "x string")
        out = apply_chain(
            df, [AddLabels(labels={"env": "prod", "k8s": {"pod": {"name": "p1"}}})]
        )
        row = out.collect()[0]
        assert row["labels.env"] == "prod"
        assert row["labels.k8s.pod.name"] == "p1"

    def test_flattens_arrays_to_indexed_keys(self, spark):
        # add_labels.go flattens list values to labels.k.0 / labels.k.1
        df = spark.createDataFrame([("a",)], "x string")
        row = apply_chain(
            df, [AddLabels(labels={"zones": ["eu", "us"]})]
        ).collect()[0]
        assert row["labels.zones.0"] == "eu"
        assert row["labels.zones.1"] == "us"


class TestCommunityID:
    def test_direction_normalized(self, spark):
        df = spark.createDataFrame(
            [
                ("10.0.0.1", 1000, "10.0.0.2", 443, 6),
                ("10.0.0.2", 443, "10.0.0.1", 1000, 6),  # reverse direction
                ("10.0.0.1", 1000, "10.0.0.3", 443, 6),  # different flow
            ],
            "source_ip string, source_port long, dest_ip string, dest_port long, proto int",
        )
        out = apply_chain(df, [CommunityID()]).select("community_id").collect()
        assert out[0][0] == out[1][0]
        assert out[0][0] != out[2][0]
        assert out[0][0].startswith("1:")

    def test_matches_python_hash(self, spark):
        df = spark.createDataFrame(
            [("10.0.0.1", 1000, "10.0.0.2", 443, 6)],
            "source_ip string, source_port long, dest_ip string, dest_port long, proto int",
        )
        got = apply_chain(df, [CommunityID()]).collect()[0]["community_id"]
        canon = "0:10.0.0.1:10.0.0.2:1000:443:6"
        want = "1:" + base64.b64encode(
            hashlib.sha1(canon.encode()).digest()
        ).decode()
        assert got == want


class TestNetworkConditionIPv6:
    """r5: the reference's network condition is dual-stack
    (conditions/network.go ParseIP + net.IP predicates) — parity
    table checked against Python's ipaddress module, which implements
    the same RFCs Go's net package does."""

    CASES = [
        # (ip, range, expected)
        ("fe80::fada:cff:fedc:87f1", "link_local_unicast", True),
        ("fe80::1", "fe80::/10", True),
        ("2001:db8::1", "link_local_unicast", False),
        ("::1", "loopback", True),
        ("::1", "private", False),
        ("fd12:3456::1", "private", True),
        ("fc00::1", "private", False),  # reference masks fd00::/8 ONLY
        ("ff02::1", "multicast", True),
        ("ff02::1", "link_local_multicast", True),
        ("ff71::1", "interface_local_multicast", True),
        ("ff02::1", "interface_local_multicast", False),
        ("::", "unspecified", True),
        ("2001:db8::8a2e:370:7334", "2001:db8::/32", True),
        ("2001:db9::1", "2001:db8::/32", False),
        # odd prefix length (not nibble-aligned)
        ("fe80::1", "fe80::/9", True),
        ("fec0::1", "fe80::/9", True),   # second nibble e=1110, /9 keeps top bit
        ("fd00::1", "fe80::/9", False),
        # v4-mapped text form
        ("::ffff:192.168.1.5", "::ffff:192.168.0.0/112", True),
        # composites: dual-stack
        ("2001:db8::1", "public", True),
        ("fd00::5", "public", False),
        ("fe80::1", "public", False),
        ("2001:db8::1", "global_unicast", True),
        ("ff02::9", "global_unicast", False),
        ("8.8.8.8", "public", True),
        ("10.1.2.3", "public", False),
        ("255.255.255.255", "public", False),
        ("8.8.8.8", "global_unicast", True),
        ("224.0.0.5", "global_unicast", False),
        # v4 strings never match v6 ranges and vice versa
        ("10.0.0.1", "fd00::/8", False),
        ("fd00::1", "10.0.0.0/8", False),
    ]

    def test_parity_table(self, spark):
        from beats_spark.functions.conditions import compile_condition

        df = spark.createDataFrame(
            [(i, ip) for i, (ip, _, _) in enumerate(self.CASES)],
            "i long, ip string",
        )
        import collections

        by_range = collections.defaultdict(list)
        for i, (ip, rng, want) in enumerate(self.CASES):
            by_range[rng].append((i, want))
        got = df
        from pyspark.sql import functions as F

        for j, rng in enumerate(by_range):
            got = got.withColumn(
                f"m{j}", compile_condition({"network": {"ip": rng}}, df)
            )
        rows = {r["i"]: r for r in got.collect()}
        for j, (rng, checks) in enumerate(by_range.items()):
            for i, want in checks:
                assert bool(rows[i][f"m{j}"]) == want, (
                    self.CASES[i][0], rng
                )

    def test_ipv6_python_parity_random_sweep(self, spark):
        """Cross-check _ipv6_to_hex + _cidr6_match against the stdlib
        on a deterministic address sweep."""
        import ipaddress

        from pyspark.sql import functions as F
        from beats_spark.functions.conditions import (
            _cidr6_match,
            _ipv6_to_hex,
        )

        addrs = []
        for i in range(200):
            v = ipaddress.IPv6Address(
                (i * 0x9E3779B97F4A7C15_5851F42D4C957F2D) % (1 << 128)
            )
            addrs.append(str(v))
        addrs += ["fe80::", "::", "::1", "2001:db8::ffff:1.2.3.4"]
        df = spark.createDataFrame([(a,) for a in addrs], "ip string")
        nets = ["2000::/3", "fe80::/10", "fd00::/8", "ff00::/8",
                "::/0", "2001:db8::/127"]
        cols = {"hex": _ipv6_to_hex(F.col("ip"))}
        for j, n in enumerate(nets):
            cols[f"n{j}"] = _cidr6_match(_ipv6_to_hex(F.col("ip")), n)
        rows = df.select("ip", *[c.alias(k) for k, c in cols.items()]).collect()
        for r in rows:
            a = ipaddress.IPv6Address(r["ip"])
            assert r["hex"] == format(int(a), "032x"), r["ip"]
            for j, n in enumerate(nets):
                want = a in ipaddress.IPv6Network(n)
                assert bool(r[f"n{j}"]) == want, (r["ip"], n)


class TestIPv6Validation:
    def test_malformed_v6_never_matches(self, spark):
        """Go net.ParseIP rejects these outright — the parser must
        yield NULL (no match), never a silently truncated parse
        (review r5 finding: 'fd00::1::2' used to hex as fd00::1 and
        match `private`)."""
        from pyspark.sql import functions as F
        from beats_spark.functions.conditions import (
            _ipv6_to_hex,
            compile_condition,
        )

        bad = ["fd00::1::2", "12345::", "fd00::12345", "1::2::3",
               ":::", "fd00:1:2:3:4:5:6:7:8"]
        df = spark.createDataFrame([(b,) for b in bad], "ip string")
        rows = df.select(
            "ip",
            _ipv6_to_hex(F.col("ip")).alias("hex"),
            compile_condition({"network": {"ip": "private"}}, df).alias(
                "m"
            ),
        ).collect()
        for r in rows:
            assert r["hex"] is None, r["ip"]
            assert not r["m"], r["ip"]


def test_community_id_v4_mapped_and_malformed(spark):
    """Go's flowhash applies ip.To4() (communityid.go:95): a
    v4-mapped v6 address hashes as its FOUR v4 bytes — identical to
    the dotted-quad spelling; malformed addresses hash to NULL, never
    a wrong value (review r5 finding)."""
    from pyspark.sql import functions as F
    from beats_spark.operators.actions import community_id_spec

    df = spark.createDataFrame(
        [
            (1, "10.0.0.1"),
            (2, "::ffff:10.0.0.1"),
            (3, "1::2::3"),
        ],
        "i long, sip string",
    )
    out = {
        r["i"]: r["cid"]
        for r in df.select(
            "i",
            community_id_spec(
                F.col("sip"), F.lit(1000), F.lit("10.0.0.2"),
                F.lit(80), F.lit("tcp"),
            ).alias("cid"),
        ).collect()
    }
    assert out[1] == out[2]
    assert out[1].startswith("1:")
    assert out[3] is None
