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
