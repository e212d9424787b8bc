"""include_fields nested-struct projection
(actions/include_fields.go:68-89 — GetValue/Put rebuild)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.actions import IncludeFields, _field_trie


@pytest.fixture(scope="module")
def nested(spark):
    return spark.createDataFrame(
        [(1, ("GET", 7), (200, 42), "drop-me")],
        "event_id long, "
        "req struct<method:string, seq:long>, "
        "resp struct<status:long, uid:long>, "
        "extra string",
    )


class TestTrie:
    def test_paths(self):
        assert _field_trie(["a.b.c", "a.b.d", "x"]) == {
            "a": {"b": {"c": {}, "d": {}}},
            "x": {},
        }

    def test_broader_spec_subsumes(self):
        assert _field_trie(["a.b", "a"]) == {"a": {}}
        assert _field_trie(["a", "a.b"]) == {"a": {}}


class TestNestedProjection:
    def test_subfield_whitelist(self, spark, nested):
        out = IncludeFields(
            fields=["req.method", "resp.status"], always_keep=("event_id",)
        ).apply(nested)
        assert out.schema.simpleString() == (
            "struct<event_id:bigint,req:struct<method:string>,"
            "resp:struct<status:bigint>>"
        )
        r = out.first()
        assert r["req"]["method"] == "GET"
        assert r["resp"]["status"] == 200

    def test_whole_struct_keep(self, spark, nested):
        out = IncludeFields(
            fields=["req"], always_keep=("event_id",)
        ).apply(nested)
        assert out.columns == ["event_id", "req"]
        assert out.first()["req"]["seq"] == 7

    def test_missing_subfield_nonfatal(self, spark, nested):
        # ErrKeyNotFound is ignored by the reference; a struct whose
        # every listed subfield is missing disappears entirely
        out = IncludeFields(
            fields=["req.method", "req.nope", "resp.nothere"],
            always_keep=("event_id",),
        ).apply(nested)
        assert out.schema.simpleString() == (
            "struct<event_id:bigint,req:struct<method:string>>"
        )

    def test_path_through_scalar_skipped(self, spark, nested):
        out = IncludeFields(
            fields=["extra.sub"], always_keep=("event_id",)
        ).apply(nested)
        assert out.columns == ["event_id"]

    def test_flat_dotted_column_wins(self, spark):
        # the @metadata.* convention: a literal flat column named a.b
        # is kept verbatim, not treated as a path
        df = spark.createDataFrame([(1,)], "event_id long").withColumn(
            "@metadata.pipeline", F.lit("p")
        )
        out = IncludeFields(
            fields=["@metadata.pipeline"], always_keep=("event_id",)
        ).apply(df)
        assert out.columns == ["event_id", "@metadata.pipeline"]
