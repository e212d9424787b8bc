"""Flat dotted field names (the flat-key document model: enricher
outputs like `container.name`, ECS names like `source.ip`) must work
through every processor that compiles a user-supplied field name —
bare F.col would read them as struct paths and fail to resolve.
See actions._fcol / conditions._field / fmtstr(df=...)."""

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.actions import (
    CommunityID,
    CopyFields,
    DecodeJsonFields,
    ExtractField,
    TruncateFields,
)


@pytest.fixture()
def dotted_df(spark):
    return spark.createDataFrame(
        [(0, "alpha beta", '{"a":"1"}', "10.0.0.2", "10.0.0.1", 10, 20, 6)],
        "id int, `container.name` string, `event.original` string, "
        "`source.ip` string, `destination.ip` string, "
        "`source.port` int, `destination.port` int, `network.iana_number` int",
    )


def test_truncate_on_dotted_field(spark, dotted_df):
    out = TruncateFields(fields=["container.name"], max_characters=5).apply(dotted_df)
    r = out.collect()[0].asDict()
    assert r["container.name"] == "alpha"
    assert "truncated" in (r.get("log_flags") or [])


def test_copy_from_dotted_source(spark, dotted_df):
    out = CopyFields(fields=[{"from": "container.name", "to": "copied"}]).apply(dotted_df)
    assert out.collect()[0]["copied"] == "alpha beta"


def test_extract_field_dotted_source(spark, dotted_df):
    out = ExtractField(
        field="container.name", separator=" ", index=1, target="tok"
    ).apply(dotted_df)
    assert out.collect()[0]["tok"] == "beta"


def test_decode_json_dotted_source(spark, dotted_df):
    out = DecodeJsonFields(fields=["event.original"], target="decoded").apply(dotted_df)
    assert out.collect()[0]["decoded"] == {"a": "1"}


def test_community_id_over_ecs_dotted_tuple(spark, dotted_df):
    out = CommunityID(
        src_ip="source.ip",
        src_port="source.port",
        dst_ip="destination.ip",
        dst_port="destination.port",
        proto="network.iana_number",
        hash_fn="md5",
    ).apply(dotted_df)
    cid = out.collect()[0]["community_id"]
    assert cid.startswith("1:") and len(cid) > 10


def test_guarded_write_to_dotted_target(spark, dotted_df):
    # guard branch reads the OLD dotted column — bare F.col would fail
    out = TruncateFields(fields=["container.name"], max_characters=5).apply(
        dotted_df, guard=F.col("id") == 999
    )
    assert out.collect()[0]["container.name"] == "alpha beta"  # untouched
