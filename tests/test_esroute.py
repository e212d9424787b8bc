"""@metadata routing + ES pipeline/ILM index selection tests
(operators/esroute.py), semantics from
libbeat/outputs/elasticsearch/client.go:445-459 (getPipeline) and
libbeat/idxmgmt/std.go:295-331 (getEventCustomIndex / ILM modes)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.esroute import (
    IlmMode,
    assert_no_metadata,
    meta_col,
    select_index,
    select_pipeline,
    strip_metadata,
)

TS = datetime.datetime(2024, 3, 5, 12, 0, 0)


@pytest.fixture(scope="module")
def ev(spark):
    df = spark.createDataFrame(
        [
            (0, TS, "plain"),
            (1, TS, "with-pipeline"),
            (2, TS, "with-index"),
            (3, TS, "with-alias"),
            (4, TS, "alias-and-index"),
        ],
        "event_id long, ts timestamp, kind string",
    )
    return (
        df.withColumn(
            meta_col("pipeline"),
            F.when(F.col("kind") == "with-pipeline", F.lit("custom-pipe")),
        )
        .withColumn(
            meta_col("index"),
            F.when(
                F.col("kind").isin("with-index", "alias-and-index"),
                F.lit("myidx"),
            ),
        )
        .withColumn(
            meta_col("alias"),
            F.when(
                F.col("kind").isin("with-alias", "alias-and-index"),
                F.lit("myalias"),
            ),
        )
    )


class TestPipeline:
    def test_meta_wins_over_configured(self, spark, ev):
        got = {
            r["kind"]: r["p"]
            for r in ev.select(
                "kind", select_pipeline(ev, F.lit("conf-pipe")).alias("p")
            ).collect()
        }
        assert got["with-pipeline"] == "custom-pipe"
        assert got["plain"] == "conf-pipe"

    def test_no_selector_means_null(self, spark, ev):
        got = {
            r["kind"]: r["p"]
            for r in ev.select(
                "kind", select_pipeline(ev).alias("p")
            ).collect()
        }
        assert got["with-pipeline"] == "custom-pipe"
        assert got["plain"] is None

    def test_df_without_meta_columns(self, spark):
        df = spark.createDataFrame([(1,)], "a long")
        assert df.select(
            select_pipeline(df, F.lit("conf")).alias("p")
        ).first()["p"] == "conf"


class TestIndex:
    def kinds(self, ev, **kw):
        return {
            r["kind"]: r["i"]
            for r in ev.select(
                "kind",
                select_index(ev, configured=F.lit("conf-idx"), **kw).alias("i"),
            ).collect()
        }

    def test_custom_meta_ladder(self, spark, ev):
        got = self.kinds(ev)
        # alias verbatim; index dated with the EVENT timestamp (std.go:322-328)
        assert got["with-alias"] == "myalias"
        assert got["alias-and-index"] == "myalias"  # alias beats index
        assert got["with-index"] == "myidx-2024.03.05"
        assert got["plain"] == "conf-idx"

    def test_ilm_enabled_forces_alias(self, spark, ev):
        got = self.kinds(ev, ilm_mode=IlmMode.ENABLED, ilm_alias="roll")
        assert got["plain"] == "roll"
        assert got["with-alias"] == "myalias"  # custom meta still wins

    def test_ilm_auto_uses_runtime_flag(self, spark, ev):
        on = self.kinds(
            ev, ilm_mode=IlmMode.AUTO, ilm_alias="roll", ilm_active=True
        )
        off = self.kinds(
            ev, ilm_mode=IlmMode.AUTO, ilm_alias="roll", ilm_active=False
        )
        assert on["plain"] == "roll"
        assert off["plain"] == "conf-idx"

    def test_ilm_requires_alias(self, spark, ev):
        with pytest.raises(ValueError):
            self.kinds(ev, ilm_mode=IlmMode.ENABLED)


class TestStrip:
    def test_strip_and_assert(self, spark, ev):
        stripped = strip_metadata(ev)
        assert [c for c in stripped.columns if c.startswith("@metadata.")] == []
        assert_no_metadata(stripped)  # no raise
        with pytest.raises(ValueError):
            assert_no_metadata(ev)
        # payload rows intact
        assert stripped.count() == ev.count()
