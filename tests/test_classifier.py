"""Trained logistic classifier (operators/classifier.py): learnability
(held-out accuracy 1.0 on separable fixtures), repartition invariance
(integer-snapped sums), empty-doc semantics, no Python in the plan,
and direct DuckDB twin parity on an inline table."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from beats_spark.operators.classifier import (
    classifier_scores,
    classifier_scores_sql,
    train_logistic,
)


def _toy_rows(n=300):
    return [
        (
            i,
            (
                "alpha beta gamma spark"
                if i % 3 == 0
                else "delta epsilon zeta row"
            )
            + f" tail{i % 7}",
        )
        for i in range(n)
    ]


class TestLearning:
    def test_toy_marker_reaches_perfect_heldout(self, spark):
        df = spark.createDataFrame(_toy_rows(), "doc_id long, text string")
        r = classifier_scores(
            df, label=F.col("text").contains("spark"), lr=32.0, iters=10
        )
        acc = {
            x["is_train"]: x["acc"]
            for x in r.groupBy("is_train")
            .agg(F.avg(F.col("correct").cast("double")).alias("acc"))
            .collect()
        }
        assert acc[True] == 1.0
        assert acc[False] == 1.0

    def test_driver_fixture_reaches_perfect_heldout(self, spark):
        from beats_spark.entry_dataops import q_quality_classifier

        r = q_quality_classifier(spark, "/root/testdata/sf0.001")
        acc = {
            x["is_train"]: x["acc"]
            for x in r.groupBy("is_train")
            .agg(F.avg(F.col("correct").cast("double")).alias("acc"))
            .collect()
        }
        assert acc[True] == 1.0
        assert acc[False] == 1.0

    def test_scores_are_calibrated_direction(self, spark):
        # positives score above negatives on a separable fixture
        df = spark.createDataFrame(_toy_rows(), "doc_id long, text string")
        r = classifier_scores(
            df, label=F.col("text").contains("spark"), lr=32.0, iters=10
        )
        agg = {
            x["label"]: x["s"]
            for x in r.groupBy("label")
            .agg(F.avg("score").alias("s"))
            .collect()
        }
        assert agg[True] > 0.5 > agg[False]


class TestDeterminism:
    def test_repartition_invariance(self, spark):
        # integer-snapped sums: the trained model is identical no
        # matter how the corpus is partitioned
        df = spark.createDataFrame(_toy_rows(), "doc_id long, text string")
        lab = F.col("text").contains("spark")
        w1, b1 = train_logistic(df, lab, lr=8.0, iters=4)
        w2, b2 = train_logistic(df.repartition(7), lab, lr=8.0, iters=4)
        assert w1 == w2 and b1 == b2

    def test_duckdb_twin_parity_inline(self, spark):
        rows = _toy_rows(120)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = sorted(
            tuple(r)
            for r in classifier_scores(
                df, label=F.col("text").contains("spark"), lr=8.0, iters=4
            ).collect()
        )
        con = duckdb.connect()
        con.register(
            "toy",
            pd.DataFrame(
                {"doc_id": [r[0] for r in rows], "text": [r[1] for r in rows]}
            ),
        )
        sql = classifier_scores_sql(
            "toy", label_expr="text LIKE '%spark%'", lr=8.0, iters=4
        )
        duck = sorted(con.execute(sql).fetchall())
        assert got == duck


class TestSemantics:
    def test_empty_docs_emit_no_row(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, ""), (3, "   ")],
            "doc_id long, text string",
        )
        r = classifier_scores(df, label=F.lit(True), lr=1.0, iters=1)
        assert [x["doc_id"] for x in r.collect()] == [1]

    def test_no_python_in_plan(self, spark):
        df = spark.createDataFrame(_toy_rows(60), "doc_id long, text string")
        plan = (
            classifier_scores(
                df, label=F.col("text").contains("spark"), lr=1.0, iters=1
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Python" not in plan
