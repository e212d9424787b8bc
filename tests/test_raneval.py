"""Retrieval eval (operators/raneval.py): hand-computed metric values
and DuckDB twin parity on the corpus LSH-vs-brute evaluation."""

from __future__ import annotations

import duckdb
import pytest

from tests.conftest import SF_DIR


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "q_id long, neighbor_id long, rank int"
    )


class TestHandDerived:
    @pytest.fixture(scope="class")
    def metrics(self, spark):
        from beats_spark.operators.raneval import eval_topk

        # truth for q0: docs 1,2,3 (ranks 1-3). candidates: 2 at rank 1
        # (hit), 9 at rank 2 (miss), 3 at rank 3 (hit).
        truth = _mk(spark, [(0, 1, 1), (0, 2, 2), (0, 3, 3)])
        cand = _mk(spark, [(0, 2, 1), (0, 9, 2), (0, 3, 3)])
        out = eval_topk(truth, cand, k=3).collect()
        return {(r["q_id"], r["metric"]): r for r in out}

    def test_recall(self, metrics):
        # 2 of 3 truth docs retrieved
        assert metrics[(0, "recall")]["micro"] == 666666

    def test_mrr(self, metrics):
        # first relevant at rank 1
        assert metrics[(0, "mrr")]["micro"] == 1_000_000

    def test_ndcg(self, metrics):
        import math

        disc = [round(1e6 / math.log2(r + 1)) for r in (1, 2, 3)]
        dcg = disc[0] + disc[2]          # hits at ranks 1 and 3
        ideal = sum(disc)                # 3 truth docs, k=3
        want = math.floor(dcg * 1e6 / ideal)
        assert metrics[(0, "ndcg")]["micro"] == want

    def test_macro_equals_single_query(self, metrics):
        # one query: macro mean == its value
        for m in ("recall", "mrr", "ndcg"):
            assert metrics[(-1, m)]["micro"] == metrics[(0, m)]["micro"]

    def test_value_renders_micro(self, metrics):
        r = metrics[(0, "recall")]
        assert r["value"] == r["micro"] / 1e6


class TestZeroHitAndPartialTruth:
    def test_no_hits_all_zero(self, spark):
        from beats_spark.operators.raneval import eval_topk

        truth = _mk(spark, [(0, 1, 1), (0, 2, 2)])
        cand = _mk(spark, [(0, 8, 1), (0, 9, 2)])
        out = {
            r["metric"]: r["micro"]
            for r in eval_topk(truth, cand, k=2).where("q_id = 0").collect()
        }
        assert out == {"recall": 0, "mrr": 0, "ndcg": 0}

    def test_short_truth_ideal_clips(self, spark):
        from beats_spark.operators.raneval import eval_topk

        # only ONE truth doc, k=3: perfect retrieval at rank 1 must
        # score ndcg 1.0 (ideal = disc[1], not the 3-row sum)
        truth = _mk(spark, [(0, 5, 1)])
        cand = _mk(spark, [(0, 5, 1), (0, 6, 2), (0, 7, 3)])
        out = {
            r["metric"]: r["micro"]
            for r in eval_topk(truth, cand, k=3).where("q_id = 0").collect()
        }
        assert out["recall"] == 1_000_000
        assert out["ndcg"] == 1_000_000


class TestDuckdbParity:
    def test_corpus_lsh_vs_brute_parity(self, spark):
        from beats_spark.operators.raneval import eval_topk, eval_topk_sql
        from beats_spark.operators.similarity import (
            ann_lsh_topk,
            ann_lsh_topk_sql,
            brute_force_topk,
            brute_force_topk_sql,
        )

        embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        queries = [0, 1, 2]
        truth = brute_force_topk(embs, queries, k=5)
        cand = ann_lsh_topk(embs, queries, k=5)
        got = {
            (r["q_id"], r["metric"]): (r["micro"], r["value"])
            for r in eval_topk(truth, cand, k=5).collect()
        }

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"parquet_scan('{SF_DIR}/embeddings.parquet')"
        )
        sql = eval_topk_sql(
            brute_force_topk_sql("embeddings", queries, 5),
            ann_lsh_topk_sql("embeddings", queries, 5),
            k=5,
        )
        want = {
            (q, m): (micro, value)
            for q, m, micro, value in con.execute(sql).fetchall()
        }
        assert got == want
        # sanity: macro rows present, bounded [0, 1]
        for m in ("recall", "mrr", "ndcg"):
            assert 0 <= got[(-1, m)][0] <= 1_000_000
