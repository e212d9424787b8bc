"""jobs/index_job.py — retrieval-index build + batch search.

The index table, meta table, and search results are re-checked with
DuckDB (independent reader), and the hybrid result must equal the
direct operator composition exactly.
"""

from __future__ import annotations

import json

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def job_out(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("index_job"))
    from jobs.index_job import main

    rc = main(
        [
            "--embeddings", f"{SF_DIR}/embeddings.parquet",
            "--documents", f"{SF_DIR}/documents.parquet",
            "--output", out,
            "--cells", "4", "--m", "2", "--ks", "4", "--iters", "1",
            "--query-ids", "0,1,2",
            "--terms", "0:spark+join,1:sort+window,2:merge",
            "--k", "5", "--rerank", "10",
        ]
    )
    assert rc == 0
    return out


class TestIndexJob:
    def test_index_covers_corpus_with_valid_cells_and_codes(
        self, spark, job_out
    ):
        con = duckdb.connect()
        n_embs = con.execute(
            f"SELECT count(*) FROM parquet_scan('{SF_DIR}/embeddings.parquet')"
        ).fetchone()[0]
        row = con.execute(
            f"""
            SELECT count(*), count(DISTINCT vec_id),
                   min(cell), max(cell),
                   min(list_min(codes)), max(list_max(codes)),
                   min(len(codes)), max(len(codes))
            FROM parquet_scan('{job_out}/index/*/*.parquet',
                              hive_partitioning=1)
            """
        ).fetchone()
        n, nd, cmin, cmax, comin, comax, lmin, lmax = row
        assert n == nd == n_embs
        # k-means cells/codes are numbered 1..k (lowest-id seeds)
        assert 1 <= cmin and cmax <= 4
        assert 1 <= comin and comax <= 4
        assert lmin == lmax == 2  # m codes per vector

    def test_meta_table_is_loadable_codebook(self, job_out):
        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT book, count(*), min(len(centroid)), max(len(centroid))
            FROM parquet_scan('{job_out}/meta/*.parquet')
            GROUP BY book ORDER BY book
            """
        ).fetchall()
        assert [r[0] for r in rows] == [0, 1]  # m=2 books
        for _, n_cents, dmin, dmax in rows:
            assert n_cents <= 4  # ks (empty cells may collapse)
            assert dmin == dmax  # consistent subspace dim

    def test_hybrid_results_match_direct_operators(self, spark, job_out):
        from beats_spark.operators.hybrid import hybrid_rrf_topk

        embs = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        terms = {0: ["spark", "join"], 1: ["sort", "window"], 2: ["merge"]}
        want = sorted(
            (r["q_id"], r["neighbor_id"], r["score"], r["rank"])
            for r in hybrid_rrf_topk(
                embs, docs, [0, 1, 2], terms, k=5
            ).collect()
        )
        con = duckdb.connect()
        got = sorted(
            tuple(r)
            for r in con.execute(
                f"SELECT q_id, neighbor_id, score, rank FROM "
                f"parquet_scan('{job_out}/results/hybrid/*.parquet')"
            ).fetchall()
        )
        assert got == want
        assert len(got) == 15  # 3 queries x k=5

    def test_ann_results_have_rerank_contract(self, job_out):
        con = duckdb.connect()
        rows = con.execute(
            f"""
            SELECT q_id, count(*), max(rank)
            FROM parquet_scan('{job_out}/results/ann/*.parquet')
            GROUP BY q_id ORDER BY q_id
            """
        ).fetchall()
        assert [r[0] for r in rows] == [0, 1, 2]
        for _, n, rmax in rows:
            assert n <= 5 and rmax <= 5
