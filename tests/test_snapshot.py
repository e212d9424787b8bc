"""Snapshot diff (operators/snapshot.py): hand-derived statuses,
NULL-text semantics, DuckDB twin parity, and the bucketed-join plan
(zero exchanges when both snapshots are bucket-written on the id)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestHandDerived:
    @pytest.fixture(scope="class")
    def diff(self, spark):
        from beats_spark.operators.snapshot import snapshot_diff

        old = _df(spark, [(1, "a"), (2, "b"), (3, "c"), (5, None)])
        new = _df(spark, [(2, "b"), (3, "C"), (4, "d"), (5, None)])
        return {
            r["doc_id"]: r["status"]
            for r in snapshot_diff(old, new).collect()
        }

    def test_statuses(self, diff):
        # 1 removed, 2 unchanged (dropped), 3 changed, 4 added,
        # 5 NULL==NULL -> unchanged (dropped)
        assert diff == {1: "removed", 3: "changed", 4: "added"}

    def test_null_to_text_is_changed(self, spark):
        from beats_spark.operators.snapshot import snapshot_diff

        old = _df(spark, [(1, None)])
        new = _df(spark, [(1, "now has text")])
        rows = snapshot_diff(old, new).collect()
        assert [(r["doc_id"], r["status"]) for r in rows] == [(1, "changed")]

    def test_keep_unchanged(self, spark):
        from beats_spark.operators.snapshot import snapshot_diff

        old = _df(spark, [(1, "a")])
        new = _df(spark, [(1, "a")])
        rows = snapshot_diff(old, new, keep_unchanged=True).collect()
        assert [(r["doc_id"], r["status"]) for r in rows] == [
            (1, "unchanged")
        ]


class TestParityAndCounts:
    def test_corpus_duckdb_parity(self, spark):
        from beats_spark.operators.snapshot import (
            snapshot_diff,
            snapshot_diff_counts,
            snapshot_diff_sql,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        old = docs.where("doc_id % 5 <> 0")
        new = docs.where("doc_id % 5 = 0")
        d = snapshot_diff(old, new)
        got = sorted((r["doc_id"], r["status"]) for r in d.collect())

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"parquet_scan('{SF_DIR}/documents.parquet')"
        )
        want = sorted(
            con.execute(
                snapshot_diff_sql(
                    "SELECT * FROM documents WHERE doc_id % 5 <> 0",
                    "SELECT * FROM documents WHERE doc_id % 5 = 0",
                )
            ).fetchall()
        )
        assert got == want

        counts = {
            r["status"]: r["n"]
            for r in snapshot_diff_counts(d).collect()
        }
        assert counts.get("added", 0) + counts.get("removed", 0) == len(got)


class TestBucketedPlan:
    def test_zero_exchange_on_bucketed_snapshots(self, spark, tmp_path):
        """Both snapshots bucket-written on the id: the diff's
        full-outer join runs with ZERO Exchange (the write_bucketed
        co-location contract — pay the shuffle once at write time,
        every later diff/join rides it)."""
        from beats_spark.operators.snapshot import snapshot_diff
        from beats_spark.sources.tables import write_bucketed

        docs = spark.range(2000).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("t"), F.col("id")).alias("text"),
        )
        a = f"snap_a_{tmp_path.name}".replace("-", "_")
        b = f"snap_b_{tmp_path.name}".replace("-", "_")
        write_bucketed(
            docs.where("doc_id % 2 = 0"), a, str(tmp_path / "a"),
            ["doc_id"], n_buckets=4,
        )
        write_bucketed(
            docs.where("doc_id % 3 = 0"), b, str(tmp_path / "b"),
            ["doc_id"], n_buckets=4,
        )
        try:
            old, new = spark.table(a), spark.table(b)
            prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
            try:
                d = snapshot_diff(old, new)
                plan = d._jdf.queryExecution().executedPlan().toString()
                assert "Exchange" not in plan
                assert d.count() > 0
            finally:
                spark.conf.set(
                    "spark.sql.autoBroadcastJoinThreshold", prev
                )
        finally:
            spark.sql(f"DROP TABLE IF EXISTS {a}")
            spark.sql(f"DROP TABLE IF EXISTS {b}")


class TestSentenceStats:
    """Sentence-granularity dedup (dedup.sentence_stats — the CCNet
    unit) riding the driver-checked paragraph machinery."""

    def test_hand_case(self, spark):
        from beats_spark.operators.dedup import sentence_stats

        # the splitter consumes terminal punctuation + following
        # whitespace, so a TRAILING sentence keeps its '.' while a
        # non-terminal copy loses it — the shared sentence sits
        # non-terminally in both docs
        df = _df(
            spark,
            [
                (1, "Shared sentence. The cat sat. Unique one."),
                (2, "Shared sentence. A different tail. More."),
            ],
        )
        rows = {
            r["doc_id"]: (r["n_paras"], r["n_dup_paras"])
            for r in sentence_stats(df).collect()
        }
        assert rows[1] == (3, 1)
        assert rows[2] == (3, 1)

    def test_duckdb_parity_on_corpus(self, spark):
        from beats_spark.operators.dedup import (
            sentence_stats,
            sentence_stats_sql,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        got = sorted(tuple(r) for r in sentence_stats(docs).collect())
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"parquet_scan('{SF_DIR}/documents.parquet')"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(sentence_stats_sql("documents")).fetchall()
        )
        assert got == want

    def test_paragraph_default_unchanged(self, spark):
        """The split_re generalization must not move the paragraph
        default: same output as before on a newline-separated doc."""
        from beats_spark.operators.dedup import paragraph_stats

        df = _df(spark, [(1, "a\nb\na"), (2, "a\nc")])
        rows = {
            r["doc_id"]: (r["n_paras"], r["n_dup_paras"])
            for r in paragraph_stats(df).collect()
        }
        assert rows == {1: (3, 2), 2: (2, 1)}


class TestContainment:
    """Asymmetric containment pairs (dedup.containment_pairs)."""

    def test_embedded_doc_found_where_jaccard_misses(self, spark):
        from beats_spark.operators.dedup import (
            containment_pairs,
            ngram_jaccard_pairs,
        )

        short = "alpha beta gamma delta epsilon zeta"
        long = (
            "intro words here " + short + " and then a very long tail "
            + " ".join(f"filler{i}" for i in range(60))
        )
        df = _df(spark, [(1, short), (2, long), (3, "unrelated words only")])
        pairs = {
            (r["id_a"], r["id_b"]): (
                r["containment_ab"], r["containment_ba"]
            )
            for r in containment_pairs(df, threshold=0.8).collect()
        }
        assert (1, 2) in pairs
        c_ab, c_ba = pairs[(1, 2)]
        assert c_ab >= 0.8          # the short side is fully contained
        assert c_ba < 0.5           # the long side is mostly NOT
        # symmetric Jaccard at the same threshold finds nothing
        assert ngram_jaccard_pairs(df, threshold=0.8).count() == 0

    def test_duckdb_parity_on_corpus(self, spark):
        import duckdb
        from beats_spark.operators.dedup import (
            containment_pairs,
            containment_pairs_sql,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        got = sorted(
            tuple(r) for r in containment_pairs(docs, threshold=0.3).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"parquet_scan('{SF_DIR}/documents.parquet')"
        )
        want = sorted(
            tuple(r)
            for r in con.execute(
                containment_pairs_sql("documents", 0.3)
            ).fetchall()
        )
        assert got == want
        assert len(got) > 0  # the overlapping-window corpus has pairs

    def test_jaccard_machinery_regression(self, spark):
        """The _ranked_toks refactor must not move the Jaccard path."""
        from beats_spark.operators.dedup import ngram_jaccard_pairs

        df = _df(
            spark,
            [(1, "w1 w2 w3 w4 w5 w6"), (2, "w1 w2 w3 w4 w5 w6"),
             (3, "x1 x2 x3 x4 x5 x6")],
        )
        rows = ngram_jaccard_pairs(df, threshold=0.9).collect()
        assert [(r["id_a"], r["id_b"], r["jaccard"]) for r in rows] == [
            (1, 2, 1.0)
        ]
