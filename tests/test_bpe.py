"""BPE trainer/tokenizer (operators/bpe.py): hand-derived merge
expectations, the train↔apply consistency invariant, lossless decode,
and the plan shape (Python touches only the vocabulary dim; the
corpus side is a broadcast join)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.bpe import (
    EOW,
    _merge_loop,
    encode_word,
    tokenize_documents,
    train_bpe,
    word_counts,
)

SF_DIR = "/root/testdata/sf0.001"


class TestMergeLoop:
    def test_hand_derived_merges(self):
        # corpus "aa aa ab": counts aa:2, ab:1.
        # round 1 pairs: (a,a):2 (a,</w>):2 (a,b):1 (b,</w>):1
        #   → count tie at 2; '<' sorts before 'a', so (a,</w>) wins
        # round 2 pairs: (a,a</w>):2 (a,b):1 (b,</w>):1 → (a,a</w>)
        merges = _merge_loop([("aa", 2), ("ab", 1)], 2)
        assert merges == [("a", EOW), ("a", "a" + EOW)]

    def test_loop_stops_when_exhausted(self):
        # single 1-char word: (a,</w>) is the only possible merge
        merges = _merge_loop([("a", 5)], 10)
        assert merges == [("a", EOW)]

    def test_apply_reproduces_training_segmentation(self):
        # the core BPE invariant: encoding a TRAINING word with the
        # rank-driven apply loop reproduces the segmentation the
        # training loop reached by applying merges in order
        counts = [("lower", 4), ("low", 5), ("lowest", 2), ("newer", 3)]
        merges = _merge_loop(counts, 12)
        ranks = {p: i for i, p in enumerate(merges)}
        for w, _ in counts:
            # independent re-derivation: apply each merge in training
            # order across the symbol sequence
            sym = list(w) + [EOW]
            for a, b in merges:
                out, i = [], 0
                while i < len(sym):
                    if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(sym[i])
                        i += 1
                sym = out
            assert encode_word(w, ranks) == sym, w

    def test_decode_is_lossless(self):
        merges = _merge_loop([("abcabc", 3), ("abc", 2), ("xyz", 1)], 8)
        ranks = {p: i for i, p in enumerate(merges)}
        for w in ["abcabc", "abc", "xyz", "unseen", "a"]:
            assert "".join(encode_word(w, ranks)) == w + EOW, w

    def test_more_merges_never_lengthen(self):
        counts = [("banana", 4), ("bandana", 2)]
        short = {p: i for i, p in enumerate(_merge_loop(counts, 3))}
        long = {p: i for i, p in enumerate(_merge_loop(counts, 10))}
        for w, _ in counts:
            assert len(encode_word(w, long)) <= len(encode_word(w, short))


class TestDistributed:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        return spark.createDataFrame(
            [(1, "aa aa ab"), (2, "Aa ab ab"), (3, "zz")],
            "doc_id long, text string",
        )

    def test_word_counts(self, spark, docs):
        got = {r["word"]: r["n"] for r in word_counts(docs).collect()}
        assert got == {"aa": 3, "ab": 3, "zz": 1}  # lowercased

    def test_train_matches_driver_loop(self, spark, docs):
        assert train_bpe(docs, n_merges=4) == _merge_loop(
            [("aa", 3), ("ab", 3), ("zz", 1)], 4
        )

    def test_max_words_cap_is_deterministic(self, spark, docs):
        # cap 2 keeps (count desc, word asc) → aa, ab; zz never trains
        merges = train_bpe(docs, n_merges=20, max_words=2)
        assert merges == _merge_loop([("aa", 3), ("ab", 3)], 20)

    def test_tokenize_documents_values(self, spark, docs):
        merges = train_bpe(docs, n_merges=2)
        ranks = {p: i for i, p in enumerate(merges)}
        got = {
            r["doc_id"]: (list(r["tokens"]), r["n_tokens"])
            for r in tokenize_documents(docs, merges).collect()
        }
        for doc_id, text in [(1, "aa aa ab"), (2, "aa ab ab"), (3, "zz")]:
            want = [
                t for w in text.split() for t in encode_word(w, ranks)
            ]
            assert got[doc_id] == (want, len(want)), doc_id

    def test_corpus_side_has_no_python(self, spark, docs):
        merges = train_bpe(docs, n_merges=2)
        plan = (
            tokenize_documents(docs, merges)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # exactly one Arrow eval — the vocabulary dim — and the corpus
        # joins it broadcast
        assert plan.count("ArrowEvalPython") == 1
        assert "BroadcastHashJoin" in plan

    def test_real_corpus_roundtrip(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
        merges = train_bpe(docs, n_merges=50)
        ranks = {p: i for i, p in enumerate(merges)}
        toks = tokenize_documents(docs, merges)
        joined = (
            docs.select("doc_id", "text")
            .join(toks, "doc_id")
            .collect()
        )
        assert len(joined) == 200
        for r in joined:
            text = " ".join(r["text"].lower().split())
            decoded = " ".join(
                "".join(r["tokens"]).split(EOW)[:-1]
            )
            assert decoded == text, r["doc_id"]
            assert len(r["tokens"]) == sum(
                len(encode_word(w, ranks)) for w in text.split()
            )


class TestBpeOracle:
    """bpe_tokenize_sql — the DuckDB twin re-derives the TRAINING
    (unrolled merge loop, classifier-GD precedent) and the encoding
    (rank-ordered exhaustive folds); both variants of the driver row
    must match the Spark side value-for-value."""

    def _compare(self, spark, duck_docs, spark_docs, n_merges):
        import duckdb

        from beats_spark.operators.bpe import bpe_tokenize_sql

        con = duckdb.connect()
        con.execute(
            "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
        )
        con.executemany(
            "INSERT INTO documents VALUES (?, ?)", duck_docs
        )
        want = sorted(
            con.sql(
                bpe_tokenize_sql("documents", n_merges=n_merges)
            ).fetchall()
        )
        merges = train_bpe(spark_docs, n_merges=n_merges)
        got = sorted(
            (
                "merge",
                i,
                None,
                f"{a} {b}",
            )
            for i, (a, b) in enumerate(merges)
        ) + sorted(
            ("doc", r["doc_id"], r["n_tokens"], " ".join(r["tokens"]))
            for r in tokenize_documents(spark_docs, merges).collect()
        )
        assert sorted(got) == want

    def test_tricky_fixture_parity(self, spark):
        # repeated-char runs exercise the left-to-right overlap rule
        # ("aaaaa" -> aa aa a), multi-char merges the separator logic
        rows = [
            (1, "the cat sat on the mat"),
            (2, "the hat and the cat chat"),
            (3, "aaaaa aaa the them theme"),
            (4, "low lower lowest newest newer new"),
            (5, "the the the cat cat hat"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        self._compare(spark, rows, df, n_merges=8)

    def test_real_corpus_parity(self, spark):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        rows = [
            (r["doc_id"], r["text"])
            for r in docs.select("doc_id", "text").collect()
        ]
        self._compare(spark, rows, docs, n_merges=12)
