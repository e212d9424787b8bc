"""Sliding-window document chunking (operators/chunking.py)."""

from __future__ import annotations

import pytest

from beats_spark.operators.chunking import chunk_documents


def _chunks(spark, text, chunk_tokens, overlap):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = chunk_documents(
        df, chunk_tokens=chunk_tokens, overlap=overlap
    ).collect()
    return sorted(
        [(r["chunk_idx"], r["chunk_text"], r["n_tokens"]) for r in rows]
    )


def test_no_overlap_windows(spark):
    text = " ".join(f"t{i}" for i in range(10))
    got = _chunks(spark, text, chunk_tokens=4, overlap=0)
    assert got == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t4 t5 t6 t7", 4),
        (2, "t8 t9", 2),
    ]


def test_overlap_windows(spark):
    text = " ".join(f"t{i}" for i in range(8))
    got = _chunks(spark, text, chunk_tokens=4, overlap=2)
    # stride 2: starts stop at the first window reaching the end —
    # no trailing windows fully contained in the previous one
    assert got == [
        (0, "t0 t1 t2 t3", 4),
        (1, "t2 t3 t4 t5", 4),
        (2, "t4 t5 t6 t7", 4),
    ]


def test_overlap_no_contained_duplicates(spark):
    # a doc exactly one window long yields exactly one chunk even
    # with overlap
    got = _chunks(spark, "a b c d", chunk_tokens=4, overlap=2)
    assert got == [(0, "a b c d", 4)]
    # uneven tail: the last window still reaches the end once
    got = _chunks(spark, " ".join(f"x{i}" for i in range(10)),
                  chunk_tokens=4, overlap=2)
    assert [g[0] for g in got] == [0, 1, 2, 3]
    assert got[-1] == (3, "x6 x7 x8 x9", 4)


def test_short_and_empty_docs(spark):
    assert _chunks(spark, "only two", 128, 16) == [(0, "only two", 2)]
    assert _chunks(spark, "   ", 128, 16) == [(0, "", 0)]


def test_reconstruction_no_overlap(spark):
    # with overlap=0 the chunks concatenate back to the token stream
    text = " ".join(f"w{i}" for i in range(50))
    got = _chunks(spark, text, chunk_tokens=7, overlap=0)
    assert " ".join(c for _, c, _ in got) == text
    assert sum(n for _, _, n in got) == 50


def test_bad_overlap_rejected(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)
