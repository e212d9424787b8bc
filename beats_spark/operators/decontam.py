"""Benchmark decontamination: n-gram overlap against a held-out set.

Standard training-data hygiene: a training document sharing enough
word n-grams with an evaluation benchmark is flagged (and usually
dropped). No reference analog (pure training-data extension per the
brief); built on the same shingle machinery as the Jaccard dedup tier
(operators/dedup.py) so both engines produce identical n-grams.

Scale shape: the benchmark side is tiny (eval suites are MBs, the
corpus is TBs) → its distinct n-grams BROADCAST; the corpus explodes
its n-grams map-side and the only shuffle is the per-doc count
aggregation keyed on doc id. The corpus is never re-shuffled by gram,
so a stopword-ish common gram costs hash-probe time, not a hot
reducer."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import shingles, shingles_sql


def ngram_overlap(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    threshold: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-corpus-doc count of DISTINCT word n-grams shared with the
    benchmark set, plus the ``contaminated`` flag (count ≥ threshold).
    Docs with zero overlap are retained with n_overlap = 0 (the
    common case — a left join, not a filter)."""
    grams = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("g"),
    )
    bench = benchmark.select(
        F.explode(shingles(F.col(text_col), n)).alias("g")
    ).distinct()
    hits = (
        grams.join(F.broadcast(bench), "g")
        .groupBy("id")
        .agg(F.count("*").alias("n_overlap"))
    )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_overlap", F.lit(0)).alias("n_overlap"),
            (F.coalesce("n_overlap", F.lit(0)) >= threshold).alias(
                "contaminated"
            ),
        )
    )


def ngram_overlap_sql(
    corpus_sql: str,
    benchmark_sql: str,
    n: int = 4,
    threshold: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`ngram_overlap` (lock-step shingles)."""
    sh = shingles_sql(text_col, n)
    return f"""
WITH corpus AS ({corpus_sql}),
benchmark AS ({benchmark_sql}),
grams AS (
  SELECT {id_col} AS id, unnest({sh}) AS g FROM corpus
),
bench AS (
  SELECT DISTINCT unnest({sh}) AS g FROM benchmark
),
hits AS (
  SELECT id, count(*) AS n_overlap
  FROM grams JOIN bench USING (g)
  GROUP BY id
)
SELECT c.{id_col},
       CAST(coalesce(h.n_overlap, 0) AS BIGINT) AS n_overlap,
       coalesce(h.n_overlap, 0) >= {threshold} AS contaminated
FROM corpus c LEFT JOIN hits h ON h.id = c.{id_col}
"""
