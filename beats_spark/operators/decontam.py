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


def ngram_overlap_frac(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    frac_num: int = 1,
    frac_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fractional contamination (the GPT-3/PaLM-style rule): a doc is
    contaminated when ≥ frac_num/frac_den of its DISTINCT word
    n-grams appear in the benchmark set. Counts are distinct-gram
    counts (the occurrence-count variant is :func:`ngram_overlap`);
    the threshold compare is exact integer cross-multiplication
    (n_overlap·den ≥ num·n_total) — no float boundary to disagree on.
    ``frac`` is reported informationally, rounded to 6 dp (one
    correctly-rounded division → identical on every engine).

    Same 100-TB shape: benchmark grams broadcast, corpus grams
    dedup'd per doc map-side by the distinct, one keyed aggregation.
    Short/empty docs get ONE whole-text shingle (the shingles()
    contract, lock-step with the SQL twin), so n_total ≥ 1 for every
    doc that reaches the aggregation; the n_total > 0 guard covers
    only docs dropped before it (NULL-text left-join misses)."""
    grams = corpus.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), n)).alias("g"),
    ).distinct()
    bench = benchmark.select(
        F.explode(shingles(F.col(text_col), n)).alias("g")
    ).distinct()
    stats = grams.join(
        F.broadcast(bench.withColumn("_hit", F.lit(1))), "g", "left"
    ).groupBy("id").agg(
        F.count("*").alias("n_total"),
        F.sum(F.coalesce("_hit", F.lit(0))).alias("n_overlap"),
    )
    frac = F.when(
        F.col("n_total") > 0,
        F.round(
            F.col("n_overlap").cast("double") / F.col("n_total"), 6
        ),
    ).otherwise(F.lit(0.0))
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(stats, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias("n_overlap"),
            F.coalesce("n_total", F.lit(0)).cast("long").alias("n_total"),
            F.coalesce(frac, F.lit(0.0)).alias("frac"),
            (
                (
                    F.coalesce("n_overlap", F.lit(0)) * F.lit(frac_den)
                    >= F.lit(frac_num) * F.coalesce("n_total", F.lit(0))
                )
                & (F.coalesce("n_total", F.lit(0)) > 0)
            ).alias("contaminated"),
        )
    )


def ngram_overlap_frac_sql(
    corpus_sql: str,
    benchmark_sql: str,
    n: int = 4,
    frac_num: int = 1,
    frac_den: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`ngram_overlap_frac`."""
    sh = shingles_sql(text_col, n)
    return f"""
WITH corpus AS ({corpus_sql}),
benchmark AS ({benchmark_sql}),
grams AS (
  SELECT DISTINCT {id_col} AS id, unnest({sh}) AS g FROM corpus
),
bench AS (
  SELECT DISTINCT unnest({sh}) AS g FROM benchmark
),
stats AS (
  SELECT id, count(*) AS n_total,
         sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END) AS n_overlap
  FROM grams LEFT JOIN bench b USING (g)
  GROUP BY id
)
SELECT c.{id_col},
       CAST(coalesce(s.n_overlap, 0) AS BIGINT) AS n_overlap,
       CAST(coalesce(s.n_total, 0) AS BIGINT) AS n_total,
       coalesce(CASE WHEN s.n_total > 0
                     THEN round(CAST(s.n_overlap AS DOUBLE) / s.n_total, 6)
                     ELSE 0.0 END, 0.0) AS frac,
       coalesce(s.n_overlap, 0) * {frac_den}
         >= {frac_num} * coalesce(s.n_total, 0)
       AND coalesce(s.n_total, 0) > 0 AS contaminated
FROM corpus c LEFT JOIN stats s ON s.id = c.{id_col}
"""


def fuzzy_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    min_hits: int = 1,
    k: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """FUZZY decontamination: flag corpus docs that are minhash-LSH
    near-duplicates of any benchmark item — the Dolma/LLaMA-style
    complement to exact n-gram overlap (a lightly paraphrased eval
    question shares few exact 4-grams but most of its shingle set).

    Candidate-level by design (the streaming curator's membership
    rule, dedup.with_band_keys): a doc is contaminated when ≥
    ``min_hits`` of its LSH band keys appear in the benchmark's band
    key set. No verify join — band FPs are deterministic (same
    two-hash minhash both engines) so the DuckDB twin reproduces
    them exactly, and at benchmark scale (MBs vs TBs) a band FP
    costs an over-drop, never a hot reducer.

    Scale shape: benchmark band keys are DISTINCT and BROADCAST; the
    corpus computes its keys map-side (`with_band_keys`) and only the
    per-doc hit count shuffles — the corpus is never re-keyed by band.
    """
    from .dedup import explode_band_keys, with_band_keys

    # explode via explode_band_keys, never bare F.explode: the
    # inferred size()>0 filter would push the whole minhash chain
    # into the scan (20x at sf0.1 — see explode_band_keys docstring)
    bkeys = (
        explode_band_keys(
            with_band_keys(
                benchmark.select(F.col(text_col)),
                F.col(text_col),
                k=k,
                rows_per_band=rows_per_band,
                n=n,
            )
        )
        .select("bk")
        .distinct()
    )
    ckeys = explode_band_keys(
        with_band_keys(
            corpus.select(F.col(id_col).alias("id"), F.col(text_col)),
            F.col(text_col),
            k=k,
            rows_per_band=rows_per_band,
            n=n,
        )
    ).select("id", "bk")
    hits = (
        ckeys.join(F.broadcast(bkeys), "bk")
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_band_hits"))
    )
    return (
        corpus.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_band_hits", F.lit(0)).cast("long").alias(
                "n_band_hits"
            ),
            (F.coalesce("n_band_hits", F.lit(0)) >= min_hits).alias(
                "contaminated"
            ),
        )
    )


def fuzzy_contamination_sql(
    corpus_sql: str,
    benchmark_sql: str,
    min_hits: int = 1,
    k: int = 8,
    rows_per_band: int = 2,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB twin of :func:`fuzzy_contamination`. Band keys are the
    same ``band || '_' || mh.. || '_' || mh..`` encoding as
    dedup.with_band_keys; a shingle-less doc's NULL minhash makes the
    key NULL, which joins to nothing — matching Spark's empty key
    array. Signature tables stage through MATERIALIZED CTEs."""
    from .dedup import minhash_signature_sql

    n_bands = k // rows_per_band

    def keys_select(src: str, with_id: bool) -> str:
        idc = "id, " if with_id else ""
        arms = "\nUNION ALL\n".join(
            "SELECT {i}'{b}_' || {parts} AS bk FROM {src}".format(
                i=idc,
                b=b,
                parts=" || '_' || ".join(
                    f"CAST(mh{b * rows_per_band + r} AS VARCHAR)"
                    for r in range(rows_per_band)
                ),
                src=src,
            )
            for b in range(n_bands)
        )
        return arms

    csig = minhash_signature_sql(
        f"({corpus_sql})", k=k, n=n, text_col=text_col, id_col=id_col
    )
    bsig = minhash_signature_sql(
        f"({benchmark_sql})", k=k, n=n, text_col=text_col, id_col=id_col
    )
    return f"""
WITH _fz_cs AS MATERIALIZED ({csig}),
_fz_bs AS MATERIALIZED ({bsig}),
_fz_ck AS MATERIALIZED ({keys_select("_fz_cs", True)}),
_fz_bk AS MATERIALIZED (
  SELECT DISTINCT bk FROM ({keys_select("_fz_bs", False)})
  WHERE bk IS NOT NULL
),
_fz_hits AS (
  SELECT id, count(*) AS n_band_hits
  FROM _fz_ck JOIN _fz_bk USING (bk)
  GROUP BY id
)
SELECT c.{id_col},
       CAST(coalesce(h.n_band_hits, 0) AS BIGINT) AS n_band_hits,
       coalesce(h.n_band_hits, 0) >= {min_hits} AS contaminated
FROM ({corpus_sql}) c LEFT JOIN _fz_hits h ON h.id = c.{id_col}
"""
