"""Hybrid retrieval: reciprocal-rank fusion (RRF) of lexical and
embedding top-k lists.

RRF (Cormack et al. 2009; the fusion Elasticsearch/OpenSearch ship
for "hybrid search") scores a candidate by Σ_r 1/(k0 + rank_r) over
the rankers that returned it, k0 = 60. It is rank-only — no score
calibration across modalities — which is exactly why it works for
fusing BM25 (unbounded sums) with cosine (bounded [-1, 1]).

Cross-engine determinism: each contribution is 1e9/(k0+rank) — one
correctly-rounded division of exact integers — snapped to integer
NANO-units, so the per-candidate sum is order-free and exact for ANY
number of rankers (the classifier/lm micro-unit discipline; a float
Σ over 3+ rankers would be engine-order-dependent).

Scale: inputs are already top-k lists (|queries| × k rows each), so
the fusion is a few full-outer joins of result-bounded tables — the
cost lives in the underlying rankers, not here.

No reference-repo counterpart (training-data extension per the
brief; the reference ships documents TO Elasticsearch — this is the
hybrid ranking that engine would run, re-expressed relationally).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

#: the RRF constant from the original paper, also ES's default
RRF_K0 = 60
#: integer nano-unit scale for order-free contribution sums
_NANO = 1_000_000_000


def rrf_fuse(
    ranked: list[DataFrame], k: int = 10, k0: int = RRF_K0
) -> DataFrame:
    """Fuse ranked lists — each (q_id, neighbor_id, rank, ...) — into
    (q_id, neighbor_id, score, rank) by reciprocal-rank fusion.
    Candidates missing from a list contribute 0 from it."""
    if not ranked:
        raise ValueError("rrf_fuse needs at least one ranked list")
    contribs = [
        df.select(
            "q_id",
            "neighbor_id",
            F.round(F.lit(float(_NANO)) / (F.lit(k0) + F.col("rank")), 0)
            .cast("long")
            .alias(f"_c{i}"),
        )
        for i, df in enumerate(ranked)
    ]
    joined = reduce(
        lambda a, b: a.join(b, ["q_id", "neighbor_id"], "full_outer"),
        contribs,
    )
    total = reduce(
        lambda a, b: a + b,
        [
            F.coalesce(F.col(f"_c{i}"), F.lit(0).cast("long"))
            for i in range(len(ranked))
        ],
    )
    scored = joined.select(
        "q_id",
        "neighbor_id",
        (total.cast("double") / _NANO).alias("score"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("score"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "score", "rank")
    )


def rrf_fuse_sql(
    ranked_sqls: list[str], k: int = 10, k0: int = RRF_K0
) -> str:
    """DuckDB twin of :func:`rrf_fuse`: each input SQL must yield
    (q_id, neighbor_id, rank); same nano-unit contributions."""
    if not ranked_sqls:
        raise ValueError("rrf_fuse_sql needs at least one ranked list")
    ctes = ",\n".join(
        f"""_rrf{i} AS MATERIALIZED (
  SELECT q_id, neighbor_id,
         CAST(round({float(_NANO)!r} / ({k0} + rank), 0) AS BIGINT)
           AS _c{i}
  FROM ({sql})
)"""
        for i, sql in enumerate(ranked_sqls)
    )
    src = "_rrf0"
    for i in range(1, len(ranked_sqls)):
        src += f" FULL OUTER JOIN _rrf{i} USING (q_id, neighbor_id)"
    total = " + ".join(
        f"coalesce(_c{i}, 0)" for i in range(len(ranked_sqls))
    )
    return f"""
WITH {ctes}
SELECT q_id, neighbor_id, score, rank FROM (
  SELECT q_id, neighbor_id,
         CAST({total} AS DOUBLE) / {_NANO} AS score,
         CAST(row_number() OVER (
           PARTITION BY q_id
           ORDER BY CAST({total} AS DOUBLE) / {_NANO} DESC,
                    neighbor_id ASC) AS INTEGER) AS rank
  FROM {src}
)
WHERE rank <= {k}
"""


def hybrid_rrf_topk(
    embs: DataFrame,
    docs: DataFrame,
    vec_query_ids: list[int],
    term_queries: dict[int, list[str]],
    k: int = 10,
    k0: int = RRF_K0,
    depth: int | None = None,
) -> DataFrame:
    """BM25 + exact-cosine hybrid search: run both rankers to
    ``depth`` (default 3k — fusion quality needs deeper candidate
    lists than the final cut) and RRF-fuse to the final top-k.
    `vec_query_ids[i]` and `term_queries[i]` must describe the SAME
    logical query i in the two modalities."""
    from .bm25 import bm25_topk
    from .similarity import brute_force_topk

    d = depth or 3 * k
    dense = brute_force_topk(embs, vec_query_ids, k=d)
    sparse = bm25_topk(docs, term_queries, k=d)
    return rrf_fuse([dense, sparse], k=k, k0=k0)


def hybrid_rrf_sql(
    emb_table: str,
    doc_table: str,
    vec_query_ids: list[int],
    term_queries: dict[int, list[str]],
    k: int = 10,
    k0: int = RRF_K0,
    depth: int | None = None,
) -> str:
    """DuckDB twin of :func:`hybrid_rrf_topk`."""
    from .bm25 import bm25_topk_sql
    from .similarity import brute_force_topk_sql

    d = depth or 3 * k
    dense = (
        "SELECT q_id, neighbor_id, rank FROM ("
        + brute_force_topk_sql(emb_table, vec_query_ids, d)
        + ")"
    )
    sparse = (
        "SELECT q_id, neighbor_id, rank FROM ("
        + bm25_topk_sql(doc_table, term_queries, d)
        + ")"
    )
    return rrf_fuse_sql([dense, sparse], k=k, k0=k0)
