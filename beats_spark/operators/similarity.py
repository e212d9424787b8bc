"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small)
query set against the corpus, dot products computed with
``zip_with``/``aggregate`` (JVM-side, no Python), ranked per query.

Scale path: LSH-bucketed ANN — random-hyperplane signs bucket the
corpus; a query probes only its bucket. At 100 TB the corpus side
never shuffles more than once (bucket key), and the per-bucket
candidate set is bounded.

Cross-engine float discipline: cosine is computed in double and
rounded to 6 dp *before* ranking, and ranking ties break on the
neighbor id — so Spark and DuckDB produce identical top-k sets.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ..plans.materialize import materialize as _materialize


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k for each query id. The query side is tiny →
    broadcast; the corpus side streams with no shuffle until the
    per-query top-k aggregation (a windowed rank over q_id)."""
    # norms are per-vector: precompute them on each side (identical
    # fold → bit-identical float) so every pair runs ONE interpreted
    # array fold (the dot), not three
    corpus = df.withColumn("_nrm", norm(F.col(vec_col)))
    q = corpus.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_nrm").alias("q_nrm"),
    )
    pairs = corpus.alias("c").join(
        F.broadcast(q), F.col(id_col) != F.col("q_id")
    )
    scored = pairs.select(
        "q_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("q_vec"), F.col(vec_col))
            / (F.col("q_nrm") * F.col("_nrm")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def brute_force_topk_sql(
    table: str, query_ids: list[int], k: int = 10,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    ids = ",".join(str(i) for i in query_ids)
    return f"""
WITH q AS (
  SELECT {id_col} AS q_id, {vec_col} AS q_vec FROM {table}
  WHERE {id_col} IN ({ids})
),
scored AS (
  SELECT q.q_id, c.{id_col} AS neighbor_id,
         round(
           list_sum(list_transform(list_zip(q.q_vec, c.{vec_col}),
                                   p -> p[1]::DOUBLE * p[2]::DOUBLE))
           / (sqrt(list_sum(list_transform(q.q_vec, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(c.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))),
           6) AS cos_sim
  FROM {table} c, q
  WHERE c.{id_col} <> q.q_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)


def hyperplane(dim: int, plane_idx: int, mod: int = 1000) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j is
    ((j + 1) * (plane_idx + 1) * 2654435761 mod 1000) / 500 - 1 —
    reproducible on any engine with integer arithmetic only."""
    return [
        (((j + 1) * (plane_idx + 1) * 2654435761) % mod) / (mod / 2.0) - 1.0
        for j in range(dim)
    ]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id over the hyperplanes."""
    out = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = dot(vec, F.array(*[F.lit(x) for x in p]))
        out = out + F.when(proj > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return out


def ann_lsh_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_planes: int = 4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: probe only the query's sign bucket. Recall < 1 by design;
    the oracle reproduces the identical buckets so results still
    match exactly."""
    planes = [hyperplane(dim, i) for i in range(n_planes)]
    bucketed = df.withColumn(
        "bucket", lsh_bucket(F.col(vec_col), planes)
    ).withColumn("_nrm", norm(F.col(vec_col)))
    q = bucketed.where(F.col(id_col).isin(query_ids)).select(
        F.col(id_col).alias("q_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_nrm").alias("q_nrm"),
        F.col("bucket").alias("q_bucket"),
    )
    pairs = bucketed.alias("c").join(
        F.broadcast(q),
        (F.col("bucket") == F.col("q_bucket")) & (F.col(id_col) != F.col("q_id")),
    )
    scored = pairs.select(
        "q_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("q_vec"), F.col(vec_col))
            / (F.col("q_nrm") * F.col("_nrm")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_lsh_topk_sql(
    table: str, query_ids: list[int], k: int = 10,
    n_planes: int = 4, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
) -> str:
    ids = ",".join(str(i) for i in query_ids)
    planes = [hyperplane(dim, i) for i in range(n_planes)]
    bucket_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(list_zip({vec_col}, "
        f"[{','.join(repr(x) for x in p)}]::DOUBLE[]), "
        f"p -> p[1]::DOUBLE * p[2])) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH b AS (
  SELECT *, ({bucket_terms})::BIGINT AS bucket FROM {table}
),
q AS (
  SELECT {id_col} AS q_id, {vec_col} AS q_vec, bucket AS q_bucket
  FROM b WHERE {id_col} IN ({ids})
),
scored AS (
  SELECT q.q_id, c.{id_col} AS neighbor_id,
         round(
           list_sum(list_transform(list_zip(q.q_vec, c.{vec_col}),
                                   p -> p[1]::DOUBLE * p[2]::DOUBLE))
           / (sqrt(list_sum(list_transform(q.q_vec, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(c.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))),
           6) AS cos_sim
  FROM b c JOIN q ON c.bucket = q.q_bucket AND c.{id_col} <> q.q_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# IVF-bucketed ANN (the second scale path: coarse quantizer → probe)


def ivf_centroid(dim: int, c_idx: int, mod: int = 1000) -> list[float]:
    """Deterministic pseudo-random centroid (same integer-arithmetic
    recipe as :func:`hyperplane` — reproducible on any engine). A real
    deployment would train these with k-means; the INDEX mechanics
    (assign → partition → probe) are what this implements."""
    return [
        (((j + 1) * (c_idx + 17) * 2654435761) % mod) / (mod / 2.0) - 1.0
        for j in range(dim)
    ]


def ivf_assign(vec: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id by maximum dot product (centroids are
    fixed-norm-ish; dot is the cheap IVF assignment). Deterministic
    tie-break: the LOWEST centroid id wins — array_max over
    (dot, -idx) structs."""
    scored = F.array(
        *[
            F.struct(
                dot(vec, F.array(*[F.lit(x) for x in c])).alias("d"),
                F.lit(-i).alias("neg_idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    return (-F.array_max(scored)["neg_idx"]).cast("int")


def ivf_probe_cells(
    vec: Column, centroids: list[list[float]], nprobe: int
) -> Column:
    """The ``nprobe`` nearest centroid ids by descending dot product,
    ties to the LOWEST centroid id — element 1 equals
    :func:`ivf_assign` (same (d, -idx) ordering)."""
    scored = F.array(
        *[
            F.struct(
                dot(vec, F.array(*[F.lit(x) for x in c])).alias("d"),
                F.lit(-i).alias("neg_idx"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    top = F.slice(F.reverse(F.array_sort(scored)), 1, nprobe)
    return F.transform(top, lambda t: (-t.neg_idx).cast("int"))


def ann_ivf_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_centroids: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """IVF ANN: corpus partitioned by nearest centroid; a query probes
    its ``nprobe`` nearest cells, then exact cosine ranks the probed
    rows. At 100 TB: the corpus shuffles once on the cell id (or is
    bucketed on it at write time) and each query touches
    ~nprobe/n_centroids of the data; recall grows with nprobe and the
    oracle reproduces the identical cells so results still match
    exactly."""
    cents = [ivf_centroid(dim, i) for i in range(n_centroids)]
    cells = df.withColumn(
        "cell", ivf_assign(F.col(vec_col), cents)
    ).withColumn("_nrm", norm(F.col(vec_col)))
    # query side scores centroids ONCE (ivf_probe_cells; its element 1
    # equals ivf_assign, so the query's own cell is never recomputed)
    # and EXPLODES its nprobe cells to rows: the probe join is then an
    # equi-join on `cell` — a BroadcastHashJoin the corpus side
    # hash-probes, where the r2 `array_contains(q_cells, cell)` join
    # condition forced a nested-loop scan of every corpus row against
    # every query (r2 verdict item #5: +37% regression, and at real
    # scale it blocks hash-join co-location on the cell key). A corpus
    # row lives in exactly one cell and q_cells are distinct, so the
    # explode cannot duplicate (q_id, neighbor) pairs.
    q = (
        df.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("q_nrm"),
            ivf_probe_cells(F.col(vec_col), cents, nprobe).alias("q_cells"),
        )
        .select("q_id", "q_vec", "q_nrm", F.explode("q_cells").alias("cell"))
    )
    pairs = cells.alias("c").join(
        F.broadcast(q), on="cell"
    ).where(F.col(id_col) != F.col("q_id"))
    scored = pairs.select(
        "q_id",
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("q_vec"), F.col(vec_col))
            / (F.col("q_nrm") * F.col("_nrm")),
            6,
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "cos_sim", "rank")
    )


def ann_ivf_topk_multi(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    nprobes: tuple[int, ...] = (1, 2),
    n_centroids: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k at SEVERAL probe widths from ONE corpus pass (for
    recall/latency sweeps — and the merged ``ann_ivf`` driver row).
    A width-``p`` result ranks exactly the rows whose probed cell sat
    at position ≤ p in the query's centroid ordering, so: probe
    ``max(nprobes)`` cells WITH their position (posexplode), join the
    corpus once, then rank the scored set once per width over a
    ``cell_rank <= p`` filter. Running :func:`ann_ivf_topk` per width
    would recompute the corpus centroid assignment + probe join per
    width; here the widths share them, and the per-width work is a
    window over the (queries × probed cells) scored set — tiny next
    to the corpus."""
    max_probe = max(nprobes)
    cents = [ivf_centroid(dim, i) for i in range(n_centroids)]
    cells = df.withColumn(
        "cell", ivf_assign(F.col(vec_col), cents)
    ).withColumn("_nrm", norm(F.col(vec_col)))
    q = (
        df.where(F.col(id_col).isin(query_ids))
        .select(
            F.col(id_col).alias("q_id"),
            F.col(vec_col).alias("q_vec"),
            norm(F.col(vec_col)).alias("q_nrm"),
            ivf_probe_cells(F.col(vec_col), cents, max_probe).alias(
                "q_cells"
            ),
        )
        .select(
            "q_id", "q_vec", "q_nrm",
            F.posexplode("q_cells").alias("pos", "cell"),
        )
    )
    pairs = cells.alias("c").join(F.broadcast(q), on="cell").where(
        F.col(id_col) != F.col("q_id")
    )
    scored = pairs.select(
        "q_id",
        (F.col("pos") + 1).alias("cell_rank"),
        F.col(id_col).alias("neighbor_id"),
        F.round(
            dot(F.col("q_vec"), F.col(vec_col))
            / (F.col("q_nrm") * F.col("_nrm")),
            6,
        ).alias("cos_sim"),
    ).transform(_materialize)  # one probe join feeds every width's ranking
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    out = None
    for p in nprobes:
        ranked = (
            scored.where(F.col("cell_rank") <= p)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(
                "q_id",
                "neighbor_id",
                "cos_sim",
                "rank",
                F.lit(p).alias("nprobe"),
            )
        )
        out = ranked if out is None else out.unionByName(ranked)
    return out


def ann_ivf_topk_sql(
    table: str, query_ids: list[int], k: int = 10,
    n_centroids: int = 8, dim: int = 64,
    id_col: str = "vec_id", vec_col: str = "embedding",
    nprobe: int = 1,
) -> str:
    ids = ",".join(str(i) for i in query_ids)
    cents = [ivf_centroid(dim, i) for i in range(n_centroids)]
    # argmax by (dot, -idx): DuckDB list_max over [dot, -idx] pairs
    pair_terms = ", ".join(
        f"[list_sum(list_transform(list_zip({vec_col}, "
        f"[{','.join(repr(x) for x in c)}]::DOUBLE[]), "
        f"p -> p[1]::DOUBLE * p[2])), {float(-i)}]"
        for i, c in enumerate(cents)
    )
    return f"""
WITH cells AS (
  SELECT *, CAST(-list_max([{pair_terms}])[2] AS INTEGER) AS cell
  FROM {table}
),
q AS (
  SELECT {id_col} AS q_id, {vec_col} AS q_vec,
         list_transform(
           list_reverse(list_sort([{pair_terms}]))[1:{nprobe}],
           p -> CAST(-p[2] AS INTEGER)) AS q_cells
  FROM cells WHERE {id_col} IN ({ids})
),
scored AS (
  SELECT q.q_id, c.{id_col} AS neighbor_id,
         round(
           list_sum(list_transform(list_zip(q.q_vec, c.{vec_col}),
                                   p -> p[1]::DOUBLE * p[2]::DOUBLE))
           / (sqrt(list_sum(list_transform(q.q_vec, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(c.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))),
           6) AS cos_sim
  FROM cells c JOIN q
    ON list_contains(q.q_cells, c.cell) AND c.{id_col} <> q.q_id
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT q_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {k}
"""


# ---------------------------------------------------------------------------
# int8 scalar quantization (embedding storage compression)


def quantize_embedding(
    vec: Column, scale: Column | None = None
) -> tuple[Column, Column]:
    """Symmetric int8 scalar quantization: ``scale = max|x| / 127``,
    ``q_j = floor(x_j / scale + 0.5)`` — 4× smaller storage for
    embedding columns with bounded reconstruction error. The explicit
    floor(+0.5) rounding (half toward +inf) is used instead of
    round() because engines disagree on round-half ties. Zero vectors
    quantize to zeros with scale 0.

    Pass a pre-materialized ``scale`` Column when quantizing at scale:
    inlining the default scale expression into the per-element lambda
    recomputes the O(d) max-abs scan per element (Spark does no CSE
    inside higher-order-function lambdas)."""
    if scale is None:
        scale = (
            F.array_max(F.transform(vec, lambda x: F.abs(x.cast("double"))))
            / 127.0
        )
    q = F.transform(
        vec,
        lambda x: F.when(scale > 0, F.floor(x.cast("double") / scale + 0.5))
        .otherwise(F.lit(0))
        .cast("int"),
    )
    return q, scale


def dequantize_embedding(q: Column, scale: Column) -> Column:
    return F.transform(q, lambda v: v.cast("double") * scale)


def quantization_stats(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector quantization fidelity: the scale, worst absolute
    reconstruction error, and cosine between original and
    reconstructed vector (all rounded 6 dp for cross-engine
    compare)."""
    # materialize the scale FIRST, then quantize from the materialized
    # column — one O(d) scan per row, not one per element
    _, scale = quantize_embedding(F.col(vec_col))
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        scale.alias("s"),
    )
    q, _ = quantize_embedding(F.col("v"), scale=F.col("s"))
    base = base.select("id", "v", "s", q.alias("q"))
    deq = dequantize_embedding(F.col("q"), F.col("s"))
    err = F.array_max(
        F.zip_with(F.col("v"), deq, lambda a, b: F.abs(a.cast("double") - b))
    )
    # zero vector → scale 0 → cosine is 0/0: NULL (the oracle's
    # division yields NULL; ANSI mode would otherwise throw)
    cos = F.when(F.col("s") > 0, F.round(cosine(F.col("v"), deq), 6))
    return base.select(
        "id",
        F.round(F.col("s"), 6).alias("scale"),
        F.round(err, 6).alias("max_abs_err"),
        cos.alias("cos_orig_deq"),
    )


def quantization_stats_sql(
    table: str, id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    return f"""
WITH base AS (
  SELECT {id_col} AS id, {vec_col} AS v,
         list_max(list_transform({vec_col}, x -> abs(x::DOUBLE))) / 127.0
           AS s
  FROM {table}
),
qd AS (
  SELECT id, v, s,
         list_transform(v, x -> CASE WHEN s > 0
             THEN floor(x::DOUBLE / s + 0.5) ELSE 0 END * s) AS deq
  FROM base
)
SELECT id,
       round(s, 6) AS scale,
       round(list_max(list_transform(list_zip(v, deq),
                                     p -> abs(p[1]::DOUBLE - p[2]))), 6)
         AS max_abs_err,
       CASE WHEN s > 0 THEN round(
         list_sum(list_transform(list_zip(v, deq),
                                 p -> p[1]::DOUBLE * p[2]))
         / (sqrt(list_sum(list_transform(v, x -> x::DOUBLE * x::DOUBLE)))
            * sqrt(list_sum(list_transform(deq, x -> x * x)))),
         6) END AS cos_orig_deq
FROM qd
"""


# ---------------------------------------------------------------------------
# trained IVF: deterministic distributed k-means (Lloyd)

KMEANS_SCALE = 1_000_000


def _km_scaled(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    # floor(x*1e6 + 0.5) → exact longs: group-aggregation over floats
    # is ORDER-DEPENDENT (fp addition isn't associative), so centroid
    # updates sum integers (exact, order-free) and divide once
    return df.select(
        F.col(id_col).alias("vid"),
        F.transform(
            vec_col,
            lambda x: F.floor(
                x.cast("double") * KMEANS_SCALE + F.lit(0.5)
            ).cast("long"),
        ).alias("xq"),
    )


def _km_assign(xq: DataFrame, cent_rows: list) -> DataFrame:
    """Nearest centroid by squared euclidean (scaled space), ties to
    the lowest cell. Centroids arrive as driver-side literals (k×dim
    doubles — bytes, not data), so assignment is a PURE MAP: zero
    shuffle, no join, no window sort. The r1-style crossJoin+window
    alternative shuffled and sorted n×k rows per pass — the plan test
    pins this shape."""
    scored = F.array(
        *[
            F.struct(
                F.aggregate(
                    F.zip_with(
                        "xq",
                        F.array(*[F.lit(float(x)) for x in cvec]),
                        lambda a, b: (a.cast("double") - b)
                        * (a.cast("double") - b),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ).alias("dist"),
                F.lit(int(cell)).alias("cell"),
            )
            for cell, cvec in cent_rows
        ]
    )
    # struct comparison is lexicographic: min dist, tie → lowest cell
    best = F.array_min(scored)
    return xq.select(
        "vid",
        best["cell"].alias("cell"),
        "xq",
        best["dist"].alias("dist"),
    )


def _km_update(assigned: DataFrame) -> DataFrame:
    """New centroids: exact integer element-wise sums / counts. Empty
    cells simply vanish (deterministic on both engines)."""
    cnt = assigned.groupBy("cell").agg(F.count("*").alias("n"))
    sums = (
        assigned.select("cell", F.posexplode("xq").alias("pos", "v"))
        .groupBy("cell", "pos")
        .agg(F.sum("v").alias("s"))
        .groupBy("cell")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "s"))),
                lambda t: t.s,
            ).alias("sums")
        )
    )
    # both sides are k rows — never let this become a sort-merge join
    return sums.join(F.broadcast(cnt), "cell").select(
        "cell",
        F.transform(
            "sums", lambda s: s.cast("double") / F.col("n")
        ).alias("cvec"),
    )


def _km_train(xq: DataFrame, k: int, iters: int) -> list:
    """The training half of :func:`kmeans_ivf`: trained centroid rows
    ``[(cell, cvec doubles), ...]`` from a pre-scaled (vid, xq) frame.
    Seeds = the k lowest-vid vectors, cells numbered by seed rank.
    Shared with product quantization (operators/pq.py), which trains
    one of these per subspace."""
    # unpartitioned window — INTENTIONAL and bounded: it ranks only the
    # k seed rows surviving limit(k) (k≈8–4096), which already live in
    # one partition; the corpus never flows through it (WindowExec's
    # single-partition warning here is about these k rows)
    w = Window.orderBy("vid")
    cents = (
        xq.orderBy("vid")
        .limit(k)
        .select(
            F.row_number().over(w).alias("cell"),
            F.transform("xq", lambda v: v.cast("double")).alias("cvec"),
        )
    )

    def rows(cdf: DataFrame) -> list:
        # k×dim doubles to the driver — centroid VALUES, not data;
        # re-lit as Python floats round-trips IEEE-exactly
        return [(r["cell"], list(r["cvec"])) for r in cdf.collect()]

    cur = rows(cents)
    for _ in range(iters):
        cur = rows(_km_update(_km_assign(xq, cur)))
    return cur


def kmeans_ivf(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """TRAINED IVF assignment: deterministic distributed Lloyd k-means
    (fixed iteration count; seeds = the k lowest-id vectors, cells
    numbered by seed rank) followed by the final cell assignment.

    Replaces the r1 stub centroids (ivf_centroid) with data-learned
    ones while staying oracle-checkable: every float operation is an
    identically-ordered fold, and the one aggregation that would be
    order-sensitive (the centroid mean) sums exact scaled integers.
    At 100 TB: per iteration one broadcast-join assignment pass (no
    corpus shuffle) + one (cell, pos) aggregation of k×dim cells —
    the textbook distributed k-means shape.

    Returns (vec_id, cell, dist) with dist the squared euclidean in
    ORIGINAL units, rounded 6 dp."""
    # materialize the scaled matrix once — every iteration (and the
    # final assignment) scans it; without this each pass re-reads and
    # re-scales the raw embeddings (MLlib's KMeans caches its input
    # for the same reason)
    xq = _km_scaled(df, id_col, vec_col).transform(_materialize)
    final = _km_assign(xq, _km_train(xq, k, iters))
    return final.select(
        F.col("vid").alias(id_col),
        F.col("cell").cast("long").alias("cell"),
        F.round(
            F.col("dist") / F.lit(float(KMEANS_SCALE) ** 2), 6
        ).alias("dist"),
    )


def kmeans_ivf_sql(
    table: str,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    emit: str = "assign",
) -> str:
    """DuckDB twin of :func:`kmeans_ivf` — the Lloyd loop unrolled into
    CTE pairs (aN = assignment, cN = centroid update). Positions come
    from ``len(xq)`` per row, not a dimension parameter, so any
    embedding width stays lock-step with the Spark side.
    ``emit='centroids'`` returns the TRAINED (cell, cvec) table
    instead of the final assignment — the twin of
    :func:`_km_train`'s driver literals (scaled space), used by the
    PQ/ADC oracles to rebuild lookup tables independently."""
    def assign(cents: str) -> str:
        return f"""(
  SELECT vid, cell, xq, dist FROM (
    SELECT vid, cell, xq, dist,
           row_number() OVER (PARTITION BY vid
                              ORDER BY dist ASC, cell ASC) AS rn
    FROM (
      SELECT x.vid, c.cell, x.xq,
             list_sum(list_transform(list_zip(x.xq, c.cvec),
               p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2])))
               AS dist
      FROM xq x CROSS JOIN {cents} c
    )
  ) WHERE rn = 1
)"""

    def update(assigned: str) -> str:
        return f"""(
  SELECT s.cell,
         list_transform(s.sums, v -> v::DOUBLE / n.n) AS cvec
  FROM (
    SELECT cell, list(s ORDER BY pos) AS sums FROM (
      SELECT cell, t.i AS pos, CAST(sum(xq[t.i]) AS BIGINT) AS s
      FROM {assigned}, unnest(generate_series(1, len(xq))) AS t(i)
      GROUP BY cell, t.i
    ) GROUP BY cell
  ) s JOIN (
    SELECT cell, count(*) AS n FROM {assigned} GROUP BY cell
  ) n USING (cell)
)"""

    ctes = [
        f"""xq AS (
  SELECT {id_col} AS vid,
         list_transform({vec_col},
           x -> CAST(floor(x::DOUBLE * {KMEANS_SCALE} + 0.5) AS BIGINT))
           AS xq
  FROM {table}
)""",
        f"""c0 AS (
  SELECT row_number() OVER (ORDER BY vid) AS cell,
         list_transform(xq, v -> v::DOUBLE) AS cvec
  FROM (SELECT vid, xq FROM xq ORDER BY vid LIMIT {k})
)""",
    ]
    prev = "c0"
    for i in range(1, iters + 1):
        ctes.append(f"a{i} AS {assign(prev)}")
        ctes.append(f"c{i} AS {update(f'a{i}')}")
        prev = f"c{i}"
    if emit == "centroids":
        body = ",\n".join(ctes)
        return f"""
WITH {body}
SELECT CAST(cell AS BIGINT) AS cell, cvec FROM {prev}
"""
    ctes.append(f"af AS {assign(prev)}")
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT vid AS {id_col}, CAST(cell AS BIGINT) AS cell,
       round(dist / {float(KMEANS_SCALE) ** 2:.1f}, 6) AS dist
FROM af
"""


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    n_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, joined within blocks only.

    The DEFAULT block key (``block_col=None``) is the hyperplane-sign
    LSH bucket (:func:`lsh_bucket`) — the 100-TB-safe choice: bucket
    fanout is data-independent (2^n_planes keys) and a near-dup pair
    (cosine ≥ 0.95) lands in the same bucket unless it straddles a
    hyperplane, the standard sign-LSH recall trade. Passing a data
    column (e.g. ``label``) keeps exact within-block comparison for
    evaluation fixtures — but a large real block there is quadratic,
    so it is never the default.

    .. versionchanged:: r2
       The default ``block_col`` changed from ``'label'`` (exact
       within-block, recall 1 inside blocks) to ``None`` (LSH
       buckets, recall < 1). Callers that relied on the old default
       must now pass ``block_col='label'`` explicitly to get the
       identical — and at scale quadratic — pair set."""
    if block_col is None:
        planes = [hyperplane(dim, i) for i in range(n_planes)]
        df = df.withColumn("_nd_blk", lsh_bucket(F.col(vec_col), planes))
        block_col = "_nd_blk"
    # norms are per-VECTOR: precompute them once per side (the same
    # fold the per-pair cosine would run → bit-identical floats) so
    # each pair evaluates one interpreted array fold (dot), not three
    df = df.withColumn("_nd_nrm", norm(F.col(vec_col)))
    lhs = df.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("va"),
        F.col("_nd_nrm").alias("na"),
        F.col(block_col).alias("blk"),
    )
    rhs = df.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vb"),
        F.col("_nd_nrm").alias("nb"),
        F.col(block_col).alias("blk"),
    )
    pairs = lhs.join(rhs, "blk").where(F.col("id_a") < F.col("id_b"))
    return (
        pairs.select(
            "id_a",
            "id_b",
            F.round(
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
    )


def embedding_neardup_sql(
    table: str, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    block_col: str = "label",
) -> str:
    return f"""
WITH pairs AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
         round(
           list_sum(list_transform(list_zip(a.{vec_col}, b.{vec_col}),
                                   p -> p[1]::DOUBLE * p[2]::DOUBLE))
           / (sqrt(list_sum(list_transform(a.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(b.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))),
           6) AS cos_sim
  FROM {table} a JOIN {table} b
    ON a.{block_col} = b.{block_col} AND a.{id_col} < b.{id_col}
)
SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= {threshold}
"""


def embedding_neardup_lsh_sql(
    table: str, threshold: float = 0.95,
    id_col: str = "vec_id", vec_col: str = "embedding",
    n_planes: int = 4, dim: int = 64,
) -> str:
    """DuckDB twin of the DEFAULT (LSH-bucket-blocked)
    :func:`embedding_neardup_pairs`: identical deterministic
    hyperplanes → identical buckets → identical pair set."""
    planes = [hyperplane(dim, i) for i in range(n_planes)]
    bucket_terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(list_zip({vec_col}, "
        f"[{','.join(repr(x) for x in p)}]::DOUBLE[]), "
        f"p -> p[1]::DOUBLE * p[2])) > 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(planes)
    )
    return f"""
WITH b AS (
  SELECT *, ({bucket_terms})::BIGINT AS blk FROM {table}
),
pairs AS (
  SELECT a.{id_col} AS id_a, b2.{id_col} AS id_b,
         round(
           list_sum(list_transform(list_zip(a.{vec_col}, b2.{vec_col}),
                                   p -> p[1]::DOUBLE * p[2]::DOUBLE))
           / (sqrt(list_sum(list_transform(a.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(b2.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))),
           6) AS cos_sim
  FROM b a JOIN b b2
    ON a.blk = b2.blk AND a.{id_col} < b2.{id_col}
)
SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= {threshold}
"""


# ---------------------------------------------------------------------------
# SemDeDup: semantic deduplication inside k-means clusters


SEMDEDUP_CELL_CAP = 512  # anchors per cell — see semdedup docstring


def semdedup(
    df: DataFrame,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int = SEMDEDUP_CELL_CAP,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster the
    embeddings with k-means, compare pairs only WITHIN a cluster, and
    for every near-duplicate pair (cosine >= threshold) drop the member
    CLOSER to its centroid — the paper's keep-the-lowest-
    centroid-similarity rule, which retains the most atypical
    representative of each duplicate neighborhood.

    Composition: the cluster step is :func:`kmeans_ivf` (deterministic
    distributed Lloyd — same centroids on both engines), so the whole
    operator adds only one id-join (to re-attach vectors), one
    within-cell self-join, and one drop-set aggregation. Determinism:
    cosine and centroid distance are both rounded to 6 dp BEFORE any
    comparison; distance ties break on the larger id being dropped.

    100-TB shape: cost is sum(|cell|^2) pair cosines — exactly the
    published algorithm's cost model; k is chosen proportional to N so
    cells stay bounded (the paper uses k=50k for 5B embeddings). The
    corpus shuffles once on id (vector re-attach) and once on cell;
    nothing is quadratic across cells.

    Hot-cell guard (``cell_cap``, r4 verdict #8): a degenerate corpus
    whose embeddings all collapse into ONE cell would emit B²/2 pair
    cosines regardless of k. The pair join's left side is capped to
    each cell's first ``cell_cap`` members ordered (dist DESC, id ASC)
    — the FARTHEST-from-centroid members, i.e. exactly the members the
    keep-the-most-atypical rule retains. Cells at/under the cap
    produce the identical full pair set; oversized cells still pair
    every member against the eventual survivors (the farthest anchors
    dominate every drop decision), so keep/drop outcomes for dense
    duplicate neighborhoods are preserved while pair cost drops to
    O(|cell|·cap). Same bounded-candidate contract as the LSH
    hot-bucket anchor rule in ``dedup.minhash_lsh_pairs``.

    Returns (id, cell, dist, n_dup_pairs, keep): one row per input
    vector; ``keep`` is False iff some same-cell vector within the
    cosine threshold sits strictly farther from the centroid (or
    equally far with a smaller id).

    No reference-repo counterpart (training-data extension per the
    brief).
    """
    assigned = kmeans_ivf(df, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    # rank for the hot-cell anchors on the SLIM (id, cell, dist)
    # table BEFORE vectors attach — the window sort then never moves
    # an embedding array, and the vector join carries _rk for free
    wc = Window.partitionBy("cell").orderBy(
        F.col("dist").desc(), F.col(id_col).asc()
    )
    assigned = assigned.withColumn("_rk", F.row_number().over(wc))
    # one row per vector, consumed by BOTH self-join sides and the
    # final keep-join — materialize once. The norm is precomputed per
    # VECTOR (the identical fold the per-pair cosine would run, so the
    # float is bit-identical) — this cuts the per-pair array loops
    # from 3 (dot + 2 norms) to 1 (dot): higher-order-function
    # expressions are interpreted per element, and the pair stage is
    # sum(|cell|^2) of them.
    av = (
        assigned.join(df.select(id_col, vec_col), id_col)
        .withColumn("_nrm", norm(F.col(vec_col)))
        .transform(_materialize)
    )
    anchors = av.where(F.col("_rk") <= cell_cap)
    lhs = anchors.select(
        F.col(id_col).alias("id_a"),
        F.col("cell"),
        F.col("dist").alias("dist_a"),
        F.col(vec_col).alias("va"),
        F.col("_nrm").alias("na"),
    )
    rhs = av.select(
        F.col(id_col).alias("id_b"),
        F.col("cell"),
        F.col("dist").alias("dist_b"),
        F.col(vec_col).alias("vb"),
        F.col("_nrm").alias("nb"),
    )
    # anchors are dist-ordered, not id-ordered, so an anchor×member
    # pair can arrive in either id orientation — canonicalize to
    # id_a < id_b AFTER the cosine (symmetric, identical rounding)
    # and distinct on the scalar columns (anchor-anchor pairs appear
    # in both orientations).
    dup = (
        lhs.join(rhs, "cell")
        .where(F.col("id_a") != F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            "dist_a",
            "dist_b",
            F.round(
                dot(F.col("va"), F.col("vb"))
                / (F.col("na") * F.col("nb")),
                6,
            ).alias("cos_sim"),
        )
        .where(F.col("cos_sim") >= threshold)
        .select(
            F.when(F.col("id_a") < F.col("id_b"), F.col("id_a"))
            .otherwise(F.col("id_b"))
            .alias("id_a"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("id_b"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("dist_a"))
            .otherwise(F.col("dist_b"))
            .alias("dist_a"),
            F.when(F.col("id_a") < F.col("id_b"), F.col("dist_b"))
            .otherwise(F.col("dist_a"))
            .alias("dist_b"),
            "cos_sim",
        )
        .distinct()
    )
    # the dropped member of a pair: closer to the centroid; equal
    # (rounded) distances drop the larger id
    loser = F.when(
        (F.col("dist_a") < F.col("dist_b"))
        | ((F.col("dist_a") == F.col("dist_b")) & (F.col("id_a") > F.col("id_b"))),
        F.col("id_a"),
    ).otherwise(F.col("id_b"))
    drops = (
        dup.select(loser.alias(id_col))
        .groupBy(id_col)
        .agg(F.count("*").alias("n_dup_pairs"))
    )
    return av.select(id_col, "cell", "dist").join(drops, id_col, "left").select(
        id_col,
        "cell",
        "dist",
        F.coalesce(F.col("n_dup_pairs"), F.lit(0)).cast("long").alias(
            "n_dup_pairs"
        ),
        F.col("n_dup_pairs").isNull().alias("keep"),
    )


def semdedup_sql(
    table: str,
    k: int = 8,
    iters: int = 2,
    threshold: float = 0.3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_cap: int = SEMDEDUP_CELL_CAP,
) -> str:
    """DuckDB twin of :func:`semdedup` — reuses the unrolled k-means
    generator so both engines derive identical cells and distances,
    and applies the IDENTICAL hot-cell anchor rule (row_number within
    cell by (dist DESC, id ASC), left join side capped)."""
    km = kmeans_ivf_sql(
        table, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    return f"""
WITH assigned0 AS ({km}),
assigned AS (
  SELECT *, row_number() OVER (
    PARTITION BY cell ORDER BY dist DESC, {id_col} ASC
  ) AS rk FROM assigned0
),
av AS MATERIALIZED (
  SELECT a.{id_col}, a.cell, a.dist, a.rk, e.{vec_col}
  FROM assigned a JOIN {table} e USING ({id_col})
),
anchors AS (
  SELECT {id_col}, cell, dist, {vec_col} FROM av WHERE rk <= {cell_cap}
),
dup AS (
  SELECT DISTINCT
         least(a.{id_col}, b.{id_col}) AS id_a,
         greatest(a.{id_col}, b.{id_col}) AS id_b,
         CASE WHEN a.{id_col} < b.{id_col} THEN a.dist ELSE b.dist END AS dist_a,
         CASE WHEN a.{id_col} < b.{id_col} THEN b.dist ELSE a.dist END AS dist_b,
         round(
           list_sum(list_transform(list_zip(a.{vec_col}, b.{vec_col}),
                                   p -> p[1]::DOUBLE * p[2]::DOUBLE))
           / (sqrt(list_sum(list_transform(a.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(b.{vec_col}, x -> x::DOUBLE * x::DOUBLE)))),
           6) AS cos_sim
  FROM anchors a JOIN av b ON a.cell = b.cell AND a.{id_col} <> b.{id_col}
),
losers AS (
  SELECT CASE WHEN dist_a < dist_b OR (dist_a = dist_b AND id_a > id_b)
              THEN id_a ELSE id_b END AS vid
  FROM dup WHERE cos_sim >= {threshold}
),
drops AS (
  SELECT vid, CAST(count(*) AS BIGINT) AS n_dup_pairs
  FROM losers GROUP BY vid
)
SELECT a.{id_col}, a.cell, a.dist,
       coalesce(d.n_dup_pairs, 0) AS n_dup_pairs,
       d.vid IS NULL AS keep
FROM assigned a LEFT JOIN drops d ON a.{id_col} = d.vid
"""
