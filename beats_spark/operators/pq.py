"""Product quantization (IVF-PQ's PQ half).

PQ (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
Search") is the compression every production-scale vector store runs:
split each vector into ``m`` subvectors, train an independent
``ks``-centroid codebook per subspace, and store each vector as ``m``
small codes — 64 float32 dims become m bytes, and asymmetric distance
needs only ``m`` table lookups per pair. It composes with the trained
IVF in similarity.py exactly the way FAISS composes IVF+PQ.

Spark shape (the part that matters at 100 TB):

* **Training** reuses the deterministic distributed Lloyd machinery
  (`similarity._km_train`) per subspace over ONE scaled, checkpointed
  corpus pass — per iteration a pure-map assignment (centroids are
  driver literals: m×ks×(dim/m) doubles — bytes, not data) plus a
  (cell, pos) integer aggregation. Production trainers codebook-train
  on a sample; pass a sampled df here and encode the full corpus.
* **Encoding** is ONE narrow select: all m argmins evaluate in a
  single stage — zero shuffle, zero join, no Python (plan-pinned in
  tests/test_pq.py). This is the pass that actually touches 100 TB.

Determinism (oracle lock-step): the scaled-integer space, the
(dist, cell) lexicographic tie-break, and the 6-dp dist rounding are
the same as `kmeans_ivf`, so the DuckDB twin is simply m
`kmeans_ivf_sql` trainings over `list_slice` subvectors joined on id
— no new SQL machinery.

No reference-repo counterpart (training-data extension per the
brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..plans.materialize import materialize as _materialize

from .similarity import KMEANS_SCALE, _km_scaled, _km_train, kmeans_ivf_sql


def pq_train(
    df: DataFrame,
    m: int = 2,
    ks: int = 8,
    iters: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[tuple[int, list[float]]]]:
    """Train ``m`` per-subspace codebooks (``ks`` centroids each).
    Returns driver-side centroid literals, one book per subspace."""
    xq = _km_scaled(df, id_col, vec_col).transform(_materialize)
    dim = xq.select(F.size("xq").alias("d")).first()["d"]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    d = dim // m
    return [
        _km_train(
            xq.select("vid", F.slice("xq", j * d + 1, d).alias("xq")),
            ks,
            iters,
        )
        for j in range(m)
    ]


def pq_encode(
    df: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<long>, dists array<double>): per-subspace
    nearest-centroid code + its squared-euclidean distance in original
    units (rounded 6 dp, `kmeans_ivf` discipline). One map-only stage:
    the subvector slices materialize once per row (expression-reuse
    gotcha — each book's ks distance folds scan its slice), then all
    m argmins evaluate together."""
    m = len(books)
    d = len(books[0][0][1])
    xq = _km_scaled(df, id_col, vec_col)
    staged = xq.select(
        "vid",
        *[F.slice("xq", j * d + 1, d).alias(f"_s{j}") for j in range(m)],
    )

    def best(j: int, book):
        scored = F.array(
            *[
                F.struct(
                    F.aggregate(
                        F.zip_with(
                            F.col(f"_s{j}"),
                            F.array(*[F.lit(float(x)) for x in cvec]),
                            lambda a, b: (a.cast("double") - b)
                            * (a.cast("double") - b),
                        ),
                        F.lit(0.0),
                        lambda acc, x: acc + x,
                    ).alias("dist"),
                    F.lit(int(cell)).alias("cell"),
                )
                for cell, cvec in book
            ]
        )
        # same tie-break as _km_assign: min dist, then lowest cell
        return F.array_min(scored)

    picked = staged.select(
        "vid", *[best(j, bk).alias(f"_b{j}") for j, bk in enumerate(books)]
    )
    scale2 = float(KMEANS_SCALE) ** 2
    return picked.select(
        F.col("vid").alias(id_col),
        F.array(
            *[F.col(f"_b{j}")["cell"].cast("long") for j in range(m)]
        ).alias("codes"),
        F.array(
            *[
                F.round(F.col(f"_b{j}")["dist"] / F.lit(scale2), 6)
                for j in range(m)
            ]
        ).alias("dists"),
    )


# -- ADC search ---------------------------------------------------------------


def _sq_fold(vec, cvec: list[float]):
    """Squared euclidean between a scaled-long slice column and a
    centroid literal — the `_km_assign` arithmetic."""
    return F.aggregate(
        F.zip_with(
            vec,
            F.array(*[F.lit(float(x)) for x in cvec]),
            lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_topk(
    df: DataFrame,
    books: list[list[tuple[int, list[float]]]],
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes — the IVF-PQ
    search half: each query precomputes an m×ks lookup table of
    subspace distances to every codebook centroid, and a candidate's
    score is just ``sum_j lut[j, code_j]`` — m integer lookups per
    (query, candidate) pair, never a dim-wide fold. That asymmetry is
    the whole point of PQ search: at 100 TB the corpus contributes
    only its m-byte codes (posexplode → broadcast LUT join → partial
    agg); vectors are never touched after encoding.

    Determinism: every LUT entry snaps to an integer (scaled space —
    magnitudes ≈1e13, exact in a long), so the per-candidate sum is
    order-free; final distance divides once and rounds 6 dp; ranking
    ties break on neighbor id. Returns (q_id, neighbor_id, adc_dist,
    rank) with adc_dist the squared euclidean to the RECONSTRUCTION —
    approximate by construction."""
    m = len(books)
    d = len(books[0][0][1])
    scale2 = float(KMEANS_SCALE) ** 2

    codes = pq_encode(df, books).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    qxq = _km_scaled(
        df.where(F.col(id_col).isin(query_ids)), id_col, vec_col
    )
    staged = qxq.select(
        F.col("vid").alias("q_id"),
        *[F.slice("xq", j * d + 1, d).alias(f"_s{j}") for j in range(m)],
    )
    entries = F.flatten(
        F.array(
            *[
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.lit(int(cell)).alias("cell"),
                            F.floor(
                                _sq_fold(F.col(f"_s{j}"), cvec) + F.lit(0.5)
                            )
                            .cast("long")
                            .alias("qdist"),
                        )
                        for cell, cvec in book
                    ]
                )
                for j, book in enumerate(books)
            ]
        )
    )
    lut = staged.select("q_id", F.explode(entries).alias("e")).select(
        "q_id", "e.j", "e.cell", "e.qdist"
    )

    ex = codes.select(
        "neighbor_id", F.posexplode("codes").alias("j", "cell")
    )
    scored = (
        ex.join(F.broadcast(lut), ["j", "cell"])
        .where(F.col("neighbor_id") != F.col("q_id"))
        .groupBy("q_id", "neighbor_id")
        .agg(
            F.round(
                F.sum("qdist").cast("double") / F.lit(scale2), 6
            ).alias("adc_dist")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "adc_dist", "rank")
    )


def ivf_pq_topk(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    n_cells: int = 8,
    ivf_iters: int = 2,
    nprobe: int = 1,
    m: int = 2,
    ks: int = 8,
    pq_iters: int = 1,
    rerank: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The full FAISS-style IVF-PQ composition: coarse-quantize the
    corpus into ``n_cells`` trained IVF cells (similarity.kmeans_ivf),
    PQ-encode every vector, then answer a query by ADC-ranking ONLY
    the vectors in its ``nprobe`` nearest cells. Approximate on both
    axes (cell recall × code quantization) — the trade every
    production vector store makes.

    ``rerank=R`` (R ≥ k) adds the production refine step: the ADC
    pass keeps its top R candidates per query, and only those q×R
    rows re-join their ORIGINAL vectors for an exact distance — the
    fix for PQ's known failure mode (reconstruction error swamps the
    fine ordering inside a tight neighborhood; measured on clustered
    fixtures: cluster-recall 1.0 but exact-recall ~0.3 without
    rerank, ~1.0 with). The corpus-wide pass still never touches
    vectors; rerank touches exactly q×R.

    Plan: candidate generation is an equi-join on ``cell`` (the r2
    verdict's ann_ivf fix — never array_contains in a join), scoring
    is the broadcast-LUT m-lookup sum from :func:`pq_topk`. Each
    component is oracle-checked on its own driver row; the
    composition is covered by recall floors in tests/test_pq.py."""
    from .similarity import kmeans_ivf

    assigned = kmeans_ivf(
        df, k=n_cells, iters=ivf_iters, id_col=id_col, vec_col=vec_col
    ).select(id_col, "cell")

    books = pq_train(
        df, m=m, ks=ks, iters=pq_iters, id_col=id_col, vec_col=vec_col
    )
    codes = pq_encode(df, books, id_col=id_col, vec_col=vec_col).select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    cand = codes.join(
        assigned.select(F.col(id_col).alias("neighbor_id"), "cell"),
        "neighbor_id",
    )

    # queries probe their nprobe nearest IVF cells: rebuild the full
    # centroids the same way kmeans_ivf trains them, score the (tiny)
    # query side, explode to (q_id, cell) probe rows
    xq = _km_scaled(df, id_col, vec_col).transform(_materialize)
    cents = _km_train(xq, n_cells, ivf_iters)
    qonly = xq.where(F.col("vid").isin(query_ids))
    probe_scored = F.array(
        *[
            F.struct(
                _sq_fold(F.col("xq"), cvec).alias("dist"),
                F.lit(int(cell)).alias("cell"),
            )
            for cell, cvec in cents
        ]
    )
    probes = (
        qonly.select(
            F.col("vid").alias("q_id"),
            F.explode(
                F.slice(F.array_sort(probe_scored), 1, nprobe)
            ).alias("p"),
        ).select("q_id", F.col("p.cell").alias("cell"))
    )

    d = len(books[0][0][1])
    staged = xq.where(F.col("vid").isin(query_ids)).select(
        F.col("vid").alias("q_id"),
        *[F.slice("xq", j * d + 1, d).alias(f"_s{j}") for j in range(m)],
    )
    entries = F.flatten(
        F.array(
            *[
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            F.lit(int(cell)).alias("cell_j"),
                            F.floor(
                                _sq_fold(F.col(f"_s{j}"), cvec) + F.lit(0.5)
                            )
                            .cast("long")
                            .alias("qdist"),
                        )
                        for cell, cvec in book
                    ]
                )
                for j, book in enumerate(books)
            ]
        )
    )
    lut = staged.select("q_id", F.explode(entries).alias("e")).select(
        "q_id", F.col("e.j").alias("j"), F.col("e.cell_j").alias("cell_j"),
        "e.qdist",
    )

    # candidates = probed cells only (equi-join on cell), then the ADC
    # m-lookup sum
    probed = cand.join(F.broadcast(probes), "cell").where(
        F.col("neighbor_id") != F.col("q_id")
    )
    ex = probed.select(
        "q_id", "neighbor_id", F.posexplode("codes").alias("j", "cell_j")
    )
    scale2 = float(KMEANS_SCALE) ** 2
    scored = (
        ex.join(F.broadcast(lut), ["q_id", "j", "cell_j"])
        .groupBy("q_id", "neighbor_id")
        .agg(
            F.round(
                F.sum("qdist").cast("double") / F.lit(scale2), 6
            ).alias("adc_dist")
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("q_id").orderBy(
        F.asc("adc_dist"), F.asc("neighbor_id")
    )
    ranked = scored.withColumn("rank", F.row_number().over(w))
    if not rerank:
        return ranked.where(F.col("rank") <= k).select(
            "q_id", "neighbor_id", "adc_dist", "rank"
        )

    # refine: exact snapped distance for the surviving q×R rows only
    if rerank < k:
        raise ValueError(f"rerank={rerank} < k={k}")
    cand2 = ranked.where(F.col("rank") <= rerank).select(
        "q_id", "neighbor_id"
    )
    nvec = xq.select(
        F.col("vid").alias("neighbor_id"), F.col("xq").alias("nxq")
    )
    qvec = qonly.select(F.col("vid").alias("q_id"), F.col("xq").alias("qxq"))
    exact = cand2.join(nvec, "neighbor_id").join(F.broadcast(qvec), "q_id")
    edist = F.round(
        F.floor(
            F.aggregate(
                F.zip_with(
                    "qxq",
                    "nxq",
                    lambda a, b: (a.cast("double") - b.cast("double"))
                    * (a.cast("double") - b.cast("double")),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            + F.lit(0.5)
        ).cast("double")
        / F.lit(scale2),
        6,
    )
    rescored = exact.select("q_id", "neighbor_id", edist.alias("dist"))
    w2 = Window.partitionBy("q_id").orderBy(
        F.asc("dist"), F.asc("neighbor_id")
    )
    return (
        rescored.withColumn("rank", F.row_number().over(w2))
        .where(F.col("rank") <= k)
        .select("q_id", "neighbor_id", "dist", "rank")
    )


def pq_topk_sql(
    table: str,
    query_ids: list[int],
    m: int = 2,
    ks: int = 8,
    iters: int = 1,
    k: int = 10,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """DuckDB twin of :func:`pq_topk`: codes + trained centroids both
    rebuilt from the data via the unrolled k-means twin, LUT and ADC
    sum recomputed independently."""
    d = dim // m
    ids = ",".join(str(i) for i in query_ids)

    def sub(j: int) -> str:
        return (
            f"(SELECT {id_col}, list_slice({vec_col}, {j * d + 1}, "
            f"{j * d + d}) AS {vec_col} FROM {table})"
        )

    code_ctes = ",\n".join(
        f"codes{j} AS ({kmeans_ivf_sql(sub(j), k=ks, iters=iters, id_col=id_col, vec_col=vec_col)})"
        for j in range(m)
    )
    cent_ctes = ",\n".join(
        f"cents{j} AS ({kmeans_ivf_sql(sub(j), k=ks, iters=iters, id_col=id_col, vec_col=vec_col, emit='centroids')})"
        for j in range(m)
    )
    lut_parts = "\nUNION ALL\n".join(
        f"""SELECT q.q_id, {j} AS j, c.cell,
       CAST(floor(list_sum(list_transform(
              list_zip(list_slice(q.qxq, {j * d + 1}, {j * d + d}), c.cvec),
              p -> (p[1]::DOUBLE - p[2]) * (p[1]::DOUBLE - p[2]))) + 0.5)
            AS BIGINT) AS qdist
FROM q CROSS JOIN cents{j} c"""
        for j in range(m)
    )
    ex_parts = "\nUNION ALL\n".join(
        f"SELECT {id_col} AS neighbor_id, {j} AS j, cell FROM codes{j}"
        for j in range(m)
    )
    return f"""
WITH {code_ctes},
{cent_ctes},
q AS (
  SELECT {id_col} AS q_id,
         list_transform({vec_col},
           x -> CAST(floor(x::DOUBLE * {KMEANS_SCALE} + 0.5) AS BIGINT))
           AS qxq
  FROM {table} WHERE {id_col} IN ({ids})
),
lut AS (
{lut_parts}
),
ex AS (
{ex_parts}
),
scored AS (
  SELECT q_id, neighbor_id,
         round(CAST(sum(qdist) AS DOUBLE) / {float(KMEANS_SCALE) ** 2:.1f}, 6)
           AS adc_dist
  FROM ex JOIN lut USING (j, cell)
  WHERE neighbor_id <> q_id
  GROUP BY q_id, neighbor_id
)
SELECT q_id, neighbor_id, adc_dist, CAST(rank AS BIGINT) AS rank FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY adc_dist ASC, neighbor_id ASC) AS rank
  FROM scored
) WHERE rank <= {k}
"""
