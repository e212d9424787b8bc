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

from .similarity import KMEANS_SCALE, _km_scaled, _km_train


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
    xq = _km_scaled(df, id_col, vec_col).localCheckpoint()
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
