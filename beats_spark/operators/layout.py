"""Z-order (Morton) multi-dimensional data layout + file-skip audit.

At 100 TB the dominant read cost is the files a scan must OPEN:
parquet min/max row-group stats let the reader skip a file only when
the data inside it is CLUSTERED on the filtered column. A linear sort
clusters exactly one dimension; interleaving the bits of several
dimensions (the Morton / Z-order space-filling curve, Morton 1966)
clusters ALL of them at once — each written file covers a small tile
of the d-dimensional space, so a range predicate on ANY of the
z-ordered dimensions touches few files. This is the layout step
Databricks ships as ``OPTIMIZE ... ZORDER BY`` and Iceberg as
z-order rewrites; here it is one ``repartitionByRange`` exchange at
write time, after which every later scan prunes for free.

No reference-repo counterpart (training-data extension per the
brief): the reference ships events to Elasticsearch, whose LSM
segments play this role; for a parquet lake the writer must do it.

Pipeline shape (all Column work, zero Python in the row path):

1. scale each dimension to an integer CELL in ``[0, 2^bits)`` with
   exact min/max bounds (one bounded agg — 2·d scalars, collected
   like the trained k-means centroids) and the same
   floor((x−lo)·n/span) arithmetic as ``heavyhitters.histogram_bins``
   — ``+ − * /`` and floor are correctly rounded (IEEE 754), so the
   DuckDB twin lands on bit-identical cells;
2. interleave the cell bits into one BIGINT z-code — pure shifts and
   masks, identical operators in both engines;
3. ``repartitionByRange`` on the z-code + ``sortWithinPartitions``
   realizes the curve order physically: consecutive z-ranges =
   d-dimensional tiles per file.

The audit half (:func:`file_skip_report` / :func:`skip_rate`) reads
the written layout back, reconstructs each file's per-column min/max
envelope — the exact information a parquet reader's predicate
pushdown consults — and reports the fraction of files a range
predicate may skip, so tests assert the layout WORKS rather than
trusting the curve.

Determinism note: the written FILE BOUNDARIES come from
``repartitionByRange``'s reservoir sampling and are not part of any
oracle contract; the z-codes themselves (what the driver row checks)
are exact cross-engine.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

#: per-dimension cell bits: 2 dims × 10 bits = 20-bit z-code, 1,024
#: cells per axis — plenty of resolution for file-level tiling (a
#: 100 TB table at 1 GB/file is ~10^5 files ≈ 2^17 tiles)
ZBITS = 10


# ---------------------------------------------------------------------------
# cell scaling (exact cross-engine arithmetic)


def minmax_bounds(df: DataFrame, dims: list[Column]) -> list[tuple[int, int]]:
    """Exact integer (lo, hi) per dimension — one agg, 2·d scalars
    (bounded collect, the centroids-as-literals pattern)."""
    aggs: list[Column] = []
    for i, c in enumerate(dims):
        v = c.cast("long")
        aggs.append(F.min(v).alias(f"lo{i}"))
        aggs.append(F.max(v).alias(f"hi{i}"))
    row = df.agg(*aggs).collect()[0]
    return [
        (int(row[f"lo{i}"]), int(row[f"hi{i}"])) for i in range(len(dims))
    ]


def scale_cell(x: Column, lo: int, hi: int, bits: int = ZBITS) -> Column:
    """``least(n−1, greatest(0, floor((x−lo)·n / span)))`` with
    ``span = hi−lo+1`` — the histogram_bins arithmetic, mirrored
    operation-for-operation by :func:`scale_cell_sql` so both engines
    round identically (|x−lo|·n must stay under 2^53; at 10 bits that
    allows dimension spans to 2^43)."""
    n = 1 << bits
    span = hi - lo + 1
    raw = F.floor(
        (x.cast("long") - F.lit(lo)).cast("double")
        * F.lit(n)
        / F.lit(span)
    ).cast("long")
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), raw)).cast("long")


def scale_cell_sql(expr: str, lo: str, hi: str, bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`scale_cell`; ``lo``/``hi`` are SQL
    expressions (scalars from a MATERIALIZED bounds CTE)."""
    n = 1 << bits
    return (
        f"least({n - 1}, greatest(0, CAST(floor("
        f"CAST(CAST({expr} AS BIGINT) - ({lo}) AS DOUBLE)"
        f" * {n} / (({hi}) - ({lo}) + 1)) AS BIGINT)))"
    )


# ---------------------------------------------------------------------------
# bit interleave (the Morton code)


def interleave_cells(cells: list[Column], bits: int = ZBITS) -> Column:
    """z = OR over bit j, dim i of ``bit_j(cell_i) << (j·d + i)`` —
    literal shift amounts only (pyspark's shiftleft/shiftright
    restriction), so the whole code is one codegen-friendly long
    expression.

    Guard: the interleaved code must fit a signed 64-bit long. Java
    shiftleft wraps the shift amount mod 64 (7 dims × 10 bits would
    silently corrupt codes) while DuckDB's ``<<`` does not wrap — the
    engines would diverge, so refuse up front."""
    d = len(cells)
    if d * bits > 63:
        raise ValueError(
            f"interleave_cells: {d} dims x {bits} bits = {d * bits} "
            "code bits > 63 — shift amounts would wrap mod 64 on the "
            "JVM; lower bits or dims"
        )
    parts = [
        F.shiftleft(
            F.shiftright(c, j).bitwiseAND(F.lit(1)), j * d + i
        )
        for j in range(bits)
        for i, c in enumerate(cells)
    ]
    return reduce(Column.bitwiseOR, parts).cast("long")


def interleave_cells_sql(exprs: list[str], bits: int = ZBITS) -> str:
    """DuckDB twin of :func:`interleave_cells` (same shift/mask ops).

    Every term is FULLY parenthesized: DuckDB gives ``& | << >>`` one
    shared precedence tier (left-associative, the Postgres rule), so
    an unwrapped ``a << 0 | b << 2`` parses as ``((a << 0) | b) << 2``
    and overflows."""
    d = len(exprs)
    if d * bits > 63:
        raise ValueError(
            f"interleave_cells_sql: {d} dims x {bits} bits > 63"
        )
    terms = [
        f"(((({e}) >> {j}) & 1) << {j * d + i})"
        for j in range(bits)
        for i, e in enumerate(exprs)
    ]
    return "(" + " | ".join(terms) + ")"


def ztile(z: Column, d: int, bits: int = ZBITS, tile_bits: int = 4) -> Column:
    """Top ``tile_bits`` of the z-code = the quadtree tile index (the
    coarse spatial bucket a file-range covers)."""
    return F.shiftright(z, d * bits - tile_bits).cast("long")


def ztile_sql(expr: str, d: int, bits: int = ZBITS, tile_bits: int = 4) -> str:
    return f"(({expr}) >> {d * bits - tile_bits})"


# ---------------------------------------------------------------------------
# high-level: add the code, write the layout


def add_zorder(
    df: DataFrame,
    dims: list[Column],
    bits: int = ZBITS,
    bounds: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Append a ``zorder`` BIGINT column interleaving ``dims``.

    The cell columns are materialized in their OWN select before the
    interleave — each cell feeds ``bits`` bit-extract terms and a
    reused Column expression is recomputed per use (the
    expression-reuse gotcha, see minhash_signature)."""
    if bounds is None:
        bounds = minmax_bounds(df, dims)
    cells = [
        scale_cell(c, lo, hi, bits).alias(f"_zc{i}")
        for i, (c, (lo, hi)) in enumerate(zip(dims, bounds))
    ]
    staged = df.select("*", *cells)
    z = interleave_cells(
        [F.col(f"_zc{i}") for i in range(len(dims))], bits
    )
    return staged.select(
        *df.columns, z.alias("zorder")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    dims: list[Column],
    n_files: int,
    bits: int = ZBITS,
    bounds: list[tuple[int, int]] | None = None,
    curve: str = "zorder",
) -> None:
    """The OPTIMIZE-ZORDER analog: one range exchange on the curve
    code, curve-sorted within each output file. Every later scan
    filtering on ANY of ``dims`` prunes files via parquet min/max
    stats. ``curve='hilbert'`` (2 dims only) swaps in the
    Hilbert index — tighter tiles, same write shape."""
    if curve == "hilbert":
        zdf = add_hilbert(df, dims, bits=bits, bounds=bounds)
        key = "hilbert"
    elif curve == "zorder":
        zdf = add_zorder(df, dims, bits=bits, bounds=bounds)
        key = "zorder"
    else:
        raise ValueError(f"unknown curve: {curve!r}")
    (
        zdf.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .parquet(path)
    )


def linear_write(
    df: DataFrame, path: str, order_col: str, n_files: int
) -> None:
    """Single-dimension range layout (the comparison baseline: best
    possible pruning on ``order_col``, none on anything else)."""
    (
        df.repartitionByRange(n_files, order_col)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# file-skip audit


def file_skip_report(
    spark: SparkSession, path: str, cols: list[str]
) -> DataFrame:
    """Per-file min/max envelope of ``cols`` — the information a
    parquet reader's predicate pushdown consults, reconstructed by
    scan so the test measures the LAYOUT, not the writer's claims.
    One groupBy over file names (≤ n_files groups)."""
    df = spark.read.parquet(path)
    aggs: list[Column] = []
    for c in cols:
        aggs.append(F.min(c).alias(f"min_{c}"))
        aggs.append(F.max(c).alias(f"max_{c}"))
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(*aggs)
    )


def skip_rate(report: DataFrame, col: str, lo, hi) -> float:
    """Fraction of files a ``col BETWEEN lo AND hi`` predicate may
    skip: the file's [min,max] envelope misses the range entirely.
    Driver-side over the bounded per-file report."""
    n = report.count()
    if n == 0:
        return 0.0
    hit = report.filter(
        ~((F.col(f"max_{col}") < F.lit(lo)) | (F.col(f"min_{col}") > F.lit(hi)))
    ).count()
    return 1.0 - hit / n


# ---------------------------------------------------------------------------
# small-file compaction


def dataset_file_stats(path: str) -> tuple[int, int]:
    """(n_files, total_bytes) of a parquet dataset — a DRIVER-side
    filesystem metadata listing (bounded: one stat per file, the same
    listing the scan planner does; at warehouse scale this comes from
    the table catalog instead)."""
    import os

    n, total = 0, 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_dataset(
    spark: SparkSession,
    path: str,
    out_path: str,
    order_col: str = "zorder",
    target_bytes: int = 128 << 20,
) -> dict:
    """Coalesce a many-small-files dataset into ~``target_bytes``
    files while PRESERVING the clustering ``order_col`` established
    at write time (z-order, shard order, …).

    The small-file problem is the quiet 100-TB killer: a 1000-executor
    job writing per-task files turns the next scan into millions of
    opens and the min/max envelopes into confetti. Compaction is one
    range exchange on the SAME order column the layout was built on —
    the file count changes, the curve order (and so the skip-rate, see
    :func:`file_skip_report`) survives. Output file count is sized
    from the measured input bytes, floor 1 (the Iceberg/Delta
    ``rewrite_data_files``/``OPTIMIZE`` shape).

    Returns ``{"n_files_in", "bytes_in", "n_files_out"}`` for the
    caller's audit trail. Writes to ``out_path``; atomically swapping
    it over ``path`` is the caller's move (the manifest pattern,
    operators/manifest.py).
    """
    n_in, bytes_in = dataset_file_stats(path)
    n_out = max(1, -(-bytes_in // target_bytes))
    df = spark.read.parquet(path)
    (
        df.repartitionByRange(n_out, order_col)
        .sortWithinPartitions(order_col)
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return {
        "n_files_in": n_in,
        "bytes_in": bytes_in,
        "n_files_out": dataset_file_stats(out_path)[0],
    }


def skip_rate_and(report: DataFrame, preds: dict[str, tuple]) -> float:
    """Skip-rate for a CONJUNCTIVE predicate ``AND_i col_i BETWEEN
    (lo_i, hi_i)`` — the query shape z-order actually serves: a file
    is skippable when ANY dimension's [min,max] envelope misses its
    range. Always ≥ the best single-dimension rate."""
    n = report.count()
    if n == 0 or not preds:
        return 0.0
    hit = report
    for col, (lo, hi) in preds.items():
        hit = hit.filter(
            ~(
                (F.col(f"max_{col}") < F.lit(lo))
                | (F.col(f"min_{col}") > F.lit(hi))
            )
        )
    return 1.0 - hit.count() / n


# ---------------------------------------------------------------------------
# Hilbert curve (d=2): better locality than Z-order, same contract


def add_hilbert(
    df: DataFrame,
    dims: list[Column],
    bits: int = ZBITS,
    bounds: list[tuple[int, int]] | None = None,
) -> DataFrame:
    """Append a ``hilbert`` BIGINT column: the Hilbert-curve index of
    the two scaled cells. The Hilbert curve is the locality upgrade
    over Morton — EVERY consecutive pair of indices is grid-adjacent
    (|Δx|+|Δy| = 1, no Z-shape jumps), so range-partitioned files
    cover tighter tiles; Databricks ships it as liquid clustering's
    curve. d=2 only (the standard xy→d transform; Hamilton 1891 /
    the classic bit-twiddling loop).

    The per-bit state transition mutates (x, y, d) with conditionals
    that reuse x and y several times — inlining the whole loop would
    blow the expression tree up 3^bits-fold (the expression-reuse
    gotcha at its worst), so each iteration is its OWN projection
    over concrete columns: ``bits`` chained map-stage selects, each
    O(1) expressions, zero exchanges. The DuckDB twin
    (:func:`hilbert_sql`) materializes the same chain as CTEs; all
    arithmetic is integer CASE work — exact in both engines."""
    if len(dims) != 2:
        raise ValueError("add_hilbert supports exactly 2 dimensions")
    if bounds is None:
        bounds = minmax_bounds(df, dims)
    staged = df.select(
        "*",
        scale_cell(dims[0], *bounds[0], bits).alias("_hx"),
        scale_cell(dims[1], *bounds[1], bits).alias("_hy"),
    ).withColumn("_hd", F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = F.when(F.col("_hx").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        ry = F.when(F.col("_hy").bitwiseAND(F.lit(s)) > 0, 1).otherwise(0)
        quad = (
            F.when((rx == 0) & (ry == 0), 0)
            .when((rx == 0) & (ry == 1), 1)
            .when((rx == 1) & (ry == 1), 2)
            .otherwise(3)
        )
        d_new = F.col("_hd") + F.lit(s).cast("long") * F.lit(s) * quad
        # rotation: ry==1 keeps (x,y); ry==0 swaps, flipping both
        # when rx==1
        xf = F.when(rx == 1, F.lit(s - 1) - F.col("_hx")).otherwise(
            F.col("_hx")
        )
        yf = F.when(rx == 1, F.lit(s - 1) - F.col("_hy")).otherwise(
            F.col("_hy")
        )
        x_new = F.when(ry == 1, F.col("_hx")).otherwise(yf)
        y_new = F.when(ry == 1, F.col("_hy")).otherwise(xf)
        staged = staged.select(
            *df.columns,
            x_new.cast("long").alias("_hx"),
            y_new.cast("long").alias("_hy"),
            d_new.cast("long").alias("_hd"),
        )
    return staged.select(*df.columns, F.col("_hd").alias("hilbert"))


def hilbert_sql(
    table: str,
    dim_exprs: list[str],
    bits: int = ZBITS,
    cols: str = "*",
) -> str:
    """DuckDB twin of :func:`add_hilbert` — the same per-bit chain as
    MATERIALIZED CTEs (the unrolled-loop precedent: classifier GD),
    bounds computed in a leading CTE exactly like the zorder twin."""
    if len(dim_exprs) != 2:
        raise ValueError("hilbert_sql supports exactly 2 dimensions")
    e0, e1 = dim_exprs
    c0 = scale_cell_sql(e0, "(SELECT lo0 FROM _hb)", "(SELECT hi0 FROM _hb)", bits)
    c1 = scale_cell_sql(e1, "(SELECT lo1 FROM _hb)", "(SELECT hi1 FROM _hb)", bits)
    parts = [
        f"""
WITH _hb AS MATERIALIZED (
  SELECT min(CAST({e0} AS BIGINT)) lo0, max(CAST({e0} AS BIGINT)) hi0,
         min(CAST({e1} AS BIGINT)) lo1, max(CAST({e1} AS BIGINT)) hi1
  FROM {table}
),
_h{bits} AS MATERIALIZED (
  SELECT {cols}, {c0} AS hx, {c1} AS hy, CAST(0 AS BIGINT) AS hd
  FROM {table}
)"""
    ]
    prev = f"_h{bits}"
    for i in range(bits - 1, -1, -1):
        s = 1 << i
        rx = f"(CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END)"
        ry = f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)"
        quad = (
            f"(CASE WHEN {rx} = 0 AND {ry} = 0 THEN 0 "
            f"WHEN {rx} = 0 AND {ry} = 1 THEN 1 "
            f"WHEN {rx} = 1 AND {ry} = 1 THEN 2 ELSE 3 END)"
        )
        xf = f"(CASE WHEN {rx} = 1 THEN {s - 1} - hx ELSE hx END)"
        yf = f"(CASE WHEN {rx} = 1 THEN {s - 1} - hy ELSE hy END)"
        parts.append(
            f""",
_h{i} AS MATERIALIZED (
  SELECT {cols},
         CAST(CASE WHEN {ry} = 1 THEN hx ELSE {yf} END AS BIGINT) AS hx,
         CAST(CASE WHEN {ry} = 1 THEN hy ELSE {xf} END AS BIGINT) AS hy,
         CAST(hd + {s}::BIGINT * {s} * {quad} AS BIGINT) AS hd
  FROM {prev}
)"""
        )
        prev = f"_h{i}"
    parts.append(f"\nSELECT {cols}, hd AS hilbert FROM {prev}")
    return "".join(parts)
