"""Z-order layout (operators/layout.py): Morton-code correctness vs a
pure-Python reference, DuckDB twin parity on the documents table, and
a written-layout skip-rate audit proving z-order prunes on BOTH
dimensions where a linear sort prunes on one."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _py_morton(cells: list[int], bits: int) -> int:
    z = 0
    for j in range(bits):
        for i, c in enumerate(cells):
            z |= ((c >> j) & 1) << (j * len(cells) + i)
    return z


class TestInterleave:
    def test_matches_python_reference(self, spark):
        from beats_spark.operators.layout import interleave_cells

        pts = [(0, 0), (1, 0), (0, 1), (3, 5), (1023, 1023), (512, 7)]
        df = spark.createDataFrame(pts, "c0 long, c1 long")
        got = {
            (r["c0"], r["c1"]): r["z"]
            for r in df.select(
                "c0",
                "c1",
                interleave_cells([F.col("c0"), F.col("c1")], 10).alias("z"),
            ).collect()
        }
        for c0, c1 in pts:
            assert got[(c0, c1)] == _py_morton([c0, c1], 10)

    def test_z_locality_beats_linear_key(self):
        # the property the layout exploits: points close in BOTH dims
        # get close z-codes, while a linear key ignores dim 2 entirely
        near = _py_morton([10, 10], 10), _py_morton([11, 11], 10)
        far = _py_morton([10, 10], 10), _py_morton([10, 1000], 10)
        assert abs(near[0] - near[1]) < abs(far[0] - far[1])

    def test_sql_twin_bit_identical(self, spark):
        from beats_spark.operators.layout import (
            interleave_cells,
            interleave_cells_sql,
        )

        df = spark.createDataFrame(
            [(i * 37 % 1024, i * 91 % 1024) for i in range(200)],
            "c0 long, c1 long",
        )
        rows = df.select(
            "c0",
            "c1",
            interleave_cells([F.col("c0"), F.col("c1")], 10).alias("z"),
        ).collect()
        con = duckdb.connect()
        expr = interleave_cells_sql(["c0", "c1"], 10)
        for r in rows:
            (want,) = con.execute(
                f"SELECT {expr} FROM (SELECT {r['c0']}::BIGINT c0, "
                f"{r['c1']}::BIGINT c1)"
            ).fetchone()
            assert want == r["z"]


class TestScaleAndParity:
    def test_scale_cell_bounds(self, spark):
        from beats_spark.operators.layout import scale_cell

        df = spark.createDataFrame(
            [(0,), (50,), (100,)], "x long"
        )
        cells = [
            r["c"]
            for r in df.select(
                scale_cell(F.col("x"), 0, 100, bits=4).alias("c")
            ).orderBy("x").collect()
        ]
        # 16 cells over span 101: exact floor arithmetic
        assert cells == [0, 50 * 16 // 101, 100 * 16 // 101]
        assert all(0 <= c <= 15 for c in cells)

    def test_documents_zorder_duckdb_parity(self, spark):
        """Full-pipeline twin on the real table: bounds CTE + scaled
        cells + interleave, hash-for-hash per doc."""
        from beats_spark.operators.layout import (
            add_zorder,
            interleave_cells_sql,
            scale_cell_sql,
        )
        from beats_spark.functions.textstats import word_code_sql
        from beats_spark.functions.textstats import word_code

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        dims = [F.col("n_chars"), word_code(F.col("source"))]
        got = {
            r["doc_id"]: r["zorder"]
            for r in add_zorder(docs, dims, bits=10).collect()
        }

        code = word_code_sql("source")
        c0 = scale_cell_sql(
            "n_chars", "(SELECT lo0 FROM _zb)", "(SELECT hi0 FROM _zb)", 10
        )
        c1 = scale_cell_sql(
            code, "(SELECT lo1 FROM _zb)", "(SELECT hi1 FROM _zb)", 10
        )
        sql = f"""
WITH _zb AS MATERIALIZED (
  SELECT min(CAST(n_chars AS BIGINT)) lo0, max(CAST(n_chars AS BIGINT)) hi0,
         min({code}) lo1, max({code}) hi1
  FROM docs
),
_zc AS MATERIALIZED (
  SELECT doc_id, {c0} AS c0, {c1} AS c1 FROM docs
)
SELECT doc_id, {interleave_cells_sql(['c0', 'c1'], 10)} AS z FROM _zc
"""
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW docs AS SELECT * FROM "
            f"parquet_scan('{SF_DIR}/documents.parquet')"
        )
        want = dict(con.execute(sql).fetchall())
        assert got == want


class TestWrittenLayout:
    @pytest.fixture(scope="class")
    def grid(self, spark):
        # 64×64 uniform grid: every (x, y) once — both dims identically
        # distributed, so pruning differences are pure LAYOUT
        return spark.range(64 * 64).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )

    def test_zorder_prunes_both_dims(self, spark, grid, tmp_path_factory):
        from beats_spark.operators.layout import (
            file_skip_report,
            linear_write,
            skip_rate,
            zorder_write,
        )

        root = tmp_path_factory.mktemp("layout")
        zpath, lpath = str(root / "z"), str(root / "lin")
        zorder_write(
            grid, zpath, [F.col("x"), F.col("y")], n_files=16, bits=6,
            bounds=[(0, 63), (0, 63)],
        )
        linear_write(grid, lpath, "x", n_files=16)

        zrep = file_skip_report(spark, zpath, ["x", "y"])
        lrep = file_skip_report(spark, lpath, ["x", "y"])

        # narrow band on each dim (1/8 of the range)
        z_x, z_y = skip_rate(zrep, "x", 8, 15), skip_rate(zrep, "y", 8, 15)
        l_x, l_y = skip_rate(lrep, "x", 8, 15), skip_rate(lrep, "y", 8, 15)

        # linear: perfect on its sort key, blind on the other
        assert l_x >= 0.8
        assert l_y == 0.0
        # z-order: substantial pruning on BOTH dims
        assert z_x >= 0.5
        assert z_y >= 0.5

    def test_skip_report_matches_parquet_stats(
        self, spark, grid, tmp_path_factory
    ):
        """The scan-derived envelopes equal the parquet footer stats a
        real reader would consult (independent DuckDB metadata read)."""
        from beats_spark.operators.layout import (
            file_skip_report,
            zorder_write,
        )

        root = tmp_path_factory.mktemp("layout_meta")
        zpath = str(root / "z")
        zorder_write(
            grid, zpath, [F.col("x"), F.col("y")], n_files=8, bits=6,
            bounds=[(0, 63), (0, 63)],
        )
        rep = {
            r["_file"].split("/")[-1]: (r["min_y"], r["max_y"])
            for r in file_skip_report(spark, zpath, ["x", "y"]).collect()
        }
        con = duckdb.connect()
        meta = con.execute(
            f"""
SELECT regexp_extract(file_name, '[^/]+$') AS f,
       min(CAST(stats_min_value AS BIGINT)),
       max(CAST(stats_max_value AS BIGINT))
FROM parquet_metadata('{zpath}/*.parquet')
WHERE path_in_schema = 'y'
GROUP BY 1
"""
        ).fetchall()
        assert len(meta) == len(rep)
        for f, lo, hi in meta:
            assert rep[f] == (lo, hi)


class TestCompaction:
    def test_compact_preserves_order_and_counts(
        self, spark, tmp_path_factory
    ):
        """Small-file compaction (layout.compact_dataset): row parity,
        fewer files, and the z-curve clustering SURVIVES — per-file
        zorder ranges stay non-overlapping and the skip-rate on both
        dims stays within reach of the pre-compaction layout."""
        from beats_spark.operators.layout import (
            compact_dataset,
            dataset_file_stats,
            file_skip_report,
            skip_rate,
            zorder_write,
        )
        import duckdb

        grid = spark.range(64 * 64).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
        root = tmp_path_factory.mktemp("compact")
        src, dst = str(root / "many"), str(root / "few")
        zorder_write(
            grid, src, [F.col("x"), F.col("y")],
            n_files=32, bits=6, bounds=[(0, 63), (0, 63)],
        )
        n_in, bytes_in = dataset_file_stats(src)
        assert n_in == 32
        stats = compact_dataset(
            spark, src, dst, order_col="zorder",
            target_bytes=max(1, bytes_in // 4),
        )
        assert stats["n_files_in"] == 32
        assert stats["n_files_out"] <= 8

        con = duckdb.connect()
        (n_src,) = con.execute(
            f"SELECT count(*) FROM parquet_scan('{src}/*.parquet')"
        ).fetchone()
        (n_dst,) = con.execute(
            f"SELECT count(*) FROM parquet_scan('{dst}/*.parquet')"
        ).fetchone()
        assert n_src == n_dst == 64 * 64

        # non-overlapping per-file z ranges = the curve order survived
        ranges = sorted(
            (r["min_zorder"], r["max_zorder"])
            for r in file_skip_report(spark, dst, ["zorder"]).collect()
        )
        for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
            assert hi_prev <= lo_next

        rep = file_skip_report(spark, dst, ["x", "y"])
        # fewer, bigger tiles prune less than 16-file z-order but must
        # still prune SOMETHING on both dims (vs linear's 0 on y)
        assert skip_rate(rep, "x", 8, 15) > 0.0
        assert skip_rate(rep, "y", 8, 15) > 0.0


class TestMortonProperty:
    def test_roundtrip_deinterleave(self, spark):
        """Property (hypothesis): interleave is a bijection — the
        cells de-interleave back exactly for arbitrary 10-bit pairs."""
        from hypothesis import given, settings, strategies as st

        from beats_spark.operators.layout import interleave_cells

        cases = []

        @settings(max_examples=200, deadline=None)
        @given(
            st.integers(min_value=0, max_value=1023),
            st.integers(min_value=0, max_value=1023),
        )
        def collect(c0, c1):
            cases.append((c0, c1))

        collect()
        df = spark.createDataFrame(
            list(set(cases)), "c0 long, c1 long"
        )
        for r in df.select(
            "c0", "c1",
            interleave_cells([F.col("c0"), F.col("c1")], 10).alias("z"),
        ).collect():
            z = r["z"]
            d0 = sum(((z >> (2 * j)) & 1) << j for j in range(10))
            d1 = sum(((z >> (2 * j + 1)) & 1) << j for j in range(10))
            assert (d0, d1) == (r["c0"], r["c1"])


class TestConjunctiveSkip:
    def test_and_skip_dominates_single_dims(self, spark, tmp_path_factory):
        from beats_spark.operators.layout import (
            file_skip_report,
            skip_rate,
            skip_rate_and,
            zorder_write,
        )

        grid = spark.range(64 * 64).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
        root = tmp_path_factory.mktemp("andskip")
        zpath = str(root / "z")
        zorder_write(
            grid, zpath, [F.col("x"), F.col("y")], n_files=16, bits=6,
            bounds=[(0, 63), (0, 63)],
        )
        rep = file_skip_report(spark, zpath, ["x", "y"])
        preds = {"x": (8, 15), "y": (8, 15)}
        both = skip_rate_and(rep, preds)
        assert both >= skip_rate(rep, "x", 8, 15)
        assert both >= skip_rate(rep, "y", 8, 15)
        # a 1/8 × 1/8 tile on a 16-file z-layout: nearly everything
        # prunes
        assert both >= 0.8


def _py_hilbert(x: int, y: int, bits: int) -> int:
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


class TestHilbert:
    def test_matches_python_reference(self, spark):
        from beats_spark.operators.layout import add_hilbert

        pts = [(x, y) for x in range(8) for y in range(8)]
        df = spark.createDataFrame(pts, "x long, y long")
        got = {
            (r["x"], r["y"]): r["hilbert"]
            for r in add_hilbert(
                df, [F.col("x"), F.col("y")], bits=3, bounds=[(0, 7), (0, 7)]
            ).collect()
        }
        for x, y in pts:
            assert got[(x, y)] == _py_hilbert(x, y, 3), (x, y)

    def test_perfect_locality(self, spark):
        """THE Hilbert property Morton lacks: consecutive indices are
        always grid-adjacent (|Δx|+|Δy| == 1 for every step)."""
        from beats_spark.operators.layout import add_hilbert

        pts = [(x, y) for x in range(16) for y in range(16)]
        df = spark.createDataFrame(pts, "x long, y long")
        rows = add_hilbert(
            df, [F.col("x"), F.col("y")], bits=4, bounds=[(0, 15), (0, 15)]
        ).collect()
        by_d = {r["hilbert"]: (r["x"], r["y"]) for r in rows}
        assert sorted(by_d) == list(range(256))  # a bijection
        for d in range(255):
            (x0, y0), (x1, y1) = by_d[d], by_d[d + 1]
            assert abs(x1 - x0) + abs(y1 - y0) == 1, d

    def test_duckdb_parity_on_documents(self, spark):
        from beats_spark.operators.layout import add_hilbert, hilbert_sql

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        got = {
            r["doc_id"]: r["hilbert"]
            for r in add_hilbert(
                docs, [F.col("n_chars"), F.col("doc_id") % 97], bits=6
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"parquet_scan('{SF_DIR}/documents.parquet')"
        )
        want = dict(
            con.execute(
                hilbert_sql(
                    "documents", ["n_chars", "doc_id % 97"], bits=6,
                    cols="doc_id",
                )
            ).fetchall()
        )
        assert got == want


class TestHilbertWrite:
    def test_hilbert_layout_prunes_both_dims(
        self, spark, tmp_path_factory
    ):
        from beats_spark.operators.layout import (
            file_skip_report,
            skip_rate,
            zorder_write,
        )

        grid = spark.range(64 * 64).select(
            (F.col("id") % 64).alias("x"),
            (F.col("id") / 64).cast("long").alias("y"),
        )
        root = tmp_path_factory.mktemp("hilb")
        hpath = str(root / "h")
        zorder_write(
            grid, hpath, [F.col("x"), F.col("y")], n_files=16, bits=6,
            bounds=[(0, 63), (0, 63)], curve="hilbert",
        )
        rep = file_skip_report(spark, hpath, ["x", "y"])
        assert skip_rate(rep, "x", 8, 15) >= 0.5
        assert skip_rate(rep, "y", 8, 15) >= 0.5


class TestInterleaveGuard:
    def test_rejects_codes_wider_than_63_bits(self):
        """Java shiftleft wraps shift amounts mod 64 (silent z-code
        corruption) while DuckDB's << does not — both builders refuse
        d*bits > 63 up front (ADVICE r4)."""
        import pytest
        from pyspark.sql import functions as F
        from beats_spark.operators.layout import (
            interleave_cells,
            interleave_cells_sql,
        )

        cols = [F.col(f"c{i}") for i in range(7)]
        with pytest.raises(ValueError, match="63"):
            interleave_cells(cols, bits=10)
        with pytest.raises(ValueError, match="63"):
            interleave_cells_sql([f"c{i}" for i in range(7)], bits=10)
        # 63 bits exactly is legal (7 dims x 9 bits)
        interleave_cells(cols, bits=9)
        interleave_cells_sql([f"c{i}" for i in range(7)], bits=9)
