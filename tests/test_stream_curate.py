"""Streaming incremental curation (beats_spark/streaming/curate.py):
snapshot files arrive as micro-batches; each batch is cleaned,
quality-gated, deduped within itself and against everything admitted
before it (Bloom bitmap — the history is never joined); funnel stats
append per batch; a restart rebuilds the bitmap from the output."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from beats_spark.streaming.curate import (
    IncrementalCurator,
    run_incremental_curation,
)


def good(i: int) -> str:
    """Deterministically passes every quality rule (≥5 tokens, mean
    token length in [3,12], no punctuation, stopword ratio ≥ 0.01)."""
    return (
        "the streaming curator admits the novel documents and drops "
        f"the duplicate entries for training corpus number {i}"
    )


def _write_batch(path: str, rows: list[tuple[int, str]], mtime: float) -> None:
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    pq.write_table(tbl, path)
    os.utime(path, (mtime, mtime))  # file-source order = mod time


class TestIncrementalCuration:
    def test_three_snapshots(self, spark, tmp_path):
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        out = str(tmp_path / "curated")
        ckpt = str(tmp_path / "ckpt")

        t0 = 1_700_000_000.0
        _write_batch(
            str(in_dir / "b0.parquet"),
            [(i, good(i)) for i in range(10)],
            t0,
        )
        # b1: 5 novel; 5 case/whitespace VARIANTS of b0 docs (history
        # dups through norm_text); one in-batch dup pair; one junk doc
        _write_batch(
            str(in_dir / "b1.parquet"),
            [(100 + i, good(100 + i)) for i in range(5)]
            + [(105 + i, "  " + good(i).upper() + " ") for i in range(5)]
            + [(110, good(777)), (111, good(777))]
            + [(112, "x y z w q v")],  # mean token len 1 → quality drop
            t0 + 10,
        )
        # b2: 4 dups of b1's ADMITTED docs + 5 novel
        _write_batch(
            str(in_dir / "b2.parquet"),
            [(200 + i, good(100 + i)) for i in range(4)]
            + [(204 + i, good(900 + i)) for i in range(5)],
            t0 + 20,
        )

        cur = IncrementalCurator(spark)
        q = run_incremental_curation(
            spark,
            str(in_dir),
            out,
            ckpt,
            curator=cur,
            schema="doc_id long, text string",
            max_files_per_trigger=1,
        )
        assert q.awaitTermination(180)

        got = {
            r[0]
            for r in duckdb.sql(
                f"SELECT doc_id FROM parquet_scan('{out}/data/*/*.parquet')"
            ).fetchall()
        }
        want = (
            set(range(10))            # b0: all novel + good
            | {100, 101, 102, 103, 104}  # b1 novel
            | {110}                   # in-batch pair: keep-first (min id)
            | {204, 205, 206, 207, 208}  # b2 novel
        )
        assert got == want

        stats = {
            r[0]: r[1:]
            for r in duckdb.sql(
                "SELECT batch_id, n_in, n_batch_dup, n_history_dup,"
                f" n_low_quality, n_admitted"
                f" FROM parquet_scan('{out}/stats/*/*.parquet', hive_partitioning=1)"
            ).fetchall()
        }
        assert len(stats) == 3
        assert stats[0] == (10, 0, 0, 0, 10)
        assert stats[1] == (13, 1, 5, 1, 6)
        assert stats[2] == (9, 0, 4, 0, 5)

        # no normalized duplicate ever admitted (the whole point)
        (ndup,) = duckdb.sql(
            "SELECT count(*) - count(DISTINCT"
            " regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))"
            f" FROM parquet_scan('{out}/data/*/*.parquet')"
        ).fetchone()
        assert ndup == 0

        # -- restart: rebuild the bitmap from the OUTPUT, then run a
        # backfill batch directly through the batch API — dups of
        # previously-admitted docs must still drop
        cur2 = IncrementalCurator.from_output(spark, out)
        backfill = spark.createDataFrame(
            [(300, good(904)), (301, good(555))],  # dup of 208, novel
            "doc_id long, text string",
        )
        cur2.process_batch(backfill, 99, out)
        row = duckdb.sql(
            "SELECT n_in, n_history_dup, n_admitted FROM"
            f" parquet_scan('{out}/stats/*/*.parquet', hive_partitioning=1) WHERE batch_id = 99"
        ).fetchone()
        assert row == (2, 1, 1)
        (n301,) = duckdb.sql(
            f"SELECT count(*) FROM parquet_scan('{out}/data/*/*.parquet')"
            " WHERE doc_id = 301"
        ).fetchone()
        assert n301 == 1

    def test_seeded_history(self, spark, tmp_path):
        """Seeding the curator with a historical corpus DataFrame
        dedups the very first batch against it."""
        hist = spark.createDataFrame(
            [(i, good(i)) for i in range(20)], "doc_id long, text string"
        )
        cur = IncrementalCurator(spark, history_df=hist)
        out = str(tmp_path / "o")
        batch = spark.createDataFrame(
            [(500, good(3)), (501, good(800))],  # dup-of-history, novel
            "doc_id long, text string",
        )
        cur.process_batch(batch, 0, out)
        got = {
            r[0]
            for r in duckdb.sql(
                f"SELECT doc_id FROM parquet_scan('{out}/data/*/*.parquet')"
            ).fetchall()
        }
        assert got == {501}

    def test_checkpoint_restart_no_reprocessing(self, spark, tmp_path):
        """A restarted stream (same checkpoint) must not re-run old
        snapshot files — only the file that arrived while it was down
        — and the rebuilt bitmap must dedup the new file against the
        admitted output of the first run."""
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        out = str(tmp_path / "curated")
        ckpt = str(tmp_path / "ckpt")
        t0 = 1_700_000_000.0
        _write_batch(
            str(in_dir / "b0.parquet"),
            [(i, good(i)) for i in range(6)],
            t0,
        )
        q = run_incremental_curation(
            spark, str(in_dir), out, ckpt,
            curator=IncrementalCurator(spark),
            schema="doc_id long, text string",
        )
        assert q.awaitTermination(120)

        # job goes down; a snapshot arrives: one dup of run-1 output,
        # one novel doc
        _write_batch(
            str(in_dir / "b1.parquet"),
            [(100, good(2)), (101, good(42))],
            t0 + 10,
        )
        q2 = run_incremental_curation(
            spark, str(in_dir), out, ckpt,
            curator=IncrementalCurator.from_output(spark, out),
            schema="doc_id long, text string",
        )
        assert q2.awaitTermination(120)

        import duckdb

        got = sorted(
            r[0]
            for r in duckdb.sql(
                f"SELECT doc_id FROM parquet_scan('{out}/data/*/*.parquet')"
            ).fetchall()
        )
        # b0 admitted exactly once (no replay), 100 dropped as a
        # history dup via the REBUILT bitmap, 101 admitted
        assert got == [0, 1, 2, 3, 4, 5, 101]
        n_in_total = duckdb.sql(
            f"SELECT sum(n_in) FROM parquet_scan('{out}/stats/*/*.parquet', hive_partitioning=1)"
        ).fetchone()[0]
        assert n_in_total == 8  # 6 + 2, b0 never re-entered a batch

    def test_replayed_batch_is_idempotent(self, spark, tmp_path):
        """foreachBatch is at-least-once: a crash between the sink
        writes and the checkpoint commit re-runs the batch with the
        SAME batch_id. The batch_id-partition overwrite must absorb
        the replay — one funnel row, no duplicated documents."""
        out = str(tmp_path / "o")
        cur = IncrementalCurator(spark)
        batch = spark.createDataFrame(
            [(1, good(1)), (2, good(2))], "doc_id long, text string"
        )
        cur.process_batch(batch, 0, out)
        # replay: same batch, same id, fresh curator state (a restart
        # rebuilds from output, so the replayed batch sees the
        # pre-crash bitmap — i.e. its own docs as "history")
        cur2 = IncrementalCurator.from_output(spark, out)
        cur2.process_batch(batch, 0, out)

        rows = duckdb.sql(
            "SELECT batch_id, count(*) FROM"
            f" parquet_scan('{out}/stats/*/*.parquet', hive_partitioning=1)"
            " GROUP BY 1"
        ).fetchall()
        assert rows == [(0, 1)]  # exactly one funnel row for batch 0
        docs = sorted(
            r[0]
            for r in duckdb.sql(
                f"SELECT doc_id FROM parquet_scan('{out}/data/*/*.parquet')"
            ).fetchall()
        )
        assert docs in ([1, 2], [])  # never [1, 1, 2, 2]

    def test_restart_defaults_to_from_output(self, spark, tmp_path):
        """curator=None on a restart (output exists) must rebuild the
        bitmap from the output instead of silently starting empty —
        otherwise new snapshots re-admit history duplicates."""
        in_dir = tmp_path / "in"
        in_dir.mkdir()
        out = str(tmp_path / "curated")
        ckpt = str(tmp_path / "ckpt")
        t0 = 1_700_000_000.0
        _write_batch(
            str(in_dir / "b0.parquet"),
            [(i, good(i)) for i in range(4)],
            t0,
        )
        q = run_incremental_curation(
            spark, str(in_dir), out, ckpt,
            schema="doc_id long, text string",
        )
        assert q.awaitTermination(120)
        _write_batch(
            str(in_dir / "b1.parquet"),
            [(100, good(1)), (101, good(50))],  # history dup + novel
            t0 + 10,
        )
        # restart WITHOUT passing a curator
        q2 = run_incremental_curation(
            spark, str(in_dir), out, ckpt,
            schema="doc_id long, text string",
        )
        assert q2.awaitTermination(120)
        got = sorted(
            r[0]
            for r in duckdb.sql(
                f"SELECT doc_id FROM parquet_scan('{out}/data/*/*.parquet')"
            ).fetchall()
        )
        assert got == [0, 1, 2, 3, 101]  # 100 dropped via rebuilt bitmap

    def test_empty_batch_records_zero_row(self, spark, tmp_path):
        cur = IncrementalCurator(spark)
        out = str(tmp_path / "o")
        empty = spark.createDataFrame([], "doc_id long, text string")
        cur.process_batch(empty, 7, out)
        import duckdb

        row = duckdb.sql(
            "SELECT n_in, n_batch_dup, n_history_dup, n_low_quality,"
            f" n_admitted FROM parquet_scan('{out}/stats/*/*.parquet', hive_partitioning=1)"
            " WHERE batch_id = 7"
        ).fetchone()
        assert row == (0, 0, 0, 0, 0)


class TestNearDupMembership:
    """near_min_hits > 0: the admitted set's LSH band keys live in a
    second Bloom bitmap; a paraphrase of an admitted doc (sharing >=
    near_min_hits bands) is dropped as a history dup — the history
    itself still never joins."""

    def test_near_duplicate_of_admitted_doc_is_dropped(
        self, spark, tmp_path
    ):
        import duckdb

        out = str(tmp_path / "o")
        cur = IncrementalCurator(spark, near_min_hits=2)
        b0 = spark.createDataFrame(
            [(i, good(i)) for i in range(4)], "doc_id long, text string"
        )
        cur.process_batch(b0, 0, out)
        # 100 = one-word paraphrase of admitted good(1) (3 of 4 bands
        # collide — measured, deterministic given the md5 chain);
        # 101 = genuinely novel (good(50) would NOT be: every good(i)
        # shares all but the trailing shingles, so the near gate
        # correctly treats it as a paraphrase of the admitted set)
        b1 = spark.createDataFrame(
            [
                (100, good(1).replace("novel", "fresh")),
                (
                    101,
                    "meanwhile the quick brown fox jumps over the lazy "
                    "dog beside a quiet river in the autumn evening",
                ),
            ],
            "doc_id long, text string",
        )
        cur.process_batch(b1, 1, out)
        row = duckdb.sql(
            "SELECT n_in, n_history_dup, n_admitted FROM"
            f" parquet_scan('{out}/stats/*/*.parquet', hive_partitioning=1)"
            " WHERE batch_id = 1"
        ).fetchone()
        assert row == (2, 1, 1)
        got = sorted(
            r[0]
            for r in duckdb.sql(
                f"SELECT doc_id FROM parquet_scan('{out}/data/*/*.parquet')"
                " WHERE doc_id >= 100"
            ).fetchall()
        )
        assert got == [101]

    def test_near_membership_survives_from_output_rebuild(
        self, spark, tmp_path
    ):
        import duckdb

        out = str(tmp_path / "o")
        cur = IncrementalCurator(spark, near_min_hits=2)
        b0 = spark.createDataFrame(
            [(1, good(1))], "doc_id long, text string"
        )
        cur.process_batch(b0, 0, out)
        # restart: rebuild BOTH bitmaps from the curated output
        cur2 = IncrementalCurator.from_output(spark, out, near_min_hits=2)
        b1 = spark.createDataFrame(
            [(200, good(1).replace("novel", "fresh"))],
            "doc_id long, text string",
        )
        cur2.process_batch(b1, 1, out)
        (n200,) = duckdb.sql(
            f"SELECT count(*) FROM parquet_scan('{out}/data/*/*.parquet')"
            " WHERE doc_id = 200"
        ).fetchone()
        assert n200 == 0

    def test_near_flag_plan_stays_one_window_exchange(self, spark):
        cur = IncrementalCurator(spark, near_min_hits=2)
        df = spark.createDataFrame(
            [(i, good(i)) for i in range(20)], "doc_id long, text string"
        )
        plan = (
            cur.flag_batch(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # band keys + membership are map-side: still exactly one
        # exchange (the keep-first window), no join, no Python
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Join" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
