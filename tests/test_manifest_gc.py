"""Manifest GC (registrar clean_inactive analog)."""

from __future__ import annotations

from beats_spark.operators.actions import Dissect
from beats_spark.operators.manifest import gc_manifest, read_done_parts
from beats_spark.operators.selector import Rule
from beats_spark.plans.pipeline import Pipeline
from beats_spark.synth import TOK_LOGFMT, synth_transcripts


def test_gc_compacts_but_preserves_resume(spark, tmp_path):
    df = synth_transcripts(spark, 2_000, seed=7)
    out = str(tmp_path / "out")
    p = Pipeline(
        processors=[Dissect(tokenizer=TOK_LOGFMT, field="text")],
        routes=[Rule(value="errors", when={"equals": {"level": "error"}})],
        default_sink="misc",
        n_buckets=8,
    )
    for i in range(4):
        p.run(spark, df, out, run_id=f"r{i}")

    done_before = read_done_parts(spark, out)
    before = spark.read.parquet(f"{out}/_manifest").count()
    kept = gc_manifest(spark, out, keep_last_runs=2)
    after = spark.read.parquet(f"{out}/_manifest").count()

    n_parts = len(done_before)
    assert before == 4 * n_parts
    assert kept == after == 2 * n_parts
    # the resume view is unchanged: every committed bucket still done
    assert read_done_parts(spark, out) == done_before

    # a resumed run over the compacted manifest skips everything
    res = p.run(spark, df, out, run_id="r9", resume=True)
    assert res.skipped_parts == n_parts
    assert res.events_published == 0


def test_gc_on_missing_manifest_is_noop(spark, tmp_path):
    assert gc_manifest(spark, str(tmp_path / "nope")) == 0
