"""End-to-end curation job (jobs/curate_job.py): flags-then-filter
funnel, audit table, PII-redacted token-packed output."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "jobs"))

from curate_job import _parse_rates, curate  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"


class TestCurateJob:
    def test_funnel_and_outputs(self, spark, tmp_path):
        duckdb = pytest.importorskip("duckdb")
        out = str(tmp_path / "curated")
        summary = curate(
            spark,
            f"{SF_DIR}/documents.parquet",
            out,
            rates={"en": 1.0, "de": 0.25},
            default_rate=0.5,
            token_budget=256,
        )
        f = summary["funnel"]
        # cumulative funnel is monotone non-increasing and starts full
        gates = [
            "exact_keep",
            "neardup_keep",
            "quality_keep",
            "repetition_keep",
            "lm_keep",
            "decontam_keep",
            "sample_keep",
        ]
        cums = [f["total"]] + [f[f"cum_{g}"] for g in gates]
        assert all(a >= b for a, b in zip(cums, cums[1:]))
        assert summary["kept"] == f["cum_sample_keep"] > 0
        # each cumulative stage is bounded by its own gate's pass count
        assert all(f[f"cum_{g}"] <= f[f"pass_{g}"] for g in gates)

        # independent reader: flags conjunction == kept == packed rows
        conj = " AND ".join(gates)
        n_flags, n_kept = duckdb.sql(
            f"SELECT count(*), sum(CASE WHEN {conj} THEN 1 ELSE 0 END) "
            f"FROM parquet_scan('{out}/flags/*.parquet')"
        ).fetchone()
        assert n_flags == f["total"]
        assert n_kept == summary["kept"]
        n_rows, n_packs, n_emails = duckdb.sql(
            "SELECT count(*), count(DISTINCT (source, pack_id)), "
            "  max(len(regexp_extract_all(text,"
            "      '[\\w.+-]+@[\\w-]+\\.[\\w.]+')))"
            f" FROM parquet_scan('{out}/packed/*/*.parquet',"
            "   hive_partitioning=1)"
        ).fetchone()
        assert n_rows == summary["kept"]
        assert n_packs == summary["n_packs"]
        assert n_emails == 0  # PII redaction ran on the kept text
        # pack ids reproduce the prefix-floor rule exactly (DuckDB
        # recomputes the window independently of Spark)
        (mismatch,) = duckdb.sql(
            "WITH o AS (SELECT source, pack_id, n_tokens,"
            " coalesce(sum(n_tokens) OVER (PARTITION BY source"
            "   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING"
            "   AND 1 PRECEDING), 0) AS prefix"
            f" FROM parquet_scan('{out}/packed/*/*.parquet',"
            "   hive_partitioning=1))"
            " SELECT max(abs(pack_id - floor(prefix / 256))) FROM o"
        ).fetchone()
        assert mismatch == 0

    def test_benchmark_decontamination_gate(self, spark, tmp_path):
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        bench_path = str(tmp_path / "bench.parquet")
        docs.where("doc_id % 97 = 0").write.parquet(bench_path)
        out = str(tmp_path / "curated")
        summary = curate(
            spark,
            f"{SF_DIR}/documents.parquet",
            out,
            benchmark_path=bench_path,
            default_rate=1.0,
        )
        f = summary["funnel"]
        # the benchmark docs themselves (and any 4-gram overlap) fail
        assert f["pass_decontam_keep"] < f["total"]

    def test_url_gate(self, spark, tmp_path):
        from pyspark.sql import functions as F

        # give every doc a URL: pairs 2g/2g+1 share a canonical URL
        # (dirty vs clean spelling), and g%10==0 lands on a blocked
        # domain
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        g = F.floor(F.col("doc_id") / 2).cast("long")
        url = F.when(
            F.pmod(g, F.lit(10)) == 0,
            F.format_string("http://bad%d.example.com/p/%d", g, g),
        ).otherwise(
            F.when(
                F.pmod("doc_id", F.lit(2)) == 0,
                F.format_string(
                    "HTTP://Site%d.COM:80/p/%d?utm_source=x", g, g
                ),
            ).otherwise(F.format_string("http://site%d.com/p/%d", g, g))
        )
        in_path = str(tmp_path / "docs.parquet")
        docs.withColumn("url", url).write.parquet(in_path)
        blk_path = str(tmp_path / "blk.parquet")
        spark.createDataFrame(
            [("example.com",)], "domain string"
        ).write.parquet(blk_path)

        out = str(tmp_path / "curated")
        summary = curate(
            spark, in_path, out, default_rate=1.0,
            url_col="url", blocklist_path=blk_path,
        )
        f = summary["funnel"]
        n = f["total"]
        # expected: blocked docs (both members of a blocked pair) fail;
        # of the rest, the odd member of each shared-URL pair fails
        ids = [r["doc_id"] for r in docs.select("doc_id").collect()]
        blocked = {i for i in ids if (i // 2) % 10 == 0}
        losers = set()
        by_g = {}
        for i in sorted(ids):
            if i in blocked:
                continue
            key = i // 2
            if key in by_g:
                losers.add(i)
            else:
                by_g[key] = i
        assert f["pass_url_keep"] == n - len(blocked) - len(losers)
        assert 0 < f["pass_url_keep"] < n

    def test_bpe_token_packing(self, spark, tmp_path):
        duckdb = pytest.importorskip("duckdb")
        out = str(tmp_path / "curated")
        summary = curate(
            spark, f"{SF_DIR}/documents.parquet", out,
            default_rate=1.0, token_budget=128, bpe_merges=40,
        )
        assert summary["kept"] > 0
        # pack ids reproduce the prefix-floor rule over the BPE counts
        # the output itself carries (DuckDB recomputes independently);
        # BPE counts exceed whitespace counts (subword + </w> splits)
        (mismatch, bpe_ge_ws) = duckdb.sql(
            "WITH o AS (SELECT source, pack_id, n_tokens, text,"
            " coalesce(sum(n_tokens) OVER (PARTITION BY source"
            "   ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING"
            "   AND 1 PRECEDING), 0) AS prefix"
            f" FROM parquet_scan('{out}/packed/*/*.parquet',"
            "   hive_partitioning=1))"
            " SELECT max(abs(pack_id - floor(prefix / 128))),"
            "  min(CASE WHEN n_tokens >= len(string_split(trim(text), ' '))"
            "      THEN 1 ELSE 0 END) FROM o"
        ).fetchone()
        assert mismatch == 0
        assert bpe_ge_ws == 1

    def test_url_gate_off_by_default(self, spark, tmp_path):
        out = str(tmp_path / "curated")
        summary = curate(
            spark, f"{SF_DIR}/documents.parquet", out, default_rate=1.0
        )
        f = summary["funnel"]
        assert f["pass_url_keep"] == f["total"]

    def test_lm_perplexity_gate(self, spark, tmp_path):
        from beats_spark.operators.lm import bigram_lm_scores

        out = str(tmp_path / "curated")
        # pick a cutoff strictly inside the observed perplexity range
        # so the gate provably fires on some docs and passes others
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        ppls = sorted(
            r["perplexity"] for r in bigram_lm_scores(docs).collect()
        )
        cutoff = ppls[len(ppls) // 2]
        summary = curate(
            spark,
            f"{SF_DIR}/documents.parquet",
            out,
            default_rate=1.0,
            max_perplexity=cutoff,
        )
        f = summary["funnel"]
        expect_pass = sum(1 for p in ppls if p <= cutoff)
        assert f["pass_lm_keep"] == expect_pass
        assert 0 < f["pass_lm_keep"] < f["total"]

    def test_duplicated_span_gate(self, spark, tmp_path):
        from pyspark.sql import functions as F

        from beats_spark.operators.clean import clean_text
        from beats_spark.operators.dedup import duplicated_spans

        out = str(tmp_path / "curated")
        # cutoff strictly inside the observed dup-fraction range so
        # the gate provably fires on some docs and passes others;
        # mirror the job's clean_text pre-stage so fractions line up
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").withColumn(
            "text", clean_text(F.col("text"))
        )
        fracs = {
            r["doc_id"]: r["dup_span_frac"]
            for r in duplicated_spans(docs).collect()
        }
        n_docs = docs.count()
        positive = sorted(v for v in fracs.values() if v > 0)
        assert positive, "fixture needs some duplicated spans"
        cutoff = positive[len(positive) // 2] - 1e-9
        summary = curate(
            spark,
            f"{SF_DIR}/documents.parquet",
            out,
            default_rate=1.0,
            max_dup_span_frac=cutoff,
        )
        f = summary["funnel"]
        # short docs carry no span row → keep
        expect_pass = sum(1 for v in fracs.values() if v <= cutoff) + (
            n_docs - len(fracs)
        )
        assert f["pass_span_keep"] == expect_pass
        assert 0 < f["pass_span_keep"] < f["total"]

    def test_span_gate_off_by_default(self, spark, tmp_path):
        out = str(tmp_path / "curated")
        summary = curate(
            spark, f"{SF_DIR}/documents.parquet", out, default_rate=1.0
        )
        assert summary["funnel"]["pass_span_keep"] == summary["funnel"]["total"]

    def test_lm_gate_off_by_default(self, spark, tmp_path):
        out = str(tmp_path / "curated")
        summary = curate(
            spark, f"{SF_DIR}/documents.parquet", out, default_rate=1.0
        )
        f = summary["funnel"]
        assert f["pass_lm_keep"] == f["total"]
        assert f["pass_classifier_keep"] == f["total"]

    def test_classifier_gate(self, spark, tmp_path):
        duckdb = pytest.importorskip("duckdb")
        from pyspark.sql import functions as F

        from beats_spark.operators.classifier import (
            score_documents,
            train_logistic,
        )

        out = str(tmp_path / "curated")
        labels_path = str(tmp_path / "labels")
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        # seed judgments on every 3rd doc: "reference-like" = english —
        # learnable from the text's grams, so the gate provably splits
        labels = docs.where(F.col("doc_id") % 3 == 0).select(
            "doc_id", (F.col("lang") == "en").alias("label")
        )
        labels.write.mode("overwrite").parquet(labels_path)
        # retrain on the same labeled dim outside the job (GD is
        # deterministic) and pick a cutoff strictly inside the observed
        # score range so the gate provably fires on some docs and
        # passes others (the lm-gate test's pattern)
        from beats_spark.operators.clean import clean_text

        fixed = docs.withColumn("text", clean_text(F.col("text")))
        w, b = train_logistic(
            fixed.join(
                labels.select(
                    "doc_id", F.col("label").cast("int").alias("label")
                ),
                "doc_id",
            ),
            F.col("label"),
        )
        scores = sorted(
            r["score"] for r in score_documents(fixed, w, b).collect()
        )
        cutoff = scores[len(scores) // 2]
        summary = curate(
            spark,
            f"{SF_DIR}/documents.parquet",
            out,
            default_rate=1.0,
            classifier_labels_path=labels_path,
            classifier_threshold=cutoff,
        )
        f = summary["funnel"]
        assert 0 < f["pass_classifier_keep"] < f["total"]
        # the funnel's count IS the trained-scorer's count
        expect = sum(1 for s in scores if s >= cutoff)
        assert f["pass_classifier_keep"] == expect
        # independent reader: the audit table carries the gate and the
        # full conjunction (classifier included) reproduces kept
        gates = [
            "url_keep", "exact_keep", "neardup_keep", "quality_keep",
            "repetition_keep", "span_keep", "lm_keep",
            "classifier_keep", "decontam_keep", "sample_keep",
        ]
        conj = " AND ".join(gates)
        n_pass, n_kept = duckdb.sql(
            "SELECT sum(CASE WHEN classifier_keep THEN 1 ELSE 0 END),"
            f" sum(CASE WHEN {conj} THEN 1 ELSE 0 END)"
            f" FROM parquet_scan('{out}/flags/*.parquet')"
        ).fetchone()
        assert n_pass == f["pass_classifier_keep"]
        assert n_kept == summary["kept"]

    def test_parse_rates(self):
        assert _parse_rates("en=1.0, de=0.25") == {"en": 1.0, "de": 0.25}
        assert _parse_rates("") == {}


class TestShardOutput:
    def test_shards_written_packs_contiguous(self, spark, tmp_path):
        duckdb = pytest.importorskip("duckdb")
        out = str(tmp_path / "curated")
        summary = curate(
            spark,
            f"{SF_DIR}/documents.parquet",
            out,
            rates={"en": 1.0, "de": 1.0},
            default_rate=1.0,
            token_budget=256,
            n_shards=4,
        )
        assert summary["n_shards"] == 4
        # every kept row lands in exactly one shard
        (n,) = duckdb.sql(
            f"SELECT count(*) FROM parquet_scan('{out}/shards/*/*.parquet',"
            " hive_partitioning=1)"
        ).fetchone()
        assert n == summary["kept"]
        # a pack never straddles shards (it is one training sequence),
        # and inside a shard file the pack's docs are contiguous and
        # in doc order
        (straddle,) = duckdb.sql(
            "SELECT count(*) FROM ("
            "  SELECT source, pack_id FROM parquet_scan("
            f"   '{out}/shards/*/*.parquet', hive_partitioning=1)"
            "  GROUP BY source, pack_id HAVING count(DISTINCT shard) > 1)"
        ).fetchone()
        assert straddle == 0
        rows = duckdb.sql(
            "SELECT shard, _pack_key, doc_id FROM parquet_scan("
            f"  '{out}/shards/*/*.parquet', hive_partitioning=1,"
            "   filename=1, file_row_number=1)"
            " ORDER BY filename, file_row_number"
        ).fetchall()
        by_shard: dict[int, list] = {}
        for shard, pk, did in rows:
            by_shard.setdefault(shard, []).append((pk, did))
        for seq in by_shard.values():
            seen, cur = set(), None
            for pk, did in seq:
                if pk != cur:
                    assert pk not in seen  # contiguous: never revisited
                    seen.add(pk)
                    cur = pk


class TestDatasetCard:
    def test_card_matches_independent_recount(self, spark, tmp_path):
        duckdb = pytest.importorskip("duckdb")
        out = str(tmp_path / "curated")
        curate(
            spark,
            f"{SF_DIR}/documents.parquet",
            out,
            rates={"en": 1.0, "de": 0.5},
            default_rate=0.5,
            token_budget=256,
        )
        got = {
            (r[0], r[1]): r[2:]
            for r in duckdb.sql(
                f"SELECT source, lang, n_docs, n_tokens, n_chars, n_packs,"
                f" token_share FROM parquet_scan('{out}/card/*.parquet')"
            ).fetchall()
        }
        # independent recount straight off the released packed/ output
        want = {
            (r[0], r[1]): r[2:]
            for r in duckdb.sql(
                "SELECT source, lang, count(*),"
                " sum(n_tokens), sum(length(text)),"
                " count(DISTINCT pack_id),"
                " round(sum(n_tokens) / (SELECT sum(n_tokens) FROM"
                f"   parquet_scan('{out}/packed/*/*.parquet',"
                "    hive_partitioning=1)), 6)"
                f" FROM parquet_scan('{out}/packed/*/*.parquet',"
                "  hive_partitioning=1)"
                " GROUP BY 1, 2"
            ).fetchall()
        }
        assert got == want
        assert len(got) >= 2  # several strata actually present
        assert abs(sum(v[-1] for v in got.values()) - 1.0) < 1e-4
