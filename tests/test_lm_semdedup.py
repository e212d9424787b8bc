"""Unit tests for LM perplexity scoring (operators/lm.py) and SemDeDup
(operators/similarity.py semdedup) against pure-Python oracles —
independent of the DuckDB oracle SQL (tools/check_correctness.py
exercises that separately).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from beats_spark.operators.lm import LM_SCALE, S_TOKEN, bigram_lm_scores
from beats_spark.operators.similarity import semdedup


# ---------------------------------------------------------------------------
# LM perplexity


LM_DOCS = [
    (0, "the cat sat on the mat"),     # train (0 % 5 == 0)
    (1, "the cat sat on the mat"),     # identical to a train doc
    (2, "the dog sat on the mat"),
    (3, "zebra quux flurble"),         # every token unseen in training
    (4, ""),                           # no tokens → no row
    (5, "The Cat SAT on the mat"),     # train; lowercasing folds w/ doc 0
    (6, "mat the on sat cat the"),     # same tokens, different bigrams
    (10, "on on on on"),               # train; repeated-token bigrams
]


def _py_lm(docs, alpha=1.0, train_mod=5):
    """Pure-Python mirror of the model definition in operators/lm.py."""
    def toks(t):
        return [S_TOKEN] + [w for w in t.lower().split() if w]

    c2: dict[tuple[str, str], int] = {}
    for doc_id, text in docs:
        if doc_id % train_mod != 0:
            continue
        ts = toks(text)
        for p, c in zip(ts, ts[1:]):
            c2[(p, c)] = c2.get((p, c), 0) + 1
    c1: dict[str, int] = {}
    for (p, _), n in c2.items():
        c1[p] = c1.get(p, 0) + n
    v = len({c for (_, c) in c2}) + 1

    out = {}
    for doc_id, text in docs:
        ts = toks(text)
        if len(ts) < 2:
            continue
        s = 0
        for p, c in zip(ts, ts[1:]):
            logp = math.log2(
                (c2.get((p, c), 0) + alpha) / (c1.get(p, 0) + alpha * v)
            )
            s += math.floor(logp * LM_SCALE + 0.5)
        n = len(ts) - 1
        ce = round(-s / (n * LM_SCALE), 6)
        out[doc_id] = (n, ce, round(2.0 ** ce, 6), doc_id % train_mod == 0)
    return out, v, c1, c2


class TestBigramLM:
    @pytest.fixture(scope="class")
    def scored(self, spark):
        df = spark.createDataFrame(LM_DOCS, "doc_id long, text string")
        return {r["doc_id"]: r for r in bigram_lm_scores(df).collect()}

    def test_matches_python_oracle(self, scored):
        expect, _, _, _ = _py_lm(LM_DOCS)
        assert set(scored) == set(expect)
        for doc_id, (n, ce, ppl, is_train) in expect.items():
            r = scored[doc_id]
            assert r["n_tokens"] == n, doc_id
            assert r["cross_entropy"] == pytest.approx(ce, abs=2e-6), doc_id
            assert r["perplexity"] == pytest.approx(ppl, abs=2e-6), doc_id
            assert r["is_train"] == is_train, doc_id

    def test_empty_doc_emits_no_row(self, scored):
        assert 4 not in scored

    def test_train_doc_scores_below_identical_unseen_shuffle(self, scored):
        # doc 1 is verbatim a training doc; doc 6 reorders the same
        # tokens into unseen bigrams — the LM must prefer doc 1
        assert scored[1]["cross_entropy"] < scored[6]["cross_entropy"]

    def test_all_unseen_tokens_score_uniform(self, scored):
        # doc 3: first token unseen under the seen <s> context, the
        # rest are unseen contexts → P = 1/V for them
        _, v, c1, _ = _py_lm(LM_DOCS)
        m1 = math.floor(
            math.log2(1.0 / (c1[S_TOKEN] + v)) * LM_SCALE + 0.5
        )
        mu = math.floor(math.log2(1.0 / v) * LM_SCALE + 0.5)
        ce = round(-(m1 + 2 * mu) / (3 * LM_SCALE), 6)
        assert scored[3]["cross_entropy"] == pytest.approx(ce, abs=2e-6)

    def test_scoring_joins_are_broadcast(self, spark):
        df = spark.createDataFrame(LM_DOCS, "doc_id long, text string")
        plan = (
            bigram_lm_scores(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # two count-table joins + the 1-row V cross join, all broadcast;
        # the corpus is never shuffled by anything except doc_id
        assert plan.count("BroadcastHashJoin") >= 2
        assert "BroadcastNestedLoopJoin" in plan  # the 1-row V join
        assert "SortMergeJoin" not in plan


class TestCCNetBuckets:
    def test_tercile_mass_and_head_is_cleanest(self, spark):
        """Per language: bucket token masses are ~equal thirds, every
        head doc's perplexity ≤ every tail doc's, and the integer cut
        is reproduced hash-for-hash by the DuckDB twin."""
        import random

        import duckdb

        from beats_spark.operators.lm import ccnet_buckets, ccnet_buckets_sql

        random.seed(13)
        vocab = ["the", "model", "spark", "train", "fox", "data"]
        rows = [
            (
                i,
                " ".join(random.choices(vocab, k=random.randint(4, 20))),
                "en" if i % 2 else "de",
            )
            for i in range(200)
        ]
        spark_df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string"
        )
        out = ccnet_buckets(spark_df).collect()
        assert len(out) == 200
        for lang in ("en", "de"):
            mass = {"head": 0, "middle": 0, "tail": 0}
            ppl = {"head": [], "middle": [], "tail": []}
            for r in out:
                if r["lang"] == lang:
                    mass[r["bucket"]] += r["n_tokens"]
                    ppl[r["bucket"]].append(r["perplexity"])
            total = sum(mass.values())
            # each bucket within one max-doc-length of a perfect third
            assert all(abs(m - total / 3) <= 20 for m in mass.values())
            assert max(ppl["head"]) <= min(ppl["tail"])
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE docs(doc_id BIGINT, text VARCHAR, lang VARCHAR)"
        )
        con.executemany("INSERT INTO docs VALUES (?,?,?)", rows)
        ora = sorted(
            tuple(r) for r in con.sql(ccnet_buckets_sql("docs")).fetchall()
        )
        got = sorted(
            (r["doc_id"], r["lang"], r["n_tokens"], r["perplexity"],
             r["bucket"])
            for r in out
        )
        assert got == ora

    def test_one_window_exchange_no_self_join(self, spark):
        """The language rides the explode (carry): recovering it must
        not cost a corpus self-join on doc_id."""
        from beats_spark.operators.lm import ccnet_buckets

        df = spark.createDataFrame(
            [(i, "tok word data", "en") for i in range(20)],
            "doc_id long, text string, lang string",
        )
        plan = (
            ccnet_buckets(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "SortMergeJoin" not in plan
        assert plan.count("hashpartitioning(lang") >= 1


# ---------------------------------------------------------------------------
# DSIR importance weights


class TestDSIR:
    # target slice (doc_id % 7 == 0) talks about cats; the raw pool
    # talks about dogs; doc 3 is cat-like, doc 5 dog-like
    DOCS = [
        (0, "the cat sat on the mat"),      # target
        (7, "a cat naps on the mat"),       # target
        (14, "the cat eats fish"),          # target
        (1, "the dog barks at the gate"),
        (2, "a dog digs under the gate"),
        (4, "the dog chases the ball"),
        (3, "the cat sat on the mat"),      # scored: target-like
        (5, "the dog barks at the gate"),   # scored: pool-like
    ]

    @pytest.fixture(scope="class")
    def result(self, spark):
        from beats_spark.operators.lm import dsir_weights

        df = spark.createDataFrame(self.DOCS, "doc_id long, text string")
        return {r["doc_id"]: r for r in dsir_weights(df).collect()}

    def test_matches_python_oracle(self, result):
        target, _, _, _ = _py_lm(
            [(i, t) for i, t in self.DOCS], train_mod=7
        )
        # raw LM: score every doc against the complement slice — reuse
        # _py_lm by shifting ids so the complement becomes the %-slice
        def lm_scores(train_pred):
            c2, c1 = {}, {}
            for i, t in self.DOCS:
                if not train_pred(i):
                    continue
                ts = [S_TOKEN] + t.lower().split()
                for p, c in zip(ts, ts[1:]):
                    c2[(p, c)] = c2.get((p, c), 0) + 1
            for (p, _), n in c2.items():
                c1[p] = c1.get(p, 0) + n
            v = len({c for (_, c) in c2}) + 1
            out = {}
            for i, t in self.DOCS:
                ts = [S_TOKEN] + t.lower().split()
                s = 0
                for p, c in zip(ts, ts[1:]):
                    lp = math.log2(
                        (c2.get((p, c), 0) + 1.0) / (c1.get(p, 0) + v)
                    )
                    s += math.floor(lp * LM_SCALE + 0.5)
                out[i] = (s, len(ts) - 1)
            return out

        st = lm_scores(lambda i: i % 7 == 0)
        sr = lm_scores(lambda i: i % 7 != 0)
        for i, _ in self.DOCS:
            d, n = st[i][0] - sr[i][0], st[i][1]
            lw = round(d / LM_SCALE, 6)
            lwpt = round(d / (n * LM_SCALE), 6)
            r = result[i]
            assert r["log_weight"] == pytest.approx(lw, abs=2e-6), i
            assert r["log_weight_per_token"] == pytest.approx(
                lwpt, abs=2e-6
            ), i
            assert r["selected"] == (lwpt >= 0.0), i

    def test_target_like_doc_upweighted(self, result):
        # doc 3 repeats a target doc verbatim; doc 5 repeats a pool doc
        assert result[3]["log_weight_per_token"] > 0
        assert result[5]["log_weight_per_token"] < 0
        assert result[3]["selected"] and not result[5]["selected"]
        assert result[3]["weight"] > 1.0 > result[5]["weight"]


# ---------------------------------------------------------------------------
# SemDeDup


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return round(d / (na * nb), 6)


class TestSemDeDup:
    # two tight direction-clusters plus a lone outlier; ids 0 and 1
    # are the k-means seeds and sit in different clusters
    VECS = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.99, 0.1, 0.0]),
        (3, [0.5, 0.0, 0.0]),       # colinear with id 0 (cos = 1.0)
        (4, [0.05, 0.98, 0.0]),
        (5, [-1.0, -1.0, 4.0]),     # outlier
    ]

    @pytest.fixture(scope="class")
    def result(self, spark):
        df = spark.createDataFrame(
            self.VECS, "vec_id long, embedding array<float>"
        )
        return {
            r["vec_id"]: r
            for r in semdedup(df, k=2, iters=2, threshold=0.9).collect()
        }

    def test_drop_rule_matches_python(self, result):
        # independent re-check of the pair/drop logic over the cells
        # and centroid distances Spark assigned (kmeans_ivf itself is
        # covered by test_dataops/test_plans)
        vec = {i: v for i, v in self.VECS}
        expect_drop = set()
        ids = list(result)
        for a in ids:
            for b in ids:
                if a >= b or result[a]["cell"] != result[b]["cell"]:
                    continue
                if _cos(vec[a], vec[b]) < 0.9:
                    continue
                da, db = result[a]["dist"], result[b]["dist"]
                loser = a if (da < db or (da == db and a > b)) else b
                expect_drop.add(loser)
        got_drop = {i for i in ids if not result[i]["keep"]}
        assert got_drop == expect_drop
        assert expect_drop  # the fixture must actually exercise drops

    def test_every_vector_gets_a_row(self, result):
        assert set(result) == {i for i, _ in self.VECS}

    def test_farthest_member_never_dropped(self, result):
        # the drop rule only ever removes a vector when a same-cell
        # duplicate sits strictly farther from the centroid (or ties
        # with a smaller id) — so each cell's max-(dist, -id) vector is
        # unbeatable and must survive. (Both members of a pair CAN be
        # dropped via transitive chains: here 0 and 3 both lose to 2.)
        cells = {r["cell"] for r in result.values()}
        for cell in cells:
            members = [r for r in result.values() if r["cell"] == cell]
            vmax = max(members, key=lambda r: (r["dist"], -r["vec_id"]))
            assert vmax["keep"], cell
        # and the fixture's colinear trio {0, 2, 3} must have collapsed
        # to its farthest member
        assert not result[0]["keep"] and not result[3]["keep"]
        assert result[2]["keep"]

    def test_plan_shape(self, spark):
        # the 100-TB guarantees: within-cell pairing is an EQUI-join on
        # cell (one shuffle), never a nested-loop/cartesian product;
        # vector re-attach and the keep-join are id equi-joins
        df = spark.createDataFrame(
            self.VECS, "vec_id long, embedding array<float>"
        )
        plan = (
            semdedup(df, k=2, iters=1, threshold=0.9)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_hot_cell_capped_pairs_bounded(self, spark):
        """One-cluster degenerate corpus (r4 verdict #8): all B
        embeddings land in a single cell; the cell_cap anchor rule
        keeps pair cost O(B*cap), still keeps exactly one survivor,
        and the DuckDB twin applies the identical rule."""
        import duckdb
        from beats_spark.operators.similarity import semdedup_sql

        B, cap = 400, 4
        rows = [(i, [1.0, 0.0, 0.0]) for i in range(B)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>"
        )
        out = semdedup(
            df, k=2, iters=1, threshold=0.9, cell_cap=cap
        ).collect()
        assert len(out) == B
        keeps = [r["vec_id"] for r in out if r["keep"]]
        assert keeps == [0]  # identical dists: ties drop the larger id
        total_pairs = sum(r["n_dup_pairs"] for r in out)
        assert 0 < total_pairs <= cap * B
        assert total_pairs < B * (B - 1) // 2 / 10

        con = duckdb.connect()
        con.register(
            "emb_v",
            spark.createDataFrame(
                rows, "vec_id long, embedding array<double>"
            ).toPandas(),
        )
        con.execute("CREATE TABLE embs AS SELECT * FROM emb_v")
        want = con.execute(
            semdedup_sql("embs", k=2, iters=1, threshold=0.9, cell_cap=cap)
            + " ORDER BY vec_id"
        ).fetchall()
        got = sorted(
            (r["vec_id"], r["cell"], r["dist"], r["n_dup_pairs"], r["keep"])
            for r in out
        )
        assert [tuple(w) for w in want] == got

    def test_impossible_threshold_keeps_all(self, spark):
        df = spark.createDataFrame(
            self.VECS, "vec_id long, embedding array<float>"
        )
        rows = semdedup(df, k=2, iters=2, threshold=1.01).collect()
        assert all(r["keep"] for r in rows)
        assert all(r["n_dup_pairs"] == 0 for r in rows)


# ---------------------------------------------------------------------------
# domain mixing (operators/sampling.py domain_mix)


class TestDomainMix:
    DOCS = [
        # src_a: 12 tokens total; src_b: 6; src_c: 4; src_d unlisted
        (0, "a b c d e f", "src_a"),
        (1, "g h i j k l", "src_a"),
        (2, "m n o", "src_b"),
        (3, "p q r", "src_b"),
        (4, "s t u v", "src_c"),
        (5, "", "src_empty"),
        (6, "w x", "src_d"),
    ]

    def _df(self, spark):
        return spark.createDataFrame(
            self.DOCS, "doc_id long, text string, source string"
        )

    def test_rates_clip_and_zero(self, spark):
        from beats_spark.operators.sampling import domain_mix_rates

        # budget 12 tokens: src_a asks 0.75*12=9 of 12 -> 0.75;
        # src_b asks 0.25*12=3 of 6 -> 0.5; src_c asks 2.0*12=24 of 4
        # -> clipped 1.0; src_d/src_empty unlisted -> 0.0
        rates = {
            r["source"]: r["rate"]
            for r in domain_mix_rates(
                self._df(spark),
                {"src_a": 0.75, "src_b": 0.25, "src_c": 2.0},
                budget=12,
            ).collect()
        }
        assert rates["src_a"] == 0.75
        assert rates["src_b"] == 0.5
        assert rates["src_c"] == 1.0  # clipped
        assert rates["src_d"] == 0.0
        assert rates["src_empty"] == 0.0  # 0-token guard, not NULL->1.0

    def test_kept_set_matches_hash_rule(self, spark):
        import hashlib
        import math

        from beats_spark.operators.sampling import SAMPLE_MOD, domain_mix

        weights = {"src_a": 0.75, "src_b": 0.25, "src_c": 2.0}
        kept = {
            r["doc_id"]
            for r in domain_mix(self._df(spark), weights, budget=12).collect()
        }
        rates = {"src_a": 0.75, "src_b": 0.5, "src_c": 1.0}
        expect = set()
        for doc_id, _, src in self.DOCS:
            rate = rates.get(src, 0.0)
            code = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16)
            if code % SAMPLE_MOD < math.floor(rate * SAMPLE_MOD):
                expect.add(doc_id)
        assert kept == expect
        # clipped stratum keeps everything; zero-weight keeps nothing
        assert 4 in kept and 6 not in kept

    def test_no_corpus_shuffle(self, spark):
        from beats_spark.operators.sampling import domain_mix

        plan = (
            domain_mix(self._df(spark), {"src_a": 1.0}, budget=10)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        # rate table joins broadcast; the corpus side never shuffles
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" not in plan


# ---------------------------------------------------------------------------
# text normalization (operators/clean.py)


class TestCleanText:
    CASES = [
        # (dirty, expected-clean)
        ("plain text", "plain text"),
        ("a\r\nb\rc", "a\nb\nc"),                      # CRLF/CR -> LF
        ("x\x00\x07y\x7fz", "xyz"),                    # controls deleted
        ("a\u00adb\u200bc\u200cd\u200de\ufeff", "abcde"),  # zero-width
        ("a\u00a0b\u2009c\u3000d", "a b c d"),         # unispaces
        ("too    many\t\tspaces", "too many spaces"),  # runs collapse
        ("p1\n\n\n\n\np2", "p1\n\np2"),                # >=3 LF -> 2
        ("  \n\n hi \n ", "hi"),                       # outer trim
        ("", ""),
    ]

    def test_matches_python_oracle(self, spark):
        import re

        from beats_spark.operators.clean import CLEAN_STEPS, clean_documents

        def py_clean(s):
            # Python re lacks \x{..}: rewrite to \uXXXX for the mirror
            for pat, rep in CLEAN_STEPS:
                pat = re.sub(
                    r"\\x\{([0-9a-f]+)\}",
                    lambda m: "\\u" + m.group(1).zfill(4),
                    pat,
                )
                s = re.sub(pat, rep, s)
            return s

        df = spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(self.CASES)],
            "doc_id long, text string",
        )
        got = {r["doc_id"]: r for r in clean_documents(df).collect()}
        for i, (dirty, want) in enumerate(self.CASES):
            assert got[i]["cleaned"] == want, (i, dirty)
            assert got[i]["cleaned"] == py_clean(dirty), (i, dirty)
            assert got[i]["n_removed"] == len(dirty) - len(want), i
            assert got[i]["changed"] == (dirty != want), i

    def test_single_stage_no_shuffle(self, spark):
        from beats_spark.operators.clean import clean_documents

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        plan = (
            clean_documents(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestHtmlStrip:
    CASES = [
        # (raw crawl, expected extracted text)
        ("<p>hello</p>", "hello"),
        # container contents vanish, even with tags inside the script
        (
            '<p>doc</p><script type="x">var q="</p>";\nmore</script>tail',
            "doc\ntail",
        ),
        ("<STYLE>p{color:red}</STYLE>body", "body"),
        ("<!-- note\nspans lines -->kept", "kept"),
        # block closers break lines so cells/paragraphs don't fuse
        ("<ul><li>one</li><li>two</li></ul>", "one\ntwo"),
        ("<table><tr><td>a</td><td>b</td></tr></table>", "a\nb"),
        ("line<br/>break<BR>again", "line\nbreak\nagain"),
        # inline tags are deleted without a break
        ("a <b>bold</b> word", "a bold word"),
        # bare '<' in prose survives (no letter after it)
        ("x < 3 and y <= 4", "x < 3 and y <= 4"),
        # entities decode AFTER tag removal; &amp; decodes last so
        # double-escaped text decodes exactly one level
        ("a &amp;amp; b &lt;tag&gt; &quot;q&quot; it&#39;s", 'a &amp; b <tag> "q" it\'s'),
        ("&nbsp;&nbsp;lead&apos;", "lead'"),
        ("no markup", "no markup"),
    ]

    def test_expected_values_and_duckdb_parity(self, spark):
        import duckdb

        from beats_spark.operators.clean import html_strip, html_strip_sql

        df = spark.createDataFrame(
            [(i, t) for i, (t, _) in enumerate(self.CASES)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r["out"]
            for r in df.select(
                "doc_id", html_strip(F.col("text")).alias("out")
            ).collect()
        }
        con = duckdb.connect()
        sql = html_strip_sql("text")
        for i, (raw, want) in enumerate(self.CASES):
            assert got[i] == want, (i, raw, got[i])
            duck = con.execute(
                f"SELECT {sql} FROM (SELECT ? AS text)", [raw]
            ).fetchone()[0]
            assert got[i] == duck, (i, raw, duck)

    def test_single_stage_no_shuffle(self, spark):
        from beats_spark.operators.clean import clean_documents

        df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, text string")
        plan = (
            clean_documents(df, html=True)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan


class TestC4LineFilter:
    """C4 §2.2 line-level filter (operators/clean.py c4_line_filter):
    hand-derived expected pages + DuckDB-twin parity + plan shape."""

    # (raw page, expected cleaned, expected n_kept, expected page_kept
    #  at min_sentences=2)
    CASES = [
        # good page: two kept sentences
        (
            "This sentence is properly formed.\nAnd so is this one!",
            "This sentence is properly formed.\nAnd so is this one!",
            2,
            True,
        ),
        # no terminal punctuation -> line dropped
        ("Home | About | Contact\nReal sentence stays right here.",
         "Real sentence stays right here.", 1, False),
        # javascript line dropped even though well-formed
        (
            "Please enable JavaScript to view.\nA real line survives"
            " here today. Twice.",
            "A real line survives here today. Twice.",
            1,
            True,
        ),
        # < 3 words dropped; trailing-quote terminal kept
        ('Too short.\nShe said "stop right there."',
         'She said "stop right there."', 1, False),
        # lorem ipsum kills the page even when lines are fine
        (
            "Lorem ipsum dolor sit amet sentence.\nAnother good line"
            " is here.",
            "Lorem ipsum dolor sit amet sentence.\nAnother good line"
            " is here.",
            2,
            False,
        ),
        # curly brace kills the page; brace line itself also dropped
        ("function f() { return 1; }\nKept line with three words.",
         "Kept line with three words.", 1, False),
        # question marks count as sentences
        ("Is this kept? Yes it is kept.", "Is this kept? Yes it is kept.",
         1, True),
        # everything dropped -> empty string (Spark array_join('')
        # vs DuckDB NULL gotcha)
        ("menu\nfooter\n2024", "", 0, False),
    ]

    def test_expected_values_and_duckdb_parity(self, spark):
        import duckdb

        from beats_spark.operators.clean import (
            c4_line_filter,
            c4_line_filter_sql,
        )

        df = spark.createDataFrame(
            [(i, t) for i, (t, _, _, _) in enumerate(self.CASES)],
            "doc_id long, text string",
        )
        got = {
            r["doc_id"]: r
            for r in c4_line_filter(df, min_sentences=2).collect()
        }
        con = duckdb.connect()
        for i, (raw, want, n_kept, page_kept) in enumerate(self.CASES):
            assert got[i]["cleaned"] == want, (i, raw, got[i]["cleaned"])
            assert got[i]["n_kept"] == n_kept, (i, raw)
            assert got[i]["page_kept"] == page_kept, (i, raw)
            assert got[i]["n_removed"] == len(raw) - len(want), i
            sql = c4_line_filter_sql(
                "(SELECT 0 AS doc_id, ? AS text)", min_sentences=2
            )
            duck = con.execute(
                f"SELECT cleaned, n_kept, page_kept FROM ({sql})", [raw]
            ).fetchone()
            assert duck == (want, n_kept, page_kept), (i, raw, duck)

    def test_single_stage_no_shuffle(self, spark):
        from beats_spark.operators.clean import c4_line_filter

        df = spark.createDataFrame(
            [(1, "a.\nb.")], "doc_id long, text string"
        )
        plan = (
            c4_line_filter(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
        assert "Python" not in plan
