"""Corpus-trained n-gram language-model quality scoring (CCNet-style).

CCNet (Wenzek et al. 2019, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") scores every web document with the
perplexity of a language model trained on a clean reference corpus and
keeps the low-perplexity head. This module is that stage reduced to a
fully deterministic, cross-engine-checkable form: an add-k-smoothed
BIGRAM model (KenLM's 5-gram + Kneser-Ney backoff needs out-of-band
model files; the bigram+add-k reduction keeps training AND scoring
inside the engine, oracle-checkable in plain SQL) trained on a
deterministic reference slice of the corpus (``doc_id % train_mod ==
0``) and used to score every document.

Model definition (identical on both engines):

- tokens      = whitespace words of ``lower(text)``; each document's
  sequence is prefixed with the sentence-start token ``<s>``
- bigrams     = adjacent (prev, cur) pairs — n bigrams for n tokens,
  every real token predicted exactly once
- c2(p, c)    = training bigram count; c1(p) = Σ_c c2(p, c)
- V           = |distinct training ``cur``| + 1 (one unseen bucket)
- P(c | p)    = (c2 + α) / (c1 + α·V)   (add-k; unseen context → 1/V)
- per-token log2 P is snapped to exact micro-units
  (``floor(logp·1e6 + 0.5)`` as BIGINT) so the per-document sum is an
  order-free INTEGER sum — float aggregation order differs between
  engines (and between Spark partitionings), integer sums never do
- cross_entropy = −Σ micro / (n·1e6), rounded 6 dp;
  perplexity = 2^cross_entropy of the ROUNDED entropy, rounded 6 dp

100-TB shape: the training pass scans only the reference slice (the
``doc_id % train_mod`` predicate is pushed to the scan); the count
tables are vocabulary-bounded, not corpus-bounded, so the scoring pass
is one corpus scan + two BROADCAST joins (bigram + context counts) +
one map-side-combining groupBy on doc_id. At real scale the LM tables
are pruned to the top-M n-grams exactly as CCNet prunes its KenLM
vocabulary; nothing in the plan shuffles the corpus by anything other
than doc_id.

No reference-repo counterpart (training-data extension per the brief;
the closest beats concept is the enrich-with-broadcast-dim shape of
`libbeat/processors/add_cloud_metadata`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.textstats import WORDS_SQL, words

#: sentence-start context token (never a prediction target)
S_TOKEN = "<s>"
#: micro-units per log2 — the float→integer snap used for exact sums
LM_SCALE = 1_000_000
#: default deterministic reference slice: doc_id % TRAIN_MOD == 0
TRAIN_MOD = 5
#: default add-k smoothing mass
ALPHA = 1.0


def _token_seq(text: Column) -> Column:
    """``['<s>'] ++ whitespace-words(lower(text))``."""
    return F.concat(F.array(F.lit(S_TOKEN)), words(F.lower(text)))


def _bigram_structs(seq: Column) -> Column:
    """Adjacent (prev, cur) pairs of a token sequence, as an array of
    structs. ``seq`` must reference a MATERIALIZED column (it is used
    three times; see the expression-reuse gotcha in CLAUDE.md)."""
    n = F.size(seq) - 1
    return F.zip_with(
        F.slice(seq, 1, n),
        F.slice(seq, 2, n),
        lambda a, b: F.struct(a.alias("prev"), b.alias("cur")),
    )


def _bigrams(
    df: DataFrame, id_col: str, text_col: str, carry: tuple[str, ...] = ()
) -> DataFrame:
    """(doc_id, prev, cur) — one row per predicted token. ``carry``
    threads extra per-document columns (e.g. the language) through
    the explode so downstream grouping never needs a corpus self-join
    to recover them."""
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        *carry,
        _token_seq(F.col(text_col)).alias("_seq"),
    )
    return staged.select(
        "doc_id",
        *carry,
        F.explode(_bigram_structs(F.col("_seq"))).alias("bg"),
    ).select(
        "doc_id",
        *carry,
        F.col("bg.prev").alias("prev"),
        F.col("bg.cur").alias("cur"),
    )


def bigram_lm_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = ALPHA,
    train_mod: int = TRAIN_MOD,
) -> DataFrame:
    """Per-document cross-entropy + perplexity under the bigram LM
    trained on the ``doc_id % train_mod == 0`` reference slice.

    Returns (doc_id, n_tokens, cross_entropy, perplexity, is_train).
    Documents with zero tokens have no predictable position and emit
    no row (identically on both engines).
    """
    # training pass: filter BEFORE tokenizing so only the reference
    # slice is scanned (predicate pushdown) — the scoring pass below is
    # the only full corpus scan
    train = df.where(F.col(id_col) % train_mod == 0)
    c2 = (
        _bigrams(train, id_col, text_col)
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("n2"))
    )
    # context counts derive from the bigram table (vocab-sized), not
    # from a second corpus pass
    c1 = c2.groupBy("prev").agg(F.sum("n2").alias("n1"))
    vdf = c2.agg(
        (F.countDistinct("cur") + F.lit(1)).cast("double").alias("v")
    )

    scored = (
        _bigrams(df, id_col, text_col)
        .join(F.broadcast(c2), ["prev", "cur"], "left")
        .join(F.broadcast(c1), ["prev"], "left")
        .crossJoin(F.broadcast(vdf))
    )
    logp = F.log2(
        (F.coalesce(F.col("n2"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("n1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
    )
    micro = F.floor(logp * F.lit(float(LM_SCALE)) + F.lit(0.5)).cast("long")
    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(micro).alias("_s"),
    )
    staged = agg.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(
            -F.col("_s").cast("double")
            / (F.col("n_tokens") * F.lit(float(LM_SCALE))),
            6,
        ).alias("cross_entropy"),
    )
    return staged.select(
        F.col("doc_id").alias(id_col),
        "n_tokens",
        "cross_entropy",
        # 2^ce of the ROUNDED entropy: both engines exponentiate the
        # identical double
        F.round(F.pow(F.lit(2.0), F.col("cross_entropy")), 6).alias(
            "perplexity"
        ),
        (F.col("doc_id") % train_mod == 0).alias("is_train"),
    )


def ccnet_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    alpha: float = ALPHA,
    train_mod: int = TRAIN_MOD,
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2019 §4.3): per
    language, order documents by LM perplexity and cut the corpus into
    three buckets of ~equal TOKEN MASS — 'head' is the clean third the
    paper trains on, 'tail' the discard candidate.

    Determinism: perplexity is the 6-dp-rounded value both engines
    compute identically; ties break on doc_id; the tercile cut is pure
    integer comparison (3·prefix < total, 3·prefix < 2·total) on exact
    long token sums — no float quantile boundary to disagree on.

    100-TB shape: same scoring plan as :func:`bigram_lm_scores` (the
    language rides the explode via ``carry`` — no corpus self-join to
    recover it), then ONE window exchange keyed by language. Real
    corpora have few languages, so at extreme scale the window key is
    (lang, salt) with per-salt offsets from a counts pass — same
    integer cut, documented here, not needed below ~10^9 docs/lang."""
    train = df.where(F.col(id_col) % train_mod == 0)
    c2 = (
        _bigrams(train, id_col, text_col)
        .groupBy("prev", "cur")
        .agg(F.count("*").alias("n2"))
    )
    c1 = c2.groupBy("prev").agg(F.sum("n2").alias("n1"))
    vdf = c2.agg(
        (F.countDistinct("cur") + F.lit(1)).cast("double").alias("v")
    )
    scored = (
        _bigrams(df, id_col, text_col, carry=(lang_col,))
        .join(F.broadcast(c2), ["prev", "cur"], "left")
        .join(F.broadcast(c1), ["prev"], "left")
        .crossJoin(F.broadcast(vdf))
    )
    logp = F.log2(
        (F.coalesce(F.col("n2"), F.lit(0)) + F.lit(alpha))
        / (F.coalesce(F.col("n1"), F.lit(0)) + F.lit(alpha) * F.col("v"))
    )
    micro = F.floor(logp * F.lit(float(LM_SCALE)) + F.lit(0.5)).cast("long")
    agg = scored.groupBy("doc_id", lang_col).agg(
        F.count("*").cast("long").alias("n_tokens"),
        F.sum(micro).alias("_s"),
    )
    ce = F.round(
        -F.col("_s").cast("double")
        / (F.col("n_tokens") * F.lit(float(LM_SCALE))),
        6,
    )
    ppl = agg.select(
        F.col("doc_id").alias(id_col),
        lang_col,
        "n_tokens",
        F.round(F.pow(F.lit(2.0), ce), 6).alias("perplexity"),
    )
    w_ord = (
        Window.partitionBy(lang_col)
        .orderBy("perplexity", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(lang_col)
    prefix = F.coalesce(
        F.sum("n_tokens").over(w_ord), F.lit(0).cast("long")
    )
    total = F.sum("n_tokens").over(w_all)
    staged = ppl.select(
        id_col,
        lang_col,
        "n_tokens",
        "perplexity",
        prefix.alias("_pre"),
        total.alias("_tot"),
    )
    bucket = (
        F.when(3 * F.col("_pre") < F.col("_tot"), F.lit("head"))
        .when(3 * F.col("_pre") < 2 * F.col("_tot"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return staged.select(
        id_col, lang_col, "n_tokens", "perplexity", bucket.alias("bucket")
    )


def ccnet_buckets_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    alpha: float = ALPHA,
    train_mod: int = TRAIN_MOD,
) -> str:
    """DuckDB twin of :func:`ccnet_buckets` (lock-step scoring, same
    integer tercile cut)."""
    toks = WORDS_SQL.format(c=f"lower({text_col})")
    return f"""
WITH seqs AS (
  SELECT {id_col} AS doc_id, {lang_col},
         ['{S_TOKEN}'] || {toks} AS ts FROM {table}
),
bg AS (
  SELECT doc_id, {lang_col}, ts[i] AS prev, ts[i + 1] AS cur
  FROM seqs, unnest(generate_series(1, len(ts) - 1)) AS t(i)
),
c2 AS (
  SELECT prev, cur, count(*) AS n2
  FROM bg WHERE doc_id % {train_mod} = 0 GROUP BY 1, 2
),
c1 AS (SELECT prev, CAST(sum(n2) AS BIGINT) AS n1 FROM c2 GROUP BY 1),
v AS (SELECT (count(DISTINCT cur) + 1)::DOUBLE AS v FROM c2),
scored AS (
  SELECT doc_id, {lang_col},
         CAST(floor(
           log2((coalesce(n2, 0) + {alpha})
                / (coalesce(n1, 0) + {alpha} * v.v))
           * {LM_SCALE} + 0.5) AS BIGINT) AS m
  FROM bg LEFT JOIN c2 USING (prev, cur)
          LEFT JOIN c1 USING (prev)
          CROSS JOIN v
),
agg AS (
  SELECT doc_id, {lang_col}, CAST(count(*) AS BIGINT) AS n_tokens,
         round(pow(2.0, round(-CAST(sum(m) AS BIGINT)
               / (count(*) * {LM_SCALE}.0), 6)), 6) AS perplexity
  FROM scored GROUP BY 1, 2
),
cut AS (
  SELECT *,
         coalesce(CAST(sum(n_tokens) OVER (
           PARTITION BY {lang_col} ORDER BY perplexity, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS BIGINT), 0) AS pre,
         CAST(sum(n_tokens) OVER (PARTITION BY {lang_col}) AS BIGINT)
           AS tot
  FROM agg
)
SELECT doc_id AS {id_col}, {lang_col}, n_tokens, perplexity,
       CASE WHEN 3 * pre < tot THEN 'head'
            WHEN 3 * pre < 2 * tot THEN 'middle'
            ELSE 'tail' END AS bucket
FROM cut
"""


def bigram_lm_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = ALPHA,
    train_mod: int = TRAIN_MOD,
) -> str:
    """DuckDB twin of :func:`bigram_lm_scores` (lock-step: same token
    split, same ``<s>`` prefix, same micro-unit snap, same rounding)."""
    toks = WORDS_SQL.format(c=f"lower({text_col})")
    return f"""
WITH seqs AS (
  SELECT {id_col} AS doc_id, ['{S_TOKEN}'] || {toks} AS ts FROM {table}
),
bg AS (
  SELECT doc_id, ts[i] AS prev, ts[i + 1] AS cur
  FROM seqs, unnest(generate_series(1, len(ts) - 1)) AS t(i)
),
c2 AS (
  SELECT prev, cur, count(*) AS n2
  FROM bg WHERE doc_id % {train_mod} = 0 GROUP BY 1, 2
),
c1 AS (SELECT prev, CAST(sum(n2) AS BIGINT) AS n1 FROM c2 GROUP BY 1),
v AS (SELECT (count(DISTINCT cur) + 1)::DOUBLE AS v FROM c2),
scored AS (
  SELECT doc_id,
         CAST(floor(
           log2((coalesce(n2, 0) + {alpha})
                / (coalesce(n1, 0) + {alpha} * v.v))
           * {LM_SCALE} + 0.5) AS BIGINT) AS m
  FROM bg LEFT JOIN c2 USING (prev, cur)
          LEFT JOIN c1 USING (prev)
          CROSS JOIN v
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(-CAST(sum(m) AS BIGINT)
               / (count(*) * {LM_SCALE}.0), 6) AS cross_entropy
  FROM scored GROUP BY doc_id
)
SELECT doc_id AS {id_col}, n_tokens, cross_entropy,
       round(pow(2.0, cross_entropy), 6) AS perplexity,
       doc_id % {train_mod} = 0 AS is_train
FROM agg
"""


# ---------------------------------------------------------------------------
# DSIR: importance weights from a target/raw LM ratio


def dsir_weights(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = ALPHA,
    target_mod: int = 7,
    select_threshold: float = 0.0,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): fit one LM to a
    TARGET sample and one to the RAW pool, and weight every document by
    the likelihood ratio — documents that look more like the target
    than like the pool get weight > 1 and are preferentially selected.

    Reduction (same discipline as :func:`bigram_lm_scores`): both
    models are add-k bigram LMs over the shared tokenization; the
    target sample is the deterministic ``doc_id % target_mod == 0``
    slice and the raw pool is its complement (the paper uses hashed
    n-gram bag models — the bigram LM is the same feature family
    without the hash collisions, and it keeps both engines lock-step).
    Per-token log ratios are differences of the SAME integer
    micro-units, so the per-document sum is exact and order-free.

    Selection: the paper resamples with Gumbel noise; the
    deterministic analog here is a threshold on the per-token log2
    ratio (geometric-mean likelihood ratio), ``selected =
    log_weight_per_token >= select_threshold`` — 0.0 keeps documents
    at least as target-like as pool-like.

    Returns (doc_id, n_tokens, log_weight, log_weight_per_token,
    weight, is_target, selected); ``weight = 2^log_weight_per_token``
    (the per-token ratio — the TOTAL ratio 2^log_weight under- and
    overflows doubles for long documents, so only its log ships).

    100-TB shape: two slice-filtered training passes (both predicates
    push to the scan) + one corpus scan with four broadcast joins
    against vocab-bounded count tables + one groupBy on doc_id.
    """
    tgt = df.where(F.col(id_col) % target_mod == 0)
    raw = df.where(F.col(id_col) % target_mod != 0)

    def tables(part: DataFrame, sfx: str):
        c2 = (
            _bigrams(part, id_col, text_col)
            .groupBy("prev", "cur")
            .agg(F.count("*").alias(f"n2{sfx}"))
        )
        c1 = c2.groupBy("prev").agg(F.sum(f"n2{sfx}").alias(f"n1{sfx}"))
        v = c2.agg(
            (F.countDistinct("cur") + F.lit(1)).cast("double").alias(f"v{sfx}")
        )
        return c2, c1, v

    c2t, c1t, vt = tables(tgt, "_t")
    c2r, c1r, vr = tables(raw, "_r")

    scored = (
        _bigrams(df, id_col, text_col)
        .join(F.broadcast(c2t), ["prev", "cur"], "left")
        .join(F.broadcast(c1t), ["prev"], "left")
        .join(F.broadcast(c2r), ["prev", "cur"], "left")
        .join(F.broadcast(c1r), ["prev"], "left")
        .crossJoin(F.broadcast(vt))
        .crossJoin(F.broadcast(vr))
    )

    def micro(n2: str, n1: str, v: str) -> Column:
        logp = F.log2(
            (F.coalesce(F.col(n2), F.lit(0)) + F.lit(alpha))
            / (F.coalesce(F.col(n1), F.lit(0)) + F.lit(alpha) * F.col(v))
        )
        return F.floor(logp * F.lit(float(LM_SCALE)) + F.lit(0.5)).cast("long")

    agg = scored.groupBy("doc_id").agg(
        F.count("*").alias("n_tokens"),
        F.sum(micro("n2_t", "n1_t", "v_t")).alias("_st"),
        F.sum(micro("n2_r", "n1_r", "v_r")).alias("_sr"),
    )
    diff = (F.col("_st") - F.col("_sr")).cast("double")
    staged = agg.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.round(diff / F.lit(float(LM_SCALE)), 6).alias("log_weight"),
        F.round(
            diff / (F.col("n_tokens") * F.lit(float(LM_SCALE))), 6
        ).alias("log_weight_per_token"),
    )
    return staged.select(
        F.col("doc_id").alias(id_col),
        "n_tokens",
        "log_weight",
        "log_weight_per_token",
        F.round(
            F.pow(F.lit(2.0), F.col("log_weight_per_token")), 6
        ).alias("weight"),
        (F.col("doc_id") % target_mod == 0).alias("is_target"),
        (F.col("log_weight_per_token") >= F.lit(select_threshold)).alias(
            "selected"
        ),
    )


def dsir_weights_sql(
    table: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = ALPHA,
    target_mod: int = 7,
    select_threshold: float = 0.0,
) -> str:
    """DuckDB twin of :func:`dsir_weights`."""
    toks = WORDS_SQL.format(c=f"lower({text_col})")
    return f"""
WITH seqs AS (
  SELECT {id_col} AS doc_id, ['{S_TOKEN}'] || {toks} AS ts FROM {table}
),
bg AS (
  SELECT doc_id, ts[i] AS prev, ts[i + 1] AS cur
  FROM seqs, unnest(generate_series(1, len(ts) - 1)) AS t(i)
),
c2t AS (
  SELECT prev, cur, count(*) AS n2_t
  FROM bg WHERE doc_id % {target_mod} = 0 GROUP BY 1, 2
),
c1t AS (SELECT prev, CAST(sum(n2_t) AS BIGINT) AS n1_t FROM c2t GROUP BY 1),
vt AS (SELECT (count(DISTINCT cur) + 1)::DOUBLE AS v_t FROM c2t),
c2r AS (
  SELECT prev, cur, count(*) AS n2_r
  FROM bg WHERE doc_id % {target_mod} <> 0 GROUP BY 1, 2
),
c1r AS (SELECT prev, CAST(sum(n2_r) AS BIGINT) AS n1_r FROM c2r GROUP BY 1),
vr AS (SELECT (count(DISTINCT cur) + 1)::DOUBLE AS v_r FROM c2r),
scored AS (
  SELECT doc_id,
         CAST(floor(
           log2((coalesce(n2_t, 0) + {alpha})
                / (coalesce(n1_t, 0) + {alpha} * vt.v_t))
           * {LM_SCALE} + 0.5) AS BIGINT) AS m_t,
         CAST(floor(
           log2((coalesce(n2_r, 0) + {alpha})
                / (coalesce(n1_r, 0) + {alpha} * vr.v_r))
           * {LM_SCALE} + 0.5) AS BIGINT) AS m_r
  FROM bg LEFT JOIN c2t USING (prev, cur)
          LEFT JOIN c1t USING (prev)
          LEFT JOIN c2r USING (prev, cur)
          LEFT JOIN c1r USING (prev)
          CROSS JOIN vt CROSS JOIN vr
),
agg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         round(CAST(sum(m_t) - sum(m_r) AS BIGINT)
               / {LM_SCALE}.0, 6) AS log_weight,
         round(CAST(sum(m_t) - sum(m_r) AS BIGINT)
               / (count(*) * {LM_SCALE}.0), 6) AS log_weight_per_token
  FROM scored GROUP BY doc_id
)
SELECT doc_id AS {id_col}, n_tokens, log_weight, log_weight_per_token,
       round(pow(2.0, log_weight_per_token), 6) AS weight,
       doc_id % {target_mod} = 0 AS is_target,
       log_weight_per_token >= {select_threshold} AS selected
FROM agg
"""
