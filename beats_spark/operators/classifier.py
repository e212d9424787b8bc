"""In-engine trained logistic text classifier (fastText-style).

CCNet/LLaMA-style pipelines filter with a fastText linear classifier
trained on labeled text (Wikipedia-vs-crawl quality, language ID).
This module is that stage reduced to a fully deterministic,
cross-engine-checkable form: logistic regression by full-batch
gradient descent over hashed unigram+bigram bag-of-words features,
trained and scored entirely in the engine — the model parameters are
driver-side literals between iterations (the k-means / LM-count
discipline: vocabulary mass, never data mass).

Determinism contract (every float leaves the engine identical):

- features: whitespace words of ``lower(text)``; grams = unigrams +
  adjacent bigrams ``prev || ' ' || cur``; feature id = portable md5
  word code mod ``n_buckets`` — identical hashing on both engines.
- the logistic is the FAST SIGMOID ``σ̂(z) = 0.5 + z/(2(1+|z|))`` —
  rational arithmetic only. ``exp()`` is NOT correctly rounded by
  IEEE 754, so two engines' ``exp`` can differ in the last ulp and
  flip a downstream rounding; +,-,*,/,abs ARE correctly rounded, so
  the fast sigmoid is bit-identical everywhere. (Published use: it is
  a standard cheap logistic in NN folklore; the substitution changes
  the trained model, not the algorithm.)
- every cross-row sum is an INTEGER sum of snapped micro-units
  (``floor(x·1e6 + 0.5)`` — same LM_SCALE discipline as lm.py):
  per-(doc,h) weight·count products before the z sum, per-doc errors
  before the bias gradient, per-(doc,h) error·count/n terms before
  the weight gradient. Float aggregation order differs between
  engines and partitionings; integer sums never do.
- scalar expression TREES are mirrored exactly between the Spark
  code, the driver-side Python update, and the SQL twin — IEEE ops
  are deterministic per op, so identical trees give identical
  doubles.

100-TB shape: the gram table builds once (one explode + local
aggregation), is hash-partitioned by doc_id ONCE, and is the only
corpus-sized object; each GD iteration is ONE job over it — the
per-doc z groupBy reuses the build partitioning and the error join
back is exchange-free, so the corpus never re-shuffles inside the
loop (weights enter as a literal array — no weight join; the bias is
feature ``h = n_buckets``, so its gradient rides the same
aggregation). Scoring is one more pass. At production scale the
training slice is a bounded labeled sample (pass ``train_filter``) —
fastText-style filters train on MBs of labels and score the TBs;
only the scoring pass is corpus-sized.

No reference-repo counterpart (training-data extension per the
brief).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from ..plans.materialize import materialize as _materialize

from ..functions.textstats import WORDS_SQL, word_code, word_code_sql, words
from .lm import LM_SCALE

#: default hashed feature space size
N_BUCKETS = 256
#: default full-batch GD iterations / learning rate (reaches held-out
#: accuracy 1.0 on short separable lines; mean-normalized features
#: make the effective step scale ~lr/n², so LONG documents need lr
#: scaled up accordingly)
N_ITERS = 10
LEARNING_RATE = 32.0
#: default train slice: doc_id % TRAIN_MOD != 0 trains, == 0 held out
TRAIN_MOD = 5


def _grams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, gram) — unigrams + adjacent bigrams, one row per
    occurrence."""
    staged = df.select(
        F.col(id_col).alias("doc_id"),
        words(F.lower(F.col(text_col))).alias("_ws"),
    )
    # guard INSIDE the expression: an empty doc has size 0 and a
    # negative slice length aborts under ANSI (CLAUDE.md rule)
    n = F.greatest(F.size("_ws") - 1, F.lit(0))
    bi = F.zip_with(
        F.slice("_ws", 1, n),
        F.slice("_ws", 2, n),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return staged.select(
        "doc_id",
        F.explode(F.concat(F.col("_ws"), bi)).alias("gram"),
    )


def _features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_buckets: int,
    with_bias: bool = False,
) -> DataFrame:
    """(doc_id, h, cnt, n) — hashed gram counts + the doc's total gram
    count. One groupBy (map-side combine); docs with zero grams emit
    no rows (identically on both engines). ``with_bias`` appends the
    intercept as feature ``h = n_buckets`` with ``cnt = n`` (feature
    value n/n = 1): its gradient term ``floor(e·cnt/n + 0.5)``
    collapses to the plain error — the bias gradient — so ONE
    aggregation trains weights and bias together."""
    g = _grams(df, id_col, text_col).select(
        "doc_id",
        F.pmod(word_code(F.col("gram")), F.lit(n_buckets))
        .cast("int")
        .alias("h"),
    )
    counted = g.groupBy("doc_id", "h").agg(F.count("*").alias("cnt"))
    totals = counted.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    out = counted.join(totals, "doc_id")
    if with_bias:
        out = out.unionByName(
            totals.select(
                "doc_id",
                F.lit(n_buckets).alias("h"),
                F.col("n").alias("cnt"),
                "n",
            )
        )
    return out


def _fast_sigmoid(z: Column) -> Column:
    """σ̂(z) = 0.5 + z/(2(1+|z|)) — the exact tree mirrored in
    ``FAST_SIGMOID_SQL``."""
    return F.lit(0.5) + z / (F.lit(2.0) * (F.lit(1.0) + F.abs(z)))


FAST_SIGMOID_SQL = "(0.5 + {z} / (2.0 * (1.0 + abs({z}))))"


def train_logistic(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    iters: int = N_ITERS,
    lr: float = LEARNING_RATE,
    train_filter: Column | None = None,
) -> tuple[list[float], float]:
    """Train (weights, bias) by full-batch GD. ``label`` must be a
    0/1-valued integer Column; ``train_filter`` restricts the training
    slice (default: all rows). The bias is feature ``h = n_buckets``
    (see :func:`_features`), so each iteration is ONE job: the feature
    table is hash-partitioned by doc_id ONCE at build, the per-doc z
    groupBy reuses that partitioning, and the errors join back
    exchange-free — the corpus never re-shuffles inside the loop."""
    base = df if train_filter is None else df.where(train_filter)
    feats = (
        _features(base, id_col, text_col, n_buckets, with_bias=True)
        .join(
            base.select(
                F.col(id_col).alias("doc_id"),
                label.cast("int").alias("y"),
            ),
            "doc_id",
        )
        .repartition("doc_id")
        .transform(_materialize)
    )
    n_docs = feats.select("doc_id").distinct().count()
    w = [0.0] * (n_buckets + 1)
    scale = float(LM_SCALE)
    for it in range(iters):
        # decayed step — tames the fast sigmoid's saturation
        # oscillation; each unrolled SQL iteration embeds the SAME
        # literal, so the twins can't drift
        lr_t = lr / (1.0 + it)
        warr = F.array(*[F.lit(x) for x in w])
        # z per doc: integer sum of snapped w[h]·cnt micro-products
        # (the bias row contributes floor(w_b·n·1e6+0.5)/(n·1e6) ≈ w_b)
        zterm = F.floor(
            F.element_at(warr, F.col("h") + 1)
            * F.col("cnt")
            * F.lit(scale)
            + F.lit(0.5)
        ).cast("long")
        per_doc = feats.groupBy("doc_id").agg(
            F.max("n").alias("n"),
            F.max("y").alias("y"),
            F.sum(zterm).alias("_zs"),
        )
        z = F.col("_zs").cast("double") / (F.col("n") * F.lit(scale))
        emicro = F.floor(
            (_fast_sigmoid(z) - F.col("y")) * F.lit(scale) + F.lit(0.5)
        ).cast("long")
        errs = per_doc.select("doc_id", emicro.alias("e"))
        # weight gradient: integer sum of floor(e·cnt/n + 0.5) per
        # (doc,h); the bias row's term is floor(e + 0.5) = e itself
        gterm = F.floor(
            F.col("e").cast("double") * F.col("cnt") / F.col("n")
            + F.lit(0.5)
        ).cast("long")
        grads = {
            r["h"]: r["g"]
            for r in feats.join(errs, "doc_id")
            .groupBy("h")
            .agg(F.sum(gterm).alias("g"))
            .collect()
        }
        # update trees mirrored in the SQL twin: w - lr_t*(g/(N·1e6))
        w = [
            w[h] - lr_t * (grads.get(h, 0) / (n_docs * scale))
            for h in range(n_buckets + 1)
        ]
    return w[:n_buckets], w[n_buckets]


def score_documents(
    df: DataFrame,
    w: list[float],
    b: float,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
) -> DataFrame:
    """Score EVERY document with trained ``(w, b)`` — the 100-TB
    scoring pass: weights ride as plan literals (n_buckets+1 doubles),
    one corpus scan, one keyed groupBy with map-side combine, zero
    Python. Returns (doc_id, n_grams, score); zero-gram documents emit
    no row (no trainable content). Same snapped integer-micro-unit
    arithmetic as training, so cross-engine scores stay exact."""
    feats = _features(df, id_col, text_col, n_buckets, with_bias=True)
    warr = F.array(*[F.lit(x) for x in w + [b]])
    scale = float(LM_SCALE)
    zterm = F.floor(
        F.element_at(warr, F.col("h") + 1) * F.col("cnt") * F.lit(scale)
        + F.lit(0.5)
    ).cast("long")
    per_doc = feats.groupBy("doc_id").agg(
        F.max("n").alias("n"), F.sum(zterm).alias("_zs")
    )
    z = F.col("_zs").cast("double") / (F.col("n") * F.lit(scale))
    return per_doc.select(
        "doc_id",
        F.col("n").cast("long").alias("n_grams"),
        F.round(_fast_sigmoid(z), 6).alias("score"),
    )


def classifier_scores(
    df: DataFrame,
    label: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    iters: int = N_ITERS,
    lr: float = LEARNING_RATE,
    train_mod: int = TRAIN_MOD,
) -> DataFrame:
    """Train on the ``doc_id % train_mod != 0`` slice, score EVERY
    document: (doc_id, n_grams, score, pred, label, is_train,
    correct). Zero-gram documents emit no row."""
    w, b = train_logistic(
        df,
        label,
        id_col=id_col,
        text_col=text_col,
        n_buckets=n_buckets,
        iters=iters,
        lr=lr,
        train_filter=F.col(id_col) % train_mod != 0,
    )
    scored = score_documents(
        df, w, b, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    lab = df.select(
        F.col(id_col).alias("doc_id"), label.cast("boolean").alias("label")
    )
    return (
        scored.join(lab, "doc_id")
        .select(
            F.col("doc_id").alias(id_col),
            "n_grams",
            "score",
            (F.col("score") >= 0.5).alias("pred"),
            "label",
            (F.col("doc_id") % train_mod != 0).alias("is_train"),
            ((F.col("score") >= 0.5) == F.col("label")).alias("correct"),
        )
    )


def classifier_scores_sql(
    table: str,
    label_expr: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_BUCKETS,
    iters: int = N_ITERS,
    lr: float = LEARNING_RATE,
    train_mod: int = TRAIN_MOD,
) -> str:
    """DuckDB twin of :func:`classifier_scores` — the GD loop unrolled
    into CTE pairs (eN = per-doc errors, wN = updated parameters; the
    bias is weight row ``h = n_buckets``), lock-step with the
    Spark/driver arithmetic: same hashing, same snapped integer sums,
    same fast sigmoid, same update trees. Every CTE in the loop chain
    is MATERIALIZED — DuckDB inlines plain CTEs, and an unrolled
    recursion re-expands the whole upstream chain per reference.
    ``label_expr`` must evaluate to 0/1."""
    toks = WORDS_SQL.format(c=f"lower({text_col})")
    hname = word_code_sql("gram")

    def zs(wtab: str, feat: str) -> str:
        """per-doc z numerator from a weight table (bias row incl.)."""
        return f"""(
  SELECT f.doc_id, f.n, any_value(f.y) AS y,
         CAST(sum(CAST(floor(w.w * f.cnt * {LM_SCALE}.0 + 0.5) AS BIGINT))
              AS BIGINT) AS zs
  FROM {feat} f JOIN {wtab} w USING (h)
  GROUP BY f.doc_id, f.n
)"""

    ctes = [
        f"""seqs AS MATERIALIZED (
  SELECT {id_col} AS doc_id, {toks} AS ws,
         CAST({label_expr} AS INTEGER) AS y
  FROM {table}
)""",
        """grams AS MATERIALIZED (
  SELECT doc_id, y, ws[i] AS gram
  FROM seqs, unnest(generate_series(1, len(ws))) AS t(i)
  UNION ALL
  SELECT doc_id, y, ws[i] || ' ' || ws[i + 1] AS gram
  FROM seqs, unnest(generate_series(1, len(ws) - 1)) AS t(i)
)""",
        f"""hashed AS MATERIALIZED (
  SELECT doc_id, y, {hname} % {n_buckets} AS h FROM grams
)""",
        """counted AS MATERIALIZED (
  SELECT doc_id, any_value(y) AS y, h, count(*) AS cnt
  FROM hashed GROUP BY doc_id, h
)""",
        """totals AS MATERIALIZED (
  SELECT doc_id, any_value(y) AS y, CAST(sum(cnt) AS BIGINT) AS n
  FROM counted GROUP BY doc_id
)""",
        f"""featsall AS MATERIALIZED (
  SELECT c.doc_id, c.y, c.h, c.cnt, t.n
  FROM counted c JOIN totals t USING (doc_id)
  UNION ALL
  SELECT doc_id, y, {n_buckets} AS h, n AS cnt, n FROM totals
)""",
        f"""feats AS MATERIALIZED (
  SELECT * FROM featsall WHERE doc_id % {train_mod} <> 0
)""",
        "ndocs AS MATERIALIZED (SELECT count(DISTINCT doc_id)::DOUBLE AS nd FROM feats)",
        f"""w0 AS MATERIALIZED (
  SELECT i AS h, 0.0::DOUBLE AS w
  FROM unnest(generate_series(0, {n_buckets})) AS t(i)
)""",
    ]
    prev_w = "w0"
    for i in range(1, iters + 1):
        # repr() round-trips the exact double the Python update used
        lr_t = lr / (1.0 + (i - 1))
        ctes.append(
            f"""e{i} AS MATERIALIZED (
  SELECT doc_id, n,
         CAST(floor(({FAST_SIGMOID_SQL.format(
             z=f'(zs / (n * {LM_SCALE}.0))')} - y)
              * {LM_SCALE}.0 + 0.5) AS BIGINT) AS e
  FROM {zs(prev_w, 'feats')}
)"""
        )
        ctes.append(
            f"""w{i} AS MATERIALIZED (
  SELECT w.h,
         w.w - {lr_t!r} * (coalesce(g.g, 0) / (nd * {LM_SCALE}.0)) AS w
  FROM {prev_w} w
  LEFT JOIN (
    SELECT f.h,
           CAST(sum(CAST(floor(e.e * f.cnt / f.n + 0.5) AS BIGINT))
                AS BIGINT) AS g
    FROM feats f JOIN e{i} e USING (doc_id) GROUP BY f.h
  ) g USING (h)
  CROSS JOIN ndocs
)"""
        )
        prev_w = f"w{i}"
    ctes.append(
        f"""finalz AS MATERIALIZED (
  SELECT f.doc_id, f.n,
         CAST(sum(CAST(floor(w.w * f.cnt * {LM_SCALE}.0 + 0.5) AS BIGINT))
              AS BIGINT) AS zs
  FROM featsall f JOIN {prev_w} w USING (h)
  GROUP BY f.doc_id, f.n
)"""
    )
    body = ",\n".join(ctes)
    score = (
        f"round({FAST_SIGMOID_SQL.format(z=f'(zs / (n * {LM_SCALE}.0))')}"
        ", 6)"
    )
    return f"""
WITH {body}
SELECT f.doc_id AS {id_col}, CAST(f.n AS BIGINT) AS n_grams,
       {score} AS score,
       {score} >= 0.5 AS pred,
       CAST(s.y AS BOOLEAN) AS label,
       f.doc_id % {train_mod} <> 0 AS is_train,
       ({score} >= 0.5) = CAST(s.y AS BOOLEAN) AS correct
FROM finalz f
JOIN (SELECT DISTINCT doc_id, y FROM seqs) s USING (doc_id)
"""
