"""Distributed BPE vocabulary training + corpus tokenization.

Byte-pair encoding (Sennrich et al. 2016, "Neural Machine Translation
of Rare Words with Subword Units") is the tokenizer family every
modern pretraining pipeline runs; the existing `textstats` token
counters are estimators, this module is the real thing, shaped for
Spark the way public trainers (HuggingFace tokenizers, subword-nmt)
shape it for a single box:

1. **Count, don't stream.** BPE training only needs the (word, count)
   table, never the corpus: one explode → groupBy with map-side
   combine — the ONLY corpus-wide shuffle in training. The distinct
   table is Zipf-bounded and capped at ``max_words`` deterministically
   (count desc, word asc), so what reaches the driver is vocabulary
   mass, not data mass (same driver-literal discipline as the k-means
   centroids in similarity.py).
2. **Merge on the driver.** The classic greedy merge loop runs over
   the count table in plain Python — deterministic: most-frequent
   pair wins, ties break on the lexicographically smallest pair.
3. **Encode the VOCABULARY, not the corpus.** Tokenization applies
   the merge ranks per DISTINCT word (Arrow pandas UDF over the
   bounded word dim — the sanctioned Python case: an iterative
   rank-driven merge loop is not expressible as Column work), then
   the corpus picks up token arrays via a broadcast join on the word.
   The 100-TB corpus itself never runs a single row of Python.

End-of-word marker: ``</w>`` appended as its own initial symbol (the
subword-nmt convention), so merges distinguish suffixes from infixes
and decoding is lossless: ``concat(tokens).rstrip('</w>') == word``.

No reference-repo counterpart (training-data extension per the
brief); the word-count shape mirrors the metrics tallies pipeline
(libbeat/monitoring aggregation, SURVEY §2.8) at vocabulary scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import WORDS_SQL, words

#: end-of-word sentinel symbol (subword-nmt convention)
EOW = "</w>"


# -- training ----------------------------------------------------------------


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — one explode + one groupBy (map-side
    combine does the heavy lifting; the shuffle moves distinct words,
    not occurrences)."""
    return (
        df.select(F.explode(words(F.lower(F.col(text_col)))).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def _merge_loop(
    counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Greedy BPE over a (word, count) table (driver-side, pure
    Python). Deterministic: best pair = max count, ties to the
    lexicographically smallest (a, b)."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in counts:
        sym = tuple(list(w) + [EOW])
        vocab[sym] = vocab.get(sym, 0) + c
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        a, b = best
        ab = a + b
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            t = tuple(out)
            new_vocab[t] = new_vocab.get(t, 0) + c
        vocab = new_vocab
    return merges


def train_bpe(
    df: DataFrame,
    n_merges: int = 200,
    max_words: int = 100_000,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Train BPE merges over the corpus. The driver sees at most
    ``max_words`` (word, count) rows — vocabulary, never data; the
    cap is deterministic (count desc, word asc) so retraining on a
    repartitioned corpus yields identical merges."""
    wc = word_counts(df, text_col)
    top = (
        wc.orderBy(F.desc("n"), F.asc("word"))
        .limit(max_words)
        .collect()
    )
    return _merge_loop([(r["word"], r["n"]) for r in top], n_merges)


# -- encoding ----------------------------------------------------------------


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode ONE word with trained merge ranks: repeatedly merge the
    lowest-rank adjacent pair (the standard BPE apply loop)."""
    sym = list(word) + [EOW]
    while len(sym) > 1:
        best_i, best_r = -1, None
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def encode_vocab(
    word_dim: DataFrame, merges: list[tuple[str, str]]
) -> DataFrame:
    """(word, tokens array<string>, n_bpe_tokens) over a DISTINCT-word
    dim. The Arrow pandas UDF runs here — over vocabulary rows only."""
    import pandas as pd
    from pyspark.sql import types as T

    ranks = {p: i for i, p in enumerate(merges)}

    def _enc(s):
        return s.map(lambda w: encode_word(w, ranks))

    _enc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    udf = F.pandas_udf(_enc, T.ArrayType(T.StringType()))
    return word_dim.select(
        "word",
        udf(F.col("word")).alias("tokens"),
    ).withColumn("n_bpe_tokens", F.size("tokens"))


def tokenize_documents(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document BPE token ids/strings: (id, tokens, n_tokens).

    Corpus side is pure Column work: explode words WITH POSITION, one
    broadcast join against the encoded word dim, ordered re-assembly.
    The pandas UDF touches only the distinct-word dim (built from
    this corpus — at production scale pass a pre-encoded vocabulary
    and skip straight to the join)."""
    dim = encode_vocab(
        df.select(
            F.explode(words(F.lower(F.col(text_col)))).alias("word")
        )
        .where(F.col("word") != "")
        .distinct(),
        merges,
    )
    ex = df.select(
        F.col(id_col),
        F.posexplode(words(F.lower(F.col(text_col)))).alias("pos", "word"),
    ).where(F.col("word") != "")
    joined = ex.join(F.broadcast(dim), "word")
    return (
        joined.groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", "tokens"))
                    ),
                    lambda s: s["tokens"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )


# -- DuckDB twin ---------------------------------------------------------------


def bpe_tokenize_sql(
    table: str,
    n_merges: int,
    max_words: int = 100_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :func:`train_bpe` + :func:`tokenize_documents` —
    the oracle RE-DERIVES the training, hash-for-hash (the classifier-GD
    / kmeans precedent): the greedy merge loop unrolled into
    per-iteration CTE triples (``p_i`` weighted overlapping pair
    counts, ``m_i`` argmax with the Python tie-break ``cnt DESC, a, b``,
    ``v_i`` the merged vocab state), then the corpus word dim encoded by
    applying the merges in RANK order — one exhaustive left-to-right
    fold per merge, provably equal to :func:`encode_word`'s
    rank-priority loop because a merge's output symbol can only occur
    in LATER-ranked pairs (during training the pair ``(x, a||b)`` can
    only be counted after ``(a, b)`` merged). The per-pair fold is
    itself a fixpoint in ONE pass: the merged symbol ``a||b`` can never
    reform the pair ``(a, b)`` with a neighbour (``a||b = a`` or
    ``a||b = b`` would need the other side empty).

    Vocab states ride as space-delimited symbol strings with a leading
    and trailing space — symbols come from ``\\S+`` words plus ``</w>``,
    so a space can never occur INSIDE a symbol. The fold accumulates
    ``' sym1 sym2 '`` and merges when the acc's last symbol is ``a``
    and the incoming symbol is ``b`` — exactly the Python apply loop's
    left-to-right ``i += 2`` scan (verified on ``aaaaa`` → ``aa aa a``).

    Every CTE in the chain is ``AS MATERIALIZED`` (CLAUDE.md: DuckDB
    inlines plain CTEs, and an unrolled loop re-expands the whole
    upstream chain per reference). Requires the corpus to support
    ``n_merges`` merges (any natural corpus does; the loop has no
    early-break unlike the Python trainer)."""
    toks = WORDS_SQL.format(c=f"lower({text_col})")

    def fold(src_s: str, a: str, b: str) -> str:
        # one exhaustive left-to-right (a,b)->ab pass over a spaced
        # symbol string (acc seeded with ' ' via list_prepend)
        return (
            f"list_reduce(list_prepend(' ', string_split(trim({src_s}), ' ')), "
            f"(acc, x) -> CASE WHEN x = {b} AND ends_with(acc, ' ' || {a} || ' ') "
            f"THEN substr(acc, 1, length(acc) - length({a}) - 1)"
            f" || {a} || {b} || ' ' "
            f"ELSE acc || x || ' ' END)"
        )

    init_s = (
        "' ' || array_to_string(list_append("
        "list_transform(generate_series(1, length(word)),"
        " i -> substr(word, i, 1)),"
        f" '{EOW}'), ' ') || ' '"
    )
    ctes = [
        f"""bpe_words AS MATERIALIZED (
  SELECT w AS word, CAST(count(*) AS BIGINT) AS n
  FROM (SELECT unnest({toks}) AS w FROM {table}) q
  WHERE w <> '' GROUP BY w
)""",
        # the deterministic max_words cap (count desc, word asc) —
        # mirrors train_bpe's driver-literal discipline
        f"""v0 AS MATERIALIZED (
  SELECT word, n, {init_s} AS s
  FROM (SELECT word, n FROM bpe_words ORDER BY n DESC, word
        LIMIT {max_words}) q
)""",
    ]
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""p{i} AS MATERIALIZED (
  SELECT l[j] AS a, l[j + 1] AS b, CAST(sum(n) AS BIGINT) AS cnt
  FROM (SELECT n, string_split(trim(s), ' ') AS l FROM v{i - 1}) q,
       unnest(generate_series(1, len(l) - 1)) AS t(j)
  GROUP BY 1, 2
)"""
        )
        ctes.append(
            f"m{i} AS MATERIALIZED (SELECT a, b FROM p{i}"
            " ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        ctes.append(
            f"""v{i} AS MATERIALIZED (
  SELECT word, n, {fold('v.s', 'm.a', 'm.b')} AS s
  FROM v{i - 1} v, m{i} m
)"""
        )
    # encode the corpus DISTINCT-word dim: merges applied in rank order
    ctes.append(
        f"enc0 AS MATERIALIZED (SELECT word, {init_s} AS s FROM bpe_words)"
    )
    for i in range(1, n_merges + 1):
        ctes.append(
            f"""enc{i} AS MATERIALIZED (
  SELECT word, {fold('e.s', 'm.a', 'm.b')} AS s
  FROM enc{i - 1} e, m{i} m
)"""
        )
    ctes.append(
        f"""bpe_dim AS MATERIALIZED (
  SELECT word, string_split(trim(s), ' ') AS toks FROM enc{n_merges}
)"""
    )
    ctes.append(
        f"""bpe_ex AS MATERIALIZED (
  SELECT id, j AS pos, ws[j] AS word
  FROM (SELECT {id_col} AS id, {toks} AS ws FROM {table}) q,
       unnest(generate_series(1, len(ws))) AS t(j)
)"""
    )
    ctes.append(
        """bpe_docs AS (
  SELECT e.id, flatten(list(d.toks ORDER BY e.pos)) AS toks
  FROM bpe_ex e JOIN bpe_dim d USING (word)
  GROUP BY e.id
)"""
    )
    merge_rows = "\nUNION ALL\n".join(
        f"SELECT 'merge' AS variant, CAST({i - 1} AS BIGINT) AS id,"
        f" CAST(NULL AS BIGINT) AS n_tokens, a || ' ' || b AS tokens"
        f" FROM m{i}"
        for i in range(1, n_merges + 1)
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT 'doc' AS variant, id, CAST(len(toks) AS BIGINT) AS n_tokens,
       array_to_string(toks, ' ') AS tokens
FROM bpe_docs
UNION ALL
{merge_rows}
"""
