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

from ..functions.textstats import words

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
