"""Document chunking for training-data pipelines.

Splits documents into overlapping fixed-size token windows — the
standard pre-training / RAG ingestion step (one row per chunk, stable
(doc_id, chunk_idx) identity, configurable stride). Pure Column
expressions: tokenize once, generate window start offsets with
``sequence``, slice + rejoin per offset, posexplode. No Python, one
narrow transform — chunking is embarrassingly parallel and adds no
shuffle at any scale.

Semantics:
- windows of ``chunk_tokens`` whitespace tokens, stride
  ``chunk_tokens - overlap`` (overlap < chunk_tokens enforced);
- the final window may be shorter; a document shorter than one window
  yields exactly one chunk; empty/whitespace-only docs yield one
  empty chunk (kept: droppable downstream, and keeping it makes
  row-count accounting per doc exact).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.textstats import words


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per (doc, chunk): ``(id, chunk_idx, chunk_text,
    n_tokens)`` in stable chunk order."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap

    toks = df.select(
        F.col(id_col).alias("id"), words(F.col(text_col)).alias("toks")
    )
    # window start offsets 0, stride, ... up to the FIRST start whose
    # window reaches the document end — i.e. the smallest multiple of
    # stride ≥ max(n - chunk, 0). Generating starts past that point
    # would emit trailing windows fully contained in the previous one
    # (pure duplicate text the dedup operators would have to remove).
    tail = F.greatest(F.size("toks") - chunk_tokens, F.lit(0))
    last_start = ((tail + stride - 1).cast("long") / stride).cast("long") * stride
    starts = F.sequence(F.lit(0).cast("long"), last_start, F.lit(stride))
    chunks = toks.select(
        "id",
        F.posexplode(
            F.transform(
                starts,
                lambda s: F.concat_ws(
                    " ", F.slice("toks", s + 1, chunk_tokens)
                ),
            )
        ).alias("chunk_idx", "chunk_text"),
        F.size("toks").alias("_n"),
    )
    n_tokens = F.least(
        F.greatest(F.col("_n") - F.col("chunk_idx") * stride, F.lit(0)),
        F.lit(chunk_tokens),
    )
    return chunks.select(
        "id",
        F.col("chunk_idx").cast("int"),
        "chunk_text",
        n_tokens.cast("int").alias("n_tokens"),
    )


def chunk_documents_sql(
    table: str,
    chunk_tokens: int = 128,
    overlap: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror (lock-step with :func:`chunk_documents`)."""
    stride = chunk_tokens - overlap
    from ..functions.textstats import WORDS_SQL

    toks = WORDS_SQL.format(c=text_col)
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {toks} AS toks FROM {table}
),
c AS (
  SELECT id, toks,
         unnest(range(0,
                      ((greatest(len(toks) - {chunk_tokens}, 0)
                        + {stride} - 1) // {stride}) * {stride} + 1,
                      {stride})) AS start
  FROM t
)
SELECT id,
       CAST(start // {stride} AS INTEGER) AS chunk_idx,
       array_to_string(toks[start + 1 : start + {chunk_tokens}], ' ')
         AS chunk_text,
       CAST(least(greatest(len(toks) - start, 0), {chunk_tokens})
         AS INTEGER) AS n_tokens
FROM c
"""
