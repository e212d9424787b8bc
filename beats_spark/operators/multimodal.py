"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns next to a
typed metadata struct (modality, n_bytes, content hash). The Spark
side — schema, partition-preserving ``mapInPandas``, Arrow batch shape
— is real and tested; the actual codec step is stubbed (decode
libraries aren't in this container) behind ``DECODERS``: the default
"fake" decoder emits deterministic features (byte length + header
bytes) so the whole path is oracle-checkable, and a real decoder drops
in per modality without touching the plumbing.

Scale notes: payload bytes never shuffle — ``mapInPandas`` runs
scan-aligned; only the (narrow) feature columns continue downstream.
``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory
(large payloads → set it low).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("header_hex", T.StringType()),
    ]
)


def fake_decode(payload: bytes) -> dict[str, Any]:
    """Deterministic stand-in for a real codec: byte length + first
    4 bytes as hex. Replace with e.g. PIL/torchaudio per modality."""
    return {"n_bytes": len(payload), "header_hex": payload[:4].hex()}


def _unavailable(payload: bytes) -> dict[str, Any]:
    raise NotImplementedError(
        "real image/audio/video codecs are not available in this "
        "environment — register one in DECODERS"
    )


DECODERS: dict[str, Callable[[bytes], dict[str, Any]]] = {
    "fake": fake_decode,
    "image": _unavailable,
    "audio": _unavailable,
    "video": _unavailable,
}


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload column (md5 digest bytes of
    the text) + modality tag — the deterministic stand-in for real
    media bytes, identically derivable in the oracle."""
    return df.withColumn("payload", F.unhex(F.md5(F.col(text_col)))).withColumn(
        "modality", F.lit("fake")
    )


def extract_features(
    df: DataFrame,
    decoder: str = "fake",
    id_col: str = "doc_id",
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` — Arrow-batched,
    partition-preserving, no shuffle. Input needs columns
    (id_col, payload, modality)."""
    decode = DECODERS[decoder]

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "modality": pdf["modality"],
                    "n_bytes": pd.Series(
                        [f["n_bytes"] for f in feats], dtype="int64"
                    ),
                    "header_hex": [f["header_hex"] for f in feats],
                }
            )
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)


def multimodal_features_sql(table: str, text_col: str = "text") -> str:
    """Oracle for the fake-decoder path: the payload is md5(text)
    bytes, so n_bytes = 16 and header_hex = first 8 hex chars."""
    return f"""
SELECT doc_id,
       'fake' AS modality,
       CAST(16 AS BIGINT) AS n_bytes,
       substr(md5({text_col}), 1, 8) AS header_hex
FROM {table}
"""
