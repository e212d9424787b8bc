"""ES output routing metadata: ``@metadata.*`` columns, per-event
ingest-pipeline choice, and ILM alias vs dated-index selection.

Reference semantics:

- ``getPipeline`` — ``@metadata.pipeline`` wins over the configured
  pipeline selector; no selector → no pipeline
  (``/root/reference/libbeat/outputs/elasticsearch/client.go:445-459``).
- ``getEventCustomIndex`` — ``@metadata.alias`` verbatim beats
  ``@metadata.index`` + ``-YYYY.MM.dd`` (event timestamp, UTC) beats
  the configured selector
  (``/root/reference/libbeat/idxmgmt/std.go:304-331``).
- ILM — mode *enabled* forces the rollover alias as the index name;
  mode *auto* uses the alias only when ILM probing succeeded; mode
  *disabled* uses the configured index
  (``/root/reference/libbeat/idxmgmt/std.go:160-171,201-208``).

SURVEY §1.4 maps the reference's event ``Meta`` map to narrow routing
columns computed during planning and EXCLUDED from the sink payload.
Convention: metadata lives in flat columns named ``@metadata.<key>``
(backtick-quoted internally); :func:`strip_metadata` removes every
such column before the payload is written, and
:func:`assert_no_metadata` lets plan tests pin the invariant.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

META_PREFIX = "@metadata."


def meta_col(key: str) -> str:
    """Column name for a routing-metadata key (``@metadata.pipeline``)."""
    return META_PREFIX + key


def _get_meta(df: DataFrame, key: str) -> Column:
    name = meta_col(key)
    return F.col("`" + name + "`") if name in df.columns else F.lit(None).cast(
        "string"
    )


def strip_metadata(df: DataFrame) -> DataFrame:
    """Drop every ``@metadata.*`` column — the payload an output writes
    must never contain routing metadata (the reference serializes
    ``event.Fields`` only; ``Meta`` feeds the bulk action header)."""
    meta = [c for c in df.columns if c.startswith(META_PREFIX)]
    return df.drop(*[F.col("`" + c + "`") for c in meta]) if meta else df


def assert_no_metadata(df: DataFrame) -> DataFrame:
    """Raise if a ``@metadata.*`` column survived into a payload plan."""
    leaked = [c for c in df.columns if c.startswith(META_PREFIX)]
    if leaked:
        raise ValueError(f"routing metadata leaked into payload: {leaked}")
    return df


def select_pipeline(df: DataFrame, configured: Column | None = None) -> Column:
    """Per-event ingest pipeline (client.go:445-459):
    ``@metadata.pipeline`` if present, else the configured selector
    result, else NULL (no pipeline parameter on the bulk action)."""
    meta = _get_meta(df, "pipeline")
    if configured is None:
        return meta
    return F.coalesce(meta, configured)


class IlmMode(Enum):
    DISABLED = "disabled"
    AUTO = "auto"
    ENABLED = "enabled"


def select_index(
    df: DataFrame,
    configured: Column,
    ts_col: str = "ts",
    ilm_mode: IlmMode = IlmMode.DISABLED,
    ilm_alias: str | None = None,
    ilm_active: bool = False,
) -> Column:
    """Per-event index (std.go:295-331): the custom-metadata ladder
    (alias verbatim, else ``index-YYYY.MM.dd`` dated from the event
    timestamp) wins; otherwise ILM decides between the rollover alias
    (mode enabled, or mode auto with probing succeeded — the
    ``st.withILM`` runtime flag) and the configured selector column."""
    if ilm_mode is IlmMode.ENABLED or (
        ilm_mode is IlmMode.AUTO and ilm_active
    ):
        if not ilm_alias:
            raise ValueError("ILM selection requires ilm_alias")
        base: Column = F.lit(ilm_alias)
    else:
        base = configured
    dated = F.concat(
        _get_meta(df, "index"),
        F.lit("-"),
        F.date_format(F.col(ts_col), "yyyy.MM.dd"),
    )
    return F.coalesce(_get_meta(df, "alias"), dated, base)
