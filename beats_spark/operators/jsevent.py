"""``process(event)`` migration adapter for reference JS processors.

The reference's ``script`` processor embeds ECMAScript 5.1 (goja) and
calls ``process(event)`` per event with a mutation API — Get/Put/
Delete/Rename/Tag/AppendTo/Cancel over dotted field names
(libbeat/processors/script/processor.go:34-52; the event API surface
and its semantics are pinned by
libbeat/processors/script/javascript/beatevent_v0_test.go:46-140 and
the worked programs in libbeat/docs/processors-using.asciidoc:1420-1485).

The Spark-first preference is to REWRITE the script body as Column
expressions (see :class:`beats_spark.operators.actions.Script` — JVM
side, whole-stage codegen). This module is the literal port for the
migrating user's FIRST step: paste the per-event logic as a Python
function over :class:`Event` (same method names, same semantics), and
:func:`process_event_script` runs it Arrow-batched via ``mapInPandas``
— a sanctioned pandas case (an arbitrary user program is not
expressible as Column work), batch-shaped rather than row-shaped at
the Spark boundary even though the user hook is per-event, exactly
like goja is per-event inside the Go pipeline.

Semantics mirrored from the reference:

- dotted names address FLAT columns (this library's field model —
  CLAUDE.md): ``Get("event.code")`` reads column ``event.code``.
- ``Put`` returns the previous value and may create new fields — new
  fields must appear in ``added`` (Spark output schemas are static;
  the goja runtime's dynamic maps have no Spark analog).
- ``Rename`` returns False when the target already holds a value
  ("fields cannot be overwritten") or the source is absent, else
  Get+Delete+Put (beatevent_v0.go:159-185).
- ``Tag`` appends to the ``tags`` array, deduplicated
  (libbeat/common/event_metadata.go AddTags semantics).
- ``Cancel`` drops the event from the stream (processor returns nil).
"""

from __future__ import annotations

from collections.abc import Callable, Mapping
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class Event:
    """Per-event mutation shim with the reference JS event API. Backed
    by a plain dict of (flat, possibly dotted) column name → value."""

    __slots__ = ("fields", "_cancelled")

    def __init__(self, fields: dict[str, Any]) -> None:
        self.fields = fields
        self._cancelled = False

    # -- the beatevent_v0 surface -----------------------------------------

    def Get(self, key: str | None = None):
        if key is None:
            return dict(self.fields)
        return self.fields.get(key)

    def Put(self, key: str, value):
        prev = self.fields.get(key)
        self.fields[key] = value
        return prev

    def Delete(self, key: str) -> bool:
        if key in self.fields and self.fields[key] is not None:
            self.fields[key] = None
            return True
        return False

    def Rename(self, src: str, dst: str) -> bool:
        # reference semantics: fail if the target already holds a
        # value or the source is absent (beatevent_v0_test "Rename")
        if self.fields.get(dst) is not None:
            return False
        v = self.fields.get(src)
        if v is None:
            return False
        self.fields[dst] = v
        self.fields[src] = None
        return True

    def Tag(self, tag: str) -> None:
        self.AppendTo("tags", tag)

    def AppendTo(self, key: str, value: str) -> None:
        cur = self.fields.get(key)
        if cur is None:
            self.fields[key] = [value]
        elif value not in cur:
            self.fields[key] = list(cur) + [value]

    def Cancel(self) -> None:
        self._cancelled = True


def process_event_script(
    process: Callable[[Event], None],
    added: Mapping[str, str] | None = None,
    register: Callable[[dict], None] | None = None,
    params: dict | None = None,
) -> Callable[[DataFrame], DataFrame]:
    """Adapt a per-event ``process(event)`` function into a
    DataFrame→DataFrame callable for
    :class:`beats_spark.operators.actions.Script`.

    ``added`` declares fields the script Puts that aren't input
    columns (name → Spark type string) — the one migration delta vs
    goja's dynamic maps. ``register``/``params`` mirror the reference's
    ``register(scriptParams)`` hook
    (libbeat/docs/processors-using.asciidoc:1447-1465): called once
    per executor batch-iterator, before any event.

    Execution shape: ``mapInPandas`` — Arrow batches in/out, the user
    hook applied per row inside the batch. This is the slow path by
    design (it exists so a goja program ports 1:1 on day one); rewrite
    hot scripts as Column work per the :class:`Script` docstring.
    """

    def fn(df: DataFrame) -> DataFrame:
        in_cols = list(df.columns)
        new_cols = [c for c in (added or {}) if c not in in_cols]
        all_cols = in_cols + new_cols
        # route through dot-free temp names: mapInPandas resolves its
        # own column list with bare df[col], which reads a dotted FLAT
        # name as a struct path (the CLAUDE.md flat-column gotcha) —
        # the Event still sees the ORIGINAL names
        safe = {c: f"_js_c{i}" for i, c in enumerate(all_cols)}
        inv = {v: k for k, v in safe.items()}
        work = df.select(
            *[F.col(f"`{c}`").alias(safe[c]) for c in in_cols]
        )
        out_schema = ", ".join(
            [
                f"{safe[f.name]} {f.dataType.simpleString()}"
                for f in df.schema.fields
            ]
            + [f"{safe[c]} {added[c]}" for c in new_cols]
        )

        def run(batches):
            import pandas as pd

            if register is not None:
                register(params or {})
            for pdf in batches:
                out_rows = []
                for rec in pdf.to_dict("records"):
                    fields = {inv[k]: v for k, v in rec.items()}
                    for c in new_cols:
                        fields.setdefault(c, None)
                    evt = Event(fields)
                    process(evt)
                    if not evt._cancelled:
                        out_rows.append(
                            {safe[c]: evt.fields.get(c) for c in all_cols}
                        )
                yield pd.DataFrame(
                    out_rows, columns=[safe[c] for c in all_cols]
                )

        res = work.mapInPandas(run, out_schema)
        return res.select(
            *[F.col(safe[c]).alias(c) for c in all_cols]
        )

    return fn
