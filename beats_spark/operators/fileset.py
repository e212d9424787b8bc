"""Fileset pipeline loading — the reference's module/fileset template
machinery for ES ingest programs.

Filebeat renders each fileset's ``ingest/*.json`` through a Go
text/template with delimiters ``{<`` / ``>}`` before uploading it
(``/root/reference/filebeat/fileset/fileset.go:268-291``
``applyTemplate``). Twelve of the 42 module pipelines carry such
directives; the corpus uses exactly two:

- ``{< if .var >}...{< end >}`` — include the block only when the
  fileset var is truthy (e.g. ``convert_timezone`` guarding a
  ``"timezone": "{{ event.timezone }}"`` date option);
- ``{< IngestPipeline "short-id" >}`` — cross-reference a sibling
  pipeline file, rendered to the full pipeline ID
  (``fileset.go:301-310``; ``formatPipelineID`` in
  ``fileset.go:432-434`` → ``filebeat-<version>-<module>-<fileset>-<short>``).

Here the short id doubles as the key into
:attr:`IngestPipeline.sub_pipelines`, and :func:`load_fileset_pipeline`
resolves each referenced id to the sibling ``<short-id>.json`` next to
the parent file — the same directory layout the modules use.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Mapping

from .ingest import IngestError, IngestPipeline

_IF_BLOCK = re.compile(
    r"\{<\s*if \.(\w+)\s*>\}(.*?)\{<\s*end\s*>\}", re.S
)
_PIPELINE_REF = re.compile(r'\{<\s*IngestPipeline "([-\w]+)"\s*>\}')


def render_fileset_template(
    text: str, variables: Mapping[str, Any] | None = None
) -> str:
    """Render the ``{< ... >}`` template subset the module corpus uses
    (fileset.go:268-291). Unknown directives raise — a silently
    half-rendered pipeline must not load."""
    variables = variables or {}

    def sub_if(m: re.Match) -> str:
        return m.group(2) if variables.get(m.group(1)) else ""

    out = _IF_BLOCK.sub(sub_if, text)
    out = _PIPELINE_REF.sub(lambda m: m.group(1), out)
    leftover = re.search(r"\{<[^>]*>\}", out)
    if leftover:
        raise IngestError(
            f"unsupported fileset template directive: {leftover.group()!r}"
        )
    return out


def load_fileset_pipeline(
    path: str,
    variables: Mapping[str, Any] | None = None,
    **kwargs: Any,
) -> IngestPipeline:
    """Load a module's ingest pipeline FILE: render its template,
    parse the JSON, and recursively load any sibling sub-pipelines its
    ``pipeline`` steps reference (``{< IngestPipeline "x" >}`` →
    ``<dir>/x.json``). ``kwargs`` (ignore_processors, ua_dim, geo_dim)
    pass through to every loaded pipeline."""
    with open(path) as fh:
        rendered = render_fileset_template(fh.read(), variables)
    try:
        doc = json.loads(rendered)
    except json.JSONDecodeError as e:
        raise IngestError(f"invalid pipeline JSON in {path}: {e}") from e
    if "processors" not in doc:
        raise IngestError(f"{path}: no 'processors'")

    subs: dict[str, IngestPipeline] = {}
    base = os.path.dirname(path)
    for step in doc["processors"]:
        if not (isinstance(step, Mapping) and len(step) == 1):
            continue
        (name, conf), = step.items()
        if name != "pipeline":
            continue
        short = conf.get("name")
        if not isinstance(short, str):
            raise IngestError(f"{path}: pipeline step without a name")
        if short in subs:
            continue
        sub_path = os.path.join(base, short + ".json")
        if not os.path.exists(sub_path):
            raise IngestError(
                f"{path}: referenced sub-pipeline file missing: {sub_path}"
            )
        subs[short] = load_fileset_pipeline(sub_path, variables, **kwargs)

    return IngestPipeline(
        steps=list(doc["processors"]),
        on_failure=tuple(doc.get("on_failure", [])),
        sub_pipelines=subs or None,
        **kwargs,
    )
