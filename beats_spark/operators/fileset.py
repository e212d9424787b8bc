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
_VAR_REF = re.compile(r"\{<\s*\.(\w+)\s*>\}")


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

    def sub_var(m: re.Match) -> str:
        # bare {< .var >} value substitution (the x-pack cisco/asa
        # pipeline.yml interpolates .log_level into a drop condition)
        name = m.group(1)
        if name not in variables:
            raise IngestError(f"fileset template var unset: {name!r}")
        return str(variables[name])

    out = _VAR_REF.sub(sub_var, out)
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
    ``<dir>/x.json``, or ``.yml``). ``kwargs`` (ignore_processors,
    ua_dim, geo_dim) pass through to every loaded pipeline.

    YAML pipelines (the x-pack modules ship at least one —
    ``x-pack/filebeat/module/cisco/asa/ingest/pipeline.yml``; the
    reference loads both via ``fileset.go:284-291`` which feeds the
    rendered text to the ES _ingest API) parse through
    ``yaml.safe_load``; everything downstream is format-agnostic."""
    with open(path) as fh:
        rendered = render_fileset_template(fh.read(), variables)
    if path.endswith((".yml", ".yaml")):
        import yaml

        try:
            doc = yaml.safe_load(rendered)
        except yaml.YAMLError as e:
            raise IngestError(
                f"invalid pipeline YAML in {path}: {e}"
            ) from e
    else:
        try:
            doc = json.loads(rendered)
        except json.JSONDecodeError as e:
            raise IngestError(
                f"invalid pipeline JSON in {path}: {e}"
            ) from e
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
        sub_path = None
        for ext in (".json", ".yml", ".yaml"):
            cand = os.path.join(base, short + ext)
            if os.path.exists(cand):
                sub_path = cand
                break
        if sub_path is None:
            raise IngestError(
                f"{path}: referenced sub-pipeline file missing: "
                f"{os.path.join(base, short)}.json/.yml"
            )
        subs[short] = load_fileset_pipeline(sub_path, variables, **kwargs)

    return IngestPipeline(
        steps=list(doc["processors"]),
        on_failure=tuple(doc.get("on_failure", [])),
        sub_pipelines=subs or None,
        **kwargs,
    )
