"""Jinja rendering for SQL models — the compile step.

The reference delegates Jinja to dbt's compiler (reference: projects/
adapter/src/fal/dbt/integration/lib.py:177-212 compile_sql via
SqlBlockParser); here a small Jinja2 environment supplies the contract
the test projects actually use (SURVEY §2.G "Jinja templating"):
``ref``, ``source``, ``config``, ``var``, ``env_var``, ``this``,
``is_incremental`` and plain loops/conditionals.

Render-time side channel: ``config(...)`` calls record into the model's
config dict, and ``ref``/``source`` calls record dependencies — the same
two-pass trick dbt uses (parse for deps, render for SQL).
"""

from __future__ import annotations

import os
import re
from typing import Any

import jinja2


class RenderContext:
    """Collects config() and dependency calls made during a render."""

    def __init__(self) -> None:
        self.config: dict[str, Any] = {}
        self.refs: list[str] = []
        self.sources: list[tuple[str, str]] = []


def render_model_sql(
    raw_sql: str,
    *,
    resolve_ref,
    resolve_source,
    this_name: str | None = None,
    vars: dict[str, Any] | None = None,
    is_incremental: bool = False,
    macros: list[str] | None = None,
) -> tuple[str, RenderContext]:
    """Render a model's Jinja-SQL to executable Spark SQL.

    ``resolve_ref(name) -> str`` and ``resolve_source(src, tbl) -> str``
    return the physical relation identifier to splice into the SQL.
    ``macros`` are raw ``{% macro %}`` sources (from `macro-paths`);
    they are PREPENDED to the template rather than loaded as a module so
    macro bodies share the render context — a macro calling ``ref()`` or
    ``var()`` resolves (and records dependencies) at its call site,
    exactly like dbt. Definition blocks emit no output.
    """
    ctx = RenderContext()
    env = jinja2.Environment(undefined=jinja2.StrictUndefined)
    vars = vars or {}
    if macros:
        raw_sql = "\n".join([*macros, raw_sql])

    def _config(**kwargs: Any) -> str:
        ctx.config.update(kwargs)
        return ""

    def _ref(*parts: str) -> str:
        name = parts[-1]
        ctx.refs.append(name)
        return resolve_ref(name)

    def _source(src: str, tbl: str) -> str:
        ctx.sources.append((src, tbl))
        return resolve_source(src, tbl)

    def _var(name: str, default: Any = None) -> Any:
        return vars.get(name, default)

    def _env_var(name: str, default: str | None = None) -> str:
        val = os.environ.get(name, default)
        if val is None:
            raise jinja2.UndefinedError(f"env_var {name!r} is not set")
        return val

    template = env.from_string(raw_sql)
    rendered = template.render(
        config=_config,
        ref=_ref,
        source=_source,
        var=_var,
        env_var=_env_var,
        this=this_name or "",
        is_incremental=lambda: is_incremental,
    )
    # collapse the blank lines config() directives leave behind
    rendered = re.sub(r"\n\s*\n+", "\n", rendered).strip()
    return rendered, ctx


def extract_dependencies(
    raw_sql: str,
    macros: list[str] | None = None,
    vars: dict[str, Any] | None = None,
) -> tuple[list[str], list[tuple[str, str]], dict[str, Any]]:
    """Parse-phase dependency extraction: render with no-op resolvers and
    collect the ref()/source()/config() calls. Rendered under both
    is_incremental branches so deps inside ``{% if is_incremental() %}``
    blocks are not missed. ``vars`` must be the PROJECT-MERGED vars (dbt
    parses with real var values): a ref inside
    ``{% if var('flag') %}...{% endif %}`` where the project sets the
    flag true was invisible to a var-less parse — the DAG then missed
    the edge and could schedule the dependency after its consumer
    (r10 adversarial-review finding)."""
    refs: list[str] = []
    sources: list[tuple[str, str]] = []
    config: dict[str, Any] = {}
    for inc in (False, True):
        _, ctx = render_model_sql(
            raw_sql,
            resolve_ref=lambda name: f"__ref__{name}",
            resolve_source=lambda s, t: f"__source__{s}__{t}",
            this_name="__this__",
            vars=vars,
            is_incremental=inc,
            macros=macros,
        )
        for r in ctx.refs:
            if r not in refs:
                refs.append(r)
        for s in ctx.sources:
            if s not in sources:
                sources.append(s)
        config.update(ctx.config)
    return refs, sources, config
