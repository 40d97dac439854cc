"""dbt-style node selection language.

Mirrors the reference's selector semantics (reference: projects/adapter/
src/fal/dbt/cli/selectors.py:13-65 plan build, :156-226 SelectorPlan,
:228-242 tag/complex, :294-303 regex ops):

- ``model``           the node itself
- ``+model``          ancestors + node          (``n+model`` = n levels)
- ``model+``          node + descendants        (``model+n`` = n levels)
- ``@model``          node + descendants + ancestors-of-descendants
- ``tag:x``           nodes carrying tag x
- ``script.py``       scripts by file name
- space-separated selectors = union; ``--exclude`` subtracts.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from dbt_fal_spark.plans.node_graph import NodeGraph

OP_PLUS_RE = r"(?P<pre_n>\d*)(?P<pre_plus>\+?)(?P<body>[^+]+?)(?P<post_plus>\+?)(?P<post_n>\d*)$"


@dataclass
class SelectorPlan:
    body: str
    ancestors: bool = False
    ancestor_levels: int | None = None
    descendants: bool = False
    descendant_levels: int | None = None
    at_operator: bool = False
    is_tag: bool = False

    @classmethod
    def parse(cls, raw: str) -> "SelectorPlan":
        if raw.startswith("tag:"):
            return cls(body=raw[4:], is_tag=True)
        at = raw.startswith("@")
        if at:
            return cls(body=raw[1:], at_operator=True, descendants=True)
        m = re.match(OP_PLUS_RE, raw)
        if not m:
            return cls(body=raw)
        return cls(
            body=m.group("body"),
            ancestors=bool(m.group("pre_plus")),
            ancestor_levels=int(m.group("pre_n")) if m.group("pre_n") else None,
            descendants=bool(m.group("post_plus")),
            descendant_levels=int(m.group("post_n")) if m.group("post_n") else None,
        )


def _match_nodes(graph: NodeGraph, plan: SelectorPlan) -> set[str]:
    out: set[str] = set()
    for node in graph.graph.nodes:
        attrs = graph.graph.nodes[node]
        model = attrs.get("model")
        if plan.is_tag:
            if model is not None and plan.body in (model.tags or []):
                out.add(node)
            continue
        if attrs.get("kind") == "fal_script":
            # select scripts by file name (reference: 'script.py' selectors)
            if attrs.get("script") == plan.body:
                out.add(node)
            continue
        short = node.split(".")[-1]
        if short == plan.body:
            out.add(node)
    return out


def select_nodes(
    graph: NodeGraph,
    select: list[str] | str | None,
    exclude: list[str] | str | None = None,
) -> set[str]:
    """Evaluate selectors → node id set. None selects everything."""
    if select is None or select == [] or select == "":
        selected = set(graph.graph.nodes)
    else:
        if isinstance(select, str):
            select = select.split()
        selected = set()
        for raw in select:
            plan = SelectorPlan.parse(raw)
            base = _match_nodes(graph, plan)
            expanded = set(base)
            for node in base:
                if plan.ancestors:
                    expanded.update(graph.get_predecessors(node, plan.ancestor_levels))
                if plan.descendants:
                    expanded.update(graph.get_successors(node, plan.descendant_levels))
                if plan.at_operator:
                    for d in graph.get_descendants(node):
                        expanded.add(d)
                        expanded.update(graph.get_ancestors(d))
            selected |= expanded
    if exclude:
        if isinstance(exclude, str):
            exclude = exclude.split()
        for raw in exclude:
            plan = SelectorPlan.parse(raw)
            base = _match_nodes(graph, plan)
            removed = set(base)
            for node in base:
                if plan.ancestors:
                    removed.update(graph.get_predecessors(node, plan.ancestor_levels))
                if plan.descendants:
                    removed.update(graph.get_successors(node, plan.descendant_levels))
            selected -= removed
    return selected
