"""DAG over models / scripts — networkx DiGraph, driver-side.

Mirrors the reference's NodeGraph (reference: projects/adapter/src/fal/
dbt/node_graph.py:100-141 build, :147-249 traversal): model nodes plus
BEFORE/AFTER script nodes named ``script.<model>.<BEFORE|AFTER>.<file>``,
edges from ``depends_on``. Spark is not involved — this is pure
orchestration structure.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

import networkx as nx

from dbt_fal_spark.project.manifest import Manifest


@dataclass
class NodeKind:
    DBT_MODEL = "dbt_model"
    FAL_MODEL = "fal_model"  # python model
    FAL_SCRIPT = "fal_script"
    SEED = "seed"


def script_node_id(model_name: str, when: str, script: str) -> str:
    return f"script.{model_name}.{when}.{script}"


@dataclass
class NodeGraph:
    graph: nx.DiGraph = field(default_factory=nx.DiGraph)

    @classmethod
    def from_manifest(cls, manifest: Manifest) -> "NodeGraph":
        g = nx.DiGraph()
        for uid, model in manifest.models.items():
            if model.materialization == "seed":
                kind = NodeKind.SEED
            elif model.python_model is not None:
                kind = NodeKind.FAL_MODEL
            else:
                kind = NodeKind.DBT_MODEL
            g.add_node(uid, kind=kind, model=model)
            for before in (True, False):
                when = "BEFORE" if before else "AFTER"
                for script in model.get_scripts(before=before):
                    sid = script_node_id(model.name, when, script)
                    g.add_node(sid, kind=NodeKind.FAL_SCRIPT, model=model, script=script)
                    if before:
                        g.add_edge(sid, uid)
                    else:
                        g.add_edge(uid, sid)
        for uid, model in manifest.models.items():
            for dep in model.depends_on:
                if dep in g:
                    g.add_edge(dep, uid)
                # sources are not graph nodes; they're always available
        return cls(graph=g)

    # --- traversal (reference: node_graph.py:147-249) ---

    def sort_nodes(self) -> list[str]:
        try:
            return list(nx.topological_sort(self.graph))
        except nx.NetworkXUnfeasible:
            # circular refs are a user error — report the cycle in dbt's
            # words instead of leaking a networkx exception type
            cyc = nx.find_cycle(self.graph)
            path = " --> ".join(edge[0] for edge in cyc) + f" --> {cyc[0][0]}"
            raise ValueError(
                f"Found a cycle in the model dependency graph: {path}"
            ) from None

    def get_successors(self, node: str, levels: int | None = None) -> list[str]:
        return self._neighborhood(node, levels, forward=True)

    def get_descendants(self, node: str) -> list[str]:
        return list(nx.descendants(self.graph, node))

    def get_predecessors(self, node: str, levels: int | None = None) -> list[str]:
        return self._neighborhood(node, levels, forward=False)

    def get_ancestors(self, node: str) -> list[str]:
        return list(nx.ancestors(self.graph, node))

    def _neighborhood(self, node: str, levels: int | None, *, forward: bool) -> list[str]:
        if levels is None:
            return self.get_descendants(node) if forward else self.get_ancestors(node)
        seen: set[str] = set()
        frontier = {node}
        for _ in range(levels):
            nxt: set[str] = set()
            for n in frontier:
                nxt.update(self.graph.successors(n) if forward else self.graph.predecessors(n))
            nxt -= seen | {node}
            seen.update(nxt)
            frontier = nxt
        return sorted(seen)

    def node_kind(self, node: str) -> str:
        return self.graph.nodes[node].get("kind", "")

    def node_attr(self, node: str, key: str) -> Any:
        return self.graph.nodes[node].get(key)
