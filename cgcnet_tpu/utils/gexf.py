"""GEXF export for qualitative cluster inspection in Gephi.

Re-implements the reference's visualization dump (``output_to_gexf``,
common/utils.py:48-79): node coordinates plus the hierarchical DiffPool
cluster assignment at each level, with deeper levels composed through the
level-1 mapping so every node carries its level-l cluster id.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def _compose_assignments(assign_list: list[np.ndarray]) -> dict[str, np.ndarray]:
    """argmax each [N_l, C_l] soft assignment and compose through levels:
    level-1 ids are per node; level-2 ids map through level 1, etc.
    (reference common/utils.py:55-69)."""
    hard = [np.argmax(a, axis=1) for a in assign_list]
    out = {"assign_1": hard[0]}
    current = hard[0]
    for lvl, deeper in enumerate(hard[1:], start=2):
        current = deeper[current]
        out[f"assign_{lvl}"] = current
    return out


def graph_to_gexf(
    coords: np.ndarray,
    nbr: np.ndarray,
    nbr_mask: np.ndarray,
    path: str | Path,
    node_attrs: dict[str, np.ndarray] | None = None,
) -> None:
    """Write an ELL graph with coordinates (+per-node attrs) to GEXF."""
    import networkx as nx

    n = coords.shape[0]
    g = nx.Graph()
    for i in range(n):
        attrs = {"x": float(coords[i, 0]), "y": float(coords[i, 1])}
        if node_attrs:
            for k, v in node_attrs.items():
                attrs[k] = int(v[i])
        g.add_node(i, **attrs)
    for i in range(n):
        for k in range(nbr.shape[1]):
            if nbr_mask[i, k] > 0 and nbr[i, k] != i:
                g.add_edge(i, int(nbr[i, k]))
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    nx.write_gexf(g, str(path))


def assignments_to_gexf(
    coords: np.ndarray,
    nbr: np.ndarray,
    nbr_mask: np.ndarray,
    assign_list: list[np.ndarray],
    path: str | Path,
    n_nodes: int | None = None,
) -> None:
    """Graph + composed hierarchical cluster labels -> GEXF (the eval-time
    dump behind --visualization, reference train.py:64-76)."""
    n = n_nodes if n_nodes is not None else coords.shape[0]
    # only level 1 is per-node [N, C1]; deeper levels are [C_l, C_{l+1}]
    # cluster matrices whose rows are indexed by the previous level's cluster
    # ids — truncating those to n would drop valid cluster rows
    assigns = [np.asarray(assign_list[0])[:n]] + [
        np.asarray(a) for a in assign_list[1:]
    ]
    attrs = _compose_assignments(assigns)
    graph_to_gexf(
        coords[:n], nbr[:n], nbr_mask[:n], path, node_attrs=attrs
    )
