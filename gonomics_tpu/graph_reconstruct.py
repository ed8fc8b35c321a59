"""Ancestral reconstruction over genome graphs.

Counterpart of /root/reference/graphReconstruct/graphReconstruct.go
(BuildNodes, PathFinder, seqOfPath): build candidate ancestor nodes from
aligned graph columns and find the most likely path through a graph by
exhaustive depth-first probability search."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import dna
from .graph import GenomeGraph, Node


@dataclass
class GraphColumn:
    """graphColumn (graphReconstruct.go:14): species name -> nodes of
    that species falling into one alignment column."""
    align_id: int = 0
    align_nodes: dict[str, list[Node]] = field(default_factory=dict)


def build_nodes(root_name: str, column: GraphColumn, node_id: int) -> int:
    """BuildNodes (graphReconstruct.go:20): one ancestor node per unique
    sequence in the column (the reference iterates a Go set — insertion
    order here). Returns the next free node id."""
    node_info: dict[str, bool] = {}
    for nodes in column.align_nodes.values():
        for n in nodes:
            node_info[dna.to_string(n.seq)] = True
    for seq in node_info:
        new_node = Node(id=node_id, seq=dna.from_string(seq))
        column.align_nodes.setdefault(root_name, []).append(new_node)
        node_id += 1
    return node_id


def seq_of_path(g: GenomeGraph, path: list[int]) -> np.ndarray:
    """seqOfPath (graphReconstruct.go:47)."""
    parts = []
    for p in path:
        found = False
        for n in g.nodes:
            if n.id == p:
                found = True
                parts.append(np.asarray(n.seq, np.int8))
                break
        if not found:
            raise ValueError("path is invalid")
    return np.concatenate(parts) if parts else np.zeros(0, np.int8)


def path_finder(g: GenomeGraph) -> tuple[list[int], float]:
    """PathFinder (graphReconstruct.go:67): most likely path from node 0,
    exhaustive DFS over edge probabilities (float32 like the Go)."""
    final_path: list[int] = []
    final_prob = 0.0
    for n in g.nodes:
        if n.id == 0:
            final_prob, final_path = _best_path(g, n, np.float32(1.0), [])
    return final_path, float(final_prob)


def _best_path(g: GenomeGraph, node: Node, prev_prob, path: list[int]):
    path = path + [node.id]
    if not node.next:
        return prev_prob, path
    final_prob = np.float32(0.0)
    final_path: list[int] = []
    for e in node.next:
        temp = np.float32(e.prob) * prev_prob
        cur_prob, cur_path = _best_path(g, g.nodes[e.dest], temp, path)
        if cur_prob > final_prob:
            final_prob = cur_prob
            final_path = cur_path
    return final_prob, final_path
