"""Genome graphs: nodes of sequence joined by weighted edges.

Counterpart of /root/reference/genomeGraph/genomeGraph.go. Nodes are kept
in an index-addressed list (edges store node indices, not pointers) and
sequences are int8 code arrays. The .gg/.sg text serialization matches the
reference reader/writer (genomeGraph.go:51-181).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import dna, fileio


@dataclass
class Edge:
    dest: int
    prob: float


@dataclass
class Node:
    id: int
    seq: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int8))
    prev: list[Edge] = field(default_factory=list)
    next: list[Edge] = field(default_factory=list)


@dataclass
class GenomeGraph:
    nodes: list[Node] = field(default_factory=list)


def _fmt_prob(p: float) -> str:
    """Edge weight formatting matching Go fmt %v of float32."""
    f = float(np.float32(p))
    if f == int(f):
        return str(int(f))
    return f"{f:g}"


def read(filename: str) -> GenomeGraph:
    """genomeGraph.Read (genomeGraph.go:51): '>id' node headers, sequence
    lines, and tab-separated edge lines 'home\tprob\tdest[\tprob\tdest...]'.
    Accepts plain fasta too when headers parse as integers is not possible
    — use from_fasta for named references."""
    g = GenomeGraph()
    seqs: dict[int, list[np.ndarray]] = {}
    cur = -1
    with fileio.easy_open(filename) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            if line.startswith(">"):
                cur = int(line[1:])
                while len(g.nodes) <= cur:
                    g.nodes.append(Node(id=len(g.nodes)))
                seqs.setdefault(cur, [])
            elif "\t" in line:
                words = line.split("\t")
                home = int(words[0])
                for i in range(1, len(words) - 1, 2):
                    prob = float(words[i])
                    dest = int(words[i + 1])
                    add_edge(g.nodes[home], g.nodes[dest], prob)
            else:
                seqs[cur].append(dna.from_string(line))
    for idx, chunks in seqs.items():
        if chunks:
            g.nodes[idx].seq = np.concatenate(chunks)
    return g


def add_edge(u: Node, v: Node, prob: float) -> None:
    u.next.append(Edge(v.id, prob))
    v.prev.append(Edge(u.id, prob))


def write(filename: str, g: GenomeGraph, line_length: int = 50) -> None:
    """genomeGraph.Write (genomeGraph.go:137-181 WriteToGraphHandle)."""
    with fileio.easy_create(filename) as f:
        for n in g.nodes:
            f.write(f">{n.id}\n")
            s = np.asarray(n.seq)
            for i in range(0, len(s), line_length):
                f.write(dna.to_string(s[i:i + line_length]) + "\n")
        for n in g.nodes:
            if n.next:
                f.write(str(n.id))
                for e in n.next:
                    f.write(f"\t{_fmt_prob(e.prob)}\t{e.dest}")
                f.write("\n")


def get_sort_order(g: GenomeGraph) -> list[int]:
    """genomeGraph.GetSortOrder (sort.go:17): Kahn BFS per contiguous
    subgraph. The reference seeds each wave from Go map iteration
    (nondeterministic); here ascending node id, which matches the
    reference's own expected order in cmd/sortGraph/sortGraph_test.go."""
    order: list[int] = []
    visited = [False] * len(g.nodes)
    for root in g.nodes:
        if root.prev or visited[root.id]:
            continue
        # traceGraph (sort.go:104): collect this contiguous subgraph.
        members: list[int] = [root.id]
        visited[root.id] = True
        stack = [root.id]
        while stack:
            nid = stack.pop()
            for e in g.nodes[nid].next:
                if not visited[e.dest]:
                    visited[e.dest] = True
                    members.append(e.dest)
                    stack.append(e.dest)
        in_degree = {m: len(g.nodes[m].prev) for m in members}
        wave = [m for m in sorted(members) if in_degree[m] == 0]
        k = 0
        while k < len(wave):
            nid = wave[k]
            k += 1
            order.append(nid)
            del in_degree[nid]
            for e in g.nodes[nid].next:
                in_degree[e.dest] -= 1
                if in_degree[e.dest] == 0:
                    wave.append(e.dest)
    return order


def sort_graph(g: GenomeGraph) -> GenomeGraph:
    """genomeGraph.SortGraph (sort.go:4): renumber nodes into
    topological order, remapping edge endpoints."""
    order = get_sort_order(g)
    remap = {orig: new for new, orig in enumerate(order)}
    out = GenomeGraph()
    for new, orig in enumerate(order):
        n = g.nodes[orig]
        out.nodes.append(Node(
            id=new, seq=n.seq,
            prev=[Edge(remap[e.dest], e.prob) for e in n.prev],
            next=[Edge(remap[e.dest], e.prob) for e in n.next]))
    return out


def from_fasta(records) -> tuple[GenomeGraph, dict[int, str]]:
    """Build a linear graph (one node per fasta record, no edges) and a
    node->chrom-name map — the .fa reference path of cmd/gsw."""
    g = GenomeGraph()
    names: dict[int, str] = {}
    for i, rec in enumerate(records):
        g.nodes.append(Node(id=i, seq=dna.to_upper(rec.seq).astype(np.int8)))
        names[i] = rec.name
    return g, names


# ---------------------------------------------------------------------------
# k-mer seed index (genomeGraph/index.go:21-57)
# ---------------------------------------------------------------------------

def index_genome(g: GenomeGraph, seed_len: int, seed_step: int):
    """IndexGenomeIntoMap: kmer 2-bit code -> list of (node<<32|pos) codes.
    Kmers containing N are skipped; kmers crossing node boundaries are
    walked over edges like the reference helper."""
    if not 2 <= seed_len <= 32:
        raise ValueError("seed length needs to be >1 and <33")
    index: dict[int, list[int]] = {}

    def put(code: int, node_idx: int, pos: int) -> None:
        index.setdefault(code, []).append((node_idx << 32) | pos)

    for node in g.nodes:
        seq = np.asarray(node.seq, dtype=np.int64)
        n = len(seq)
        limit = n - seed_len + 1
        pos = 0
        if limit > 0:
            starts = np.arange(0, limit, seed_step)
            # vectorized 2-bit rolling codes at the sampled starts
            if len(starts):
                win = seq[starts[:, None] + np.arange(seed_len)]
                ok = (win < 4).all(axis=1)
                codes = np.zeros(len(starts), dtype=np.uint64)
                for k in range(seed_len):
                    codes = (codes << np.uint64(2)) | win[:, k].astype(np.uint64)
                for s, c in zip(starts[ok], codes[ok]):
                    put(int(c), node.id, int(s))
            pos = starts[-1] + seed_step if len(starts) else 0
        # boundary-crossing kmers walked over edges
        while pos < n:
            prefix = seq[pos:]
            for e in node.next:
                _index_cross(g, prefix, g.nodes[e.dest], node.id, pos,
                             seed_len, put)
            pos += seed_step
    return index


def _index_cross(g: GenomeGraph, prev_seq: np.ndarray, node: Node,
                 home_id: int, home_pos: int, seed_len: int, put) -> None:
    seq = np.asarray(node.seq, dtype=np.int64)
    if len(prev_seq) + len(seq) >= seed_len:
        kmer = np.concatenate([prev_seq, seq[:seed_len - len(prev_seq)]])
        if (kmer < 4).all():
            code = 0
            for b in kmer:
                code = (code << 2) | int(b)
            put(code, home_id, home_pos)
    else:
        ext = np.concatenate([prev_seq, seq])
        for e in node.next:
            _index_cross(g, ext, g.nodes[e.dest], home_id, home_pos,
                         seed_len, put)
