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
# random giraf simulation (genomeGraph/giraf.go:15-145, randomReads.go:57-95)
# ---------------------------------------------------------------------------

def bases_in_graph(g: GenomeGraph) -> int:
    return sum(len(n.seq) for n in g.nodes)


def _rand_int_in_range(rng, x: int, y: int) -> int:
    return int(rng.float64() * (y - x)) + x


def rand_location_fast(g: GenomeGraph, total_bases: int, rng):
    """RandLocationFast (randomReads.go:57)."""
    r = _rand_int_in_range(rng, 0, total_bases)
    for i, n in enumerate(g.nodes):
        if r < len(n.seq):
            return i, r
        r -= len(n.seq)
    raise RuntimeError("trouble selecting a random location in the graph")


def rand_path_fwd(g: GenomeGraph, node_idx: int, pos: int, length: int,
                  rng):
    """RandPathFwd (randomReads.go:70): random forward walk collecting
    `length` bases; edge choices via RandIntInRange."""
    answer: list[int] = []
    node = g.nodes[node_idx]
    while len(answer) < length and pos < len(node.seq):
        answer.append(int(node.seq[pos]))
        pos += 1
    if len(answer) == length or not node.next:
        return [node_idx], pos, np.array(answer, np.int8)
    path = [node_idx]
    while True:
        edge_idx = _rand_int_in_range(rng, 0, len(node.next))
        node_idx = node.next[edge_idx].dest
        node = g.nodes[node_idx]
        path.append(node_idx)
        pos = 0
        while len(answer) < length and pos < len(node.seq):
            answer.append(int(node.seq[pos]))
            pos += 1
        if len(answer) == length or not node.next:
            return path, pos, np.array(answer, np.int8)


def _generate_diverse_quals(read_len: int, rng):
    """generateDiverseQuals (genomeGraph/giraf.go:60)."""
    prob = rng.intn(100)
    if prob == 0:
        aln_score = _rand_int_in_range(rng, 6000, 8000)
        mapq = rng.intn(5)
    elif prob < 10:
        aln_score = _rand_int_in_range(rng, 8000, 10000)
        mapq = _rand_int_in_range(rng, 5, 15)
    elif prob < 20:
        aln_score = _rand_int_in_range(rng, 10000, 15000)
        mapq = _rand_int_in_range(rng, 15, 30)
    else:
        aln_score = _rand_int_in_range(rng, 15000, 20000)
        mapq = _rand_int_in_range(rng, 30, 40)
    quals = np.zeros(read_len, np.uint8)
    for i in range(read_len):
        p = rng.intn(100)
        base = rng.intn(10)
        if p == 0:
            quals[i] = base
        elif p < 10:
            quals[i] = base + 10
        elif p < 20:
            quals[i] = base + 20
        else:
            quals[i] = base + 30
    return quals, aln_score, mapq


def rand_giraf(g: GenomeGraph, num_reads: int, read_len: int,
               rand_seed: int):
    """genomeGraph.RandGiraf (giraf.go:15)."""
    from .io.cigar import CigarOp
    from .io.giraf import Giraf, Path
    from .numbers.gorand import GoRand

    total = bases_in_graph(g)
    if read_len > total:
        raise SystemExit("Cannot request more bases than is present in "
                         "graph")
    rng = GoRand(rand_seed)
    answer = []
    while len(answer) < num_reads:
        node_idx, pos = rand_location_fast(g, total, rng)
        path, end_pos, seq = rand_path_fwd(g, node_idx, pos, read_len, rng)
        strand = rng.intn(2) == 0
        if len(seq) == read_len and not (seq == dna.N).any():
            qual, aln_score, mapq = _generate_diverse_quals(read_len, rng)
            strand_c = "+" if strand else "-"
            cur = Giraf(
                qname=f"{path[0]}_{pos + 1}_{path[-1]}_{end_pos + 1}_"
                      f"{strand_c}",
                q_start=0, q_end=read_len, pos_strand=strand,
                path=Path(t_start=pos, nodes=list(path), t_end=end_pos),
                cigar=[CigarOp(read_len, "M")], aln_score=aln_score,
                mapq=mapq, seq=seq, qual=qual)
            if not strand:
                cur.seq = dna.reverse_complement(cur.seq).astype(np.int8)
            answer.append(cur)
    return answer


def node_pos_to_read_pos(g: GenomeGraph, read, node: int, pos: int) -> int:
    """NodePosToReadPos (genomeGraph/giraf.go:146)."""
    pos_in_path = 0
    for i, nid in enumerate(read.path.nodes):
        if nid == node:
            pos_in_path = i
            break
    read_pos = sum(len(g.nodes[read.path.nodes[i]].seq)
                   for i in range(pos_in_path))
    return read_pos + pos - read.path.t_start


def rand_somatic_mutations(g: GenomeGraph, reads, num_snv: int,
                           allele_frequency: float, rand_seed: int):
    """genomeGraph.RandSomaticMutations (giraf.go:100)."""
    from .numbers.gorand import GoRand

    total = bases_in_graph(g)
    rng = GoRand(rand_seed)
    mut_nodes: list[int] = []
    mut_pos: list[int] = []
    for _ in range(num_snv):
        node_idx, pos = rand_location_fast(g, total, rng)
        mut_nodes.append(node_idx)
        mut_pos.append(pos)
        mutant = 4
        for read in reads:
            for k, nid in enumerate(read.path.nodes):
                if nid != node_idx:
                    continue
                if read.path.nodes[0] == node_idx and \
                        read.path.t_start > pos:
                    continue
                if read.path.nodes[-1] == node_idx and \
                        read.path.t_end < pos:
                    continue
                read_pos = node_pos_to_read_pos(g, read, node_idx, pos)
                if read_pos >= len(read.seq):
                    continue
                if mutant == 4:
                    base = int(read.seq[read_pos])
                    while True:
                        mutant = rng.intn(4)
                        if mutant != base:
                            break
                if rng.intn(100) / 100 <= allele_frequency:
                    read.seq[read_pos] = mutant
    return mut_nodes, mut_pos


# ---------------------------------------------------------------------------
# VCF -> variant-graph construction (genomeGraph/graphTools.go:13-345)
# ---------------------------------------------------------------------------

def _is_inv(v) -> bool:
    """isINV (graphTools.go:224)."""
    data = v.info.split(";")
    return (v.alt and v.alt[0] == "<INV>") or \
        (data and data[0] == "SVTYPE=INV")


def _is_dup(v) -> bool:
    return "SVTYPE=DUP" in v.info


def _is_cnv(v) -> bool:
    return "SVTYPE=CNV" in v.info


def _is_haplotype_block(v) -> bool:
    """isHaplotypeBlock (graphTools.go:326)."""
    return ("SVTYPE=SNP;INS" in v.info or "SVTYPE=SNP;DEL" in v.info
            or "SVTYPE=HAP" in v.info)


def _get_sv_end(v) -> int:
    """getSvEnd (graphTools.go:246): END= tag of PBSV-style records."""
    if "END=" not in v.info:
        raise ValueError("Error: Vcf might not be from PBSV...")
    for word in v.info.split(";"):
        if "END=" in word:
            return int(word.split("END=")[1])
    return 0


class _Builder:
    """vChrGraph's pointer dance with an explicit sentinel.

    The reference threads edges through zero-value *Node sentinels
    (graphTools.go:56-57) whose Next edges are later bridged onto real
    nodes; their reciprocal Prev edges would make node 0 rootless and
    break the reference's own topological sort (sort.go:46-50), so here
    the sentinel's Prev side is simply never recorded — the sorted graph
    keeps every node."""

    def __init__(self, g: GenomeGraph):
        self.g = g

    def new_sentinel(self) -> Node:
        return Node(id=-1)

    def add_node(self, node: Node) -> Node:
        assert node.id == len(self.g.nodes)
        self.g.nodes.append(node)
        return node

    def add_edge(self, u: Node, v: Node, prob: float) -> None:
        u.next.append(Edge(v.id, prob))
        if u.id >= 0:
            v.prev.append(Edge(u.id, prob))

    def set_even_weights(self, u: Node) -> None:
        if u.next:
            w = float(np.float32(1) / np.float32(len(u.next)))
            for e in u.next:
                e.prob = w


def variant_graph(records, vcf_map: dict) -> GenomeGraph:
    """genomeGraph.VariantGraph (graphTools.go:13): fasta + per-chrom
    sorted VCFs -> variant graph (SNP/INS/DEL/INV/DUP/CNV/HAP nodes),
    topologically sorted."""
    from .io import vcf as vcfio

    g = GenomeGraph()
    for rec in records:
        filter_vcf = vcf_map.get(rec.name, [])
        if filter_vcf:
            filter_vcf = list(filter_vcf)
            vcfio.sort(filter_vcf)
            _vchr_graph(g, rec.name, rec.seq, filter_vcf)
        else:
            g.nodes.append(Node(id=len(g.nodes),
                                seq=np.asarray(rec.seq, np.int8)))
    return sort_graph(g)


def _vchr_graph(genome: GenomeGraph, chrom_name: str, chr_seq, vcfs_chr):
    """vChrGraph (graphTools.go:50-196), ported with the same control flow
    (see _Builder for the one documented divergence)."""
    from .io import vcf as vcfio

    b = _Builder(genome)
    vcfs = list(vcfs_chr) + [vcfio.Vcf(chrom=chrom_name, pos=len(chr_seq))]
    chr_seq = dna.to_upper(np.asarray(chr_seq)).astype(np.int8)

    def by_id(e: Edge) -> Node:
        return genome.nodes[e.dest]

    curr = b.new_sentinel()
    last = b.new_sentinel()
    ref_allele = b.new_sentinel()
    alt_allele = b.new_sentinel()
    index = 0
    n = len(vcfs)
    i = 0
    while i < n - 1:
        v = vcfs[i]
        if v.chrom != chrom_name:
            raise ValueError("Error: chromosome names do not match...")
        if v.pos - index > 0:
            curr = Node(id=len(genome.nodes),
                        seq=chr_seq[index:v.pos - 1].copy())
            if len(curr.seq) == 0:
                curr = last
                # the ref allele exists from the previous iteration; only
                # alt alleles are created here (graphTools.go:69-97)
                if vcfio.snp(v):
                    alt_allele = b.add_node(Node(
                        id=len(genome.nodes), seq=dna.from_string(v.alt[0])))
                    b.add_edge(curr, alt_allele, 0.5)
                elif vcfio.ins(v):
                    node = b.add_node(Node(
                        id=len(genome.nodes),
                        seq=dna.from_string(v.alt[0])[1:]))
                    b.add_edge(curr, node, 1)
                    index = v.pos - 1
                elif vcfio.dele(v):
                    node = b.add_node(Node(
                        id=len(genome.nodes),
                        seq=dna.from_string(v.ref)[1:]))
                    b.add_edge(curr, node, 1)
                    if "pbsv" in v.id:
                        index = min(v.pos + len(node.seq) - 1,
                                    vcfs[i + 1].pos - 1)
                    else:
                        index = v.pos + len(node.seq)
                elif _is_haplotype_block(v):
                    # Go shadows altAllele with := here — the outer
                    # variable is deliberately NOT updated
                    hap_alt = b.add_node(Node(
                        id=len(genome.nodes), seq=dna.from_string(v.alt[0])))
                    b.add_edge(curr, hap_alt, 1)
                    index = v.pos + len(ref_allele.seq) - 1
                last = curr
            else:
                curr = b.add_node(curr)
                if len(last.next) > 0:
                    for e in list(last.next):
                        b.add_edge(by_id(e), curr, 1)
                if i > 0 and (vcfio.snp(vcfs[i - 1])
                              or _is_haplotype_block(vcfs[i - 1])):
                    b.add_edge(alt_allele, curr, 1)
                b.add_edge(last, curr, 1)
                b.set_even_weights(last)

                if vcfio.snp(v):
                    ref_allele = b.add_node(Node(
                        id=len(genome.nodes), seq=dna.from_string(v.ref)))
                    b.add_edge(curr, ref_allele, 0.5)
                    alt_allele = b.add_node(Node(
                        id=len(genome.nodes), seq=dna.from_string(v.alt[0])))
                    b.add_edge(curr, alt_allele, 0.5)
                    curr = ref_allele
                    index = v.pos
                    # merge runs of adjacent SNPs (graphTools.go:123-134)
                    j = i + 1
                    while j < n - 1:
                        if vcfio.snp(vcfs[j - 1]) and vcfio.snp(vcfs[j]) \
                                and vcfs[j].pos - 1 == vcfs[j - 1].pos:
                            ref_allele.seq = np.concatenate(
                                [ref_allele.seq,
                                 dna.from_string(vcfs[j].ref)])
                            alt_allele.seq = np.concatenate(
                                [alt_allele.seq,
                                 dna.from_string(vcfs[j].alt[0])])
                            index = vcfs[j].pos
                            j += 1
                        else:
                            last = curr
                            i = j - 1
                            break
                elif vcfio.ins(v):
                    node = b.add_node(Node(
                        id=len(genome.nodes), seq=dna.from_string(v.alt[0])))
                    b.add_edge(curr, node, 1)
                    index = v.pos - 1
                elif vcfio.dele(v):
                    node = b.add_node(Node(
                        id=len(genome.nodes), seq=dna.from_string(v.ref)))
                    b.add_edge(curr, node, 1)
                    if "pbsv" in v.id:
                        index = min(v.pos + len(node.seq) - 1,
                                    vcfs[i + 1].pos - 1)
                    else:
                        index = v.pos + len(node.seq)
                elif _is_inv(v):
                    curr.seq = np.concatenate(
                        [curr.seq, dna.from_string(v.ref)])
                    inv_seq = dna.reverse_complement(
                        chr_seq[v.pos:_get_sv_end(v)]).astype(np.int8)
                    node = b.add_node(Node(id=len(genome.nodes),
                                           seq=inv_seq))
                    b.add_edge(curr, node, 1)
                    index = _get_sv_end(v)
                elif _is_cnv(v) or _is_dup(v):
                    curr.seq = np.concatenate(
                        [curr.seq, dna.from_string(v.ref)])
                    node = b.add_node(Node(
                        id=len(genome.nodes),
                        seq=chr_seq[v.pos:_get_sv_end(v)].copy()))
                    b.add_edge(curr, node, 1)
                    index = _get_sv_end(v)
                elif _is_haplotype_block(v):
                    ref_allele = b.add_node(Node(
                        id=len(genome.nodes), seq=dna.from_string(v.ref)))
                    b.add_edge(curr, ref_allele, 1)
                    alt_allele = b.add_node(Node(
                        id=len(genome.nodes), seq=dna.from_string(v.alt[0])))
                    b.add_edge(curr, alt_allele, 1)
                    index = min(v.pos + len(ref_allele.seq) - 1,
                                vcfs[i + 1].pos - 1)
                    curr = ref_allele
                last = curr
        i += 1

    # last node: remaining chromosome tail (graphTools.go:181-192)
    last_node = b.add_node(Node(id=len(genome.nodes),
                                seq=chr_seq[index:].copy()))
    for e in list(last.next):
        b.add_edge(by_id(e), last_node, 1)
    if vcfio.snp(vcfs[n - 2]) or _is_haplotype_block(vcfs[n - 2]):
        b.add_edge(alt_allele, last_node, 1)
    b.add_edge(last, last_node, 1)
    b.set_even_weights(last)
    return genome


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


def fa_split_by_ns(records) -> list:
    """genomeGraph.FaSplitByNs / chrSplitByNs (the reference keeps these
    as commented-out intent, graphTools.go:191-208): split every record
    into its ungapped (defined-base) runs, named "<chrom>_<start>_<end>"
    like bed.UngappedRegionsFromFa."""
    from .io import bed as bedio
    from .io.fasta import Fasta

    out = []
    for rec in records:
        for b in bedio.ungapped_regions_from_fa(rec):
            out.append(Fasta(b.name, rec.seq[b.chrom_start:b.chrom_end]))
    return out


def split_graph_chr(records, vcfs) -> dict:
    """genomeGraph.SplitGraphChr (commented intent, graphTools.go:36-48):
    one variant graph per chromosome, keyed by name; variants are routed
    to their chromosome."""
    by_chrom: dict[str, list] = {}
    for v in vcfs:
        by_chrom.setdefault(v.chrom, []).append(v)
    return {rec.name: variant_graph([rec],
                                    {rec.name: by_chrom.get(rec.name, [])})
            for rec in records}


def node_split_by_ns(g: GenomeGraph, node_id: int) -> list[int]:
    """genomeGraph.NodeSplitByNs (commented intent, graphTools.go:285):
    split one node's sequence on N runs into a chain of defined-base
    nodes (edges weight 1 between consecutive pieces, inherited prev/next
    edges at the ends). Returns the new node ids; no-op for N-free
    nodes."""
    from . import dna as dnamod
    import numpy as np

    node = g.nodes[node_id]
    orig = np.asarray(node.seq)
    mask = dnamod.define_base_mask(orig)
    if len(orig) == 0 or mask.all():
        return [node_id]
    edges_at = np.flatnonzero(np.diff(mask.astype(np.int8)))
    starts = ([0] if mask[0] else []) + [int(e) + 1 for e in edges_at
                                         if not mask[e]]
    ends = [int(e) + 1 for e in edges_at if mask[e]] + \
        ([len(mask)] if mask[-1] else [])
    pieces = list(zip(starts, ends))
    if not pieces:  # all-N node collapses to an empty node
        pieces = [(0, 0)]
    # first piece replaces the node in place (keeps its prev edges);
    # the original outgoing edges move to the last piece
    old_next = node.next
    node.seq = orig[pieces[0][0]:pieces[0][1]]
    node.next = []
    prev_node = node
    ids = [node_id]
    for s, e in pieces[1:]:
        nn = Node(id=len(g.nodes), seq=orig[s:e])
        g.nodes.append(nn)
        ids.append(nn.id)
        add_edge(prev_node, nn, 1)
        prev_node = nn
    for ed in old_next:
        dest = g.nodes[ed.dest]
        dest.prev = [p for p in dest.prev if p.dest != node_id]
        add_edge(prev_node, dest, ed.prob)
    return ids
