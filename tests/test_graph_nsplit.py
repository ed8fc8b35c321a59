"""N-handling graph/fasta helpers: fa_split_by_ns, split_graph_chr,
node_split_by_ns (reference graphTools.go:36-48,191-320 commented
intent; bed.UngappedRegionsFromFa info.go:58-86)."""

import numpy as np

from gonomics_tpu import dna, graph as graphmod
from gonomics_tpu.io import bed as bedio
from gonomics_tpu.io.fasta import Fasta
from gonomics_tpu.io.vcf import Vcf


def _fa(name, s):
    return Fasta(name, dna.from_string(s))


def test_ungapped_regions_from_fa():
    beds = bedio.ungapped_regions_from_fa(_fa("c", "NNACGTNNNGGN"))
    assert [(b.chrom_start, b.chrom_end, b.name) for b in beds] == \
        [(2, 6, "c_2_6"), (9, 11, "c_9_11")]
    assert bedio.ungapped_regions_from_fa(_fa("c", "NNNN")) == []
    beds = bedio.ungapped_regions_from_fa(_fa("c", "ACGT"))
    assert [(b.chrom_start, b.chrom_end) for b in beds] == [(0, 4)]


def test_fa_split_by_ns():
    recs = graphmod.fa_split_by_ns([_fa("chr1", "NNACGTNNNGG"),
                                    _fa("chr2", "TTTT")])
    assert [(r.name, dna.to_string(r.seq)) for r in recs] == [
        ("chr1_2_6", "ACGT"), ("chr1_9_11", "GG"), ("chr2_0_4", "TTTT")]


def test_split_graph_chr():
    vcfs = [Vcf(chrom="chr1", pos=3, id=".", ref="G", alt=["T"],
                info="SVTYPE=SNP")]
    gs = graphmod.split_graph_chr(
        [_fa("chr1", "ACGTACGT"), _fa("chr2", "TTTTAAAA")], vcfs)
    assert set(gs) == {"chr1", "chr2"}
    assert len(gs["chr1"].nodes) > 1      # SNP creates alt branch
    assert len(gs["chr2"].nodes) == 1     # variant-free chromosome


def test_node_split_by_ns():
    g = graphmod.GenomeGraph()
    a = graphmod.Node(id=0, seq=dna.from_string("AC"))
    b = graphmod.Node(id=1, seq=dna.from_string("GGNNNTTNAA"))
    c = graphmod.Node(id=2, seq=dna.from_string("CC"))
    g.nodes = [a, b, c]
    graphmod.add_edge(a, b, 1)
    graphmod.add_edge(b, c, 1)
    ids = graphmod.node_split_by_ns(g, 1)
    assert len(ids) == 3
    seqs = [dna.to_string(g.nodes[i].seq) for i in ids]
    assert seqs == ["GG", "TT", "AA"]
    # chain is wired and the old outgoing edge moved to the last piece
    assert g.nodes[ids[0]].prev[0].dest == 0
    assert [e.dest for e in g.nodes[ids[0]].next] == [ids[1]]
    assert [e.dest for e in g.nodes[ids[1]].next] == [ids[2]]
    assert [e.dest for e in g.nodes[ids[2]].next] == [2]
    assert [e.dest for e in g.nodes[2].prev] == [ids[2]]
    # N-free node is untouched
    assert graphmod.node_split_by_ns(g, 0) == [0]
