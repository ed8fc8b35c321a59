"""Tests for multiFaToChain (golden), sortGraph, drawNewickTree,
faChunkAlign/faDrawAlnChunks (reference cmd test tables; the reference's
own draw tests only assert the render succeeds)."""

import numpy as np

from gonomics_tpu import dna, fileio
from gonomics_tpu import graph as gg
from gonomics_tpu.align import matrices
from gonomics_tpu.align.multi import all_seq_affine, all_seq_affine_chunk
from gonomics_tpu.cli.draw_newick_tree import draw_newick_tree
from gonomics_tpu.cli.fa_draw_aln_chunks import fa_draw_aln_chunks
from gonomics_tpu.cli.multi_fa_to_chain import multi_fa_to_chain
from gonomics_tpu.cli.sort_graph import sort_graph
from gonomics_tpu.io import fasta as fastaio

REF = "/root/reference/cmd"


def test_multi_fa_to_chain(tmp_path):
    # cmd/multiFaToChain/multiFaToChain_test.go:11-44 table.
    td = f"{REF}/multiFaToChain/testdata"
    out = str(tmp_path / "out.chain")
    multi_fa_to_chain(f"{td}/test.fa", "chr22", "chr22", out)
    assert fileio.are_equal(out, f"{td}/expected.chain")
    multi_fa_to_chain(f"{td}/test.fa", "chr22", "chr22", out,
                      swap_t_and_q=True)
    assert fileio.are_equal(out, f"{td}/expected.swap.chain")
    multi_fa_to_chain(f"{td}/test.ThreeWay.fa", "chr22", "chr22", out,
                      query_seq_name="hca")
    assert fileio.are_equal(out, f"{td}/expected.chain")


def _make_test_graph() -> gg.GenomeGraph:
    # cmd/sortGraph/sortGraph_test.go MakeTestGraph topology:
    # n0 -> n1 -> {n2, n3, n4}; n2 -> n4; n3 -> n4.
    g = gg.GenomeGraph()
    seqs = ["ATG", "CG", "A", "T", "TAA"]
    for i, s in enumerate(seqs):
        g.nodes.append(gg.Node(id=i, seq=dna.from_string(s)))
    gg.add_edge(g.nodes[0], g.nodes[1], 1)
    gg.add_edge(g.nodes[1], g.nodes[2], 0.05)
    gg.add_edge(g.nodes[1], g.nodes[4], 0.8)
    gg.add_edge(g.nodes[1], g.nodes[3], 0.15)
    gg.add_edge(g.nodes[2], g.nodes[4], 1)
    gg.add_edge(g.nodes[3], g.nodes[4], 1)
    return g


def test_sort_graph(tmp_path):
    g = _make_test_graph()
    inp, out = str(tmp_path / "in.gg"), str(tmp_path / "out.gg")
    gg.write(inp, g)
    sort_graph(inp, out)
    sorted_g = gg.read(out)
    # Expected order 0..4 (sortGraph_test.go:16) — topological.
    assert [n.id for n in sorted_g.nodes] == [0, 1, 2, 3, 4]
    pos = {dna.to_string(n.seq): i for i, n in enumerate(sorted_g.nodes)}
    assert pos["ATG"] < pos["CG"] < pos["TAA"]
    assert pos["CG"] < pos["A"] and pos["CG"] < pos["T"]


def test_draw_newick_tree(tmp_path):
    # tree/draw_test.go table: render succeeds for each topology.
    for i, text in enumerate([
        "(human,chimp)ancestor;",
        "((human:0.5,chimp:0.2):0.3,rhesus:0.3);",
        "(((human:0.5,chimp:0.2):0.3,(mouse:0.1,rat:0.6):0.2):0.1,dog:0.7);",
    ]):
        nh = tmp_path / f"t{i}.nh"
        nh.write_text(text + "\n")
        out = tmp_path / f"t{i}.png"
        draw_newick_tree(str(nh), str(out), 1000, 200)
        assert out.stat().st_size > 0


def test_chunk_align_matches_base_align_at_chunk_size_one():
    recs = [fastaio.Fasta("a", dna.from_string("ACGTACGTAC")),
            fastaio.Fasta("b", dna.from_string("ACGTTACGAC")),
            fastaio.Fasta("c", dna.from_string("ACGACGTAC"))]
    base = all_seq_affine([fastaio.Fasta(r.name, r.seq.copy())
                           for r in recs],
                          matrices.HUMAN_CHIMP_TWO, -300, -40)
    chunk = all_seq_affine_chunk([fastaio.Fasta(r.name, r.seq.copy())
                                  for r in recs],
                                 matrices.HUMAN_CHIMP_TWO, -300, -40, 1)
    assert [(r.name, dna.to_string(r.seq)) for r in base] == \
        [(r.name, dna.to_string(r.seq)) for r in chunk]


def test_fa_draw_aln_chunks(tmp_path):
    recs = [fastaio.Fasta("s1", dna.from_string("ACGTAA" + "-" * 3)),
            fastaio.Fasta("s2", dna.from_string("ACGTAATTT"))]
    fa = str(tmp_path / "aln.fa")
    fastaio.write(fa, recs)
    out = tmp_path / "aln.png"
    fa_draw_aln_chunks(fa, 3, str(out))
    assert out.stat().st_size > 0


def test_chunk_align_divisibility_error(tmp_path):
    recs = [fastaio.Fasta("a", dna.from_string("ACGTACG")),
            fastaio.Fasta("b", dna.from_string("ACGTAC"))]
    try:
        all_seq_affine_chunk(recs, matrices.HUMAN_CHIMP_TWO, -300, -40, 3)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass

