"""graphReconstruct: PathFinder/seqOfPath/BuildNodes
(reference graphReconstruct/graphReconstruct_test.go)."""

from gonomics_tpu import dna, graph_reconstruct as gr
from gonomics_tpu.graph import Edge, GenomeGraph, Node
from gonomics_tpu.phylo.etree import read_newick, get_tree

TD = "/root/reference/graphReconstruct/testdata"


def _human_graph():
    g = GenomeGraph()
    seqs = ["ACGT", "AAA", "TTGG", "CCC", "GGG"]
    for i, s in enumerate(seqs):
        g.nodes.append(Node(id=i, seq=dna.from_string(s)))
    g.nodes[0].next = [Edge(1, 0.25), Edge(2, 0.75)]
    g.nodes[1].next = [Edge(2, 1.00)]
    g.nodes[2].next = [Edge(3, 0.25), Edge(4, 0.75)]
    g.nodes[3].next = [Edge(4, 1.00)]
    return g


def _columns(g):
    chimp = [Node(id=0, seq=dna.from_string("ACGT")),
             Node(id=1, seq=dna.from_string("TTGG"))]
    gorilla = [Node(id=0, seq=dna.from_string("ACGT")),
               Node(id=1, seq=dna.from_string("TTGG"))]
    return [
        gr.GraphColumn(0, {"human": [g.nodes[0]], "chimp": [chimp[0]],
                           "gorilla": [gorilla[0]]}),
        gr.GraphColumn(1, {"human": [g.nodes[1]]}),
        gr.GraphColumn(2, {"human": [g.nodes[2]], "chimp": [chimp[1]],
                           "gorilla": [gorilla[1]]}),
        gr.GraphColumn(3, {"human": [g.nodes[3], g.nodes[4]]}),
    ]


def test_path_finder():
    g = _human_graph()
    path, prob = gr.path_finder(g)
    assert path == [0, 2, 4]
    assert prob == 0.5625
    assert dna.to_string(gr.seq_of_path(g, path)) == "ACGTTTGGGGG"


def test_build_nodes():
    # graphReconstruct_test.go TestBuildNodes: each internal tree node
    # accumulates 5 ancestor candidate nodes over the 4 columns
    tree = read_newick(f"{TD}/HCGAtree.newick")
    internal = [t for t in get_tree(tree)
                if t.left is not None and t.right is not None]
    assert internal
    for node in internal:
        g = _human_graph()
        cols = _columns(g)
        nid = 0
        count = 0
        for col in cols:
            nid = gr.build_nodes(node.name, col, nid)
            count += len(col.align_nodes.get(node.name, []))
        assert count == 5
