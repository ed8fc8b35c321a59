"""dnaThreeBit packing + binaryGiraf compress/decompress
(reference dna/dnaThreeBit tests, giraf/binaryGiraf binWriter_test.go,
binReader_test.go)."""

import numpy as np

from gonomics_tpu import dna, dna_threebit as tb, fileio, graph as graphmod
from gonomics_tpu.io import binary_giraf as bg, giraf as girafio

TD = "/root/reference/giraf/binaryGiraf/testdata"


def test_threebit_roundtrip():
    for s in ("ACGT", "A", "ACGTGGTCA", "N" * 25, "ACGTN" * 21):
        f = tb.from_string(s)
        assert tb.to_string(f) == s
        assert f.len == len(s)
        for i, ch in enumerate(s):
            assert tb.get_base(f, i) == "ACGTN".index(ch)


def test_threebit_append_matches_pack():
    s = "ACGTNACGTNACGTNACGTNACG"  # 23 bases, crosses a word boundary
    f = None
    for ch in s:
        f = tb.append(f, "ACGTN".index(ch))
    g = tb.from_string(s)
    assert f.len == g.len
    # append leaves zero padding; compare decoded bases, not raw words
    assert tb.to_string(f) == tb.to_string(g)


def test_threebit_padding_mismatch():
    # differently padded tails must not be equal (dnaThreeBit.go:29-37)
    a = tb.new_three_bit(dna.from_string("ACG"), tb.PADDING_ONE)
    b = tb.new_three_bit(dna.from_string("ACG"), tb.PADDING_TWO)
    assert a.seq[0] != b.seq[0]
    assert tb.to_string(a) == tb.to_string(b) == "ACG"


def test_encode_qual_golden():
    # binWriter_test.go:16-25
    q = [40, 5, 5, 5, 5, 5, 5, 5, 30, 20, 20, 20, 1]
    assert bg._encode_qual(q) == [(1, 40), (7, 5), (1, 30), (3, 20), (1, 1)]


def test_fancy_seq_golden():
    # binWriter_test.go:27-38
    from gonomics_tpu.io.cigar import CigarOp

    seq = dna.from_string("ACGTGGTCA")
    cig = [CigarOp(1, "S"), CigarOp(4, "="), CigarOp(2, "I"),
           CigarOp(1, "X"), CigarOp(3, "=")]
    assert tb.to_string(bg._get_fancy_seq(seq, cig)) == "AGTC"


def test_notes_golden():
    # binWriter_test.go:40-49
    notes = [girafio.Note("BC", "Z", "TEST\x00"),
             girafio.Note("AD", "Z", "TEST2\x00")]
    raw = b"".join(bg._note_to_bytes(n) for n in notes)
    assert raw == b"BCZTEST\x00ADZTEST2\x00"


def _test_graph():
    # binReader_test.go MakeTestGraph: nodes 1 and 2 hold the 100-mer
    node_seq = dna.from_string("ATGCG" * 20)
    g = graphmod.GenomeGraph()
    g.nodes.append(graphmod.Node(id=0))
    g.nodes.append(graphmod.Node(id=1, seq=node_seq))
    g.nodes.append(graphmod.Node(id=2, seq=node_seq.copy()))
    return g


def test_compress_decompress_roundtrip(tmp_path):
    fe = tmp_path / "test.giraf.fe"
    out = tmp_path / "roundtrip.giraf"
    bg.compress_giraf(f"{TD}/test.giraf", str(fe))
    bg.decompress_giraf(str(fe), str(out), _test_graph())
    # the binary format does not store the strand column; the reference
    # reader derives PosStrand from flag bit 8 (binReader.go:172), so a
    # flag-0 '+' record round-trips to '-' in Go too. Compare the rest.
    got = out.read_text().strip().split("\t")
    exp = open(f"{TD}/test.giraf").read().strip().split("\t")
    assert got[:4] == exp[:4]
    assert got[5:] == exp[5:]
    assert got[4] == "-" and exp[4] == "+"


def test_read_reference_binary_file():
    # decode the reference's own pre-built .giraf.fe
    recs = bg.read_giraf_records(f"{TD}/test.giraf.fe", _test_graph())
    want = girafio.read(f"{TD}/test.giraf")
    assert len(recs) == len(want) == 1
    got, exp = recs[0], want[0]
    assert got.qname == exp.qname
    assert got.path.nodes == exp.path.nodes
    assert dna.to_string(got.seq) == dna.to_string(exp.seq)
    assert (got.qual == exp.qual).all()
    assert [n.to_string() for n in got.notes] == \
        [n.to_string() for n in exp.notes]
