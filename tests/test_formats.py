"""Round-trip / parse tests for axt, chain, psl, genePred, maf, gtf
against reference testdata."""

import numpy as np

from gonomics_tpu import fileio
from gonomics_tpu.io import formats


def test_axt_round_trip(tmp_path):
    recs = formats.read_axt("/root/reference/axt/testdata/chrM_gasacu1.axt")
    assert len(recs) > 0
    out = str(tmp_path / "o.axt")
    formats.write_axt(out, recs)
    # read back equals original records
    again = formats.read_axt(out)
    assert len(again) == len(recs)
    for a, b in zip(recs, again):
        assert a.r_name == b.r_name and a.score == b.score
        assert (a.r_seq == b.r_seq).all()


def test_chain_round_trip_and_liftover(tmp_path):
    chains, comments = formats.read_chain(
        "/root/reference/chain/testdata/axtTest.chain")
    assert len(chains) >= 1
    c = chains[0]
    # liftover: first aligned base maps to q_start
    q, ok = formats.t_pos_to_q_pos(c, c.t_start)
    assert ok
    assert q == (c.q_start if c.q_strand else c.q_end - 1)
    out = str(tmp_path / "o.chain")
    formats.write_chain(out, chains)
    again, _ = formats.read_chain(out)
    assert len(again) == len(chains)
    assert [a.size for a in again[0].alignment] == \
        [a.size for a in c.alignment]


def test_psl_parse():
    import glob

    files = glob.glob("/root/reference/psl/testdata/*")
    assert files
    recs = formats.read_psl(files[0])
    assert len(recs) > 0
    p = recs[0]
    assert p.block_count == len(p.block_size)
    s = formats.psl_to_string(p)
    assert s.split("\t")[9] == p.q_name


def test_maf_parse_and_to_fasta():
    blocks = formats.read_maf(
        "/root/reference/maf/testdata/toFastaTest.maf")
    assert len(blocks) > 0
    assert all(len(b.s_lines) > 0 for b in blocks)


def test_gtf_hierarchy():
    genes = formats.read_gtf("/root/reference/gtf/testdata/test.gtf")
    assert len(genes) > 0
    g = next(iter(genes.values()))
    assert g.transcripts
    assert g.transcripts[0].exons
