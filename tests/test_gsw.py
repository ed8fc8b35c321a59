"""gsw aligner tests: graph IO round-trip, seed/DP semantics, end-to-end
accuracy on simulated reads (reference model: genomeGraph_test.go runs the
real pipeline on simulated reads and checks completion)."""

import numpy as np
import pytest

from gonomics_tpu import dna
from gonomics_tpu.graph import GenomeGraph, Node, add_edge, index_genome, read, write
from gonomics_tpu.gsw import (GswAligner, left_dynamic_aln, right_dynamic_aln,
                              HUMAN_CHIMP_TWO, mismatch_stats)
from gonomics_tpu.io.fastq import Fastq, to_big

REF_TD = "/root/reference/genomeGraph/testdata"


def _sim_genome(n=5000, seed=0):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 4, n).astype(np.int8), rng


class TestGraphIO:
    def test_read_reference_sg(self):
        g = read(f"{REF_TD}/genome.sg")
        assert len(g.nodes) == 2
        assert dna.to_string(g.nodes[0].seq) == "ACGTACGTCATCATCATTACTACTAC"

    def test_round_trip(self, tmp_path):
        g = read(f"{REF_TD}/mini.gg")
        out = str(tmp_path / "out.gg")
        write(out, g)
        g2 = read(out)
        assert len(g.nodes) == len(g2.nodes)
        for a, b in zip(g.nodes, g2.nodes):
            assert (a.seq == b.seq).all()
            assert [(e.dest, e.prob) for e in a.next] == \
                   [(e.dest, e.prob) for e in b.next]

    def test_index_covers_steps(self):
        genome, _ = _sim_genome(1000)
        g = GenomeGraph(nodes=[Node(id=0, seq=genome)])
        idx = index_genome(g, 32, 32)
        n_entries = sum(len(v) for v in idx.values())
        assert n_entries == len(range(0, 1000 - 31, 32))


class TestDynamicAln:
    def test_left_local_clamps(self):
        a = dna.from_string("ACGTACGT")
        b = dna.from_string("ACGTACGT")
        score, route, i, j = left_dynamic_aln(a, b, HUMAN_CHIMP_TWO)
        assert score == sum(int(HUMAN_CHIMP_TWO[x, x]) for x in a)
        assert i == 0 and j == 0

    def test_right_prefix_anchored(self):
        a = dna.from_string("ACGTACGTAAAA")
        b = dna.from_string("ACGTACGT")
        score, route, mi, mj = right_dynamic_aln(a, b, HUMAN_CHIMP_TWO)
        assert mi == 8 and mj == 8
        assert score == sum(int(HUMAN_CHIMP_TWO[x, x]) for x in b)

    def test_mismatch_stats(self):
        mm = mismatch_stats(HUMAN_CHIMP_TWO)
        assert mm == (100, 90, -196, -296)


class TestAlignerEndToEnd:
    @pytest.fixture(scope="class")
    def setup(self):
        genome, rng = _sim_genome(5000)
        g = GenomeGraph(nodes=[Node(id=0, seq=genome)])
        return genome, GswAligner(g, node_names={0: "chr1"}), rng

    def test_perfect_reads(self, setup):
        genome, al, rng = setup
        for _ in range(10):
            start = int(rng.integers(0, 4850))
            fq = to_big(Fastq("r", genome[start:start + 150].copy(),
                              np.full(150, 30, np.uint8)))
            gf = al.align_read(fq)
            assert gf.path.t_start == start
            assert gf.aln_score == sum(
                int(HUMAN_CHIMP_TWO[x, x]) for x in fq.seq)
            assert [(c.run_length, c.op) for c in gf.cigar] == [(150, "M")]

    def test_mutated_and_rc_reads(self, setup):
        genome, al, rng = setup
        ok = 0
        n = 20
        for i in range(n):
            start = int(rng.integers(0, 4850))
            seq = genome[start:start + 150].copy()
            for _ in range(3):
                p = int(rng.integers(10, 140))
                seq[p] = (seq[p] + 1) % 4
            if i % 2:
                seq = dna.reverse_complement(seq).astype(np.int8)
            gf = al.align_read(to_big(Fastq("r", seq,
                                            np.full(150, 30, np.uint8))))
            ok += abs(gf.path.t_start - start) <= 5 and gf.aln_score > 1200
        assert ok == n

    def test_indel_read(self, setup):
        genome, al, rng = setup
        start = 1000
        seq = np.concatenate([genome[start:start + 70],
                              genome[start + 73:start + 153]]).copy()
        gf = al.align_read(to_big(Fastq("r", seq.astype(np.int8),
                                        np.full(150, 30, np.uint8))))
        assert gf.path.t_start == start
        ops = [(c.run_length, c.op) for c in gf.cigar]
        assert (3, "D") in ops  # the deletion is recovered

    def test_unmapped_read(self, setup):
        genome, al, rng = setup
        junk = rng.integers(0, 4, 150).astype(np.int8)
        gf = al.align_read(to_big(Fastq("r", junk,
                                        np.full(150, 30, np.uint8))))
        assert gf.aln_score < 1200 or gf.notes[0].value == "~"

    def test_pair_flags(self, setup):
        genome, al, rng = setup
        start = 2000
        fwd = to_big(Fastq("p", genome[start:start + 150].copy(),
                           np.full(150, 30, np.uint8)))
        rev_seq = dna.reverse_complement(
            genome[start + 200:start + 350]).astype(np.int8)
        rev = to_big(Fastq("p", rev_seq, np.full(150, 30, np.uint8)))
        a, b = al.align_pair(fwd, rev)
        assert a.pos_strand and not b.pos_strand
        assert a.flag & 1 and b.flag & 1  # proper pair

    def test_sam_projection(self, setup):
        genome, al, rng = setup
        start = 3000
        fq = to_big(Fastq("s", genome[start:start + 150].copy(),
                          np.full(150, 30, np.uint8)))
        s = al.giraf_to_sam(al.align_read(fq))
        assert s.rname == "chr1"
        assert s.pos == start + 1
        assert s.flag == 0
