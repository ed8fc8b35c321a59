"""Sparse genome-scale seed index (tpu_align index_mode="sparse"):
the two-level (bucket + uint16 remainder) positions-only table must
produce the same candidates as the numpy sampled-table fallback, and the
aligner built on it must map clean reads to their true positions.

Reference analog: the step-sampled gsw index
(/root/reference/genomeGraph/index.go:21-57) probed at every read offset
(search.go:549-589)."""

import numpy as np
import pytest

from gonomics_tpu import dna, native
from gonomics_tpu.io.fasta import Fasta
from gonomics_tpu.io.fastq import Fastq
from gonomics_tpu.tpu_align import TpuReadAligner


def _reads(genome, rng, B=48, L=120, snps=3):
    reads = []
    starts = []
    for i in range(B):
        s = int(rng.integers(0, len(genome) - L))
        seq = genome[s:s + L].copy()
        for _ in range(snps):
            p = int(rng.integers(0, L))
            seq[p] = (seq[p] + 1) % 4
        if i % 2:
            seq = dna.reverse_complement(seq).astype(np.int8)
        reads.append(Fastq(f"r{i}", seq, np.full(L, 30, np.uint8)))
        starts.append(s)
    return reads, starts


class TestSparseIndex:
    def test_native_matches_numpy_fallback(self):
        if not native.available():
            pytest.skip("native lib unavailable")
        rng = np.random.default_rng(1)
        genome = rng.integers(0, 4, 80_000, dtype=np.int8)
        al = TpuReadAligner([Fasta("chr1", genome)], index_mode="sparse",
                            index_step=4, backend="interpret")
        reads, _ = _reads(genome, rng)
        fwd = np.stack([r.seq for r in reads])
        rev = dna.complement(fwd[:, ::-1]).astype(np.int8)
        cn = al._candidates_sparse(fwd, rev)
        al._sparse, saved = None, al._sparse
        al._sparse_fallback = al._build_sparse_fallback()
        cp = al._candidates_sparse(fwd, rev)
        al._sparse = saved
        for f in ("diag", "votes", "second", "strand"):
            assert (np.asarray(getattr(cn, f))
                    == np.asarray(getattr(cp, f))).all(), f

    def test_sparse_aligner_maps_reads(self):
        rng = np.random.default_rng(7)
        genome = rng.integers(0, 4, 120_000, dtype=np.int8)
        al = TpuReadAligner([Fasta("chr1", genome)], index_mode="sparse",
                            index_step=8, backend="interpret")
        reads, starts = _reads(genome, rng, B=24, snps=1)
        sams = al.align_batch(reads)
        ok = 0
        for s, true_start in zip(sams, starts):
            if not s.flag & 4 and abs(s.pos - 1 - true_start) <= 2:
                ok += 1
        assert ok >= 22  # N-free random genome: essentially all map

    def test_sparse_handles_n_bases(self):
        rng = np.random.default_rng(3)
        genome = rng.integers(0, 4, 50_000, dtype=np.int8)
        genome[1000:1200] = dna.N  # an N island is never indexed
        al = TpuReadAligner([Fasta("chr1", genome)], index_mode="sparse",
                            index_step=8, backend="interpret")
        reads, _ = _reads(genome, rng, B=8, snps=0)
        sams = al.align_batch(reads)
        assert len(sams) == 8
