"""TPU batched read aligner tests (pallas interpret mode on CPU)."""

import numpy as np
import pytest

from gonomics_tpu import dna
from gonomics_tpu.io.fasta import Fasta
from gonomics_tpu.io.fastq import Fastq
from gonomics_tpu.tpu_align import TpuReadAligner


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    genome = rng.integers(0, 4, 20_000).astype(np.int8)
    al = TpuReadAligner([Fasta("chr1", genome)], backend="interpret")
    return genome, al, rng


def _read(genome, start, length=80, rc=False, mut=()):
    seq = genome[start:start + length].copy()
    for p in mut:
        seq[p] = (seq[p] + 1) % 4
    if rc:
        seq = dna.reverse_complement(seq).astype(np.int8)
    return Fastq(f"r{start}", seq, np.full(length, 30, np.uint8))


def test_batch_accuracy(setup):
    genome, al, rng = setup
    reads, truth, rcs = [], [], []
    for i in range(10):
        start = int(rng.integers(0, len(genome) - 80))
        rc = bool(i % 2)
        reads.append(_read(genome, start, rc=rc, mut=(10, 40)))
        truth.append(start)
        rcs.append(rc)
    sams = al.align_batch(reads)
    for s, t, rc in zip(sams, truth, rcs):
        assert not (s.flag & 4)
        assert s.rname == "chr1"
        assert abs(s.pos - 1 - t) <= 3
        assert bool(s.flag & 16) == rc
        assert s.mapq > 0


def test_indel_cigar(setup):
    genome, al, rng = setup
    start = 5000
    seq = np.concatenate([genome[start:start + 40],
                          genome[start + 43:start + 123]]).astype(np.int8)
    sams = al.align_batch([Fastq("d", seq, np.full(120, 30, np.uint8))])
    # const-gap scoring permits equivalent-score split deletions; check
    # the total deleted bases and query consumption instead
    assert sum(c.run_length for c in sams[0].cigar if c.op == "D") == 3
    assert sum(c.run_length for c in sams[0].cigar
               if c.op in "MIS") == 120
    assert sams[0].pos == start + 1


def test_unmapped(setup):
    genome, al, rng = setup
    junk = rng.integers(0, 4, 80).astype(np.int8)
    sams = al.align_batch([Fastq("u", junk, np.full(80, 30, np.uint8))])
    assert sams[0].flag & 4


def test_pairs_tlen_flags(setup):
    genome, al, rng = setup
    start = 8000
    fwd = _read(genome, start)
    rev = Fastq("p", dna.reverse_complement(
        genome[start + 200:start + 280]).astype(np.int8),
        np.full(80, 30, np.uint8))
    sams = al.align_pairs([(fwd, rev)])
    a, b = sams
    assert a.flag & 1 and a.flag & 64 and b.flag & 128
    assert a.flag & 2 and b.flag & 2  # proper pair
    assert a.rnext == "=" and a.pnext == b.pos
    assert a.tlen == 280 and b.tlen == -280


def test_chunked_index_matches_unchunked():
    from gonomics_tpu.tpu_align import build_seed_index

    rng = np.random.default_rng(4)
    genome = rng.integers(0, 5, 50_000).astype(np.int8)  # incl. some N
    c1, p1 = build_seed_index(genome, 21, chunk=1 << 30)
    c2, p2 = build_seed_index(genome, 21, chunk=4096)
    assert (c1 == c2).all() and (p1 == p2).all()
    # every stored window really is ACGT-only and decodes to its code
    assert len(c1) > 0
    k = 21
    some = rng.integers(0, len(p1), 50)
    for i in some:
        win = genome[int(p1[i]):int(p1[i]) + k]
        assert (win < 4).all()
        code = 0
        for b in win:
            code = (code << 2) | int(b)
        assert np.uint64(code) == c1[i]


def test_index_save_load_roundtrip(tmp_path, setup):
    genome, al, rng = setup
    path = str(tmp_path / "idx.npz")
    al.save_index(path)
    al2 = TpuReadAligner.load(path, backend="interpret")
    assert (al2.idx_codes == al.idx_codes).all()
    assert (al2.idx_pos == al.idx_pos).all()
    assert (al2.genome == al.genome).all()
    reads = [_read(genome, s) for s in (100, 5_000, 12_345)]
    out1 = [s.to_string() for s in al.align_batch(reads)]
    out2 = [s.to_string() for s in al2.align_batch(reads)]
    assert out1 == out2


def test_repetitive_sequence_truncation_still_maps():
    # a genome that is 50% tandem repeat: max_hits_per_kmer truncation
    # must not break mapping of reads from the unique half
    rng = np.random.default_rng(9)
    unit = rng.integers(0, 4, 50).astype(np.int8)
    rep = np.tile(unit, 200)          # 10 kb of repeat
    uniq = rng.integers(0, 4, 10_000).astype(np.int8)
    genome = np.concatenate([rep, uniq])
    al = TpuReadAligner([Fasta("chr1", genome)], backend="interpret")
    reads = [_read(genome, 10_000 + 37 * i, 80) for i in range(8)]
    sams = al.align_batch(reads)
    for r, s in zip(reads, sams):
        assert s.flag & 4 == 0
        assert s.pos == int(r.name[1:]) + 1


def test_finish_batch_lines_matches_objects(setup):
    # native bulk SAM formatting must be byte-identical to the object path
    genome, al, rng = setup
    reads = []
    for i, s in enumerate((100, 5_000, 12_345, 7_777)):
        reads.append(_read(genome, s, rc=bool(i % 2), mut=(5, 40)))
    # an indel read and an unmappable read
    seq = np.concatenate([genome[3000:3050], genome[3053:3083]]).astype(np.int8)
    reads.append(Fastq("indel", seq, np.full(80, 30, np.uint8)))
    reads.append(Fastq("junk", rng.integers(0, 4, 80).astype(np.int8),
                       np.full(80, 30, np.uint8)))
    h = al.align_batch_async(reads)
    import copy
    text = al.finish_batch_lines(h)
    h2 = al.align_batch_async(reads)
    want = "".join(s.to_string() + "\n" for s in al.finish_batch(h2))
    assert text == want


def test_banded_engine_indel_cigars():
    """Reads with small indels map through the banded engine with D/I
    cigar runs at the right read offsets (band covers +/- pad)."""
    import numpy as np

    from gonomics_tpu import dna
    from gonomics_tpu.io.fasta import Fasta
    from gonomics_tpu.io.fastq import Fastq
    from gonomics_tpu.tpu_align import TpuReadAligner

    rng = np.random.default_rng(42)
    G, L = 200_000, 120
    genome = rng.integers(0, 4, G).astype(np.int8)
    al = TpuReadAligner([Fasta("chr1", genome)], seed_len=15)
    reads = []
    starts = []
    kinds = []
    for i in range(32):
        s = int(rng.integers(1000, G - 1000))
        starts.append(s)
        if i % 3 == 0:  # 5 bp deletion in the read (skips genome bases)
            seq = np.concatenate([genome[s:s + 60],
                                  genome[s + 65:s + 65 + (L - 60)]])
            kinds.append("D")
        elif i % 3 == 1:  # 5 bp insertion
            ins = rng.integers(0, 4, 5).astype(np.int8)
            seq = np.concatenate([genome[s:s + 60], ins,
                                  genome[s + 60:s + 60 + (L - 65)]])
            kinds.append("I")
        else:
            seq = genome[s:s + L].copy()
            kinds.append("M")
        reads.append(Fastq(f"r{i}", seq.astype(np.int8),
                           np.full(len(seq), 30, np.uint8)))
    sams = al.align_batch(reads)
    for i, s in enumerate(sams):
        assert not s.flag & 4, f"read {i} unmapped"
        assert s.pos == starts[i] + 1, (i, s.pos, starts[i] + 1)
        ops = "".join(c.op * 1 for c in s.cigar)
        if kinds[i] == "D":
            assert "D" in ops, (i, ops)
            # linear-gap model may split a run; total skipped ref = 5
            assert sum(c.run_length for c in s.cigar if c.op == "D") == 5
        elif kinds[i] == "I":
            assert "I" in ops, (i, ops)
            assert sum(c.run_length for c in s.cigar if c.op == "I") == 5
        # cigar read-length bookkeeping
        qlen = sum(c.run_length for c in s.cigar if c.op in "MIS=X")
        assert qlen == len(reads[i].seq)
