"""Native SAM-text pileup path (seqio.cpp sam_scatter +
pileup.pileup_dense_from_sam_path) must produce identical dense counts
and indel side tables to the python read+pileup_dense path."""

import numpy as np
import pytest

from gonomics_tpu import native
from gonomics_tpu.io import sam as samio
from gonomics_tpu.pileup import pileup_dense, pileup_dense_from_sam_path

SAM = """\
@HD\tVN:1.6\tSO:coordinate
@SQ\tSN:chr1\tLN:1000
@SQ\tSN:chr2\tLN:500
r1\t0\tchr1\t10\t60\t10M\t*\t0\t0\tACGTACGTAC\tIIIIIIIIII
r2\t16\tchr1\t12\t60\t4M2D4M\t*\t0\t0\tACGTACGT\tIIIIIIII
r3\t99\tchr1\t15\t60\t3M2I5M\t*\t0\t0\tacgTTGGTTA\tIIIIIIIIII
r4\t147\tchr1\t15\t60\t2S6M\t*\t0\t0\tGGACGTAC\tIIIIIIII
r5\t0\tchr1\t20\t5\t8M\t*\t0\t0\tACGTACGT\tIIIIIIII
r6\t0\tchr1\t30\t60\t2I6M1I\t*\t0\t0\tTTACGTACC\tIIIIIIIII
r7\t0\tchr2\t7\t60\t5M\t*\t0\t0\tNNACG\tIIIII
r8\t0\tchr1\t40\t60\t*\t*\t0\t0\tACGT\tIIII
"""


@pytest.fixture()
def sam_file(tmp_path):
    p = tmp_path / "t.sam"
    p.write_text(SAM)
    return str(p)


def _cmp(a, b):
    assert sorted(a) == sorted(b)
    for refidx in a:
        ca, cb = a[refidx], b[refidx]
        assert ca.lo == cb.lo
        assert ca.counts.shape == cb.counts.shape
        assert (ca.counts == cb.counts).all()
        assert ca.ins == cb.ins
        assert ca.dels == cb.dels


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_native_matches_python(sam_file):
    header, reads = samio.read(sam_file)
    want = pileup_dense(reads, header, [lambda s: s.mapq >= 10])
    got = pileup_dense_from_sam_path(sam_file, header, 10)
    _cmp(got, want)


@pytest.mark.skipif(not native.available(), reason="no native lib")
def test_header_only_reader(sam_file):
    h = samio.read_header_text(sam_file)
    assert [c.name for c in h.chroms] == ["chr1", "chr2"]
    assert h.sort_order == ["coordinate"]
