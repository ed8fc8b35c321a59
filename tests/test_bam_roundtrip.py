"""BAM writer round-trip: read(write_bam(x)) == x over the reference's
human_chrM.bam (VERDICT hardening item)."""

import numpy as np

from gonomics_tpu.io import sam as samio
from gonomics_tpu.io.bam_writer import write_bam
from gonomics_tpu.io.cigar import to_string as cig_str

BAM = "/root/reference/cmd/callVariants/testdata/human_chrM.bam"


def test_bam_write_read_roundtrip(tmp_path):
    header, reads = samio.read(BAM)
    out = tmp_path / "rt.bam"
    for r in reads:
        samio.parse_extra(r)  # materialize text tags before encoding
    write_bam(str(out), header, reads)
    header2, reads2 = samio.read(str(out))
    assert header2.text == header.text
    assert [c.name for c in header2.chroms] == [c.name for c in
                                                header.chroms]
    assert len(reads2) == len(reads)
    for a, b in zip(reads, reads2):
        assert a.qname == b.qname
        assert (a.flag, a.rname, a.pos, a.mapq) == \
            (b.flag, b.rname, b.pos, b.mapq)
        assert cig_str(a.cigar) == cig_str(b.cigar)
        assert (a.rnext, a.pnext, a.tlen) == (b.rnext, b.pnext, b.tlen)
        assert (np.asarray(a.seq) == np.asarray(b.seq)).all()
        assert a.qual == b.qual
        samio.parse_extra(b)
        assert a.extra == b.extra


def test_bam_roundtrip_sam_text_identical(tmp_path):
    header, reads = samio.read(BAM)
    for r in reads:
        samio.parse_extra(r)
    want = [r.to_string() for r in reads]
    out = tmp_path / "rt.bam"
    write_bam(str(out), header, reads)
    _, reads2 = samio.read(str(out))
    for r in reads2:
        samio.parse_extra(r)
    assert [r.to_string() for r in reads2] == want
