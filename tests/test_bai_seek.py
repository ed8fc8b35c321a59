"""BAI region-seek parity: seeks match a full-scan filter on reference
BAMs; bedCountBam goldens."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.bed_count_bam import bed_count_bam
from gonomics_tpu.io import bai as baiio
from gonomics_tpu.io import sam as samio


@pytest.mark.parametrize("bam", ["/root/reference/sam/testdata/peak.bam",
                                 "/root/reference/sam/testdata/rand.bam"])
def test_seek_matches_full_scan(bam):
    bai = baiio.read_bai(bam + ".bai")
    _h, refs, all_recs = samio.read_bam(bam)
    chroms = {s.rname for s in all_recs if s.rname != "*"}
    for chrom in sorted(chroms):
        size = next(c.size for c in refs if c.name == chrom)
        positions = sorted(s.pos for s in all_recs if s.rname == chrom)
        mid = positions[len(positions) // 2]
        for start, end in ((0, size), (max(0, mid - 500), mid + 500),
                           (mid, mid + 1)):
            got = baiio.seek_bam_region(bam, bai, chrom, start, end)
            want = baiio._deduplicate(
                [s for s in all_recs if s.rname == chrom
                 and samio.get_chrom_end(s) > start
                 and samio.get_chrom_start(s) < end])
            assert [(s.qname, s.pos) for s in got] == \
                   [(s.qname, s.pos) for s in want]


def test_bed_count_bam_golden(tmp_path):
    td = "/root/reference/cmd/bedCountBam/testdata"
    out = str(tmp_path / "out.txt")
    bed_count_bam(f"{td}/in.sort.bam", f"{td}/in.bed", out)
    assert fileio.are_equal(out, f"{td}/exp.txt")
    bed_count_bam(f"{td}/in.sort.bam", f"{td}/in.bed", out, norm=True)
    assert fileio.are_equal(out, f"{td}/exp.norm.txt")
