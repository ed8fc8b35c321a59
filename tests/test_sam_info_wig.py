"""samInfo + samToWig goldens (reference cmd test tables)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.sam_info import coverage, mapq, read_length
from gonomics_tpu.cli.sam_to_wig import sam_to_wig

REF = "/root/reference/cmd"


def test_read_length(tmp_path):
    td = f"{REF}/samInfo/testdata/readLength"
    out = str(tmp_path / "out.txt")
    read_length(f"{td}/small.sam", out)
    assert fileio.are_equal(out, f"{td}/expected.readLength.txt")


@pytest.mark.parametrize("n,hef", [(1, 0.1), (2, 0.5), (3, 0.01)])
def test_coverage(tmp_path, n, hef, monkeypatch):
    monkeypatch.chdir(f"{REF}/samInfo")
    hist = str(tmp_path / "hist.txt")
    stats = str(tmp_path / "stats.txt")
    coverage(f"testdata/coverage/test{n}.bam", hist, stats,
             count_n_in_depth=False, high_end_filter=hef)
    assert fileio.are_equal(hist,
                            f"testdata/coverage/expected.test{n}.hist.txt")
    assert fileio.are_equal(
        stats, f"testdata/coverage/expected.test{n}.stats.txt")


def test_mapq(tmp_path):
    td = f"{REF}/samInfo/testdata/mapq"
    out = str(tmp_path / "out.txt")
    mapq(f"{td}/test1.bam", out)
    assert fileio.are_equal(out, f"{td}/exp.hist.txt")
    mapq(f"{td}/test1.bam", out, bed_regions=f"{td}/bed2.bed")
    assert fileio.are_equal(out, f"{td}/exp.hist.bed2.txt")


WIG_CASES = [
    ("test1.sam", "test1.wig", -1, False),
    ("test2.sam", "test2.wig", 30, False),
    ("test1.bam", "test1.wig", -1, False),
    ("test2.bam", "test2.wig", 30, False),
    ("test1.sam", "test1.withDel.wig", -1, True),
]


@pytest.mark.parametrize("infile,exp,frag,dels", WIG_CASES,
                         ids=[f"{c[0]}-{c[1]}" for c in WIG_CASES])
def test_sam_to_wig(tmp_path, infile, exp, frag, dels):
    td = f"{REF}/samToWig/testdata"
    out = str(tmp_path / "out.wig")
    sam_to_wig(f"{td}/{infile}", f"{td}/test.chrom.sizes", out,
               frag_length=frag, deletions=dels)
    assert fileio.are_equal(out, f"{td}/{exp}")
