"""bedpe/bedGraph IO + bedpeFilter/bedpeOverlap/bedGraphToWig goldens."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.bed_graph_to_wig import bed_graph_to_wig
from gonomics_tpu.cli.bedpe_filter import bedpe_filter
from gonomics_tpu.cli.bedpe_overlap import bedpe_overlap
from gonomics_tpu.io import bedpe as bedpeio

PK = "/root/reference/bed/bedpe/testdata"
FT = "/root/reference/cmd/bedpeFilter/testdata"
OV = "/root/reference/cmd/bedpeOverlap/testdata"
BG = "/root/reference/cmd/bedGraphToWig/testdata"


def test_bedpe_roundtrip(tmp_path):
    recs = bedpeio.read(f"{PK}/BedPeFileTest.bedpe")
    out = str(tmp_path / "o.bedpe")
    bedpeio.write(out, recs)
    assert fileio.are_equal(out, f"{PK}/BedPeFileTest.bedpe")


def test_contacts_to_midpoints(tmp_path):
    recs = bedpeio.read(f"{PK}/BedPeFileTest.bedpe")
    bedpeio.contacts_to_midpoints(recs)
    out = str(tmp_path / "o.bedpe")
    bedpeio.write(out, recs)
    assert fileio.are_equal(out, f"{PK}/expectedContactsMidpoints.bedpe")


FILTER = [
    ("testScoreFilter.bedpe", "expectedScore.bedpe",
     dict(min_score=6, chrom="chr1")),
    ("testDistanceFilter.bedpe", "expectedDistance.bedpe",
     dict(min_score=6, max_score=50, max_distance=100, max_start=50,
          chrom="chr1")),
    ("testStartFilter.bedpe", "expectedStart.bedpe",
     dict(max_score=50, max_distance=100, max_start=30, chrom="chr1")),
    ("testChromFilter.bedpe", "expectedChrom.bedpe",
     dict(max_score=50, max_distance=100, chrom="chr1")),
    ("testChromFilter.bedpe", "expectedInter.bedpe",
     dict(max_score=50, max_distance=100, chrom="chr1",
          only_inter_chrom=True)),
    ("testChromFilter.bedpe", "expectedIntra.bedpe",
     dict(max_score=50, max_distance=100, chrom="chr1",
          only_intra_chrom=True)),
]


@pytest.mark.parametrize("inp,exp,kw", FILTER, ids=[c[1] for c in FILTER])
def test_bedpe_filter(tmp_path, inp, exp, kw):
    out = str(tmp_path / "o.bedpe")
    bedpe_filter(f"{FT}/{inp}", out, **kw)
    assert fileio.are_equal(out, f"{FT}/{exp}")


OVERLAP = [
    ("selectBedPe.bedpe", "expected.bedpe", dict()),
    ("select.bed", "expected.bedSelect.bedpe", dict(bed_select=True)),
    ("select.names.bed", "expected.bedSelect.names.bedpe",
     dict(bed_select=True, keep_names=True)),
    ("select.bed", "expected.bedSelect.overlapThresh.bedpe",
     dict(bed_select=True, threshold=0.5)),
    ("selectBedBoth.bed", "expected.bedSelect.both.bedpe",
     dict(bed_select=True, overlap_both=True)),
    ("selectBedBothThresh.bed", "expected.bedSelect.both.bedpe",
     dict(bed_select=True, overlap_both=True, threshold=0.5)),
]


@pytest.mark.parametrize("sel,exp,kw", OVERLAP,
                         ids=[f"{c[0]}-{c[1]}" for c in OVERLAP])
def test_bedpe_overlap(tmp_path, sel, exp, kw):
    out = str(tmp_path / "o.bedpe")
    bedpe_overlap(f"{OV}/{sel}", f"{OV}/inBedPe.bedpe", out, **kw)
    assert fileio.are_equal(out, f"{OV}/{exp}")


def test_bed_graph_to_wig(tmp_path):
    out = str(tmp_path / "o.wig")
    bed_graph_to_wig(f"{BG}/test.bedGraph", f"{BG}/ref.chrom.sizes", out)
    assert fileio.are_equal(out, f"{BG}/bedGraphToWig.expected.wig")
