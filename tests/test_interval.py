"""interval package + intervalOverlap golden tests
(reference cmd/intervalOverlap/intervalOverlap_test.go)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.interval_overlap import interval_overlap
from gonomics_tpu.interval import IntervalIndex
from gonomics_tpu.io.bed import Bed

TD = "/root/reference/cmd/intervalOverlap/testdata"

CASES = [
    ("test.vcf", "test.bed", "expected.bed", {}),
    ("test.vcf", "test.bed", "expected.mergedOutput.bed",
     dict(merged_output=True)),
    ("test.vcf", "test.bed", "expected.nonOverlap.bed",
     dict(non_overlap=True)),
    ("test2.bed", "test.bed", "expected.threshold.bed",
     dict(threshold_overlap=0.5)),
]


@pytest.mark.parametrize("select,infile,expected,kwargs", CASES,
                         ids=[c[2] for c in CASES])
def test_interval_overlap_golden(tmp_path, select, infile, expected, kwargs):
    out = str(tmp_path / "out.bed")
    interval_overlap(f"{TD}/{select}", f"{TD}/{infile}", out, **kwargs)
    assert fileio.are_equal(out, f"{TD}/{expected}")


def test_allen_relationships():
    sel = [Bed("c", 10, 20), Bed("c", 20, 30), Bed("c", 5, 40),
           Bed("c", 10, 30)]
    idx = IntervalIndex(sel)
    q = Bed("c", 10, 30)
    assert [(b.chrom_start, b.chrom_end) for b in idx.query(q, "equal")] \
        == [(10, 30)]
    # "m" in the reference's inclusive-coordinate transform: target's
    # last base equals the query's first base (relationship.go:56)
    got = idx.query(Bed("c", 19, 35), "m")
    assert [(b.chrom_start, b.chrom_end) for b in got] == [(10, 20)]
    # "within": targets entirely inside the query
    got = idx.query(Bed("c", 5, 40), "within")
    spans = sorted((b.chrom_start, b.chrom_end) for b in got)
    assert spans == [(5, 40), (10, 20), (10, 30), (20, 30)]
    # "any" finds everything overlapping
    got = idx.query(Bed("c", 19, 21), "any")
    assert len(got) == 4
