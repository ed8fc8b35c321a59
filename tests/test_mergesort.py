"""mergesort golden tests (reference cmd/mergesort/mergesort_test.go)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.mergesort import mergesort

TD = "/root/reference/cmd/mergesort/testdata"

CASES = [
    ("bedFileTest.bed", "expectedSortByCoord.bed", {}),
    ("small.sam", "expected.small.sam", {}),
    ("test.vcf", "expected.vcf", {}),
    ("test.axt", "expected.axt", {}),
    ("test_R1.fastq", "expected_R1.fastq", {}),
    ("small.sam", "expected.readName.sam", dict(criteria="readName")),
]


@pytest.mark.parametrize("infile,expected,kwargs", CASES,
                         ids=[c[1] for c in CASES])
def test_mergesort_golden(tmp_path, infile, expected, kwargs):
    out = str(tmp_path / ("out." + infile.split(".")[-1]))
    mergesort(f"{TD}/{infile}", out, **kwargs)
    assert fileio.are_equal(out, f"{TD}/{expected}")


def test_external_chunking(tmp_path):
    # force multiple spill files
    out = str(tmp_path / "out.bed")
    mergesort(f"{TD}/bedFileTest.bed", out, records_per_chunk=3)
    assert fileio.are_equal(out, f"{TD}/expectedSortByCoord.bed")
