"""bedFilter golden tests (reference cmd/bedFilter; the subSet case is
skipped — it depends on Go's seeded PRNG stream)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.bed_filter import bed_filter

TD = "/root/reference/cmd/bedFilter/testdata"

CASES = [
    ("test.bed", "expected.bed",
     dict(min_score=0, max_score=1000, min_length=3, max_length=1000,
          min_start=5, max_start=999999, min_end=10, max_end=1000010,
          chrom="chr1")),
    ("test.annotationFilter.bed", "expected.annotationFilter.bed",
     dict(min_annotation_float=-10, max_annotation_float=10)),
    ("test.annotationFilter.secondField.bed",
     "expected.annotationFilter.secondField.bed",
     dict(min_annotation_float=-10, max_annotation_float=10,
          annotation_filter_field=1)),
    ("test.nameFilter.bed", "expected.nameFilter.bed",
     dict(name_equals="NameMatch")),
    ("test.nameFilter.nonMatch.bed", "expected.nameFilter.nonMatch.bed",
     dict(name_not_equals="NameNonMatch")),
]


@pytest.mark.parametrize("infile,expected,kwargs", CASES,
                         ids=[c[1] for c in CASES])
def test_bed_filter_golden(tmp_path, infile, expected, kwargs):
    out = str(tmp_path / "out.bed")
    bed_filter(f"{TD}/{infile}", out, **kwargs)
    assert fileio.are_equal(out, f"{TD}/{expected}")


def test_bed_to_fasta_goldens(tmp_path):
    from gonomics_tpu.cli.bed_to_fasta import bed_to_fasta

    TD2 = "/root/reference/cmd/bedToFasta/testdata"
    out = str(tmp_path / "o.fa")
    bed_to_fasta(f"{TD2}/test.fa", f"{TD2}/test.bed", out)
    assert fileio.are_equal(out, f"{TD2}/expected.fa")
    bed_to_fasta(f"{TD2}/test.fa", f"{TD2}/test.bed", out, rev_comp=True)
    assert fileio.are_equal(out, f"{TD2}/expectedRevComp.fa")
