"""faFindFast golden tests against the reference testdata — the same
config table as cmd/faFindFast/faFindFast_test.go:12-147."""

import sys

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.fa_find_fast import fa_find_fast

TD = "/root/reference/cmd/faFindFast/testdata"
MAXF = sys.float_info.max

CASES = [
    ("test_indel.fa", "expected.bed",
     dict(first_query_name="Human", second_query_name="Chimp",
          window_size=10, ref_chrom_name="chr1")),
    ("test_indel.fa", "expected.noN.bed",
     dict(window_size=10, ref_chrom_name="chr1", remove_n=True)),
    ("test.endDoubleGaps.fa", "expected.bed",
     dict(first_query_name="Human", second_query_name="Gorilla",
          window_size=10, ref_chrom_name="chr1")),
    ("test.endGapsQuery.fa", "expected.endGapsQuery.bed",
     dict(first_query_name="Human", second_query_name="Chimp",
          window_size=10, ref_chrom_name="chr1")),
    ("test.endGapsRef.fa", "expected.endGapsRef.bed",
     dict(first_query_name="Human", second_query_name="Chimp",
          window_size=10, ref_chrom_name="chr1")),
    ("test.endGapsRef.fa", "expected.longOutput.bed",
     dict(first_query_name="Human", second_query_name="Chimp",
          window_size=10, ref_chrom_name="chr1", long_output=True,
          divergence_rate=0.01)),
    ("test_indel_3seq.fa", "expected_3seq.bed",
     dict(first_query_name="HumanFirstQuery",
          second_query_name="ChimpSecondQuery",
          window_size=10, ref_chrom_name="chr1")),
    ("test_indel_3seq.fa", "expected_alnPos.bed",
     dict(first_query_name="HumanFirstQuery",
          second_query_name="ChimpSecondQuery",
          window_size=10, ref_chrom_name="chr1", output_aln_pos=True)),
    ("test_indel_3seq.fa", "expected_longAndAlnPos.bed",
     dict(first_query_name="HumanFirstQuery",
          second_query_name="ChimpSecondQuery",
          window_size=10, ref_chrom_name="chr1", long_output=True,
          output_aln_pos=True, divergence_rate=MAXF)),
    ("test_gc.fa", "expected_gc.bed",
     dict(first_query_name="Human", second_query_name="Chimp",
          window_size=5, ref_chrom_name="chr1", gc_content=True)),
]


@pytest.mark.parametrize("infile,expected,kwargs",
                         CASES, ids=[c[1] + ":" + c[0] for c in CASES])
def test_fa_find_fast_golden(tmp_path, infile, expected, kwargs):
    out = str(tmp_path / "out.bed")
    fa_find_fast(f"{TD}/{infile}", out, **kwargs)
    assert fileio.are_equal(out, f"{TD}/{expected}"), (
        open(out).read(), open(f"{TD}/{expected}").read())
