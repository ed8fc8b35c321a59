"""faFormat golden tests (reference cmd/faFormat/faFormat_test.go)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.fa_format import fa_format

TD = "/root/reference/cmd/faFormat/testdata"


def test_trim_upper_nogaps_nogapbed(tmp_path):
    out = str(tmp_path / "o.fa")
    nb = str(tmp_path / "ng.bed")
    fa_format(f"{TD}/faFormatTest.fa", out, trim_name=True, to_upper=True,
              no_gaps=True, no_gap_bed=nb)
    assert fileio.are_equal(out, f"{TD}/faFormatExpected.fa")
    assert fileio.are_equal(nb, f"{TD}/expected.NoGap.bed")


def test_names_filter(tmp_path):
    out = str(tmp_path / "o.fa")
    fa_format(f"{TD}/faFormatTest.fa", out,
              names_file=f"{TD}/fastaNames.txt", trim_name=True,
              to_upper=True)
    assert fileio.are_equal(out, f"{TD}/faFormatNamesExpected.fa")


def test_revcomp(tmp_path):
    out = str(tmp_path / "o.fa")
    fa_format(f"{TD}/revCompTest.fa", out, rev_comp=True)
    assert fileio.are_equal(out, f"{TD}/revCompExpected.fa")


def test_revcomp_names(tmp_path):
    out = str(tmp_path / "o.fa")
    fa_format(f"{TD}/revCompTest.fa", out,
              names_file=f"{TD}/fastaNames.txt", rev_comp=True)
    assert fileio.are_equal(out, f"{TD}/revCompNamesExpected.fa")


def test_mask_invalid(tmp_path):
    out = str(tmp_path / "o.fa")
    fa_format(f"{TD}/maskInput.fa", out, line_length=19, mask_invalid=True)
    assert fileio.are_equal(out, f"{TD}/maskExpected.fa")


def test_multifa_nogap_bed(tmp_path):
    out = str(tmp_path / "o.fa")
    nb = str(tmp_path / "mng.bed")
    fa_format(f"{TD}/multiFaGaps.fa", out, multi_fa_no_gap_bed=nb,
              query_seq_name="hca", chrom_name="chr1")
    assert fileio.are_equal(out, f"{TD}/expected.multiFaGaps.fa")
    assert fileio.are_equal(nb, f"{TD}/expected.multiFaNoGap.bed")


def test_rename(tmp_path):
    out = str(tmp_path / "o.fa")
    fa_format(f"{TD}/faFormatTest.fa", out, rename="NoGapTest,RenamedField")
    assert fileio.are_equal(out, f"{TD}/expected.Rename.fa")
