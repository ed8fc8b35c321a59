"""samToBed golden tests (reference cmd/samToBed)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.sam_to_bed import sam_to_bed

TD = "/root/reference/cmd/samToBed/testdata"


@pytest.mark.parametrize("infile,expected,frag",
                         [("test1.sam", "test1.bed", -1),
                          ("test2.sam", "test2.bed", 30)])
def test_sam_to_bed_golden(tmp_path, infile, expected, frag):
    out = str(tmp_path / "out.bed")
    sam_to_bed(f"{TD}/{infile}", out, frag)
    assert fileio.are_equal(out, f"{TD}/{expected}")
