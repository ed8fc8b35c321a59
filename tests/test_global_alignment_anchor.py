"""globalAlignmentAnchor goldens
(reference cmd/globalAlignmentAnchor/globalAlignmentAnchor_test.go)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.global_alignment_anchor import global_alignment_anchor

TD = "/root/reference/cmd/globalAlignmentAnchor/testdata"


@pytest.mark.parametrize("limit,case", [(10_000_000_000, 1), (99, 2)])
def test_global_alignment_anchor(tmp_path, limit, case):
    prefix = str(tmp_path / f"out_{case}")
    global_alignment_anchor(
        f"{TD}/in_hg38_vs_rheMac10.toy.maf", "hg38", "rheMac10",
        f"{TD}/hg38.toy.fa", f"{TD}/rheMac10.toy.fa", limit,
        f"{TD}/hg38_vs_rheMac10_chrMap.txt", prefix, True)
    assert fileio.are_equal(
        prefix + ".filtered.maf",
        f"{TD}/in_hg38_vs_rheMac10.toy.filtered.12.expected.maf")
    assert fileio.are_equal(prefix + ".alignment.tsv",
                            f"{TD}/out_alignment.{case}.expected.tsv")
    assert fileio.are_equal(
        prefix + "_hg38_alignment.bed",
        f"{TD}/out_hg38_alignment.{case}.expected.bed")
    assert fileio.are_equal(
        prefix + "_rheMac10_alignment.bed",
        f"{TD}/out_rheMac10_alignment.{case}.expected.bed")
