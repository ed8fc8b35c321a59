"""multiFaToVcf golden tests (reference cmd/multiFaToVcf config table)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.multi_fa_to_vcf import multi_fa_to_vcf

TD = "/root/reference/cmd/multiFaToVcf/testdata"

CASES = [
    ("inputMulti.fa", "expected.vcf", {}),
    ("inputMulti.fa", "expectedSubOnly.vcf", dict(substitutions_only=True)),
    ("inputMulti.fa", "expectedRetainN.vcf", dict(retain_n=True)),
    ("inputStartWithGap.fa", "expectedStartGap.vcf", {}),
    ("inputAltStartWithGap.fa", "expectedAltStartsWithGap.vcf", {}),
    ("inputMultiSecondQueryName.fa", "expected.vcf",
     dict(second_query_name="HCA")),
]


@pytest.mark.parametrize("infile,expected,kwargs", CASES,
                         ids=[f"{c[1]}-{i}" for i, c in enumerate(CASES)])
def test_multi_fa_to_vcf_golden(tmp_path, infile, expected, kwargs):
    out = str(tmp_path / "out.vcf")
    multi_fa_to_vcf(f"{TD}/{infile}", "chr2", out, **kwargs)
    assert fileio.are_equal(out, f"{TD}/{expected}")


def test_three_way_fa_to_vcf(tmp_path):
    # convert_test.go TestThreeWayFaToVcf golden
    from gonomics_tpu import fileio
    from gonomics_tpu.cli.multi_fa_to_vcf import multi_fa_to_vcf

    td = "/root/reference/convert/testdata/threeWayFaToVcf"
    out = tmp_path / "out.vcf"
    multi_fa_to_vcf(f"{td}/input.fa", "chr1", str(out))
    # the reference library test writes records without a header; strip
    # the header lines our CLI adds before comparing
    got = [ln for ln in out.read_text().split("\n")
           if ln and not ln.startswith("#")]
    exp = [ln for ln in open(f"{td}/expected.vcf").read().split("\n")
           if ln and not ln.startswith("#")]
    assert got == exp
