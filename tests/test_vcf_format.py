"""vcfFormat golden tests (reference cmd/vcfFormat)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.vcf_format import vcf_format

TD = "/root/reference/cmd/vcfFormat/testdata"

CASES = [
    ("test.UCSC.vcf", "test.Ensembl.vcf", dict(ucsc_to_ensembl_flag=True)),
    ("test.Ensembl.vcf", "test.UCSC.vcf", dict(ensembl_to_ucsc_flag=True)),
    ("test.UCSC.vcf", "expected.noInfo.vcf", dict(clear_info=True)),
    ("test.broken.vcf", "expected.fixed.vcf",
     dict(fix=True, ref=f"{TD}/test.fa")),
    ("test_table.vcf", "table_expected.csv", dict(table_output=True)),
]


@pytest.mark.parametrize("inp,exp,kw", CASES,
                         ids=[c[1] for c in CASES])
def test_vcf_format_golden(tmp_path, inp, exp, kw):
    out = str(tmp_path / ("o.csv" if exp.endswith(".csv") else "o.vcf"))
    vcf_format(f"{TD}/{inp}", out, **kw)
    assert fileio.are_equal(out, f"{TD}/{exp}")
