"""vcfToFa golden tests (reference cmd/vcfToFa)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.vcf_to_fa import vcf_to_fa, vcf_to_multi_fa

TD = "/root/reference/cmd/vcfToFa/testdata"

MULTI = [
    ("expectedMultiNoAlt.fa",
     dict(use_alt=False, use_samples=True, haploid=True,
          chrom_name="chr1")),
    ("expectedMultiAlt.fa",
     dict(use_alt=True, use_samples=False, haploid=False,
          chrom_name="chr1")),
    ("expectedMultiAltchr2.fa",
     dict(use_alt=True, use_samples=False, haploid=False,
          chrom_name="chr2")),
]


@pytest.mark.parametrize("exp,kw", MULTI, ids=[c[0] for c in MULTI])
def test_vcf_to_multi_fa(tmp_path, exp, kw):
    out = str(tmp_path / "o.fa")
    vcf_to_multi_fa(f"{TD}/testMultiInput.vcf", f"{TD}/testMultiInput.fa",
                    out, **kw)
    assert fileio.are_equal(out, f"{TD}/{exp}")


def test_vcf_to_fa_plain(tmp_path):
    out = str(tmp_path / "o.fa")
    vcf_to_fa(f"{TD}/testInput.vcf", f"{TD}/testInput.fa", out, True)
    assert fileio.are_equal(out, f"{TD}/expected.fa")
