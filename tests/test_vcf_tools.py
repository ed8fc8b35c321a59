"""VCF tool batch goldens: vcfInfo, vcfAncestorAnnotation, vcfAfs,
haplotypeGenerator, sampleVcf/proximityBlockVcf property tests."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.vcf_info import vcf_info
from gonomics_tpu.cli.vcf_sampling import (haplotype_generator,
                                           proximity_block_vcf,
                                           sample_vcf, vcf_afs,
                                           vcf_ancestor_annotation)
from gonomics_tpu.io import vcf as vcfio

REF = "/root/reference/cmd"


def test_vcf_info_types(tmp_path, monkeypatch):
    # the output embeds the input path, so run from the reference dir
    monkeypatch.chdir(f"{REF}/vcfInfo")
    out = str(tmp_path / "types.txt")
    vcf_info("testdata/test.vcf", types=out)
    assert fileio.are_equal(out, "testdata/expectedTypes.txt")
    out = str(tmp_path / "div.txt")
    vcf_info("testdata/test.vcf", divergence=out)
    assert fileio.are_equal(out, "testdata/expectedDiverge.txt")


def test_vcf_info_context(tmp_path, monkeypatch):
    monkeypatch.chdir(f"{REF}/vcfInfo")
    out = str(tmp_path / "ctx.txt")
    vcf_info("testdata/testContext.vcf", context=out,
             ref="testdata/test.fasta")
    assert fileio.are_equal(out, "testdata/expectedMergeComplements.txt")
    vcf_info("testdata/testContext.vcf", context=out,
             ref="testdata/test.fasta", include_complements=True)
    assert fileio.are_equal(out,
                            "testdata/expectedIncludeComplements.txt")


def test_vcf_ancestor_annotation(tmp_path):
    td = f"{REF}/vcfAncestorAnnotation/testdata"
    out = str(tmp_path / "out.vcf")
    vcf_ancestor_annotation(f"{td}/in.vcf", f"{td}/test.fa", out)
    assert fileio.are_equal(out, f"{td}/expected.vcf")


def test_vcf_afs(tmp_path):
    td = f"{REF}/vcfAfs/testdata"
    out = str(tmp_path / "afs.txt")
    vcf_afs(f"{td}/simulate.N100.S100.Seed19.Alpha0.01.vcf", out)
    assert fileio.are_equal(out, f"{td}/expected.afs.txt")
    vcf_afs(f"{td}/simulate.N100.S100.Seed19.Alpha0.01.vcf", out,
            include_ref=True)
    assert fileio.are_equal(out, f"{td}/expected.IncludeRef.afs.txt")


def test_haplotype_generator(tmp_path):
    td = f"{REF}/haplotypeGenerator/testdata"
    haplotype_generator(f"{td}/test.fa", f"{td}/test.vcf",
                        f"{td}/test.bed", str(tmp_path))
    assert fileio.are_equal(str(tmp_path / "CHR1.10.20.fa"),
                            f"{td}/outdir/expected.CHR1.10.20.fa")
    assert fileio.are_equal(str(tmp_path / "CHR1.35.45.fa"),
                            f"{td}/outdir/expected.CHR1.35.45.fa")
    haplotype_generator(f"{td}/test.fa", f"{td}/test.vcf",
                        f"{td}/test.bed", str(tmp_path),
                        include_ref=True)
    assert fileio.are_equal(
        str(tmp_path / "CHR1.10.20.fa"),
        f"{td}/outdir/expected.CHR1.10.20.includeRef.fa")


def test_sample_vcf_properties(tmp_path):
    td = f"{REF}/sampleVcf/testdata"
    a, b = str(tmp_path / "a.vcf"), str(tmp_path / "b.vcf")
    sample_vcf(f"{td}/babyTest.vcf", a, num_variants=2, num_samples=2,
               set_seed=11)
    sample_vcf(f"{td}/babyTest.vcf", b, num_variants=2, num_samples=2,
               set_seed=11)
    assert fileio.are_equal(a, b)
    records, header = vcfio.read(a)
    assert len(records) == 2
    assert all(len(r.samples) == 2 for r in records)
    assert len(vcfio.header_get_sample_list(header)) == 2


def test_proximity_block_vcf_properties(tmp_path):
    td = f"{REF}/proximityBlockVcf/testdata"
    out = str(tmp_path / "out.vcf")
    proximity_block_vcf(f"{td}/test.vcf", out, 10, set_seed=10)
    records, _ = vcfio.read(out)
    for i, a in enumerate(records):
        for b in records[i + 1:]:
            assert a.chrom != b.chrom or abs(a.pos - b.pos) >= 10
