"""simulate CLI batch: simulatePcr goldens, seeded-property tests for
simulateBed / simulateVcf / simulateDivergentWindowsVcf."""

from gonomics_tpu import fileio
from gonomics_tpu.cli.simulate_tools import (simulate_bed,
                                             simulate_divergent_windows_vcf,
                                             simulate_pcr, simulate_vcf)
from gonomics_tpu.io import bed as bedio
from gonomics_tpu.io import vcf as vcfio

REF = "/root/reference/cmd"


def test_simulate_pcr_goldens(tmp_path, capsys):
    td = f"{REF}/simulatePcr/testdata"
    b, fq = str(tmp_path / "out.bed"), str(tmp_path / "out.fastq")
    simulate_pcr(["GCCTCCGTGAGGCTAC", "TTGAGGATCTTTTCTTCACG"],
                 f"{td}/test.fasta", b, fq, 1000, include_primer=False)
    assert fileio.are_equal(b, f"{td}/expected1.bed")
    assert fileio.are_equal(fq, f"{td}/expected1.fastq")
    simulate_pcr(["ATG"], f"{td}/test.fasta", b, fq, 1000,
                 include_primer=True)
    assert fileio.are_equal(b, f"{td}/expected2.bed")
    assert fileio.are_equal(fq, f"{td}/expected2.fastq")


def test_simulate_bed_properties(tmp_path):
    td = f"{REF}/simulateBed/testdata" if False else None
    no_gap = str(tmp_path / "nogap.bed")
    with open(no_gap, "w") as f:
        f.write("chr1\t0\t10000\nchr2\t100\t600\n")
    a, b = str(tmp_path / "a.bed"), str(tmp_path / "b.bed")
    simulate_bed(20, 100, "", no_gap, a, set_seed=5)
    simulate_bed(20, 100, "", no_gap, b, set_seed=5)
    assert fileio.are_equal(a, b)
    records = bedio.read(a)
    assert len(records) == 20
    for r in records:
        assert r.chrom_end - r.chrom_start == 100
        if r.chrom == "chr1":
            assert 0 <= r.chrom_start and r.chrom_end <= 10000
        else:
            assert 100 <= r.chrom_start and r.chrom_end <= 600


def test_simulate_vcf_properties(tmp_path):
    out = str(tmp_path / "out.vcf")
    simulate_vcf(out, num_sites=5, num_alleles=10, set_seed=3)
    records, _ = vcfio.read(out)
    assert len(records) == 5
    for v in records:
        assert v.ref == "A" and v.alt == ["T"]
        assert "AA=" in v.info
        n = sum(1 for s in v.samples for a in s.alleles if a >= 0)
        i = sum(a for s in v.samples for a in s.alleles if a > 0)
        assert 0 < i < n  # segregating


def test_simulate_vcf_with_ref(tmp_path):
    ref = str(tmp_path / "ref.fa")
    with open(ref, "w") as f:
        f.write(">chrA\n" + "ACGT" * 50 + "\n")
    out = str(tmp_path / "out.vcf")
    simulate_vcf(out, num_sites=5, num_alleles=8, set_seed=7,
                 ref_file=ref)
    records, _ = vcfio.read(out)
    assert len(records) == 5
    seq = "ACGT" * 50
    for v in records:
        assert v.chrom == "chrA"
        assert v.ref == seq[v.pos - 1]
        assert v.alt[0] != v.ref


def test_simulate_divergent_windows(tmp_path):
    lo, hi = str(tmp_path / "lo.vcf"), str(tmp_path / "hi.vcf")
    simulate_divergent_windows_vcf(lo, hi, num_total_sites=20,
                                   num_window_sites=5, num_windows=10,
                                   set_seed=9)
    lo_rec, _ = vcfio.read(lo)
    hi_rec, _ = vcfio.read(hi)
    assert len(lo_rec) == 5 * 1      # lower 10% of 10 windows = 1
    assert len(hi_rec) == 5 * 1      # upper from index 9 = 1 window


def test_simulate_bed_reference_goldens(tmp_path):
    # byte-exact vs cmd/simulateBed goldens (Go rand stream via gorand)
    td = f"{REF}/simulateBed/testdata"
    out = str(tmp_path / "out.bed")
    simulate_bed(10, 1000, "", f"{td}/test.noGap.bed", out, set_seed=10)
    assert fileio.are_equal(out, f"{td}/expected.bed")
    out2 = str(tmp_path / "out2.bed")
    simulate_bed(0, 0, f"{td}/expected.bed", f"{td}/test.noGap.bed", out2,
                 set_seed=10)
    assert fileio.are_equal(out2, f"{td}/expected.matched.bed")


def test_simulate_vcf_reference_goldens(tmp_path):
    # byte-exact vs cmd/simulateVcf goldens (all three configs)
    td = f"{REF}/simulateVcf/testdata"
    out = str(tmp_path / "o.vcf")
    simulate_vcf(out, alpha=4, num_alleles=100, num_sites=100,
                 set_seed=11)
    assert fileio.are_equal(out, f"{td}/expected.vcf")
    simulate_vcf(out, alpha=4, num_alleles=100, num_sites=10, set_seed=11,
                 ref_file=f"{td}/refFa_short.fasta")
    assert fileio.are_equal(out, f"{td}/expected_2.vcf")
    simulate_vcf(out, alpha=4, num_alleles=100, num_sites=20, set_seed=29,
                 ref_file=f"{td}/refFa_short.fasta")
    assert fileio.are_equal(out, f"{td}/expected_3.vcf")


def test_rand_seq_reference_goldens(tmp_path):
    from gonomics_tpu.cli.rand_seq import rand_seq

    td = f"{REF}/randSeq/testdata"
    out = str(tmp_path / "rs.fa")
    for exp, gc, n, ln in [("expected.fa", 0.41, 10, 500),
                           ("expectedHighGC.fa", 0.60, 10, 500),
                           ("expectedShort.fa", 0.41, 10, 20),
                           ("expectedNumSeq.fa", 0.41, 3, 500)]:
        rand_seq(out, gc, n, ln, 10)
        assert fileio.are_equal(out, f"{td}/{exp}")
