"""liftCoordinates golden tests (reference cmd/liftCoordinates)."""

from gonomics_tpu.cli.lift_coordinates import lift_coordinates
from gonomics_tpu.io import bed as bedio
from gonomics_tpu.io import vcf as vcfio

TD = "/root/reference/cmd/liftCoordinates/testdata"


def _vcf_equal(a_path, b_path):
    a, _ = vcfio.read(a_path)
    b, _ = vcfio.read(b_path)
    return len(a) == len(b) and all(x.to_string() == y.to_string()
                                    for x, y in zip(a, b))


def test_lift_vcf_with_fasta_check(tmp_path):
    out = str(tmp_path / "o.vcf")
    lift_coordinates(f"{TD}/test.chain", f"{TD}/input.vcf", out,
                     str(tmp_path / "un"), fa_file=f"{TD}/test.fa")
    assert _vcf_equal(out, f"{TD}/expected.vcf")


def test_lift_vcf_swap_ab(tmp_path):
    out = str(tmp_path / "o.vcf")
    lift_coordinates(f"{TD}/test.chain", f"{TD}/input_swapAB.vcf", out,
                     str(tmp_path / "un"), fa_file=f"{TD}/test.fa",
                     swap_ab=True)
    assert _vcf_equal(out, f"{TD}/expected_swapAB.vcf")


def test_lift_bed(tmp_path):
    out = str(tmp_path / "o.bed")
    lift_coordinates(f"{TD}/test.chain", f"{TD}/input.bed", out,
                     str(tmp_path / "un"))
    got = bedio.read(out)
    want = bedio.read(f"{TD}/expected.bed")
    assert [b.to_string() for b in got] == [b.to_string() for b in want]


def test_lift_agrees_with_ucsc_liftover(tmp_path):
    out = str(tmp_path / "o.bed")
    lift_coordinates(f"{TD}/hg19ToHg38.over.chain",
                     f"{TD}/Pollard.HARs.hg19.trimmed.bed", out,
                     str(tmp_path / "un"))
    got = {b.name: b for b in bedio.read(out)}
    ucsc = {b.name: b for b in
            bedio.read(f"{TD}/Pollard.HARs.hg38.UCSC.trimmed.bed")}
    shared = set(got) & set(ucsc)
    assert shared
    for n in shared:
        assert (got[n].chrom, got[n].chrom_start, got[n].chrom_end) == \
            (ucsc[n].chrom, ucsc[n].chrom_start, ucsc[n].chrom_end)
