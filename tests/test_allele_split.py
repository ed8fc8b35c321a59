"""alleleSplit: the reference ships no tests for this tool, so these are
property tests on a constructed F1 trio (cmd/alleleSplit/toSam.go)."""

import os

from gonomics_tpu.cli.allele_split import main, snp_search

VCF = """##fileformat=VCFv4.2
##contig=<ID=chr1,length=100>
#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tmomma\tpoppa\tkiddo
chr1\t10\t.\tA\tG\t100\tPASS\t.\tGT\t0/0\t1/1\t0/1
chr1\t20\t.\tC\tT\t100\tPASS\t.\tGT\t0/0\t1/1\t0/1
"""

SAM_HEADER = ("@HD\tVN:1.6\tSO:coordinate\n"
              "@SQ\tSN:chr1\tLN:100\n")

# read1 matches momma (A at pos 10, C at 20); read2 matches poppa (G, T);
# read3 is a tie (A at 10, T at 20) and is dropped.
READS = (
    "read1\t0\tchr1\t5\t60\t20M\t*\t0\t0\tTTTTTACGGTTTTTTCGGGG\tIIIIIIIIIIIIIIIIIIII\n"
    "read2\t0\tchr1\t5\t60\t20M\t*\t0\t0\tTTTTTGCGGTTTTTTTGGGG\tIIIIIIIIIIIIIIIIIIII\n"
    "read3\t0\tchr1\t5\t60\t20M\t*\t0\t0\tTTTTTACGGTTTTTTTGGGG\tIIIIIIIIIIIIIIIIIIII\n"
)


def _write_inputs(tmp_path):
    vcf = tmp_path / "trio.vcf"
    vcf.write_text(VCF)
    sam = tmp_path / "aln.sam"
    sam.write_text(SAM_HEADER + READS)
    return str(sam), str(vcf)


def test_snp_search_splits_by_parent(tmp_path, monkeypatch):
    sam, vcf = _write_inputs(tmp_path)
    monkeypatch.chdir(tmp_path)
    snp_search(sam, vcf, "kiddo", "momma", "poppa", "kiddo")
    momma = open("kiddo.momma.SNPs.sam").read()
    poppa = open("kiddo.poppa.SNPs.sam").read()
    assert "read1" in momma and "read2" not in momma
    assert "read2" in poppa and "read1" not in poppa
    assert "read3" not in momma and "read3" not in poppa
    assert momma.startswith("@HD")


def test_samples_mode(tmp_path, capsys):
    _, vcf = _write_inputs(tmp_path)
    main(["-samples", vcf])
    assert capsys.readouterr().out == "momma\npoppa\nkiddo\n"
