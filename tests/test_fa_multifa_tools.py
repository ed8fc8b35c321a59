"""Golden tests for the FASTA/multiFa CLI batch (reference cmd/* config
tables): faInfo, faUniq, catMultiFa, multiFaCount, multiFaExtract,
multiFaReduce, mergeMultiFa, multiFaSequenceSwap, faBin, randSeq,
locateCG, countPairOfBases."""

import os

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.cat_multi_fa import cat_multi_fa
from gonomics_tpu.cli.count_pair_of_bases import count_pair_of_bases
from gonomics_tpu.cli.fa_bin import fa_bin
from gonomics_tpu.cli.fa_info import fa_info
from gonomics_tpu.cli.fa_uniq import fa_uniq
from gonomics_tpu.cli.locate_cg import compare_cg, locate_cg
from gonomics_tpu.cli.merge_multi_fa import merge_multi_fa
from gonomics_tpu.cli.multi_fa_count import multi_fa_count
from gonomics_tpu.cli.multi_fa_extract import multi_fa_extract
from gonomics_tpu.cli.multi_fa_reduce import mfa_reduce
from gonomics_tpu.cli.multi_fa_sequence_swap import multi_fa_sequence_swap
from gonomics_tpu.cli.rand_seq import rand_seq
from gonomics_tpu.io import fasta as fastaio

REF = "/root/reference/cmd"


def test_fa_info(tmp_path):
    out = str(tmp_path / "out.txt")
    fa_info(f"{REF}/faInfo/testdata/input.fa", out)
    assert fileio.are_equal(out, f"{REF}/faInfo/testdata/expected.fa")


def test_fa_uniq(tmp_path):
    out = str(tmp_path / "out.fa")
    fa_uniq(f"{REF}/faUniq/testdata/test_in.fa", out)
    assert fileio.are_equal(out, f"{REF}/faUniq/testdata/expected_out.fa")


def test_cat_multi_fa(tmp_path):
    td = f"{REF}/catMultiFa/testdata"
    out = str(tmp_path / "out.fa")
    cat_multi_fa([f"{td}/file1.fa", f"{td}/file2.fa", f"{td}/file3.fa"],
                 out)
    assert fileio.are_equal(out, f"{td}/expected.fa")


MFA_COUNT = [
    ("testInput.fa", "gibbon", False, False, "", "", "expected.txt"),
    ("testInput.fa", "orangutan", False, False, "", "", "expected2.txt"),
    ("testInput.fa", "gibbon", True, False, "orangutan", "",
     "expected3.txt"),
    ("testInput2.fa", "gorilla", False, True, "orangutan", "gibbon",
     "expected4.txt"),
]


@pytest.mark.parametrize("infile,q,both,either,q2,q3,exp", MFA_COUNT,
                         ids=[c[-1] for c in MFA_COUNT])
def test_multi_fa_count(tmp_path, infile, q, both, either, q2, q3, exp):
    td = f"{REF}/multiFaCount/testdata"
    out = str(tmp_path / "out.txt")
    multi_fa_count(f"{td}/{infile}", out, q, both=both, either=either,
                   second=q2, third=q3)
    assert fileio.are_equal(out, f"{td}/{exp}")


def test_multi_fa_extract(tmp_path):
    td = f"{REF}/multiFaExtract/testdata"
    out = str(tmp_path / "out.fa")
    multi_fa_extract(f"{td}/testInput.fa", out, start=10, end=200)
    assert fileio.are_equal(out, f"{td}/testOut.10to200.fa")
    multi_fa_extract(f"{td}/testInput.fa", out, start=10, end=200,
                     remove_gaps=True)
    assert fileio.are_equal(out, f"{td}/testOut.10to200.RemoveGaps.fa")


def test_multi_fa_extract_bed(tmp_path):
    td = f"{REF}/multiFaExtract/testdata"
    for gaps, suffix in ((False, ""), (True, ".noGap")):
        multi_fa_extract(f"{td}/testInput.fa", bed_file=f"{td}/test.bed",
                         remove_gaps=gaps, out_dir=str(tmp_path))
        for region in ("chr1.20.30", "chr1.30.50", "chr1.60.200"):
            assert fileio.are_equal(str(tmp_path / f"{region}.fa"),
                                    f"{td}/{region}.expected{suffix}.fa")


MFA_REDUCE = [
    ("test.mfa", "expected.mfa", "", 0, ""),
    ("test.mfa", "expected.mfa", "chrTest", 0, "expected.bed"),
    ("test2.mfa", "expected2.mfa", "chrTest", 0, "expected2.bed"),
    ("test3.mfa", "expected3.mfa", "chrTest", 0, "expected3.bed"),
    ("test4.mfa", "expected4.mfa", "chrTest", 0, "expected4.bed"),
    ("test5.mfa", "expected5.mfa", "chrTest", 0, "expected5.bed"),
    ("test6.mfa", "expected6.mfa", "chrTest", 0, "expected6.bed"),
    ("test5.mfa", "expected5.mfa", "chrTest", 1000000, "expected7.bed"),
]


@pytest.mark.parametrize("infile,exp,chrom,ref_start,exp_bed", MFA_REDUCE,
                         ids=[f"{c[0]}-{c[4] or 'nobed'}" for c in
                              MFA_REDUCE])
def test_multi_fa_reduce(tmp_path, infile, exp, chrom, ref_start, exp_bed):
    td = f"{REF}/multiFaReduce/testdata"
    out = str(tmp_path / "out.mfa")
    out_bed = str(tmp_path / "out.bed") if exp_bed else ""
    mfa_reduce(f"{td}/{infile}", out, out_bed, chrom, ref_start)
    assert fileio.are_equal(out, f"{td}/{exp}")
    if exp_bed:
        assert fileio.are_equal(out_bed, f"{td}/{exp_bed}")


def test_merge_multi_fa(tmp_path):
    td = f"{REF}/mergeMultiFa/testdata"
    out = str(tmp_path / "out.fa")
    merge_multi_fa(f"{td}/testA.fa", f"{td}/testB.fa", out)
    assert fileio.are_equal(out, f"{td}/expected.out.fa")


SWAP = [
    ("test.fa", "swapRegionsTest.bed", "Seq4", "Seq3", "chr1",
     "expectedSwap.fa"),
    ("testWithIndels.fa", "swapWithIndels.bed", "hg38", "hca", "chr1",
     "expected.SwapWithIndel.fa"),
    ("test.fa", "swapWithChrom.bed", "Seq1", "Seq2", "chr1",
     "expected.SwapWithChrom.fa"),
]


@pytest.mark.parametrize("infile,bedfile,bg,fg,chrom,exp", SWAP,
                         ids=[c[-1] for c in SWAP])
def test_multi_fa_sequence_swap(tmp_path, infile, bedfile, bg, fg, chrom,
                                exp):
    td = f"{REF}/multiFaSequenceSwap/testdata"
    out = str(tmp_path / "out.fa")
    multi_fa_sequence_swap(f"{td}/{infile}", f"{td}/{bedfile}", bg, fg,
                           chrom, out)
    assert fileio.are_equal(out, f"{td}/{exp}")


def test_fa_bin(tmp_path):
    genome = f"{REF}/faBin/testdata/testGenome.fa"
    fa_bin(genome, str(tmp_path), 0, 6, "")
    assert os.path.exists(tmp_path / "chr1.fa")
    assert os.path.exists(tmp_path / "testGenome.bin1.fa")
    n_records = sum(
        len(fastaio.read(str(tmp_path / f)))
        for f in ("chr1.fa", "testGenome.bin1.fa"))
    assert n_records == len(fastaio.read(genome))
    fa_bin(genome, str(tmp_path), 2, -1, "")
    assert os.path.exists(tmp_path / "testGenome.bin0.fa")


def test_rand_seq_reproducible(tmp_path):
    a, b = str(tmp_path / "a.fa"), str(tmp_path / "b.fa")
    rand_seq(a, num_seq=3, len_seq=100, set_seed=7)
    rand_seq(b, num_seq=3, len_seq=100, set_seed=7)
    assert fileio.are_equal(a, b)
    recs = fastaio.read(a)
    assert len(recs) == 3 and all(len(r.seq) == 100 for r in recs)


def test_locate_cg(tmp_path):
    td = f"{REF}/locateCG/testdata"
    out = str(tmp_path / "out.bed")
    locate_cg(f"{td}/single_genome_test.fa", "chr8", out)
    assert fileio.are_equal(out, f"{td}/single_genome_expected.bed")
    for cg_type in ("gain", "loss", "cons"):
        out = str(tmp_path / f"{cg_type}.txt")
        compare_cg(f"{td}/twogenome_compare_test.fa", "chr8", out, cg_type)
        assert fileio.are_equal(out, f"{td}/twogenome_{cg_type}_expected"
                                     ".txt")


PAIR = [
    ("singlegenome/chr1.fa", "chr1", "", False,
     "single_genome_chr1expected.txt"),
    ("singlegenome/chr11.fa", "chr11", "", False,
     "single_genome_chr11expected.txt"),
    ("singlegenome/chr1.fa", "chr1", "single_genome_chr1test.bed", False,
     "single_genome_chr1bedExpected.bed"),
    ("singlegenome/chr11.fa", "chr11", "single_genome_chr11test.bed",
     False, "single_genome_chr11bedExpected.bed"),
    ("twogenome/chr1.fa", "chr1", "", True, "two_genome_chr1expected.txt"),
    ("twogenome/chr14.fa", "chr14", "", True,
     "two_genome_chr14expected.txt"),
    ("twogenome/chr1.fa", "chr1", "two_genome_chr1test.bed", True,
     "two_genome_chr1bedExpected.txt"),
    ("twogenome/chr14.fa", "chr14", "two_genome_chr14test.bed", True,
     "two_genome_chr14bedExpected.txt"),
]


@pytest.mark.parametrize("infile,chrom,bedfile,compare,exp", PAIR,
                         ids=[c[-1] for c in PAIR])
def test_count_pair_of_bases(tmp_path, infile, chrom, bedfile, compare,
                             exp):
    td = f"{REF}/countPairOfBases/testdata"
    out = str(tmp_path / "out.txt")
    count_pair_of_bases(f"{td}/{infile}", chrom, "C", "G", out,
                        bed_file=f"{td}/{bedfile}" if bedfile else "",
                        compare=compare)
    assert fileio.are_equal(out, f"{td}/{exp}")
