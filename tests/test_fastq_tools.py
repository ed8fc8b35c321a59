"""Golden tests for fastqFilter / fastqFormat / fastqReplaceSeq
(reference cmd test tables; subSet<1 cases are Go-rand-dependent and
covered by property tests instead)."""

from gonomics_tpu import fileio
from gonomics_tpu.cli.fastq_filter import fastq_filter
from gonomics_tpu.cli.fastq_format import fastq_format
from gonomics_tpu.cli.fastq_replace_seq import fastq_replace_seq
from gonomics_tpu.io import fastq as fastqio

REF = "/root/reference/cmd"
FQ = "/root/reference/fastq/testdata"


def test_fastq_filter_read_write(tmp_path):
    out = str(tmp_path / "out.fastq")
    fastq_filter(in_file=f"{FQ}/test.fastq", out_file=out, set_seed=10)
    assert fileio.are_equal(
        out, f"{REF}/fastqFilter/testdata/expectedReadWrite.fastq")


def test_fastq_filter_paired_read_write(tmp_path):
    r1, r2 = str(tmp_path / "r1.fastq"), str(tmp_path / "r2.fastq")
    fastq_filter(r1_in=f"{FQ}/simReads_R1.fq", r2_in=f"{FQ}/simReads_R2.fq",
                 r1_out=r1, r2_out=r2, paired_end=True, set_seed=10)
    assert fileio.are_equal(
        r1, f"{REF}/fastqFilter/testdata/expectedR1ReadWrite.fastq")
    assert fileio.are_equal(
        r2, f"{REF}/fastqFilter/testdata/expectedR2ReadWrite.fastq")


def test_fastq_filter_umi_collapse(tmp_path):
    td = f"{REF}/fastqFilter/testdata"
    r1, r2 = str(tmp_path / "r1.fastq"), str(tmp_path / "r2.fastq")
    fastq_filter(r1_in=f"{td}/UmiTest_R1.fastq",
                 r2_in=f"{td}/UmiTest_R2.fastq", r1_out=r1, r2_out=r2,
                 paired_end=True, set_seed=10, collapse_umi=True)
    assert fileio.are_equal(r1, f"{td}/expectedUmi_R1.fastq")
    assert fileio.are_equal(r2, f"{td}/expectedUmi_R2.fastq")


def test_fastq_filter_names(tmp_path):
    td = f"{REF}/fastqFilter/testdata"
    out = str(tmp_path / "out.fastq")
    fastq_filter(in_file=f"{FQ}/test.fastq", out_file=out, set_seed=10,
                 retain_names_list=f"{td}/namesList.txt")
    assert fileio.are_equal(out, f"{td}/expectedNamesFilter.fastq")
    fastq_filter(in_file=f"{FQ}/test.fastq", out_file=out, set_seed=10,
                 discard_names_list=f"{td}/namesList.txt")
    assert fileio.are_equal(out, f"{td}/expectedDiscardNamesFilter.fastq")


def test_fastq_filter_keep_cells(tmp_path):
    td = f"{REF}/fastqFilter/testdata"
    r1, r2 = str(tmp_path / "r1.fastq"), str(tmp_path / "r2.fastq")
    fastq_filter(r1_in=f"{td}/UmiTest_R1.fastq",
                 r2_in=f"{td}/UmiTest_R2.fastq", r1_out=r1, r2_out=r2,
                 paired_end=True, set_seed=10,
                 keep_cells_list=f"{td}/keepCellsList.txt")
    assert fileio.are_equal(r1, f"{td}/expectedKeepCellsOut_R1.fastq")
    assert fileio.are_equal(r2, f"{td}/expectedKeepCellsOut_R2.fastq")


def test_fastq_filter_subset_property(tmp_path):
    a, b = str(tmp_path / "a.fastq"), str(tmp_path / "b.fastq")
    fastq_filter(in_file=f"{FQ}/test.fastq", out_file=a, set_seed=10,
                 subset=0.5)
    fastq_filter(in_file=f"{FQ}/test.fastq", out_file=b, set_seed=10,
                 subset=0.5)
    assert fileio.are_equal(a, b)
    assert len(fastqio.read(a)) <= len(fastqio.read(f"{FQ}/test.fastq"))


def test_fastq_format(tmp_path):
    td = f"{REF}/fastqFormat/testdata"
    r1, r2 = str(tmp_path / "r1.fastq"), str(tmp_path / "r2.fastq")
    fastq_format(f"{td}/TestR1.fastq", f"{td}/TestR2.fastq", r1, r2)
    assert fileio.are_equal(r1, f"{td}/ExpectedR1.fastq")
    assert fileio.are_equal(r2, f"{td}/ExpectedR2.fastq")


def test_fastq_replace_seq(tmp_path):
    td = f"{REF}/fastqReplaceSeq/testdata"
    out = str(tmp_path / "out.fastq")
    fastq_replace_seq(f"{td}/test1.fastq", f"{td}/findReplace1.txt", out,
                      ignore_case=False)
    assert fileio.are_equal(out, f"{td}/expected_allFile.fastq")
    fastq_replace_seq(f"{td}/test1.fastq", f"{td}/findReplace1.txt", out,
                      ignore_case=False, replaced_records_only=True)
    assert fileio.are_equal(out, f"{td}/expected_onlyReplaced.fastq")
