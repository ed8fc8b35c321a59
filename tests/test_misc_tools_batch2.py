"""Golden tests for intervalSubsetMatrix, scCount, slurmCheck,
bamTagToReadGroup (reference cmd test tables)."""

import os

from gonomics_tpu import fileio
from gonomics_tpu.cli.interval_subset_matrix import interval_subset_matrix
from gonomics_tpu.cli.sc_count import sc_count
from gonomics_tpu.cli.slurm_check import parse_the_input, first_line_report
from gonomics_tpu.cli.bam_tag_to_read_group import bam_tag_to_read_group
from gonomics_tpu.io import sam as samio

REF = "/root/reference/cmd"


def test_interval_subset_matrix(tmp_path):
    # cmd/intervalSubsetMatrix/intervalSubsetMatrix_test.go:11-27 table;
    # file-list paths are relative to the reference cmd dir.
    cwd = os.getcwd()
    os.chdir(f"{REF}/intervalSubsetMatrix")
    try:
        cases = [
            ("testdata/files.list", False, "", "expected.txt", ""),
            ("testdata/files.fraction1.list", True, "",
             "expected.fraction1.txt", ""),
            ("testdata/files.fraction2.list", True, "",
             "expected.fraction2.txt", ""),
            ("testdata/files.fraction3.list", False, "",
             "expected.noFraction2.txt", ""),
            ("testdata/files.fraction3.list", True, "",
             "expected.fraction3.txt", ""),
            ("testdata/files.fraction3.list", True,
             str(tmp_path / "multi.txt"), "expected.fraction3.txt",
             "expected.fraction3.multipleOverlaps.txt"),
        ]
        for files, fraction, multi, expected, expected_multi in cases:
            out = str(tmp_path / "out.txt")
            interval_subset_matrix("testdata/union.bed", files, out,
                                   fraction=fraction,
                                   mark_multiple_overlaps=multi)
            assert fileio.are_equal(out, f"testdata/{expected}")
            if multi:
                assert fileio.are_equal(multi, f"testdata/{expected_multi}")
    finally:
        os.chdir(cwd)


def test_sc_count(tmp_path):
    td = f"{REF}/scCount/testdata"
    out = str(tmp_path / "out.tsv")
    sc_count(f"{td}/test.sam", f"{td}/test.gtf", out)
    assert fileio.are_equal(out, f"{td}/expected.tsv")
    sc_count(f"{td}/test.sam", f"{td}/test.gtf", out,
             exp_normalization_file=f"{td}/norm.tsv")
    assert fileio.are_equal(out, f"{td}/expected.norm.tsv")


def test_slurm_check(tmp_path):
    td = f"{REF}/slurmCheck/testdata"
    parsed = parse_the_input(f"{td}/inputFancyFile.txt")
    out = tmp_path / "out.txt"
    out.write_text(first_line_report(parsed))
    assert fileio.are_equal(str(out),
                            f"{td}/expectedOutputParseTheInput.txt")


def test_bam_tag_to_read_group(tmp_path):
    # Record-level parity with the reference's checked-in output.bam
    # (header + per-record RG assignment), not byte-level: BAM block
    # framing differs.
    td = f"{REF}/bamTagToReadGroup/testdata"
    out = str(tmp_path / "out.bam")
    bam_tag_to_read_group(f"{td}/tagTest.bam", out, "CB",
                          f"{td}/tagTestValues.txt")
    got_h, got = samio.read(out)
    want_h, want = samio.read(f"{td}/output.bam")
    assert [ln for ln in got_h.text if ln.startswith("@RG")] == \
        [ln for ln in want_h.text if ln.startswith("@RG")]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        samio.parse_extra(g)
        samio.parse_extra(w)
        assert g.qname == w.qname
        g_rg = [f for f in g.extra.split("\t") if f.startswith("RG:")]
        w_rg = [f for f in w.extra.split("\t") if f.startswith("RG:")]
        assert g_rg == w_rg
