"""Golden tests for pFaTools (entropyTrack, extract, extractBed,
visualize, visualize -tsvOut, faToPfa, vcfToPfa), pfaFindFast, and the
browser visualizers (reference cmd/library test tables)."""

import numpy as np

from gonomics_tpu import browser, fileio
from gonomics_tpu.cli import pfa_tools
from gonomics_tpu.cli.mult_fa_visualizer import main as mult_fa_vis_main
from gonomics_tpu.cli.mult_fa_visualize_beds import mult_fa_visualize_beds
from gonomics_tpu.cli.pfa_find_fast import pfa_find_fast
from gonomics_tpu.io import fasta as fastaio
from gonomics_tpu.io import pfasta

REF = "/root/reference"
TD = f"{REF}/cmd/pFaTools/testdata"


def test_entropy_track(tmp_path):
    out = str(tmp_path / "out.wig")
    pfa_tools.entropy_track(f"{TD}/test_sample_input.pfa", out,
                            default_value=-1)
    assert fileio.are_equal(out, f"{TD}/expected.EntropyTrack.wig")


def test_pfa_extract(tmp_path):
    out = str(tmp_path / "out.pfa")
    pfa_tools.pfa_extract(f"{TD}/test_extract_input.pfa", "chr1", 1, 3, out,
                          out_name="testChr1")
    got = pfasta.read(out)
    want = pfasta.read(f"{TD}/test_extract_expected.pfa")
    assert pfasta.all_are_equal(got, want, 1e-3)


def test_pfa_extract_bed(tmp_path):
    for i in range(2):
        out = str(tmp_path / f"out{i}.pfa")
        pfa_tools.pfa_extract_bed(f"{TD}/test_extractbed_input_{i}.pfa",
                                  f"{TD}/test_extractbed_input_region_{i}.bed",
                                  out, take_coords=(i == 1))
        got = pfasta.read(out)
        want = pfasta.read(f"{TD}/test_extractbed_expected_{i}.pfa")
        assert pfasta.all_are_equal(got, want, 1e-3)


def test_pfa_visualize(tmp_path):
    # cmd/pFaTools/pFaTools_test.go visualizeTests table.
    cases = [
        ("test_visualize_input_1.pfa", 0, 15, 0, 5, 50,
         "chr1butrllllllylong", False, False,
         "test_visualize_expected_default.txt"),
        ("test_visualize_input_1.pfa", 0, -1, 0, 15, 10,
         "chr1butrllllllylong", True, True, "test_visualize_expected_1.txt"),
        ("test_visualize_input_1.pfa", 0, 20, 0, 4, 7,
         "chr1butrllllllylong", True, False,
         "test_visualize_expected_2.txt"),
        ("test_visualize_input_2.pfa", 0, -1, 10, 3, 50, "", False, True,
         "test_visualize_expected_3.txt"),
        ("test_visualize_normalized_input_1.pfa", 2, 15, 0, 1, 6, "chr1",
         False, False, "test_visualize_normalized_expected_1.txt"),
    ]
    for (infile, start, end, sig, dec, ll, chrom, s_aln, e_aln,
         expected) in cases:
        out = str(tmp_path / "out.txt")
        browser.pfa_visualizer(f"{TD}/{infile}", out, start, end, s_aln,
                               e_aln, sig, dec, ll, chrom)
        assert fileio.are_equal(out, f"{TD}/{expected}"), expected


def test_pfa_visualize_tsv(tmp_path):
    cases = [
        ("test_visualize_input_1.pfa", 0, 15, 0, 5, 50,
         "chr1butrllllllylong", False, False,
         "test_visualize_tsv_expected_default.txt"),
        ("test_visualize_input_1.pfa", 0, -1, 0, 15, 10,
         "chr1butrllllllylong", True, True,
         "test_visualize_tsv_expected_1.txt"),
        ("test_visualize_input_1.pfa", 0, 20, 0, 4, 7,
         "chr1butrllllllylong", True, False,
         "test_visualize_tsv_expected_2.txt"),
    ]
    for (infile, start, end, sig, dec, ll, chrom, s_aln, e_aln,
         expected) in cases:
        out = str(tmp_path / "out.txt")
        browser.pfa_visualizer_tsv(f"{TD}/{infile}", out, start, end, s_aln,
                                   e_aln, sig, dec, ll, chrom)
        assert fileio.are_equal(out, f"{TD}/{expected}"), expected


def test_fa_to_pfa_one_hot(tmp_path):
    out = str(tmp_path / "out.pfa")
    pfa_tools.fa_to_pfa(f"{TD}/test_faToPfa_input_0.fa", out, 0, 10, "chr1")
    got = pfasta.read(out)[0]
    src = fastaio.read(f"{TD}/test_faToPfa_input_0.fa")[0]
    from gonomics_tpu import dna, pdna
    want = pdna.dna_to_pdna(dna.to_upper(src.seq[:10]))
    assert np.allclose(got.seq, want, atol=1e-3)


def test_vcf_to_pfa(tmp_path):
    for i, end in ((1, 36), (2, 44)):
        out = str(tmp_path / "out.pfa")
        pfa_tools.vcf_to_pfa(f"{TD}/test_vcfToPfa_input_{i}.vcf",
                             f"{TD}/test_vcfToPfa_input_1.fa", out, 1, end)
        got = pfasta.read(out)
        want = pfasta.read(f"{TD}/test_vcfToPfa_expected_{i}.pfa")
        assert pfasta.all_are_equal(got, want, 1e-3)


def test_pfa_sample_distribution(tmp_path):
    # Go-rand goldens can't be reproduced; property: one-hot pfa samples
    # deterministically to the underlying sequence.
    rec = pfasta.PFasta("chr1", np.eye(4, dtype=np.float32)[
        np.array([0, 1, 2, 3, 0, 2])])
    pfasta.write(str(tmp_path / "in.pfa"), [rec])
    pfa_tools.pfa_sample(str(tmp_path / "in.pfa"), "chr1", str(tmp_path),
                         num_samples=1, set_seed=7)
    got = fastaio.read(str(tmp_path / "sample_0.fa"))[0]
    from gonomics_tpu import dna
    assert dna.to_string(got.seq) == "ACGTAG"


def test_pfa_find_fast(tmp_path):
    td = f"{REF}/cmd/pfaFindFast/testdata"
    out = str(tmp_path / "out.bed")
    pfa_find_fast(f"{td}/human_hca_hga.pfa", out, first_query_name="hca",
                  second_query_name="hga", window_size=10,
                  ref_chrom_name="chr1")
    assert fileio.are_equal(out, f"{td}/expected.bed")
    pfa_find_fast(f"{td}/human_hca_hga.pfa", out, first_query_name="hca",
                  second_query_name="hga", window_size=10,
                  ref_chrom_name="chr1", long_output=True)
    assert fileio.are_equal(out, f"{td}/expected.longOutput.bed")


def test_multi_fa_visualizer(tmp_path):
    # browser/multiFa_test.go + cmd/multFaVisualizer table.
    td = f"{REF}/browser/testdata"
    out = str(tmp_path / "out.txt")
    browser.multi_fa_visualizer(f"{td}/chr9.112139.115209.fa", out, 500,
                                2672, False, 200,  False)
    assert fileio.are_equal(out, f"{td}/maskExpected.chr9.112639.114709.txt")
    browser.multi_fa_visualizer(f"{td}/chr9.112139.115209.fa", out, 500,
                                2672, False, 100, False)
    assert fileio.are_equal(
        out, f"{td}/expectedShortLine.chr9.112639.114709.txt")

    ctd = f"{REF}/cmd/multFaVisualizer/testdata"
    cases = [
        (1, "500", False, 50, "expected.txt"),
        (1, "500", True, 50, "expected.noMask.txt"),
        (1, "500", False, 100, "expected.lineLength.txt"),
        (350, "400", False, 50, "expected.short.txt"),
        (4, "9", False, 50, "expected.realShort.txt"),
        (4, "END", False, 50, "expected.4ToEnd.txt"),
    ]
    for start, end, no_mask, ll, expected in cases:
        argv = [f"-lineLength={ll}"]
        if no_mask:
            argv.append("-noMask")
        argv += [f"{ctd}/test.fa", out, str(start), end]
        mult_fa_vis_main(argv)
        assert fileio.are_equal(out, f"{ctd}/{expected}"), expected


def test_mult_fa_visualize_beds(tmp_path):
    td = f"{REF}/cmd/multFaVisualizeBeds/testdata"
    mult_fa_visualize_beds(f"{td}/test.bed", f"{td}/test.fa", False, False,
                           50, str(tmp_path) + "/")
    for name in ("chr1_5_10", "chr1_10_100", "chr1_490_500"):
        assert fileio.are_equal(str(tmp_path / f"{name}.txt"),
                                f"{td}/expected.{name}.txt"), name
    mult_fa_visualize_beds(f"{td}/test.bed", f"{td}/test.fa", False, False,
                           100, str(tmp_path) + "/")
    assert fileio.are_equal(str(tmp_path / "chr1_10_100.txt"),
                            f"{td}/expected.long.chr1_10_100.txt")
