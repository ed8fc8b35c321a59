"""strawToBedpe goldens (reference cmd/strawToBedpe/strawToBedpe_test.go)."""

from gonomics_tpu import fileio
from gonomics_tpu.cli.straw_to_bedpe import Settings, straw_to_bedpe

TD = "/root/reference/cmd/strawToBedpe/testdata"


def _file_list(tmp_path):
    fl = tmp_path / "fileList.txt"
    fl.write_text(f"{TD}/chr1.straw.gz\tchr1\n")
    return str(fl)


def test_straw_to_bedpe_full(tmp_path):
    out = tmp_path / "out.bedpe"
    fit = tmp_path / "out.FitStats.txt"
    csf = tmp_path / "out.contactScoreFile.txt.gz"
    straw_to_bedpe(Settings(
        file_list=_file_list(tmp_path), out_file=str(out), bin_size=5000,
        r_start=1.0, p_start=0.5, r_step=0.001, p_step=0.001,
        min_bin_distance=2, min_cutoff=10, fdr=0.05,
        contact_score_file=str(csf), fit_stats_file=str(fit),
        max_contact_score_in_distribution_file=100,
        max_bin_distance_in_distribution_file=-1))
    assert fileio.are_equal(str(out), f"{TD}/expected.out.bedpe")
    assert fileio.are_equal(str(fit), f"{TD}/expected.FitStats.txt")
    assert fileio.are_equal_ignore_order(
        str(csf), f"{TD}/expected.contactScoreFile.txt.gz")


def test_straw_to_bedpe_low_cutoff(tmp_path):
    out = tmp_path / "out.lowCutoff.bedpe"
    fit = tmp_path / "out.FitStats.lowCoverage.txt"
    straw_to_bedpe(Settings(
        file_list=_file_list(tmp_path), out_file=str(out), bin_size=5000,
        r_start=1.0, p_start=0.5, r_step=0.001, p_step=0.001,
        min_cutoff=2, fdr=0.05, fit_stats_file=str(fit)))
    assert fileio.are_equal(str(out), f"{TD}/expected.out.lowCutoff.bedpe")
    assert fileio.are_equal(str(fit),
                            f"{TD}/expected.FitStats.lowCoverage.txt")
