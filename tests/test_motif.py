"""motif package tests: jaspar IO + conversion goldens
(reference motif/convert_test.go), ScoreWindow values
(motif/match_test.go), TPU conv scan vs host einsum."""

import numpy as np
import pytest

from gonomics_tpu import dna, fileio, motif

TD = "/root/reference/motif/testdata"


def test_jaspar_round_trip(tmp_path):
    recs = motif.read_jaspar(f"{TD}/expected.jaspar.txt", "Frequency")
    out = str(tmp_path / "out.txt")
    motif.write_jaspar(out, recs)
    assert fileio.are_equal(out, f"{TD}/expected.jaspar.txt")


def test_pfm_to_ppm_golden(tmp_path):
    recs = motif.read_jaspar(f"{TD}/expected.jaspar.txt", "Frequency")
    out = str(tmp_path / "ppm.txt")
    motif.write_jaspar(out, [motif.pfm_to_ppm(r, 0.1) for r in recs])
    assert fileio.are_equal(out, f"{TD}/expected.Ppm.txt")


@pytest.mark.parametrize("gc,expected", [(0.5, "expected.Pwm.txt"),
                                         (0.41, "expected.humGc.Pwm.txt")])
def test_ppm_to_pwm_golden(tmp_path, gc, expected):
    recs = motif.read_jaspar(f"{TD}/expected.Ppm.txt", "Probability")
    out = str(tmp_path / "pwm.txt")
    motif.write_jaspar(out, [motif.ppm_to_pwm(r, gc) for r in recs])
    assert fileio.are_equal(out, f"{TD}/{expected}")


def test_pwm_to_ppm_golden(tmp_path):
    recs = motif.read_jaspar(f"{TD}/expected.Pwm.txt", "Weight")
    out = str(tmp_path / "ppm2.txt")
    motif.write_jaspar(out, [motif.pwm_to_ppm(r) for r in recs])
    assert fileio.are_equal(out, f"{TD}/expected.PwmToPpm.txt")


def test_score_window_reference_values():
    motifs = motif.read_jaspar(f"{TD}/jaspar.small.txt", "Frequency")
    seqs = [dna.from_string("GCGCAGGGCAGGGCGCAGTTCAGG"),
            dna.from_string("ATGAGTTCAAGGTCAGCATGAGTTCATTGTCAGC")]
    expected = [[43804, 21001, 34109, -1], [54010, 13722, 16827, -1]]
    for i, pm in enumerate(motifs[:2]):
        for j, start in enumerate([0, 4, 12, 30]):
            score, _, ok = motif.score_window(pm, seqs[i], start)
            assert score == expected[i][j]
            assert ok == (expected[i][j] != -1)


def test_scan_matches_score_window():
    motifs = motif.read_jaspar(f"{TD}/jaspar.small.txt", "Frequency")
    pm = motifs[0]
    rng = np.random.default_rng(0)
    seq = rng.integers(0, 4, 200).astype(np.int8)
    scores = motif.scan_scores(pm, seq)
    L = pm.mat.shape[1]
    for w in range(0, len(seq) - L + 1, 13):
        want, _, _ = motif.score_window(pm, seq, w)
        assert abs(scores[w] - want) < 1e-9


def test_jax_scan_matches_host():
    motifs = motif.read_jaspar(f"{TD}/jaspar.small.txt", "Frequency")
    pm = motifs[0]
    rng = np.random.default_rng(1)
    seq = rng.integers(0, 5, 300).astype(np.int8)  # includes some N
    host = motif.scan_scores(pm, seq)
    dev = np.asarray(motif.scan_scores_jax(pm, seq))
    finite = np.isfinite(host)
    assert (np.isfinite(dev) == finite).all()
    assert np.allclose(dev[finite], host[finite], rtol=1e-5)


def test_reverse_complement_roundtrip():
    motifs = motif.read_jaspar(f"{TD}/expected.jaspar.txt", "Frequency")
    pm = motifs[0]
    rc2 = motif.reverse_complement(motif.reverse_complement(pm))
    assert np.allclose(rc2.mat, pm.mat)
