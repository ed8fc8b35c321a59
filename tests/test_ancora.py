"""ancora build/prior/score goldens (reference cmd/ancora/ancora_test.go) —
byte-exact, including the seeded Go-rand stream."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.ancora import (BuildSettings, PriorSettings,
                                     ancora_build, ancora_prior,
                                     ancora_score)

TD = "/root/reference/cmd/ancora/testdata"


def test_ancora_prior_default(tmp_path):
    out = tmp_path / "out.AncoraPrior.txt"
    ancora_prior(PriorSettings(
        sam_file=f"{TD}/diverged.RefAln.sorted.bam", ref_file=f"{TD}/ref.fa",
        out_file=str(out), epsilon=0.01, likelihood_cache_size=100,
        pseudo_count=0.1, as_counts=False, min_coverage=0))
    assert fileio.are_equal(str(out), f"{TD}/expected.AncoraPrior.txt")


def test_ancora_prior_as_counts(tmp_path):
    out = tmp_path / "out.counts.txt"
    ancora_prior(PriorSettings(
        sam_file=f"{TD}/diverged.RefAln.sorted.bam", ref_file=f"{TD}/ref.fa",
        out_file=str(out), epsilon=0.01, likelihood_cache_size=100,
        pseudo_count=0.1, as_counts=True, min_coverage=0))
    assert fileio.are_equal(str(out),
                            f"{TD}/expected.AncoraPrior.AsCounts.txt")


def test_ancora_prior_min_coverage(tmp_path):
    out = tmp_path / "out.mincov.txt"
    ancora_prior(PriorSettings(
        sam_file=f"{TD}/diverged.RefAln.sorted.bam", ref_file=f"{TD}/ref.fa",
        out_file=str(out), epsilon=0.01, likelihood_cache_size=100,
        pseudo_count=0.1, as_counts=False, min_coverage=30))
    assert fileio.are_equal(str(out),
                            f"{TD}/expected.AncoraPrior.minCoverage.txt")


@pytest.mark.parametrize("score_type,expected", [
    ("baseMatrix", "expected.baseMatrix.txt"),
    ("baseMatrixByRefBase", "expected.baseMatrixByRefBase.txt"),
])
def test_ancora_score(tmp_path, score_type, expected):
    fl = tmp_path / "fileList.txt"
    fl.write_text(f"{TD}/score/Sequence_0.validate.fa\n"
                  f"{TD}/score/Sequence_1.validate.fa\n")
    out = tmp_path / "out.txt"
    ancora_score(score_type, str(fl), str(out))
    assert fileio.are_equal(str(out), f"{TD}/score/{expected}")


def test_ancora_build_default(tmp_path):
    mfa = tmp_path / "multiFa"
    mfa.mkdir()
    out_a = tmp_path / "A.fa"
    out_b = tmp_path / "B.fa"
    ancora_build(BuildSettings(
        sam_file=f"{TD}/diverged.RefAln.sorted.bam", ref_file=f"{TD}/ref.fa",
        out_a=str(out_a), out_b=str(out_b), multi_fa_dir=str(mfa),
        qname_a="Rand_Con_A", qname_b="Rand_Con_B", delta=0.01, gamma=3,
        epsilon=0.01, kappa=0.5, likelihood_cache_size=100, set_seed=19))
    assert fileio.are_equal(str(out_a), f"{TD}/expected.OutFileA.fa")
    assert fileio.are_equal(str(out_b), f"{TD}/expected.OutFileB.fa")
    assert fileio.are_equal(str(mfa / "Sequence_0.fa"),
                            f"{TD}/multiFa/expected.Sequence_0.fa")
    assert fileio.are_equal(str(mfa / "Sequence_1.fa"),
                            f"{TD}/multiFa/expected.Sequence_1.fa")


def test_ancora_build_empirical_prior(tmp_path):
    out_a = tmp_path / "A.fa"
    out_b = tmp_path / "B.fa"
    ancora_build(BuildSettings(
        sam_file=f"{TD}/diverged.RefAln.sorted.bam", ref_file=f"{TD}/ref.fa",
        out_a=str(out_a), out_b=str(out_b),
        qname_a="Rand_Con_A", qname_b="Rand_Con_B", delta=0.01,
        epsilon=0.01, kappa=0.5, likelihood_cache_size=100, set_seed=19,
        empirical_prior=f"{TD}/expected.AncoraPrior.txt"))
    assert fileio.are_equal(str(out_a),
                            f"{TD}/expected.empirical.OutFileA.fa")
    assert fileio.are_equal(str(out_b),
                            f"{TD}/expected.empirical.OutFileB.fa")


def test_ancora_build_problematic_regions(tmp_path):
    mfa = tmp_path / "problematicMultiFa"
    mfa.mkdir()
    out_a = tmp_path / "A.fa"
    out_b = tmp_path / "B.fa"
    ancora_build(BuildSettings(
        sam_file=f"{TD}/diverged.RefAln.sorted.bam", ref_file=f"{TD}/ref.fa",
        out_a=str(out_a), out_b=str(out_b), multi_fa_dir=str(mfa),
        qname_a="Rand_Con_A", qname_b="Rand_Con_B", delta=0.01, gamma=3,
        epsilon=0.01, kappa=0.5, likelihood_cache_size=100, set_seed=19,
        problematic_regions_bed=f"{TD}/problematicRegion.bed"))
    assert fileio.are_equal(str(out_a),
                            f"{TD}/expected.problematic.OutFileA.fa")
    assert fileio.are_equal(str(out_b),
                            f"{TD}/expected.problematic.OutFileB.fa")
    assert fileio.are_equal(
        str(mfa / "Sequence_0.fa"),
        f"{TD}/problematicMultiFa/expected.Sequence_0.fa")
    assert fileio.are_equal(
        str(mfa / "Sequence_1.fa"),
        f"{TD}/problematicMultiFa/expected.Sequence_1.fa")
