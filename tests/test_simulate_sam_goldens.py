"""simulateSam byte-parity against the reference goldens
(/root/reference/cmd/simulateSam/testdata, cases from simulateSam_test.go)."""

import os

import pytest

from gonomics_tpu.simulate import simulate_sam

T = "/root/reference/cmd/simulateSam/testdata"
pytestmark = pytest.mark.skipif(not os.path.isdir(T),
                                reason="reference testdata not present")


def _check(tmp_path, expected, **kw):
    out = str(tmp_path / "o.sam")
    simulate_sam(kw.pop("ref"), out, **kw)
    with open(out) as f, open(f"{T}/{expected}") as g:
        assert f.read() == g.read()


def test_basic(tmp_path):
    _check(tmp_path, "expected.sam", ref=f"{T}/test.fa", num_reads=100,
           read_len=150, fragment_length=500, fragment_std=50.0, set_seed=1)


def test_coverage_10x(tmp_path):
    _check(tmp_path, "expected.10xCoverage.sam", ref=f"{T}/test.fa",
           coverage=10, read_len=150, fragment_length=500,
           fragment_std=10.0, set_seed=1)


def test_flat_error_low_rate(tmp_path):
    # exercises the (n+1)-scaled binomial alias table
    _check(tmp_path, "expected.errorTest.LowRate.sam",
           ref=f"{T}/errorTest.fa", coverage=10, read_len=50,
           flat_error_rate=0.01, fragment_length=100, fragment_std=10.0,
           set_seed=1)


def test_flat_error_high_rate(tmp_path):
    _check(tmp_path, "expected.errorTest.HighRate.sam",
           ref=f"{T}/errorTest.fa", coverage=10, read_len=50,
           flat_error_rate=0.1, fragment_length=100, fragment_std=10.0,
           set_seed=1)


def test_ancient_damage_and_deamination_distribution(tmp_path):
    out = str(tmp_path / "o.sam")
    deam = str(tmp_path / "deam.txt")
    simulate_sam(f"{T}/test.fa", out, coverage=10, read_len=50,
                 flat_error_rate=0.01, fragment_length=100,
                 fragment_std=10.0, set_seed=1, ancient_error_rate=0.1,
                 geometric_param=0.25, deamination_distribution=deam)
    with open(out) as f, open(f"{T}/expected.ancientErrorTest.sam") as g:
        assert f.read() == g.read()
    with open(deam) as f, \
            open(f"{T}/expected.deaminationDistribution.txt") as g:
        assert f.read() == g.read()


def test_bam_output_matches_expected_records(tmp_path):
    from gonomics_tpu.io import sam as samio

    out = str(tmp_path / "o.bam")
    simulate_sam(f"{T}/test.fa", out, num_reads=100, read_len=150,
                 fragment_length=500, fragment_std=50.0, set_seed=1)
    _, a = samio.read(out)
    _, b = samio.read(f"{T}/expected.bam")
    assert len(a) == len(b) == 200
    assert all(x.to_string() == y.to_string() for x, y in zip(a, b))
