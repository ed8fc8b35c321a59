"""statCalc golden tests (reference cmd/statCalc)."""

import numpy as np
import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli.stat_calc import stat_calc

TD = "/root/reference/cmd/statCalc/testdata"

DETERMINISTIC = [
    (["1"], dict(normal="0,1"), "expected.normalDensity.txt"),
    (["1", "inf"], dict(normal="0,1"), "expected.normalIntegral.txt"),
    (["3"], dict(binomial="10,0.5"), "expected.binomialDist.txt"),
    (["3", "n"], dict(binomial="10,0.5"), "expected.binomialSum.txt"),
    (["4"], dict(poisson="4"), "expected.poissonDist.txt"),
    (["4", "inf"], dict(poisson="4"), "expected.poissonIntegral.txt"),
    (["0.3"], dict(beta="2,3"), "expected.betaDist.txt"),
    (["0.3", "1"], dict(beta="2,3"), "expected.betaIntegral.txt"),
    (["3.5"], dict(gamma="4,2"), "expected.gammaDist.txt"),
    (["8", "inf"], dict(gamma="4,2"), "expected.gammaIntegral.txt"),
]


@pytest.mark.parametrize("args,kw,exp", DETERMINISTIC,
                         ids=[c[2] for c in DETERMINISTIC])
def test_stat_calc_golden(tmp_path, args, kw, exp):
    out = str(tmp_path / exp)
    stat_calc(args, out_file=out, **kw)
    assert fileio.are_equal(out, f"{TD}/{exp}")


def test_samplers_properties(tmp_path):
    """Sampled outputs use numpy's PRNG (Go rand not reproducible):
    check count + distribution moments instead of bytes."""
    out = str(tmp_path / "s.txt")
    stat_calc([], out_file=out, sample_beta="2,5,2000", seed=7)
    v = np.loadtxt(out)
    assert len(v) == 2000 and abs(v.mean() - 2 / 7) < 0.02
    stat_calc([], out_file=out, sample_gamma="4,4,2000", seed=7)
    v = np.loadtxt(out)
    assert abs(v.mean() - 1.0) < 0.05
    stat_calc([], out_file=out, sample_normal="0,1,2000", seed=7)
    assert abs(np.loadtxt(out).mean()) < 0.1
    stat_calc([], out_file=out,
              sample_afs="0.02,200,1000,1000,0.001,0.999", seed=7)
    v = np.loadtxt(out)
    assert len(v) == 200 and v.min() >= 0.001 and v.max() <= 0.999


def test_multiple_options_rejected(tmp_path):
    with pytest.raises(SystemExit):
        stat_calc(["1"], normal="0,1", poisson="4",
                  out_file=str(tmp_path / "x"))
