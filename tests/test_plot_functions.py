"""plotFunctions goldens: continuous distributions vs
cmd/plotFunctions/testdata, discrete AFS/ascertainment plots vs
popgen/testdata (reference: plotFunctions_test.go, popgen/plot_test.go)."""

import pytest

from gonomics_tpu import fileio
from gonomics_tpu.cli import plot_functions as pf

CMD_TD = "/root/reference/cmd/plotFunctions/testdata"
POPGEN_TD = "/root/reference/popgen/testdata"


@pytest.mark.parametrize("function,args,left,right,bins,name", [
    ("AfsStationarity", "0.001", 0.001, 0.999, 100, "afsStationarity"),
    ("Beta", "0.5,0.5", 0.001, 0.999, 100, "beta"),
    ("Gamma", "0.5,0.5", 0.001, 0.999, 100, "gamma"),
    ("Normal", "0,0.5", -4, 4, 100, "normal"),
])
def test_continuous_golden(tmp_path, function, args, left, right, bins,
                           name):
    out = str(tmp_path / "out.txt")
    pf.plot_continuous_functions(function, args, left, right, bins, out)
    assert fileio.are_equal(out, f"{CMD_TD}/expected.{name}.txt")


def test_afs_f_golden(tmp_path):
    out = str(tmp_path / "out.txt")
    pf.plot_afs_f(0.01, 10, out, 1e-5)
    assert fileio.are_equal(out, f"{POPGEN_TD}/expected.AfsF.txt")


@pytest.mark.parametrize("derived,ancestral,name", [
    (False, False, "AfsPmf"),
    (True, False, "AfsPmfDerived"),
    (False, True, "AfsPmfAncestral"),
])
def test_afs_pmf_golden(tmp_path, derived, ancestral, name):
    out = str(tmp_path / "out.txt")
    pf.plot_afs_pmf(0.01, 10, out, 1e-5, derived, ancestral)
    assert fileio.are_equal(out, f"{POPGEN_TD}/expected.{name}.txt")


@pytest.mark.parametrize("derived,name", [
    (False, "AncestralAscertainmentProbability"),
    (True, "DerivedAscertainmentProbability"),
])
def test_ascertainment_probability_golden(tmp_path, derived, name):
    out = str(tmp_path / "out.txt")
    pf.plot_ascertainment_probability(out, 50, 1, derived)
    assert fileio.are_equal(out, f"{POPGEN_TD}/expected.{name}.txt")


@pytest.mark.parametrize("derived,name", [
    (False, "AncestralDenominator"),
    (True, "DerivedDenominator"),
])
def test_ascertainment_denominator_golden(tmp_path, derived, name):
    out = str(tmp_path / "out.txt")
    pf.plot_ascertainment_denominator(out, 10, 1, 0.01, 1e-5, derived)
    assert fileio.are_equal(out, f"{POPGEN_TD}/expected.{name}.txt")


def test_cli_dispatch(tmp_path):
    out = str(tmp_path / "out.txt")
    pf.main(["ChooseN", "10", out])
    lines = open(out).read().splitlines()
    assert lines[0] == "i\tProbability"
    assert len(lines) == 10
