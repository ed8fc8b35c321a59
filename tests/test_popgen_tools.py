"""popgen CLI batch: selectionMle golden, dunnIndex golden,
mcmcTraceStats golden, selectionMcmc/simulateWrightFisher property."""

import os

import pytest

from gonomics_tpu import fileio, popgen
from gonomics_tpu.cli.popgen_tools import (dunn_index, mcmc_trace_stats,
                                           selection_mcmc, selection_mle,
                                           simulate_wright_fisher)

REF = "/root/reference/cmd"


def test_selection_mle_golden(tmp_path, monkeypatch):
    td = f"{REF}/selectionMle"
    monkeypatch.chdir(td)
    out = str(tmp_path / "out.txt")
    selection_mle("testdata/simulated.alpha4.N100.S100.seed19.vcf", out,
                  unpolarized=True, integral_error=1e-5)
    assert fileio.are_equal(out, "testdata/expected4.txt")


def test_selection_mle_include_ref(tmp_path, monkeypatch):
    td = f"{REF}/selectionMle"
    monkeypatch.chdir(td)
    out = str(tmp_path / "out.txt")
    selection_mle("testdata/simulated.alpha4.N100.S100.seed19.vcf", out,
                  unpolarized=True, integral_error=1e-5,
                  include_ref=True)
    assert fileio.are_equal(out, "testdata/expected.includeRef.txt")


def test_dunn_index_golden(tmp_path):
    td = f"{REF}/dunnIndex/testdata"
    out = str(tmp_path / "out.bed")
    dunn_index(f"{td}/test.bed", f"{td}/test.fa", f"{td}/groups.list",
               False, out)
    assert fileio.are_equal(out, f"{td}/expected.bed")


def test_dunn_index_realign_golden(tmp_path):
    td = f"{REF}/dunnIndex/testdata"
    out = str(tmp_path / "out.bed")
    dunn_index(f"{td}/test.realign.bed", f"{td}/test.realign.fa",
               f"{td}/groups.list", True, out)
    assert fileio.are_equal(out, f"{td}/expected.realign.bed")


def test_mcmc_trace_stats_golden(tmp_path, monkeypatch):
    td = f"{REF}/mcmcTraceStats"
    monkeypatch.chdir(td)
    out = str(tmp_path / "out.txt")
    mcmc_trace_stats("testdata/Rand.trace.txt", out)
    assert fileio.are_equal(out, "testdata/Rand.trace.stats.txt")
    mcmc_trace_stats("testdata/Rand.trace.txt", out,
                     parameter_name="Sigma")
    assert fileio.are_equal(out, "testdata/Rand.trace.stats.sigma.txt")


def test_selection_mcmc_property(tmp_path):
    td = f"{REF}/selectionMcmc/testdata"
    a, b = str(tmp_path / "a.txt"), str(tmp_path / "b.txt")
    s = popgen.McmcSettings(iterations=20)
    selection_mcmc(f"{td}/N100.S20.AlphaMinus10.Seed20.vcf", a, s, 7)
    selection_mcmc(f"{td}/N100.S20.AlphaMinus10.Seed20.vcf", b, s, 7)
    assert fileio.are_equal(a, b)
    lines = fileio.read(a)
    assert lines[0] == "Iteration\tMu\tSigma\tAccept"
    assert len(lines) == 21


def test_simulate_wright_fisher_property(tmp_path):
    a, b = str(tmp_path / "a.tsv"), str(tmp_path / "b.tsv")
    simulate_wright_fisher(a, pop_size=50, num_gen=10, genome_size=2,
                           mut_rate=1e-3, set_seed=3)
    simulate_wright_fisher(b, pop_size=50, num_gen=10, genome_size=2,
                           mut_rate=1e-3, set_seed=3)
    assert fileio.are_equal(a, b)
    lines = fileio.read(a)
    assert lines[0].startswith("Gen\tSite")
    assert len(lines) == 1 + 11 * 2
    # frequencies at each site/generation sum to 1
    for ln in lines[1:]:
        freqs = [float(x) for x in ln.split("\t")[2:6]]
        assert abs(sum(freqs) - 1.0) < 1e-6


def test_simulate_wright_fisher_init_freq(tmp_path):
    out = str(tmp_path / "a.tsv")
    simulate_wright_fisher(out, pop_size=100, num_gen=5, genome_size=1,
                           mut_rate=0.0, init_freq="0.25,0.25,0.25,0.25,A",
                           set_seed=3)
    lines = fileio.read(out)
    first = lines[1].split("\t")
    assert first[2:6] == ["0.25000"] * 4
    assert first[6] == "A"


def test_selection_mle_library_bit_exact():
    # popgen/maximumLikelihood_test.go expectation
    data = popgen.vcf_to_afs(
        "/root/reference/popgen/testdata/"
        "simulated.alpha4.N100.S100.seed19.vcf")
    val = popgen.selection_maximum_likelihood_estimate(
        data, integral_error=1e-5)
    assert val == 3.0846085573799993


def test_afs_likelihood_plot_golden(tmp_path):
    from gonomics_tpu.cli.vcf_sampling import vcf_afs
    td = "/root/reference/popgen/testdata"
    plot = str(tmp_path / "plot.txt")
    vcf_afs(f"{td}/simulated.alpha4.N100.S100.seed19.vcf",
            str(tmp_path / "afs.txt"), plot_selection_likelihood=plot,
            left_bound=-9, right_bound=9, number_of_points=21,
            integral_error=1e-5)
    assert fileio.are_equal(plot, f"{td}/expected.likelihoodPlot.txt")


def test_simulate_wright_fisher_reference_goldens(tmp_path):
    # byte-exact vs cmd/simulateWrightFisher goldens (Go rand stream)
    td = "/root/reference/cmd/simulateWrightFisher/testdata"
    out = str(tmp_path / "wf.tsv")
    simulate_wright_fisher(out, pop_size=1000, mut_rate=1e-4,
                           num_gen=1000, genome_size=1, r_fitness=1.02,
                           gc_content=0.5, set_seed=5)
    assert fileio.are_equal(out, f"{td}/expected_without_initFreq.tsv")
    simulate_wright_fisher(out, pop_size=1000, mut_rate=1e-9, num_gen=500,
                           genome_size=1, r_fitness=2, gc_content=0.5,
                           init_freq="0.25,0.25,0.25,0.25,A", set_seed=10)
    assert fileio.are_equal(out, f"{td}/expected_with_initFreq.tsv")
    simulate_wright_fisher(out, pop_size=1000, mut_rate=1e-9, num_gen=500,
                           genome_size=1, r_fitness=2, gc_content=0.5,
                           init_freq="0.25,0.25,0.25,0.25,A",
                           fitness_string="1,1.05,0.95,0.95,A",
                           set_seed=20)
    assert fileio.are_equal(out, f"{td}/expected_with_fitnessString.tsv")


def test_selection_mcmc_reference_goldens(tmp_path):
    td = f"{REF}/selectionMcmc/testdata"
    if not os.path.isdir(td):
        pytest.skip("reference testdata not present")
    from gonomics_tpu.cli.popgen_tools import selection_mcmc

    for expected, inc in [("expected.trace.txt", False),
                          ("expected.includeRef.trace.txt", True)]:
        out = str(tmp_path / expected)
        s = popgen.McmcSettings(
            iterations=100, mu_zero=-5, sigma_zero=0.1, mu_step=0.2,
            sigma_step=0.1, integral_error=1e-7, sigma_prior_alpha=2,
            sigma_prior_beta=10, mu_prior_mean=0, mu_prior_sigma=3,
            include_ref=inc)
        selection_mcmc(f"{td}/N100.S20.AlphaMinus10.Seed20.vcf", out, s, 1)
        with open(out) as f, open(f"{td}/{expected}") as g:
            assert f.read() == g.read()
