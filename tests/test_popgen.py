"""popgen tests: AFS parsing, fixed-alpha likelihood MLE (bit-exact vs
reference maximumLikelihood_test.go), device grid density, Wright-Fisher."""

import math

import numpy as np
import pytest

from gonomics_tpu.popgen import (Afs, SegSite, afs_sample_density,
                                 afs_sample_density_grid, build_binom_cache,
                                 selection_mle, vcf_to_afs,
                                 wright_fisher_sim)

TD = "/root/reference/popgen/testdata"


def test_vcf_to_afs():
    afs = vcf_to_afs(f"{TD}/simulated.alpha4.N100.S100.seed19.vcf")
    assert len(afs.sites) == 100
    assert all(0 < s.i < s.n for s in afs.sites)


def test_selection_mle_reference_value():
    afs = vcf_to_afs(f"{TD}/simulated.alpha4.N100.S100.seed19.vcf")
    mle = selection_mle(afs, -10, 10, 1e-5, integral_error=1e-5)
    assert mle == 3.0846085573799993  # reference golden, bit-exact


def test_grid_density_matches_adaptive():
    cache = build_binom_cache([20])
    want = afs_sample_density(20, 5, 2.0, cache, 1e-8)
    got = float(np.asarray(afs_sample_density_grid([20], [5], [2.0]))[0])
    assert abs(got - want) < 1e-3  # float32 grid vs float64 adaptive


def test_wright_fisher_drift():
    traj = np.asarray(wright_fisher_sim(1000, 200, s=0.05, init_freq=0.1,
                                        seed=3))
    assert traj.shape == (200,)
    assert traj[-1] > 0.5  # positive selection drives the allele up
