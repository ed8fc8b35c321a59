"""Diploid genotype caller tests — the reference's full
DiploidBaseCallFromPileTests table (sam/diploidBase_test.go:9-95) plus
the likelihood-expression values."""

import math

import numpy as np
import pytest

from gonomics_tpu import dna
from gonomics_tpu.genotype import (AA, AC, AG, AT, CC, GG, NN, TT,
                                   base_log_likelihoods,
                                   diploid_base_call,
                                   diploid_base_call_batch,
                                   make_diploid_base_prior_cache)
from gonomics_tpu.pileup import Pile


def _pile(a=0, c=0, g=0, t=0):
    p = Pile()
    p.count_f = np.zeros(13, np.int64)
    p.count_f[dna.A] = a
    p.count_f[dna.C] = c
    p.count_f[dna.G] = g
    p.count_f[dna.T] = t
    return p

CASES = [  # counts(a,c,g,t), ref, delta, gamma, epsilon, lambda, expected
    ((16, 14, 0, 1), dna.G, 0.01, 3, 0.01, 0, AC),
    ((4, 0, 0, 1), dna.G, 0.01, 3, 0.01, 0, AG),
    ((4, 0, 0, 1), dna.G, 0.5, 3, 0.01, 0, AT),
    ((4, 0, 0, 1), dna.G, 0.01, 3, 0.0001, 0, AT),
    ((0, 0, 0, 0), dna.G, 0.01, 3, 0.01, 0, GG),
    ((16, 450, 0, 1), dna.G, 0.01, 3, 0.01, 0, CC),
    ((16, 14, 0, 1), dna.N, 0.01, 3, 0.01, 0, NN),
    ((16, 1, 0, 7), dna.C, 0.1, 3, 0.01, 0, AT),
    ((0, 61, 0, 0), dna.T, 0.1, 3, 0.01, 0, CC),
    ((16, 14, 0, 1), dna.G, 0.01, 3, 0.01, 0.05, AC),
    ((16, 4, 0, 7), dna.C, 0.1, 3, 0.01, 0.2, AC),
]


@pytest.mark.parametrize("counts,ref,delta,gamma,eps,lam,expected", CASES)
def test_diploid_caller_reference_table(counts, ref, delta, gamma, eps, lam,
                                        expected):
    prior = make_diploid_base_prior_cache(delta, gamma)
    got = diploid_base_call(_pile(*counts), ref, prior, eps, lam)
    assert got == expected


def test_likelihood_expression_values():
    # sam/diploidBase_test.go LikelihoodExpressionTests (uncached branch)
    ll = base_log_likelihoods(np.array([[26, 3, 0, 0]]), 0.01)[0]
    assert abs(ll[AA] - (-17.37265615615964)) < 1e-10
    # hetero AC with correct=26+3? no: hetero expression c=26 i=3 means
    # correct pair counts 26, incorrect 3 -> genotype AC with a=26, c=0,
    # g=3, t=0: het*(a+c) + e3*(g+t)
    ll2 = base_log_likelihoods(np.array([[26, 0, 3, 0]]), 0.01)[0]
    assert abs(ll2[AC] - (-35.3070878104479)) < 1e-10


def test_batch_matches_scalar():
    prior = make_diploid_base_prior_cache(0.01, 3)
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 30, (50, 4))
    refs = rng.integers(0, 4, 50)
    batch = diploid_base_call_batch(counts, refs, prior, 0.01)
    for i in range(50):
        got = diploid_base_call(_pile(*counts[i]), int(refs[i]), prior, 0.01)
        assert batch[i] == got
