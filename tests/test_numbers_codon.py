"""numbers distributions + codon translation tests."""

import math

import numpy as np

from gonomics_tpu import codon, dna
from gonomics_tpu.numbers import distributions as dist


def test_translate_known_protein():
    # ATG GCC TGG TAA -> Met Ala Trp Stop
    seq = dna.from_string("ATGGCCTGGTAA")
    assert codon.translate_to_short_string(seq) == "MAW*"
    assert codon.to_string(codon.translate_seq(seq)) == "MetAlaTrpTer"


def test_translate_to_ter_stops():
    seq = dna.from_string("ATGTAAATG")
    aas = codon.translate_seq_to_ter(seq)
    assert codon.to_short_string(aas) == "M*"


def test_translate_lowercase_folds():
    assert codon.translate_to_short_string(dna.from_string("atggcc")) == "MA"


def test_all_64_codons_covered():
    for i in range(64):
        b = np.array([i // 16, (i // 4) % 4, i % 4], np.int8)
        assert codon.translate_seq(b)[0] >= 0


def test_binomial_poisson_consistency():
    # binomial(n, p) -> poisson(np) for large n small p
    assert abs(dist.binomial_dist(10000, 3, 3e-4)
               - dist.poisson_dist(3, 3.0)) < 1e-4
    assert abs(sum(dist.binomial_dist(20, k, 0.3)
                   for k in range(21)) - 1.0) < 1e-12
    assert abs(dist.poisson_left_summation(5, 2.0)
               + dist.poisson_right_summation(6, 2.0) - 1.0) < 1e-12


def test_beta_gamma_normal():
    assert abs(dist.beta_dist(0.5, 2, 2) - 1.5) < 1e-12
    assert abs(dist.gamma_dist(1.0, 1.0, 1.0) - math.exp(-1)) < 1e-12
    assert abs(dist.normal_cdf(0, 0, 1) - 0.5) < 1e-12
    assert abs(dist.standard_normal_dist(0) - 1 / math.sqrt(2 * math.pi)) \
        < 1e-12


def test_pearson():
    x = np.array([1.0, 2, 3, 4])
    assert abs(dist.pearson(x, 2 * x + 1) - 1.0) < 1e-12
    assert abs(dist.pearson(x, -x) + 1.0) < 1e-12
