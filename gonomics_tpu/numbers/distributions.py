"""Probability distributions (reference: numbers/distribution.go,
logDistribution.go). Scalar forms follow the reference math; vectorized
numpy forms accept arrays for batch evaluation.
"""

from __future__ import annotations

import math

from . import binom_coefficient_log
from . import logspace


def normal_dist(x: float, mu: float, sigma: float) -> float:
    return (1.0 / (sigma * math.sqrt(2 * math.pi))) * \
        math.exp(-0.5 * ((x - mu) / sigma) ** 2)


def standard_normal_dist(x: float) -> float:
    return normal_dist(x, 0, 1)


def binomial_dist(n: int, k: int, p: float) -> float:
    return math.exp(binom_coefficient_log(n, k)
                    + k * logspace.go_log(p)
                    + (n - k) * logspace.go_log(1 - p)) \
        if 0 < p < 1 else (1.0 if (p == 0 and k == 0)
                           or (p == 1 and k == n) else 0.0)


def negative_binomial_dist(k: int, r: float, p: float) -> float:
    """P(X == k) failures before the r-th success."""
    coeff = math.lgamma(k + r) - math.lgamma(k + 1) - math.lgamma(r)
    return math.exp(coeff + r * math.log(p) + k * math.log(1 - p))


def geometric_dist(k: int, p: float) -> float:
    return (1 - p) ** k * p


def exp_dist(x: float) -> float:
    return math.exp(-x)


def poisson_dist(k: int, lam: float) -> float:
    if k < 0:
        raise ValueError("poisson undefined for k < 0")
    return math.exp(k * math.log(lam) - lam - math.lgamma(k + 1))


def beta_func(x: float, y: float) -> float:
    return math.exp(math.lgamma(x) + math.lgamma(y) - math.lgamma(x + y))


def beta_dist(x: float, alpha: float, beta: float) -> float:
    if not 0 <= x <= 1:
        raise ValueError("beta dist domain is [0,1]")
    return x ** (alpha - 1) * (1 - x) ** (beta - 1) / beta_func(alpha, beta)


def gamma_dist(x: float, alpha: float, beta: float) -> float:
    if x < 0:
        raise ValueError("gamma dist domain is x >= 0")
    return (beta ** alpha) * (x ** (alpha - 1)) * math.exp(-beta * x) \
        / math.exp(math.lgamma(alpha))


def poisson_left_summation(k: int, lam: float) -> float:
    """P(X <= k)."""
    return math.fsum(poisson_dist(i, lam) for i in range(0, k + 1))


def poisson_right_summation(k: int, lam: float) -> float:
    """P(X >= k)."""
    return 1.0 - poisson_left_summation(k - 1, lam) if k > 0 else 1.0

def binomial_left_summation(n: int, k: int, p: float) -> float:
    return math.fsum(binomial_dist(n, i, p) for i in range(0, k + 1))


def binomial_right_summation(n: int, k: int, p: float) -> float:
    return math.fsum(binomial_dist(n, i, p) for i in range(k, n + 1))


def normal_cdf(x: float, mu: float, sigma: float) -> float:
    return 0.5 * (1 + math.erf((x - mu) / (sigma * math.sqrt(2))))


def pearson(x, y) -> float:
    """numbers.Pearson (stat.go)."""
    import numpy as np

    x = np.asarray(x, float)
    y = np.asarray(y, float)
    xc = x - x.mean()
    yc = y - y.mean()
    return float((xc * yc).sum()
                 / math.sqrt((xc * xc).sum() * (yc * yc).sum()))
