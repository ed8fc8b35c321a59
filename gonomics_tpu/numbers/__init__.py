"""Statistics / distribution helpers (reference: /root/reference/numbers).

Scalar functions replicate the reference's evaluation order so %e-formatted
golden outputs match; batched/vectorized variants live alongside for the
TPU pipelines.
"""

from __future__ import annotations

import math

from . import logspace


def binom_coefficient_log(n: int, k: int) -> float:
    """ln C(n, k), with the reference's summation order
    (numbers.go:163-183)."""
    if n < 0 or k < 0 or k > n:
        raise ValueError(f"bad binomial coefficient n={n} k={k}")
    if n - k > k:
        k = n - k
    if k == n:
        return 0.0
    numer = 0.0
    denom = 0.0
    for x in range(k + 1, n + 1):
        numer = logspace.multiply(numer, math.log(float(x)))
    for y in range(2, n - k + 1):
        denom = logspace.multiply(denom, math.log(float(y)))
    return logspace.divide(numer, denom)


def binomial_expression_log(n: int, k: int, p: float) -> float:
    s = logspace.pow_(math.log(p), float(k))
    f = logspace.pow_(math.log(1.0 - p), float(n - k))
    return logspace.multiply(s, f)


def binomial_dist_log(n: int, k: int, p: float) -> float:
    """ln P(X == k) for X ~ Binom(n, p) (logDistribution.go:11)."""
    return logspace.multiply(binom_coefficient_log(n, k),
                             binomial_expression_log(n, k, p))


def binomial_dist_cache_log10(n: int, p: float) -> dict[int, float]:
    """map k -> -log10 P(X >= k), the faFindFast p-value cache
    (cmd/faFindFast/efficient.go binomialDistCacheLog10)."""
    if p < 0 or p > 1:
        raise ValueError("p must be between 0 and 1")
    answer: dict[int, float] = {n: binomial_dist_log(n, n, p)}
    for k in range(n - 1, -1, -1):
        answer[k] = logspace.add(binomial_dist_log(n, k, p), answer[k + 1])
    for k in range(n + 1):
        answer[k] = -1 * logspace.to_base10(answer[k])
    answer[0] = 0.0  # hardcoded to avoid numerical noise (reference does too)
    return answer
