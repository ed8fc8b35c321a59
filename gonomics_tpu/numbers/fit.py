"""Distribution fitting (reference: numbers/fit).

zero-truncated negative binomial coordinate-ascent fit (ztnb.go), used by
strawToBedpe's HiC contact-score null models. The 8-direction ascent and
its check ordering replicate the reference exactly so fitted (R, P) land
on the identical grid points.
"""

from __future__ import annotations

import math

from . import logspace
from .distributions import negative_binomial_log_dist

# directions (ztnb.go:14-24)
(NEUTRAL, NORTH, NORTHEAST, EAST, SOUTHEAST, SOUTH, SOUTHWEST, WEST,
 NORTHWEST) = range(9)


class _ZtnbLikelihood:
    """Memoized ZTNB log-likelihood over histogram data
    (zeroTruncatedNegativeBinomialLogLikelihood, ztnb.go:52). Zero-count
    bins contribute exactly +0.0 in the reference's sequential sum, so
    only nonzero bins are accumulated (in the same increasing-i order)."""

    def __init__(self, data: list[int]):
        self.nonzero = [(i, float(c)) for i, c in enumerate(data)
                        if i >= 1 and c != 0]
        self.cache: dict[tuple[float, float], float] = {}

    def __call__(self, r: float, p: float) -> float:
        key = (r, p)
        got = self.cache.get(key)
        if got is not None:
            return got
        log_trunc = math.log(1 - math.pow(p, r))
        ll = 0.0
        for i, count in self.nonzero:
            density = negative_binomial_log_dist(i, r, p)
            ll += count * logspace.divide(density, log_trunc)
        self.cache[key] = ll
        return ll


def _check(ll, r, p, r_step, p_step, direction, cur_dir, cur_like):
    """check{North,...} helpers (ztnb.go:66-160): propose one step."""
    if direction == NORTH:
        nr, np_ = r + r_step, p
    elif direction == NORTHEAST:
        if p + p_step > 0.999:
            return cur_dir, cur_like
        nr, np_ = r + r_step, p + p_step
    elif direction == EAST:
        if p + p_step > 0.999:
            return cur_dir, cur_like
        nr, np_ = r, p + p_step
    elif direction == SOUTHEAST:
        if p + p_step > 0.999 or r - r_step < 0.001:
            return cur_dir, cur_like
        nr, np_ = r - r_step, p + p_step
    elif direction == SOUTH:
        if r - r_step < 0.001:
            return cur_dir, cur_like
        nr, np_ = r - r_step, p
    elif direction == SOUTHWEST:
        if r - r_step < 0.001 or p - p_step < 0.001:
            return cur_dir, cur_like
        nr, np_ = r - r_step, p - p_step
    elif direction == WEST:
        if p - p_step < 0.001:
            return cur_dir, cur_like
        nr, np_ = r, p - p_step
    else:  # NORTHWEST
        if p - p_step < 0.001:
            return cur_dir, cur_like
        nr, np_ = r + r_step, p - p_step
    next_like = ll(nr, np_)
    if next_like > cur_like:
        return direction, next_like
    return cur_dir, cur_like


# per-heading neighborhood scan order (nextDirection, ztnb.go:166-224)
_SCAN = {
    NORTH: [WEST, NORTHWEST, NORTH, NORTHEAST, EAST],
    NORTHWEST: [SOUTHWEST, WEST, NORTHWEST, NORTH, NORTHEAST],
    WEST: [SOUTH, SOUTHWEST, WEST, NORTHWEST, NORTH],
    SOUTHWEST: [SOUTHEAST, SOUTH, SOUTHWEST, WEST, NORTHWEST],
    SOUTH: [EAST, SOUTHEAST, SOUTH, SOUTHWEST, WEST],
    SOUTHEAST: [NORTHEAST, EAST, SOUTHEAST, SOUTH, SOUTHWEST],
    EAST: [NORTH, NORTHEAST, EAST, SOUTHEAST, SOUTH],
    NORTHEAST: [NORTHWEST, NORTH, NORTHEAST, EAST, SOUTHEAST],
}


def _next_direction(ll, r, p, r_step, p_step, cur_dir, cur_like):
    prev = cur_like
    if cur_dir == NEUTRAL:
        return NEUTRAL, cur_like
    for d in _SCAN[cur_dir]:
        cur_dir, cur_like = _check(ll, r, p, r_step, p_step, d,
                                   cur_dir, cur_like)
    if cur_like == prev:
        return NEUTRAL, cur_like
    return cur_dir, cur_like


def _first_direction(ll, r, p, r_step, p_step):
    cur_dir = NEUTRAL
    cur_like = ll(r, p)
    for d in (NORTH, NORTHEAST, EAST, SOUTHEAST, SOUTH, SOUTHWEST, WEST,
              NORTHWEST):
        cur_dir, cur_like = _check(ll, r, p, r_step, p_step, d,
                                   cur_dir, cur_like)
    return cur_dir, cur_like


def _move(r, p, r_step, p_step, d):
    """moveInDirection (ztnb.go:243-291)."""
    if d == NEUTRAL:
        return r, p
    if d == NORTH:
        return r + r_step, p
    if d == NORTHEAST:
        return (r + r_step, p + p_step) if p + p_step < 0.999 \
            else (r + r_step, p)
    if d == EAST:
        if p + p_step <= 1:
            return r, p + p_step
        raise ArithmeticError("collision with parameter space barrier")
    if d == SOUTHEAST:
        if r - r_step < 0.001 and p + p_step > 0.999:
            raise ArithmeticError("collision with parameter space barrier")
        if r - r_step < 0.001:
            return r, p + p_step
        if p + p_step > 0.999:
            return r - r_step, p
        return r - r_step, p + p_step
    if d == SOUTH:
        if r - r_step < 0.001:
            raise ArithmeticError("collision with parameter space barrier")
        return r - r_step, p
    if d == SOUTHWEST:
        if r - r_step < 0.001 and p - p_step < 0.001:
            raise ArithmeticError("collision with parameter space barrier")
        if r - r_step < 0.001:
            return r, p - p_step
        return r - r_step, p - p_step
    if d == WEST:
        if p - p_step <= 0:
            raise ArithmeticError("collision with parameter space barrier")
        return r, p - p_step
    # NORTHWEST
    if p - p_step <= 0:
        return r + r_step, p
    return r + r_step, p - p_step


def zero_truncated_negative_binomial(data: list[int], r: float, p: float,
                                     r_step: float, p_step: float):
    """fit.ZeroTruncatedNegativeBinomial (ztnb.go:297): maximum-likelihood
    ZTNB fit to histogram counts via 8-direction coordinate ascent."""
    if r <= 0:
        raise ValueError(f"initial R must be > 0, found {r}")
    if p <= 0 or p >= 1:
        raise ValueError(f"initial P must be a valid probability: {p}")
    ll = _ZtnbLikelihood(data)
    cur_dir, cur_like = _first_direction(ll, r, p, r_step, p_step)
    while cur_dir != NEUTRAL:
        r, p = _move(r, p, r_step, p_step, cur_dir)
        cur_dir, cur_like = _next_direction(ll, r, p, r_step, p_step,
                                            cur_dir, cur_like)
    return r, p
