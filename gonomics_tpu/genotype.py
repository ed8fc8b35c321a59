"""Bayesian genotype callers (reference: sam/diploidBase.go, haploid.go,
ancientDiploidBase.go).

The diploid caller scores 10 genotypes from pile base counts with
genotype-specific likelihoods (flat error epsilon; optional ancient-DNA
cytosine deamination rate lambda) times transition/transversion-aware
priors. Implemented both per-pile (reference semantics, first-max tie
like a deterministic RandIntInRange) and batched over many piles as
(P, 10) matrix ops — the TPU-friendly form.
"""

from __future__ import annotations

import math

import numpy as np

from . import dna
from .pileup import Pile

(AA, AC, AG, AT, CC, CG, CT, GG, GT, TT, NN) = range(11)

GENOTYPE_STRINGS = ["AA", "AC", "AG", "AT", "CC", "CG", "CT", "GG", "GT",
                    "TT", "NN"]

_GENO_BASES = [(dna.A, dna.A), (dna.A, dna.C), (dna.A, dna.G),
               (dna.A, dna.T), (dna.C, dna.C), (dna.C, dna.G),
               (dna.C, dna.T), (dna.G, dna.G), (dna.G, dna.T),
               (dna.T, dna.T), (dna.N, dna.N)]


def diploid_base_to_bases(geno: int):
    return _GENO_BASES[geno]


def ref_base_to_ref_genotype(ref: int) -> int:
    return {dna.A: AA, dna.C: CC, dna.G: GG, dna.T: TT, dna.N: NN}[ref]


def make_diploid_base_prior_cache(delta: float, gamma: float) -> np.ndarray:
    """MakeDiploidBasePriorCache (diploidBase.go:259): (4 refs x 10
    genotypes) log priors with Tv = delta/(2+gamma), Tr = gamma*Tv."""
    tv = delta / (2.0 + gamma)
    tr = gamma * tv
    omd2 = math.log((1 - delta) ** 2)
    tv2 = math.log(tv * tv)
    tr2 = math.log(tr * tr)
    tvtr = math.log(tv * tr)
    two_tv2 = math.log(2 * tv * tv)
    two_omd_tv = math.log(2 * (1 - delta) * tv)
    two_omd_tr = math.log(2 * (1 - delta) * tr)
    return np.array([
        [omd2, two_omd_tv, two_omd_tr, two_omd_tv, tv2, tvtr, two_tv2,
         tr2, tvtr, tv2],
        [tv2, two_omd_tv, two_tv2, tvtr, omd2, two_omd_tv, two_omd_tr,
         tv2, tvtr, tr2],
        [tr2, tvtr, two_omd_tr, tvtr, tv2, two_omd_tv, two_tv2, omd2,
         two_omd_tv, tv2],
        [tv2, tvtr, two_tv2, two_omd_tv, tr2, tvtr, two_omd_tr, two_tv2,
         two_omd_tv, omd2]])


def make_diploid_base_flat_prior_cache() -> np.ndarray:
    return np.full((4, 10), math.log(0.1))


def _log(x: float) -> float:
    return math.log(x) if x > 0 else float("-inf")


def base_log_likelihoods(counts: np.ndarray, epsilon: float,
                         lam: float = 0.0) -> np.ndarray:
    """(P, 10) log likelihoods from (P, 4) ACGT counts. lam > 0 switches
    to the ancient-DNA deamination model (ancientDiploidBase.go:28)."""
    counts = np.atleast_2d(np.asarray(counts, np.float64))
    a, c, g, t = counts[:, 0], counts[:, 1], counts[:, 2], counts[:, 3]
    e3 = _log(epsilon / 3.0)
    if lam <= 0:
        ome = _log(1.0 - epsilon)
        het = _log(0.5 - epsilon / 3.0)
        cols = [
            ome * a + e3 * (c + g + t),              # AA
            het * (a + c) + e3 * (g + t),            # AC
            het * (a + g) + e3 * (c + t),            # AG
            het * (a + t) + e3 * (c + g),            # AT
            ome * c + e3 * (a + g + t),              # CC
            het * (c + g) + e3 * (a + t),            # CG
            het * (c + t) + e3 * (a + g),            # CT
            ome * g + e3 * (a + c + t),              # GG
            het * (g + t) + e3 * (a + c),            # GT
            ome * t + e3 * (a + c + g),              # TT
        ]
    else:
        ome_l = _log(1.0 - epsilon - lam)
        e3_l = _log(epsilon / 3.0 + lam)
        h = _log(0.5 - epsilon / 3.0)
        e3_l2 = _log(epsilon / 3.0 + lam / 2.0)
        h_pl2 = _log(0.5 - epsilon / 3.0 + lam / 2.0)
        h_ml2 = _log(0.5 - epsilon / 3.0 - lam / 2.0)
        ome = _log(1.0 - epsilon)
        cols = [
            ome * a + e3 * (c + g + t),                       # AA
            h * a + h_ml2 * c + e3 * g + e3_l2 * t,           # AC
            h_pl2 * a + e3 * (c + t) + h_ml2 * g,             # AG
            h * (a + t) + e3 * (c + g),                       # AT
            e3 * (a + g) + ome_l * c + e3_l * t,              # CC
            e3_l2 * a + h_ml2 * (c + g) + e3_l2 * t,          # CG
            e3 * (a + g) + h_ml2 * c + h_pl2 * t,             # CT
            e3_l * a + e3 * (c + t) + ome_l * g,              # GG
            e3_l2 * a + e3 * c + h_ml2 * g + h * t,           # GT
            e3 * (a + c + g) + ome * t,                       # TT
        ]
    return np.stack(cols, axis=1)


def diploid_base_call(p: Pile, ref_base: int, prior_cache: np.ndarray,
                      epsilon: float, lam: float = 0.0) -> int:
    """DiploidBaseCallFromPile (diploidBase.go:112). Ties resolve to the
    lowest genotype index (deterministic; the reference picks randomly
    among ties with its seeded PRNG)."""
    if ref_base == dna.N:
        return NN
    counts = np.array([[p.count_f[dna.A] + p.count_r[dna.A],
                        p.count_f[dna.C] + p.count_r[dna.C],
                        p.count_f[dna.G] + p.count_r[dna.G],
                        p.count_f[dna.T] + p.count_r[dna.T]]], np.float64)
    if counts.sum() < 1:
        return ref_base_to_ref_genotype(ref_base)
    post = base_log_likelihoods(counts, epsilon, lam)[0] \
        + np.asarray(prior_cache)[ref_base]
    # reference seeds maxPosterior with the homozygous-ref genotype and
    # only replaces on strictly greater values scanning genotypes 0..9;
    # argmax-first matches because the hom-ref genotype re-appears in the
    # scan: ties with it keep the earlier (lower) index
    best = float(post[ref_base_to_ref_genotype(ref_base)])
    winners = [ref_base_to_ref_genotype(ref_base)]
    for geno in range(10):
        v = float(post[geno])
        if v > best:
            best = v
            winners = [geno]
        elif v == best and geno != winners[0]:
            winners.append(geno)
    return winners[0]


def diploid_base_call_batch(counts: np.ndarray, ref_bases: np.ndarray,
                            prior_cache: np.ndarray, epsilon: float,
                            lam: float = 0.0) -> np.ndarray:
    """Batched caller: (P, 4) counts + (P,) ref bases -> (P,) genotypes.
    jnp-compatible math (drop-in for device execution)."""
    counts = np.asarray(counts, np.float64)
    ref_bases = np.asarray(ref_bases, np.int64)
    ll = base_log_likelihoods(counts, epsilon, lam)
    prior = np.asarray(prior_cache)[np.clip(ref_bases, 0, 3)]
    post = ll + prior
    calls = np.argmax(post, axis=1).astype(np.int8)
    hom_ref = np.array([ref_base_to_ref_genotype(int(b)) if b <= 3 else NN
                        for b in ref_bases], np.int8)
    empty = counts.sum(axis=1) < 1
    calls = np.where(empty, hom_ref, calls)
    calls = np.where(ref_bases == dna.N, NN, calls)
    return calls


def haploid_base_call(p: Pile, ref_base: int, epsilon: float,
                      prior_cache: np.ndarray, lam: float = 0.0) -> int:
    """HaploidCallFromPile base portion (haploid.go:21): best of the four
    homozygous genotypes under haploid priors; returns a dna base code."""
    if ref_base == dna.N:
        return dna.N
    counts = np.array([[p.count_f[dna.A] + p.count_r[dna.A],
                        p.count_f[dna.C] + p.count_r[dna.C],
                        p.count_f[dna.G] + p.count_r[dna.G],
                        p.count_f[dna.T] + p.count_r[dna.T]]], np.float64)
    if counts.sum() < 1:
        return ref_base
    ll = base_log_likelihoods(counts, epsilon, lam)[0]
    homos = [AA, CC, GG, TT]
    post = [ll[homos[b]] + np.asarray(prior_cache)[ref_base][b]
            for b in range(4)]
    return int(np.argmax(post))


def make_haploid_base_prior_cache(delta: float, gamma: float) -> np.ndarray:
    """Haploid analog: P(base | ref) with Ts/Tv-aware divergence."""
    tv = delta / (2.0 + gamma)
    tr = gamma * tv
    out = np.full((4, 4), _log(tv))
    transitions = {(dna.A, dna.G), (dna.G, dna.A), (dna.C, dna.T),
                   (dna.T, dna.C)}
    for r in range(4):
        for b in range(4):
            if r == b:
                out[r, b] = _log(1 - delta)
            elif (r, b) in transitions:
                out[r, b] = _log(tr)
    return out
