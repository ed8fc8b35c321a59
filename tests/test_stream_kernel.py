"""Two-pairs-per-lane streamed affine wavefront (ops/wavefront.py
wavefront_affine_stream) vs the numpy oracle.

The stream kernel fills the triangular wavefront ramp by staggering P
pairs g = m_pad+1 diagonals apart in one lane set (PERF_NOTES.md lever
(a)); scores must match align.AffineGap semantics exactly
(reference align/affineGap.go:151-207)."""

import numpy as np
import jax.numpy as jnp
import pytest

from gonomics_tpu.align import oracle
from gonomics_tpu.align.matrices import HUMAN_CHIMP_TWO
from gonomics_tpu.ops.wavefront import wavefront_affine_stream


def _check(P, B, n, m, seed):
    rng = np.random.default_rng(seed)
    alpha = rng.integers(0, 4, (P, B, n)).astype(np.int8)
    beta = rng.integers(0, 5, (P, B, m)).astype(np.int8)
    got = np.asarray(wavefront_affine_stream(
        jnp.asarray(alpha), jnp.asarray(beta), HUMAN_CHIMP_TWO,
        n=n, m=m, gap_open=-600, gap_extend=-150, interpret=True))
    for p in range(P):
        for b in range(B):
            want, _ = oracle.affine_gap(alpha[p, b], beta[p, b],
                                        HUMAN_CHIMP_TWO, -600, -150)
            assert got[p, b] == want, (p, b, got[p, b], want)


def test_stream_square():
    _check(P=4, B=2, n=17, m=17, seed=1)


def test_stream_rectangular_padded_m():
    # m even forces the internal odd m_pad path; m > n exercises stagger
    _check(P=2, B=2, n=9, m=14, seed=2)


def test_stream_rejects_bad_shapes():
    a = jnp.zeros((3, 1, 4), jnp.int8)
    b = jnp.zeros((3, 1, 4), jnp.int8)
    with pytest.raises(ValueError):
        wavefront_affine_stream(a, b, HUMAN_CHIMP_TWO, n=4, m=4,
                                gap_open=-600, gap_extend=-150,
                                interpret=True)
    a = jnp.zeros((2, 1, 6), jnp.int8)
    b = jnp.zeros((2, 1, 4), jnp.int8)
    with pytest.raises(ValueError):
        wavefront_affine_stream(a, b, HUMAN_CHIMP_TWO, n=6, m=4,
                                gap_open=-600, gap_extend=-150,
                                interpret=True)
