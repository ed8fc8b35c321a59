"""Tiled checkpoint+recompute affine alignment (ops/wavefront
affine_gap_lowmem) vs the numpy oracle — scores AND cigars byte-equal
(the reference checkerboard contract, align/affineGap.go:73)."""

import numpy as np
import pytest

from gonomics_tpu.align import oracle, pairwise
from gonomics_tpu.align.matrices import HUMAN_CHIMP_TWO


@pytest.mark.parametrize("n,m,checkersize,seed", [
    (20, 20, 16, 0),
    (50, 90, 16, 1),
    (90, 50, 32, 2),
    (64, 64, 64, 3),    # single block
    (33, 71, 8, 4),     # many tiny blocks
    (1, 40, 16, 5),     # degenerate alpha
    (40, 1, 16, 6),     # degenerate beta
])
def test_lowmem_matches_oracle(n, m, checkersize, seed):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 4, n).astype(np.int8)
    b = rng.integers(0, 4, m).astype(np.int8)
    want_score, want_route = oracle.affine_gap(a, b, HUMAN_CHIMP_TWO,
                                               -600, -150)
    got_score, got_route = pairwise.affine_gap_lowmem(
        a, b, HUMAN_CHIMP_TWO, -600, -150, checkersize=checkersize,
        backend="interpret")
    assert got_score == want_score
    assert [(c.run_length, c.op) for c in got_route] == \
        [(c.run_length, c.op) for c in want_route]


def test_lowmem_related_sequences():
    # related pair (mutations + one indel) — realistic cigar structure
    rng = np.random.default_rng(9)
    a = rng.integers(0, 4, 120).astype(np.int8)
    b = a.copy()
    for p in rng.integers(0, 120, 6):
        b[p] = (b[p] + 1) % 4
    b = np.concatenate([b[:60], rng.integers(0, 4, 5).astype(np.int8),
                        b[60:]])
    want = oracle.affine_gap(a, b, HUMAN_CHIMP_TWO, -600, -150)
    got = pairwise.affine_gap_lowmem(a, b, HUMAN_CHIMP_TWO, -600, -150,
                                     checkersize=32, backend="interpret")
    assert got[0] == want[0]
    assert [(c.run_length, c.op) for c in got[1]] == \
        [(c.run_length, c.op) for c in want[1]]


def test_lowmem_cigar_consumes_sequences():
    from gonomics_tpu.align.cigar import COL_D, COL_I, COL_M

    rng = np.random.default_rng(11)
    a = rng.integers(0, 4, 75).astype(np.int8)
    b = rng.integers(0, 4, 88).astype(np.int8)
    score, route = pairwise.affine_gap_lowmem(
        a, b, HUMAN_CHIMP_TWO, -600, -150, checkersize=16,
        backend="interpret")
    n_used = sum(c.run_length for c in route if c.op in (COL_M, COL_D))
    m_used = sum(c.run_length for c in route if c.op in (COL_M, COL_I))
    assert (n_used, m_used) == (75, 88)


def test_lowmem_batch_matches_oracle():
    # B pairs with DIFFERENT content (and so different traceback
    # corridors) through one batched forward + per-pair windowed bwd
    from gonomics_tpu.ops.wavefront import affine_gap_lowmem_batch

    rng = np.random.default_rng(21)
    B, n, m = 5, 70, 90
    alphas = rng.integers(0, 4, (B, n)).astype(np.int8)
    betas = rng.integers(0, 4, (B, m)).astype(np.int8)
    # make one pair highly similar (straight corridor) and one adversarial
    betas[2, :n] = alphas[2]
    res = affine_gap_lowmem_batch(alphas, betas, HUMAN_CHIMP_TWO,
                                  -600, -150, checkersize=16,
                                  interpret=True)
    for b in range(B):
        want_score, want_route = oracle.affine_gap(
            alphas[b], betas[b], HUMAN_CHIMP_TWO, -600, -150)
        score, ops, i0, j0 = res[b]
        assert score == want_score, b
        # replay ops (backward M/I/D from (n, m)); the walk may stop on
        # a boundary with a residual pure-gap run (i0/j0 > 0)
        i, j = n, m
        for op in ops:
            op = int(op)
            if op == 0:
                i, j = i - 1, j - 1
            elif op == 1:
                j -= 1
            else:
                i -= 1
        assert (i, j) == (i0, j0)
        assert i0 == 0 or j0 == 0
