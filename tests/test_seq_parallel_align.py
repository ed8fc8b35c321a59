"""Sequence-parallel traceback (VERDICT r3 item 6): the lane-sharded
wavefront forward + lowmem backward must produce byte-exact affine
cigars across the virtual device mesh.

Reference scheme: /root/reference/align/affineGap.go:20-54,219-273
(checkerboard lowmem traceback); multi-chip design SURVEY.md §5."""

import numpy as np
import pytest

from gonomics_tpu.align import oracle
from gonomics_tpu.align.matrices import HUMAN_CHIMP_TWO
from gonomics_tpu.ops.wavefront import affine_gap_lowmem_batch
from gonomics_tpu.parallel import make_mesh, shard_seq_affine_align


@pytest.fixture(scope="module")
def mesh8():
    return make_mesh(8, data=1, seq=8)


def test_small_vs_oracle(mesh8):
    rng = np.random.default_rng(3)
    B, n = 2, 300
    a = rng.integers(0, 4, (B, n)).astype(np.int8)
    b = rng.integers(0, 4, (B, n)).astype(np.int8)
    fn = shard_seq_affine_align(mesh8, HUMAN_CHIMP_TWO, n=n, m=n,
                                gap_open=-600, gap_extend=-150,
                                checkersize=128, interpret=True)
    got = fn(a, b)
    want = affine_gap_lowmem_batch(a, b, HUMAN_CHIMP_TWO, -600, -150,
                                   checkersize=128, interpret=True)
    for i in range(B):
        ws, _ = oracle.affine_gap(a[i], b[i], HUMAN_CHIMP_TWO, -600, -150)
        gs, gops, gi, gj = got[i]
        ls, lops, li, lj = want[i]
        assert gs == ws == ls
        assert np.array_equal(gops, lops)
        # walk stop cell matches the single-chip path (callers prepend
        # the remaining boundary-gap run, the lowmem contract)
        assert (gi, gj) == (li, lj)


@pytest.mark.slow
def test_16k_cigars_slow(mesh8):
    """The COVERAGE claim made reproducible (VERDICT r4 weak item 5):
    byte-exact sharded cigars at 16384 x 16384, B=1, interpret mode.
    ~10 min on the 8-device virtual CPU mesh; run with -m slow."""
    rng = np.random.default_rng(16)
    n = 16384
    ref = rng.integers(0, 4, n).astype(np.int8)
    mut = np.where(rng.random(n) < 0.02, (ref + 1) % 4,
                   ref).astype(np.int8)
    qry = np.concatenate([mut[:5000], mut[5023:],
                          rng.integers(0, 4, 23).astype(np.int8)])
    a = ref[None]
    b = qry[None].astype(np.int8)
    fn = shard_seq_affine_align(mesh8, HUMAN_CHIMP_TWO, n=n, m=n,
                                gap_open=-600, gap_extend=-150,
                                checkersize=1024, interpret=True)
    [(gs, gops, gi, gj)] = fn(a, b)
    [(ls, lops, li, lj)] = affine_gap_lowmem_batch(
        a, b, HUMAN_CHIMP_TWO, -600, -150, checkersize=1024,
        interpret=True)
    assert gs == ls
    assert np.array_equal(gops, lops)
    assert (gi, gj) == (li, lj)
    assert (gops == 1).any() and (gops == 2).any()


def test_indels_vs_lowmem(mesh8):
    """Diverged pair with a deletion + insertion: the sharded path's ops
    must equal the single-chip lowmem path exactly."""
    rng = np.random.default_rng(7)
    n = 1024
    ref = rng.integers(0, 4, n).astype(np.int8)
    mut = ref.copy()
    snp = rng.random(n) < 0.02
    mut = np.where(snp, (mut + 1) % 4, mut).astype(np.int8)
    qry = np.concatenate([mut[:400], mut[412:],
                          rng.integers(0, 4, 12).astype(np.int8)])
    a = ref[None]
    b = qry[None].astype(np.int8)
    fn = shard_seq_affine_align(mesh8, HUMAN_CHIMP_TWO, n=n, m=n,
                                gap_open=-600, gap_extend=-150,
                                checkersize=256, interpret=True)
    [(gs, gops, gi, gj)] = fn(a, b)
    [(ls, lops, li, lj)] = affine_gap_lowmem_batch(
        a, b, HUMAN_CHIMP_TWO, -600, -150, checkersize=256,
        interpret=True)
    assert gs == ls
    assert np.array_equal(gops, lops)
    assert (gi, gj) == (li, lj) == (0, 0)
    # the cigar contains real indel ops
    assert (gops == 1).any() and (gops == 2).any()
