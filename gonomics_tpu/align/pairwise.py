"""Public pairwise global-alignment API (ConstGap / AffineGap equivalents).

Mirrors the behavior of /root/reference/align/constGap.go:13 and
affineGap.go:60 exactly (scores, cigars, tie-breaking), with three
execution backends:

  - "tpu":     batched Pallas wavefront kernels (ops/wavefront.py)
  - "interpret": same kernels through the pallas interpreter (tests on CPU)
  - "numpy":   vectorized host oracle (align/oracle.py)
  - "auto":    tpu when a TPU is present, else numpy
"""

from __future__ import annotations

import numpy as np

from . import oracle
from .cigar import COL_D, COL_I, COL_M, Cigar

_MAX_CODE = 4


def _default_backend() -> str:
    import jax

    return "tpu" if jax.default_backend() == "tpu" else "numpy"


def _check(seq: np.ndarray, name: str) -> np.ndarray:
    seq = np.asarray(seq, dtype=np.int8)
    if seq.size and seq.max() > _MAX_CODE:
        raise ValueError(
            f"{name} contains non-ACGTN bases; aligners accept codes 0..4 "
            "(the reference would panic on these too, align.go:28)"
        )
    return seq


def _pad_batch(pairs):
    """Pad a list of (alpha, beta) to a common shape; returns device inputs."""
    import jax.numpy as jnp

    B = len(pairs)
    n = max(len(a) for a, _ in pairs)
    m = max(len(b) for _, b in pairs)
    Bp = max(8, -(-B // 8) * 8)
    alpha = np.full((Bp, n), 4, dtype=np.int8)
    beta = np.full((Bp, m), 4, dtype=np.int8)
    fin = np.zeros((Bp, 1), dtype=np.int32)
    ns = np.zeros(Bp, dtype=np.int32)
    for i, (a, b) in enumerate(pairs):
        alpha[i, :len(a)] = a
        beta[i, :len(b)] = b
        fin[i, 0] = len(a) + len(b)
        ns[i] = len(a)
    return jnp.asarray(alpha), jnp.asarray(beta), jnp.asarray(fin), ns, n, m


def _prio_k(m: int, i: int, d: int) -> int:
    if m >= i and m >= d:
        return 0
    return 1 if i >= d else 2


def _walk_affine(trace: np.ndarray, b: int, n: int, m: int, k0: int):
    """Host traceback from the packed per-diagonal trace tensor.
    trace[d-1, b, s] packs (tM + 4*tI + 16*tD) for cell (i=s, j=d-s)."""
    route: list[Cigar] = []

    def emit(op: int) -> None:
        if route and route[-1].op == op:
            route[-1].run_length += 1
        else:
            route.append(Cigar(1, op))

    i, j, k = n, m, k0
    while i >= 1 and j >= 1:
        emit(k)
        packed = int(trace[i + j - 1, b, i])
        if k == COL_M:
            k = packed & 3
            i, j = i - 1, j - 1
        elif k == COL_I:
            k = (packed >> 2) & 3
            j -= 1
        else:
            k = (packed >> 4) & 3
            i -= 1
    if i > 0:
        if route and route[-1].op == COL_D:
            route[-1].run_length += i
        else:
            route.append(Cigar(i, COL_D))
    elif j > 0:
        if route and route[-1].op == COL_I:
            route[-1].run_length += j
        else:
            route.append(Cigar(j, COL_I))
    route.reverse()
    return route


def _walk_const(trace: np.ndarray, b: int, n: int, m: int):
    route: list[Cigar] = []

    def emit(op: int, run: int = 1) -> None:
        if route and route[-1].op == op:
            route[-1].run_length += run
        else:
            route.append(Cigar(run, op))

    i, j = n, m
    while i >= 1 and j >= 1:
        t = int(trace[i + j - 1, b, i])
        emit(t)
        if t == COL_M:
            i, j = i - 1, j - 1
        elif t == COL_I:
            j -= 1
        else:
            i -= 1
    if i > 0:
        emit(COL_D, i)
    elif j > 0:
        emit(COL_I, j)
    route.reverse()
    return route


def affine_gap_batch(pairs, scores, gap_open: int, gap_extend: int,
                     backend: str = "auto", with_cigar: bool = True):
    """Batched AffineGap. pairs: list of (alpha, beta) int8 code arrays.
    Returns list of (score, route) — route None when with_cigar=False."""
    backend = _default_backend() if backend == "auto" else backend
    pairs = [(_check(a, "alpha"), _check(b, "beta")) for a, b in pairs]
    if backend == "numpy":
        if with_cigar:
            return [oracle.affine_gap(a, b, scores, gap_open, gap_extend)
                    for a, b in pairs]
        return [(oracle.affine_gap(a, b, scores, gap_open, gap_extend)[0], None)
                for a, b in pairs]

    from ..ops.wavefront import wavefront_align

    interpret = backend == "interpret"
    alpha, beta, fin, ns, n, m = _pad_batch(pairs)
    if with_cigar:
        from ..ops.wavefront import profile_fits16

        rm, ri, rd, trace = wavefront_align(
            alpha, beta, fin, scores, n=n, m=m, gap_open=gap_open,
            gap_extend=gap_extend, with_trace=True, mode="affine",
            interpret=interpret, prof16=profile_fits16(scores))
        rm, ri, rd = np.asarray(rm), np.asarray(ri), np.asarray(rd)
        trace = np.asarray(trace)
        out = []
        for b, (a_seq, b_seq) in enumerate(pairs):
            nb, mb = len(a_seq), len(b_seq)
            fm, fi, fd = int(rm[b, nb]), int(ri[b, nb]), int(rd[b, nb])
            k0 = _prio_k(fm, fi, fd)
            score = (fm, fi, fd)[k0]
            out.append((score, _walk_affine(trace, b, nb, mb, k0)))
        return out
    from ..ops.wavefront import profile_fits16

    res = np.asarray(wavefront_align(
        alpha, beta, fin, scores, n=n, m=m, gap_open=gap_open,
        gap_extend=gap_extend, with_trace=False, mode="affine",
        interpret=interpret, prof16=profile_fits16(scores)))
    return [(int(res[b, len(a)]), None) for b, (a, _) in enumerate(pairs)]


def const_gap_batch(pairs, scores, gap_pen: int, backend: str = "auto",
                    with_cigar: bool = True):
    backend = _default_backend() if backend == "auto" else backend
    pairs = [(_check(a, "alpha"), _check(b, "beta")) for a, b in pairs]
    if backend == "numpy":
        if with_cigar:
            return [oracle.const_gap(a, b, scores, gap_pen) for a, b in pairs]
        return [(oracle.const_gap(a, b, scores, gap_pen)[0], None)
                for a, b in pairs]

    from ..ops.wavefront import wavefront_align

    interpret = backend == "interpret"
    alpha, beta, fin, ns, n, m = _pad_batch(pairs)
    if with_cigar:
        res, trace = wavefront_align(
            alpha, beta, fin, scores, n=n, m=m, gap_open=gap_pen,
            gap_extend=0, with_trace=True, mode="const", interpret=interpret)
        res = np.asarray(res)
        trace = np.asarray(trace)
        return [(int(res[b, len(a)]), _walk_const(trace, b, len(a), len(bb)))
                for b, (a, bb) in enumerate(pairs)]
    res = np.asarray(wavefront_align(
        alpha, beta, fin, scores, n=n, m=m, gap_open=gap_pen, gap_extend=0,
        with_trace=False, mode="const", interpret=interpret))
    return [(int(res[b, len(a)]), None) for b, (a, _) in enumerate(pairs)]


def affine_gap_lowmem(alpha, beta, scores, gap_open: int, gap_extend: int,
                      checkersize: int = 4096, backend: str = "auto"):
    """align.AffineGap_customizeCheckersize (affineGap.go:73): O(n+m)-memory
    affine alignment via tiled checkpoint + recompute traceback
    (ops/wavefront.affine_gap_lowmem). For chromosome-scale pairs where the
    full trace tensor would not fit HBM. Same (score, route) contract as
    affine_gap."""
    backend = _default_backend() if backend == "auto" else backend
    alpha = _check(alpha, "alpha")
    beta = _check(beta, "beta")
    if backend == "numpy":
        return oracle.affine_gap(alpha, beta, scores, gap_open, gap_extend)

    from ..ops import wavefront

    score, ops_back, i0, j0 = wavefront.affine_gap_lowmem(
        alpha, beta, scores, gap_open, gap_extend, checkersize=checkersize,
        interpret=(backend == "interpret"))
    route: list[Cigar] = []

    def emit(op: int, run: int = 1) -> None:
        if route and route[-1].op == op:
            route[-1].run_length += run
        else:
            route.append(Cigar(run, op))

    for op in ops_back:
        emit(int(op))
    if i0 > 0:
        emit(COL_D, int(i0))
    elif j0 > 0:
        emit(COL_I, int(j0))
    route.reverse()
    return score, route


def affine_gap(alpha, beta, scores, gap_open: int, gap_extend: int,
               backend: str = "auto"):
    """align.AffineGap (affineGap.go:60): single pair -> (score, route)."""
    return affine_gap_batch([(alpha, beta)], scores, gap_open, gap_extend,
                            backend=backend)[0]


def const_gap(alpha, beta, scores, gap_pen: int, backend: str = "auto"):
    """align.ConstGap (constGap.go:13): single pair -> (score, route)."""
    return const_gap_batch([(alpha, beta)], scores, gap_pen,
                           backend=backend)[0]
