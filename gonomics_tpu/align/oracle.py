"""CPU (numpy) pairwise global aligners with exact reference semantics.

Behavioral counterpart of /root/reference/align/constGap.go:73-278 and
/root/reference/align/affineGap.go:151-344. Used as the host fallback path
and as the oracle the Pallas wavefront kernels are verified against.

Implementation notes:
  - Scores are int64 like the reference; NEG plays veryNegNum's role.
  - Rows are numpy-vectorized. The within-row horizontal dependency
    H[j] = max(c[j], H[j-1] + gap) is solved exactly with a running max:
    H[j] = max_k<=j (c[k] + (j-k)*gap) = j*gap + cummax(c[j] - j*gap).
  - Tie-breaking matches tripleMaxTrace (align.go:78): prefer M, then I,
    then D. ColI consumes beta (horizontal), ColD consumes alpha (vertical).
"""

from __future__ import annotations

import numpy as np

from .cigar import COL_D, COL_I, COL_M, Cigar

NEG = -(2 ** 62)  # veryNegNum analog; large enough to never win a max


def _priority_argmax3(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """tripleMaxTrace tie order: M(0) >= I(1) >= D(2)."""
    return np.where((a >= b) & (a >= c), 0, np.where(b >= c, 1, 2)).astype(np.uint8)


def _scan_max_plus(c: np.ndarray, step: int) -> np.ndarray:
    """H[j] = max(c[j], H[j-1] + step) solved as a cumulative max."""
    j = np.arange(len(c), dtype=np.int64)
    shifted = c - j * step
    return np.maximum.accumulate(shifted) + j * step


def _score_rows(alpha: np.ndarray, beta: np.ndarray, scores: np.ndarray):
    """Per-row substitution score vectors: row i gives s[j] = scores[alpha[i-1], beta[j-1]]."""
    scores = np.asarray(scores, dtype=np.int64)
    return scores[np.asarray(alpha, dtype=np.int64)][:, np.asarray(beta, dtype=np.int64)]


def const_gap(alpha, beta, scores, gap_pen: int):
    """align.ConstGap (constGap.go:13): returns (score, [Cigar])."""
    alpha = np.asarray(alpha)
    beta = np.asarray(beta)
    n, m = len(alpha), len(beta)
    gap = int(gap_pen)
    sub = _score_rows(alpha, beta, scores)  # (n, m)

    # trace[i-1, j-1] is the move taken into interior cell (i, j)
    trace = np.zeros((n, m), dtype=np.uint8)
    prev = np.arange(m + 1, dtype=np.int64) * gap  # row 0
    for i in range(1, n + 1):
        diag = prev[:-1] + sub[i - 1]          # from (i-1, j-1)
        up = prev[1:] + gap                    # from (i-1, j) -> ColD
        best = np.maximum(diag, up)
        # cur[j] = max(best[j], cur[j-1] + gap), seeded by cur[0] = i*gap
        seed = np.concatenate(([np.int64(i) * gap], best))
        cur = _scan_max_plus(seed, gap)
        left = cur[:-1] + gap                  # from (i, j-1) -> ColI
        trace[i - 1] = _priority_argmax3(diag, left, up)
        prev = cur

    score = int(prev[m])
    route = _walk(trace, None, None, n, m, 0)
    return score, route


def affine_gap(alpha, beta, scores, gap_open: int, gap_extend: int):
    """align.AffineGap (affineGap.go:60): returns (score, [Cigar]).

    3-state Gotoh with the reference's exact recurrences and boundaries
    (affineGap.go:158-207)."""
    alpha = np.asarray(alpha)
    beta = np.asarray(beta)
    sub = _score_rows(alpha, beta, scores)
    return affine_gap_from_sub(sub, gap_open, gap_extend)


def affine_gap_from_sub(sub: np.ndarray, gap_open: int, gap_extend: int):
    """Affine DP over a precomputed (n, m) per-cell substitution matrix —
    the form used by multipleAffineGap (group-column scores)."""
    n, m = sub.shape
    go_, ge = int(gap_open), int(gap_extend)

    tM = np.zeros((n, m), dtype=np.uint8)
    tI = np.zeros((n, m), dtype=np.uint8)
    tD = np.zeros((n, m), dtype=np.uint8)

    # Row 0 (affineGap.go:159-175): M[0][0]=0, I[0][0]=D[0][0]=gapOpen;
    # M[0][j]=NEG, I[0][j]=I[0][j-1]+ext, D[0][j]=NEG for j>0.
    j_idx = np.arange(m + 1, dtype=np.int64)
    Mp = np.full(m + 1, NEG, dtype=np.int64)
    Mp[0] = 0
    Ip = go_ + ge * j_idx
    Ip[0] = go_
    Dp = np.full(m + 1, NEG, dtype=np.int64)
    Dp[0] = go_

    for i in range(1, n + 1):
        s = sub[i - 1]
        # M[i][j] = s + max(Mp[j-1], Ip[j-1], Dp[j-1])
        Mc = np.empty(m + 1, dtype=np.int64)
        Mc[0] = NEG
        Mc[1:] = s + np.maximum(np.maximum(Mp[:-1], Ip[:-1]), Dp[:-1])
        tM[i - 1] = _priority_argmax3(Mp[:-1], Ip[:-1], Dp[:-1])

        # D[i][j] = max(go+ge+Mp[j], go+ge+Ip[j], ge+Dp[j])
        Dc = np.empty(m + 1, dtype=np.int64)
        Dc[0] = ge + Dp[0] if i > 0 else go_
        Dc[1:] = np.maximum(np.maximum(go_ + ge + Mp[1:], go_ + ge + Ip[1:]),
                            ge + Dp[1:])
        tD[i - 1] = _priority_argmax3(go_ + ge + Mp[1:], go_ + ge + Ip[1:],
                                      ge + Dp[1:])

        # I[i][j] = max(go+ge+Mc[j-1], ge+Ic[j-1], go+ge+Dc[j-1])
        # Mc, Dc of the current row are fully known; solve the I scan.
        c_in = go_ + ge + np.maximum(Mc[:-1], Dc[:-1])  # candidate openings
        seed = np.concatenate(([np.int64(NEG)], c_in))  # I[i][0] = NEG
        Ic = _scan_max_plus(seed, ge)
        aI = go_ + ge + Mc[:-1]
        bI = ge + Ic[:-1]
        cI = go_ + ge + Dc[:-1]
        tI[i - 1] = _priority_argmax3(aI, bI, cI)
        # Recompute Ic respecting exact tie order (scan gives max; equal).
        Mp, Ip, Dp = Mc, Ic, Dc

    finals = np.array([Mp[m], Ip[m], Dp[m]], dtype=np.int64)
    k0 = int(_priority_argmax3(finals[0:1], finals[1:2], finals[2:3])[0])
    score = int(finals[k0])
    route = _walk(tM, tI, tD, n, m, k0, affine=True)
    return score, route


def affine_gap_local(target, beta, scores, gap_open: int, gap_extend: int):
    """align.AffineGapLocal (affineGap_highMem.go:105): affine alignment
    with free end gaps in the target (D state costs 0 at the boundaries
    and in the last query column)."""
    alpha = np.asarray(target)
    beta = np.asarray(beta)
    n, m = len(alpha), len(beta)
    go_, ge = int(gap_open), int(gap_extend)
    sub = _score_rows(alpha, beta, scores)

    tM = np.zeros((n, m), dtype=np.uint8)
    tI = np.zeros((n, m), dtype=np.uint8)
    tD = np.zeros((n, m), dtype=np.uint8)

    j_idx = np.arange(m + 1, dtype=np.int64)
    Mp = np.full(m + 1, NEG, dtype=np.int64)
    Mp[0] = 0
    Ip = go_ + ge * j_idx
    Ip[0] = go_
    Dp = np.full(m + 1, NEG, dtype=np.int64)
    Dp[0] = 0  # free left gap

    for i in range(1, n + 1):
        s = sub[i - 1]
        Mc = np.empty(m + 1, dtype=np.int64)
        Mc[0] = NEG
        Mc[1:] = s + np.maximum(np.maximum(Mp[:-1], Ip[:-1]), Dp[:-1])
        tM[i - 1] = _priority_argmax3(Mp[:-1], Ip[:-1], Dp[:-1])

        Dc = np.empty(m + 1, dtype=np.int64)
        Dc[0] = 0 + Dp[0]  # free left gap column
        aD = go_ + ge + Mp[1:]
        bD = go_ + ge + Ip[1:]
        cD = ge + Dp[1:]
        Dc[1:] = np.maximum(np.maximum(aD, bD), cD)
        tD[i - 1] = _priority_argmax3(aD, bD, cD)
        # free end gap: last column D transitions cost 0
        Dc[m] = max(Mp[m], Ip[m], Dp[m])
        tD[i - 1, m - 1] = _priority_argmax3(
            np.array([Mp[m]]), np.array([Ip[m]]), np.array([Dp[m]]))[0]

        c_in = go_ + ge + np.maximum(Mc[:-1], Dc[:-1])
        seed = np.concatenate(([np.int64(NEG)], c_in))
        Ic = _scan_max_plus(seed, ge)
        aI = go_ + ge + Mc[:-1]
        bI = ge + Ic[:-1]
        cI = go_ + ge + Dc[:-1]
        tI[i - 1] = _priority_argmax3(aI, bI, cI)
        Mp, Ip, Dp = Mc, Ic, Dc

    finals = np.array([Mp[m], Ip[m], Dp[m]], dtype=np.int64)
    k0 = int(_priority_argmax3(finals[0:1], finals[1:2], finals[2:3])[0])
    score = int(finals[k0])
    route = _walk(tM, tI, tD, n, m, k0, affine=True)
    return score, route


def _walk(tM, tI, tD, n: int, m: int, k0: int, affine: bool = False):
    """Traceback walk. Replicates writeCigar + lastCigar semantics
    (constGap.go:186-252, affineGap.go:287-344): for affine, the op emitted
    at each step is the current state; the trace entry gives the
    predecessor state. After reaching row 0 or column 0, the remaining
    run is a single D (down column 0) or I (along row 0)."""
    route: list[Cigar] = []

    def emit(op: int) -> None:
        if route and route[-1].op == op:
            route[-1].run_length += 1
        else:
            route.append(Cigar(1, op))

    i, j = n, m
    if affine:
        k = k0
        while i >= 1 and j >= 1:
            emit(k)
            if k == COL_M:
                nk = int(tM[i - 1, j - 1])
                i, j = i - 1, j - 1
            elif k == COL_I:
                nk = int(tI[i - 1, j - 1])
                j -= 1
            else:
                nk = int(tD[i - 1, j - 1])
                i -= 1
            k = nk
    else:
        while i >= 1 and j >= 1:
            t = int(tM[i - 1, j - 1])
            emit(t)
            if t == COL_M:
                i, j = i - 1, j - 1
            elif t == COL_I:
                j -= 1
            else:
                i -= 1

    if i > 0:
        for _ in range(i):
            emit(COL_D)
    elif j > 0:
        for _ in range(j):
            emit(COL_I)

    route.reverse()
    # reversing flips run order; runs themselves are order-independent,
    # but adjacent equal ops may now be mergeable
    merged: list[Cigar] = []
    for c in route:
        if merged and merged[-1].op == c.op:
            merged[-1].run_length += c.run_length
        else:
            merged.append(c)
    return merged
