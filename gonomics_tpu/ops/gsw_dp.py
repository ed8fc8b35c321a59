"""Batched device DP for the graph aligner's extension alignments.

These are the TPU counterparts of gsw.left_dynamic_aln /
gsw.right_dynamic_aln (reference genomeGraph/search.go:234-321): the
O(ext^2) per-seed extension DPs that dominate graph alignment. The graph
traversal stays on host (bounded DAG walk, SURVEY.md P2 hard-part 4);
every (window, read-part) leaf across all seeds/reads in a batch is
evaluated in ONE wavefront kernel launch here, and the host replays the
reference's exact selection logic with the precomputed results.

Outputs are bit-identical to the numpy versions: score, walk-order
route (run-length CigarOps, backward from the anchor), and stop/argmax
coordinates, including tripleMaxTrace tie-breaks and the row-major
first-max rule of RightDynamicAln.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..io.cigar import CigarOp
from .wavefront import _round_up, wavefront_gsw_right, wavefront_local


@functools.partial(jax.jit, static_argnames=("D", "S"))
def _walk_left(trace, i_end, j_end, active0, *, D: int, S: int):
    """Backward walk from (la, lb) while cell values stay positive (trace
    code 3 = zero cell). Codes 0=M, 1=left('I'), 2=up('D'), 4=inactive."""
    B = trace.shape[1]
    bidx = jnp.arange(B)

    def step(carry, _):
        i, j, active = carry
        cont = active & (i > 0) & (j > 0)
        d = jnp.clip(i + j - 1, 0, D - 1)
        t_raw = trace[d, bidx, jnp.clip(i, 0, S - 1)].astype(jnp.int32)
        t_eff = jnp.where(cont & (t_raw != 3), t_raw, 4)
        ni = i - jnp.where((t_eff == 0) | (t_eff == 2), 1, 0)
        nj = j - jnp.where((t_eff == 0) | (t_eff == 1), 1, 0)
        nactive = cont & (t_raw != 3)
        return (ni, nj, nactive), t_eff.astype(jnp.int8)

    (i0, j0, _), ops = jax.lax.scan(step, (i_end, j_end, active0), None,
                                    length=D)
    return i0, j0, ops.T  # (B, D)


@functools.partial(jax.jit, static_argnames=("D", "S"))
def _walk_right(trace, i_end, j_end, *, D: int, S: int):
    """Backward walk from the best cell all the way to the origin
    (while i > 0 or j > 0); boundary rows carry codes 1/2."""
    B = trace.shape[1]
    bidx = jnp.arange(B)

    def step(carry, _):
        i, j = carry
        cont = (i > 0) | (j > 0)
        d = jnp.clip(i + j - 1, 0, D - 1)
        t_raw = trace[d, bidx, jnp.clip(i, 0, S - 1)].astype(jnp.int32)
        t_eff = jnp.where(cont, t_raw, 4)
        ni = i - jnp.where((t_eff == 0) | (t_eff == 2), 1, 0)
        nj = j - jnp.where((t_eff == 0) | (t_eff == 1), 1, 0)
        return (jnp.maximum(ni, 0), jnp.maximum(nj, 0)), t_eff.astype(jnp.int8)

    (_, _), ops = jax.lax.scan(step, (i_end, j_end), None, length=D)
    return ops.T


def _routes_walk_order(ops: np.ndarray) -> list[list[CigarOp]]:
    """RLE the backward op codes into walk-order routes (NOT reversed —
    the graph traversal applies the reference's per-level reversals)."""
    B, D = ops.shape
    stop = ops >= 3
    row_ends = np.where(stop.any(axis=1), stop.argmax(axis=1), D)
    col = np.arange(D)[None, :]
    valid = col < row_ends[:, None]
    change = np.ones((B, D), bool)
    change[:, 1:] = ops[:, 1:] != ops[:, :-1]
    change &= valid
    rows, starts = np.nonzero(change)
    routes: list[list[CigarOp]] = [[] for _ in range(B)]
    if len(rows) == 0:
        return routes
    run_ops = ops[rows, starts]
    ends = np.empty_like(starts)
    same_row = rows[:-1] == rows[1:]
    ends[:-1] = np.where(same_row, starts[1:], row_ends[rows[:-1]])
    ends[-1] = row_ends[rows[-1]]
    chars = "MID"
    for r, o, ln in zip(rows.tolist(), run_ops.tolist(),
                        (ends - starts).tolist()):
        routes[r].append(CigarOp(ln, chars[o]))
    return routes


def _pad_jobs(jobs, n: int, m: int):
    """jobs: list of (alpha, beta) int8 arrays -> padded batch tensors."""
    B = len(jobs)
    al = np.full((B, n), 4, np.int8)
    be = np.full((B, m), 4, np.int8)
    nv = np.zeros((B, 1), np.int32)
    mv = np.zeros((B, 1), np.int32)
    for b, (a, bb) in enumerate(jobs):
        al[b, :len(a)] = a
        be[b, :len(bb)] = bb
        nv[b, 0] = len(a)
        mv[b, 0] = len(bb)
    return al, be, nv, mv


class GswDpBatch:
    """Evaluate a batch of left/right extension DPs on device.

    Results match gsw.left_dynamic_aln / gsw.right_dynamic_aln exactly:
    left -> (score, route, i_stop, j_stop); right -> (score, route,
    max_i, max_j). Lengths are bucketed to multiples of 64 to bound the
    number of compiled kernel shapes."""

    def __init__(self, scores: np.ndarray, gap: int = -600, *,
                 interpret: bool = False):
        self.scores = np.asarray(scores, np.int64)
        self.gap = gap
        self.interpret = interpret

    @staticmethod
    def _bucket(x: int) -> int:
        return max(64, _round_up(x, 64))

    def run_left(self, jobs) -> list[tuple[int, list[CigarOp], int, int]]:
        if not jobs:
            return []
        n = self._bucket(max(len(a) for a, _ in jobs))
        m = self._bucket(max(len(b) for _, b in jobs))
        al, be, nv, mv = _pad_jobs(jobs, n, m)
        B = al.shape[0]
        S = _round_up(n + 1, 128)
        bv, bd, trace, corner = wavefront_local(
            jnp.asarray(al), jnp.asarray(be), jnp.asarray(nv),
            jnp.asarray(mv), self.scores, n=n, m=m, gap=self.gap,
            with_trace=True, with_corner=True, interpret=self.interpret)
        la = nv[:, 0].astype(np.int32)
        lb = mv[:, 0].astype(np.int32)
        score = np.asarray(jax.device_get(corner))[
            np.arange(B), np.clip(la, 0, S - 1)]
        i0, j0, ops = _walk_left(trace, jnp.asarray(la), jnp.asarray(lb),
                                 jnp.asarray(score > 0), D=n + m, S=S)
        i0 = np.asarray(jax.device_get(i0))
        j0 = np.asarray(jax.device_get(j0))
        routes = _routes_walk_order(np.asarray(jax.device_get(ops)))
        return [(int(score[b]), routes[b], int(i0[b]), int(j0[b]))
                for b in range(B)]

    def run_right(self, jobs) -> list[tuple[int, list[CigarOp], int, int]]:
        if not jobs:
            return []
        n = self._bucket(max(len(a) for a, _ in jobs))
        m = self._bucket(max(len(b) for _, b in jobs))
        al, be, nv, mv = _pad_jobs(jobs, n, m)
        B = al.shape[0]
        S = _round_up(n + 1, 128)
        bv, bd, trace = wavefront_gsw_right(
            jnp.asarray(al), jnp.asarray(be), jnp.asarray(nv),
            jnp.asarray(mv), self.scores, n=n, m=m, gap=self.gap,
            interpret=self.interpret)
        bv = np.asarray(jax.device_get(bv))
        bd = np.asarray(jax.device_get(bd))
        max_i = np.argmax(bv, axis=1)  # smallest lane among maxima
        max_v = bv[np.arange(B), max_i]
        max_j = bd[np.arange(B), max_i] - max_i
        # all-nonpositive matrices keep (0, 0) (search.go currMax=0 rule)
        none = max_v <= 0
        max_i = np.where(none, 0, max_i).astype(np.int32)
        max_j = np.where(none, 0, max_j).astype(np.int32)
        score = np.where(none, 0, max_v)
        ops = _walk_right(trace, jnp.asarray(max_i), jnp.asarray(max_j),
                          D=n + m, S=S)
        routes = _routes_walk_order(np.asarray(jax.device_get(ops)))
        return [(int(score[b]), routes[b], int(max_i[b]), int(max_j[b]))
                for b in range(B)]
