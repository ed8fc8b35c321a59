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


@functools.partial(jax.jit, static_argnames=("n", "m", "gap", "interpret",
                                             "prof16"))
def _left_full(al, be, nv, mv, scores, *, n, m, gap, interpret,
               prof16=False):
    """LeftDynamicAln DP + corner score + walk, all in ONE dispatch
    (host-side finishing paid a tunnel round-trip per device fetch)."""
    S = _round_up(n + 1, 128)
    bv, bd, trace, corner = wavefront_local(
        al, be, nv, mv, scores, n=n, m=m, gap=gap,
        with_trace=True, with_corner=True, interpret=interpret,
        prof16=prof16)
    la = nv[:, 0]
    lb = mv[:, 0]
    score = jnp.take_along_axis(corner, jnp.clip(la, 0, S - 1)[:, None],
                                axis=1)[:, 0]
    i0, j0, ops = _walk_left(trace, la, lb, score > 0, D=n + m, S=S)
    return _pack_result(score, i0, j0, ops, n + m)


@functools.partial(jax.jit, static_argnames=("n", "m", "gap", "interpret",
                                             "prof16"))
def _right_full(al, be, nv, mv, scores, *, n, m, gap, interpret,
                prof16=False):
    """RightDynamicAln DP + row-major-first best cell + walk to origin,
    one dispatch. Best-cell rule: per-lane strict > kept the smallest
    diagonal; argmax over lanes keeps the smallest i; all-nonpositive
    keeps (0, 0) (search.go currMax=0)."""
    S = _round_up(n + 1, 128)
    bv, bd, trace = wavefront_gsw_right(al, be, nv, mv, scores,
                                        n=n, m=m, gap=gap,
                                        interpret=interpret,
                                        prof16=prof16)
    max_i = jnp.argmax(bv, axis=1).astype(jnp.int32)
    max_v = jnp.take_along_axis(bv, max_i[:, None], axis=1)[:, 0]
    max_j = (jnp.take_along_axis(bd, max_i[:, None], axis=1)[:, 0]
             - max_i).astype(jnp.int32)
    none = max_v <= 0
    max_i = jnp.where(none, 0, max_i)
    max_j = jnp.where(none, 0, max_j)
    score = jnp.where(none, 0, max_v)
    ops = _walk_right(trace, max_i, max_j, D=n + m, S=S)
    return _pack_result(score, max_i, max_j, ops, n + m)


def _pack_result(score, i0, j0, ops, D: int):
    """(3 int32 vectors + (B, D) walk ops) -> ONE (B, 12 + ceil(D/4))
    uint8 array: each separate device->host array costs a tunnel
    round-trip (~4-8 ms), which dominated the graph engine's waves."""
    B = score.shape[0]
    meta = jnp.stack([score, i0, j0], axis=1).astype(jnp.int32)
    meta8 = jax.lax.bitcast_convert_type(meta, jnp.uint8).reshape(B, 12)
    opsT = jnp.minimum(ops, 3).astype(jnp.int32)
    Dp = -(-D // 4) * 4
    opsT = jnp.pad(opsT, ((0, 0), (0, Dp - D)), constant_values=3)
    packed = (opsT.reshape(B, Dp // 4, 4)
              * jnp.asarray([1, 4, 16, 64], jnp.int32)).sum(
                  axis=-1).astype(jnp.uint8)
    return jnp.concatenate([meta8, packed], axis=1)


@functools.partial(jax.jit, static_argnames=("nl", "ml", "nr", "mr",
                                             "gap", "interpret", "prof16"))
def _both_full(pal_l, pbe_l, nvl, mvl, pal_r, pbe_r, nvr, mvr, scores, *,
               nl, ml, nr, mr, gap, interpret, prof16=False):
    """One fused wave dispatch: left-kernel rows + right-kernel rows,
    4-bit-packed inputs, ONE packed uint8 result array (left rows then
    right rows, widths padded to the max) — each extra device<->host
    array costs a tunnel round-trip (~4-8 ms), which dominated the graph
    engine's waves."""

    def unpack(pk, n):
        lo = (pk & 0xF).astype(jnp.int8)
        hi = ((pk >> 4) & 0xF).astype(jnp.int8)
        return jnp.stack([lo, hi], axis=-1).reshape(pk.shape[0], -1)[:, :n]

    pl = _left_full(unpack(pal_l, nl), unpack(pbe_l, ml), nvl, mvl,
                    scores, n=nl, m=ml, gap=gap, interpret=interpret,
                    prof16=prof16)
    pr = _right_full(unpack(pal_r, nr), unpack(pbe_r, mr), nvr, mvr,
                     scores, n=nr, m=mr, gap=gap, interpret=interpret,
                     prof16=prof16)
    W = max(pl.shape[1], pr.shape[1])
    pl = jnp.pad(pl, ((0, 0), (0, W - pl.shape[1])))
    pr = jnp.pad(pr, ((0, 0), (0, W - pr.shape[1])))
    return jnp.concatenate([pl, pr], axis=0)


def _pack4(seqs: np.ndarray) -> np.ndarray:
    """Two 4-bit base codes per byte (codes 0..12 fit) — halves the
    host->device upload through the tunnel."""
    B, L = seqs.shape
    if L % 2:
        seqs = np.concatenate(
            [seqs, np.full((B, 1), 4, np.int8)], axis=1)
    u = seqs.astype(np.uint8)
    return (u[:, ::2] | (u[:, 1::2] << 4)).astype(np.uint8)


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
    max_i, max_j).

    Shape policy (the graph engine's throughput hinges on it): job counts
    are chunked to a FIXED size (one compiled batch shape per side, ever)
    and sequence lengths are bucketed to multiples of 64 with a sticky
    per-side maximum, so a kernel recompile (~30s+ through the remote
    tunnel) happens at most a couple of times over an aligner's lifetime
    instead of whenever a wave's job count crosses a bucket. All chunks
    of a wave dispatch asynchronously; device_get happens once."""

    CHUNK = 256

    def __init__(self, scores: np.ndarray, gap: int = -600, *,
                 interpret: bool = False):
        from .wavefront import profile_fits16

        self.scores = np.asarray(scores, np.int64)
        self.gap = gap
        self.interpret = interpret
        self._prof16 = profile_fits16(self.scores)
        self._dims = {"left": [64, 64], "right": [64, 64]}  # sticky n, m

    ACHUNK = 1024  # row-chunk size for the prebuilt-array API
                   # (A/B: 2048-row chunks measured ~5% SLOWER at
                   # 2048-read batches — the bigger upload before the
                   # first kernel start loses more than the saved RTT)

    @staticmethod
    def _bucket(x: int) -> int:
        return max(64, _round_up(x, 64))

    def dims_for(self, side: str, n: int, m: int) -> tuple[int, int]:
        """Grow this side's sticky compiled dims to cover (n, m) and
        return them — callers build job tensors at these dims so the
        kernel shape (and its ~30s tunnel recompile) stays stable."""
        dims = self._dims[side]
        dims[0] = max(dims[0], self._bucket(n))
        dims[1] = max(dims[1], self._bucket(m))
        return dims[0], dims[1]

    def start_wave(self, al_l, be_l, nv_l, mv_l, al_r, be_r, nv_r, mv_r):
        """Fused dispatch of one wave: left rows + right rows in ONE
        jitted call -> ONE packed result array per chunk. Inputs are
        int8 job tensors prebuilt at dims_for('left'/'right') widths;
        rows are chunked to a fixed ACHUNK so compiled shapes never
        vary. Uploads go 4-bit packed."""
        nl, ml = self._dims["left"]
        nr, mr = self._dims["right"]
        Nl, Nr = len(al_l), len(al_r)
        if Nl == 0 and Nr == 0:
            return []
        # two compiled row shapes: full chunks plus a small variant so
        # the tail waves (a few surviving reads) don't pay a full-width
        # upload+compute for mostly-padding rows
        C = 256 if max(Nl, Nr) <= 256 else self.ACHUNK
        handles = []
        for c0 in range(0, max(Nl, Nr), C):
            ul = max(0, min(C, Nl - c0))
            ur = max(0, min(C, Nr - c0))

            def chunk(a, used, n, fill):
                out = np.full((C, n), fill, a.dtype if used else np.int8)
                if used:
                    out[:used] = a[c0:c0 + used]
                return out

            pal_l = _pack4(chunk(al_l, ul, nl, 4))
            pbe_l = _pack4(chunk(be_l, ul, ml, 4))
            pal_r = _pack4(chunk(al_r, ur, nr, 4))
            pbe_r = _pack4(chunk(be_r, ur, mr, 4))
            nvl = np.zeros((C, 1), np.int32)
            mvl = np.zeros((C, 1), np.int32)
            nvr = np.zeros((C, 1), np.int32)
            mvr = np.zeros((C, 1), np.int32)
            nvl[:ul, 0] = nv_l[c0:c0 + ul]
            mvl[:ul, 0] = mv_l[c0:c0 + ul]
            nvr[:ur, 0] = nv_r[c0:c0 + ur]
            mvr[:ur, 0] = mv_r[c0:c0 + ur]
            res = _both_full(jnp.asarray(pal_l), jnp.asarray(pbe_l),
                             jnp.asarray(nvl), jnp.asarray(mvl),
                             jnp.asarray(pal_r), jnp.asarray(pbe_r),
                             jnp.asarray(nvr), jnp.asarray(mvr),
                             self.scores, nl=nl, ml=ml, nr=nr, mr=mr,
                             gap=self.gap, interpret=self.interpret,
                             prof16=self._prof16)
            if hasattr(res, "copy_to_host_async"):
                res.copy_to_host_async()
            handles.append((res, ul, ur, nl + ml, nr + mr, C))
        return handles

    @staticmethod
    def finish_wave(handles):
        """(lmeta (Nl,3), lops (Nl,Dl), rmeta (Nr,3), rops (Nr,Dr))
        across all chunks of one start_wave call."""
        from .wavefront import unpack_ops

        if not handles:
            z3 = np.zeros((0, 3), np.int32)
            z = np.zeros((0, 0), np.int8)
            return z3, z, z3.copy(), z.copy()
        for res, *_ in handles:
            if hasattr(res, "copy_to_host_async"):
                res.copy_to_host_async()
        fetched = jax.device_get([h[0] for h in handles])
        lm, lo_, rm, ro = [], [], [], []
        for (_, ul, ur, Dl, Dr, C), buf in zip(handles, fetched):
            buf = np.asarray(buf)
            lbuf, rbuf = buf[:C], buf[C:]
            lm.append(np.ascontiguousarray(lbuf[:ul, :12]).view(np.int32))
            lo_.append(unpack_ops(lbuf[:ul, 12:12 + ((Dl + 3) // 4)], Dl))
            rm.append(np.ascontiguousarray(rbuf[:ur, :12]).view(np.int32))
            ro.append(unpack_ops(rbuf[:ur, 12:12 + ((Dr + 3) // 4)], Dr))
        return (np.concatenate(lm), np.concatenate(lo_),
                np.concatenate(rm), np.concatenate(ro))

    def run_both(self, left_jobs, right_jobs):
        """One wave: dispatch every chunk of both sides before fetching
        anything, so the tunnel round-trip is paid once per wave."""
        lh = self._start("left", left_jobs)
        rh = self._start("right", right_jobs)
        both = self._finish(lh + rh)
        nl = sum(used for _, used, _ in lh)
        return both[:nl], both[nl:]

    def run_left(self, jobs) -> list[tuple[int, list[CigarOp], int, int]]:
        return self._finish(self._start("left", jobs))

    def run_right(self, jobs) -> list[tuple[int, list[CigarOp], int, int]]:
        return self._finish(self._start("right", jobs))
