"""gsw: seed-and-extend graph Smith-Waterman read aligner (host engine).

Behavioral counterpart of /root/reference/genomeGraph (search.go, toGiraf.go,
index.go, align.go). This module is the reference-faithful host path used
for giraf output parity and small data; the batched TPU path for throughput
lives in ops/wavefront.py ("local" mode) + tpu_align.py.

Design notes vs the reference:
  - Exact-match seed extension uses int8 vector compares (np.argmin over an
    equality mask) instead of the dnaTwoBit XOR/clz word trick — same
    semantics (N bases never match because genome kmers containing N are
    not indexed; read N's mismatch on compare).
  - The recursive graph traversal, the local DP boundary conditions, the
    emitted cigar op order (including the reference's walk-order quirks),
    the seedCouldBeBetter bound, and all scoring are replicated exactly.
  - Seeds are ordered by descending TotalLength with a deterministic
    stable sort (the reference's heapsort is unstable; ties between
    equal-length seeds may resolve differently).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import dna
from .graph import GenomeGraph, Node, index_genome
from .io import cigar as samcigar
from .io import sam as samio
from .io.cigar import CigarOp
from .io.fastq import FastqBig, qual_string
from .io.giraf import Giraf, Note, Path

HUMAN_CHIMP_TWO = np.array(
    [[90, -330, -236, -356, -208],
     [-330, 100, -318, -236, -196],
     [-236, -318, 100, -330, -196],
     [-356, -236, -330, 90, -208],
     [-208, -196, -196, -208, -202]], dtype=np.int64)

NEG = -(2 ** 62)


@dataclass
class Seed:
    target_id: int
    target_start: int
    query_start: int
    length: int
    pos_strand: bool
    total_length: int
    next_part: "Seed | None" = None


def _prio3(a, b, c):
    """cigar.TripleMaxTrace order: M >= I >= D."""
    return np.where((a >= b) & (a >= c), 0, np.where(b >= c, 1, 2)).astype(np.uint8)


_OPS = np.array(["M", "I", "D"])


def mismatch_stats(scores: np.ndarray):
    """genomeGraph.MismatchStats (toGiraf.go:96), literal loop semantics."""
    max_match = 0
    min_match = 0
    least_severe_mismatch = int(scores[0][1])
    for i in range(len(scores)):
        for j in range(len(scores[i])):
            v = int(scores[i][j])
            if v > max_match:
                min_match = max_match
                max_match = v
            elif v < 0 and least_severe_mismatch < v:
                least_severe_mismatch = v
    return (max_match, min_match, least_severe_mismatch,
            least_severe_mismatch - max_match)


def seed_could_be_better(seed_len: int, curr_best: int, perfect: int,
                         query_len: int, max_match: int, min_match: int,
                         least_mis: int, least_change: int) -> bool:
    """genomeGraph seedCouldBeBetter (index.go:102)."""
    seeds = query_len // (seed_len + 1)
    rem = query_len % (seed_len + 1)
    if (seed_len * max_match >= curr_best
            and perfect - (query_len - seed_len) * min_match >= curr_best):
        return True
    if (seed_len * seeds * max_match + seeds * least_mis >= curr_best
            and perfect - rem * min_match + seeds * least_change >= curr_best):
        return True
    if (seed_len * seeds * max_match + rem * max_match
            + (seeds + 1) * least_mis >= curr_best
            and perfect + (seeds + 1) * least_change >= curr_best):
        return True
    return False


def left_dynamic_aln(alpha: np.ndarray, beta: np.ndarray, scores: np.ndarray,
                     gap: int = -600):
    """LeftDynamicAln (search.go:234): suffix-anchored local DP, cells
    clamped at 0, traceback from the corner while scores stay positive.
    Returns (score, walk-order route, i_stop, j_stop)."""
    la, lb = len(alpha), len(beta)
    sub = scores[np.asarray(alpha, np.int64)][:, np.asarray(beta, np.int64)] \
        if la and lb else np.zeros((la, lb), np.int64)
    m = np.zeros((la + 1, lb + 1), np.int64)
    trace = np.zeros((la + 1, lb + 1), np.uint8)
    for i in range(1, la + 1):
        diag = m[i - 1, :-1] + sub[i - 1]
        up = m[i - 1, 1:] + gap
        best = np.maximum(np.maximum(diag, up), gap)  # gap covers clamp+left
        # G[j] = max(best[j], G[j-1]+gap); row = max(G, 0)
        seed = np.concatenate(([np.int64(0)], best))
        j_idx = np.arange(lb + 1, dtype=np.int64)
        G = np.maximum.accumulate(seed - j_idx * gap) + j_idx * gap
        row = np.maximum(G, 0)
        row[0] = 0
        left = row[:-1] + gap
        trace[i, 1:] = _prio3(diag, left, up)
        m[i] = row
    route: list[CigarOp] = []
    i, j = la, lb
    while m[i, j] > 0:
        op = _OPS[trace[i, j]]
        if route and route[-1].op == op:
            route[-1].run_length += 1
        else:
            route.append(CigarOp(1, op))
        if op == "M":
            i, j = i - 1, j - 1
        elif op == "I":
            j -= 1
        else:
            i -= 1
    return int(m[la, lb]), route, i, j


def right_dynamic_aln(alpha: np.ndarray, beta: np.ndarray, scores: np.ndarray,
                      gap: int = -600):
    """RightDynamicAln (search.go:278): prefix-anchored DP with penalized
    boundaries, best cell in row-major first-strict-max order, traceback
    to the origin. Returns (score, walk-order route, max_i, max_j)."""
    la, lb = len(alpha), len(beta)
    sub = scores[np.asarray(alpha, np.int64)][:, np.asarray(beta, np.int64)] \
        if la and lb else np.zeros((la, lb), np.int64)
    m = np.zeros((la + 1, lb + 1), np.int64)
    trace = np.zeros((la + 1, lb + 1), np.uint8)
    m[0] = np.arange(lb + 1, dtype=np.int64) * gap
    trace[0, 1:] = 1  # 'I'
    col0 = np.arange(la + 1, dtype=np.int64) * gap
    for i in range(1, la + 1):
        diag = m[i - 1, :-1] + sub[i - 1]
        up = m[i - 1, 1:] + gap
        best = np.maximum(diag, up)
        seed = np.concatenate(([col0[i]], best))
        j_idx = np.arange(lb + 1, dtype=np.int64)
        row = np.maximum.accumulate(seed - j_idx * gap) + j_idx * gap
        left = row[:-1] + gap
        trace[i, 1:] = _prio3(diag, left, up)
        trace[i, 0] = 2  # 'D'
        m[i] = row
    flat = int(np.argmax(m))
    max_i, max_j = divmod(flat, lb + 1)
    # the reference scans row-major and only updates on strictly greater
    # values starting from currMax=0; argmax picks the first max, but if
    # the global max is <= 0 the reference keeps (0, 0)
    if m[max_i, max_j] <= 0:
        max_i, max_j = 0, 0
    route: list[CigarOp] = []
    i, j = max_i, max_j
    while i > 0 or j > 0:
        op = _OPS[trace[i, j]]
        if route and route[-1].op == op:
            route[-1].run_length += 1
        else:
            route.append(CigarOp(1, op))
        if op == "M":
            i, j = i - 1, j - 1
        elif op == "I":
            j -= 1
        else:
            i -= 1
    return int(m[max_i, max_j]), route, max_i, max_j


def _reverse_route(route: list[CigarOp]) -> list[CigarOp]:
    return list(reversed(route))


def _concat_routes(a: list[CigarOp], b: list[CigarOp]) -> list[CigarOp]:
    if not a:
        return list(b)
    out = [CigarOp(c.run_length, c.op) for c in a]
    for c in b:
        if out and out[-1].op == c.op:
            out[-1].run_length += c.run_length
        else:
            out.append(CigarOp(c.run_length, c.op))
    return out


def _append_soft_clips(front: int, read_len: int,
                       route: list[CigarOp]) -> list[CigarOp]:
    cur = samcigar.query_length(route)
    if front == 0 and cur >= read_len:
        return route
    out: list[CigarOp] = []
    if front > 0:
        out.append(CigarOp(front, "S"))
    if front + cur < read_len:
        out = out + route + [CigarOp(read_len - front - cur, "S")]
    return out


@dataclass
class AlnState:
    """Carried state of the per-seed alignment loop (the reference's
    scoreKeeper, toGiraf.go:17-72), so the loop can be resumed wave-by-
    wave by the batched TPU engine (gsw_tpu.TpuGswAligner)."""
    best: Giraf
    perfect: int
    extension: int
    seeds: list[Seed]
    q_end: int = 0
    done: bool = False


class GswAligner:
    def __init__(self, graph: GenomeGraph, seed_len: int = 32,
                 step_size: int = 32, scores: np.ndarray = HUMAN_CHIMP_TWO,
                 node_names: dict[int, str] | None = None):
        self.g = graph
        self.seed_len = seed_len
        self.step_size = step_size
        self.scores = np.asarray(scores, np.int64)
        self.index = index_genome(graph, seed_len, step_size)
        self.node_names = node_names or {}
        (self.max_match, self.min_match, self.least_mis,
         self.least_change) = mismatch_stats(self.scores)
        self._match_score = np.array(
            [int(self.scores[i][i]) for i in range(5)] + [0] * 8, np.int64)
        # pluggable extension-DP provider: None = numpy host DP; the TPU
        # engine swaps in a recorder/replayer (ops/gsw_dp.py)
        self._provider = None

    def _dp_left(self, window: np.ndarray, read_part: np.ndarray):
        if self._provider is not None:
            return self._provider.left(window, read_part)
        return left_dynamic_aln(window, read_part, self.scores)

    def _dp_right(self, window: np.ndarray, read_part: np.ndarray):
        if self._provider is not None:
            return self._provider.right(window, read_part)
        return right_dynamic_aln(window, read_part, self.scores)

    # ---- exact-match counting (dnaTwoBit perfectAlign analog) ----

    def _count_right(self, node_seq: np.ndarray, ns: int, read: np.ndarray,
                     rs: int) -> int:
        L = min(len(node_seq) - ns, len(read) - rs)
        if L <= 0:
            return 0
        eq = node_seq[ns:ns + L] == read[rs:rs + L]
        first_mis = int(np.argmin(eq)) if not eq.all() else L
        return first_mis

    def _count_left(self, node_seq: np.ndarray, ne: int, read: np.ndarray,
                    re_: int) -> int:
        """Matches extending left from inclusive positions (ne, re_)."""
        L = min(ne + 1, re_ + 1)
        if L <= 0:
            return 0
        eq = node_seq[ne - L + 1:ne + 1][::-1] == read[re_ - L + 1:re_ + 1][::-1]
        first_mis = int(np.argmin(eq)) if not eq.all() else L
        return first_mis

    # ---- seed building (search.go seedMapMemPool) ----

    def _extend_right(self, node: Node, read: np.ndarray, read_start: int,
                      node_start: int, pos_strand: bool) -> list[Seed]:
        right = self._count_right(node.seq, node_start, read, read_start)
        if right == 0:
            return []
        answer: list[Seed] = []
        if (read_start + right < len(read)
                and node_start + right == len(node.seq) and node.next):
            for e in node.next:
                for part in self._extend_right(self.g.nodes[e.dest], read,
                                               read_start + right, 0,
                                               pos_strand):
                    answer.append(Seed(node.id, node_start, read_start, right,
                                       pos_strand, right + part.total_length,
                                       part))
        if not answer:
            answer = [Seed(node.id, node_start, read_start, right, pos_strand,
                           right)]
        return answer

    def _extend_left(self, node: Node, read: np.ndarray,
                     part: Seed) -> list[Seed]:
        answer: list[Seed] = []
        if part.query_start > 0 and part.target_start == 0:
            rb = read[part.query_start - 1]
            for e in node.prev:
                prev_node = self.g.nodes[e.dest]
                if len(prev_node.seq) and prev_node.seq[-1] == rb:
                    answer.extend(self._extend_left_helper(prev_node, read,
                                                           part))
        return answer if answer else [part]

    def _extend_left_helper(self, node: Node, read: np.ndarray,
                            next_part: Seed) -> list[Seed]:
        node_pos = len(node.seq) - 1
        read_pos = next_part.query_start - 1
        left = min(read_pos + 1,
                   self._count_left(node.seq, node_pos, read, read_pos))
        curr = Seed(node.id, node_pos - (left - 1), read_pos - (left - 1),
                    left, next_part.pos_strand,
                    left + next_part.total_length, next_part)
        answer: list[Seed] = []
        if curr.query_start > 0 and curr.target_start == 0:
            rb = read[curr.query_start - 1]
            for e in node.prev:
                prev_node = self.g.nodes[e.dest]
                if len(prev_node.seq) and prev_node.seq[-1] == rb:
                    answer.extend(self._extend_left_helper(prev_node, read,
                                                           curr))
        return answer if answer else [curr]

    def _kmer_codes(self, seq: np.ndarray):
        """2-bit rolling codes for every window. Returns (codes uint64,
        valid bool) — windows containing N are invalid (never indexed).
        Vectorized over positions: k shifted ORs over the whole read
        instead of a per-base Python loop (index.go:21-57 semantics)."""
        k = self.seed_len
        s = np.asarray(seq, np.int64)
        n = len(s) - k + 1
        if n <= 0:
            return np.zeros(0, np.uint64), np.zeros(0, bool)
        valid = np.lib.stride_tricks.sliding_window_view(s < 4, k).all(axis=1)
        vals = np.where(s < 4, s, 0).astype(np.uint64)
        out = np.zeros(n, np.uint64)
        for i in range(k):
            out |= vals[i:n + i] << np.uint64(2 * (k - 1 - i))
        return out, valid

    # ---- batched seed finding (sorted-table design, tpu_align style) ----

    def _build_seed_table(self) -> None:
        """Flatten the kmer dict into a sorted (code, packed) table plus
        concatenated node sequences, so a whole batch's seed lookups are
        two searchsorted calls and the within-node exact-match extents
        are two batched int8 compares (index.go:21-57, search.go:339-373
        rebuilt batch-first). Stable sort keeps per-code insertion order,
        so hit order — and therefore seed order after the stable
        total-length sort — matches the scalar path exactly."""
        codes_l, packed_l = [], []
        for c, lst in self.index.items():
            codes_l.append(np.full(len(lst), c, np.uint64))
            packed_l.append(np.asarray(lst, np.int64))
        if codes_l:
            tc = np.concatenate(codes_l)
            tp = np.concatenate(packed_l)
        else:
            tc = np.zeros(0, np.uint64)
            tp = np.zeros(0, np.int64)
        order = np.argsort(tc, kind="stable")
        lens = np.array([len(n.seq) for n in self.g.nodes], np.int64)
        off = np.zeros(len(lens) + 1, np.int64)
        np.cumsum(lens, out=off[1:])
        self._seed_table = {
            "codes": tc[order], "packed": tp[order],
            "concat": (np.concatenate([n.seq for n in self.g.nodes])
                       if len(self.g.nodes) else np.zeros(0, np.int8)),
            "off": off[:-1], "len": lens,
            "has_next": np.array([bool(n.next) for n in self.g.nodes]),
        }

    def find_seeds_batch(self, reads: list[FastqBig]) -> list[list[Seed]]:
        """find_seeds for a whole batch in a handful of numpy passes;
        per-hit Python survives only for boundary-crossing extensions
        (node-edge walks, rare) and Seed object assembly."""
        if getattr(self, "_seed_table", None) is None:
            self._build_seed_table()
        st = self._seed_table
        k = self.seed_len
        R = len(reads)
        Ls = np.array([len(r.seq) for r in reads], np.int64)
        Lmax = int(Ls.max()) if R else 0
        n_codes = Lmax - k + 1
        if n_codes <= 0 or len(st["codes"]) == 0:
            return [self.find_seeds(r) for r in reads]
        SEQ = np.full((2 * R, Lmax), 12, np.int8)
        for i, r in enumerate(reads):
            SEQ[2 * i, :Ls[i]] = r.seq
            SEQ[2 * i + 1, :Ls[i]] = r.seq_rc
        S64 = SEQ.astype(np.int64)
        lt4 = S64 < 4
        valid = np.lib.stride_tricks.sliding_window_view(
            lt4, k, axis=1).all(axis=2)
        vals = np.where(lt4, S64, 0).astype(np.uint64)
        codes = np.zeros((2 * R, n_codes), np.uint64)
        for i in range(k):
            codes |= vals[:, i:n_codes + i] << np.uint64(2 * (k - 1 - i))
        row_len = np.repeat(Ls, 2)
        valid &= np.arange(n_codes)[None, :] <= (row_len[:, None] - k)
        rows, rss = np.nonzero(valid)  # row-major == scalar seed order
        q = codes[rows, rss]
        lo = np.searchsorted(st["codes"], q, side="left")
        hi = np.searchsorted(st["codes"], q, side="right")
        cnt = hi - lo
        m = cnt > 0
        rows_h = np.repeat(rows[m], cnt[m])
        rs_h = np.repeat(rss[m], cnt[m])
        l0, c0 = lo[m], cnt[m]
        base = np.repeat(l0, c0)
        offs = np.arange(len(base)) - np.repeat(np.cumsum(c0) - c0, c0)
        pk = st["packed"][base + offs]
        node_idx = (pk >> 32).astype(np.int64)
        node_pos = (pk & 0xFFFFFFFF).astype(np.int64)
        H = len(pk)
        per_read: list[list[Seed]] = [[] for _ in reads]
        if H == 0:
            return per_read
        concat, noffs, nlens = st["concat"], st["off"], st["len"]
        t = np.arange(Lmax)
        noff = noffs[node_idx]
        nlen = nlens[node_idx]
        # left extent from the hit position (count_left capped at
        # min(node_pos+1, rs+1)); out-of-limit columns count as mismatch
        lt_lim = np.minimum(node_pos + 1, rs_h + 1)
        gi = (noff + node_pos)[:, None] - t[None, :]
        ri = rs_h[:, None] - t[None, :]
        eql = ((concat[np.clip(gi, 0, len(concat) - 1)]
                == SEQ[rows_h[:, None], np.clip(ri, 0, Lmax - 1)])
               & (t[None, :] < lt_lim[:, None]))
        neq = ~eql
        left_run = np.where(neq.any(axis=1), neq.argmax(axis=1), lt_lim)
        rs0 = rs_h - (left_run - 1)
        np0 = node_pos - (left_run - 1)
        # right extent from the extended start
        rt_lim = np.minimum(nlen - np0, row_len[rows_h] - rs0)
        gi2 = (noff + np0)[:, None] + t[None, :]
        ri2 = rs0[:, None] + t[None, :]
        eqr = ((concat[np.clip(gi2, 0, len(concat) - 1)]
                == SEQ[rows_h[:, None], np.clip(ri2, 0, Lmax - 1)])
               & (t[None, :] < rt_lim[:, None]))
        neqr = ~eqr
        right_run = np.where(neqr.any(axis=1), neqr.argmax(axis=1), rt_lim)
        cross_right = ((rs0 + right_run < row_len[rows_h])
                       & (np0 + right_run == nlen)
                       & st["has_next"][node_idx])
        strand_pos = rows_h % 2 == 0
        maybe_left = strand_pos & (rs0 > 0) & (np0 == 0)
        ri_h = (rows_h // 2).tolist()
        for h in range(H):
            strand = bool(strand_pos[h])
            read = reads[ri_h[h]]
            seq = read.seq if strand else read.seq_rc
            out = per_read[ri_h[h]]
            node = self.g.nodes[node_idx[h]]
            if cross_right[h]:
                parts = self._extend_right(node, seq, int(rs0[h]),
                                           int(np0[h]), strand)
            else:
                parts = [Seed(int(node_idx[h]), int(np0[h]), int(rs0[h]),
                              int(right_run[h]), strand,
                              int(right_run[h]))]
            if strand and maybe_left[h]:
                for p in parts:
                    out.extend(self._extend_left(node, seq, p))
            else:
                out.extend(parts)
        for lst in per_read:
            lst.sort(key=lambda s: -s.total_length)
        return per_read

    def find_seeds(self, read: FastqBig) -> list[Seed]:
        seeds: list[Seed] = []
        k = self.seed_len
        for strand, seq in ((True, read.seq), (False, read.seq_rc)):
            codes, valid = self._kmer_codes(seq)
            for rs in range(len(codes)):
                if not valid[rs]:
                    continue
                for packed in self.index.get(int(codes[rs]), ()):
                    node_idx = packed >> 32
                    node_pos = packed & 0xFFFFFFFF
                    node = self.g.nodes[node_idx]
                    left = min(rs + 1,
                               self._count_left(node.seq, node_pos, seq, rs)
                               if node_pos < len(node.seq) else 0)
                    if left == 0:
                        continue
                    parts = self._extend_right(node, seq,
                                               rs - (left - 1),
                                               node_pos - (left - 1), strand)
                    if strand:
                        for p in parts:
                            seeds.extend(self._extend_left(node, seq, p))
                    else:
                        seeds.extend(parts)
        seeds.sort(key=lambda s: -s.total_length)
        return seeds

    # ---- alignment (toGiraf.go GraphSmithWatermanToGiraf) ----

    def align_start(self, read: FastqBig,
                    seeds: list[Seed] | None = None) -> AlnState:
        best = Giraf(qname=read.name, q_start=0, q_end=0, pos_strand=True,
                     path=Path(), cigar=[], aln_score=0, mapq=255,
                     seq=read.seq, qual=read.qual,
                     notes=[Note("XO", "Z", "~")])
        perfect = int(self._match_score[np.asarray(read.seq, np.int64)].sum())
        extension = perfect // 600 + len(read.seq)
        return AlnState(best, perfect, extension,
                        self.find_seeds(read) if seeds is None else seeds)

    @staticmethod
    def seed_tail(s: Seed) -> Seed:
        tail = s
        while tail.next_part is not None:
            tail = tail.next_part
        return tail

    def align_seed_loop(self, read: FastqBig, seeds: list[Seed],
                        st: AlnState) -> None:
        """Process a slice of seeds against the carried state; sets
        st.done when the seedCouldBeBetter bound breaks the loop."""
        best = st.best
        for s in seeds:
            if not seed_could_be_better(s.total_length, best.aln_score,
                                        st.perfect, len(read.seq),
                                        100, 90, -196, -296):
                st.done = True
                return
            tail = self.seed_tail(s)
            seq = read.seq if s.pos_strand else read.seq_rc
            seed_score = int(self._match_score[
                np.asarray(seq[s.query_start:tail.query_start + tail.length],
                           np.int64)].sum())
            left_route: list[CigarOp] = []
            right_route: list[CigarOp] = []
            if s.total_length == len(seq):
                t_start = s.target_start
                t_end = tail.target_start + tail.length
                q_start = s.query_start
                curr = seed_score
            else:
                (left_route, left_score, t_start, q_start) = \
                    self._left_traversal(self.g.nodes[s.target_id],
                                         s.target_start, st.extension
                                         - s.total_length,
                                         seq[:s.query_start])
                (right_route, right_score, t_end, st.q_end) = \
                    self._right_traversal(self.g.nodes[tail.target_id],
                                          tail.target_start + tail.length,
                                          st.extension - s.total_length,
                                          seq[tail.query_start + tail.length:])
                curr = left_score + seed_score + right_score
            if curr > best.aln_score:
                best.q_start = q_start
                best.q_end = (s.query_start + q_start + st.q_end
                              + s.total_length - 1)
                best.pos_strand = s.pos_strand
                path = self._seed_path(s)
                best.path = Path(t_start, path, t_end)
                mid = _concat_routes(left_route,
                                     [CigarOp(s.total_length, "M")])
                mid = _concat_routes(mid, right_route)
                best.cigar = _append_soft_clips(q_start, len(seq), mid)
                best.aln_score = int(curr)
                best.seq = seq

    @staticmethod
    def align_finish(st: AlnState) -> Giraf:
        best = st.best
        if not best.pos_strand:
            best.qual = best.qual[::-1]
        return best

    def align_read(self, read: FastqBig) -> Giraf:
        st = self.align_start(read)
        self.align_seed_loop(read, st.seeds, st)
        return self.align_finish(st)

    def _seed_path(self, s: Seed) -> list[int]:
        path = [s.target_id]
        p = s.next_part
        while p is not None:
            path.append(p.target_id)
            p = p.next_part
        return path

    def _left_traversal(self, node: Node, ref_end: int, extension: int,
                        read_part: np.ndarray, prev_seq: np.ndarray | None = None):
        """LeftAlignTraversal (search.go:166). Returns
        (route walk-order per reference, score, target_start, query_start)."""
        if prev_seq is None:
            prev_seq = np.zeros(0, np.int8)
        take = min(len(prev_seq) + ref_end, extension) - len(prev_seq)
        window = np.concatenate([node.seq[ref_end - take:ref_end], prev_seq])
        if len(prev_seq) + ref_end >= extension or not node.prev:
            score, route, i_stop, j_stop = self._dp_left(window, read_part)
            t_start = ref_end - len(window) - len(prev_seq) + i_stop
            return route, score, t_start, j_stop
        best_score = NEG
        best = ([], NEG, 0, 0)
        for e in node.prev:
            prev_node = self.g.nodes[e.dest]
            route, sc, ts, qs = self._left_traversal(
                prev_node, len(prev_node.seq), extension, read_part, window)
            if sc > best_score:
                best_score = sc
                t_start = ref_end - len(window) - len(prev_seq) + ts
                best = (route, sc, t_start, qs)
        return _reverse_route(best[0]), best[1], best[2], best[3]

    def _right_traversal(self, node: Node, start: int, extension: int,
                         read_part: np.ndarray, prev_seq: np.ndarray | None = None):
        """RightAlignTraversal (search.go:202). Returns
        (route, score, target_end, query_end)."""
        if prev_seq is None:
            prev_seq = np.zeros(0, np.int8)
        take = min(len(prev_seq) + len(node.seq) - start, extension) - len(prev_seq)
        window = np.concatenate([prev_seq, node.seq[start:start + take]])
        if len(prev_seq) + len(node.seq) - start >= extension or not node.next:
            score, route, max_i, max_j = self._dp_right(window, read_part)
            return route, score, max_i + start, max_j
        best_score = NEG
        best = ([], NEG, 0, 0)
        for e in node.next:
            route, sc, te, qe = self._right_traversal(
                self.g.nodes[e.dest], 0, extension, read_part, window)
            if sc > best_score:
                best_score = sc
                best = (route, sc, te, qe)
        return (_reverse_route(best[0]), best[1], best[2] + start, best[3])

    # ---- pairing + SAM (toGiraf.go) ----

    def align_pair(self, fwd: FastqBig, rev: FastqBig) -> tuple[Giraf, Giraf]:
        a = self.align_read(fwd)
        b = self.align_read(rev)
        a.flag = self._giraf_flags(a) + 8 + 16 + 16
        b.flag = self._giraf_flags(b)
        if self._is_proper_pair(a, b):
            a.flag += 1
            b.flag += 1
        return a, b

    @staticmethod
    def _giraf_flags(g: Giraf) -> int:
        ans = 0
        if g.pos_strand:
            ans += 4
        if g.aln_score < 1200:
            ans += 2
        return ans

    @staticmethod
    def _is_proper_pair(a: Giraf, b: Giraf) -> bool:
        if abs(a.path.t_start - b.path.t_start) < 10000:
            if (a.path.t_start < b.path.t_start and a.pos_strand
                    and not b.pos_strand):
                return True
            if (a.path.t_start > b.path.t_start and not a.pos_strand
                    and b.pos_strand):
                return True
        return False

    def giraf_to_sam(self, g: Giraf, paired_flag: int = 0) -> samio.Sam:
        """Correct linear-coordinate SAM projection (the reference's
        GirafToSam liftover path, toGiraf.go:139, depends on node notes its
        own pipeline never sets; here node names map directly)."""
        s = samio.Sam(qname=g.qname, flag=4, rname="*", pos=0, mapq=255,
                      cigar=[CigarOp(0, "*")], rnext="*", pnext=0, tlen=0,
                      seq=g.seq, qual=qual_string(g.qual),
                      extra="BZ:i:0\tGP:Z:-1\tXO:Z:~")
        if g.aln_score < 1200 or not g.path.nodes:
            s.flag = 4 + paired_flag
            return s
        node0 = g.path.nodes[0]
        s.rname = self.node_names.get(node0, str(node0))
        s.pos = g.path.t_start + 1
        s.flag = (0 if g.pos_strand else 16) + paired_flag
        s.mapq = 255
        s.cigar = [c for c in g.cigar]
        s.extra = (f"BZ:i:{g.aln_score}\t"
                   f"GP:Z:{'>'.join(str(n) for n in g.path.nodes)}\t"
                   f"XO:i:{g.path.t_start}")
        return s

    def pair_to_sam(self, a: Giraf, b: Giraf) -> tuple[samio.Sam, samio.Sam]:
        sa = self.giraf_to_sam(a, paired_flag=1 + 64)
        sb = self.giraf_to_sam(b, paired_flag=1 + 128)
        if self._is_proper_pair(a, b):
            sa.flag += 2
            sb.flag += 2
        return sa, sb
