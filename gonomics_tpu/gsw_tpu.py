"""TPU graph read aligner: host DAG traversal + batched device DP.

This is the SURVEY.md P2 hard-part-4 design for graph (.gg) references:
the reference's recursive extension alignment
(/root/reference/genomeGraph/search.go:166-321) is control-flow heavy,
so the graph walk stays on host, but the O(ext^2) per-path DP leaves —
the hot loop — are collected across ALL seeds of ALL reads in a batch
and evaluated as ONE Pallas wavefront launch per wave (ops/gsw_dp.py).

Output is bit-identical to the host engine (gsw.GswAligner), including
the seedCouldBeBetter early break (toGiraf.go:38, index.go:102): seeds
are processed in waves; a wave records every DP job a seed slice could
need by running the same traversal recursion with a recording provider
(exploration is score-independent), then replays the reference's exact
seed loop with the precomputed results, discarding results of seeds the
break skips.
"""

from __future__ import annotations

from collections import deque

import numpy as np

from .gsw import HUMAN_CHIMP_TWO, GswAligner
from .graph import GenomeGraph
from .io.fastq import FastqBig
from .io.giraf import Giraf
from .ops.gsw_dp import GswDpBatch


class _Recorder:
    """DP provider that records jobs and returns dummies (pass A)."""

    def __init__(self):
        self.left_jobs: list = []
        self.right_jobs: list = []

    def left(self, window, read_part):
        self.left_jobs.append((np.asarray(window, np.int8),
                               np.asarray(read_part, np.int8)))
        return 0, [], 0, 0

    def right(self, window, read_part):
        self.right_jobs.append((np.asarray(window, np.int8),
                                np.asarray(read_part, np.int8)))
        return 0, [], 0, 0


class _Replayer:
    """DP provider that pops precomputed results in recording order."""

    def __init__(self, left_results, right_results):
        self.left_q = deque(left_results)
        self.right_q = deque(right_results)

    def left(self, window, read_part):
        return self.left_q.popleft()

    def right(self, window, read_part):
        return self.right_q.popleft()


class TpuGswAligner:
    """Batched graph aligner with device extension DP.

    wave: seeds evaluated speculatively per round. The reference's break
    usually fires after the first good seed, so a small wave wastes
    little device work while keeping one kernel launch per round."""

    def __init__(self, graph: GenomeGraph, seed_len: int = 32,
                 step_size: int = 32, scores: np.ndarray = HUMAN_CHIMP_TWO,
                 node_names: dict[int, str] | None = None,
                 interpret: bool | None = None, wave: int = 8):
        if interpret is None:  # auto: interpret unless a real TPU is up
            import jax

            interpret = jax.default_backend() != "tpu"
        self.host = GswAligner(graph, seed_len, step_size, scores,
                               node_names)
        self.dp = GswDpBatch(np.asarray(scores, np.int64), -600,
                             interpret=interpret)
        self.wave = wave

    def _record_seed(self, read: FastqBig, s, extension: int,
                     rec: _Recorder) -> tuple[int, int, int, int]:
        """Run the traversal recursion for one seed with the recording
        provider; returns the (left, right) job index ranges it used."""
        al = self.host
        l0, r0 = len(rec.left_jobs), len(rec.right_jobs)
        if s.total_length != len(read.seq):
            tail = al.seed_tail(s)
            seq = read.seq if s.pos_strand else read.seq_rc
            al._provider = rec
            try:
                al._left_traversal(al.g.nodes[s.target_id], s.target_start,
                                   extension - s.total_length,
                                   seq[:s.query_start])
                al._right_traversal(al.g.nodes[tail.target_id],
                                    tail.target_start + tail.length,
                                    extension - s.total_length,
                                    seq[tail.query_start + tail.length:])
            finally:
                al._provider = None
        return l0, len(rec.left_jobs), r0, len(rec.right_jobs)

    def align_batch(self, reads: list[FastqBig]) -> list[Giraf]:
        al = self.host
        seed_lists = al.find_seeds_batch(reads)
        states = [al.align_start(r, s) for r, s in zip(reads, seed_lists)]
        active = [i for i in range(len(reads))]
        pos = [0] * len(reads)  # next seed index per read

        wave = self.wave
        while active:
            rec = _Recorder()
            spans: dict[tuple[int, int], tuple[int, int, int, int]] = {}
            for ri in active:
                st = states[ri]
                for si in range(pos[ri],
                                min(pos[ri] + wave, len(st.seeds))):
                    spans[(ri, si)] = self._record_seed(
                        reads[ri], st.seeds[si], st.extension, rec)
            left_res, right_res = self.dp.run_both(rec.left_jobs,
                                                   rec.right_jobs)

            still = []
            for ri in active:
                st = states[ri]
                hi = min(pos[ri] + wave, len(st.seeds))
                for si in range(pos[ri], hi):
                    if st.done:
                        break  # later seeds' results are discarded
                    l0, l1, r0, r1 = spans[(ri, si)]
                    al._provider = _Replayer(left_res[l0:l1],
                                             right_res[r0:r1])
                    try:
                        al.align_seed_loop(reads[ri],
                                           [st.seeds[si]], st)
                    finally:
                        al._provider = None
                pos[ri] = hi
                if not st.done and pos[ri] < len(st.seeds):
                    still.append(ri)
            active = still
            # the long tail (few reads, many seeds) would otherwise pay a
            # device round-trip per tiny wave — grow geometrically
            wave = min(wave * 4, 512)

        return [al.align_finish(st) for st in states]

    # pairing + SAM projection reuse the host engine's logic
    def align_pair_batch(self, pairs):
        flat: list[FastqBig] = []
        for a, b in pairs:
            flat.append(a)
            flat.append(b)
        girafs = self.align_batch(flat)
        out = []
        for i in range(0, len(girafs), 2):
            a, b = girafs[i], girafs[i + 1]
            a.flag = self.host._giraf_flags(a) + 8 + 16 + 16
            b.flag = self.host._giraf_flags(b)
            if self.host._is_proper_pair(a, b):
                a.flag += 1
                b.flag += 1
            out.append((a, b))
        return out
