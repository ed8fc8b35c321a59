"""Batched TPU read aligner: seed -> vote -> banded local DP on device.

This is the TPU-first redesign of the gsw pipeline (SURVEY.md P2/P3) for
linear references, built for throughput rather than reference parity:

  host (numpy, vectorized over the whole batch):
    - genome 2-bit k-mer index as a sorted (code, pos) table; lookups are
      np.searchsorted over every read k-mer at once (maps
      genomeGraph/index.go:21-57 onto a sort/searchsorted design that
      also shards cleanly by k-mer prefix across hosts)
    - candidate generation by diagonal voting over seed hits (replaces
      the per-seed heap + branch-and-bound of search.go:339-373; the
      modal diagonal is the banded-DP anchor)
  device (Pallas, ops/wavefront.py wavefront_local):
    - one Smith-Waterman wavefront over all (read, window) pairs,
      traceback streamed as 2-bit codes
  host:
    - cigar assembly, soft clips, SAM records; MapQ from vote margin

Multi-chip scaling: the batch axis is data-parallel (shard_map over the
"data" mesh axis — see gonomics_tpu.parallel); the index is replicated
for small genomes or prefix-sharded with an all-gather of candidates.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import dna
from .gsw import HUMAN_CHIMP_TWO
from .io import sam as samio
from .io.cigar import CigarOp
from .io.chrom_info import ChromInfo
from .io.fastq import Fastq, qual_string


def _rolling_codes(seq: np.ndarray, k: int) -> np.ndarray:
    """2-bit rolling codes of every k-window (uint64); windows containing
    non-ACGT bases get the sentinel code 2^63 (never indexed).

    Vectorized over positions: k shifted adds over the whole genome
    (k <= 32 passes of length-n vector ops, no per-base Python loop)."""
    s = np.asarray(seq)
    n = len(s) - k + 1
    if n <= 0:
        return np.zeros(0, np.uint64)
    vals = np.where(s < 4, s, 0).astype(np.uint64)
    out = np.zeros(n, np.uint64)
    for i in range(k):
        out |= vals[i:n + i] << np.uint64(2 * (k - 1 - i))
    bad = np.lib.stride_tricks.sliding_window_view(s >= 4, k).any(axis=1)
    out[bad] = np.uint64(1) << np.uint64(63)
    return out


def _window_codes_fast(s: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(codes uint64, valid bool) of every k-window via log2 doubling:
    power-of-2 window codes are built by combining half-width codes
    (~log2(k) passes in narrow dtypes instead of k passes in uint64),
    then k is composed from its binary decomposition. Validity (no base
    >= 4 in the window) comes from one cumsum instead of an O(n*k)
    sliding-window reduction."""
    n = len(s) - k + 1
    if n <= 0:
        return np.zeros(0, np.uint64), np.zeros(0, bool)
    vals = np.where(s < 4, s, 0).astype(np.uint8)
    pw = {1: vals}
    w = 1
    while w * 2 <= k:
        a = pw[w]
        nb = 4 * w  # bits of the doubled code
        dt = (np.uint8 if nb <= 8 else np.uint16 if nb <= 16
              else np.uint32 if nb <= 32 else np.uint64)
        pw[w * 2] = (a[:len(a) - w].astype(dt) << (2 * w)) | a[w:]
        w *= 2
    rem, off, code = k, 0, None
    for w in sorted(pw, reverse=True):
        if rem >= w:
            part = pw[w][off:off + n]
            if code is None:
                code = part.astype(np.uint64)
            else:
                code = (code << np.uint64(2 * w)) | part
            off += w
            rem -= w
    bad = (s >= 4).astype(np.int32)
    cs = np.concatenate([np.zeros(1, np.int32), np.cumsum(bad)])
    valid = (cs[k:] - cs[:-k]) == 0
    return code, valid


def build_seed_index(genome: np.ndarray, k: int,
                     chunk: int = 1 << 24) -> tuple[np.ndarray, np.ndarray]:
    """Sorted (code, pos) seed table of every valid k-mer window —
    the sort/searchsorted redesign of genomeGraph/index.go:21-98.

    Chunked so peak temporaries stay O(chunk) + the final table (at
    genome scale the naive path's full-length int64/uint64 temporaries
    would triple the footprint); the stable sort runs through torch
    (multithreaded) when available. Positions are int32 when they fit
    (they do for any real genome), halving the table."""
    n = len(genome)
    pos_dtype = np.int32 if n < 2 ** 31 else np.int64
    codes_parts = []
    pos_parts = []
    for lo in range(0, n, chunk):
        hi = min(n, lo + chunk + k - 1)  # k-1 overlap covers the seam
        c, valid = _window_codes_fast(genome[lo:hi], k)
        c, valid = c[:chunk], valid[:chunk]
        p = np.nonzero(valid)[0].astype(pos_dtype)
        p += pos_dtype(lo)
        codes_parts.append(c[valid])
        pos_parts.append(p)
    codes = np.concatenate(codes_parts) if codes_parts else \
        np.zeros(0, np.uint64)
    pos = np.concatenate(pos_parts) if pos_parts else \
        np.zeros(0, pos_dtype)
    try:
        import torch

        # codes < 2^63 (sentinels were dropped), so int64 order matches
        ct = torch.from_numpy(codes.view(np.int64))
        order = torch.argsort(ct, stable=True)
        return (ct[order].numpy().view(np.uint64),
                torch.from_numpy(pos)[order].numpy())
    except ImportError:
        order = np.argsort(codes, kind="stable")
        return codes[order], pos[order]


_PAD_CODE = np.uint64(1) << np.uint64(63)  # > any real or bad-read code


def split_index_prefix(codes: np.ndarray, pos: np.ndarray,
                       n_shards: int) -> tuple[np.ndarray, np.ndarray]:
    """Split the sorted (code, pos) table into n_shards contiguous chunks
    whose boundaries fall BETWEEN distinct codes, so every k-mer's hit
    run lives in exactly one shard (the prefix-sharded index of
    SURVEY.md P3). Chunks are padded to equal length with a sentinel
    code no lookup can match. Returns (codes (n, L), pos (n, L))."""
    N = len(codes)
    bounds = [0]
    for i in range(1, n_shards):
        t = i * N // n_shards
        if 0 < t < N:
            # move back to the first occurrence of codes[t] — a boundary
            t = int(np.searchsorted(codes, codes[t], side="left"))
        bounds.append(max(bounds[-1], min(t, N)))
    bounds.append(N)
    L = max(1, max(bounds[i + 1] - bounds[i] for i in range(n_shards)))
    ck = np.full((n_shards, L), _PAD_CODE, np.uint64)
    ps = np.zeros((n_shards, L), np.int32)
    for i in range(n_shards):
        lo, hi = bounds[i], bounds[i + 1]
        ck[i, :hi - lo] = codes[lo:hi]
        ps[i, :hi - lo] = pos[lo:hi]
    return ck, ps


def _batch_codes(seqs: np.ndarray, offsets: np.ndarray, k: int) -> np.ndarray:
    """(B, K) codes of the k-mers starting at the given offsets: k passes
    of (B, K) column gathers (no (B, K, k) window materialization)."""
    B = seqs.shape[0]
    vals = np.where(seqs < 4, seqs, 0).astype(np.uint64)
    codes = np.zeros((B, len(offsets)), np.uint64)
    for j in range(k):
        codes = (codes << np.uint64(2)) | vals[:, offsets + j]
    bad = np.zeros((B, seqs.shape[1] + 1), np.int32)
    np.cumsum(seqs >= 4, axis=1, out=bad[:, 1:])
    badwin = (bad[:, offsets + k] - bad[:, offsets]) > 0
    codes[badwin] = np.uint64(1) << np.uint64(62)  # never matches genome
    return codes


@dataclass
class _Candidate:
    diag: np.ndarray       # (B,) best diagonal (genome pos of read start)
    votes: np.ndarray      # (B,) votes for the best diagonal
    second: np.ndarray     # (B,) votes for the runner-up diagonal
    strand: np.ndarray     # (B,) True = forward


class TpuReadAligner:
    def __init__(self, records, *, seed_len: int = 21, read_kmers: int = 8,
                 max_hits_per_kmer: int = 8, pad: int = 24,
                 scores: np.ndarray = HUMAN_CHIMP_TWO, gap: int = -600,
                 min_score: int = 1200, backend: str = "auto", mesh=None,
                 index_sharding: str = "replicated", _index=None,
                 index_mode: str = "dense", index_step: int = 8):
        """records: list of io.fasta.Fasta (the linear reference).

        mesh: optional jax.sharding.Mesh with a "data" axis; when given,
        the device wavefront+traceback runs data-parallel over the mesh
        (gonomics_tpu.parallel.shard_local_align). Outputs stay in batch
        order, so SAM emission is deterministic for any mesh shape.
        index_sharding: "replicated" (host searchsorted) or "prefix"
        (sorted table split at code boundaries over the mesh "data"
        axis, device searchsorted + psum candidate merge — byte-
        identical output; for genomes too big to replicate per host).
        _index: prebuilt (codes, pos) table from load()/save_index()."""
        self.k = seed_len
        self.read_kmers = read_kmers
        self.max_hits = max_hits_per_kmer
        self.pad = pad
        self.scores = np.asarray(scores, np.int64)
        self.gap = gap
        self.min_score = min_score
        self.mesh = mesh
        self._sharded_fns: dict = {}
        if backend == "auto":
            import jax

            backend = "tpu" if jax.default_backend() == "tpu" else "interpret"
        self.interpret = backend != "tpu"

        # concatenate chromosomes with N spacers so windows never span two
        sep = 512
        chunks = []
        self.chrom_starts = []
        self.chroms: list[ChromInfo] = []
        off = 0
        for i, rec in enumerate(records):
            seq = dna.to_upper(rec.seq).astype(np.int8, copy=False)
            self.chrom_starts.append(off)
            self.chroms.append(ChromInfo(rec.name, len(seq), i))
            chunks.append(seq)
            chunks.append(np.full(sep, dna.N, np.int8))
            off += len(seq) + sep
        self.genome = np.concatenate(chunks)
        self._starts_arr = np.array(self.chrom_starts + [off], np.int64)

        if index_mode not in ("dense", "sparse"):
            raise ValueError(f"unknown index_mode: {index_mode}")
        self.index_mode = index_mode
        self.index_step = index_step
        self._sparse = None
        if index_mode == "sparse":
            # genome-scale two-level index: step-sampled positions only
            # (~6/step B/bp vs ~12 B/bp dense); reads probe EVERY offset
            # so any sampled genome occurrence is found (the reference's
            # step-32 index + every-offset read scan, index.go:21-57,
            # search.go:549-589)
            self.idx_codes = self.idx_pos = None
            n_pos = max(2, (len(self.genome) - self.k) // index_step + 1)
            # BB capped at 22: beyond that the bucket table + the
            # build's per-thread histograms dominate RSS (2^26 cost
            # ~2 GB) for little probe speedup. Also capped at 2k: the
            # C bucket shift is code >> (2k - BB), which must be >= 0.
            self._sparse_bb = min(22, max(12, int(np.log2(n_pos)) - 3),
                                  2 * self.k)
            from . import native

            got = native.sparse_index_build(self.genome, self.k,
                                            index_step, self._sparse_bb)
            if got is not None:
                self._sparse = got
            else:
                self._sparse_fallback = self._build_sparse_fallback()
        elif _index is not None:
            self.idx_codes, self.idx_pos = _index
        else:
            self.idx_codes, self.idx_pos = build_seed_index(self.genome,
                                                            self.k)

        if index_sharding not in ("replicated", "prefix"):
            raise ValueError(f"unknown index_sharding: {index_sharding}")
        if index_sharding == "prefix" and mesh is None:
            raise ValueError("index_sharding='prefix' needs a mesh")
        self.index_sharding = index_sharding
        self._shard_lookup = None
        if index_sharding == "prefix":
            import jax.numpy as jnp

            from .parallel import shard_seed_lookup

            ck, ps = split_index_prefix(self.idx_codes, self.idx_pos,
                                        mesh.shape["data"])
            # 64-bit codes as (hi, lo) uint32 halves (x64-off safe)
            self._shard_chi = jnp.asarray((ck >> np.uint64(32))
                                          .astype(np.uint32))
            self._shard_clo = jnp.asarray(ck.astype(np.uint32))
            self._shard_ps = jnp.asarray(ps)
            self._shard_lookup = shard_seed_lookup(mesh,
                                                   max_hits=self.max_hits)

    # ---- index persistence (the reference's resumable on-disk index
    # artifacts: fasta/fai.go:86, sam/bai.go:78; SURVEY.md section 5) ----

    def save_index(self, path: str) -> None:
        """Persist the sorted (code, pos) seed table + genome layout so
        later runs (and other hosts of a multi-host job) skip the build."""
        np.savez(path if path.endswith(".npz") else path + ".npz",
                 k=np.int64(self.k),
                 codes=self.idx_codes, pos=self.idx_pos,
                 genome=self.genome,
                 starts=self._starts_arr,
                 names=np.array([c.name for c in self.chroms]),
                 sizes=np.array([c.size for c in self.chroms], np.int64))

    @classmethod
    def load(cls, path: str, **kwargs):
        """Rebuild an aligner from a save_index() file (no FASTA scan,
        no sort)."""
        from .io.fasta import Fasta

        z = np.load(path if path.endswith(".npz") else path + ".npz")
        kwargs.setdefault("seed_len", int(z["k"]))
        if kwargs["seed_len"] != int(z["k"]):
            raise ValueError(
                f"index built with k={int(z['k'])}, asked k={kwargs['seed_len']}")
        names = [str(x) for x in z["names"]]
        sizes = [int(x) for x in z["sizes"]]
        starts = z["starts"]
        genome = z["genome"]
        records = [Fasta(nm, genome[int(starts[i]):int(starts[i]) + sizes[i]])
                   for i, nm in enumerate(names)]
        return cls(records, _index=(z["codes"], z["pos"]), **kwargs)

    def header(self) -> samio.Header:
        h = samio.Header()
        h.text = ["@HD\tVN:1.6\tSO:unsorted"] + [
            f"@SQ\tSN:{c.name}\tLN:{c.size}" for c in self.chroms]
        h.chroms = list(self.chroms)
        h.sort_order = ["unsorted"]
        return h

    # ---- seeding ----

    def _lookup_hits(self, codes: np.ndarray):
        """(B, K) k-mer codes -> (hitpos (B, K, H), valid) from the
        replicated host table or the prefix-sharded device table."""
        B, K = codes.shape
        H = self.max_hits
        if self._shard_lookup is not None:
            import jax
            import jax.numpy as jnp

            qhi = jnp.asarray((codes >> np.uint64(32)).astype(np.uint32))
            qlo = jnp.asarray(codes.astype(np.uint32))
            hp, valid = self._shard_lookup(self._shard_chi,
                                           self._shard_clo,
                                           self._shard_ps, qhi, qlo)
            return (np.asarray(jax.device_get(hp)).astype(np.int64),
                    np.asarray(jax.device_get(valid)))
        from . import native

        got = native.lookup_u64(self.idx_codes, codes)
        if got is not None:  # threaded GIL-free binary search
            lo, hi = got
            lo = lo.reshape(B, K).astype(np.int64)
            hi = hi.reshape(B, K).astype(np.int64)
        else:
            # numpy fallback: probe in sorted-query order for locality
            q = codes.ravel()
            order = np.argsort(q, kind="stable")
            qs = q[order]
            lo_s = np.searchsorted(self.idx_codes, qs, side="left")
            hi_s = np.searchsorted(self.idx_codes, qs, side="right")
            lo = np.empty_like(lo_s)
            hi = np.empty_like(hi_s)
            lo[order] = lo_s
            hi[order] = hi_s
            lo = lo.reshape(B, K)
            hi = hi.reshape(B, K)
        hi = np.minimum(hi, lo + H)
        take = lo[:, :, None] + np.arange(H)[None, None, :]  # (B, K, H)
        valid = take < hi[:, :, None]
        take = np.clip(take, 0, len(self.idx_pos) - 1)
        return self.idx_pos[take].astype(np.int64), valid

    def _candidates_one_strand(self, seqs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        L = seqs.shape[1]
        K = self.read_kmers
        offs = np.linspace(0, L - self.k, K).astype(np.int64)
        codes = _batch_codes(seqs, offs, self.k)  # (B, K)
        hitpos, valid = self._lookup_hits(codes)
        return self._vote(hitpos, valid, offs)

    def _vote(self, hitpos: np.ndarray, valid: np.ndarray,
              offs: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        B, K, H = hitpos.shape
        diags = hitpos - offs[None, :, None]
        diags = np.where(valid, diags, np.int64(-1))
        # modal diagonal per read: sort the small (K*H) candidate list
        flat = np.sort(diags.reshape(B, K * H), axis=1)
        KH = flat.shape[1]
        jj = np.arange(KH, dtype=np.int64)

        def runlen(same_prev: np.ndarray) -> np.ndarray:
            """run[:, j] = length of the streak ending at j, where
            same_prev[:, j-1] says element j continues the streak —
            one maximum.accumulate instead of a KH-step Python loop."""
            chg = np.ones((B, KH), bool)
            chg[:, 1:] = ~same_prev
            last = np.maximum.accumulate(
                np.where(chg, jj[None, :], 0), axis=1)
            return jj[None, :] - last

        run = runlen(flat[:, 1:] == flat[:, :-1])
        run[flat == -1] = -1
        bestj = np.argmax(run, axis=1)
        votes = run[np.arange(B), bestj] + 1
        diag = flat[np.arange(B), bestj]
        votes = np.where(diag == -1, 0, votes)
        # runner-up votes on a different diagonal (for MapQ)
        masked = np.where(flat == diag[:, None], -1, flat)
        run2 = runlen((masked[:, 1:] == masked[:, :-1])
                      & (masked[:, 1:] != -1))
        second = run2.max(axis=1) + 1
        second = np.where((masked != -1).any(axis=1), second, 0)
        return diag, votes, second

    def _build_sparse_fallback(self):
        """numpy stand-in for the native sparse index (tests without the
        toolchain): sorted codes of the STEP-SAMPLED positions."""
        sampled = np.arange(0, len(self.genome) - self.k + 1,
                            self.index_step)
        codes, valid = _window_codes_fast(self.genome, self.k)
        codes = codes[sampled]
        valid = valid[sampled]
        pos = sampled[valid].astype(np.int64)
        codes = codes[valid]
        order = np.argsort(codes, kind="stable")
        return codes[order], pos[order]

    def _candidates_sparse(self, fwd: np.ndarray,
                           rev: np.ndarray) -> _Candidate:
        from . import native

        if self._sparse is not None:
            pos, rem, boff = self._sparse
            got = native.sparse_seed_vote(fwd, rev, self.k, self.genome,
                                          pos, rem, boff,
                                          self._sparse_bb, self.max_hits)
            if got is not None:
                diag, votes, second, strand = got
                return _Candidate(diag=diag, votes=votes, second=second,
                                  strand=strand)
        # numpy fallback: probe every offset against the sampled table
        B, L = fwd.shape
        codes_t, pos_t = self._sparse_fallback
        offs = np.arange(0, L - self.k + 1, dtype=np.int64)
        codes = np.concatenate([_batch_codes(fwd, offs, self.k),
                                _batch_codes(rev, offs, self.k)])
        q = codes.ravel()
        lo = np.searchsorted(codes_t, q, side="left").reshape(codes.shape)
        hi = np.searchsorted(codes_t, q, side="right").reshape(codes.shape)
        hi = np.minimum(hi, lo + self.max_hits)
        H = self.max_hits
        take = lo[:, :, None] + np.arange(H)[None, None, :]
        valid = take < hi[:, :, None]
        take = np.clip(take, 0, max(0, len(pos_t) - 1))
        hitpos = (pos_t[take] if len(pos_t) else
                  np.zeros(take.shape, np.int64)).astype(np.int64)
        df, vf, sf = self._vote(hitpos[:B], valid[:B], offs)
        dr, vr, sr = self._vote(hitpos[B:], valid[B:], offs)
        use_fwd = vf >= vr
        return _Candidate(
            diag=np.where(use_fwd, df, dr),
            votes=np.where(use_fwd, vf, vr),
            second=np.where(use_fwd, np.maximum(sf, vr),
                            np.maximum(sr, vf)),
            strand=use_fwd)

    def _candidates(self, fwd: np.ndarray, rev: np.ndarray) -> _Candidate:
        if self.index_mode == "sparse":
            return self._candidates_sparse(fwd, rev)
        B, L = fwd.shape
        K = self.read_kmers
        offs = np.linspace(0, L - self.k, K).astype(np.int64)
        if self._shard_lookup is None:
            from . import native

            got = native.seed_vote(fwd, rev, offs, self.k,
                                   self.idx_codes, self.idx_pos,
                                   self.max_hits)
            if got is not None:  # whole seed+vote stage, one C pass
                diag, votes, second, strand = got
                return _Candidate(diag=diag, votes=votes, second=second,
                                  strand=strand)
        # numpy fallback: one index lookup for both strands
        codes = np.concatenate([_batch_codes(fwd, offs, self.k),
                                _batch_codes(rev, offs, self.k)])
        hitpos, valid = self._lookup_hits(codes)
        df, vf, sf = self._vote(hitpos[:B], valid[:B], offs)
        dr, vr, sr = self._vote(hitpos[B:], valid[B:], offs)
        use_fwd = vf >= vr
        return _Candidate(
            diag=np.where(use_fwd, df, dr),
            votes=np.where(use_fwd, vf, vr),
            second=np.where(use_fwd, np.maximum(sf, vr), np.maximum(sr, vf)),
            strand=use_fwd)

    # ---- alignment ----

    def align_batch(self, reads: list[Fastq]) -> list[samio.Sam]:
        return self.finish_batch(self.align_batch_async(reads))

    def align_batch_async(self, reads: list[Fastq]):
        """Host prep + async device dispatch; pair with finish_batch.
        Lets the caller overlap the next batch's host-side seeding with
        this batch's device DP (the channel-pipelining analog of
        cmd/gsw/pairedEndFastqs.go:24-35)."""
        import jax.numpy as jnp

        from .ops.wavefront import local_align_full

        B = len(reads)
        lens = np.fromiter((len(r.seq) for r in reads), np.int64, B)
        L = int(lens.max())
        fwd = np.full((B, L), dna.N, np.int8)
        uniform = bool((lens == L).all())
        if uniform:
            for i, r in enumerate(reads):
                fwd[i] = r.seq
            # whole-batch reverse complement (the per-read loop was a
            # serial host cost that bounded multi-chip scaling)
            rev = dna.complement(fwd[:, ::-1]).astype(np.int8)
        else:
            for i, r in enumerate(reads):
                fwd[i, :len(r.seq)] = r.seq
            rev = np.full((B, L), dna.N, np.int8)
            for i, r in enumerate(reads):
                rc = dna.reverse_complement(r.seq).astype(np.int8)
                rev[i, :len(rc)] = rc

        cand = self._candidates(fwd, rev)
        W = L + 2 * self.pad
        starts = np.clip(cand.diag - self.pad, 0, len(self.genome) - W)
        read_seqs = np.where(cand.strand[:, None], fwd, rev)

        quantum = 8
        if self.mesh is not None:
            quantum = 8 * self.mesh.shape["data"]
        Bp = max(quantum, -(-B // quantum) * quantum)
        if Bp != B:
            pad_rows = np.full((Bp - B, L), dna.N, np.int8)
            read_seqs = np.vstack([read_seqs, pad_rows])
        n_vec = np.zeros((Bp, 1), np.int32)
        n_vec[:B, 0] = lens
        m_vec = np.full((Bp, 1), W, np.int32)

        import jax

        if self.mesh is not None:
            windows = self.genome[starts[:, None] + np.arange(W)]
            if Bp != B:
                windows = np.vstack([windows,
                                     np.full((Bp - B, W), dna.N, np.int8)])
            fn = self._sharded_fns.get((L, W))
            if fn is None:
                from .parallel import shard_local_align

                fn = shard_local_align(self.mesh, self.scores, n=L, m=W,
                                       gap=self.gap,
                                       interpret=self.interpret)
                self._sharded_fns[(L, W)] = fn
            res = fn(jnp.asarray(read_seqs), jnp.asarray(windows),
                     jnp.asarray(n_vec), jnp.asarray(m_vec))
            walk_d = L + W  # wavefront walk length
        else:
            # banded engine: the vote anchor pins the path near diagonal
            # `pad`, so a 64-lane band over L rows replaces the (L+W)-
            # step 2L-lane wavefront (~10x less device work). Reads and
            # windows go up 2-codes-per-byte, and the five result
            # vectors + packed walk come back as ONE array — each extra
            # device<->host array costs a tunnel round-trip.
            windows = self.genome[starts[:, None] + np.arange(W)]
            if Bp != B:
                windows = np.vstack([windows,
                                     np.full((Bp - B, W), dna.N, np.int8)])
            res = self._banded_driver(L, W)(
                jnp.asarray(self._pack4(read_seqs)),
                jnp.asarray(self._pack4(windows)),
                jnp.asarray(n_vec), jnp.asarray(m_vec))
            # schedule the device->host copy NOW: it runs as soon as the
            # kernel finishes, so finish_batch usually finds the bytes
            # already on host instead of paying the tunnel latency there
            res.copy_to_host_async()
            walk_d = L + 64 + 4
        return reads, cand, starts, lens, read_seqs, res, walk_d

    @staticmethod
    def _pack4(seqs: np.ndarray) -> np.ndarray:
        """Two 4-bit base codes per byte (codes 0..12 fit)."""
        B, L = seqs.shape
        if L % 2:
            seqs = np.concatenate(
                [seqs, np.full((B, 1), dna.N, np.int8)], axis=1)
        u = seqs.astype(np.uint8)
        return (u[:, ::2] | (u[:, 1::2] << 4)).astype(np.uint8)

    def _banded_driver(self, L: int, W: int):
        """Jitted unpack + banded DP + single-array result packing,
        cached per shape."""
        fn = self._sharded_fns.get(("banded", L, W))
        if fn is not None:
            return fn
        import jax
        import jax.numpy as jnp

        from .ops.wavefront import banded_align_full, profile_fits16

        scores = self.scores
        p16 = profile_fits16(scores)
        gap = self.gap
        interpret = self.interpret

        def unpack(pk, n):
            lo = (pk & 0xF).astype(jnp.int8)
            hi = ((pk >> 4) & 0xF).astype(jnp.int8)
            return jnp.stack([lo, hi], axis=-1).reshape(
                pk.shape[0], -1)[:, :n]

        @jax.jit
        def run(preads, pwins, n_vec, m_vec):
            rs = unpack(preads, L)
            windows = unpack(pwins, W)
            score, i_end, j_end, i0, j0, packed = banded_align_full(
                rs, windows, n_vec, m_vec, scores, L=L, W=W, gap=gap,
                interpret=interpret, prof16=p16)
            meta = jnp.stack([score, i_end, j_end, i0, j0],
                             axis=1).astype(jnp.int32)
            meta8 = jax.lax.bitcast_convert_type(
                meta, jnp.uint8).reshape(meta.shape[0], 20)
            return jnp.concatenate([meta8, packed], axis=1)

        self._sharded_fns[("banded", L, W)] = run
        return run

    @staticmethod
    def _decode_res(res):
        """(score, i_end, j_end, i0, j0, packed-ops) from either the
        mesh path's tuple or the banded driver's single packed array."""
        import jax

        if isinstance(res, (tuple, list)):
            return jax.device_get(res)
        buf = np.asarray(jax.device_get(res))
        meta = np.ascontiguousarray(buf[:, :20]).view(np.int32)
        return (meta[:, 0], meta[:, 1], meta[:, 2], meta[:, 3],
                meta[:, 4], buf[:, 20:])

    def finish_batch(self, handle) -> list[samio.Sam]:
        """Block on the device result of align_batch_async and emit SAM."""
        import jax

        from .ops.wavefront import unpack_ops

        reads, cand, starts, lens, _seqs, res, walk_d = handle
        score, i_end, _j_end, i0, j0, packed = self._decode_res(res)
        ops = unpack_ops(np.asarray(packed[:len(reads)]), walk_d)
        routes = self._routes_from_ops_batch(ops)

        out: list[samio.Sam] = []
        for b, r in enumerate(reads):
            out.append(self._emit(r, b, score, i_end, i0, j0, routes[b],
                                  cand, starts, int(lens[b])))
        return out

    def finish_batch_lines(self, handle) -> str:
        """finish_batch, emitting the whole batch as SAM TEXT through the
        native bulk formatter (native/seqio.cpp format_sam_lines) —
        byte-identical to joining finish_batch()'s to_string()s, without
        per-read Sam-object churn (the serial host cost that would bound
        multi-chip scaling). Falls back to the object path for
        non-uniform read lengths or a missing native lib."""
        import jax

        from . import native

        reads, cand, starts, lens, read_seqs, res, walk_d = handle
        B = len(reads)
        lens = np.asarray(lens)
        if not native.available() or not (lens == lens[0]).all():
            return "".join(s.to_string() + "\n"
                           for s in self.finish_batch(handle))
        from . import native as _native
        from .ops.wavefront import unpack_ops

        score, i_end, _j, i0, j0, packed = (np.asarray(x)
                                            for x in self._decode_res(res))
        score, i_end, i0, j0 = (x[:B] for x in (score, i_end, i0, j0))

        mapped = (score >= self.min_score) & (cand.votes > 0)
        got = _native.walk_to_cigars(packed[:B], walk_d, i0, i_end, lens,
                                     mapped)
        if got is not None:
            cig_off, cig_cnt, run_lens, run_ops, mapped = got
        else:
            ops = unpack_ops(packed[:B], walk_d)
            cig_off, cig_cnt, run_lens, run_ops, mapped = \
                self._flat_cigars(ops, i0, i_end, lens, mapped)

        gpos = starts[:B] + j0
        ci = np.searchsorted(self._starts_arr, gpos, side="right") - 1
        pos = gpos - self._starts_arr[ci] + 1
        rsel = np.where(mapped, ci, -1).astype(np.int32)
        poss = np.where(mapped, pos, 0).astype(np.int32)
        flags = np.where(mapped, np.where(cand.strand, 0, 16),
                         4).astype(np.int32)
        margin = (cand.votes - cand.second).astype(np.int64)
        mapqs = np.where(mapped, np.clip(10 * margin + 10, 0, 60),
                         0).astype(np.int32)
        quals = np.stack([r.qual for r in reads]).astype(np.uint8)
        rev = ~np.asarray(cand.strand)
        quals[rev] = quals[rev, ::-1]
        text = native.format_sam_lines(
            "\n".join(r.name for r in reads),
            [c.name for c in self.chroms], flags, rsel, poss, mapqs,
            score.astype(np.int64), mapped.astype(np.uint8),
            read_seqs[:B], quals, lens.astype(np.int32),
            cig_off, cig_cnt, run_lens, run_ops)
        if text is None:
            return "".join(s.to_string() + "\n"
                           for s in self.finish_batch(handle))
        return text

    @staticmethod
    def _flat_cigars(ops: np.ndarray, i0, i_end, lens, mapped):
        """Forward-order flattened cigar runs (soft clips included) for
        the whole batch, from the backward-walk op codes — all numpy."""
        B, D = ops.shape
        stop = ops >= 3
        row_ends = np.where(stop.any(axis=1), stop.argmax(axis=1), D)
        col = np.arange(D)[None, :]
        valid = col < row_ends[:, None]
        change = np.ones((B, D), bool)
        change[:, 1:] = ops[:, 1:] != ops[:, :-1]
        change &= valid
        rows, starts_ = np.nonzero(change)
        if len(rows):
            codes = ops[rows, starts_]
            ends = np.empty_like(starts_)
            same = rows[:-1] == rows[1:]
            ends[:-1] = np.where(same, starts_[1:], row_ends[rows[:-1]])
            ends[-1] = row_ends[rows[-1]]
            mid_len = ends - starts_
        else:
            codes = np.zeros(0, np.int8)
            mid_len = np.zeros(0, np.int64)
        seg_lo = np.searchsorted(rows, np.arange(B))
        seg_len = np.searchsorted(rows, np.arange(B) + 1) - seg_lo
        mapped = mapped & (seg_len > 0)
        lead = mapped & (i0 > 0)
        trail = mapped & (i_end < lens)
        cnt = np.where(mapped, seg_len + lead + trail, 0).astype(np.int32)
        off = np.zeros(B + 1, np.int64)
        np.cumsum(cnt, out=off[1:])
        total = int(off[-1])
        fl = np.zeros(total, np.int32)
        fo = np.zeros(total, np.uint8)
        li = np.nonzero(lead)[0]
        fl[off[li]] = i0[li]
        fo[off[li]] = ord("S")
        ti = np.nonzero(trail)[0]
        fl[off[ti] + cnt[ti] - 1] = (lens - i_end)[ti]
        fo[off[ti] + cnt[ti] - 1] = ord("S")
        if len(rows):
            keep = mapped[rows]
            r = rows[keep]
            k_in = (np.arange(len(rows)) - seg_lo[rows])[keep]
            tgt = off[r] + lead[r] + seg_len[r] - 1 - k_in
            fl[tgt] = mid_len[keep]
            fo[tgt] = np.array([ord("M"), ord("D"), ord("I")],
                               np.uint8)[codes[keep]]
        return off[:B].astype(np.int32), cnt, fl, fo, mapped

    @staticmethod
    def _routes_from_ops_batch(ops: np.ndarray) -> list[list[CigarOp]]:
        """Backward-walk op codes -> forward run-length cigars for the
        WHOLE batch in one vectorized RLE pass (one np.nonzero over
        (B, D) instead of per-read numpy calls — the emit hot spot)."""
        B, D = ops.shape
        stop = ops >= 3
        row_ends = np.where(stop.any(axis=1), stop.argmax(axis=1), D)
        col = np.arange(D)[None, :]
        valid = col < row_ends[:, None]
        change = np.ones((B, D), bool)
        change[:, 1:] = ops[:, 1:] != ops[:, :-1]
        change &= valid
        rows, starts = np.nonzero(change)  # row-major: runs in order
        if len(rows) == 0:
            return [[] for _ in range(B)]
        run_ops = ops[rows, starts]
        ends = np.empty_like(starts)
        same_row = rows[:-1] == rows[1:]
        ends[:-1] = np.where(same_row, starts[1:], row_ends[rows[:-1]])
        ends[-1] = row_ends[rows[-1]]
        lengths = (ends - starts).tolist()
        chars = "MDI"
        routes: list[list[CigarOp]] = [[] for _ in range(B)]
        for r, o, ln in zip(rows.tolist(), run_ops.tolist(), lengths):
            routes[r].append(CigarOp(ln, chars[o]))
        for route in routes:
            route.reverse()
        return routes

    def _locate(self, gpos: int) -> tuple[str, int]:
        ci = int(np.searchsorted(self._starts_arr, gpos, side="right")) - 1
        return self.chroms[ci].name, gpos - self.chrom_starts[ci]

    def _emit(self, r: Fastq, b: int, score, i_end, i0, j0, route,
              cand: _Candidate, starts, read_len: int) -> samio.Sam:
        strand = bool(cand.strand[b])
        qual = r.qual if strand else r.qual[::-1]
        seq = r.seq if strand else dna.reverse_complement(r.seq).astype(np.int8)
        s = samio.Sam(qname=r.name, flag=4, rname="*", pos=0, mapq=0,
                      cigar=[CigarOp(0, "*")], rnext="*", pnext=0, tlen=0,
                      seq=seq, qual=qual_string(qual))
        if score[b] < self.min_score or cand.votes[b] == 0:
            return s
        if not route:
            return s
        cig: list[CigarOp] = []
        if i0[b] > 0:
            cig.append(CigarOp(int(i0[b]), "S"))
        cig.extend(route)
        if i_end[b] < read_len:
            cig.append(CigarOp(int(read_len - i_end[b]), "S"))
        gpos = int(starts[b]) + int(j0[b])
        chrom, cpos = self._locate(gpos)
        s.rname = chrom
        s.pos = cpos + 1
        s.flag = 0 if strand else 16
        s.cigar = cig
        margin = int(cand.votes[b] - cand.second[b])
        s.mapq = max(0, min(60, 10 * margin + 10))
        s.extra = f"AS:i:{int(score[b])}"
        return s

    def align_pairs(self, pairs: list[tuple[Fastq, Fastq]]) -> list[samio.Sam]:
        return self.finish_pairs(self.align_pairs_async(pairs))

    def align_pairs_async(self, pairs: list[tuple[Fastq, Fastq]]):
        flat: list[Fastq] = []
        for a, bb in pairs:
            flat.append(a)
            flat.append(bb)
        return self.align_batch_async(flat)

    def finish_pairs(self, handle) -> list[samio.Sam]:
        sams = self.finish_batch(handle)
        for i in range(0, len(sams), 2):
            a, b = sams[i], sams[i + 1]
            for x, y, first in ((a, b, True), (b, a, False)):
                x.flag |= 1 | (64 if first else 128)
                if y.flag & 4:
                    x.flag |= 8
                else:
                    x.rnext = "=" if y.rname == x.rname else y.rname
                    x.pnext = y.pos
            if not (a.flag & 4) and not (b.flag & 4) and a.rname == b.rname:
                lo = min(a.pos, b.pos)
                hi = max(a.pos + sum(c.run_length for c in a.cigar
                                     if c.op in "MDN=X"),
                         b.pos + sum(c.run_length for c in b.cigar
                                     if c.op in "MDN=X"))
                tlen = hi - lo
                if tlen < 10000 and ((a.flag & 16) != (b.flag & 16)):
                    a.flag |= 2
                    b.flag |= 2
                a.tlen = tlen if a.pos <= b.pos else -tlen
                b.tlen = -a.tlen
        return sams
