"""ctypes bindings to the native host-IO runtime (native/seqio.cpp).

Builds libseqio.so on first use (g++ -O2 -lz -pthread); every entry point
has a pure-Python fallback so the package works without a toolchain.
The native BGZF path decompresses blocks across threads — this is the
C++ analog of the reference's pgzip/bgzf readers (SURVEY.md 2.5 item 6).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "..", "native", "seqio.cpp")
_SO = os.path.join(_HERE, "..", "native", "libseqio.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            if (not os.path.exists(_SO)
                    or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
                subprocess.run(
                    ["g++", "-O2", "-shared", "-fPIC", "-o", _SO, _SRC,
                     "-lz", "-pthread"],
                    check=True, capture_output=True)
            lib = ctypes.CDLL(_SO)
            lib.bgzf_scan.restype = ctypes.c_int64
            lib.bgzf_scan.argtypes = [ctypes.c_char_p, ctypes.c_int64]
            lib.bgzf_decompress.restype = ctypes.c_int
            lib.bgzf_decompress.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int]
            lib.fastq_parse.restype = ctypes.c_int64
            lib.fastq_parse.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64]
            lib.format_bed_windows.restype = ctypes.c_int64
            lib.format_bed_windows.argtypes = [
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64]
            lib.sam_scatter.restype = ctypes.c_int
            lib.sam_scatter.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p]
            lib.walk_to_cigars.restype = ctypes.c_int64
            lib.walk_to_cigars.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int32]
            lib.seed_vote.restype = None
            lib.seed_vote.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32]
            lib.lookup_u64.restype = None
            lib.lookup_u64.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int32]
            lib.sparse_index_build.restype = ctypes.c_int64
            lib.sparse_index_build.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int32]
            lib.sparse_seed_vote.restype = None
            lib.sparse_seed_vote.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int32, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32]
            lib.cv_snv_pass.restype = ctypes.c_int64
            lib.cv_snv_pass.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_double, ctypes.c_double, ctypes.c_double,
                ctypes.c_double, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32, ctypes.c_void_p, ctypes.c_int32]
            lib.graph_hits.restype = ctypes.c_int64
            lib.graph_hits.argtypes = [
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32]
            lib.cv_prescreen.restype = ctypes.c_int64
            lib.cv_prescreen.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int32, ctypes.c_int32, ctypes.c_int64,
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int32,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32]
            lib.compress_blocks.restype = ctypes.c_int64
            lib.compress_blocks.argtypes = [
                ctypes.c_char_p, ctypes.c_int64, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_int32]
            lib.fa_find_windows.restype = ctypes.c_int64
            lib.fa_find_windows.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
                ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int32]
            lib.runs_to_counts.restype = ctypes.c_int32
            lib.runs_to_counts.argtypes = [
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
                ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                ctypes.c_void_p, ctypes.c_int32]
            lib.format_sam_lines.restype = ctypes.c_int64
            lib.format_sam_lines.argtypes = [
                ctypes.c_char_p, ctypes.c_int64,      # qnames
                ctypes.c_char_p, ctypes.c_int64,      # names
                ctypes.c_void_p, ctypes.c_void_p,     # flags, rsel
                ctypes.c_void_p, ctypes.c_void_p,     # poss, mapqs
                ctypes.c_void_p, ctypes.c_void_p,     # scores, has_as
                ctypes.c_void_p, ctypes.c_void_p,     # seqs, quals
                ctypes.c_void_p, ctypes.c_int32,      # lens, L
                ctypes.c_void_p, ctypes.c_void_p,     # cig_off, cig_cnt
                ctypes.c_void_p, ctypes.c_void_p,     # run_lens, run_ops
                ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def available() -> bool:
    return _load() is not None


def bgzf_decompress(data: bytes, nthreads: int | None = None) -> bytes | None:
    """Parallel BGZF decompression; None if data isn't BGZF or the native
    lib is unavailable (callers fall back to gzip)."""
    lib = _load()
    if lib is None:
        return None
    if nthreads is None:
        nthreads = os.cpu_count() or 2
    total = lib.bgzf_scan(data, len(data))
    if total < 0:
        return None
    out = np.empty(total, np.uint8)
    rc = lib.bgzf_decompress(data, len(data),
                             out.ctypes.data_as(ctypes.c_void_p), total,
                             nthreads)
    if rc != 0:
        return None
    return out.tobytes()


def fastq_parse_batch(data: bytes, max_records: int, max_len: int):
    """Parse FASTQ text to packed (names, seq_codes, quals, lengths);
    None on fallback."""
    lib = _load()
    if lib is None:
        return None
    seq = np.empty((max_records, max_len), np.int8)
    qual = np.empty((max_records, max_len), np.uint8)
    lens = np.empty(max_records, np.int32)
    name_cap = len(data)
    names = np.empty(name_cap, np.uint8)
    n = lib.fastq_parse(data, len(data), max_records, max_len,
                        seq.ctypes.data_as(ctypes.c_void_p),
                        qual.ctypes.data_as(ctypes.c_void_p),
                        lens.ctypes.data_as(ctypes.c_void_p),
                        names.ctypes.data_as(ctypes.c_void_p), name_cap)
    if n < 0:
        return None
    n = int(n)
    name_list = bytes(names.tobytes()).split(b"\n")
    name_list = [s.decode() for s in name_list[:n]]
    return name_list, seq[:n], qual[:n], lens[:n]


def format_bed_windows(name: str, starts: np.ndarray, ends: np.ndarray,
                       muts: np.ndarray) -> str | None:
    """Bulk-format faFindFast short bed lines; None if the native lib is
    unavailable (caller falls back to python string building)."""
    lib = _load()
    if lib is None:
        return None
    s = np.ascontiguousarray(starts, np.int64)
    e = np.ascontiguousarray(ends, np.int64)
    m = np.ascontiguousarray(muts, np.int64)
    n = len(s)
    cap = max(1024, (2 * len(name.encode()) + 70) * n)
    buf = ctypes.create_string_buffer(cap)
    wrote = lib.format_bed_windows(
        name.encode(), s.ctypes.data_as(ctypes.c_void_p),
        e.ctypes.data_as(ctypes.c_void_p),
        m.ctypes.data_as(ctypes.c_void_p), n, buf, cap)
    if wrote < 0:
        return None
    # string_at copies only the written span (buf.raw would copy cap)
    return ctypes.string_at(buf, int(wrote)).decode()


def format_sam_lines(qnames: str, names: list[str], flags, rsel, poss,
                     mapqs, scores, has_as, seqs, quals, lens,
                     cig_off, cig_cnt, run_lens, run_ops) -> str | None:
    """Bulk-format SAM text lines (tpu_align emit path); None if the
    native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    qn = qnames.encode()
    nm = "\n".join(names).encode()
    B, L = seqs.shape

    def a(x, dt):
        return np.ascontiguousarray(x, dt)

    flags = a(flags, np.int32)
    rsel = a(rsel, np.int32)
    poss = a(poss, np.int32)
    mapqs = a(mapqs, np.int32)
    scores = a(scores, np.int64)
    has_as = a(has_as, np.uint8)
    seqs = a(seqs, np.int8)
    quals = a(quals, np.uint8)
    lens = a(lens, np.int32)
    cig_off = a(cig_off, np.int32)
    cig_cnt = a(cig_cnt, np.int32)
    run_lens = a(run_lens, np.int32)
    run_ops = a(run_ops, np.uint8)
    cap = int(len(qn) + B * (2 * L + 80) + 12 * (len(run_lens) + 1) + 1024)
    buf = ctypes.create_string_buffer(cap)
    vp = ctypes.c_void_p
    wrote = lib.format_sam_lines(
        qn, len(qn), nm, len(nm),
        flags.ctypes.data_as(vp), rsel.ctypes.data_as(vp),
        poss.ctypes.data_as(vp), mapqs.ctypes.data_as(vp),
        scores.ctypes.data_as(vp), has_as.ctypes.data_as(vp),
        seqs.ctypes.data_as(vp), quals.ctypes.data_as(vp),
        lens.ctypes.data_as(vp), L,
        cig_off.ctypes.data_as(vp), cig_cnt.ctypes.data_as(vp),
        run_lens.ctypes.data_as(vp), run_ops.ctypes.data_as(vp),
        B, buf, cap)
    if wrote < 0:
        return None
    return ctypes.string_at(buf, int(wrote)).decode()


def walk_to_cigars(packed, D: int, i0, i_end, lens, mapped,
                   nthreads: int = 0):
    """Packed walk ops -> forward flat cigar runs + soft clips for the
    whole batch (unpack_ops + _flat_cigars in one threaded C pass).
    Returns (cig_off, cig_cnt, run_lens, run_ops, mapped) or None."""
    lib = _load()
    if lib is None:
        return None
    if nthreads <= 0:
        nthreads = min(4, os.cpu_count() or 1)
    packed = np.ascontiguousarray(packed, np.uint8)
    B, P = packed.shape
    i0 = np.ascontiguousarray(i0, np.int32)
    i_end = np.ascontiguousarray(i_end, np.int32)
    lens = np.ascontiguousarray(lens, np.int32)
    mp = np.ascontiguousarray(mapped, np.uint8).copy()
    cig_off = np.empty(B, np.int32)
    cig_cnt = np.empty(B, np.int32)
    cap = B * (D + 4)
    run_lens = np.empty(cap, np.int32)
    run_ops = np.empty(cap, np.uint8)
    vp = ctypes.c_void_p
    total = lib.walk_to_cigars(
        packed.ctypes.data_as(vp), B, P, D,
        i0.ctypes.data_as(vp), i_end.ctypes.data_as(vp),
        lens.ctypes.data_as(vp), mp.ctypes.data_as(vp),
        cig_off.ctypes.data_as(vp), cig_cnt.ctypes.data_as(vp),
        run_lens.ctypes.data_as(vp), run_ops.ctypes.data_as(vp),
        cap, nthreads)
    if total < 0:
        return None
    t = int(total)
    return cig_off, cig_cnt, run_lens[:t], run_ops[:t], mp.view(bool)


def seed_vote(fwd, rev, offs, k: int, table_codes, table_pos,
              max_hits: int, nthreads: int = 0):
    """Seed lookup + modal-diagonal voting for a whole batch in one
    threaded C pass (tpu_align._candidates semantics, bit-exact).
    Returns (diag, votes, second, strand) or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    if nthreads <= 0:
        nthreads = min(4, os.cpu_count() or 1)
    fwd = np.ascontiguousarray(fwd, np.int8)
    rev = np.ascontiguousarray(rev, np.int8)
    offs = np.ascontiguousarray(offs, np.int32)
    tpos = np.ascontiguousarray(table_pos, np.int32)
    B, L = fwd.shape
    diag = np.empty(B, np.int64)
    votes = np.empty(B, np.int64)
    second = np.empty(B, np.int64)
    strand = np.empty(B, np.uint8)
    vp = ctypes.c_void_p
    lib.seed_vote(fwd.ctypes.data_as(vp), rev.ctypes.data_as(vp), B, L,
                  offs.ctypes.data_as(vp), len(offs), k,
                  table_codes.ctypes.data_as(vp),
                  tpos.ctypes.data_as(vp), len(table_codes), max_hits,
                  diag.ctypes.data_as(vp), votes.ctypes.data_as(vp),
                  second.ctypes.data_as(vp), strand.ctypes.data_as(vp),
                  nthreads)
    return diag, votes, second, strand.view(bool)


def sparse_index_build(genome: np.ndarray, k: int, step: int, BB: int,
                       nthreads: int = 0):
    """Two-level sparse seed index: step-sampled positions sorted by
    k-mer code within 2^BB top-bit buckets, plus a uint16 code-remainder
    column (~6/step B/bp, vs ~12 B/bp for the dense (code, pos) table).
    Returns (pos int32 (N,), rem uint16 (N,), bucket_off int64 (2^BB+1,))
    or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    if nthreads <= 0:
        nthreads = min(4, os.cpu_count() or 1)
    genome = np.ascontiguousarray(genome, np.int8)
    n = len(genome)
    n_pos = (n - k) // step + 1 if n >= k else 0
    pos = np.zeros(max(1, n_pos), np.int32)
    rem = np.zeros(max(1, n_pos), np.uint16)
    boff = np.zeros((1 << BB) + 1, np.int64)
    vp = ctypes.c_void_p
    total = lib.sparse_index_build(
        genome.ctypes.data_as(vp), n, k, step, BB,
        pos.ctypes.data_as(vp), rem.ctypes.data_as(vp),
        boff.ctypes.data_as(vp), nthreads)
    return pos[:total], rem[:total], boff


def sparse_seed_vote(fwd, rev, k: int, genome, pos, rem, bucket_off,
                     BB: int, max_hits: int, nthreads: int = 0):
    """Seed lookup + modal-diagonal voting against the sparse index:
    every read offset probes the two-level table (bucket + uint16
    remainder binary search + full-code verify against the genome).
    Returns (diag, votes, second, strand) or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    if nthreads <= 0:
        nthreads = min(4, os.cpu_count() or 1)
    fwd = np.ascontiguousarray(fwd, np.int8)
    rev = np.ascontiguousarray(rev, np.int8)
    genome = np.ascontiguousarray(genome, np.int8)
    B, L = fwd.shape
    diag = np.empty(B, np.int64)
    votes = np.empty(B, np.int64)
    second = np.empty(B, np.int64)
    strand = np.empty(B, np.uint8)
    vp = ctypes.c_void_p
    lib.sparse_seed_vote(
        fwd.ctypes.data_as(vp), rev.ctypes.data_as(vp), B, L, k,
        genome.ctypes.data_as(vp), len(genome),
        pos.ctypes.data_as(vp), rem.ctypes.data_as(vp),
        bucket_off.ctypes.data_as(vp), BB, max_hits,
        diag.ctypes.data_as(vp), votes.ctypes.data_as(vp),
        second.ctypes.data_as(vp), strand.ctypes.data_as(vp), nthreads)
    return diag, votes, second, strand.view(bool)


def cv_snv_pass(counts_list, clo, cspan, exists, depths, expsum,
                ref_codes, idx, n_exp: int, max_p: float, min_af: float,
                max_af: float, max_strand_bias: float, min_coverage: int,
                min_alt_reads: int, nthreads: int = 0):
    """callVariants SNV decision cascade + Fisher tail for candidate
    sites in one threaded C pass (call_variants._vector_snv_pass
    semantics, no-miss). Returns a bool (C,) site-pass mask or None."""
    lib = _load()
    if lib is None:
        return None
    n_samp = len(counts_list)
    if nthreads <= 0:
        nthreads = min(4, os.cpu_count() or 1)
    dts = {c.dtype for c in counts_list if c is not None}
    # mixed dtypes (one sample's scatter saturated to int32): widen all
    dt = np.int16 if dts == {np.dtype(np.int16)} else np.int32
    is16 = np.dtype(dt) == np.int16
    keep = [None if c is None else np.ascontiguousarray(c, dt)
            for c in counts_list]
    ptrs = np.array([0 if c is None else c.ctypes.data for c in keep],
                    np.uintp)
    clo = np.ascontiguousarray(clo, np.int64)
    cspan = np.ascontiguousarray(cspan, np.int64)
    exists = np.ascontiguousarray(exists, np.uint8)
    depths = np.ascontiguousarray(depths, np.int32)
    expsum = np.ascontiguousarray(expsum, np.int32)
    ref_codes = np.ascontiguousarray(ref_codes, np.int8)
    idx = np.ascontiguousarray(idx, np.int64)
    L = exists.shape[1]
    out = np.zeros(len(idx), np.uint8)
    vp = ctypes.c_void_p
    lib.cv_snv_pass(ptrs.ctypes.data_as(vp), clo.ctypes.data_as(vp),
                    cspan.ctypes.data_as(vp), exists.ctypes.data_as(vp),
                    depths.ctypes.data_as(vp), expsum.ctypes.data_as(vp),
                    ref_codes.ctypes.data_as(vp), idx.ctypes.data_as(vp),
                    len(idx), L, 0, n_samp, n_exp,
                    max_p, min_af, max_af, max_strand_bias,
                    min_coverage, min_alt_reads, int(is16),
                    out.ctypes.data_as(vp), nthreads)
    return out.view(bool)


def graph_hits(seq2: np.ndarray, row_len: np.ndarray, k: int,
               codes: np.ndarray, packed: np.ndarray, concat: np.ndarray,
               noff: np.ndarray, nlen: np.ndarray, has_next: np.ndarray,
               prev_cnt: np.ndarray, nthreads: int = 0):
    """Batched graph seed hits (rolling k-mer codes -> sorted-table
    binary search -> maximal exact-run extents + crossing flags) in one
    threaded GIL-free C pass; the hot loop of the graph aligner's seed
    finder. Returns an (H, 8) int64 array
    (row, rs, node, rs0, np0, right_run, cross_right, maybe_left) in
    row-major probe order, or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    if nthreads <= 0:
        nthreads = min(4, os.cpu_count() or 1)
    seq2 = np.ascontiguousarray(seq2, np.int8)
    row_len = np.ascontiguousarray(row_len, np.int32)
    packed = np.ascontiguousarray(packed, np.int64)
    concat = np.ascontiguousarray(concat, np.int8)
    noff = np.ascontiguousarray(noff, np.int64)
    nlen = np.ascontiguousarray(nlen, np.int64)
    has_next = np.ascontiguousarray(has_next, np.uint8)
    prev_cnt = np.ascontiguousarray(prev_cnt, np.int32)
    R2, Lmax = seq2.shape
    cap = max(1024, 64 * R2)
    vp = ctypes.c_void_p
    for _ in range(3):
        out = np.empty((cap, 8), np.int64)
        total = lib.graph_hits(
            seq2.ctypes.data_as(vp), R2, Lmax,
            row_len.ctypes.data_as(vp), k,
            codes.ctypes.data_as(vp), len(codes),
            packed.ctypes.data_as(vp), concat.ctypes.data_as(vp),
            noff.ctypes.data_as(vp), nlen.ctypes.data_as(vp),
            has_next.ctypes.data_as(vp), prev_cnt.ctypes.data_as(vp),
            out.ctypes.data_as(vp), cap, nthreads)
        if total <= cap:
            return out[:total]
        cap = int(total)
    return None


def lookup_u64(table: np.ndarray, queries: np.ndarray,
               nthreads: int = 0):
    """Threaded lower/upper-bound search of sorted uint64 `table` for
    each query; returns (lo, hi) int32 arrays or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    if nthreads <= 0:
        nthreads = min(4, os.cpu_count() or 1)
    q = np.ascontiguousarray(queries, np.uint64)
    lo = np.empty(q.shape, np.int32)
    hi = np.empty(q.shape, np.int32)
    vp = ctypes.c_void_p
    lib.lookup_u64(table.ctypes.data_as(vp), len(table),
                   q.ctypes.data_as(vp), q.size,
                   lo.ctypes.data_as(vp), hi.ctypes.data_as(vp), nthreads)
    return lo, hi


def cv_prescreen(cnt2_list, depth_list, offs, spans, ins_pos, ins_tot,
                 ins_off, del_pos, del_off, n_exp: int, L: int, lo: int,
                 refarr, min_coverage: int, nthreads: int = 0):
    """callVariants candidate prescreen in one threaded C pass; returns
    (exists bool (n_samp, L), depths int32, expsum int32 (L, 13),
    cand bool, indel_pos bool, n_sites) or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    n_samp = len(cnt2_list)
    if nthreads <= 0:
        nthreads = min(4, os.cpu_count() or 1)
    cnt2_list = [np.ascontiguousarray(x, np.int32) for x in cnt2_list]
    depth_list = [np.ascontiguousarray(x, np.int32) for x in depth_list]
    cptr = np.array([x.ctypes.data for x in cnt2_list], np.uintp)
    dptr = np.array([x.ctypes.data for x in depth_list], np.uintp)
    offs = np.ascontiguousarray(offs, np.int64)
    spans = np.ascontiguousarray(spans, np.int64)
    ins_pos = np.ascontiguousarray(ins_pos, np.int32)
    ins_tot = np.ascontiguousarray(ins_tot, np.int32)
    ins_off = np.ascontiguousarray(ins_off, np.int64)
    del_pos = np.ascontiguousarray(del_pos, np.int32)
    del_off = np.ascontiguousarray(del_off, np.int64)
    refarr = np.ascontiguousarray(refarr, np.int8)
    exists = np.empty((n_samp, L), np.uint8)
    depths = np.empty((n_samp, L), np.int32)
    expsum = np.empty((L, 13), np.int32)
    cand = np.empty(L, np.uint8)
    indel_pos_out = np.empty(L, np.uint8)
    vp = ctypes.c_void_p
    n_sites = lib.cv_prescreen(
        cptr.ctypes.data_as(vp), dptr.ctypes.data_as(vp),
        offs.ctypes.data_as(vp), spans.ctypes.data_as(vp),
        ins_pos.ctypes.data_as(vp), ins_tot.ctypes.data_as(vp),
        ins_off.ctypes.data_as(vp),
        del_pos.ctypes.data_as(vp), del_off.ctypes.data_as(vp),
        n_samp, n_exp, L, lo, refarr.ctypes.data_as(vp), len(refarr),
        min_coverage,
        exists.ctypes.data_as(vp), depths.ctypes.data_as(vp),
        expsum.ctypes.data_as(vp), cand.ctypes.data_as(vp),
        indel_pos_out.ctypes.data_as(vp), nthreads)
    return (exists.view(bool), depths, expsum, cand.view(bool),
            indel_pos_out.view(bool), int(n_sites))


def compress_blocks(data: bytes, *, bgzf: bool, level: int = 6,
                    nthreads: int | None = None) -> bytes | None:
    """Parallel block compression (pgzip/bgzf-writer class): BGZF members
    (bgzf=True) or multi-member gzip. None on fallback."""
    lib = _load()
    if lib is None:
        return None
    if nthreads is None:
        nthreads = os.cpu_count() or 2
    n = len(data)
    cap = n + n // 2 + 65536
    out = np.empty(cap, np.uint8)
    wrote = lib.compress_blocks(data, n, out.ctypes.data_as(ctypes.c_void_p),
                                cap, nthreads, level, 1 if bgzf else 0)
    if wrote < 0:
        return None
    return out[:int(wrote)].tobytes()


def fa_find_windows(ref, fq, sq, window: int, remove_n: bool,
                    name: str, nthreads: int = 0) -> str | None:
    """Full faFindFast short-format scan in one native call: event pass +
    threaded O(1)-edge-update window sweep + bed formatting. None on
    fallback (caller uses the vectorized numpy path)."""
    lib = _load()
    if lib is None:
        return None
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    ref = np.ascontiguousarray(ref, np.int8)
    fq = np.ascontiguousarray(fq, np.int8)
    sq = np.ascontiguousarray(sq, np.int8)
    n = len(fq)
    cap = max(1024, (2 * len(name.encode()) + 48) * max(1, n - window + 1))
    buf = np.empty(cap, np.uint8)  # no memset; C writes the used span
    vp = ctypes.c_void_p
    wrote = lib.fa_find_windows(
        ref.ctypes.data_as(vp), fq.ctypes.data_as(vp),
        sq.ctypes.data_as(vp), n, window, 1 if remove_n else 0,
        name.encode(), buf.ctypes.data_as(vp), cap, nthreads)
    if wrote < 0:
        return None
    return buf[:int(wrote)].tobytes()  # ASCII; callers decode only if
    # their sink is text-mode


def runs_to_counts(starts, lens, fwds, ridx, bases, want_refidx: int,
                   lo: int, span: int, nthreads: int = 0):
    """Scatter (start, len, fwd, refidx) pileup runs into a dense
    (span, 13, 2) int32 count tensor for one chromosome in one C pass
    (replaces the np.repeat/arange/add.at expansion). Also returns the
    strand-summed (span, 13) matrix and per-position depth, computed in
    the same pass for callVariants' prescreen. None on fallback."""
    lib = _load()
    if lib is None:
        return None
    if nthreads <= 0:
        nthreads = min(8, os.cpu_count() or 1)
    starts = np.ascontiguousarray(starts, np.int32)
    lens = np.ascontiguousarray(lens, np.int32)
    fwds = np.ascontiguousarray(fwds, np.uint8)
    ridx = np.ascontiguousarray(ridx, np.int32)
    bases = np.ascontiguousarray(bases, np.int8)
    cnt2 = np.zeros((span, 13), np.int32)
    depth = np.zeros(span, np.int32)
    vp = ctypes.c_void_p
    # int16 counts first (the random-write scatter is bandwidth-bound;
    # int16 rows measured ~40% faster); saturation of any cell (>32k of
    # one base+strand at one position) retries in int32
    counts16 = np.zeros((span, 13, 2), np.int16)
    rc = lib.runs_to_counts(
        starts.ctypes.data_as(vp), lens.ctypes.data_as(vp),
        fwds.ctypes.data_as(vp), ridx.ctypes.data_as(vp),
        bases.ctypes.data_as(vp), len(starts), want_refidx, lo, span,
        None, counts16.ctypes.data_as(vp), cnt2.ctypes.data_as(vp),
        depth.ctypes.data_as(vp), nthreads)
    if rc == 0:
        return counts16, cnt2, depth
    counts = np.zeros((span, 13, 2), np.int32)
    lib.runs_to_counts(
        starts.ctypes.data_as(vp), lens.ctypes.data_as(vp),
        fwds.ctypes.data_as(vp), ridx.ctypes.data_as(vp),
        bases.ctypes.data_as(vp), len(starts), want_refidx, lo, span,
        counts.ctypes.data_as(vp), None, cnt2.ctypes.data_as(vp),
        depth.ctypes.data_as(vp), nthreads)
    return counts, cnt2, depth


def sam_scatter(text: bytes, chrom_names: list[str], min_mapq: int):
    """Tokenize SAM text into pileup scatter runs + indel events in one
    C pass (the GoPileup per-read walk, sam/pileup.go:221-311). Returns
    (starts, lens, fwds, refidxs, bases, del_ev (n,4), ins_ev (n,5),
    ins_str bytes) or None on fallback."""
    lib = _load()
    if lib is None:
        return None
    nm = "\n".join(chrom_names).encode()
    n = len(text)
    run_cap = max(1024, n // 8)
    base_cap = max(4096, n)
    del_cap = ins_cap = max(1024, n // 64)
    starts = np.empty(run_cap, np.int32)
    lens = np.empty(run_cap, np.int32)
    fwds = np.empty(run_cap, np.uint8)
    ridx = np.empty(run_cap, np.int32)
    bases = np.empty(base_cap, np.int8)
    del_ev = np.empty(del_cap * 4, np.int32)
    ins_ev = np.empty(ins_cap * 5, np.int32)
    ins_str = np.empty(base_cap, np.uint8)
    counts = np.zeros(5, np.int64)
    vp = ctypes.c_void_p
    rc = lib.sam_scatter(
        text, n, nm, len(nm), min_mapq,
        starts.ctypes.data_as(vp), lens.ctypes.data_as(vp),
        fwds.ctypes.data_as(vp), ridx.ctypes.data_as(vp), run_cap,
        bases.ctypes.data_as(vp), base_cap,
        del_ev.ctypes.data_as(vp), del_cap,
        ins_ev.ctypes.data_as(vp), ins_cap,
        ins_str.ctypes.data_as(vp), base_cap,
        counts.ctypes.data_as(vp))
    if rc != 0:
        return None
    n_runs, n_bases, n_del, n_ins, ins_len = (int(x) for x in counts)
    return (starts[:n_runs], lens[:n_runs], fwds[:n_runs], ridx[:n_runs],
            bases[:n_bases], del_ev[:n_del * 4].reshape(-1, 4),
            ins_ev[:n_ins * 5].reshape(-1, 5),
            ins_str[:ins_len].tobytes())
