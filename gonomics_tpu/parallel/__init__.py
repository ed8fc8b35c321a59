"""Multi-chip/multi-host execution: meshes, sharded pipeline steps.

The reference scales by goroutine worker pools fed from channels
(cmd/gsw/pairedEndFastqs.go:24-35) and by SLURM job arrays across nodes;
it has no in-process distributed backend (SURVEY.md 2.5). Here scaling is
a jax.sharding Mesh:

  axes: ("data", "seq")
    data — read/pair batches, data-parallel (the worker-pool analog)
    seq  — genome-position sharding for count/pileup tensors (the
           position-synchronized merge analog, sam/pileup.go:52-118)

  collectives: psum of pileup count tensors over "data";
  alignment results stay data-sharded until the host-side canonical merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, data: int | None = None,
              seq: int | None = None) -> Mesh:
    """Build a ("data", "seq") mesh over the first n_devices devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if data is None:
        # favor data parallelism; seq axis gets the rest
        seq = seq or (2 if n_devices % 2 == 0 and n_devices > 1 else 1)
        data = n_devices // seq
    elif seq is None:
        seq = n_devices // data
    mesh_devs = np.asarray(devs[:data * seq]).reshape(data, seq)
    return Mesh(mesh_devs, ("data", "seq"))


def _pileup_counts_local(pos, base, valid, lo, span, n_base: int):
    """Scatter-add (positions x base codes) counts for one seq shard.
    pos/base/valid: (B, L) int32/int32/bool; counts positions in
    [lo, lo+span) only — the shard's slice of the genome axis."""
    rel = pos - lo
    in_shard = valid & (rel >= 0) & (rel < span)
    rel = jnp.where(in_shard, rel, 0)
    onehot_b = jax.nn.one_hot(base, n_base, dtype=jnp.int32)
    onehot_b = onehot_b * in_shard[..., None].astype(jnp.int32)
    counts = jnp.zeros((span, n_base), jnp.int32)
    return counts.at[rel.reshape(-1)].add(onehot_b.reshape(-1, n_base))


def pipeline_step(mesh: Mesh, *, n: int, m: int, genome_len: int,
                  scores, gap_open: int, gap_extend: int,
                  n_base: int = 13, interpret: bool | None = None):
    """The flagship sharded step: batched affine alignment (data-parallel
    Pallas wavefront) + genome-position pileup reduction (seq-sharded
    scatter-add with a psum over data). Returns a jitted fn of
    (alpha, beta, fin_d, pos, base_codes, valid) -> (scores, counts)."""
    from ..ops.wavefront import wavefront_align

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    seq_shards = mesh.shape["seq"]
    assert genome_len % seq_shards == 0
    span = genome_len // seq_shards

    from ..ops.wavefront import profile_fits16

    p16 = profile_fits16(scores)

    def local_step(alpha, beta, fin, pos, base, valid):
        res = wavefront_align(alpha, beta, fin, scores, n=n, m=m,
                              gap_open=gap_open, gap_extend=gap_extend,
                              with_trace=False, mode="affine",
                              interpret=interpret, prof16=p16)
        seq_idx = jax.lax.axis_index("seq")
        lo = seq_idx * span
        counts = _pileup_counts_local(pos, base, valid, lo, span, n_base)
        counts = jax.lax.psum(counts, "data")
        return res, counts

    sharded = jax.shard_map(
        local_step, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("data", None),
                  P("data", None), P("data", None), P("data", None)),
        out_specs=(P("data", None), P("seq", None)),
        check_vma=False,  # pallas_call out_shape carries no vma info
    )
    return jax.jit(sharded)


def init_distributed(coordinator_address: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> None:
    """Multi-host entry over DCN: jax.distributed.initialize.

    The reference scales across nodes only via SLURM job arrays over a
    shared filesystem (SURVEY.md 2.5 "Cluster scale-out"); here multi-host
    is first-class: each host runs the same program, JAX forms the global
    device mesh over ICI+DCN, and make_mesh() then sees every chip.
    All-None arguments defer to the TPU pod environment's auto-detection.
    Safe to call once per process, before any other JAX API."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def shard_local_align(mesh: Mesh, scores, *, n: int, m: int, gap: int,
                      interpret: bool):
    """Data-parallel batched local alignment + on-device traceback.

    shard_map of ops.wavefront.local_align_full over the "data" axis: each
    device runs the Pallas wavefront + trace walk on its B/n_data slice of
    the (read, window) batch; outputs stay in batch order, so downstream
    SAM emission is deterministic regardless of the mesh (the canonical
    (batch, read-id) merge order of SURVEY.md P3). Batch size must be a
    multiple of 8 * mesh.shape["data"]."""
    from ..ops.wavefront import local_align_full, profile_fits16

    sc = np.asarray(scores)
    p16 = profile_fits16(sc)

    def local(alpha, beta, nv, mv):
        return local_align_full(alpha, beta, nv, mv, sc, n=n, m=m,
                                gap=gap, interpret=interpret, prof16=p16)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None),) * 4,
        out_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                   P("data", None)),
        check_vma=False))


def shard_seed_lookup(mesh: Mesh, *, max_hits: int):
    """Prefix-sharded k-mer index lookup with an on-device candidate
    merge (SURVEY.md P3; reference index semantics genomeGraph/index.go:
    21-98). The sorted (code, pos) table is split into contiguous chunks
    at CODE boundaries (tpu_align.split_index_prefix), so each k-mer's
    hit run lives entirely in one shard and shard-local truncation to
    max_hits equals the replicated index's — outputs are byte-identical.

    Each device searchsorts its chunk for every read k-mer; hits merge
    across shards with a psum (exactly one shard contributes per k-mer),
    riding ICI instead of a host exchange.

    64-bit codes travel as (hi, lo) uint32 halves — JAX's default x64-off
    mode would silently truncate uint64 — and the lookup is an explicit
    vectorized binary search comparing the pair lexicographically.

    Returns f(chunk_hi, chunk_lo (n_sh, L) u32, chunk_pos (n_sh, L) i32,
    qhi, qlo (B, K) u32) -> (hitpos (B, K, H) i32, valid (B, K, H))."""
    H = max_hits

    def bsearch(chi, clo, qhi, qlo, right: bool):
        n = chi.shape[0]
        steps = max(1, int(np.ceil(np.log2(max(n, 2)))) + 1)
        lo_b = jnp.zeros(qhi.shape, jnp.int32)
        hi_b = jnp.full(qhi.shape, n, jnp.int32)

        def body(_, carry):
            lo_b, hi_b = carry
            done = lo_b >= hi_b
            mid = jnp.clip((lo_b + hi_b) // 2, 0, n - 1)
            mh = chi[mid]
            ml = clo[mid]
            if right:
                go = (mh < qhi) | ((mh == qhi) & (ml <= qlo))
            else:
                go = (mh < qhi) | ((mh == qhi) & (ml < qlo))
            lo_b = jnp.where(~done & go, mid + 1, lo_b)
            hi_b = jnp.where(~done & ~go, mid, hi_b)
            return lo_b, hi_b

        lo_b, _ = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
        return lo_b

    def local(chunk_hi, chunk_lo, chunk_pos, qhi, qlo):
        chi, clo, cp = chunk_hi[0], chunk_lo[0], chunk_pos[0]
        fh, fl = qhi.ravel(), qlo.ravel()
        lo = bsearch(chi, clo, fh, fl, right=False)
        hi = jnp.minimum(bsearch(chi, clo, fh, fl, right=True), lo + H)
        take = lo[:, None] + jnp.arange(H)[None, :]
        valid = take < hi[:, None]
        take = jnp.clip(take, 0, chi.shape[0] - 1)
        hitpos = jnp.where(valid, cp[take].astype(jnp.int32), 0)
        merged = jax.lax.psum(hitpos, "data")
        vmerged = jax.lax.psum(valid.astype(jnp.int32), "data") > 0
        hp = jnp.where(vmerged, merged, -1)
        shape = qhi.shape + (H,)
        return hp.reshape(shape), vmerged.reshape(shape)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None), P("data", None), P("data", None),
                  P(None, None), P(None, None)),
        out_specs=(P(None, None, None), P(None, None, None)),
        check_vma=False))


def shard_pileup_counts(mesh: Mesh, *, span: int, n_base: int = 13):
    """Sharded dense pileup scatter-add: the TPU form of the reference's
    position-synchronized pileup merge (sam/pileup.go:52-118).

    Returns a jitted fn of (rel_pos, code, valid) -> (span_pad, n_base*2)
    int32 counts, where rel_pos is position-lo, code = base*2 + strand,
    and valid masks padding. Scatter events are sharded over "data", the
    genome span over "seq"; each device scatter-adds its events into its
    span slice and a psum over "data" completes the merge."""
    seq_shards = mesh.shape["seq"]
    span_pad = -(-span // seq_shards) * seq_shards
    shard_span = span_pad // seq_shards
    n_code = n_base * 2

    def local(rel, code, valid):
        seq_idx = jax.lax.axis_index("seq")
        lo = seq_idx * shard_span
        r = rel - lo
        ok = valid & (r >= 0) & (r < shard_span)
        r = jnp.where(ok, r, 0)
        onehot = jax.nn.one_hot(code, n_code, dtype=jnp.int32)
        onehot = onehot * ok[:, None].astype(jnp.int32)
        counts = jnp.zeros((shard_span, n_code), jnp.int32)
        counts = counts.at[r].add(onehot)
        return jax.lax.psum(counts, "data")

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data"), P("data"), P("data")),
        out_specs=P("seq", None)))


def merge_shard_files(out_path: str, shard_paths: list[str],
                      header_lines: list[str] | None = None) -> None:
    """Canonical multi-host SAM/giraf merge: shard files hold the records
    of round-robin read blocks (host h owns batches h, h+H, h+2H, ...,
    one BATCH-marker line per batch); the merged output is in original
    read order — byte-identical to a single-host run."""
    from .. import fileio

    readers = [fileio.easy_open(p) for p in shard_paths]
    with fileio.easy_create(out_path) as out:
        if header_lines:
            for ln in header_lines:
                out.write(ln + "\n")
        done = [False] * len(readers)
        while not all(done):
            for i, r in enumerate(readers):
                if done[i]:
                    continue
                wrote_any = False
                for ln in r:
                    if ln.startswith("#BATCH"):
                        wrote_any = True
                        break
                    out.write(ln)
                if not wrote_any:
                    done[i] = True
    for r in readers:
        r.close()


def example_step_inputs(mesh: Mesh, *, B: int, n: int, m: int,
                        genome_len: int, seed: int = 0):
    """Tiny, correctly-sharded inputs for pipeline_step."""
    rng = np.random.default_rng(seed)
    alpha = rng.integers(0, 4, (B, n)).astype(np.int8)
    beta = rng.integers(0, 4, (B, m)).astype(np.int8)
    fin = np.full((B, 1), n + m, np.int32)
    pos = rng.integers(0, genome_len, (B, n)).astype(np.int32)
    base = rng.integers(0, 4, (B, n)).astype(np.int32)
    valid = np.ones((B, n), bool)
    data_sh = NamedSharding(mesh, P("data", None))
    return tuple(jax.device_put(x, data_sh)
                 for x in (alpha, beta, fin, pos, base, valid))


def shard_seq_affine_align(mesh: Mesh, scores, *, n: int, m: int,
                           gap_open: int, gap_extend: int,
                           checkersize: int = 2048,
                           interpret: bool = False):
    """Sequence-parallel affine alignment WITH full traceback — the
    multi-chip chromosome path (SURVEY.md §5 long-context design,
    VERDICT r3 item 6; reference scheme align/affineGap.go:20-54,
    219-273).

    Forward: the O(n*m) wavefront runs lane-sharded over the "seq" mesh
    axis (same one-(B,2)-halo-ppermute-per-diagonal recurrence as
    shard_seq_affine_score), snapshotting the two-diagonal state every
    `checkersize` diagonals. The snapshots are exactly the lowmem
    checkpoints, so the backward pass — per-block windowed re-fill +
    trace walk, O(n*K) total, ~K/(n+m) of the forward work — reuses the
    single-chip lowmem machinery unchanged and the stitched cigar is
    byte-exact against affine_gap_lowmem_batch.

    Returns run(alphas (B, n) int8, betas (B, m) int8) -> list of
    (score, ops, i0, j0) per pair (full-length pairs), the
    affine_gap_lowmem_batch contract."""
    from ..ops.wavefront import (NEG, _build_inputs, _lowmem_backward,
                                 _round_up)

    n_seq = mesh.shape["seq"]
    S = -(-(n + 1) // n_seq) * n_seq
    s_loc = S // n_seq
    sc_mat = jnp.asarray(np.asarray(scores), jnp.int32)
    go = jnp.int32(gap_open)
    ge = jnp.int32(gap_extend)
    d_total = n + m
    K = int(checkersize)
    fb = (d_total - 1) // K
    W = 2 * S + m + 8
    perm = [(i, (i + 1) % n_seq) for i in range(n_seq)]

    def block_fwd(al_loc, br_pad, d0v, state):
        """K diagonals [d0+1, d0+K] of the sharded wavefront."""
        B = al_loc.shape[0]
        seq_idx = jax.lax.axis_index("seq")
        base = seq_idx * s_loc
        s_idx = base + jax.lax.broadcasted_iota(jnp.int32, (B, s_loc), 1)
        codes = jnp.clip(al_loc.astype(jnp.int32), 0, 4)
        profiles = [sc_mat[a][codes] for a in range(5)]

        def shifted(x, halo):
            return jnp.concatenate([halo[:, None], x[:, :-1]], axis=1)

        def step(carry, d):
            m1, i1, d1, m2, i2, d2, rm, ri, rd = carry
            off = m - d + S + base
            be = jax.lax.dynamic_slice(br_pad, (0, off), (B, s_loc))
            be = be.astype(jnp.int32)
            sc = jnp.where(be == 0, profiles[0],
                 jnp.where(be == 1, profiles[1],
                 jnp.where(be == 2, profiles[2],
                 jnp.where(be == 3, profiles[3], profiles[4]))))
            h2 = jnp.maximum(jnp.maximum(m2, i2), d2)
            g1 = jnp.maximum(go + ge + jnp.maximum(m1, i1), ge + d1)
            pack = jnp.stack([h2[:, -1], g1[:, -1]], axis=-1)
            halo = jax.lax.ppermute(pack, "seq", perm)
            m_new = sc + shifted(h2, halo[:, 0])
            i_new = jnp.maximum(jnp.maximum(go + ge + m1, ge + i1),
                                go + ge + d1)
            d_new = shifted(g1, halo[:, 1])
            interior = (s_idx >= jnp.maximum(1, d - m)) & \
                       (s_idx <= jnp.minimum(d - 1, n))
            row0 = (s_idx == 0) & (d <= m)
            col0 = (s_idx == d) & (d <= n)
            bnd = go + ge * d
            m_new = jnp.where(interior, m_new, NEG)
            i_new = jnp.where(interior, i_new, jnp.where(row0, bnd, NEG))
            d_new = jnp.where(interior, d_new, jnp.where(col0, bnd, NEG))
            at_fin = d == d_total
            rm = jnp.where(at_fin, m_new, rm)
            ri = jnp.where(at_fin, i_new, ri)
            rd = jnp.where(at_fin, d_new, rd)
            return (m_new, i_new, d_new, m1, i1, d1, rm, ri, rd), None

        ds = d0v[0, 0] + jnp.arange(1, K + 1, dtype=jnp.int32)
        state, _ = jax.lax.scan(step, state, ds)
        return state

    sharded_block = jax.shard_map(
        block_fwd, mesh=mesh,
        in_specs=(P(None, "seq"), P(None, None), P(None, None),
                  tuple([P(None, "seq")] * 9)),
        out_specs=tuple([P(None, "seq")] * 9),
        check_vma=False)

    @jax.jit
    def fwd_all(alpha_pad, beta_pad):
        B = alpha_pad.shape[0]
        al = jnp.full((B, S), 4, jnp.int8)
        al = jax.lax.dynamic_update_slice(al, alpha_pad, (0, 1))
        br = jnp.full((B, W), 4, jnp.int8)
        br = jax.lax.dynamic_update_slice(br, beta_pad[:, ::-1], (0, S))
        s_iota = jnp.arange(S)[None, :]
        m0 = jnp.where(s_iota == 0, 0, NEG).astype(jnp.int32)
        m0 = jnp.broadcast_to(m0, (B, S))
        i0 = jnp.where(s_iota == 0, go, NEG).astype(jnp.int32)
        i0 = jnp.broadcast_to(i0, (B, S))
        neg = jnp.full((B, S), NEG, jnp.int32)
        state = (m0, i0, i0, neg, neg, neg, neg, neg, neg)
        cks = []
        for blk in range(fb + 1):
            cks.append(jnp.stack([jnp.stack([state[0], state[3]]),
                                  jnp.stack([state[1], state[4]]),
                                  jnp.stack([state[2], state[5]])]))
            d0v = jnp.full((1, 1), blk * K, jnp.int32)
            state = sharded_block(al, br, d0v, state)
        # cks[blk]: (3, 2, B, S) with slot 0 = diag blk*K, 1 = blk*K - 1
        return jnp.stack(cks), state[6], state[7], state[8]

    S8 = _round_up(n + 1, 1024)
    Wb = min(S8, _round_up(2 * K + 640, 128))
    Wsl = K + Wb + 256

    def run(alphas, betas):
        import numpy as onp

        alphas = jnp.asarray(alphas, jnp.int8)
        betas = jnp.asarray(betas, jnp.int8)
        B = alphas.shape[0]
        cks, resm, resi, resd = fwd_all(alphas, betas)
        fm = onp.asarray(resm[:, n])
        fi = onp.asarray(resi[:, n])
        fd = onp.asarray(resd[:, n])
        k0 = onp.where((fm >= fi) & (fm >= fd), 0,
                       onp.where(fi >= fd, 1, 2)).astype(onp.int32)
        score = onp.choose(k0, [fm, fi, fd])

        # repackage checkpoints into the lowmem backward's chunked
        # layout: pad lanes S -> S8, reverse block order
        cks = onp.asarray(cks)  # (NB, 3, 2, B, S)
        pad = onp.full((cks.shape[0], 3, 2, B, S8 - S), NEG, onp.int32)
        cks = onp.concatenate([cks, pad], axis=-1)
        cks = cks[::-1].reshape(fb + 1, 3, 2, B, 8, S8 // 8)
        profiles, br_full = _build_inputs(alphas, betas, scores, S8, m)
        brp = jnp.pad(br_full, ((0, 0), (K, 0)), constant_values=4)
        d0s = jnp.arange(fb, -1, -1, dtype=jnp.int32) * K
        iv, jv, kv, ops = _lowmem_backward(
            jnp.full(B, n, jnp.int32), jnp.full(B, m, jnp.int32),
            jnp.asarray(k0, jnp.int32), d0s,
            jnp.asarray(cks[:, 0]), jnp.asarray(cks[:, 1]),
            jnp.asarray(cks[:, 2]), tuple(profiles), brp,
            K=K, W=Wb, Wsl=Wsl, S8=S8, n=n, m=m, gap_open=gap_open,
            gap_extend=gap_extend, interpret=interpret)
        i_cur = onp.asarray(iv)
        j_cur = onp.asarray(jv)
        ops_all = onp.asarray(ops).reshape(-1, B)
        out = []
        for b in range(B):
            ob = ops_all[:, b]
            out.append((int(score[b]), ob[ob != 4], int(i_cur[b]),
                        int(j_cur[b])))
        return out

    return run


def shard_seq_affine_score(mesh: Mesh, scores, *, n: int, m: int,
                           gap_open: int, gap_extend: int):
    """Sequence-parallel affine-gap scoring: the anti-diagonal wavefront
    with its LANE axis (s = query position) sharded over the "seq" mesh
    axis — SURVEY.md §5's long-context design ("anti-diagonal wavefront
    over length-sharded sequences, cross-shard boundary exchange over
    ICI, halo = one anti-diagonal").

    Each device owns a contiguous band of wavefront lanes. Per diagonal
    the only cross-device dependency is the s-1 lane shift of the two
    gap/match source rows, so ONE ppermute of a (B, 2) halo rides ICI
    per step; everything else is device-local VPU work. Pure-XLA
    (lax.scan) formulation — the Pallas kernel stays single-chip; this
    path is for alignments whose wavefront state exceeds one chip.
    Recurrences/boundaries follow the reference (affineGap.go:158-207).

    Returns a jitted fn(alpha_pad (B, n) int8, beta_pad (B, m) int8,
    fin_d (B, 1) int32, n_vec (B, 1) int32) -> (B,) int32: the global
    alignment score H[n_b][m_b], captured at lane n_b of diagonal fin_d
    (= n_b + m_b), exactly like the single-chip score path
    (align/pairwise.py affine_gap_batch).
    """
    from ..ops.wavefront import NEG

    n_seq = mesh.shape["seq"]
    S = -(-(n + 1) // n_seq) * n_seq
    s_loc = S // n_seq
    sc_mat = jnp.asarray(np.asarray(scores), jnp.int32)
    go = jnp.int32(gap_open)
    ge = jnp.int32(gap_extend)
    d_total = n + m
    W = 2 * S + m + 8
    perm = [(i, (i + 1) % n_seq) for i in range(n_seq)]

    def local(al_loc, br_pad, fin, nvec):
        B = al_loc.shape[0]
        seq_idx = jax.lax.axis_index("seq")
        base = seq_idx * s_loc
        s_idx = base + jax.lax.broadcasted_iota(jnp.int32, (B, s_loc), 1)
        codes = jnp.clip(al_loc.astype(jnp.int32), 0, 4)
        profiles = [sc_mat[a][codes] for a in range(5)]
        neg = jnp.full((B, s_loc), NEG, jnp.int32)

        at0 = s_idx == 0
        m0 = jnp.where(at0, 0, NEG)
        i0 = jnp.where(at0, go, NEG)
        d0 = jnp.where(at0, go, NEG)

        def shifted(x, halo):
            return jnp.concatenate([halo[:, None], x[:, :-1]], axis=1)

        def step(carry, d):
            m1, i1, d1, m2, i2, d2, res = carry
            off = m - d + S + base
            be = jax.lax.dynamic_slice(br_pad, (0, off), (B, s_loc))
            be = be.astype(jnp.int32)
            sc = jnp.where(be == 0, profiles[0],
                 jnp.where(be == 1, profiles[1],
                 jnp.where(be == 2, profiles[2],
                 jnp.where(be == 3, profiles[3], profiles[4]))))
            h2 = jnp.maximum(jnp.maximum(m2, i2), d2)
            g1 = jnp.maximum(go + ge + jnp.maximum(m1, i1), ge + d1)
            # one (B, 2) halo per diagonal: my last lane -> right neighbor
            pack = jnp.stack([h2[:, -1], g1[:, -1]], axis=-1)
            halo = jax.lax.ppermute(pack, "seq", perm)
            # device 0's wrapped halo only reaches global lane 0, which
            # the row0/interior masks overwrite
            m_new = sc + shifted(h2, halo[:, 0])
            i_new = jnp.maximum(jnp.maximum(go + ge + m1, ge + i1),
                                go + ge + d1)
            d_new = shifted(g1, halo[:, 1])
            interior = (s_idx >= jnp.maximum(1, d - m)) & \
                       (s_idx <= jnp.minimum(d - 1, n))
            row0 = (s_idx == 0) & (d <= m)
            col0 = (s_idx == d) & (d <= n)
            bnd = go + ge * d
            m_new = jnp.where(interior, m_new, NEG)
            i_new = jnp.where(interior, i_new, jnp.where(row0, bnd, NEG))
            d_new = jnp.where(interior, d_new, jnp.where(col0, bnd, NEG))
            fin_here = (fin == d) & (s_idx == nvec)
            res = jnp.where(
                fin_here,
                jnp.maximum(jnp.maximum(m_new, i_new), d_new), res)
            return (m_new, i_new, d_new, m1, i1, d1, res), None

        carry = (m0, i0, d0, neg, neg, neg, neg)
        carry, _ = jax.lax.scan(step, carry,
                                jnp.arange(1, d_total + 1, dtype=jnp.int32))
        best = jnp.max(carry[6], axis=1)
        return jax.lax.pmax(best, "seq")

    sharded = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(None, "seq"), P(None, None), P(None, None),
                  P(None, None)),
        out_specs=P(None),
        check_vma=False)

    @jax.jit
    def run(alpha_pad, beta_pad, fin_d, n_vec):
        B = alpha_pad.shape[0]
        al = jnp.full((B, S), 4, jnp.int8)
        al = jax.lax.dynamic_update_slice(al, alpha_pad, (0, 1))
        br = jnp.full((B, W), 4, jnp.int8)
        br = jax.lax.dynamic_update_slice(br, beta_pad[:, ::-1], (0, S))
        return sharded(al, br, fin_d, n_vec)

    return run
