"""Anti-diagonal wavefront Pallas kernels for pairwise global alignment.

TPU-native re-design of the reference DP aligners
(/root/reference/align/constGap.go:141-183, affineGap.go:151-207):

  - The DP grid (i, j) is processed one anti-diagonal d = i + j at a time.
    In (d, s=i) coordinates the Gotoh recurrences have NO intra-diagonal
    dependency: I reads (d-1, s), D reads (d-1, s-1), M reads (d-2, s-1).
    Each diagonal is therefore a single VPU vector step.
  - Layout: batch pairs along sublanes, diagonal position s along lanes:
    every buffer is (B, S) int32 with S a lane multiple.
  - The pallas grid iterates d; diagonal state lives in VMEM scratch as
    two-slot (parity) buffers, so the only HBM traffic is the input
    profiles (once) and, in traceback mode, one int8 (B, S) block per
    diagonal which pallas double-buffers out asynchronously. This is the
    TPU rebirth of the reference's "checkerboard" low-memory scheme: the
    scores stay on-chip; only 6-bit trace state is ever written out.
  - Substitution scores: instead of a gather, five precomputed profile
    rows Q_a[b, s] = scores[a, alpha[b, s-1]] stay static in VMEM; the
    reversed beta codes slide one lane per diagonal (one aligned int8
    window load + a dynamic lane rotate) and select among them.

Tie-breaking matches the reference tripleMaxTrace (align.go:78):
prefer M(0), then I(1), then D(2). Scores are int32 (the reference uses
int64; all practical alignments fit comfortably).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -(2 ** 30)  # veryNegNum analog; int32-safe against further adds

# Mosaic's default scoped-vmem cap is 16MB; the large-batch trace-mode
# configurations (q rows + 2-slot state + result rows + the double-
# buffered trace block) cross it, and v5e has far more physical VMEM.
# One raised cap shared by every wavefront kernel.
_VMEM_LIMIT = 64 * 1024 * 1024

# TPU kernel compiles are expensive through the remote-compile tunnel on
# this machine (30s+); persist them across processes.
try:
    jax.config.update("jax_compilation_cache_dir",
                      "/root/.cache/jax_gonomics")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # older jax or read-only fs: cache is best-effort
    pass


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _shift(x):
    """x[s] -> x[s-1] along lanes; column 0 is junk (masked later)."""
    return jnp.concatenate([x[:, :1], x[:, :-1]], axis=1)


def _max3(a, b, c):
    return jnp.maximum(jnp.maximum(a, b), c)


def _argmax3(a, b, c):
    """Priority argmax matching tripleMaxTrace: M >= I >= D."""
    return jnp.where((a >= b) & (a >= c), 0, jnp.where(b >= c, 1, 2)).astype(jnp.int32)


def _beta_codes(br_ref, d, m_pad: int, s_size: int, S: int):
    """Sliding int8 window: out[b, s] = beta_rev_pad[b, off + s] with
    off = m_pad - d + s_size, via aligned load + dynamic lane rotate."""
    off = m_pad - d + s_size
    off_al = pl.multiple_of((off // 128) * 128, 128)
    r = off - off_al
    win = br_ref[:, pl.ds(off_al, S + 128)].astype(jnp.int32)
    win = pltpu.roll(win, jax.lax.rem(S + 128 - r, S + 128), axis=1)
    return win[:, :S]


def _select_score(be, q0, q1, q2, q3, q4):
    # balanced select tree: depth 2/3 instead of a 4-deep chain, so the
    # VPU can evaluate the two halves in parallel; profiles may be int16
    # (profile_fits16), so widen after selecting
    lo = jnp.where(be == 0, q0[...], q1[...])
    hi = jnp.where(be == 2, q2[...], jnp.where(be == 3, q3[...], q4[...]))
    return jnp.where(be < 2, lo, hi).astype(jnp.int32)


def _affine_kernel(fin_ref, br_ref, q0, q1, q2, q3, q4, *rest,
                   n_pad: int, m_pad: int, go: int, ge: int, s_size: int,
                   with_trace: bool):
    if with_trace:
        resm_ref, resi_ref, resd_ref, trace_ref, mbuf, ibuf, dbuf = rest
    else:
        (res_ref, mbuf, ibuf, dbuf) = rest

    d = pl.program_id(0) + 1
    B, S = q0.shape
    go_ = jnp.int32(go)
    ge_ = jnp.int32(ge)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S), dimension=1)

    @pl.when(d == 1)
    def _init():
        # diagonal 0: cell (0,0) has M=0, I=D=gapOpen (affineGap.go:159-165)
        at0 = s_idx == 0
        mbuf[0] = jnp.where(at0, 0, NEG)
        ibuf[0] = jnp.where(at0, go_, NEG)
        dbuf[0] = jnp.where(at0, go_, NEG)
        # slot 1 stands in for diagonal -1: nothing reachable
        mbuf[1] = jnp.full((B, S), NEG, jnp.int32)
        ibuf[1] = jnp.full((B, S), NEG, jnp.int32)
        dbuf[1] = jnp.full((B, S), NEG, jnp.int32)
        if with_trace:
            resm_ref[...] = jnp.full((B, S), NEG, jnp.int32)
            resi_ref[...] = jnp.full((B, S), NEG, jnp.int32)
            resd_ref[...] = jnp.full((B, S), NEG, jnp.int32)
        else:
            res_ref[...] = jnp.full((B, S), NEG, jnp.int32)

    cur = jax.lax.rem(d, 2)
    prv = 1 - cur

    m1, i1, d1 = mbuf[prv], ibuf[prv], dbuf[prv]   # diagonal d-1
    m2, i2, d2 = mbuf[cur], ibuf[cur], dbuf[cur]   # diagonal d-2 (to be overwritten)

    # substitution score for cell (i=s, j=d-s)
    be = _beta_codes(br_ref, d, m_pad, s_size, S)
    sc = _select_score(be, q0, q1, q2, q3, q4)

    if with_trace:
        # shifts applied AFTER the max/argmax (a lane shift commutes
        # with elementwise max and +const): 4 shifts instead of 6, and
        # the D-state compares share go+ge+m1 with the I state
        m_new = sc + _shift(_max3(m2, i2, d2))
        t_m = _shift(_argmax3(m2, i2, d2))
        a_i, b_i, c_i = go_ + ge_ + m1, ge_ + i1, go_ + ge_ + d1
        i_new = _max3(a_i, b_i, c_i)
        t_i = _argmax3(a_i, b_i, c_i)
        b_d, c_d = go_ + ge_ + i1, ge_ + d1
        d_new = _shift(_max3(a_i, b_d, c_d))
        t_d = _shift(_argmax3(a_i, b_d, c_d))
    else:
        m_new = sc + _shift(_max3(m2, i2, d2))
        i_new = _max3(go_ + ge_ + m1, ge_ + i1, go_ + ge_ + d1)
        d_new = _shift(jnp.maximum(go_ + ge_ + jnp.maximum(m1, i1),
                                   ge_ + d1))

    # boundary + validity masks (uniform padded n/m: padded cells never
    # feed real ones, see module docstring)
    interior = (s_idx >= jnp.maximum(1, d - m_pad)) & \
               (s_idx <= jnp.minimum(d - 1, n_pad))
    row0 = (s_idx == 0) & (d <= m_pad)        # cell (0, d)
    col0 = (s_idx == d) & (d <= n_pad)        # cell (d, 0)
    bnd = go_ + ge_ * d
    m_new = jnp.where(interior, m_new, NEG)
    i_new = jnp.where(interior, i_new, jnp.where(row0, bnd, NEG))
    d_new = jnp.where(interior, d_new, jnp.where(col0, bnd, NEG))

    mbuf[cur] = m_new
    ibuf[cur] = i_new
    dbuf[cur] = d_new

    fin = fin_ref[...] == d  # (B, 1) broadcasts over lanes
    if with_trace:
        trace_ref[0] = (t_m + t_i * 4 + t_d * 16).astype(jnp.int8)
        resm_ref[...] = jnp.where(fin, m_new, resm_ref[...])
        resi_ref[...] = jnp.where(fin, i_new, resi_ref[...])
        resd_ref[...] = jnp.where(fin, d_new, resd_ref[...])
    else:
        res_ref[...] = jnp.where(fin, _max3(m_new, i_new, d_new), res_ref[...])


def _local_kernel(nvec_ref, mvec_ref, br_ref, q0, q1, q2, q3, q4, *rest,
                  n_pad: int, m_pad: int, gap: int, s_size: int,
                  with_trace: bool, with_corner: bool = False):
    """Smith-Waterman local alignment (clamped const-gap), the TPU engine
    of the batched read aligner. Tracks the best cell per (pair, s) with
    its diagonal so the host can recover the global max + traceback.
    Trace codes: 0=M, 1=left(ref gap->D), 2=up(read gap->I), 3=local stop.

    with_corner additionally captures the value of cell (nb, mb) per pair
    (the anchored-corner score genomeGraph LeftDynamicAln needs,
    search.go:234-276)."""
    if with_trace and with_corner:
        bv_ref, bd_ref, trace_ref, corner_ref, cbuf = rest
    elif with_trace:
        bv_ref, bd_ref, trace_ref, cbuf = rest
    else:
        bv_ref, bd_ref, cbuf = rest

    d = pl.program_id(0) + 1
    B, S = q0.shape
    gap_ = jnp.int32(gap)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S), dimension=1)

    @pl.when(d == 1)
    def _init():
        cbuf[0] = jnp.zeros((B, S), jnp.int32)
        cbuf[1] = jnp.zeros((B, S), jnp.int32)
        bv_ref[...] = jnp.zeros((B, S), jnp.int32)
        bd_ref[...] = jnp.zeros((B, S), jnp.int32)
        if with_corner:
            corner_ref[...] = jnp.zeros((B, S), jnp.int32)

    cur = jax.lax.rem(d, 2)
    prv = 1 - cur
    c1 = cbuf[prv]
    c2 = cbuf[cur]

    be = _beta_codes(br_ref, d, m_pad, s_size, S)
    sc = _select_score(be, q0, q1, q2, q3, q4)

    diag = _shift(c2) + sc
    left = c1 + gap_
    up = _shift(c1) + gap_
    c_new = _max3(diag, left, up)

    nb = nvec_ref[...]  # (B, 1) real read lengths
    mb = mvec_ref[...]  # (B, 1) real window lengths
    inside = (s_idx >= 1) & (s_idx <= nb) & \
             (d - s_idx >= 1) & (d - s_idx <= mb)
    c_new = jnp.where(inside & (c_new > 0), c_new, 0)
    cbuf[cur] = c_new

    if with_trace:
        t = jnp.where(c_new == 0, 3, _argmax3(diag, left, up))
        trace_ref[0] = t.astype(jnp.int8)

    upd = inside & (c_new > bv_ref[...])
    bd_ref[...] = jnp.where(upd, d, bd_ref[...])
    bv_ref[...] = jnp.where(upd, c_new, bv_ref[...])

    if with_corner:
        corner_ref[...] = jnp.where(nb + mb == d, c_new, corner_ref[...])


def _const_kernel(fin_ref, br_ref, q0, q1, q2, q3, q4, *rest,
                  n_pad: int, m_pad: int, gap: int, s_size: int,
                  with_trace: bool):
    if with_trace:
        res_ref, trace_ref, cbuf = rest
    else:
        (res_ref, cbuf) = rest

    d = pl.program_id(0) + 1
    B, S = q0.shape
    gap_ = jnp.int32(gap)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S), dimension=1)

    @pl.when(d == 1)
    def _init():
        cbuf[0] = jnp.where(s_idx == 0, 0, NEG)
        cbuf[1] = jnp.full((B, S), NEG, jnp.int32)
        res_ref[...] = jnp.full((B, S), NEG, jnp.int32)

    cur = jax.lax.rem(d, 2)
    prv = 1 - cur

    c1 = cbuf[prv]
    c2 = cbuf[cur]

    be = _beta_codes(br_ref, d, m_pad, s_size, S)
    sc = _select_score(be, q0, q1, q2, q3, q4)

    diag = _shift(c2) + sc        # from (i-1, j-1) -> ColM
    left = c1 + gap_              # from (i, j-1)   -> ColI
    up = _shift(c1) + gap_        # from (i-1, j)   -> ColD
    c_new = _max3(diag, left, up)

    interior = (s_idx >= jnp.maximum(1, d - m_pad)) & \
               (s_idx <= jnp.minimum(d - 1, n_pad))
    edge = ((s_idx == 0) & (d <= m_pad)) | ((s_idx == d) & (d <= n_pad))
    c_new = jnp.where(interior, c_new, jnp.where(edge, gap_ * d, NEG))
    cbuf[cur] = c_new

    if with_trace:
        trace_ref[0] = _argmax3(diag, left, up)

    fin = fin_ref[...] == d
    res_ref[...] = jnp.where(fin, c_new, res_ref[...])


def _gsw_right_kernel(nvec_ref, mvec_ref, br_ref, q0, q1, q2, q3, q4,
                      bv_ref, bd_ref, trace_ref, cbuf, *,
                      n_pad: int, m_pad: int, gap: int, s_size: int):
    """Prefix-anchored const-gap DP with penalized boundaries — the device
    counterpart of genomeGraph RightDynamicAln (search.go:278): m[0][j] =
    j*gap, m[i][0] = i*gap, no clamping; tracks the best cell with strict
    > so the host recovers the reference's row-major first-max tie-break
    (per-lane strict > keeps the smallest diagonal = smallest j; argmax
    over lanes keeps the smallest i). Boundary trace codes are 1 ('I')
    on row 0 and 2 ('D') on column 0 so the traceback walks edges to the
    origin exactly like the reference."""
    d = pl.program_id(0) + 1
    B, S = q0.shape
    gap_ = jnp.int32(gap)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S), dimension=1)

    @pl.when(d == 1)
    def _init():
        cbuf[0] = jnp.where(s_idx == 0, 0, NEG)
        cbuf[1] = jnp.full((B, S), NEG, jnp.int32)
        bv_ref[...] = jnp.zeros((B, S), jnp.int32)
        bd_ref[...] = jnp.zeros((B, S), jnp.int32)

    cur = jax.lax.rem(d, 2)
    prv = 1 - cur
    c1 = cbuf[prv]
    c2 = cbuf[cur]

    be = _beta_codes(br_ref, d, m_pad, s_size, S)
    sc = _select_score(be, q0, q1, q2, q3, q4)

    diag = _shift(c2) + sc
    left = c1 + gap_
    up = _shift(c1) + gap_
    c_new = _max3(diag, left, up)

    interior = (s_idx >= jnp.maximum(1, d - m_pad)) & \
               (s_idx <= jnp.minimum(d - 1, n_pad))
    row0 = (s_idx == 0) & (d <= m_pad)
    col0 = (s_idx == d) & (d <= n_pad)
    c_new = jnp.where(interior, c_new,
                      jnp.where(row0 | col0, gap_ * d, NEG))
    cbuf[cur] = c_new

    t = _argmax3(diag, left, up)
    t = jnp.where(row0, 1, jnp.where(col0, 2, t))
    trace_ref[0] = t.astype(jnp.int8)

    nb = nvec_ref[...]
    mb = mvec_ref[...]
    inside = (s_idx >= 1) & (s_idx <= nb) & \
             (d - s_idx >= 1) & (d - s_idx <= mb)
    upd = inside & (c_new > bv_ref[...])
    bd_ref[...] = jnp.where(upd, d, bd_ref[...])
    bv_ref[...] = jnp.where(upd, c_new, bv_ref[...])


@functools.partial(jax.jit, static_argnames=("n", "m", "gap", "interpret",
                                             "prof16"))
def wavefront_gsw_right(alpha_pad, beta_pad, n_vec, m_vec, scores, *,
                        n: int, m: int, gap: int, interpret: bool = False,
                        prof16: bool = False):
    """Batched RightDynamicAln DP. Returns (best_val, best_d, trace):
    best_val/best_d (B, S) over real cells only, trace (n+m, B, S)."""
    B = alpha_pad.shape[0]
    S = _round_up(n + 1, 128)
    profiles, br = _build_inputs(alpha_pad, beta_pad, scores, S, m,
                                 prof16=prof16)
    d_total = n + m

    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    res_shape = jax.ShapeDtypeStruct((B, S), jnp.int32)
    trace_shape = jax.ShapeDtypeStruct((d_total, B, S), jnp.int8)
    trace_spec = pl.BlockSpec((1, B, S), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(_gsw_right_kernel, n_pad=n, m_pad=m, gap=gap,
                             s_size=S)
    return pl.pallas_call(
        kern,
        grid=(d_total,),
        in_specs=[vspec()] * 8,
        out_specs=(vspec(), vspec(), trace_spec),
        out_shape=(res_shape, res_shape, trace_shape),
        scratch_shapes=[pltpu.VMEM((2, B, S), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(n_vec, m_vec, br, *profiles)


def profile_fits16(scores) -> bool:
    """True when the score matrix fits int16 profiles (half the VMEM of
    the kernels' biggest input; ~5-15% measured). False for tracers, so
    nested-jit callers safely fall back to int32."""
    try:
        return bool(np.abs(np.asarray(scores)).max() < 32000)
    except Exception:  # noqa: BLE001 — tracer or odd input
        return False


def _build_inputs(alpha_pad, beta_pad, scores, s_size: int, m_pad: int,
                  prof16: bool = False):
    """Alpha profiles Q_a[b, s] = scores[a, alpha[b, s-1]] (static in the
    kernel) and the reversed-beta code array br_pad, padded with S lanes on
    the left so the per-diagonal window offset m_pad - d + S stays >= 0 and
    with S+256 on the right for the aligned over-read."""
    B = alpha_pad.shape[0]
    sc = jnp.asarray(scores, jnp.int16 if prof16 else jnp.int32)
    al = jnp.full((B, s_size), 4, jnp.int8)
    al = jax.lax.dynamic_update_slice(al, alpha_pad, (0, 1))
    idx = jnp.clip(al.astype(jnp.int32), 0, 4)
    profiles = [sc[a][idx] for a in range(5)]

    width = _round_up(2 * s_size + m_pad + 256, 128)
    br = beta_pad[:, ::-1]
    full = jnp.full((B, width), 4, jnp.int8)
    full = jax.lax.dynamic_update_slice(full, br, (0, s_size))
    return profiles, full


@functools.partial(jax.jit, static_argnames=(
    "n", "m", "gap", "with_trace", "with_corner", "interpret", "prof16"))
def wavefront_local(alpha_pad, beta_pad, n_vec, m_vec, scores, *, n: int,
                    m: int, gap: int, with_trace: bool = True,
                    with_corner: bool = False, interpret: bool = False,
                    prof16: bool = False):
    """Batched Smith-Waterman over (read, window) pairs.

    alpha_pad: (B, n) int8 read codes, beta_pad: (B, m) int8 window codes,
    n_vec/m_vec: (B, 1) int32 real lengths. Returns (best_val, best_d)
    each (B, S) [+ trace (n+m, B, S) int8 when with_trace] [+ corner
    (B, S) when with_corner: the value of cell (nb, mb), at lane nb].
    """
    B = alpha_pad.shape[0]
    S = _round_up(n + 1, 128)
    profiles, br = _build_inputs(alpha_pad, beta_pad, scores, S, m,
                                 prof16=prof16)
    d_total = n + m

    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    res_shape = jax.ShapeDtypeStruct((B, S), jnp.int32)
    trace_shape = jax.ShapeDtypeStruct((d_total, B, S), jnp.int8)
    trace_spec = pl.BlockSpec((1, B, S), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)
    kern = functools.partial(_local_kernel, n_pad=n, m_pad=m, gap=gap,
                             s_size=S, with_trace=with_trace,
                             with_corner=with_corner)
    if with_trace and with_corner:
        out_shape = (res_shape, res_shape, trace_shape, res_shape)
        out_specs = (vspec(), vspec(), trace_spec, vspec())
    elif with_trace:
        out_shape = (res_shape, res_shape, trace_shape)
        out_specs = (vspec(), vspec(), trace_spec)
    else:
        out_shape = (res_shape, res_shape)
        out_specs = (vspec(), vspec())
    return pl.pallas_call(
        kern,
        grid=(d_total,),
        in_specs=[vspec()] * 8,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, B, S), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(n_vec, m_vec, br, *profiles)


def _affine_block_kernel(fin_ref, br_ref, bound0_ref, bm_ref, bi_ref,
                         bd_ref, q0, q1, q2, q3, q4, res_ref,
                         om_ref, oi_ref, od_ref,
                         mbuf, ibuf, dbuf, cm, ci, cd, *, r_rows: int,
                         m_pad: int, go: int, ge: int, s_size: int,
                         k_off: int):
    """One row-block of the blocked affine score wavefront.

    Lanes s = 0..r_rows map to global rows k_off + s. Lane 0 carries the
    boundary row from the previous block: per step, column d of the
    (B, Mp) boundary tensors is pulled to lane 0 with the same aligned-
    load + lane-rotate pattern as the beta window (the only dynamic-lane
    access pattern measured fast on this hardware). Lane r_rows — the
    next block's boundary — is inserted into a 128-lane capture ring and
    flushed to the (B, Mp) outputs every 128 steps at affine offsets.
    Lane counts stay in the S <= 640 regime, where the wavefront runs
    ~3.5x faster per lane than a single S = 1152 sweep (the measured
    per-step knee; PERF_NOTES round 4)."""
    d = pl.program_id(0) + 1
    B, S = q0.shape
    go_ = jnp.int32(go)
    ge_ = jnp.int32(ge)
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S), dimension=1)

    @pl.when(d == 1)
    def _init():
        at0 = s_idx == 0
        mbuf[0] = jnp.where(at0, bound0_ref[0][:, None], NEG)
        ibuf[0] = jnp.where(at0, bound0_ref[1][:, None], NEG)
        dbuf[0] = jnp.where(at0, bound0_ref[2][:, None], NEG)
        mbuf[1] = jnp.full((B, S), NEG, jnp.int32)
        ibuf[1] = jnp.full((B, S), NEG, jnp.int32)
        dbuf[1] = jnp.full((B, S), NEG, jnp.int32)
        res_ref[...] = jnp.full((B, S), NEG, jnp.int32)

    cur = jax.lax.rem(d, 2)
    prv = 1 - cur
    m1, i1, d1 = mbuf[prv], ibuf[prv], dbuf[prv]
    m2, i2, d2 = mbuf[cur], ibuf[cur], dbuf[cur]

    be = _beta_codes(br_ref, d, m_pad, s_size, S)
    sc = _select_score(be, q0, q1, q2, q3, q4).astype(jnp.int32)

    m_new = sc + _shift(_max3(m2, i2, d2))
    i_new = _max3(go_ + ge_ + m1, ge_ + i1, go_ + ge_ + d1)
    d_new = _shift(jnp.maximum(go_ + ge_ + jnp.maximum(m1, i1), ge_ + d1))

    interior = (s_idx >= jnp.maximum(1, d - m_pad)) & \
               (s_idx <= jnp.minimum(d - 1, r_rows))
    col0 = (s_idx == d) & (d <= r_rows)  # cell (k_off + d, 0)
    bnd_col = go_ + ge_ * (k_off + s_idx)
    m_new = jnp.where(interior, m_new, NEG)
    i_new = jnp.where(interior, i_new, NEG)
    d_new = jnp.where(interior, d_new, jnp.where(col0, bnd_col, NEG))

    # lane 0 := boundary row at column j = d: aligned 256-lane window
    # load + rotate pulls tensor index d-1 to lane 0 (cols > m are NEG)
    off = jnp.minimum(d, m_pad) - 1
    off_al = pl.multiple_of((off // 128) * 128, 128)
    r = off - off_al
    rot = jax.lax.rem(256 - r, 256)
    past = d > m_pad
    at0 = s_idx == 0

    def pull(ref):
        win = pltpu.roll(ref[:, pl.ds(off_al, 256)], rot, axis=1)
        return win[:, :1]

    m_new = jnp.where(at0, jnp.where(past, NEG, pull(bm_ref)), m_new)
    i_new = jnp.where(at0, jnp.where(past, NEG, pull(bi_ref)), i_new)
    d_new = jnp.where(at0, jnp.where(past, NEG, pull(bd_ref)), d_new)

    mbuf[cur] = m_new
    ibuf[cur] = i_new
    dbuf[cur] = d_new

    # capture lane r_rows (cell ((k+1)R, j = d - r_rows)) into the ring
    lane_r = jax.lax.slice_in_dim
    widx = jnp.maximum(d - r_rows - 1, 0)
    wsel = jax.lax.rem(widx, 128)
    l128 = jax.lax.broadcasted_iota(jnp.int32, (B, 128), dimension=1)
    ins = l128 == wsel
    cm[...] = jnp.where(ins, lane_r(m_new, r_rows, r_rows + 1, axis=1),
                        cm[...])
    ci[...] = jnp.where(ins, lane_r(i_new, r_rows, r_rows + 1, axis=1),
                        ci[...])
    cd[...] = jnp.where(ins, lane_r(d_new, r_rows, r_rows + 1, axis=1),
                        cd[...])

    @pl.when((d > r_rows) & ((wsel == 127) | (d == r_rows + m_pad)))
    def _flush():
        base = pl.multiple_of((widx // 128) * 128, 128)
        om_ref[:, pl.ds(base, 128)] = cm[...]
        oi_ref[:, pl.ds(base, 128)] = ci[...]
        od_ref[:, pl.ds(base, 128)] = cd[...]

    fin = fin_ref[...] == d
    res_ref[...] = jnp.where(fin, _max3(m_new, i_new, d_new), res_ref[...])


@functools.partial(jax.jit, static_argnames=("n", "m", "gap_open",
                                             "gap_extend", "r_rows",
                                             "interpret", "prof16"))
def wavefront_align_blocked(alpha_pad, beta_pad, fin_d, scores, *, n: int,
                            m: int, gap_open: int, gap_extend: int,
                            r_rows: int = 512, interpret: bool = False,
                            prof16: bool = False):
    """Score-mode affine wavefront in row blocks of r_rows lanes.

    Same score contract as wavefront_align(..., with_trace=False,
    mode="affine"), but the sweep runs as ceil(n / r_rows) chained
    kernels of S = r_rows + 1 lanes instead of one S = n + 1 sweep;
    boundary rows flow between blocks on device. Returns res stacked per
    block (nb, B, S_blk); pair b's score lives at block
    (n_b - 1) // r_rows, lane n_b - k * r_rows, at its fin diagonal.
    """
    B = alpha_pad.shape[0]
    nb = -(-n // r_rows)
    S = _round_up(r_rows + 1, 128)
    d_total = r_rows + m
    Mp = _round_up(m, 128) + 256

    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    # block 0 boundary = DP row 0: col 0 is (M=0, I=go, D=go), cols
    # 1..m are (NEG, go + ge*j, NEG); bx[:, j-1] = state at col j
    cols = jnp.arange(Mp, dtype=jnp.int32) + 1
    i_row = jnp.where(cols <= m,
                      jnp.int32(gap_open) + jnp.int32(gap_extend) * cols,
                      NEG)
    neg_row = jnp.full((B, Mp), NEG, jnp.int32)
    bm = neg_row
    bi = jnp.broadcast_to(i_row[None, :], (B, Mp))
    bd = neg_row
    bound0 = jnp.stack([jnp.zeros((B,), jnp.int32),
                        jnp.full((B,), gap_open, jnp.int32),
                        jnp.full((B,), gap_open, jnp.int32)])

    results = []
    for k in range(nb):
        k_off = k * r_rows
        a_blk = alpha_pad[:, k_off:min(n, k_off + r_rows)]
        if a_blk.shape[1] < r_rows:
            a_blk = jnp.concatenate(
                [a_blk, jnp.full((B, r_rows - a_blk.shape[1]), 4,
                                 jnp.int8)], axis=1)
        profiles, br = _build_inputs(a_blk, beta_pad, scores, S, m,
                                     prof16=prof16)
        fin_local = fin_d - k_off
        kern = functools.partial(_affine_block_kernel, r_rows=r_rows,
                                 m_pad=m, go=gap_open, ge=gap_extend,
                                 s_size=S, k_off=k_off)
        out_bx = jax.ShapeDtypeStruct((B, Mp), jnp.int32)
        res, om, oi, od = pl.pallas_call(
            kern,
            grid=(d_total,),
            in_specs=[vspec()] * 11,
            out_specs=(vspec(),) * 4,
            out_shape=(jax.ShapeDtypeStruct((B, S), jnp.int32),
                       out_bx, out_bx, out_bx),
            scratch_shapes=[pltpu.VMEM((2, B, S), jnp.int32)
                            for _ in range(3)]
            + [pltpu.VMEM((B, 128), jnp.int32) for _ in range(3)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                vmem_limit_bytes=_VMEM_LIMIT,
            ),
            interpret=interpret,
        )(fin_local, br, bound0, bm, bi, bd, *profiles)
        results.append(res)
        if k + 1 < nb:
            bm, bi, bd = om, oi, od
            bound0 = jnp.stack(
                [jnp.full((B,), NEG, jnp.int32),
                 jnp.full((B,), NEG, jnp.int32),
                 jnp.full((B,), gap_open + gap_extend * (k_off + r_rows),
                          jnp.int32)])  # cell ((k+1)R, 0)
    return jnp.stack(results)


@functools.partial(jax.jit, static_argnames=("n", "m", "gap", "interpret",
                                             "prof16"))
def local_align_full(alpha_pad, beta_pad, n_vec, m_vec, scores, *, n: int,
                     m: int, gap: int, interpret: bool = False,
                     prof16: bool = False):
    """Batched local alignment with ON-DEVICE traceback.

    Runs the wavefront kernel, finds each pair's best cell, then walks the
    packed trace with a lax.scan (all pairs in parallel), so only
    O(B * (n+m)) bytes ever leave the device — the full trace tensor
    (n+m, B, S) stays in HBM. Returns (score, i_end, j_end, i0, j0, ops)
    where ops[b] is the backward-walk op string (0=M, 1=ref-gap, 2=read-
    gap, 4=inactive).
    """
    bv, bd, trace = wavefront_local(alpha_pad, beta_pad, n_vec, m_vec,
                                    scores, n=n, m=m, gap=gap,
                                    with_trace=True, interpret=interpret,
                                    prof16=prof16)
    B, S = bv.shape
    D = n + m
    score = jnp.max(bv, axis=1)
    s_star = jnp.argmax(bv, axis=1)
    d_star = jnp.take_along_axis(bd, s_star[:, None], 1)[:, 0]
    i_end = s_star
    j_end = d_star - s_star
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

    init = (i_end, j_end, score > 0)
    (i0, j0, _), ops = jax.lax.scan(step, init, None, length=D)
    # pack the backward-walk ops 4-per-byte (codes 0=M, 1=ref-gap,
    # 2=read-gap, 3=stop): the (B, D) int8 walk was the dominant
    # device->host transfer of the read-aligner emit path (~700 KB per
    # 2048-batch through the tunnel); unpack with unpack_ops()
    opsT = jnp.minimum(ops.T, 3).astype(jnp.int32)  # (B, D)
    Dp = -(-D // 4) * 4
    opsT = jnp.pad(opsT, ((0, 0), (0, Dp - D)), constant_values=3)
    packed = (opsT.reshape(B, Dp // 4, 4)
              * jnp.asarray([1, 4, 16, 64], jnp.int32)).sum(
                  axis=-1).astype(jnp.uint8)
    return score, i_end, j_end, i0, j0, packed


def unpack_ops(packed: "np.ndarray", D: int) -> "np.ndarray":
    """Decode local_align_full's 2-bit packed walk ops to (B, D) int8
    (code 3 = stop; callers treat >= 3 as the walk end)."""
    import numpy as np

    crumbs = (packed[:, :, None] >> np.array([0, 2, 4, 6], np.uint8)) & 3
    return crumbs.reshape(packed.shape[0], -1)[:, :D].astype(np.int8)


def _banded_kernel(nv_ref, mv_ref, rc_ref, p0, p1, p2, p3, p4,
                   bv_ref, bi_ref, bc_ref, trace_ref, hbuf, *,
                   L: int, BW: int, gap: int, wp: int):
    """Banded local Smith-Waterman, row iteration: lane c holds column
    j = i + c of row i (the vote anchor pins the alignment near diagonal
    c = pad, so BW = 64 lanes cover the whole corridor of the (L, W)
    window that the full wavefront spent S = 2*L lanes x (n+m) steps
    on). The within-row left-gap chain folds into a log2(BW) max-prefix
    scan: H[c] = relu(max_k<=c(base[k] + gap*(c-k))) — intermediate
    clamps cannot raise later maxima because a clamped 0 contributes
    0 + gap*dist < 0, so the pure prefix form is exact.

    Trace codes match _local_kernel: 0=M(diag), 1=left(ref gap->D),
    2=up(read gap->I), 3=local stop. Best cell: per-lane strictly-
    greater keeps the smallest row; the host argmax keeps the smallest
    lane."""
    i = pl.program_id(0) + 1
    B = hbuf.shape[0]
    gap_ = jnp.int32(gap)
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (B, BW), 1)

    @pl.when(i == 1)
    def _init():
        hbuf[...] = jnp.zeros((B, BW), jnp.int32)
        bv_ref[...] = jnp.zeros((B, BW), jnp.int32)
        bi_ref[...] = jnp.zeros((B, BW), jnp.int32)

    prev = hbuf[...]
    # sub[c] = scores[read[i-1], window[i-1+c]]: slide the 5 per-window-
    # base profile rows to this row's offset (aligned load + rotate, the
    # proven dynamic-lane pattern), then select by the row's read code
    # (a (B, 1) scalar column fed per-row). An XLA gather for the same
    # (B, L, BW) tensor costs ~150 ms/batch on this chip.
    off = i - 1
    off_al = pl.multiple_of((off // 128) * 128, 128)
    r = off - off_al
    rot = jax.lax.rem(256 - r, 256)

    def slide(p):
        # widen before the rotate: Mosaic has no non-32-bit dynamic roll
        win = p[:, pl.ds(off_al, 256)].astype(jnp.int32)
        return pltpu.roll(win, rot, axis=1)[:, :BW]

    rb = rc_ref[0]  # (B, 1) read codes for this row
    lo = jnp.where(rb == 0, slide(p0), slide(p1))
    hi = jnp.where(rb == 2, slide(p2),
                   jnp.where(rb == 3, slide(p3), slide(p4)))
    sub = jnp.where(rb < 2, lo, hi)
    nb = nv_ref[...]  # (B, 1)
    mb = mv_ref[...]
    diag = prev + sub
    up = jnp.concatenate([prev[:, 1:], jnp.zeros((B, 1), jnp.int32)],
                         axis=1) + gap_
    base = jnp.maximum(diag, up)
    j_val = i + c_idx
    valid = (i <= nb) & (j_val >= 1) & (j_val <= mb)
    base = jnp.where(valid, base, NEG // 2)
    # left-gap chain via max-prefix of A[c] = base[c] - gap*c
    a = base - gap_ * c_idx
    for s in (1, 2, 4, 8, 16, 32):
        sh = jnp.concatenate(
            [jnp.full((B, s), NEG // 2, jnp.int32), a[:, :-s]], axis=1)
        a = jnp.maximum(a, sh)
    h = jnp.maximum(a + gap_ * c_idx, 0)
    h = jnp.where(valid, h, 0)
    hbuf[...] = h

    left = jnp.concatenate([jnp.zeros((B, 1), jnp.int32), h[:, :-1]],
                           axis=1) + gap_
    t = jnp.where(h == 0, 3,
                  jnp.where(h == diag, 0,
                            jnp.where(h == left, 1, 2)))
    trace_ref[0] = t.astype(jnp.int8)

    upd = h > bv_ref[...]
    bv_ref[...] = jnp.where(upd, h, bv_ref[...])
    bi_ref[...] = jnp.where(upd, i, bi_ref[...])


@functools.partial(jax.jit, static_argnames=("D", "BW"))
def _banded_walk(trace, i_end, c_end, active0, *, D: int, BW: int):
    """Backward walk over the banded trace: codes 0=M(i-1), 1=left(c-1),
    2=up(i-1, c+1), >=3 stop/inactive. Emits local_align_full's op
    stream (packed by the caller)."""
    L = trace.shape[0]
    B = trace.shape[1]
    bidx = jnp.arange(B)

    def step(carry, _):
        i, c, active = carry
        cont = active & (i > 0)
        t_raw = trace[jnp.clip(i - 1, 0, L - 1), bidx,
                      jnp.clip(c, 0, BW - 1)].astype(jnp.int32)
        t_eff = jnp.where(cont & (t_raw != 3), t_raw, 4)
        ni = i - jnp.where((t_eff == 0) | (t_eff == 2), 1, 0)
        nc = c - jnp.where(t_eff == 1, 1, 0) + jnp.where(t_eff == 2, 1, 0)
        nactive = cont & (t_raw != 3)
        return (ni, nc, nactive), t_eff.astype(jnp.int8)

    (i0, c0, _), ops = jax.lax.scan(step, (i_end, c_end, active0), None,
                                    length=D)
    return i0, c0, ops.T  # (B, D)


@functools.partial(jax.jit, static_argnames=("L", "W", "gap", "interpret",
                                             "prof16"))
def banded_align_full(alpha_pad, beta_pad, n_vec, m_vec, scores, *,
                      L: int, W: int, gap: int, interpret: bool = False,
                      prof16: bool = False):
    """Banded drop-in for local_align_full on vote-anchored windows:
    same (score, i_end, j_end, i0, j0, packed-ops) contract, ~L grid
    steps of BW = 64 lanes instead of (L + W) steps of 2L lanes. Paths
    leaving the j - i in [0, BW) corridor are not scored (they cannot
    beat min_score on anchored windows; the full wavefront path remains
    for unanchored uses)."""
    B = alpha_pad.shape[0]
    BW = 64
    if W < BW:
        raise ValueError("window must be at least the band width")
    # per-window-base profiles P_a[b, j] = scores[a, beta[b, j]] (small
    # select trees, no gathers) + per-row read codes
    sc_t = jnp.asarray(scores, jnp.int32)
    wp = _round_up(W + 256 + 128, 128)
    bp = jnp.concatenate(
        [beta_pad, jnp.full((B, wp - W), 4, jnp.int8)],
        axis=1).astype(jnp.int32)
    bp = jnp.clip(bp, 0, 4)
    profs = []
    for a in range(5):
        lo = jnp.where(bp == 0, sc_t[a, 0], sc_t[a, 1])
        hi = jnp.where(bp == 2, sc_t[a, 2],
                       jnp.where(bp == 3, sc_t[a, 3], sc_t[a, 4]))
        prof = jnp.where(bp < 2, lo, hi)
        profs.append(prof.astype(jnp.int16) if prof16 else prof)
    rcode = jnp.clip(alpha_pad.astype(jnp.int32), 0, 4).T[:, :, None]  # (L, B, 1)

    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    kern = functools.partial(_banded_kernel, L=L, BW=BW, gap=gap, wp=wp)
    res_shape = jax.ShapeDtypeStruct((B, BW), jnp.int32)
    bv, bi, _bc, trace = pl.pallas_call(
        kern,
        grid=(L,),
        in_specs=[vspec(), vspec(),
                  pl.BlockSpec((1, B, 1), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)] + [vspec()] * 5,
        out_specs=(vspec(), vspec(), vspec(),
                   pl.BlockSpec((1, B, BW), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(res_shape, res_shape, res_shape,
                   jax.ShapeDtypeStruct((L, B, BW), jnp.int8)),
        scratch_shapes=[pltpu.VMEM((B, BW), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(n_vec, m_vec, rcode, *profs)

    score = jnp.max(bv, axis=1)
    c_star = jnp.argmax(bv, axis=1).astype(jnp.int32)
    i_star = jnp.take_along_axis(bi, c_star[:, None], axis=1)[:, 0]
    i_end = i_star
    j_end = i_star + c_star
    D = L + BW + 4
    i0, c0, ops = _banded_walk(trace, i_star, c_star, score > 0,
                               D=D, BW=BW)
    j0 = i0 + c0
    opsT = jnp.minimum(ops, 3).astype(jnp.int32)
    Dp = -(-D // 4) * 4
    opsT = jnp.pad(opsT, ((0, 0), (0, Dp - D)), constant_values=3)
    packed = (opsT.reshape(B, Dp // 4, 4)
              * jnp.asarray([1, 4, 16, 64], jnp.int32)).sum(
                  axis=-1).astype(jnp.uint8)
    return score, i_end, j_end, i0, j0, packed


def _shift_chunked(x):
    """s -> s-1 shift in the chunked layout x[b, c, l] = v[b, c*Sc + l]:
    lane shift with a per-pair sublane-carry column (row c gets row c-1's
    last lane within the same pair)."""
    carry = jnp.concatenate([x[:, :1, -1:], x[:, :-1, -1:]], axis=1)
    return jnp.concatenate([carry, x[:, :, :-1]], axis=2)


def _affine_fwd_chunked_kernel(d0_ref, fin_ref, br_ref,
                               q0, q1, q2, q3, q4,
                               min_ref, iin_ref, din_ref,
                               mout_ref, iout_ref, dout_ref,
                               resm_ref, resi_ref, resd_ref,
                               mbuf, ibuf, dbuf, *, n_pad: int, m_pad: int,
                               go: int, ge: int, s_chunk: int, K: int):
    """Forward checkerboard (K diagonals from an explicit two-diagonal
    state) in a sublane-CHUNKED lane layout: the s axis is folded into
    8 sublane rows of s_chunk lanes (s = c*s_chunk + l) so a single pair
    fills all sublanes instead of paying 8x padding, and B equal-size
    pairs batch along the leading dim. This is what lets a
    chromosome-scale wavefront (n ~ 100k lanes) fit VMEM.

    br layout: br2[b, c] = br_flat[b, c*s_chunk :], so one lane-roll by
    the per-diagonal offset serves all 8 rows at once. State slot p holds
    the diagonal with parity d%2 == p (as in _affine_kernel)."""
    t = pl.program_id(0)
    dg = d0_ref[0, 0] + 1 + t
    B, C, Sc = q0.shape
    go_ = jnp.int32(go)
    ge_ = jnp.int32(ge)
    s_idx = (jax.lax.broadcasted_iota(jnp.int32, (B, C, Sc), 1) * Sc
             + jax.lax.broadcasted_iota(jnp.int32, (B, C, Sc), 2))

    @pl.when(t == 0)
    def _load():
        mbuf[0], mbuf[1] = min_ref[0], min_ref[1]
        ibuf[0], ibuf[1] = iin_ref[0], iin_ref[1]
        dbuf[0], dbuf[1] = din_ref[0], din_ref[1]
        resm_ref[...] = jnp.full((B, C, Sc), NEG, jnp.int32)
        resi_ref[...] = jnp.full((B, C, Sc), NEG, jnp.int32)
        resd_ref[...] = jnp.full((B, C, Sc), NEG, jnp.int32)

    cur = jax.lax.rem(dg, 2)
    prv = 1 - cur
    m1, i1, d1 = mbuf[prv], ibuf[prv], dbuf[prv]
    m2, i2, d2 = mbuf[cur], ibuf[cur], dbuf[cur]

    # beta codes: window [off + c*Sc + l]; rows pre-offset by c*Sc
    off = m_pad - dg + 8 * Sc
    off_al = pl.multiple_of((off // 128) * 128, 128)
    r = off - off_al
    win = br_ref[:, :, pl.ds(off_al, Sc + 128)].astype(jnp.int32)
    win = pltpu.roll(win, jax.lax.rem(Sc + 128 - r, Sc + 128), axis=2)
    be = win[:, :, :Sc]
    sc = _select_score(be, q0, q1, q2, q3, q4)

    # fused score-mode recurrences (shift distributes over max/+const):
    # two chunked shifts instead of six — the unfused trace-style form
    # measured ~1.8x slower per step (PERF_NOTES stream-kernel table),
    # and this forward saves no trace
    m_new = sc + _shift_chunked(_max3(m2, i2, d2))
    i_new = _max3(go_ + ge_ + m1, ge_ + i1, go_ + ge_ + d1)
    d_new = _shift_chunked(
        jnp.maximum(go_ + ge_ + jnp.maximum(m1, i1), ge_ + d1))

    interior = (s_idx >= jnp.maximum(1, dg - m_pad)) & \
               (s_idx <= jnp.minimum(dg - 1, n_pad))
    row0 = (s_idx == 0) & (dg <= m_pad)
    col0 = (s_idx == dg) & (dg <= n_pad)
    bnd = go_ + ge_ * dg
    m_new = jnp.where(interior, m_new, NEG)
    i_new = jnp.where(interior, i_new, jnp.where(row0, bnd, NEG))
    d_new = jnp.where(interior, d_new, jnp.where(col0, bnd, NEG))

    mbuf[cur] = m_new
    ibuf[cur] = i_new
    dbuf[cur] = d_new

    @pl.when(fin_ref[0, 0] == dg)
    def _capture():
        resm_ref[...] = m_new
        resi_ref[...] = i_new
        resd_ref[...] = d_new

    @pl.when(t == K - 1)
    def _store():
        mout_ref[0], mout_ref[1] = mbuf[0], mbuf[1]
        iout_ref[0], iout_ref[1] = ibuf[0], ibuf[1]
        dout_ref[0], dout_ref[1] = dbuf[0], dbuf[1]


def _affine_fwd_chunked_call(B: int, Sc: int, *, n: int, m: int,
                             gap_open: int, gap_extend: int, K: int,
                             interpret: bool):
    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    state_shape = jax.ShapeDtypeStruct((2, B, 8, Sc), jnp.int32)
    res_shape = jax.ShapeDtypeStruct((B, 8, Sc), jnp.int32)
    kern = functools.partial(_affine_fwd_chunked_kernel, n_pad=n, m_pad=m,
                             go=gap_open, ge=gap_extend, s_chunk=Sc, K=K)
    return pl.pallas_call(
        kern,
        grid=(K,),
        in_specs=[sspec(), sspec()] + [vspec()] * 9,
        out_specs=tuple([vspec()] * 6),
        out_shape=tuple([state_shape] * 3 + [res_shape] * 3),
        scratch_shapes=[pltpu.VMEM((2, B, 8, Sc), jnp.int32)
                        for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )


def _affine_bwd_window_kernel(d0_ref, wlo_ref, br_ref, q0, q1, q2, q3, q4,
                              min_ref, iin_ref, din_ref, trace_ref,
                              mbuf, ibuf, dbuf, *, n_pad: int, m_pad: int,
                              go: int, ge: int, s_size: int, K: int):
    """Backward re-fill of one checkerboard restricted to a PER-PAIR
    W-lane window [wlo_b, wlo_b+W): dependencies move at most one lane
    per diagonal, so cells in the traceback corridor are exact as long as
    the window extends K lanes left of the path's entry lane. Emits the
    packed M/I/D trace rows; VMEM cost is O(W), independent of n.

    The caller pre-slices beta codes and profiles to each pair's window
    (br_ref[b, y] = br_full[b, y0_b + y] with y0_b = m_pad + s_size +
    wlo_b - d0 - K), which makes the in-kernel window offset depend only
    on the grid step: off = K - 1 - t."""
    t = pl.program_id(0)
    dg = d0_ref[0, 0] + 1 + t
    B, W = q0.shape
    go_ = jnp.int32(go)
    ge_ = jnp.int32(ge)
    s_idx = wlo_ref[...] + jax.lax.broadcasted_iota(jnp.int32, (B, W), 1)

    @pl.when(t == 0)
    def _load():
        mbuf[0], mbuf[1] = min_ref[0], min_ref[1]
        ibuf[0], ibuf[1] = iin_ref[0], iin_ref[1]
        dbuf[0], dbuf[1] = din_ref[0], din_ref[1]

    cur = jax.lax.rem(dg, 2)
    prv = 1 - cur
    m1, i1, d1 = mbuf[prv], ibuf[prv], dbuf[prv]
    m2, i2, d2 = mbuf[cur], ibuf[cur], dbuf[cur]

    off = K - 1 - t
    off_al = pl.multiple_of((off // 128) * 128, 128)
    r = off - off_al
    win = br_ref[:, pl.ds(off_al, W + 128)].astype(jnp.int32)
    win = pltpu.roll(win, jax.lax.rem(W + 128 - r, W + 128), axis=1)
    be = win[:, :W]
    sc = _select_score(be, q0, q1, q2, q3, q4)

    m2s, i2s, d2s = _shift(m2), _shift(i2), _shift(d2)
    m_new = sc + _max3(m2s, i2s, d2s)
    a_i, b_i, c_i = go_ + ge_ + m1, ge_ + i1, go_ + ge_ + d1
    i_new = _max3(a_i, b_i, c_i)
    m1s, i1s, d1s = _shift(m1), _shift(i1), _shift(d1)
    a_d, b_d, c_d = go_ + ge_ + m1s, go_ + ge_ + i1s, ge_ + d1s
    d_new = _max3(a_d, b_d, c_d)

    interior = (s_idx >= jnp.maximum(1, dg - m_pad)) & \
               (s_idx <= jnp.minimum(dg - 1, n_pad))
    row0 = (s_idx == 0) & (dg <= m_pad)
    col0 = (s_idx == dg) & (dg <= n_pad)
    bnd = go_ + ge_ * dg
    m_new = jnp.where(interior, m_new, NEG)
    i_new = jnp.where(interior, i_new, jnp.where(row0, bnd, NEG))
    d_new = jnp.where(interior, d_new, jnp.where(col0, bnd, NEG))

    mbuf[cur] = m_new
    ibuf[cur] = i_new
    dbuf[cur] = d_new

    t_m = _argmax3(m2s, i2s, d2s)
    t_i = _argmax3(a_i, b_i, c_i)
    t_d = _argmax3(a_d, b_d, c_d)
    trace_ref[0] = (t_m + t_i * 4 + t_d * 16).astype(jnp.int8)


def _affine_bwd_window_call(B: int, W: int, *, n: int, m: int,
                            gap_open: int, gap_extend: int, s_size: int,
                            K: int, interpret: bool):
    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    def sspec():
        return pl.BlockSpec(memory_space=pltpu.SMEM)

    kern = functools.partial(_affine_bwd_window_kernel, n_pad=n, m_pad=m,
                             go=gap_open, ge=gap_extend, s_size=s_size, K=K)
    return pl.pallas_call(
        kern,
        grid=(K,),
        in_specs=[sspec(), vspec()] + [vspec()] * 9,
        out_specs=pl.BlockSpec((1, B, W), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((K, B, W), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2, B, W), jnp.int32) for _ in range(3)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )


@functools.partial(jax.jit, static_argnames=("K", "W"))
def _walk_block(trace, d0, soff, i, j, k, *, K: int, W: int):
    """On-device traceback over one block's windowed trace. Emits the op
    (0=M, 1=I, 2=D, 4=inactive) per step, walking backward while the
    current cell's diagonal is inside [d0+1, d0+K]."""
    B = trace.shape[1]
    bidx = jnp.arange(B)

    def step(carry, _):
        i, j, k = carry
        d_rel = i + j - 1 - d0
        active = (i >= 1) & (j >= 1) & (d_rel >= 0)
        dd = jnp.clip(d_rel, 0, K - 1)
        ss = jnp.clip(i - soff, 0, W - 1)
        packed = trace[dd, bidx, ss].astype(jnp.int32)
        op = jnp.where(active, k, 4).astype(jnp.int8)
        k_next = jnp.where(k == 0, packed & 3,
                           jnp.where(k == 1, (packed >> 2) & 3,
                                     (packed >> 4) & 3))
        ni = i - jnp.where(active & ((k == 0) | (k == 2)), 1, 0)
        nj = j - jnp.where(active & ((k == 0) | (k == 1)), 1, 0)
        nk = jnp.where(active, k_next, k)
        return (ni, nj, nk), op

    (i, j, k), ops = jax.lax.scan(step, (i, j, k), None, length=K)
    return i, j, k, ops


@functools.partial(jax.jit, static_argnames=(
    "K", "W", "Wsl", "S8", "n", "m", "gap_open", "gap_extend", "interpret"))
def _lowmem_backward(i0v, j0v, k0v, d0s, ck_m, ck_i, ck_d, profiles, brp,
                     *, K: int, W: int, Wsl: int, S8: int, n: int, m: int,
                     gap_open: int, gap_extend: int, interpret: bool):
    """One-dispatch backward pass of the lowmem aligner: lax.scan over
    checkpoint blocks (reverse order), each iteration re-filling one
    windowed checkerboard (bwd Pallas kernel) and walking its trace."""
    B = i0v.shape[0]
    bwd = _affine_bwd_window_call(B, W, n=n, m=m, gap_open=gap_open,
                                  gap_extend=gap_extend, s_size=S8, K=K,
                                  interpret=interpret)

    def _window_state(state, wlo):
        flat = state.reshape(2, B, S8)

        def sl(f, w):
            return jax.lax.dynamic_slice(f, (0, w), (2, W))

        return jax.vmap(sl, in_axes=(1, 0), out_axes=1)(flat, wlo)

    def blk_step(carry, xs):
        i_cur, j_cur, k_cur = carry
        d0, sm_b, si_b, sd_b = xs
        wlo = jnp.clip(((i_cur - 2 * K - 128) // 128) * 128, 0,
                       S8 - W).astype(jnp.int32)

        def slq(q, w):
            return jax.lax.dynamic_slice(q, (w,), (W,))

        qs = [jax.vmap(slq)(q, wlo) for q in profiles]
        y0 = m + S8 + wlo - d0  # == (true y0) + K into the padded brp

        def slb(b, y):
            return jax.lax.dynamic_slice(b, (y,), (Wsl,))

        br_sl = jax.vmap(slb)(brp, y0)
        trace = bwd(jnp.full((1, 1), d0, jnp.int32), wlo[:, None],
                    br_sl, *qs,
                    _window_state(sm_b, wlo), _window_state(si_b, wlo),
                    _window_state(sd_b, wlo))
        iv, jv, kv, ops = _walk_block(trace, d0, wlo, i_cur, j_cur,
                                      k_cur, K=K, W=W)
        return (iv, jv, kv), ops

    (iv, jv, kv), ops = jax.lax.scan(
        blk_step, (i0v, j0v, k0v), (d0s, ck_m, ck_i, ck_d))
    return iv, jv, kv, ops  # ops: (NB, K, B)


@functools.lru_cache(maxsize=32)
def _lowmem_fwd_loop(B: int, Sc: int, n: int, m: int, K: int, fb: int,
                     gap_open: int, gap_extend: int, interpret: bool):
    """One-dispatch forward of the lowmem aligner: all fb+1 chunked
    wavefront blocks + checkpoint stacking traced into a single jitted
    program (per-block eager dispatch paid a tunnel round-trip each)."""
    fwd = _affine_fwd_chunked_call(B, Sc, n=n, m=m, gap_open=gap_open,
                                   gap_extend=gap_extend, K=K,
                                   interpret=interpret)
    S8 = 8 * Sc

    @jax.jit
    def loop(fin, br2, q0, q1, q2, q3, q4, sm, si, sd):
        ckpts = []
        resm = resi = resd = None
        for blk in range(fb + 1):
            ckpts.append((sm, si, sd))
            d0 = jnp.full((1, 1), blk * K, jnp.int32)
            sm, si, sd, rm, ri, rd = fwd(d0, fin, br2, q0, q1, q2, q3,
                                         q4, sm, si, sd)
            if blk == fb:
                resm, resi, resd = rm, ri, rd
        ck_m = jnp.stack([ckpts[blk][0] for blk in range(fb, -1, -1)])
        ck_i = jnp.stack([ckpts[blk][1] for blk in range(fb, -1, -1)])
        ck_d = jnp.stack([ckpts[blk][2] for blk in range(fb, -1, -1)])
        fm = resm.reshape(B, S8)[:, n]
        fi = resi.reshape(B, S8)[:, n]
        fd = resd.reshape(B, S8)[:, n]
        return ck_m, ck_i, ck_d, resm, resi, resd, fm, fi, fd

    return loop


def affine_gap_lowmem_batch(alphas, betas, scores, gap_open: int,
                            gap_extend: int, *, checkersize: int = 2048,
                            interpret: bool = False):
    """Chromosome-scale affine alignment of B equal-size pairs in
    O(B*(n+m)) HBM: forward chunked wavefront (batched over pairs along
    the leading dim) saving only block-edge state every `checkersize`
    diagonals, then per-block windowed re-fill with PER-PAIR traceback
    corridors + on-device trace walk — the reference's checkerboard
    scheme (align/affineGap.go:20-54,219-273) rebuilt as tiled Pallas
    wavefronts.

    alphas (B, n), betas (B, m) int8. Returns a list of (score, ops,
    i0, j0) per pair with ops the backward M/I/D op codes (0/1/2) from
    (n, m) toward the origin. HBM: checkpoints O(B*(n+m)/K * n) + one
    O(B*K^2) trace block; VMEM: forward O(B*n), backward O(B*K)."""
    import numpy as onp

    alphas = jnp.asarray(alphas, jnp.int8)
    betas = jnp.asarray(betas, jnp.int8)
    B, n = alphas.shape
    m = betas.shape[1]
    S8 = _round_up(n + 1, 1024)  # 8 sublane chunks of Sc lanes
    Sc = S8 // 8
    K = int(checkersize)
    d_total = n + m
    W = min(S8, _round_up(2 * K + 640, 128))
    Wsl = K + W + 256  # pre-sliced beta window width for the bwd kernel

    profiles, br = _build_inputs(alphas, betas, scores, S8, m)
    width2 = _round_up(S8 + m + Sc + 256, 128)
    br2 = jnp.stack([br[:, c * Sc: c * Sc + width2] for c in range(8)],
                    axis=1)  # (B, 8, width2)
    profs_c = [q.reshape(B, 8, Sc) for q in profiles]
    fin = jnp.full((1, 1), d_total, jnp.int32)

    s_iota = jnp.arange(S8)
    flat0 = [jnp.where(s_iota == 0, 0, NEG).astype(jnp.int32),
             jnp.where(s_iota == 0, gap_open, NEG).astype(jnp.int32)]
    negrow = jnp.full((B, 8, Sc), NEG, jnp.int32)
    rep = lambda f: jnp.broadcast_to(f.reshape(1, 8, Sc), (B, 8, Sc))
    sm = jnp.stack([rep(flat0[0]), negrow])
    si = jnp.stack([rep(flat0[1]), negrow])
    sd = si

    # forward: save block-entry states (the checkpoints); the whole
    # block loop runs as ONE jitted program — per-block eager dispatch
    # plus checkpoint stacking paid ~0.2s of tunnel round-trips at 16
    # blocks, comparable to the kernels themselves
    fb = (d_total - 1) // K
    fwd_loop = _lowmem_fwd_loop(B, Sc, n, m, K, fb, gap_open, gap_extend,
                                interpret)
    ck_m, ck_i, ck_d, resm, resi, resd, fm_v, fi_v, fd_v = fwd_loop(
        fin, br2, *profs_c, sm, si, sd)

    fm = onp.asarray(fm_v)
    fi = onp.asarray(fi_v)
    fd = onp.asarray(fd_v)
    k0 = onp.where((fm >= fi) & (fm >= fd), 0,
                   onp.where(fi >= fd, 1, 2)).astype(onp.int32)
    score = onp.choose(k0, [fm, fi, fd])

    # backward: re-fill one block at a time, walk its windowed trace.
    # The WHOLE block loop is one jitted lax.scan — a host-synced python
    # loop paid a tunnel round-trip per block and was dispatch-bound
    # (~250x the device time at 16 blocks)
    brp = jnp.pad(br, ((0, 0), (K, 0)), constant_values=4)
    d0s = jnp.arange(fb, -1, -1, dtype=jnp.int32) * K

    iv, jv, kv, ops = _lowmem_backward(
        jnp.full(B, n, jnp.int32), jnp.full(B, m, jnp.int32),
        jnp.asarray(k0, jnp.int32), d0s, ck_m, ck_i, ck_d,
        tuple(profiles), brp, K=K, W=W, Wsl=Wsl, S8=S8, n=n, m=m,
        gap_open=gap_open, gap_extend=gap_extend, interpret=interpret)
    i_cur = onp.asarray(iv)
    j_cur = onp.asarray(jv)
    ops_all = onp.asarray(ops).reshape(-1, B)
    out = []
    for b in range(B):
        ob = ops_all[:, b]
        out.append((int(score[b]), ob[ob != 4], int(i_cur[b]),
                    int(j_cur[b])))
    return out


def affine_gap_lowmem(alpha, beta, scores, gap_open: int, gap_extend: int,
                      *, checkersize: int = 2048, interpret: bool = False):
    """Single-pair affine_gap_lowmem_batch; returns (score, ops, i0, j0)."""
    [(score, ops, i0, j0)] = affine_gap_lowmem_batch(
        jnp.asarray(alpha, jnp.int8)[None], jnp.asarray(beta, jnp.int8)[None],
        scores, gap_open, gap_extend, checkersize=checkersize,
        interpret=interpret)
    return score, ops, i0, j0


def _affine_stream_kernel(brC_hbm, q0_hbm, q1_hbm, res_ref,
                          brv, qv, mbuf, ibuf, dbuf, sem_b, sem_q, *,
                          n_pad: int, m_pad: int, fin: int, go: int, ge: int,
                          g: int, s_size: int, P: int, magic_m: int,
                          magic_k: int):
    """Two-pairs-per-lane streamed affine wavefront (score mode).

    P pairs flow through one (B, S) lane set with a stagger of g = m_pad+1
    diagonals: at grid step t the "young" pair p_hi = t//g computes its
    diagonal dy = t - p_hi*g + 1 on lanes [0, dy] while the "old" pair
    p_hi-1 computes diagonal dy+g on lanes [dy+1, n]. Because lane bounds
    move one lane per step, each pair's reads always land in its own
    previously written lanes; with m_pad >= n the old pair provably has no
    boundary cells, so the masks stay single-phase cost. This fills the
    triangular ramp that held the plain kernel to ~44% average lane
    occupancy (PERF_NOTES.md): occupancy here is (n+1)/S.

    brC is a per-pair COMBINED reversed-beta buffer: in window coordinates
    the young/old ownership boundary sits at the constant position
    Y* = m_pad + S, so brC_p[:Y*+1] holds pair p's codes and brC_p[Y*+1:]
    holds pair p-1's codes shifted by g — one window load + roll serves
    both pairs. Per-pair data (profiles stacked (5, B, S) per pair, brC)
    lives in HBM (ANY) and is DMAed into VMEM scratch manually at
    pair-switch steps only — pallas's own grid-mapped pipelining re-DMAs
    revisited blocks every step here, which made a first cut of this
    kernel HBM-bound (~12MB/step); the manual copies amortize to ~0.2%.

    Requires g even (m_pad odd) so both active diagonals share parity, and
    m_pad >= n (pad beta up; junk columns never feed real cells).

    The step coordinates (p_hi, dy) come from the flat grid index via an
    EXACT magic-multiply division (mul + shift): a real non-power-of-two
    divide measured ~10us/step of scalar-pipeline stall, an SMEM-carried
    counter serializes the scalar prologue across steps and stalls
    identically, and a 2D grid costs ~13us/step of outer-loop overhead —
    the whole kernel is ~3.5us/step without them. The magic constant is
    chosen per (g, T) and asserted exact by the driver."""
    t = pl.program_id(0)
    p_hi = (t * magic_m) >> magic_k  # == t // g for t < T (exact)
    dy = t - p_hi * g + 1
    _, _, B, S = q0_hbm.shape
    Pp = q0_hbm.shape[0]
    go_ = jnp.int32(go)
    ge_ = jnp.int32(ge)
    do = dy + g
    phase_y = jax.lax.rem(p_hi, 2)  # power-of-2 rem lowers to an AND
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (B, S), dimension=1)

    @pl.when(dy == 1)
    def _load_pair_blocks():
        pc = jnp.clip(p_hi, 0, P)
        cp = pltpu.make_async_copy(brC_hbm.at[pc], brv, sem_b)
        cp.start()
        blk = jnp.clip(p_hi // 2, 0, Pp - 1)

        @pl.when(phase_y == 0)
        def _():
            cq = pltpu.make_async_copy(q0_hbm.at[blk], qv.at[0], sem_q)
            cq.start()
            cq.wait()

        @pl.when(phase_y == 1)
        def _():
            cq = pltpu.make_async_copy(q1_hbm.at[blk], qv.at[1], sem_q)
            cq.start()
            cq.wait()

        cp.wait()

    @pl.when((p_hi == 0) & (dy == 1))
    def _load_other_phase():
        cq = pltpu.make_async_copy(q1_hbm.at[0], qv.at[1], sem_q)
        cq.start()
        cq.wait()

    cur = jax.lax.rem(dy, 2)  # == do % 2 (g even); power-of-2 rem
    prv = 1 - cur
    m1, i1, d1 = mbuf[prv], ibuf[prv], dbuf[prv]   # diagonal d-1
    m2, i2, d2 = mbuf[cur], ibuf[cur], dbuf[cur]   # diagonal d-2

    be = _beta_codes(brv, dy, m_pad, s_size, S)
    ym = s_idx <= dy
    is_p0 = ym == (phase_y == 0)
    qc0 = jnp.where(is_p0, qv[0, 0], qv[1, 0])
    qc1 = jnp.where(is_p0, qv[0, 1], qv[1, 1])
    qc2 = jnp.where(is_p0, qv[0, 2], qv[1, 2])
    qc3 = jnp.where(is_p0, qv[0, 3], qv[1, 3])
    qc4 = jnp.where(is_p0, qv[0, 4], qv[1, 4])
    lo = jnp.where(be == 0, qc0, qc1)
    hi = jnp.where(be == 2, qc2, jnp.where(be == 3, qc3, qc4))
    sc = jnp.where(be < 2, lo, hi)

    # fused score-mode recurrences (shift distributes over max): the
    # unfused 6-shift trace-style form measured 1.8x slower per step
    m_new = sc + _shift(_max3(m2, i2, d2))
    i_new = _max3(go_ + ge_ + m1, ge_ + i1, go_ + ge_ + d1)
    d_new = _shift(jnp.maximum(go_ + ge_ + jnp.maximum(m1, i1), ge_ + d1))

    # lanes [1, n] minus the young col0 lane are interior for whichever
    # pair owns them; the old pair (do > m_pad) never has boundary cells
    valid = (s_idx >= 1) & (s_idx <= n_pad) & (s_idx != dy)
    row0 = (s_idx == 0) & (dy <= m_pad)
    col0 = s_idx == dy
    bnd = go_ + ge_ * dy
    m_new = jnp.where(valid, m_new, NEG)
    i_new = jnp.where(valid, i_new, jnp.where(row0, bnd, NEG))
    d_new = jnp.where(valid, d_new, jnp.where(col0, bnd, NEG))

    mbuf[cur] = m_new
    ibuf[cur] = i_new
    dbuf[cur] = d_new

    @pl.when(dy == 1)
    def _inject_origin():
        # the young pair's cell (0,0) lives on diagonal 0 = slot prv
        at0 = s_idx == 0
        mbuf[prv] = jnp.where(at0, 0, m1)
        ibuf[prv] = jnp.where(at0, go_, i1)
        dbuf[prv] = jnp.where(at0, go_, d1)

    # capture: the pair whose diagonal hits fin writes its 128-lane result
    # window (the one containing lane n) into its slot of res
    col0 = (n_pad // 128) * 128
    d_ph0 = jnp.where(phase_y == 0, dy, do)
    d_ph1 = dy + do - d_ph0
    p_ph0 = jnp.clip(2 * (p_hi // 2), 0, P - 1)
    p_ph1 = jnp.clip(2 * ((p_hi - 1) // 2) + 1, 0, P - 1)

    @pl.when(d_ph0 == fin)
    def _cap0():
        cap = jax.lax.slice_in_dim(_max3(m_new, i_new, d_new), col0,
                                   col0 + 128, axis=1)
        res_ref[pl.ds(p_ph0, 1)] = cap.reshape(1, B, 128)

    @pl.when(d_ph1 == fin)
    def _cap1():
        cap = jax.lax.slice_in_dim(_max3(m_new, i_new, d_new), col0,
                                   col0 + 128, axis=1)
        res_ref[pl.ds(p_ph1, 1)] = cap.reshape(1, B, 128)


@functools.partial(jax.jit, static_argnames=(
    "n", "m", "gap_open", "gap_extend", "interpret"))
def wavefront_affine_stream(alpha, beta, scores, *, n: int, m: int,
                            gap_open: int, gap_extend: int,
                            interpret: bool = False):
    """Streamed score-mode affine alignment: alpha (P, B, n) int8,
    beta (P, B, m) int8 with P even and m >= n. Returns (P, B) int32
    scores of cell (n, m) — the global affine-gap score (same contract as
    wavefront_align score mode at the (n, m) lane, affineGap.go:151-207).

    Grid length is (P-1)*(m_pad+1) + n + m_pad steps for P*B pairs vs
    P*(n+m) steps batch-sequential — ~2x throughput at n == m."""
    P, B, _ = alpha.shape
    if P % 2:
        raise ValueError("stream kernel needs an even pair count P")
    if m < n:
        raise ValueError("stream kernel needs m >= n (swap operands)")
    S = _round_up(n + 1, 128)
    m_pad = m if m % 2 == 1 else m + 1
    g = m_pad + 1
    fin = n + m
    Pp = P // 2

    if m_pad > m:
        beta = jnp.concatenate(
            [beta, jnp.full((P, B, m_pad - m), 4, jnp.int8)], axis=2)

    def build(a, b):
        return _build_inputs(a, b, scores, S, m_pad)

    profiles, fulls = jax.vmap(build)(alpha, beta)
    Wb = fulls.shape[-1]
    Ystar = m_pad + S
    # block p serves young pair p (lower region) + old pair p-1 (upper
    # region, codes shifted by g); block P serves the tail where the
    # "young" slot is a phantom and pair P-1 is the old pair.
    young = jnp.concatenate([fulls, fulls[-1:]], axis=0)
    upper = jnp.concatenate([fulls[:1], fulls], axis=0)  # pair p-1
    brC = jnp.concatenate(
        [young[:, :, :Ystar + 1], upper[:, :, S:S + (Wb - Ystar - 1)]],
        axis=2)
    qstack = jnp.stack(profiles, axis=1)  # (P, 5, B, S)
    q_ph0, q_ph1 = qstack[0::2], qstack[1::2]

    T = (P - 1) * g + n + m_pad
    # exact magic division t//g as (t*M)>>K: M = ceil(2^K/g) is exact
    # for t < 2^K // (M*g - 2^K); pick the smallest adequate K
    for magic_k in range(17, 31):
        magic_m = -((-(1 << magic_k)) // g)  # ceil
        err = magic_m * g - (1 << magic_k)
        if err == 0 or (1 << magic_k) // err > T:
            if T * magic_m < 2 ** 31:
                break
    else:
        raise ValueError(f"no exact magic divider for g={g}, T={T}")

    kern = functools.partial(_affine_stream_kernel, n_pad=n, m_pad=m_pad,
                             fin=fin, go=gap_open, ge=gap_extend, g=g,
                             s_size=S, P=P, magic_m=magic_m,
                             magic_k=magic_k)
    res = pl.pallas_call(
        kern,
        grid=(T,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((P, B, 128), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((B, Wb), jnp.int8),
            pltpu.VMEM((2, 5, B, S), jnp.int32),
            pltpu.VMEM((2, B, S), jnp.int32),
            pltpu.VMEM((2, B, S), jnp.int32),
            pltpu.VMEM((2, B, S), jnp.int32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(brC, q_ph0, q_ph1)
    return res[:, :, n - (n // 128) * 128]


@functools.partial(jax.jit, static_argnames=(
    "n", "m", "gap_open", "gap_extend", "with_trace", "mode", "interpret",
    "prof16"))
def wavefront_align(alpha_pad, beta_pad, fin_d, scores, *, n: int, m: int,
                    gap_open: int, gap_extend: int, with_trace: bool,
                    mode: str = "affine", interpret: bool = False,
                    prof16: bool = False):
    """Run the wavefront DP over a batch of padded pairs.

    alpha_pad: (B, n) int8 codes (0..4), beta_pad: (B, m) int8,
    fin_d: (B, 1) int32 = n_b + m_b per pair.
    Returns score-mode: res (B, S); trace-mode: (resM, resI, resD, trace)
    where trace is (n+m, B, S) packed int8 (const mode: res / (res, trace)).
    """
    B = alpha_pad.shape[0]
    S = _round_up(n + 1, 128)
    profiles, br = _build_inputs(alpha_pad, beta_pad, scores, S, m,
                                 prof16=prof16)

    d_total = n + m
    grid = (d_total,)

    def vspec():
        return pl.BlockSpec(memory_space=pltpu.VMEM)

    res_shape = jax.ShapeDtypeStruct((B, S), jnp.int32)
    trace_shape = jax.ShapeDtypeStruct((d_total, B, S), jnp.int8)
    trace_spec = pl.BlockSpec((1, B, S), lambda i: (i, 0, 0),
                              memory_space=pltpu.VMEM)

    if mode == "affine":
        kern = functools.partial(_affine_kernel, n_pad=n, m_pad=m,
                                 go=gap_open, ge=gap_extend, s_size=S,
                                 with_trace=with_trace)
        scratch = [pltpu.VMEM((2, B, S), jnp.int32) for _ in range(3)]
        if with_trace:
            out_shape = (res_shape, res_shape, res_shape, trace_shape)
            out_specs = (vspec(), vspec(), vspec(), trace_spec)
        else:
            out_shape = res_shape
            out_specs = vspec()
    else:
        kern = functools.partial(_const_kernel, n_pad=n, m_pad=m,
                                 gap=gap_open, s_size=S,
                                 with_trace=with_trace)
        scratch = [pltpu.VMEM((2, B, S), jnp.int32)]
        if with_trace:
            out_shape = (res_shape, trace_shape)
            out_specs = (vspec(), trace_spec)
        else:
            out_shape = res_shape
            out_specs = vspec()

    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[vspec()] * 7,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=interpret,
    )(fin_d, br, *profiles)
