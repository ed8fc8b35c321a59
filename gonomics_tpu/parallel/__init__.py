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

    def local_step(alpha, beta, fin, pos, base, valid):
        res = wavefront_align(alpha, beta, fin, scores, n=n, m=m,
                              gap_open=gap_open, gap_extend=gap_extend,
                              with_trace=False, mode="affine",
                              interpret=interpret)
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
    from ..ops.wavefront import local_align_full

    sc = np.asarray(scores)

    def local(alpha, beta, nv, mv):
        return local_align_full(alpha, beta, nv, mv, sc, n=n, m=m,
                                gap=gap, interpret=interpret)

    return jax.jit(jax.shard_map(
        local, mesh=mesh,
        in_specs=(P("data", None),) * 4,
        out_specs=(P("data"), P("data"), P("data"), P("data"), P("data"),
                   P("data", None)),
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
