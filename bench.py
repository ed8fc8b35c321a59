#!/usr/bin/env python
"""Headline benchmark matrix. Prints ONE JSON line:
  {"metric": "affine_gap_gcups", "value": N, "unit": "GCUPS",
   "vs_baseline": N, ...}

Covers all five BASELINE.json configs: affine-gap GCUPS (score-mode
streamed kernel + trace mode), gsw reads/s (linear 1 Mbp + 100 Mbp +
graph engine), faFindFast windows/s, pileup+callVariants sites/s, plus
the chromosome-scale lowmem batch and the 8-device virtual-mesh scaling
check. vs_baseline denominators are single-threaded C++ implementations
of the reference's hot loops compiled at bench time (native/*.cpp; no Go
toolchain on this machine — see BASELINE.md "Measurement plan").

Every TPU stage runs in its own subprocess under a hard timeout, so a
wedged device tunnel costs one stage, not the whole bench. Compiled
kernels must equal the numpy oracle before any timing (fast-but-wrong
numbers must not ship). Device timing uses data-dependent call chains
and chain-length differencing (block_until_ready is unreliable over the
axon tunnel)."""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def _build(name: str, *compile_args: str) -> str:
    src = os.path.join(HERE, "native", name + ".cpp")
    exe = os.path.join(HERE, "native", name)
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(["g++", "-O2", "-pthread", "-o", exe, src,
                        *compile_args], check=True)
    return exe


NPROC = os.cpu_count() or 1


def _stage(code: str, timeout: int) -> dict:
    """Run a bench stage in a subprocess; last stdout line is its JSON."""
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout, cwd=HERE)
        line = out.stdout.strip().split("\n")[-1] if out.stdout.strip() else ""
        if out.returncode != 0 or not line.startswith("{"):
            return {"error": (out.stderr.strip() or out.stdout.strip())[-300:]}
        return json.loads(line)
    except subprocess.TimeoutExpired:
        return {"error": f"stage timeout ({timeout}s)"}
    except Exception as e:  # noqa: BLE001
        return {"error": str(e)[-300:]}


_PRELUDE = r"""
import json, time
import numpy as np
import jax, jax.numpy as jnp


def chain_rate(fn, reinject, cells, k_short, k_long, reps=3):
    # data-dependent chains; difference two lengths to cancel dispatch
    def chain(k):
        res = None
        x = None
        for _ in range(k):
            res = fn(x)
            x = reinject(res)
        return res
    np.asarray(jax.device_get(chain(1)))
    def timed(k):
        t0 = time.perf_counter()
        np.asarray(jax.device_get(chain(k)))
        return time.perf_counter() - t0
    ts = min(timed(k_short) for _ in range(reps))
    tl = min(timed(k_long) for _ in range(reps))
    dt = (tl - ts) / (k_long - k_short)
    return cells / dt, dt
"""


def stage_score_stream() -> dict:
    """Score-mode GCUPS: plain wavefront kernel (headline) plus the
    experimental streamed kernel, both behind a compiled-parity gate."""
    return _stage(_PRELUDE + r"""
from gonomics_tpu.align.matrices import HUMAN_CHIMP_TWO
from gonomics_tpu.align import oracle
from gonomics_tpu.ops.wavefront import wavefront_affine_stream, wavefront_align

# compiled parity first (small shapes, both kernels)
rng = np.random.default_rng(5)
B0, L0 = 8, 96
a0 = rng.integers(0, 4, (B0, L0)).astype(np.int8)
b0 = rng.integers(0, 5, (B0, L0)).astype(np.int8)
fin0 = np.full((B0, 1), 2 * L0, np.int32)
res0 = np.asarray(jax.device_get(wavefront_align(
    jnp.asarray(a0), jnp.asarray(b0), jnp.asarray(fin0), HUMAN_CHIMP_TWO,
    n=L0, m=L0, gap_open=-600, gap_extend=-150, with_trace=False,
    mode="affine", prof16=True)))
for b in range(B0):
    want, _ = oracle.affine_gap(a0[b], b0[b], HUMAN_CHIMP_TWO, -600, -150)
    assert res0[b, L0] == want, (b, int(res0[b, L0]), want)
P0 = 4
als = rng.integers(0, 4, (P0, B0, L0)).astype(np.int8)
bes = rng.integers(0, 5, (P0, B0, L0)).astype(np.int8)
gots = np.asarray(jax.device_get(wavefront_affine_stream(
    jnp.asarray(als), jnp.asarray(bes), HUMAN_CHIMP_TWO,
    n=L0, m=L0, gap_open=-600, gap_extend=-150)))
for p in range(P0):
    for b in range(B0):
        want, _ = oracle.affine_gap(als[p, b], bes[p, b], HUMAN_CHIMP_TWO,
                                    -600, -150)
        assert gots[p, b] == want, (p, b, int(gots[p, b]), want)

B, L = 256, 1024
a1 = jnp.asarray(np.random.default_rng(2).integers(0, 4, (B, L)), jnp.int8)
b1 = jnp.asarray(np.random.default_rng(3).integers(0, 4, (B, L)), jnp.int8)
fin = jnp.full((B, 1), 2 * L, jnp.int32)

def g(x):
    a = a1 if x is None else jnp.bitwise_and(a1 + x[:, :L].astype(jnp.int8), 3)
    return wavefront_align(a, b1, fin, HUMAN_CHIMP_TWO, n=L, m=L,
                           gap_open=-600, gap_extend=-150,
                           with_trace=False, mode="affine", prof16=True)

rate, dt = chain_rate(g, lambda r: r, B * L * L, 2, 16)
rate = max(rate, chain_rate(g, lambda r: r, B * L * L, 2, 16)[0])
out = {"score_gcups": round(rate / 1e9, 2),
       "score_config": "B=256 pairs, 1024x1024, humanChimpTwo, score-only",
       "score_parity": "compiled == oracle (plain B=8 + stream P=4xB=8)"}

# experimental streamed kernel (PERF_NOTES round-3 negative result)
P = 8
alpha = jnp.asarray(np.random.default_rng(0).integers(0, 4, (P, B, L)), jnp.int8)
beta = jnp.asarray(np.random.default_rng(1).integers(0, 4, (P, B, L)), jnp.int8)

def f(x):
    a = alpha if x is None else jnp.bitwise_and(alpha + x[:, :, None].astype(jnp.int8), 3)
    return wavefront_affine_stream(a, beta, HUMAN_CHIMP_TWO, n=L, m=L,
                                   gap_open=-600, gap_extend=-150)

rate2, _ = chain_rate(f, lambda r: r, P * B * L * L, 2, 6)
out["score_gcups_stream_experimental"] = round(rate2 / 1e9, 2)
print(json.dumps(out))
""", timeout=1200)


def stage_trace() -> dict:
    """Trace-mode GCUPS (BASELINE cfg 2) with compiled cigar parity of
    the full local_align_full path against the numpy oracle."""
    return _stage(_PRELUDE + r"""
from gonomics_tpu.align.matrices import HUMAN_CHIMP_TWO
from gonomics_tpu.align import oracle, pairwise
from gonomics_tpu.ops.wavefront import wavefront_align

# compiled trace parity: full cigars through the batched API
rng = np.random.default_rng(11)
pairs = []
for _ in range(8):
    a = rng.integers(0, 4, 96).astype(np.int8)
    b = a.copy()
    for p in rng.integers(0, 96, 5):
        b[p] = (b[p] + 1) % 4
    b = np.concatenate([b[:40], b[43:]])  # indel
    pairs.append((a, b.astype(np.int8)))
got = pairwise.affine_gap_batch(pairs, HUMAN_CHIMP_TWO, -600, -150,
                                backend="tpu")
for (a, b), (s, route) in zip(pairs, got):
    ws, wr = oracle.affine_gap(a, b, HUMAN_CHIMP_TWO, -600, -150)
    assert s == ws
    assert [(c.run_length, c.op) for c in route] == \
        [(c.run_length, c.op) for c in wr]

B, L = 128, 1024
alpha = jnp.asarray(np.random.default_rng(0).integers(0, 4, (B, L)), jnp.int8)
beta = jnp.asarray(np.random.default_rng(1).integers(0, 4, (B, L)), jnp.int8)
fin = jnp.full((B, 1), 2 * L, jnp.int32)

def f(x):
    a = alpha if x is None else jnp.bitwise_and(alpha + x[:, :L].astype(jnp.int8), 3)
    r = wavefront_align(a, beta, fin, HUMAN_CHIMP_TWO,
                        n=L, m=L, gap_open=-600, gap_extend=-150,
                        with_trace=True, mode="affine", prof16=True)
    return r[0]

rate, _ = chain_rate(f, lambda r: r, B * L * L, 2, 8)
rate = max(rate, chain_rate(f, lambda r: r, B * L * L, 2, 8)[0])
print(json.dumps({
    "trace_gcups": round(rate / 1e9, 2),
    "trace_config": "B=128, 1024x1024, with traceback (BASELINE cfg 2)",
    "trace_parity": "compiled cigars == oracle (B=8, L=96, indels)"}))
""", timeout=1200)


def stage_lowmem() -> dict:
    """Chromosome-scale batched lowmem path: B=8 pairs, full traceback,
    oracle-checked on a small shape first."""
    return _stage(r"""
import json, time
import numpy as np
import jax
from gonomics_tpu.align.matrices import HUMAN_CHIMP_TWO
from gonomics_tpu.align import oracle
from gonomics_tpu.ops.wavefront import affine_gap_lowmem_batch

rng = np.random.default_rng(3)
a = rng.integers(0, 4, (2, 300)).astype(np.int8)
b = rng.integers(0, 4, (2, 300)).astype(np.int8)
res = affine_gap_lowmem_batch(a, b, HUMAN_CHIMP_TWO, -600, -150,
                              checkersize=128)
for i in range(2):
    ws, _ = oracle.affine_gap(a[i], b[i], HUMAN_CHIMP_TWO, -600, -150)
    assert res[i][0] == ws

B, n = 16, 16384
alphas = rng.integers(0, 4, (B, n)).astype(np.int8)
betas = rng.integers(0, 4, (B, n)).astype(np.int8)
for _ in range(2):  # warm-up/compile (fwd + fused-backward traces)
    affine_gap_lowmem_batch(alphas, betas, HUMAN_CHIMP_TWO, -600, -150,
                            checkersize=1024)
dt = 1e9
for _ in range(5):
    t0 = time.perf_counter()
    affine_gap_lowmem_batch(alphas, betas, HUMAN_CHIMP_TWO, -600, -150,
                            checkersize=1024)
    dt = min(dt, time.perf_counter() - t0)
print(json.dumps({
    "lowmem_gcups": round(B * n * n / dt / 1e9, 2),
    "lowmem_config": "B=16 pairs 16k x 16k, full traceback, K=1024",
    "lowmem_parity": "batch scores == oracle (B=2, 300x300)"}))
""", timeout=1200)


def stage_reads() -> dict:
    """End-to-end linear reads/s (BASELINE cfg 4): 1 Mbp steady state +
    the graph engine on a variant graph."""
    return _stage(r"""
import json, time
import numpy as np
from gonomics_tpu import dna
from gonomics_tpu.io.fasta import Fasta
from gonomics_tpu.io.fastq import Fastq, to_big
from gonomics_tpu.tpu_align import TpuReadAligner

rng = np.random.default_rng(0)
genome_len, B, L = 1_000_000, 4096, 150
genome = rng.integers(0, 4, genome_len).astype(np.int8)
al = TpuReadAligner([Fasta("chr1", genome)])

def make_reads(seed):
    r = np.random.default_rng(seed)
    reads = []
    for i in range(B):
        start = int(r.integers(0, genome_len - L))
        seq = genome[start:start + L].copy()
        for _ in range(3):
            p = int(r.integers(0, L))
            seq[p] = (seq[p] + 1) % 4
        if i % 2:
            seq = dna.reverse_complement(seq).astype(np.int8)
        reads.append(Fastq(f"r{i}", seq, np.full(L, 30, np.uint8)))
    return reads

al.align_batch(make_reads(0))  # warm-up/compile
batches = [make_reads(t + 1) for t in range(4)]
from collections import deque
from concurrent.futures import ThreadPoolExecutor
best = 0.0
with ThreadPoolExecutor(max_workers=1) as ex:
    for _ in range(3):
        t0 = time.perf_counter()
        futs = deque()
        for reads in batches:
            handle = al.align_batch_async(reads)
            # native bulk SAM text emit (byte-identical to the object
            # path; finish_batch_lines falls back automatically)
            futs.append(ex.submit(al.finish_batch_lines, handle))
            while len(futs) > 2:
                futs.popleft().result()
        while futs:
            futs.popleft().result()
        best = max(best, len(batches) * B / (time.perf_counter() - t0))
out = {"reads_per_s_1chip": round(best),
       "reads_config": "150bp x 4096/batch, 1Mbp genome, end-to-end SAM "
                       "text, 3-stage prep/device/assemble pipeline"}

# graph engine: variant graph of a 200 kb genome, reads along its paths,
# reference-default seed params (cmd/gsw/gsw.go:53-57: -i 32 -w 32)
from gonomics_tpu.graph import variant_graph
from gonomics_tpu.gsw_tpu import TpuGswAligner
from gonomics_tpu.io.vcf import Vcf

g_len = 200_000
ref = rng.integers(0, 4, g_len).astype(np.int8)
vcfs = []
for pos in range(1000, g_len - 1000, 4000):
    vcfs.append(Vcf(chrom="chr1", pos=pos, id=".",
                    ref=dna.to_string(ref[pos - 1:pos]),
                    alt=[dna.to_string((ref[pos - 1:pos] + 1) % 4)],
                    info="SVTYPE=SNP"))
g = variant_graph([Fasta("chr1", ref)], {"chr1": vcfs})
aligner = TpuGswAligner(g)

GB, GL = 2048, 150
def graph_reads(seed):
    r = np.random.default_rng(seed)
    reads = []
    for i in range(GB):
        s = int(r.integers(0, g_len - GL))
        seq = ref[s:s + GL].copy()
        seq[int(r.integers(0, GL))] = (seq[int(r.integers(0, GL))] + 1) % 4
        if i % 2:
            seq = dna.reverse_complement(seq).astype(np.int8)
        reads.append(to_big(Fastq(f"g{i}", seq, np.full(GL, 30, np.uint8))))
    return reads

for w in (0, 3):  # warm-up/compile; sticky DP-shape buckets settle
    aligner.align_batch(graph_reads(w))
gbatches = [graph_reads(s) for s in (4, 5, 6, 7)]
best = 0.0
with ThreadPoolExecutor(max_workers=1) as gex:
    for _ in range(3):
        t0 = time.perf_counter()
        futs = deque()
        for reads in gbatches:
            h = aligner.align_batch_async(reads)
            futs.append(gex.submit(aligner.finish_batch, h))
            while len(futs) > 1:
                futs.popleft().result()
        while futs:
            futs.popleft().result()
        best = max(best, len(gbatches) * GB / (time.perf_counter() - t0))
out["graph_reads_per_s"] = round(best, 1)
out["graph_config"] = ("150bp x 2048/batch, 200kb variant graph (50 SNP "
                       "nodes), giraf, seed 32 step 32 (gsw defaults), "
                       "2-deep pipelined")
print(json.dumps(out))
""", timeout=1800)


def stage_genome_scale() -> dict:
    """>=100 Mbp proof: index build time + peak RSS + steady reads/s."""
    return _stage(r"""
import json, resource, time
import numpy as np
from gonomics_tpu import dna
from gonomics_tpu.io.fasta import Fasta
from gonomics_tpu.io.fastq import Fastq
from gonomics_tpu.tpu_align import TpuReadAligner

rng = np.random.default_rng(0)
G, B, L = 100_000_000, 4096, 150
genome = rng.integers(0, 4, G).astype(np.int8)
t0 = time.perf_counter()
al = TpuReadAligner([Fasta("chr1", genome)])
build_s = time.perf_counter() - t0

def make_reads(seed):
    r = np.random.default_rng(seed)
    starts = r.integers(0, G - L, B)
    reads = []
    for i, s in enumerate(starts):
        seq = genome[s:s + L].copy()
        seq[int(r.integers(0, L))] = (seq[int(r.integers(0, L))] + 1) % 4
        if i % 2:
            seq = dna.reverse_complement(seq).astype(np.int8)
        reads.append(Fastq(f"r{i}", seq, np.full(L, 30, np.uint8)))
    return reads

sams = al.align_batch(make_reads(0))  # warm-up/compile
mapped = sum(1 for s in sams if not s.flag & 4)
batches = [make_reads(t + 1) for t in range(3)]
rps = 0.0
for _ in range(2):  # best-of-2 steady passes (tunnel/cache variance)
    t0 = time.perf_counter()
    pending = None
    for reads in batches:
        handle = al.align_batch_async(reads)
        if pending is not None:
            al.finish_batch_lines(pending)
        pending = handle
    al.finish_batch_lines(pending)
    rps = max(rps, len(batches) * B / (time.perf_counter() - t0))
rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(json.dumps({
    "genome100mb_reads_per_s": round(rps),
    "genome100mb_index_build_s": round(build_s, 1),
    "genome100mb_peak_rss_gb": round(rss, 2),
    "genome100mb_mapped_frac": round(mapped / B, 3),
    "genome100mb_config": "100 Mbp synthetic, 150bp x 4096/batch"}))
""", timeout=1800)


def stage_genome_1gb() -> dict:
    """1 Gbp scale proof (round 5): the sparse two-level index
    (step-sampled positions + uint16 remainders, ~0.75 B/bp) replaces
    the dense (code, pos) table that projected to ~190 GB at 3 Gbp."""
    return _stage(r"""
import json, resource, time
import numpy as np
from gonomics_tpu import dna
from gonomics_tpu.io.fasta import Fasta
from gonomics_tpu.io.fastq import Fastq
from gonomics_tpu.tpu_align import TpuReadAligner

rng = np.random.default_rng(0)
G, B, L = 1_000_000_000, 4096, 150
genome = rng.integers(0, 4, G, dtype=np.int8)

def make_reads(seed):
    r = np.random.default_rng(seed)
    starts = r.integers(0, G - L, B)
    reads = []
    for i, s in enumerate(starts):
        seq = genome[s:s + L].copy()
        seq[int(r.integers(0, L))] = (seq[int(r.integers(0, L))] + 1) % 4
        if i % 2:
            seq = dna.reverse_complement(seq).astype(np.int8)
        reads.append(Fastq(f"r{i}", seq, np.full(L, 30, np.uint8)))
    return reads

all_reads = [make_reads(t) for t in range(4)]
t0 = time.perf_counter()
al = TpuReadAligner([Fasta("chr1", genome)], index_mode="sparse",
                    index_step=8)
build_s = time.perf_counter() - t0
del genome  # the aligner holds its own copy; drop the harness's

sams = al.align_batch(all_reads[0])  # warm-up/compile
mapped = sum(1 for s in sams if not s.flag & 4)
rps = 0.0
for _ in range(2):  # best-of-2 steady passes (tunnel/cache variance)
    t0 = time.perf_counter()
    pending = None
    for reads in all_reads[1:]:
        handle = al.align_batch_async(reads)
        if pending is not None:
            al.finish_batch_lines(pending)
        pending = handle
    al.finish_batch_lines(pending)
    rps = max(rps, (len(all_reads) - 1) * B / (time.perf_counter() - t0))
rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
print(json.dumps({
    "genome1gb_reads_per_s": round(rps),
    "genome1gb_index_build_s": round(build_s, 1),
    "genome1gb_peak_rss_gb": round(rss, 2),
    "genome1gb_bytes_per_bp": round(rss, 2),
    "genome1gb_mapped_frac": round(mapped / B, 3),
    "genome1gb_config": "1 Gbp synthetic, 150bp x 4096/batch, sparse "
                        "two-level index (step 8, ~0.75 B/bp index; "
                        "peak incl. build transients + 1 B/bp genome)"}))
""", timeout=1800)


def stage_fa_find_fast() -> dict:
    """faFindFast windows/s (BASELINE cfg 3) vs the C++ incremental-scan
    baseline (host stage: this path is vectorized numpy)."""
    try:
        exe = _build("fafindfast_baseline")
        out = subprocess.run([exe, "2000000", "1000", "5", "0", "1"],
                             check=True, capture_output=True, text=True,
                             timeout=300)
        base_wps = float(out.stdout.split()[0])
        out = subprocess.run([exe, "2000000", "1000", "5", "0",
                              str(NPROC)], check=True,
                             capture_output=True, text=True, timeout=300)
        base_wps_mt = float(out.stdout.split()[0])

        import io as _io

        import numpy as np

        from gonomics_tpu.cli.fa_find_fast import speedy_window_difference

        rng = np.random.default_rng(0)
        n, w = 2_000_000, 1000
        a = rng.integers(0, 4, n).astype(np.int8)
        b = np.where(rng.random(n) < 0.02,
                     rng.integers(0, 4, n), a).astype(np.int8)

        def run():
            speedy_window_difference(
                a, a, b, window_size=w, ref_chrom_name="chr1",
                remove_n=False, long_output=False,
                divergence_rate=sys.float_info.max, output_aln_pos=False,
                gc_content=False, out=_io.BytesIO())

        run()  # warm-up
        wps = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            reps = 5
            for _ in range(reps):
                run()
            wps = max(wps, reps * (n - w + 1) / (time.perf_counter() - t0))
        return {"fafindfast_windows_per_s": round(wps),
                "fafindfast_baseline_windows_per_s": round(base_wps),
                "fafindfast_baseline_allcores_windows_per_s":
                    round(base_wps_mt),
                "fafindfast_vs_baseline": round(wps / base_wps_mt, 2),
                "fafindfast_vs_baseline_1t": round(wps / base_wps, 2),
                "fafindfast_config": "2 Mbp pair, window 1000 (BASELINE cfg 3)"}
    except Exception as e:  # noqa: BLE001
        return {"fafindfast_error": str(e)[-300:]}


def stage_compress() -> dict:
    """Write-path compression: native parallel block gzip (pgzip-class,
    fileio.easy_create / BGZF writer) vs single-thread stdlib zlib."""
    try:
        import gzip as _gz

        import numpy as np

        from gonomics_tpu import native

        data = np.random.default_rng(0).integers(
            33, 120, 40_000_000).astype(np.uint8).tobytes()
        native.compress_blocks(data[:1 << 20], bgzf=False)  # warm pool
        best = 0.0
        for _ in range(3):
            t0 = time.perf_counter()
            comp = native.compress_blocks(data, bgzf=False)
            best = max(best, 40.0 / (time.perf_counter() - t0))
        if comp is None:
            return {"compress_error": "native lib unavailable"}
        t0 = time.perf_counter()
        _gz.compress(data, compresslevel=6)
        base = 40.0 / (time.perf_counter() - t0)
        ncpu = os.cpu_count() or 1
        return {"compress_write_mb_s": round(best, 1),
                "compress_baseline_mb_s": round(base, 1),
                "compress_baseline_allcores_mb_s_projected":
                    round(base * ncpu, 1),
                "compress_vs_baseline": round(best / base, 2),
                "compress_vs_baseline_allcores_projected":
                    round(best / (base * ncpu), 2),
                "compress_config": "40 MB text, level 6, multi-member "
                                   "gzip blocks across all cores; "
                                   "allcores baseline = 1-thread zlib x "
                                   "nproc (no pigz on host, perfect-"
                                   "scaling projection)"}
    except Exception as e:  # noqa: BLE001
        return {"compress_error": str(e)[-300:]}


def stage_call_variants() -> dict:
    """pileup+callVariants sites/s (BASELINE cfg 5): simulateSam reads at
    ~25x over 200 kb, tumor/normal -> VCF, vs the C++ pileup+Fisher
    baseline (which pays no SAM parsing — favoring the baseline)."""
    try:
        exe = _build("callvariants_baseline")
        out = subprocess.run([exe, "200000", "34000", "150", "0", "1"],
                             check=True, capture_output=True, text=True,
                             timeout=600)
        base_sps = float(out.stdout.split()[0])
        out = subprocess.run([exe, "200000", "34000", "150", "0",
                              str(NPROC)], check=True,
                             capture_output=True, text=True, timeout=600)
        base_sps_mt = float(out.stdout.split()[0])

        import contextlib
        import io as _io
        import tempfile

        import numpy as np

        from gonomics_tpu import dna
        from gonomics_tpu.cli.call_variants import call_variants
        from gonomics_tpu.io import sam as samio
        from gonomics_tpu.io.fai import create_index, write_index
        from gonomics_tpu.simulate import illumina_paired_sam

        d = tempfile.mkdtemp()
        rng = np.random.default_rng(0)
        G = 200_000
        ref = rng.integers(0, 4, G).astype(np.int8)
        with open(f"{d}/ref.fa", "w") as fh:
            fh.write(">chr1\n")
            for i in range(0, G, 60):
                fh.write(dna.to_string(ref[i:i + 60]) + "\n")
        write_index(create_index(f"{d}/ref.fa"), f"{d}/ref.fa.fai")
        header = samio.Header()
        header.text = ["@HD\tVN:1.6\tSO:coordinate",
                       f"@SQ\tSN:chr1\tLN:{G}"]
        from gonomics_tpu.io.chrom_info import ChromInfo
        header.chroms = [ChromInfo("chr1", G, 0)]
        header.sort_order = ["coordinate"]
        for name in ("tumor", "normal"):
            recs = illumina_paired_sam("chr1", ref, 8500, 150, 400, 50,
                                       0.005, rng)
            recs.sort(key=lambda s: s.pos)
            samio.write_sam(f"{d}/{name}.sam", header, recs)

        sites = 0
        dt = 1e9
        for rep in range(6):  # rep 0 = warm-up (native lib load, page
            t0 = time.perf_counter()  # cache); timed like other stages
            buf = _io.StringIO()
            with contextlib.redirect_stderr(buf):
                call_variants([f"{d}/tumor.sam"], [f"{d}/normal.sam"],
                              f"{d}/ref.fa", os.devnull)
            if rep:
                dt = min(dt, time.perf_counter() - t0)
            for tok in buf.getvalue().split():
                if tok.isdigit():
                    sites = int(tok)
                    break
        sps = sites / dt if sites else None
        return {"callvariants_sites_per_s": round(sps) if sps else None,
                "callvariants_baseline_sites_per_s": round(base_sps),
                "callvariants_baseline_allcores_sites_per_s":
                    round(base_sps_mt),
                "callvariants_vs_baseline":
                    round(sps / base_sps_mt, 2) if sps else None,
                "callvariants_vs_baseline_1t":
                    round(sps / base_sps, 2) if sps else None,
                "callvariants_config":
                    "200kb, ~25x simulateSam tumor/normal -> VCF "
                    "(BASELINE cfg 5; baseline pays no SAM parse)"}
    except Exception as e:  # noqa: BLE001
        return {"callvariants_error": str(e)[-300:]}


def stage_multichip_model() -> dict:
    """Multi-chip evidence chain (VERDICT r4 weak item 4): (a) measured
    host-stage throughput vs thread count — the premise that prep/emit
    scale with host cores; (b) measured per-stage walls (prep, device,
    emit) at the production batch shape; (c) the 8-chip projection with
    its arithmetic in the artifact, not a sentence."""
    return _stage(r"""
import json, time
import numpy as np
import jax
from gonomics_tpu import dna, native
from gonomics_tpu.io.fasta import Fasta
from gonomics_tpu.io.fastq import Fastq
from gonomics_tpu.tpu_align import TpuReadAligner

rng = np.random.default_rng(0)
G, B, L = 1_000_000, 4096, 150
genome = rng.integers(0, 4, G, dtype=np.int8)
al = TpuReadAligner([Fasta("chr1", genome)])
reads = []
r = np.random.default_rng(1)
for i in range(B):
    s = int(r.integers(0, G - L))
    seq = genome[s:s + L].copy()
    seq[int(r.integers(0, L))] = (seq[int(r.integers(0, L))] + 1) % 4
    if i % 2:
        seq = dna.reverse_complement(seq).astype(np.int8)
    reads.append(Fastq(f"r{i}", seq, np.full(L, 30, np.uint8)))
al.align_batch(reads)  # warm-up/compile

# (a) prep hot pass (seed+vote) thread scaling
fwd = np.stack([x.seq for x in reads])
rev = dna.complement(fwd[:, ::-1]).astype(np.int8)
offs = np.linspace(0, L - al.k, al.read_kmers).astype(np.int64)
def t_prep(nt):
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        native.seed_vote(fwd, rev, offs, al.k, al.idx_codes, al.idx_pos,
                         al.max_hits, nthreads=nt)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3
p1, p2 = t_prep(1), t_prep(2)

# emit hot pass (walk->cigars) thread scaling
h = al.align_batch_async(reads)
buf = np.asarray(jax.device_get(h[5]))
meta = np.ascontiguousarray(buf[:, :20]).view(np.int32)
score, i_end, i0 = meta[:, 0], meta[:, 1], meta[:, 3]
packed = buf[:, 20:]
lens_ = np.asarray(h[3])
mapped = (score >= al.min_score) & (np.asarray(h[1].votes) > 0)
walk_d = h[6]
def t_emit(nt):
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        native.walk_to_cigars(packed[:B], walk_d, i0, i_end, lens_,
                              mapped.copy(), nthreads=nt)
        best = min(best, time.perf_counter() - t0)
    return best * 1e3
e1, e2 = t_emit(1), t_emit(2)

# (b) per-stage walls at the production batch shape
prep_ms = device_ms = emit_ms = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    h = al.align_batch_async(reads)
    t1 = time.perf_counter()
    np.asarray(jax.device_get(h[5]))
    t2 = time.perf_counter()
    al.finish_batch_lines(h)
    t3 = time.perf_counter()
    prep_ms = min(prep_ms, (t1 - t0) * 1e3)
    device_ms = min(device_ms, (t2 - t1) * 1e3)
    emit_ms = min(emit_ms, (t3 - t2) * 1e3)

# (c) projection arithmetic, carried in the artifact:
#   host CPU-ms per batch H ~= (prep + emit) * 2 cores on this box;
#   production v5e host = 8 chips + 112 vCPU, so an 8-chip step is
#   max(8H / 112, device_ms) per 8 batches; efficiency vs the pipelined
#   1-chip step max(H/112, device_ms).
H = (prep_ms + emit_ms) * 2
t1c = max(H / 112, device_ms)
t8c = max(8 * H / 112, device_ms)
eff = t1c / t8c
print(json.dumps({
    "prep_seedvote_ms_1t": round(p1, 1),
    "prep_seedvote_ms_2t": round(p2, 1),
    "prep_thread_scaling": round(p1 / p2, 2),
    "emit_walkcigars_ms_1t": round(e1, 1),
    "emit_walkcigars_ms_2t": round(e2, 1),
    "emit_thread_scaling": round(e1 / e2, 2),
    "stage_prep_ms": round(prep_ms, 1),
    "stage_device_ms": round(device_ms, 1),
    "stage_emit_ms": round(emit_ms, 1),
    "batch": B,
    "projection": {
        "host_cpu_ms_per_batch": round(H, 1),
        "formula": "eff = max(H/112, device) / max(8*H/112, device); "
                   "H = (prep+emit)*2 cores, 112 vCPU per v5e host",
        "onechip_step_ms": round(t1c, 1),
        "eightchip_step_ms_per_8_batches": round(t8c, 1),
        "projected_8chip_efficiency": round(eff, 2),
        "projected_8chip_reads_per_s": round(8 * B / t8c * 1e3)}}))
""", timeout=1200)


def stage_multichip() -> dict:
    """Sharded-vs-single equality + reads/s on an 8-device VIRTUAL CPU
    mesh (pallas interpreted — a correctness/scaling-shape check, not
    silicon perf). Real multi-chip hardware is unavailable here."""
    code = r"""
import os, sys, time
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS","")
    + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
from gonomics_tpu import dna
from gonomics_tpu.io.fasta import Fasta
from gonomics_tpu.io.fastq import Fastq
from gonomics_tpu.parallel import make_mesh
from gonomics_tpu.tpu_align import TpuReadAligner

rng = np.random.default_rng(0)
genome = rng.integers(0, 4, 50000).astype(np.int8)
B, L = 128, 100
reads = []
for i in range(B):
    s = int(rng.integers(0, len(genome) - L))
    seq = genome[s:s + L].copy()
    seq[int(rng.integers(0, L))] = (seq[int(rng.integers(0, L))] + 1) % 4
    if i % 2:
        seq = dna.reverse_complement(seq).astype(np.int8)
    reads.append(Fastq(f"r{i}", seq, np.full(L, 30, np.uint8)))

def rps(mesh, **kw):
    al = TpuReadAligner([Fasta("chr1", genome)], mesh=mesh, **kw)
    out = al.align_batch(reads)  # warm-up/compile
    t0 = time.perf_counter()
    out = al.align_batch(reads)
    return [s.to_string() for s in out], B / (time.perf_counter() - t0)

single, r1 = rps(None)
sharded, r8 = rps(make_mesh(8, data=8, seq=1))
prefix, _ = rps(make_mesh(8, data=8, seq=1), index_sharding="prefix")
print("EQUAL" if single == sharded == prefix else "DIFFER",
      round(r1), round(r8))
"""
    try:
        out = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True, timeout=600,
                             cwd=HERE)
        tok = out.stdout.strip().split("\n")[-1].split()
        return {"sharded_equals_single": tok[0] == "EQUAL",
                "prefix_index_equals_single": tok[0] == "EQUAL",
                "reads_per_s_1dev_virtual_cpu": int(tok[1]),
                "reads_per_s_8dev_virtual_cpu": int(tok[2])}
    except (IndexError, ValueError):
        return {"sharded_equals_single": False,
                "error": out.stderr.strip()[-300:]}
    except subprocess.TimeoutExpired:
        return {"sharded_equals_single": False, "error": "timeout"}


def main() -> None:
    out = {
        "metric": "affine_gap_gcups",
        "value": None,
        "unit": "GCUPS",
        "vs_baseline": None,
        "baseline": "single-thread C++ Gotoh (Go-reference class), this host",
        "config": "B=256 pairs, 1024x1024, humanChimpTwo, score-only",
    }
    # baselines run single-thread AND all-cores (the reference's worker
    # pools use every core, cmd/gsw/gsw.go:59 -t default 4); headline
    # vs_baseline ratios are against ALL-CORES, with the single-thread
    # ratio reported alongside as *_1t
    base = base_mt = None
    try:
        exe = _build("affine_baseline")
        r = subprocess.run([exe, "1024", "1024", "40", "0", "1"],
                           check=True, capture_output=True, text=True,
                           timeout=300)
        base = float(r.stdout.strip())
        r = subprocess.run([exe, "1024", "1024", "40", "0", str(NPROC)],
                           check=True, capture_output=True, text=True,
                           timeout=300)
        base_mt = float(r.stdout.strip())
        out["baseline_gcups"] = round(base / 1e9, 3)
        out["baseline_allcores_gcups"] = round(base_mt / 1e9, 3)
    except Exception as e:  # noqa: BLE001
        out["baseline_error"] = str(e)[-200:]

    s = stage_score_stream()
    out.update(s)
    if "score_gcups" in s:
        out["value"] = s["score_gcups"]
        if base_mt is not None and base_mt > 0:
            out["vs_baseline"] = round(s["score_gcups"] * 1e9 / base_mt, 1)
        if base is not None and base > 0:
            out["vs_baseline_1t"] = round(s["score_gcups"] * 1e9 / base, 1)
        # fraction of the formulation's measured VPU ceiling (~95-100
        # GCUPS, PERF_NOTES "ceiling analysis") — emitted here so the
        # driver-visible artifact always carries the roofline context
        out["ceiling_gcups"] = 95
        out["ceiling_fraction"] = round(s["score_gcups"] / 95, 2)

    out.update(stage_trace())
    out.update(stage_lowmem())
    out.update(stage_reads())
    # gsw reads/s denominator (BASELINE.md measurement plan item 2):
    # single-thread C++ seed-and-extend with full traceback DPs, the
    # reference gsw hot-path class (genomeGraph/genomeGraph_test.go:57)
    try:
        exe = _build("gsw_baseline")
        r = subprocess.run([exe, "1000000", "8192", "150", "0", "1"],
                           check=True, capture_output=True, text=True,
                           timeout=300)
        base_rps = float(r.stdout.split()[0])
        r = subprocess.run([exe, "1000000", "8192", "150", "0",
                            str(NPROC)], check=True,
                           capture_output=True, text=True, timeout=300)
        base_rps_mt = float(r.stdout.split()[0])
        out["reads_baseline_per_s"] = round(base_rps)
        out["reads_baseline_allcores_per_s"] = round(base_rps_mt)
        if out.get("reads_per_s_1chip"):
            out["reads_vs_baseline"] = round(
                out["reads_per_s_1chip"] / base_rps_mt, 2)
            out["reads_vs_baseline_1t"] = round(
                out["reads_per_s_1chip"] / base_rps, 2)
    except Exception as e:  # noqa: BLE001
        out["reads_baseline_error"] = str(e)[-200:]
    out.update(stage_genome_scale())
    out.update(stage_genome_1gb())
    out.update(stage_fa_find_fast())
    out.update(stage_call_variants())
    out.update(stage_compress())
    out["multichip"] = stage_multichip()
    out["multichip"].update(stage_multichip_model())
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
