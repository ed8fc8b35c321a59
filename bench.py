#!/usr/bin/env python
"""Headline benchmark: affine-gap DP throughput (GCUPS) on one TPU chip.

Prints ONE JSON line:
  {"metric": "affine_gap_gcups", "value": N, "unit": "GCUPS",
   "vs_baseline": N, ...}

vs_baseline compares against a single-threaded C++ Gotoh DP compiled at
bench time (native/affine_baseline.cpp) — the performance class of the
reference Go align.AffineGap (no Go toolchain on this machine; see
BASELINE.md "Measurement plan").

Timing note: block_until_ready is unreliable over the axon tunnel and a
sync fetch costs ~30ms RTT, so device time is measured by running chains
of data-dependent kernel calls and differencing two chain lengths.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def measure_baseline() -> float:
    """Single-thread C++ affine DP cells/s."""
    here = os.path.dirname(os.path.abspath(__file__))
    src = os.path.join(here, "native", "affine_baseline.cpp")
    exe = os.path.join(here, "native", "affine_baseline")
    if not os.path.exists(exe) or os.path.getmtime(exe) < os.path.getmtime(src):
        subprocess.run(["g++", "-O2", "-o", exe, src], check=True)
    out = subprocess.run([exe, "1024", "1024", "40"], check=True,
                         capture_output=True, text=True)
    return float(out.stdout.strip())


def check_compiled_parity(B: int = 8, L: int = 96) -> None:
    """Compiled-TPU kernel scores must equal the numpy oracle before any
    timing (a miscompile must not ship a fast-but-wrong number)."""
    import numpy as np
    import jax

    from gonomics_tpu.align.matrices import HUMAN_CHIMP_TWO
    from gonomics_tpu.align import oracle
    from gonomics_tpu.ops.wavefront import wavefront_align

    rng = np.random.default_rng(7)
    alpha = rng.integers(0, 4, (B, L)).astype(np.int8)
    beta = rng.integers(0, 4, (B, L)).astype(np.int8)
    fin = np.full((B, 1), 2 * L, np.int32)
    res = np.asarray(jax.device_get(wavefront_align(
        alpha, beta, fin, HUMAN_CHIMP_TWO, n=L, m=L,
        gap_open=-600, gap_extend=-150, with_trace=False, mode="affine")))
    got = res[:, L]  # cell (n, m) lives at s=n on diagonal n+m
    for b in range(B):
        want, _ = oracle.affine_gap(alpha[b], beta[b], HUMAN_CHIMP_TWO,
                                    -600, -150)
        assert got[b] == want, f"device/oracle mismatch: {got[b]} != {want}"


def measure_tpu(B: int = 256, L: int = 1024, with_trace: bool = False) -> float:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from gonomics_tpu.align.matrices import HUMAN_CHIMP_TWO
    from gonomics_tpu.ops.wavefront import wavefront_align

    rng = np.random.default_rng(0)
    alpha = jnp.asarray(rng.integers(0, 4, (B, L)), jnp.int8)
    beta = jnp.asarray(rng.integers(0, 4, (B, L)), jnp.int8)
    fin = jnp.full((B, 1), 2 * L, jnp.int32)

    def chain(k, alpha):
        res = None
        for _ in range(k):
            res = wavefront_align(alpha, beta, fin, HUMAN_CHIMP_TWO, n=L, m=L,
                                  gap_open=-600, gap_extend=-150,
                                  with_trace=with_trace, mode="affine")
            if with_trace:
                res = res[0]
            # data dependency serializes successive kernel calls on-device
            alpha = jnp.clip(jnp.abs(res[:, :L]) % 4, 0, 3).astype(jnp.int8)
        return res

    np.asarray(chain(1, alpha))  # warm-up/compile

    def timed(k: int) -> float:
        t0 = time.perf_counter()
        np.asarray(chain(k, alpha))
        return time.perf_counter() - t0

    short, long_ = (2, 10) if with_trace else (2, 34)
    t_short = min(timed(short) for _ in range(3))
    t_long = min(timed(long_) for _ in range(3))
    dt = (t_long - t_short) / (long_ - short)
    return B * L * L / dt


def measure_reads_per_s(B: int = 2048, L: int = 150,
                        genome_len: int = 1_000_000) -> float:
    """End-to-end batched read alignment (seed + vote + device DP +
    on-device traceback + SAM assembly), reads/s steady-state."""
    import numpy as np

    from gonomics_tpu import dna
    from gonomics_tpu.io.fasta import Fasta
    from gonomics_tpu.io.fastq import Fastq
    from gonomics_tpu.tpu_align import TpuReadAligner

    rng = np.random.default_rng(0)
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
    # double-buffered steady state — the gsw CLI's actual pipeline
    # (batch i+1 host prep overlaps batch i device DP)
    batches = [make_reads(t + 1) for t in range(4)]
    best = 0.0
    for _ in range(2):
        t0 = time.perf_counter()
        pending = None
        for reads in batches:
            handle = al.align_batch_async(reads)
            if pending is not None:
                al.finish_batch(pending)
            pending = handle
        al.finish_batch(pending)
        dt = time.perf_counter() - t0
        best = max(best, len(batches) * B / dt)
    return best


def measure_multichip_virtual() -> dict:
    """Sharded-vs-single equality + reads/s on an 8-device VIRTUAL CPU
    mesh (subprocess; pallas interpreted — a correctness/scaling-shape
    check, not silicon perf). Real multi-chip hardware is unavailable on
    this machine (BASELINE.md)."""
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

def rps(mesh):
    al = TpuReadAligner([Fasta("chr1", genome)], mesh=mesh)
    out = al.align_batch(reads)  # warm-up/compile
    t0 = time.perf_counter()
    out = al.align_batch(reads)
    return [s.to_string() for s in out], B / (time.perf_counter() - t0)

single, r1 = rps(None)
sharded, r8 = rps(make_mesh(8, data=8, seq=1))
print("EQUAL" if single == sharded else "DIFFER", round(r1), round(r8))
"""
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, timeout=420,
                         cwd=os.path.dirname(os.path.abspath(__file__)))
    try:
        tok = out.stdout.strip().split("\n")[-1].split()
        return {"sharded_equals_single": tok[0] == "EQUAL",
                "reads_per_s_1dev_virtual_cpu": int(tok[1]),
                "reads_per_s_8dev_virtual_cpu": int(tok[2])}
    except (IndexError, ValueError):
        return {"sharded_equals_single": False,
                "error": out.stderr.strip()[-300:]}


def main() -> None:
    # Each stage is fenced: one failure (e.g. a wedged TPU tunnel or a
    # compile regression) must not cost the whole JSON line.
    out = {
        "metric": "affine_gap_gcups",
        "value": None,
        "unit": "GCUPS",
        "vs_baseline": None,
        "baseline": "single-thread C++ Gotoh (Go-reference class), this host",
        "config": "B=256 pairs, 1024x1024, humanChimpTwo, score-only",
    }
    base = None
    try:
        base = measure_baseline()
        out["baseline_gcups"] = round(base / 1e9, 3)
    except Exception as e:  # noqa: BLE001
        out["baseline_error"] = str(e)[-200:]
    try:
        check_compiled_parity()
        out["compiled_parity"] = "device scores == numpy oracle (B=8, L=96)"
        tpu = measure_tpu()
        out["value"] = round(tpu / 1e9, 2)
        if base:
            out["vs_baseline"] = round(tpu / base, 1)
    except Exception as e:  # noqa: BLE001
        out["tpu_error"] = str(e)[-300:]
    try:
        tpu_trace = measure_tpu(B=128, with_trace=True)
        out["trace_gcups"] = round(tpu_trace / 1e9, 2)
        out["trace_config"] = "B=128, 1024x1024, with traceback (BASELINE cfg 2)"
    except Exception as e:  # noqa: BLE001
        out["trace_error"] = str(e)[-300:]
    try:
        rps = measure_reads_per_s()
        out["reads_per_s_1chip"] = round(rps)
        out["reads_config"] = "150bp x 2048/batch, 1Mbp genome, end-to-end SAM"
    except Exception as e:  # noqa: BLE001
        out["reads_error"] = str(e)[-300:]
    try:
        out["multichip"] = measure_multichip_virtual()
    except Exception as e:  # noqa: BLE001
        out["multichip"] = {"error": str(e)[-300:]}
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
