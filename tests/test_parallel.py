"""Multi-chip sharding tests on the 8-device virtual CPU mesh
(conftest.py forces xla_force_host_platform_device_count=8).

The contract (SURVEY.md P3 / BASELINE.json): sharded execution must be
byte-identical to single-device execution — batch order is the canonical
merge order regardless of mesh shape."""

import subprocess
import sys

import numpy as np
import pytest

import jax

from gonomics_tpu import dna, pileup as pileupmod
from gonomics_tpu.io import sam as samio
from gonomics_tpu.io.fasta import Fasta
from gonomics_tpu.io.fastq import Fastq
from gonomics_tpu.parallel import (make_mesh, merge_shard_files,
                                   pipeline_step, example_step_inputs)
from gonomics_tpu.tpu_align import TpuReadAligner

CALLVAR_TD = "/root/reference/cmd/callVariants/testdata"


def _make_reads(genome, n_reads, read_len, seed=0):
    rng = np.random.default_rng(seed)
    reads = []
    for i in range(n_reads):
        start = int(rng.integers(0, len(genome) - read_len))
        seq = genome[start:start + read_len].copy()
        p = int(rng.integers(0, read_len))
        seq[p] = (seq[p] + 1) % 4
        if i % 2:
            seq = dna.reverse_complement(seq).astype(np.int8)
        reads.append(Fastq(f"r{i}", seq,
                           np.full(read_len, 30, np.uint8)))
    return reads


def test_sharded_align_matches_single_device():
    rng = np.random.default_rng(1)
    genome = rng.integers(0, 4, 20000).astype(np.int8)
    reads = _make_reads(genome, 24, 60)

    single = TpuReadAligner([Fasta("chr1", genome)], min_score=600)
    mesh = make_mesh(8, data=8, seq=1)
    sharded = TpuReadAligner([Fasta("chr1", genome)], min_score=600,
                             mesh=mesh)
    a = [s.to_string() for s in single.align_batch(reads)]
    b = [s.to_string() for s in sharded.align_batch(reads)]
    assert a == b
    assert any("\t0\tchr1\t" in s or "\t16\tchr1\t" in s for s in a)


def test_sharded_align_pairs_matches_single_device():
    rng = np.random.default_rng(2)
    genome = rng.integers(0, 4, 20000).astype(np.int8)
    reads = _make_reads(genome, 16, 50)
    pairs = list(zip(reads[0::2], reads[1::2]))

    single = TpuReadAligner([Fasta("chr1", genome)], min_score=500)
    mesh = make_mesh(4, data=4, seq=1)
    sharded = TpuReadAligner([Fasta("chr1", genome)], min_score=500,
                             mesh=mesh)
    a = [s.to_string() for s in single.align_pairs(pairs)]
    b = [s.to_string() for s in sharded.align_pairs(pairs)]
    assert a == b


def test_sharded_pileup_matches_host():
    header, reads = samio.read(f"{CALLVAR_TD}/human_chrM.bam")
    host = pileupmod.pileup(reads, header)
    mesh = make_mesh(8)  # (data=4, seq=2)
    dev = pileupmod.pileup(reads, header, mesh=mesh)
    assert len(host) == len(dev)
    for h, d in zip(host, dev):
        assert (h.ref_idx, h.pos) == (d.ref_idx, d.pos)
        assert (h.count_f == d.count_f).all()
        assert (h.count_r == d.count_r).all()
        assert h.ins_count_f == d.ins_count_f
        assert h.del_count_f == d.del_count_f


def test_pipeline_step_dryrun_shapes():
    # builder-owned version of the driver's dryrun_multichip check
    from gonomics_tpu.align.matrices import HUMAN_CHIMP_TWO

    mesh = make_mesh(8)
    B, n, m = 2 * mesh.shape["data"], 32, 32
    genome_len = 64 * mesh.shape["seq"]
    step = pipeline_step(mesh, n=n, m=m, genome_len=genome_len,
                         scores=HUMAN_CHIMP_TWO, gap_open=-600,
                         gap_extend=-150)
    args = example_step_inputs(mesh, B=B, n=n, m=m, genome_len=genome_len)
    scores, counts = step(*args)
    jax.block_until_ready((scores, counts))
    assert scores.shape[0] == B
    assert counts.shape == (genome_len, 13)


def test_merge_shard_files_roundrobin(tmp_path):
    # two shards, round-robin batches: 0,2 on shard0; 1,3 on shard1
    s0 = tmp_path / "out.shard0"
    s1 = tmp_path / "out.shard1"
    s0.write_text("r0\nr1\n#BATCH\nr4\n#BATCH\n")
    s1.write_text("r2\nr3\n#BATCH\nr5\n#BATCH\n")
    out = tmp_path / "out.sam"
    merge_shard_files(str(out), [str(s0), str(s1)], header_lines=["@HD"])
    assert out.read_text() == "@HD\nr0\nr1\nr2\nr3\nr4\nr5\n"


def test_init_distributed_single_process():
    # jax.distributed.initialize in a throwaway subprocess (global state)
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "from gonomics_tpu.parallel import init_distributed\n"
        "init_distributed('127.0.0.1:12421', 1, 0)\n"
        "assert jax.process_count() == 1\n"
        "print('DIST_OK')\n"
    )
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, timeout=120, cwd="/root/repo")
    assert "DIST_OK" in r.stdout, r.stderr


def test_shard_seq_affine_score_matches_oracle():
    # SURVEY §5 long-context design: lane-sharded wavefront, one ppermute
    # halo per diagonal, validated against the numpy oracle on the
    # 8-virtual-device mesh (all 8 devices on the "seq" axis)
    from gonomics_tpu.align import oracle
    from gonomics_tpu.align.matrices import HUMAN_CHIMP_TWO
    from gonomics_tpu.parallel import shard_seq_affine_score

    mesh = make_mesh(8, data=1, seq=8)
    rng = np.random.default_rng(11)
    n, m = 40, 52
    lens = [(40, 52), (33, 29), (40, 1), (7, 52)]
    B = len(lens)
    alpha = np.full((B, n), 4, np.int8)
    beta = np.full((B, m), 4, np.int8)
    fin = np.zeros((B, 1), np.int32)
    nv = np.zeros((B, 1), np.int32)
    pairs = []
    for b, (nb, mb) in enumerate(lens):
        a = rng.integers(0, 4, nb).astype(np.int8)
        bb = rng.integers(0, 4, mb).astype(np.int8)
        alpha[b, :nb] = a
        beta[b, :mb] = bb
        fin[b, 0] = nb + mb
        nv[b, 0] = nb
        pairs.append((a, bb))
    fn = shard_seq_affine_score(mesh, HUMAN_CHIMP_TWO, n=n, m=m,
                                gap_open=-600, gap_extend=-150)
    got = np.asarray(fn(alpha, beta, fin, nv))
    want = [oracle.affine_gap(a, b, HUMAN_CHIMP_TWO, -600, -150)[0]
            for a, b in pairs]
    assert got.tolist() == want


def test_prefix_sharded_index_matches_replicated():
    # SURVEY P3: prefix-sharded (code, pos) table + psum candidate merge
    # must be byte-identical to the replicated host index
    rng = np.random.default_rng(6)
    genome = rng.integers(0, 4, 30000).astype(np.int8)
    reads = _make_reads(genome, 24, 60)
    mesh = make_mesh(8, data=8, seq=1)
    repl = TpuReadAligner([Fasta("chr1", genome)], min_score=600,
                          mesh=mesh)
    pref = TpuReadAligner([Fasta("chr1", genome)], min_score=600,
                          mesh=mesh, index_sharding="prefix")
    a = [s.to_string() for s in repl.align_batch(reads)]
    b = [s.to_string() for s in pref.align_batch(reads)]
    assert a == b
    assert any("\tchr1\t" in s for s in a)


def test_split_index_prefix_boundaries():
    from gonomics_tpu.tpu_align import (_PAD_CODE, build_seed_index,
                                        split_index_prefix)

    rng = np.random.default_rng(7)
    # tandem repeats make long equal-code runs that must not straddle
    unit = rng.integers(0, 4, 30).astype(np.int8)
    genome = np.concatenate([np.tile(unit, 40),
                             rng.integers(0, 4, 2000).astype(np.int8)])
    codes, pos = build_seed_index(genome, 21)
    ck, ps = split_index_prefix(codes, pos, 4)
    flat = ck.ravel()
    real = flat[flat != _PAD_CODE]
    assert len(real) == len(codes)
    # chunk boundaries never split an equal-code run
    for i in range(3):
        row, nxt = ck[i], ck[i + 1]
        last = row[row != _PAD_CODE]
        first = nxt[nxt != _PAD_CODE]
        if len(last) and len(first):
            assert last[-1] != first[0]
