"""gsw — Graph-Smith-Waterman: align single or paired end fastqs.

Counterpart of /root/reference/cmd/gsw (gsw.go, pairedEndFastqs.go):
`gsw align [options] ref[.gg/.fa] R1.fastq [R2.fastq]` with giraf output,
or SAM when a liftover .sizes file is given (-l). Unlike the reference's
vestigial SAM path (whose node-note liftover is never populated,
toGiraf.go:152), the SAM projection here emits real linear coordinates.
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from .. import fileio, graph as graphmod
from ..align.matrices import BY_NAME, HUMAN_CHIMP_TWO
from ..gsw import GswAligner
from ..io import fasta, fastq as fastqio, giraf as girafio
from ..io import sam as samio
from ..io.chrom_info import read_to_slice


def _load_reference(path: str):
    if path.endswith(".gg") or path.endswith(".sg"):
        g = graphmod.read(path)
        return g, {n.id: str(n.id) for n in g.nodes}
    records = fasta.read(path)
    return graphmod.from_fasta(records)


def _select_matrix(name: str):
    if name in ("humanChimp", "humanChimpTwo"):
        return HUMAN_CHIMP_TWO
    if name in BY_NAME:
        return np.asarray(BY_NAME[name], np.int64)
    raise SystemExit(f"unknown score matrix: {name}")


def _align_tpu(args) -> None:
    """Batched TPU engine (tpu_align.py): .fa references, SAM output.

    --mesh shards each batch data-parallel over all local devices.
    --multihost initializes jax.distributed (TPU pod auto-detect): each
    process owns the round-robin batches b with b % nprocs == pid, writes
    them to <out>.shard<pid> with batch markers, and process 0 merges the
    shards back into canonical read order — byte-identical to one host
    (the deterministic merge of SURVEY.md P3; the reference's analog is
    goroutine fan-in, cmd/gsw/pairedEndFastqs.go:24-35)."""
    import jax

    from ..tpu_align import TpuReadAligner

    if args.files[0].endswith((".gg", ".sg")):
        _align_tpu_graph(args)
        return

    mesh = None
    if args.multihost:
        from ..parallel import init_distributed

        init_distributed()
    if args.mesh or args.multihost:
        from ..parallel import make_mesh

        mesh = make_mesh(data=len(jax.devices()), seq=1)

    records = fasta.read(args.files[0])
    al = TpuReadAligner(records, mesh=mesh,
                        index_sharding=args.index_sharding,
                        index_mode=args.index_mode,
                        index_step=args.index_step)
    nproc = jax.process_count()
    pid = jax.process_index()
    sharded_out = nproc > 1
    out_path = f"{args.out}.shard{pid}" if sharded_out else args.out
    out = fileio.easy_create(out_path)
    if not sharded_out:
        for line in al.header().text:
            out.write(line + "\n")

    import time

    t0 = time.perf_counter()
    n_done = 0

    def emit(sams) -> None:
        nonlocal n_done
        if isinstance(sams, str):  # native bulk-formatted SAM text
            out.write(sams)
            n_done += sams.count("\n")
        else:
            for s in sams:
                out.write(s.to_string() + "\n")
            n_done += len(sams)
        if sharded_out:
            out.write("#BATCH\n")
        _progress("gsw", n_done, t0)

    # 3-stage pipeline: batch i+1's host seeding (main thread) overlaps
    # batch i's device DP (async dispatch) AND batch i-1's SAM assembly
    # (worker thread); writes drain in order on the main thread, so
    # output stays deterministic (the channel-pipelining analog of
    # cmd/gsw/pairedEndFastqs.go:24-35)
    from collections import deque
    from concurrent.futures import ThreadPoolExecutor

    if len(args.files) == 3:
        r1 = fastqio.read(args.files[1])
        r2 = fastqio.read(args.files[2])
        inputs = [list(zip(r1[i:i + args.batch], r2[i:i + args.batch]))
                  for i in range(0, len(r1), args.batch)]
        dispatch, finish = al.align_pairs_async, al.finish_pairs
    else:
        reads = fastqio.read(args.files[1])
        inputs = [reads[i:i + args.batch]
                  for i in range(0, len(reads), args.batch)]
        dispatch, finish = al.align_batch_async, al.finish_batch_lines
    with ThreadPoolExecutor(max_workers=1) as ex:
        futs = deque()
        for bi, batch in enumerate(inputs):
            if sharded_out and bi % nproc != pid:
                continue
            handle = dispatch(batch)
            futs.append(ex.submit(finish, handle))
            while len(futs) > 2:
                emit(futs.popleft().result())
        while futs:
            emit(futs.popleft().result())
    _progress("gsw", n_done, t0, final=True)
    if out_path not in ("-", "/dev/stdout", "stdout"):
        out.close()
    if sharded_out:
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gsw_shards_written")
        if pid == 0:
            from ..parallel import merge_shard_files

            merge_shard_files(
                args.out,
                [f"{args.out}.shard{p}" for p in range(nproc)],
                header_lines=al.header().text)


def _align_tpu_graph(args) -> None:
    """Graph (.gg/.sg) references on the TPU engine: host DAG traversal
    + batched device extension DP (gsw_tpu.TpuGswAligner), bit-identical
    giraf/SAM output to the host engine."""
    import time

    from ..gsw_tpu import TpuGswAligner

    g, names = _load_reference(args.files[0])
    aligner = TpuGswAligner(g, seed_len=args.index, step_size=args.window,
                            scores=_select_matrix(args.matrix),
                            node_names=names)
    host = aligner.host
    paired = len(args.files) == 3
    to_sam = args.liftover.endswith(".sizes")

    out = fileio.easy_create(args.out)
    if to_sam:
        chroms = read_to_slice(args.liftover)
        for line in (["@HD\tVN:1.6\tSO:unsorted"]
                     + [f"@SQ\tSN:{c.name}\tLN:{c.size}" for c in chroms]):
            out.write(line + "\n")

    t0 = time.perf_counter()
    n_reads = 0
    if paired:
        pairs = fastqio.read_pairs_big(args.files[1], args.files[2])
        for i in range(0, len(pairs), args.batch):
            for a, b in aligner.align_pair_batch(pairs[i:i + args.batch]):
                if to_sam:
                    sa, sb = host.pair_to_sam(a, b)
                    out.write(sa.to_string() + "\n")
                    out.write(sb.to_string() + "\n")
                else:
                    out.write(girafio.to_string(a) + "\n")
                    out.write(girafio.to_string(b) + "\n")
            n_reads += 2 * len(pairs[i:i + args.batch])
            _progress("gsw", n_reads, t0)
    else:
        reads = [fastqio.to_big(fq) for fq in fastqio.read(args.files[1])]
        for i in range(0, len(reads), args.batch):
            for a in aligner.align_batch(reads[i:i + args.batch]):
                a.flag = host._giraf_flags(a)
                if to_sam:
                    out.write(host.giraf_to_sam(a).to_string() + "\n")
                else:
                    out.write(girafio.to_string(a) + "\n")
            n_reads += len(reads[i:i + args.batch])
            _progress("gsw", n_reads, t0)
    if args.out not in ("-", "/dev/stdout", "stdout"):
        out.close()
    _progress("gsw", n_reads, t0, final=True)


def _progress(tool: str, n: int, t0: float, final: bool = False) -> None:
    """Per-stage reads/s + wall-clock line, the reference's pipeline
    summary (cmd/gsw/pairedEndFastqs.go:69-72,
    genomeGraph/genomeGraph_test.go:57)."""
    import sys as _sys
    import time as _time

    dt = max(_time.perf_counter() - t0, 1e-9)
    tag = "finished" if final else "progress"
    print(f"{tool}: {tag} {n} reads in {dt:.1f}s ({n / dt:.0f} reads/s)",
          file=_sys.stderr)


def align_cmd(args) -> None:
    if args.engine == "tpu":
        _align_tpu(args)
        return
    ref_path = args.files[0]
    g, names = _load_reference(ref_path)
    aligner = GswAligner(g, seed_len=args.index, step_size=args.window,
                         scores=_select_matrix(args.matrix),
                         node_names=names)
    paired = len(args.files) == 3
    to_sam = args.liftover.endswith(".sizes")

    out = fileio.easy_create(args.out)
    if to_sam:
        chroms = read_to_slice(args.liftover)
        header = samio.Header()
        header.text = ["@HD\tVN:1.6\tSO:unsorted"] + [
            f"@SQ\tSN:{c.name}\tLN:{c.size}" for c in chroms]
        for line in header.text:
            out.write(line + "\n")

    if paired:
        pairs = fastqio.read_pairs_big(args.files[1], args.files[2])
        for fwd, rev in pairs:
            a, b = aligner.align_pair(fwd, rev)
            if to_sam:
                sa, sb = aligner.pair_to_sam(a, b)
                out.write(sa.to_string() + "\n")
                out.write(sb.to_string() + "\n")
            else:
                out.write(girafio.to_string(a) + "\n")
                out.write(girafio.to_string(b) + "\n")
    else:
        reads = [fastqio.to_big(fq) for fq in fastqio.read(args.files[1])]
        for fq in reads:
            a = aligner.align_read(fq)
            a.flag = aligner._giraf_flags(a)
            if to_sam:
                out.write(aligner.giraf_to_sam(a).to_string() + "\n")
            else:
                out.write(girafio.to_string(a) + "\n")
    if args.out not in ("-", "/dev/stdout", "stdout"):
        out.close()


def _filter_vcf_pos(vcfs):
    """gsw filterVcfPos (cmd/gsw/chainHelper.go:100): sort, dedupe by
    position per chromosome keeping the first record, drop records whose
    ref/alt bases contain N. Chromosomes iterate in first-seen order (the
    reference iterates a Go map — nondeterministic there)."""
    from ..io import vcf as vcfio

    vcfs = list(vcfs)
    vcfio.sort(vcfs)
    by_chrom: dict[str, list] = {}
    for v in vcfs:
        by_chrom.setdefault(v.chrom, []).append(v)
    answer = []
    for chrom in by_chrom:
        encountered = set()
        for v in by_chrom[chrom]:
            if v.pos in encountered:
                continue
            encountered.add(v.pos)
            from .. import dna

            ref = dna.from_string(v.ref)
            contains_n = (ref == dna.N).any()
            for alt in v.alt:
                if (dna.from_string(alt) == dna.N).any():
                    contains_n = True
            if not contains_n:
                answer.append(v)
    return answer


def _axts_to_vcfs(axts):
    """workThreadAxtVcf (chainHelper.go:85): per-block filterVcfPos then
    drop records containing N characters."""
    from ..io.formats import axt_to_vcf

    out = []
    for a in axts:
        for v in _filter_vcf_pos(axt_to_vcf(a)):
            if "N" not in v.ref and "N" not in v.alt[0]:
                out.append(v)
    return out


def _chains_to_axts(chain_file: str, target_fa: str, query_fa: str):
    """goChainToAxt (chainHelper.go:40): chain blocks + chromosome seqs
    -> axt records (chain.GoReadSeqChain + chain.ToAxt)."""
    from ..io.formats import chain_to_axt, read_chain

    chains, _ = read_chain(chain_file)
    tmap = {r.name: r.seq for r in fasta.read(target_fa)}
    qmap = {r.name: r.seq for r in fasta.read(query_fa)}
    return [chain_to_axt(c, tmap[c.t_name], qmap[c.q_name]) for c in chains]


def _vcf_to_genome_graph(vcf_file: str, fa_file: str):
    """vcfToGenomeGraph (cmd/gsw/vcfHelper.go:10)."""
    from ..io import vcf as vcfio

    records, _ = vcfio.read(vcf_file)
    by_chrom: dict[str, list] = {}
    for v in records:
        by_chrom.setdefault(v.chrom, []).append(v)
    return graphmod.variant_graph(fasta.read(fa_file), by_chrom)


def ggtools_cmd(args) -> None:
    """gsw ggtools (cmd/gsw/ggTools.go RunGgTools): create and convert
    genome graphs from chain / vcf / axt inputs."""
    from ..io import vcf as vcfio
    from ..io.formats import (axt_to_string, is_axt_file, is_chain_file,
                              read_axt)

    in_file = args.input
    if is_chain_file(in_file):
        if not args.target or not args.query:
            raise SystemExit("Error: Must specify both target and query "
                             "fasta files...")
        axts = _chains_to_axts(in_file, args.target, args.query)
        if args.format == "axt":
            with fileio.easy_create(args.out) as f:
                for a in axts:
                    # the reference never increments its idx counter
                    # (ggTools.go:66-70): every block is written as 0
                    f.write(axt_to_string(a, 0))
        elif args.format == "vcf":
            with fileio.easy_create(args.out) as f:
                vcfio.new_write_header(f, vcfio.new_header())
                for v in _axts_to_vcfs(axts):
                    vcfio.write_vcf(f, v)
        elif args.format == "gg":
            by_chrom: dict[str, list] = {}
            for v in _axts_to_vcfs(axts):
                by_chrom.setdefault(v.chrom, []).append(v)
            g = graphmod.variant_graph(fasta.read(args.target), by_chrom)
            graphmod.write(args.out, g)
        else:
            raise SystemExit(f"unsupported chain output format: "
                             f"{args.format}")
    elif vcfio.is_vcf_file(in_file):
        if not args.target:
            raise SystemExit("Error: Must specify target reference fasta "
                             "file...")
        graphmod.write(args.out, _vcf_to_genome_graph(in_file, args.target))
    elif is_axt_file(in_file):
        axts = read_axt(in_file)
        if args.format == "vcf":
            ans = _axts_to_vcfs(axts)
            vcfio.sort(ans)
            with fileio.easy_create(args.out) as f:
                vcfio.new_write_header(f, vcfio.new_header())
                for v in ans:
                    vcfio.write_vcf(f, v)
        elif args.format == "gg":
            by_chrom = {}
            for v in _axts_to_vcfs(axts):
                by_chrom.setdefault(v.chrom, []).append(v)
            g = graphmod.variant_graph(fasta.read(args.target), by_chrom)
            graphmod.write(args.out, g)
        else:
            raise SystemExit(f"unsupported axt output format: {args.format}")
    else:
        raise SystemExit(f"unrecognized input file type: {in_file}")


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    p = argparse.ArgumentParser(prog="gsw")
    sub = p.add_subparsers(dest="cmd", required=True)
    al = sub.add_parser("align", help="Graph-Smith-Waterman: align single "
                                      "or paired end fastqs")
    al.add_argument("files", nargs="+",
                    help="ref[.gg/.fa] R1.fastq [R2.fastq]")
    al.add_argument("-i", "--index", type=int, default=32)
    al.add_argument("-w", "--window", type=int, default=32)
    al.add_argument("-t", "--threads", type=int, default=4)
    al.add_argument("-m", "--matrix", default="humanChimp")
    al.add_argument("-l", "--liftover", default="")
    al.add_argument("-o", "--out", default="/dev/stdout")
    al.add_argument("--engine", default="host", choices=["host", "tpu"],
                    help="host: reference-faithful engine (giraf); "
                         "tpu: batched device aligner (SAM, .fa refs)")
    al.add_argument("--batch", type=int, default=2048,
                    help="TPU engine batch size")
    al.add_argument("--index-mode", default="dense",
                    choices=["dense", "sparse"],
                    help="seed index: dense (code,pos) table, or the "
                         "sparse genome-scale two-level table "
                         "(step-sampled positions, ~6/step B/bp — for "
                         "Gbp-class references)")
    al.add_argument("--index-step", type=int, default=8,
                    help="genome sampling step of the sparse index")
    al.add_argument("--index-sharding", default="replicated",
                    choices=["replicated", "prefix"],
                    help="tpu engine: k-mer index layout; prefix shards "
                         "the sorted (code,pos) table over the mesh "
                         "data axis (byte-identical output)")
    al.add_argument("--mesh", action="store_true",
                    help="tpu engine: shard batches data-parallel over "
                         "all local devices")
    al.add_argument("--multihost", action="store_true",
                    help="tpu engine: jax.distributed multi-host run; "
                         "process 0 merges shard outputs canonically")
    al.add_argument("--profile", default="",
                    help="write a jax.profiler trace to this directory "
                         "(the reference's opt-in pprof flag analog, "
                         "cmd/faFindFast/faFindFast.go:122)")
    gg = sub.add_parser("ggtools", help="Genomic utilities to create, "
                        "manipulate and operate on genome graphs")
    gg.add_argument("input", help="input file [.chain/.vcf/.axt]")
    gg.add_argument("-t", "--target", default="",
                    help="Target reference fasta file")
    gg.add_argument("-q", "--query", default="",
                    help="Query fasta file (chain inputs)")
    gg.add_argument("-f", "--format", default="",
                    help="Output format for conversions [axt/vcf/gg]")
    gg.add_argument("-o", "--out", default="/dev/stdout")
    a = p.parse_args(argv)
    if a.cmd == "align":
        if getattr(a, "profile", ""):
            import jax.profiler

            with jax.profiler.trace(a.profile):
                align_cmd(a)
        else:
            align_cmd(a)
    elif a.cmd == "ggtools":
        ggtools_cmd(a)


if __name__ == "__main__":
    main()
