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
    """Batched TPU engine (tpu_align.py): .fa references, SAM output."""
    from ..io.sam import Header
    from ..tpu_align import TpuReadAligner

    records = fasta.read(args.files[0])
    al = TpuReadAligner(records)
    out = fileio.easy_create(args.out)
    for line in al.header().text:
        out.write(line + "\n")
    if len(args.files) == 3:
        r1 = fastqio.read(args.files[1])
        r2 = fastqio.read(args.files[2])
        for i in range(0, len(r1), args.batch):
            sams = al.align_pairs(list(zip(r1[i:i + args.batch],
                                           r2[i:i + args.batch])))
            for s in sams:
                out.write(s.to_string() + "\n")
    else:
        reads = fastqio.read(args.files[1])
        for i in range(0, len(reads), args.batch):
            for s in al.align_batch(reads[i:i + args.batch]):
                out.write(s.to_string() + "\n")
    if args.out not in ("-", "/dev/stdout", "stdout"):
        out.close()


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
    a = p.parse_args(argv)
    if a.cmd == "align":
        align_cmd(a)


if __name__ == "__main__":
    main()
