"""cigarToBed — affine-gap align two fastas and emit ins/del beds
(reference: cmd/cigarToBed/cigarToBed.go).

Parity note: the reference's deletion pass re-uses the insertion
condition (M followed by I, cigarToBed.go:121) — reproduced verbatim so
outputs match byte for byte."""

from __future__ import annotations

import argparse
import sys

from .. import dna, fileio
from ..align import COL_D, COL_I, COL_M, HUMAN_CHIMP_TWO, affine_gap
from ..align import go_format, view
from ..io import bed as bedio
from ..io import fasta as fastaio


def cigar_to_bed(file_one: str, file_two: str, *, out_fa: str = "",
                 ins_bed_out: str = "ins.bed", del_bed_out: str = "del.bed",
                 first_pos_ins: int = 1, first_pos_del: int = 1,
                 chrom: str = "chr1", backend: str = "auto",
                 out=sys.stdout) -> None:
    recs_one, recs_two = fastaio.read(file_one), fastaio.read(file_two)
    if not recs_one or not recs_two:
        raise SystemExit("error, unable to read .fa files")
    if len(recs_one) > 1 or len(recs_two) > 1:
        raise SystemExit("multiple sequnces detected in .fa files")
    fa_one, fa_two = recs_one[0], recs_two[0]
    fa_one.seq = dna.to_upper(fa_one.seq)
    fa_two.seq = dna.to_upper(fa_two.seq)

    best_score, aln = affine_gap(fa_one.seq, fa_two.seq, HUMAN_CHIMP_TWO,
                                 -600, -150, backend=backend)
    out.write(f"Using AffineGap, Alignment score is {best_score}, cigar "
              f"is {go_format(aln)} \n")

    with fileio.easy_create(ins_bed_out) as ins:
        current = first_pos_ins - 1
        for i in range(len(aln) - 1):
            if aln[i].op == COL_M and aln[i + 1].op == COL_I:
                start = current + aln[i].run_length + 1
                bedio.write_to_handle(ins, bedio.Bed(
                    chrom=chrom, chrom_start=start,
                    chrom_end=start + aln[i + 1].run_length, name="ins",
                    fields_initialized=4))
            if aln[i].op != COL_D:
                current += aln[i].run_length

    with fileio.easy_create(del_bed_out) as dl:
        current = first_pos_del - 1
        for i in range(len(aln) - 1):
            if aln[i].op == COL_M and aln[i + 1].op == COL_I:
                start = current + aln[i].run_length
                bedio.write_to_handle(dl, bedio.Bed(
                    chrom=chrom, chrom_start=start, chrom_end=start + 1,
                    name="del", fields_initialized=4))
            if aln[i].op != COL_I:
                current += aln[i].run_length

    visualize = view(fa_one.seq, fa_two.seq, aln)
    out.write(visualize + "\n")
    if out_fa:
        rows = visualize.split("\n")
        with open(out_fa, "w") as f:
            f.write(f">{fa_one.name}\n{rows[0]}\n"
                    f">{fa_two.name}\n{rows[1]}\n")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="cigarToBed")
    p.add_argument("target")
    p.add_argument("query")
    p.add_argument("-faOut", default="")
    p.add_argument("-insBedOut", default="ins.bed")
    p.add_argument("-delBedOut", default="del.bed")
    p.add_argument("-FirstPos_Ins", type=int, default=1)
    p.add_argument("-FirstPos_Del", type=int, default=1)
    p.add_argument("-Chr", default="chr1")
    p.add_argument("--backend", default="auto")
    a = p.parse_args(argv)
    cigar_to_bed(a.target, a.query, out_fa=a.faOut,
                 ins_bed_out=a.insBedOut, del_bed_out=a.delBedOut,
                 first_pos_ins=a.FirstPos_Ins, first_pos_del=a.FirstPos_Del,
                 chrom=a.Chr, backend=a.backend)


if __name__ == "__main__":
    main()
