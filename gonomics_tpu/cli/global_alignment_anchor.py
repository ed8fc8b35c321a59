"""globalAlignmentAnchor — anchor-and-fill pairwise genome alignment
(reference: cmd/globalAlignmentAnchor/globalAlignmentAnchor.go).

Filters a pairwise maf for trusted same-chromosome (optionally
near-diagonal) matches, derives the unaligned gap intervals between them,
and affine-gap-aligns each gap pair (humanChimpTwo, -600/-150)."""

from __future__ import annotations

import argparse
import sys

from .. import dna, fileio
from ..align import pairwise
from ..align.cigar import COL_D, COL_I, COL_M, Cigar
from ..align.matrices import HUMAN_CHIMP_TWO
from ..io import bed as bedio, fasta as fastaio, maf as mafio
from ..io.bed import Bed

GAP_SIZE_BIG_MULTIPLE_LIMIT = 100.0


def _cigar_go_v(aln: list[Cigar]) -> str:
    """Go %v of []align.Cigar: [{run op} {run op} ...]."""
    return "[" + " ".join(f"{{{c.run_length} {c.op}}}" for c in aln) + "]"


def _write_alignment(out, b1: Bed, b2: Bed, score: int,
                     aln: list[Cigar]) -> None:
    out.write(f"{b1.to_string()}\t{b2.to_string()}\t{score}\t"
              f"{_cigar_go_v(aln)}\n")


def _make_chr_map(filename: str) -> dict[str, list[str]]:
    chr_map: dict[str, list[str]] = {}
    for line in fileio.read(filename):
        w = line.split("\t")
        if len(w) != 2:
            raise SystemExit("chrMap did not have 2 columns.")
        chr_map.setdefault(w[0], []).append(w[1])
    return chr_map


def _match_maf_pass(chrom1: str, chrom2: str, src_size1: int,
                    src_size2: int, start1: int, start2: int,
                    chr_map, diagonal: bool) -> bool:
    """matchMafPass (globalAlignmentAnchor.go:51)."""
    if chrom2 not in chr_map.get(chrom1, []):
        return False
    if diagonal:
        if (start2 <= start1 - 0.05 * src_size1
                or start2 >= start1 + 0.05 * src_size1):
            return False
        if (start1 <= start2 - 0.05 * src_size2
                or start1 >= start2 + 0.05 * src_size2):
            return False
    return True


def _gap_bed_pass(pos1: int, start1: int, end1: int, pos2: int,
                  start2: int, end2: int, limit: int):
    """gapBedPass (globalAlignmentAnchor.go:83), quirks intact (the
    diagonal rescue compares ChromEnd2 against 1.05*ChromEnd2)."""
    passed = True
    name1, name2 = "species1_gap", "species2_gap"
    gap1 = end1 - start1
    gap2 = end2 - start2
    big1 = end1 - pos1
    big2 = end2 - pos2
    product = gap1 * gap2
    # Go: float64(big2 / big1) — integer division truncating toward zero
    multiple = float(int(big2 / big1)) if big1 != 0 else 0.0

    if gap1 > 0 and gap2 == 0:
        name1, name2 = "species1_Insertion", "species2_gap_size0"
    elif gap1 == 0 and gap2 > 0:
        name1, name2 = "species1_gap_size0", "species2_Insertion"
    elif not (gap1 > 0 and gap2 > 0):
        passed = False
        name1 = "species1_gap,doNotCalculate_invalidChromStartOrChromEnd"
        name2 = "species2_gap,doNotCalculate_invalidChromStartOrChromEnd"
    elif multiple > GAP_SIZE_BIG_MULTIPLE_LIMIT:
        passed = False
        name1 = "species1_gap,doNotCalculate_largeGapSizeMultiple"
        name2 = "species2_gap,doNotCalculate_largeGapSizeMultiple"
        if (start2 >= 0.95 * start1 and start2 <= 1.05 * start1
                and end2 >= 0.95 * end1 and end2 <= 1.05 * end2):
            passed = True
            name1 = "species1_gap_largeGapSize_diagonal"
            name2 = "species2_gap_largeGapSize_diagonal"

    if product > limit:
        passed = False
        name1 += ",doNotCalculate_largeGapSizeProduct"
        name2 += ",doNotCalculate_largeGapSizeProduct"
    return passed, name1, name2


def _maf_to_match(in_maf: str, sp1: str, sp2: str, prefix: str,
                  chr_map_file: str, diagonal: bool):
    """mafToMatch (globalAlignmentAnchor.go:139)."""
    records = mafio.read(in_maf)
    chr_map = _make_chr_map(chr_map_file)
    out1: list[Bed] = []
    out2: list[Bed] = []
    with fileio.easy_create(prefix + ".filtered.maf") as out_maf:
        for m in records:
            asm1, chrom1 = mafio.src_to_assembly_and_chrom(m.species[0].src)
            b1 = Bed(chrom=chrom1, chrom_start=m.species[0].s_line.start
                     if m.species[0].s_line else 0,
                     chrom_end=(m.species[0].s_line.start
                                + m.species[0].s_line.size)
                     if m.species[0].s_line else 0,
                     name="species1_s_filtered_match", score=int(m.score),
                     fields_initialized=5)
            for k in range(1, len(m.species)):
                asm2, chrom2 = mafio.src_to_assembly_and_chrom(
                    m.species[k].src)
                if asm1 != sp1:
                    raise SystemExit("speciesOne was incorrect.")
                if m.species[k].s_line is not None and asm2 == sp2 and \
                        m.species[0].s_line is not None:
                    b2 = Bed(chrom=chrom2,
                             chrom_start=m.species[k].s_line.start,
                             chrom_end=(m.species[k].s_line.start
                                        + m.species[k].s_line.size),
                             name="species2_s_filtered_match",
                             score=int(m.score), fields_initialized=5)
                    if _match_maf_pass(
                            chrom1, chrom2, m.species[0].s_line.src_size,
                            m.species[k].s_line.src_size,
                            b1.chrom_start, b2.chrom_start, chr_map,
                            diagonal):
                        mafio.write_to_handle(out_maf, m)
                        out1.append(b1)
                        out2.append(b2)
    return out1, out2


def _match_to_gap(match1: list[Bed], match2: list[Bed], genome1: str,
                  genome2: str, limit: int):
    """matchToGap (globalAlignmentAnchor.go:196)."""
    fa1 = {r.name: r.seq for r in fastaio.read(genome1)}
    fa2 = {r.name: r.seq for r in fastaio.read(genome2)}
    chr_prev1 = chr_cur1 = match1[0].chrom
    chr_prev2 = chr_cur2 = match2[0].chrom
    pos1 = pos2 = 1
    out1: list[Bed] = []
    out2: list[Bed] = []

    def handle(b1: Bed, b2: Bed, new_pos1: int, new_pos2: int):
        nonlocal pos1, pos2
        passed, b1.name, b2.name = _gap_bed_pass(
            pos1, b1.chrom_start, b1.chrom_end, pos2, b2.chrom_start,
            b2.chrom_end, limit)
        if passed:
            out1.append(b1)
            out2.append(b2)
            if new_pos1 is not None:
                pos1, pos2 = new_pos1, new_pos2

    handle(Bed(chrom=chr_cur1, chrom_start=pos1,
               chrom_end=match1[0].chrom_start, name="species1_gap",
               fields_initialized=4),
           Bed(chrom=chr_cur2, chrom_start=pos2,
               chrom_end=match2[0].chrom_start, name="species2_gap",
               fields_initialized=4),
           match1[0].chrom_end, match2[0].chrom_end)

    for i in range(1, len(match1)):
        chr_cur1 = match1[i].chrom
        chr_cur2 = match2[i].chrom
        if chr_cur1 != chr_prev1:
            # finish off the previous chromosome (no position update)
            handle(Bed(chrom=chr_prev1, chrom_start=match1[i - 1].chrom_end,
                       chrom_end=len(fa1[chr_prev1]), name="species1_gap",
                       fields_initialized=4),
                   Bed(chrom=chr_prev2, chrom_start=match2[i - 1].chrom_end,
                       chrom_end=len(fa2[chr_prev2]), name="species2_gap",
                       fields_initialized=4), None, None)
            chr_prev1, chr_prev2 = chr_cur1, chr_cur2
            pos1 = pos2 = 1
            handle(Bed(chrom=chr_cur1, chrom_start=pos1,
                       chrom_end=match1[i].chrom_start,
                       name="species1_gap", fields_initialized=4),
                   Bed(chrom=chr_cur2, chrom_start=pos2,
                       chrom_end=match2[i].chrom_start,
                       name="species2_gap", fields_initialized=4),
                   match1[i].chrom_end, match2[i].chrom_end)
        else:
            handle(Bed(chrom=chr_cur1, chrom_start=match1[i - 1].chrom_end,
                       chrom_end=match1[i].chrom_start,
                       name="species1_gap", fields_initialized=4),
                   Bed(chrom=chr_cur2, chrom_start=match2[i - 1].chrom_end,
                       chrom_end=match2[i].chrom_start,
                       name="species2_gap", fields_initialized=4),
                   match1[i].chrom_end, match2[i].chrom_end)

    if pos1 < len(fa1[chr_prev1]) or pos2 < len(fa2[chr_prev2]):
        handle(Bed(chrom=chr_cur1, chrom_start=match1[-1].chrom_end,
                   chrom_end=len(fa1[chr_cur1]), name="species1_gap",
                   fields_initialized=4),
               Bed(chrom=chr_cur2, chrom_start=match2[-1].chrom_end,
                   chrom_end=len(fa2[chr_cur2]), name="species2_gap",
                   fields_initialized=4), None, None)
    return out1, out2


def _gap_to_alignment(gap1: list[Bed], gap2: list[Bed], genome1: str,
                      genome2: str, sp1: str, sp2: str,
                      prefix: str) -> None:
    """gapToAlignment (globalAlignmentAnchor.go:321)."""
    fa1 = {r.name: r.seq for r in fastaio.read(genome1)}
    fa2 = {r.name: r.seq for r in fastaio.read(genome2)}
    out_aln = fileio.easy_create(prefix + ".alignment.tsv")
    out1 = fileio.easy_create(f"{prefix}_{sp1}_alignment.bed")
    out2 = fileio.easy_create(f"{prefix}_{sp2}_alignment.bed")
    for b1, b2 in zip(gap1, gap2):
        if b1.name == "species1_Insertion":
            score = -600 + -150 * (b1.chrom_end - b1.chrom_start - 1)
            aln = [Cigar(b1.chrom_end - b1.chrom_start, COL_D)]
            _write_alignment(out_aln, b1, b2, score, aln)
            bedio.write_to_handle(out1, b1)
        elif b2.name == "species2_Insertion":
            score = -600 + -150 * (b2.chrom_end - b2.chrom_start - 1)
            aln = [Cigar(b2.chrom_end - b2.chrom_start, COL_I)]
            _write_alignment(out_aln, b1, b2, score, aln)
            bedio.write_to_handle(out2, b2)
        else:
            seq1 = dna.to_upper(fa1[b1.chrom][b1.chrom_start - 1:
                                              b1.chrom_end - 1])
            seq2 = dna.to_upper(fa2[b2.chrom][b2.chrom_start - 1:
                                              b2.chrom_end - 1])
            score, aln = pairwise.affine_gap(seq1, seq2, HUMAN_CHIMP_TWO,
                                             -600, -150, backend="numpy")
            _write_alignment(out_aln, b1, b2, score, aln)
            pos1 = b1.chrom_start
            pos2 = b2.chrom_start
            for c in aln:
                if c.op == COL_M:
                    bedio.write_to_handle(out1, Bed(
                        chrom=b1.chrom, chrom_start=pos1,
                        chrom_end=pos1 + c.run_length,
                        name="species1_Match", fields_initialized=4))
                    bedio.write_to_handle(out2, Bed(
                        chrom=b2.chrom, chrom_start=pos2,
                        chrom_end=pos2 + c.run_length,
                        name="species2_Match", fields_initialized=4))
                    pos1 += c.run_length
                    pos2 += c.run_length
                elif c.op == COL_I:
                    bedio.write_to_handle(out2, Bed(
                        chrom=b2.chrom, chrom_start=pos2,
                        chrom_end=pos2 + c.run_length,
                        name="species2_Insertion", fields_initialized=4))
                    pos2 += c.run_length
                else:
                    bedio.write_to_handle(out1, Bed(
                        chrom=b1.chrom, chrom_start=pos1,
                        chrom_end=pos1 + c.run_length,
                        name="species1_Insertion", fields_initialized=4))
                    pos1 += c.run_length
    out_aln.close()
    out1.close()
    out2.close()


def global_alignment_anchor(in_maf: str, sp1: str, sp2: str, genome1: str,
                            genome2: str, gap_size_product_limit: int,
                            chr_map_file: str, prefix: str,
                            diagonal: bool) -> None:
    if not prefix:
        prefix = in_maf[:-4] if in_maf.endswith(".maf") else in_maf
    m1, m2 = _maf_to_match(in_maf, sp1, sp2, prefix, chr_map_file, diagonal)
    g1, g2 = _match_to_gap(m1, m2, genome1, genome2,
                           gap_size_product_limit)
    _gap_to_alignment(g1, g2, genome1, genome2, sp1, sp2, prefix)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="globalAlignmentAnchor")
    p.add_argument("in_maf")
    p.add_argument("species1")
    p.add_argument("species2")
    p.add_argument("species1_genome")
    p.add_argument("species2_genome")
    p.add_argument("chrMap")
    p.add_argument("-outFilenamePrefix", default="")
    p.add_argument("-diagonal", default=True,
                   type=lambda s: s not in ("false", "0", "False"))
    a = p.parse_args(argv if argv is not None else sys.argv[1:])
    global_alignment_anchor(a.in_maf, a.species1, a.species2,
                            a.species1_genome, a.species2_genome,
                            10_000_000_000, a.chrMap,
                            a.outFilenamePrefix, a.diagonal)


if __name__ == "__main__":
    main()
