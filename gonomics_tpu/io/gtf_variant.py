"""Variant effect prediction over GTF gene models.

Counterpart of /root/reference/gtf/{variant,annotation}.go: classify a VCF
record against a gene's CDS structure (Silent/Missense/Nonsense/
Frameshift/Intronic/Splice/FarSplice/Intergenic) and emit the HGVS-style
GoEP annotation string. Ported with the reference's exact control flow,
including its Go-isms (the %s-of-slice alt rendering in the genomic
coordinate, the 0.4-offset AA-position rounding)."""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

from .. import codon, dna
from . import gtf as gtfio
from ..interval import IntervalIndex

STOP = codon.STOP

_AA3 = ["Ala", "Arg", "Asn", "Asp", "Cys", "Gln", "Glu", "Gly", "His",
        "Ile", "Leu", "Lys", "Met", "Phe", "Pro", "Ser", "Thr", "Trp",
        "Tyr", "Val", "Ter"]


def _aa3(a: int) -> str:
    return _AA3[a]


@dataclass
class VcfEffectPrediction:
    """gtf.vcfEffectPrediction (variant.go:13)."""
    chrom: str = ""
    pos: int = 0
    ref: str = ""
    alt: list[str] = field(default_factory=list)
    info: str = ""
    ref_id: str = ""
    gene: str = ""
    pos_strand: bool = True
    nearest_cds: gtfio.Cds | None = None
    cdna_pos: int = 0
    aa_pos: int = 0
    aa_ref: list[int] | None = None
    aa_alt: list[int] | None = None
    variant_type: str = ""
    next_transcript: "VcfEffectPrediction | None" = None


def genes_to_interval_tree(genes: dict[str, gtfio.Gene]) -> IntervalIndex:
    """gtf.GenesToIntervalTree (variant.go:28)."""
    gtfio.move_all_canonical_to_zero(genes)
    return IntervalIndex(list(genes.values()))


def vcf_to_variant(v, tree: IntervalIndex, seq: dict[str, np.ndarray],
                   all_transcripts: bool) -> VcfEffectPrediction:
    """gtf.VcfToVariant (variant.go:43)."""
    overlapping = tree.query(v, "any")
    if overlapping:
        return _vcf_to_variant(v, overlapping[0], seq, all_transcripts)
    return VcfEffectPrediction(chrom=v.chrom, pos=v.pos, ref=v.ref,
                               alt=list(v.alt), info=v.info)


def _new_pred(v, gene: gtfio.Gene, idx: int) -> VcfEffectPrediction:
    return VcfEffectPrediction(
        chrom=v.chrom, pos=v.pos, ref=v.ref, alt=list(v.alt), info=v.info,
        ref_id=gene.transcripts[idx].transcript_id, gene=gene.gene_id,
        pos_strand=gene.transcripts[idx].strand)


def _vcf_to_variant(v, gene: gtfio.Gene, seq, all_transcripts: bool):
    answer = _new_pred(v, gene, 0)
    _vcf_cds_intersect(v, gene, answer, 0)
    if answer.nearest_cds.start <= v.pos <= answer.nearest_cds.end:
        _find_aa_change(answer, seq)
    _add_variant_type(answer)
    if all_transcripts:
        prev = answer
        for i in range(1, len(gene.transcripts)):
            extra = _new_pred(v, gene, i)
            _vcf_cds_intersect(v, gene, extra, i)
            if extra.nearest_cds.start <= v.pos <= extra.nearest_cds.end:
                _find_aa_change(extra, seq)
            _add_variant_type(extra)
            prev.next_transcript = extra
            prev = extra
    return answer


def _vcf_cds_intersect(v, gene: gtfio.Gene, answer: VcfEffectPrediction,
                       t_idx: int) -> None:
    """vcfCdsIntersect (variant.go:99)."""
    exons = gene.transcripts[t_idx].exons
    cds_pos = 0
    if answer.pos_strand:
        for i, exon in enumerate(exons):
            if exon.cds is not None and v.pos > exon.cds.end:
                cds_pos += exon.cds.end - exon.cds.start + 1
                answer.nearest_cds = exon.cds
            elif exon.cds is not None and v.pos <= exon.cds.end:
                if v.pos < exon.cds.start:
                    if exon.cds.prev is None or \
                            exon.cds.start - v.pos < \
                            v.pos - exons[i - 1].cds.start:
                        answer.nearest_cds = exon.cds
                    else:
                        answer.nearest_cds = exons[i - 1].cds
                    break
                cds_pos += v.pos - exon.cds.start + 1
                answer.cdna_pos = cds_pos
                answer.nearest_cds = exon.cds
    else:
        n = len(exons)
        for i in range(n):
            exon = exons[n - 1 - i]
            if exon.cds is not None and v.pos < exon.cds.start:
                cds_pos += exon.cds.end - exon.cds.start + 1
                answer.nearest_cds = exon.cds
            elif exon.cds is not None and v.pos >= exon.cds.start:
                if v.pos > exon.cds.end:
                    if exon.cds.next is None or \
                            v.pos - exon.cds.end < \
                            exons[n - 1 - i + 1].cds.start - v.pos:
                        answer.nearest_cds = exon.cds
                    else:
                        answer.nearest_cds = exons[n - 1 - i + 1].cds
                    break
                cds_pos += exon.cds.end - v.pos + 1
                answer.cdna_pos = cds_pos
                answer.nearest_cds = exon.cds


def _translate(bases: list[int]) -> list[int]:
    return [int(a) for a in codon.translate_seq(np.array(bases, np.int8))]


def _determine_frame(v: VcfEffectPrediction) -> int:
    """determineFrame (variant.go:433)."""
    if v.pos_strand:
        return ((v.pos - v.nearest_cds.start) % 3
                + ((3 - v.nearest_cds.frame) % 3)) % 3
    return ((v.nearest_cds.end - v.pos) % 3
            + ((3 - v.nearest_cds.frame) % 3)) % 3


def _get_cds_dist(v: VcfEffectPrediction) -> int:
    if v.nearest_cds.start <= v.pos <= v.nearest_cds.end:
        return 0
    if v.pos < v.nearest_cds.start:
        return v.nearest_cds.start - v.pos
    return v.pos - v.nearest_cds.end


def _is_frameshift(v: VcfEffectPrediction) -> bool:
    """isFrameshift (variant.go:455)."""
    ref = dna.from_string(v.ref)
    alt = dna.from_string(v.alt[0])
    start = v.pos
    ref_end = start + len(ref) - 1
    start_offset = max(v.nearest_cds.start - start, 0)
    if ref_end <= v.nearest_cds.end:
        ref_in = len(ref) - start_offset
    else:
        ref_in = len(ref) - (ref_end - v.nearest_cds.end) - start_offset
    alt_in = len(alt) - start_offset
    return (alt_in - ref_in) % 3 != 0


def _is_nonsense(v: VcfEffectPrediction) -> bool:
    return any(a == STOP for a in (v.aa_alt or []))


def _is_synonymous(v: VcfEffectPrediction) -> bool:
    if len(v.aa_alt or []) != len(v.aa_ref or []) or \
            len(v.ref) != len(v.alt[0]):
        return False
    return all(r == a for r, a in zip(v.aa_ref, v.aa_alt))


def _add_variant_type(v: VcfEffectPrediction) -> None:
    cds_dist = _get_cds_dist(v)
    if v.gene == "":
        v.variant_type = "Intergenic"
    elif 0 < cds_dist <= 2:
        v.variant_type = "Splice"
    elif 0 < cds_dist <= 10:
        v.variant_type = "FarSplice"
    elif v.aa_ref is None:
        v.variant_type = "Intronic"
    elif _is_frameshift(v):
        v.variant_type = "Frameshift"
    elif _is_nonsense(v):
        v.variant_type = "Nonsense"
    elif v.aa_ref != v.aa_alt:
        v.variant_type = "Missense"
    else:
        v.variant_type = "Silent"


def _find_aa_change(variant: VcfEffectPrediction, seq) -> None:
    """findAAChange (variant.go:152) — pointer walk along the Cds chain,
    collecting whole codons around the variant."""
    chrom = seq[variant.chrom]
    ref = [int(b) for b in dna.from_string(variant.ref)]
    alt = [int(b) for b in dna.from_string(variant.alt[0])]
    ref_bases: list[int] = []
    alt_bases: list[int] = []
    seq_pos = variant.pos - 1
    curr = variant.nearest_cds
    aa_pos_offset = 0
    if variant.pos_strand:
        seq_pos -= _determine_frame(variant)
        duplicate_offset = 0
        duplicate_base_pos = 0
        if (len(ref) - len(alt)) % 3 == 0 and len(ref) > 1:
            has_dup = False
            duplicate_base_pos = 1
            j = 1
            while int(chrom[(variant.pos - 1) + (len(ref) - 1) + j]) == \
                    ref[duplicate_base_pos]:
                duplicate_offset += 1
                duplicate_base_pos += 1
                if duplicate_base_pos >= 3:
                    has_dup = True
                if duplicate_base_pos == len(ref):
                    duplicate_base_pos = 1
                j += 1
            if not has_dup:
                duplicate_offset = 0
                duplicate_base_pos = 0
            variant.cdna_pos += duplicate_offset
            variant.pos += duplicate_offset
            seq_pos = variant.pos - 1
            seq_pos -= _determine_frame(variant)

        while seq_pos < variant.pos - 1:
            if seq_pos < curr.start - 1:
                seq_pos = curr.prev.end - 1
                curr = curr.prev
            elif seq_pos > curr.end - 1:
                seq_pos = curr.next.start - 1
                curr = curr.next
                if seq_pos <= variant.pos - 1:
                    break
            ref_bases.append(int(chrom[seq_pos]))
            alt_bases.append(int(chrom[seq_pos]))
            seq_pos += 1
        if duplicate_offset > 0:
            ref_bases.extend(ref[duplicate_base_pos - 1:])
            if duplicate_base_pos - 1 > 0:
                ref_bases.extend(ref[1:duplicate_base_pos - 1])
                seq_pos -= len(ref[1:duplicate_base_pos - 1])
            alt_bases.extend(alt[1:])
        else:
            ref_bases.extend(ref)
            alt_bases.extend(alt)

        seq_pos += len(ref)

        alt_cds, alt_seq_pos = curr, seq_pos
        while len(alt_bases) % 3 != 0:
            if alt_seq_pos > alt_cds.end - 1:
                alt_seq_pos = alt_cds.next.start - 1
                alt_cds = alt_cds.next
            alt_bases.append(int(chrom[alt_seq_pos]))
            alt_seq_pos += 1
        ref_cds, ref_seq_pos = curr, seq_pos
        while len(ref_bases) % 3 != 0:
            if ref_seq_pos > ref_cds.end - 1:
                ref_seq_pos = ref_cds.next.start - 1
                ref_cds = ref_cds.next
            ref_bases.append(int(chrom[ref_seq_pos]))
            ref_seq_pos += 1
        variant.aa_ref = _translate(ref_bases)
        variant.aa_alt = _translate(alt_bases)

        if (len(ref) - len(alt)) % 3 != 0:
            while variant.aa_ref[0] == variant.aa_alt[0]:
                variant.aa_ref = variant.aa_ref[1:]
                variant.aa_alt = variant.aa_alt[1:]
                aa_pos_offset += 1
                if len(variant.aa_ref) == 0:
                    codon_to_add = []
                    for _ in range(3):
                        if ref_seq_pos > ref_cds.end - 1:
                            ref_seq_pos = ref_cds.next.start - 1
                            ref_cds = ref_cds.next
                        codon_to_add.append(int(chrom[ref_seq_pos]))
                        ref_seq_pos += 1
                    variant.aa_ref = variant.aa_ref \
                        + _translate(codon_to_add)
                if len(variant.aa_alt) == 0:
                    codon_to_add = []
                    for _ in range(3):
                        if alt_seq_pos > alt_cds.end - 1:
                            alt_seq_pos = alt_cds.next.start - 1
                            alt_cds = alt_cds.next
                        codon_to_add.append(int(chrom[alt_seq_pos]))
                        alt_seq_pos += 1
                    variant.aa_alt = variant.aa_alt \
                        + _translate(codon_to_add)

        if not _is_synonymous(variant) and len(variant.aa_ref) > 1:
            offset = 0
            while len(variant.aa_alt) > 0 and \
                    variant.aa_ref[0] == variant.aa_alt[0]:
                variant.aa_ref = variant.aa_ref[1:]
                variant.aa_alt = variant.aa_alt[1:]
                aa_pos_offset += 1
                if len(variant.aa_ref) == 0:
                    codon_to_add = []
                    for j in range(3):
                        if (seq_pos + offset) + j > curr.end - 1:
                            seq_pos = curr.next.start - 1
                            curr = curr.next
                        codon_to_add.append(int(chrom[(seq_pos + offset)
                                                      + j]))
                    variant.aa_ref = variant.aa_ref \
                        + _translate(codon_to_add)

        variant.aa_pos = int(_go_round(variant.cdna_pos / 3 + 0.4)) \
            + aa_pos_offset
    else:
        trim_aa = False
        seq_pos += _determine_frame(variant)
        len_offset = len(ref) - 1

        while (variant.pos - 1) + len_offset > seq_pos:
            seq_pos += 3
            trim_aa = True
            aa_pos_offset -= 1

        if seq_pos > curr.end - 1:
            seq_pos = (curr.next.start - 1) + \
                ((seq_pos - variant.pos) - (curr.end - variant.pos))
            curr = curr.next

        while seq_pos > (variant.pos - 1) + len_offset:
            if seq_pos < curr.start - 1:
                seq_pos = curr.prev.end - 1
                curr = curr.prev
                if seq_pos == (variant.pos - 1) + len_offset:
                    break
            elif seq_pos > curr.end - 1:
                seq_pos = curr.next.start - 1
                curr = curr.next
            ref_bases.append(int(chrom[seq_pos]))
            alt_bases.append(int(chrom[seq_pos]))
            seq_pos -= 1

        ref_bases.extend(reversed(ref))
        alt_bases.extend(reversed(alt))
        seq_pos -= len(ref)

        alt_cds, alt_seq_pos = curr, seq_pos
        while len(alt_bases) % 3 != 0:
            if alt_seq_pos < alt_cds.start - 1:
                alt_seq_pos = alt_cds.prev.end - 1
                alt_cds = alt_cds.prev
            alt_bases.append(int(chrom[alt_seq_pos]))
            alt_seq_pos -= 1
        ref_cds, ref_seq_pos = curr, seq_pos
        while len(ref_bases) % 3 != 0:
            if ref_seq_pos < ref_cds.start - 1:
                ref_seq_pos = ref_cds.prev.end - 1
                ref_cds = ref_cds.prev
            ref_bases.append(int(chrom[ref_seq_pos]))
            ref_seq_pos -= 1

        variant.aa_ref = _translate(_complement(ref_bases))
        variant.aa_alt = _translate(_complement(alt_bases))

        if trim_aa and (len(ref) - len(alt)) % 3 == 0 and \
                variant.aa_ref[-1] == variant.aa_alt[-1]:
            variant.aa_alt = variant.aa_alt[:-1]
            variant.aa_ref = variant.aa_ref[:-1]

        if not _is_synonymous(variant) and len(variant.aa_alt) > 1 and \
                len(variant.aa_ref) > 0:
            while len(variant.aa_ref) > 0 and len(variant.aa_alt) > 0 \
                    and variant.aa_ref[0] == variant.aa_alt[0]:
                if len(variant.aa_alt) > 1 and \
                        variant.aa_ref[0] == variant.aa_alt[-1] and \
                        (len(ref) - len(alt)) % 3 == 0:
                    variant.aa_ref = variant.aa_ref[1:]
                    variant.aa_alt = variant.aa_alt[1:]
                    aa_pos_offset += 1
                    break
                variant.aa_ref = variant.aa_ref[1:]
                variant.aa_alt = variant.aa_alt[1:]
                aa_pos_offset += 1
                if len(variant.aa_ref) == 0:
                    codon_to_add = []
                    for j in range(3):
                        if ref_seq_pos - j < curr.start - 1:
                            seq_pos = curr.prev.end - 1
                            curr = curr.prev
                        codon_to_add.append(int(chrom[ref_seq_pos - j]))
                    variant.aa_ref = variant.aa_ref \
                        + _translate(_complement(codon_to_add))
        elif not _is_synonymous(variant) and len(variant.aa_alt) == 1 \
                and len(variant.aa_ref) == 1 and \
                variant.aa_alt[0] == variant.aa_ref[0] and \
                len(ref) > len(alt):
            if trim_aa:
                ref_seq_pos += 3
            variant.aa_ref = variant.aa_ref[1:]
            variant.aa_alt = variant.aa_alt[1:]
            aa_pos_offset += 1
            codon_to_add = []
            for j in range(3):
                if ref_seq_pos - j < curr.start - 1:
                    seq_pos = curr.prev.end - 1
                    curr = curr.prev
                codon_to_add.append(int(chrom[ref_seq_pos - j]))
            variant.aa_ref = variant.aa_ref \
                + _translate(_complement(codon_to_add))

        if (len(ref) - len(alt)) % 3 != 0 and len(variant.aa_ref) > 0 \
                and len(variant.aa_alt) > 0 and \
                variant.aa_ref[0] == variant.aa_alt[0]:
            if trim_aa:
                trim_aa = False
                ref_seq_pos += 3
            variant.aa_ref = variant.aa_ref[1:]
            variant.aa_alt = variant.aa_alt[1:]
            aa_pos_offset += 1
            codon_to_add = []
            while len(codon_to_add) == 0 or len(codon_to_add) % 3 != 0:
                codon_to_add.append(int(chrom[ref_seq_pos]))
                ref_seq_pos -= 1
                if ref_seq_pos < ref_cds.start - 1:
                    ref_seq_pos = ref_cds.prev.end - 1
                    ref_cds = ref_cds.prev
            variant.aa_ref = variant.aa_ref \
                + _translate(_complement(codon_to_add))
            codon_to_add = []
            while len(codon_to_add) == 0 or len(codon_to_add) % 3 != 0:
                codon_to_add.append(int(chrom[alt_seq_pos]))
                alt_seq_pos -= 1
                if alt_seq_pos < alt_cds.start - 1:
                    alt_seq_pos = alt_cds.prev.end - 1
                    alt_cds = alt_cds.prev
            variant.aa_alt = variant.aa_alt \
                + _translate(_complement(codon_to_add))

        variant.aa_pos = int(_go_round(variant.cdna_pos / 3 + 0.4)) \
            + aa_pos_offset


def _complement(bases: list[int]) -> list[int]:
    comp = {dna.A: dna.T, dna.T: dna.A, dna.C: dna.G, dna.G: dna.C}
    return [comp.get(b, b) for b in bases]


def _go_round(x: float) -> float:
    """Go math.Round: half away from zero."""
    return math.floor(x + 0.5) if x >= 0 else math.ceil(x - 0.5)


# ---------------------------------------------------------------------------
# annotation rendering (annotation.go)
# ---------------------------------------------------------------------------

def variant_to_annotation(variant: VcfEffectPrediction, seq) -> str:
    """gtf.VariantToAnnotation (annotation.go:18)."""
    answer = ("GoEP=" + _genomic_str(variant) + "|" + variant.gene + "|"
              + _cdna_str(variant, seq) + "|"
              + _protein_str(variant, seq) + "|" + variant.variant_type)
    while variant.next_transcript is not None:
        variant = variant.next_transcript
        answer += ("|" + _cdna_str(variant, seq) + "|"
                   + _protein_str(variant, seq) + "|"
                   + variant.variant_type)
    return answer


def _genomic_str(v: VcfEffectPrediction) -> str:
    # Go prints v.Alt ([]string) with %s -> "[G]"
    return f"g.{v.chrom}:{v.pos}{v.ref}>[{' '.join(v.alt)}]"


def _cdna_str(v: VcfEffectPrediction, seq) -> str:
    if v.variant_type in ("Intronic", "Splice", "FarSplice"):
        return _non_coding_str(v, seq)
    return _coding_str(v, seq)


def _get_nearest_cds_pos(v: VcfEffectPrediction):
    """getNearestCdsPos (annotation.go:398)."""
    curr = v.nearest_cds
    if v.pos_strand:
        if v.pos < v.nearest_cds.start:
            pos = 1
        else:
            pos = v.nearest_cds.end - v.nearest_cds.start + 1
        while curr.prev is not None:
            curr = curr.prev
            pos += curr.end - curr.start + 1
        return pos, v.pos < v.nearest_cds.start
    if v.pos > v.nearest_cds.end:
        pos = 1
    else:
        pos = v.nearest_cds.end - v.nearest_cds.start + 1
    while curr.next is not None:
        curr = curr.next
        pos += curr.end - curr.start + 1
    return pos, v.pos > v.nearest_cds.end


def _is_duplication(v: VcfEffectPrediction, seq) -> bool:
    ref = dna.from_string(v.ref)
    alt = dna.from_string(v.alt[0])
    if len(ref) > len(alt):
        return False
    chrom = seq[v.chrom]
    seq_pos = v.pos - 1
    for i in range(len(alt)):
        if int(alt[i]) != int(chrom[seq_pos + i]):
            return False
    return True


def _revcomp_str(bases) -> str:
    return dna.to_string(dna.reverse_complement(np.asarray(bases,
                                                           np.int8)))


def _non_coding_str(v: VcfEffectPrediction, seq) -> str:
    """nonCodingToString (annotation.go:42)."""
    answer = v.ref_id + ":c."
    ref = dna.from_string(v.ref)
    alt = dna.from_string(v.alt[0])
    chrom = seq[v.chrom]
    cds_pos, start = _get_nearest_cds_pos(v)
    cds_dist = _get_cds_dist(v)
    if len(ref) == 1 and len(alt) == 1:
        if start:
            answer += f"{cds_pos}-{cds_dist}"
        else:
            answer += f"{cds_pos}+{cds_dist}"
        if v.pos_strand:
            answer += v.ref + ">" + ",".join(v.alt)
        else:
            answer += _revcomp_str(ref) + ">" + _revcomp_str(alt)
        return answer
    if len(ref) == 2 and len(alt) == 1:
        if v.pos_strand:
            dup = 0
            i = 1
            while int(chrom[v.pos + i]) == int(ref[1]):
                dup += 1
                i += 1
            if start:
                answer += f"{cds_pos}-{(cds_dist - 1) - dup}del"
            else:
                answer += f"{cds_pos}+{cds_dist + 1 + dup}del"
        else:
            if start:
                answer += f"{cds_pos}-{cds_dist + 1}del"
            else:
                answer += f"{cds_pos}+{cds_dist - 1}del"
        return answer
    if len(ref) > len(alt):
        if v.pos_strand:
            dup = 0
            i, j = 1, 1
            while int(chrom[(v.pos - 1) + (len(ref) - 1) + j]) == \
                    int(ref[i]):
                dup += 1
                i += 1
                if i == len(ref):
                    i = 1
                j += 1
            if start:
                answer += (f"{cds_pos}-{cds_dist - 1 - dup}_"
                           f"{cds_pos}-{cds_dist - (len(ref) - 1) - dup}"
                           f"del")
            else:
                answer += (f"{cds_pos}+{cds_dist + 1 + dup}_"
                           f"{cds_pos}+{cds_dist + (len(ref) - 1) + dup}"
                           f"del")
        else:
            if start:
                answer += (f"{cds_pos}-{cds_dist + len(ref) - 1}_"
                           f"{cds_pos}-{cds_dist + 1}del")
            else:
                if cds_dist - len(ref) + 1 <= 0:
                    answer += (f"{cds_pos + (cds_dist - len(ref) + 1)}_"
                               f"{cds_pos}+{cds_dist - 1}del")
                else:
                    answer += (f"{cds_pos}+{cds_dist - len(ref) + 1}_"
                               f"{cds_pos}+{cds_dist - 1}del")
        return answer
    if _is_duplication(v, seq):
        if len(alt) == 2:
            if v.pos_strand:
                dup = 0
                i = 1
                while int(chrom[v.pos + i]) == int(alt[1]):
                    dup += 1
                    i += 1
                if start:
                    answer += f"{cds_pos}-{cds_dist - 1 - dup}dup"
                else:
                    answer += f"{cds_pos}+{cds_dist + 1 + dup}dup"
            else:
                if start:
                    answer += f"{cds_pos}-{cds_dist + len(alt) - 1}dup"
                else:
                    answer += f"{cds_pos}+{cds_dist - 1}dup"
        else:
            if v.pos_strand:
                dup = 0
                i, j = 1, 1
                while int(chrom[(v.pos - 1) + j]) == int(alt[i]):
                    dup += 1
                    i += 1
                    if i == len(alt):
                        i = 1
                    j += 1
                if start:
                    answer += (f"{cds_pos}-"
                               f"{cds_dist - dup + (len(alt) - 1) - 1}_"
                               f"{cds_pos}-{cds_dist - dup}dup")
                else:
                    answer += (f"{cds_pos}+"
                               f"{cds_dist + (dup - (len(alt) - 1)) + 1}_"
                               f"{cds_pos}+{cds_dist + dup}dup")
            else:
                if start:
                    answer += (f"{cds_pos}-{cds_dist + len(alt) - 1}_"
                               f"{cds_pos}-{cds_dist + 1}dup")
                else:
                    answer += (f"{cds_pos}+{cds_dist - len(alt) + 1}_"
                               f"{cds_pos}+{cds_dist - 1}dup")
        return answer
    if len(alt) > len(ref):
        if v.pos_strand:
            dup = 0
            i, j = 1, 1
            while int(chrom[(v.pos - 1) + j]) == int(alt[i]):
                dup += 1
                i += 1
                if i == len(alt):
                    i = 1
                j += 1
            to_add = list(alt[len(ref):])
            if dup > 0:
                to_add = to_add[dup:] + to_add[:dup]
            ins = dna.to_string(np.array(to_add, np.int8))
            if start:
                answer += (f"{cds_pos}-{cds_dist + len(ref) - 1 - dup}_"
                           f"{cds_pos}-{cds_dist - 1 - dup}ins{ins}")
            else:
                answer += (f"{cds_pos}+{cds_dist + dup}_"
                           f"{cds_pos}+{cds_dist + 1 + dup}ins{ins}")
        else:
            ins = _revcomp_str(alt[len(ref):])
            if start:
                answer += (f"{cds_pos}-{cds_dist + 1}_"
                           f"{cds_pos}-{cds_dist + len(ref) - 1}ins{ins}")
            else:
                answer += (f"{cds_pos}+{cds_dist - 1}_"
                           f"{cds_pos}+{cds_dist - len(ref) + 1}ins{ins}")
        return answer
    return answer


def _coding_str(v: VcfEffectPrediction, seq) -> str:
    """codingToString (annotation.go:203)."""
    answer = v.ref_id + ":c."
    ref = dna.from_string(v.ref)
    alt = dna.from_string(v.alt[0])
    chrom = seq[v.chrom]
    cds_pos, _ = _get_nearest_cds_pos(v)
    if v.pos_strand:
        if len(ref) == 1 and len(alt) == 1:
            if v.cdna_pos != 0:
                answer += str(v.cdna_pos)
            answer += dna.to_string(ref) + ">" + dna.to_string(alt)
        elif len(ref) > len(alt):
            dup = 0
            i, j = 1, 1
            while int(chrom[(v.pos - 1) + (len(ref) - 1) + j]) == \
                    int(ref[i]):
                dup += 1
                i += 1
                if i == len(ref):
                    i = 1
                j += 1
            if len(ref) == 2:
                answer += f"{v.cdna_pos + len(alt) + dup}del"
            else:
                if v.cdna_pos + (len(ref) - 1) + dup > cds_pos:
                    answer += (f"{v.cdna_pos + 1 + dup}_{cds_pos}+"
                               f"{(v.cdna_pos + (len(ref) - 1) + dup) - cds_pos}del")
                else:
                    answer += (f"{v.cdna_pos + 1 + dup}_"
                               f"{v.cdna_pos + (len(ref) - 1) + dup}del")
        elif len(alt) > len(ref):
            if _is_duplication(v, seq):
                dup = 0
                i, j = 1, 1
                while int(chrom[(v.pos - 1) + (len(alt) - 1) + j]) == \
                        int(alt[i]):
                    dup += 1
                    i += 1
                    if i == len(alt):
                        i = 1
                    j += 1
                if len(alt) == 2:
                    answer += f"{v.cdna_pos + dup + 1}dup"
                else:
                    answer += (f"{v.cdna_pos + dup + 1}_"
                               f"{v.cdna_pos + dup + 1 + (len(alt) - 2)}"
                               f"dup")
            else:
                ins = dna.to_string(alt[1:])
                answer += f"{v.cdna_pos}_{v.cdna_pos + 1}ins{ins}"
    else:
        ref = dna.reverse_complement(ref).astype(np.int8)
        alt = dna.reverse_complement(alt).astype(np.int8)
        if len(ref) == 1 and len(alt) == 1:
            if v.cdna_pos != 0:
                answer += str(v.cdna_pos)
            answer += dna.to_string(ref) + ">" + dna.to_string(alt)
        elif len(ref) > len(alt):
            if len(ref) == 2:
                answer += f"{v.cdna_pos - len(alt)}del"
            else:
                answer += (f"{v.cdna_pos - (len(ref) - 1)}_"
                           f"{v.cdna_pos - 1}del")
        elif len(alt) > len(ref):
            if _is_duplication(v, seq):
                if len(alt) == 2:
                    answer += f"{v.cdna_pos - (len(alt) - 1)}dup"
                else:
                    answer += (f"{v.cdna_pos - (len(alt) - 1)}_"
                               f"{v.cdna_pos - 1}dup")
            else:
                ins = dna.to_string(alt[:len(alt) - 1])
                answer += f"{v.cdna_pos - 1}_{v.cdna_pos}ins{ins}"
    return answer


def _truncate_on_ter(a: list[int]) -> list[int]:
    for i, val in enumerate(a):
        if val == STOP:
            return a[:i + 1]
    return a


def _trim_synonymous(alpha: list[int], beta: list[int]):
    if len(alpha) > 1 and len(beta) > 1:
        for i in range(min(len(alpha), len(beta))):
            if alpha[i] != beta[i]:
                return alpha[i:], beta[i:]
    return alpha, beta


def _protein_str(v: VcfEffectPrediction, seq) -> str:
    """proteinToString (annotation.go:305)."""
    if v.variant_type not in ("Silent", "Missense", "Nonsense",
                              "Frameshift"):
        return ""
    answer = "p."
    if v.variant_type == "Missense" and len(v.aa_ref) == 0:
        if len(v.aa_alt) == 1:
            return answer + f"{_aa3(v.aa_alt[0])}{v.cdna_pos // 3}dup"
        return answer + (f"{_aa3(v.aa_alt[0])}{v.aa_pos}_"
                         f"{_aa3(v.aa_alt[-1])}"
                         f"{(v.cdna_pos // 3) + len(v.aa_alt)}dup")

    if v.variant_type == "Missense" and len(v.aa_alt) > 1 and \
            v.aa_ref[0] == v.aa_alt[-1]:
        if len(v.aa_alt) - 1 == 1:
            return answer + f"{_aa3(v.aa_alt[0])}{v.aa_pos - 1}dup"
        return answer + (f"{_aa3(v.aa_alt[0])}"
                         f"{v.aa_pos - (len(v.aa_alt) - 1)}_"
                         f"{_aa3(v.aa_alt[-2])}{v.aa_pos - 1}dup")

    if v.variant_type == "Missense" and len(v.aa_ref) == 1 and \
            len(v.aa_alt) == 0 and len(v.ref) > 3:
        return answer + f"{_aa3(v.aa_ref[0])}{v.cdna_pos // 3}del"

    v.aa_alt = _truncate_on_ter(v.aa_alt)
    v.aa_ref, v.aa_alt = _trim_synonymous(v.aa_ref, v.aa_alt)

    answer += f"{_aa3(v.aa_ref[0])}{v.aa_pos}"
    if v.variant_type == "Nonsense":
        return answer + "Ter"

    if len(v.aa_ref) > 1 and v.variant_type != "Frameshift":
        answer += "_" + _aa3(v.aa_ref[-1]) + str(v.aa_pos
                                                 + len(v.aa_ref) - 1)

    ref_len, alt_len = len(v.aa_ref), len(v.aa_alt)
    if ref_len == 1 and alt_len == 1:
        pass
    elif ref_len == 1 and alt_len > 1 and v.variant_type != "Frameshift":
        answer += "delins"
    elif ref_len >= 1 and alt_len == 0 and v.variant_type != "Frameshift":
        answer += "del"
    elif ref_len >= 1 and alt_len >= 1 and v.variant_type != "Frameshift":
        answer += "delins"

    if len(v.aa_alt) == 1 or (len(v.aa_alt) > 1
                              and v.variant_type == "Frameshift"):
        answer += _aa3(v.aa_alt[0])
    elif len(v.aa_alt) > 5:
        answer += str(len(v.aa_alt))
    else:
        for val in v.aa_alt:
            answer += _aa3(val)

    if v.variant_type == "Frameshift":
        ter = _dist_to_next_ter(v, seq)
        ter -= v.aa_pos - int(_go_round(v.cdna_pos / 3 + 0.4))
        if ter == 1 or (len(v.aa_alt) > 0 and v.aa_alt[0] == STOP):
            v.variant_type = "Nonsense"
            return _protein_str(v, seq)
        answer += f"fsTer{ter}"
    return answer


def _dist_to_next_ter(v: VcfEffectPrediction, seq) -> int:
    """distToNextTer (annotation.go:432)."""
    answer = 1
    chrom = seq[v.chrom]
    codon_acc: list[int] = []
    original_frame = _determine_frame(v)
    if v.pos_strand:
        for i in range(original_frame, 0, -1):
            codon_acc.append(int(chrom[v.pos - 1 - i]))
        seq_pos = v.pos + len(dna.from_string(v.ref)) - 1
        for val in dna.from_string(v.alt[0]):
            codon_acc.append(int(val))
            if len(codon_acc) % 3 == 0:
                if _translate(codon_acc)[0] == STOP:
                    return answer
                answer += 1
                codon_acc = []
        curr = v.nearest_cds
        while True:
            if seq_pos > curr.end - 1:
                curr = curr.next
                seq_pos = curr.start - 1
            codon_acc.append(int(chrom[seq_pos]))
            seq_pos += 1
            if len(codon_acc) % 3 == 0:
                if _translate(codon_acc)[0] == STOP:
                    return answer
                answer += 1
                codon_acc = []
    else:
        ref_len = len(dna.from_string(v.ref))
        alt_seq = list(reversed(dna.from_string(v.alt[0])))
        if (ref_len - 1) - original_frame > 0:
            answer -= 1 + (((ref_len - 2) - original_frame) // 3)
        frame = ((v.nearest_cds.end - (v.pos + ref_len - 1)) % 3
                 + ((3 - v.nearest_cds.frame) % 3)) % 3
        for i in range(frame, 0, -1):
            codon_acc.append(int(chrom[v.pos + i]))
        if len(alt_seq) < ref_len:
            seq_pos = v.pos - 2
        else:
            seq_pos = v.pos - 1 - ref_len
        for val in alt_seq:
            codon_acc.append(int(val))
            if len(codon_acc) % 3 == 0:
                if _translate(_complement(codon_acc))[0] == STOP:
                    return answer
                answer += 1
                codon_acc = []
        curr = v.nearest_cds
        while True:
            if curr.prev is not None and seq_pos < curr.start - 1:
                curr = curr.prev
                seq_pos = curr.end - 1
            codon_acc.append(int(chrom[seq_pos]))
            seq_pos -= 1
            if len(codon_acc) % 3 == 0:
                if _translate(_complement(codon_acc))[0] == STOP:
                    return answer
                answer += 1
                codon_acc = []
