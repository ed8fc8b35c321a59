"""Reversible protein-coding gene model with effect prediction
(reference: /root/reference/gene/{gene,fromGtf,pointMutation,insert,
delete,reset}.go).

The Go implementation aliases codingSeq/utrFive/utrThree into cdnaSeq
via sub-slices; here those are explicit (start, end) windows into a
plain Python list so every mutation routes through cdna_seq."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import codon as codonmod
from . import dna
from .io import gtf as gtfio

# Feature codes (gene.go:15): >= 0 is the cDNA position
INTRON = -1
UTR_THREE = -3
UTR_FIVE = -5

# MutationType (gene.go:19)
SILENT = 0
MISSENSE = 1
NONSENSE = 2
FRAMESHIFT = 3
INTERGENIC = 4
INTRONIC = 5
SPLICE = 6
FAR_SPLICE = 7
DISRUPT_START = 8
DISRUPT_STOP = 9
IN_FRAME_INSERTION = 10
IN_FRAME_DELETION = 11

MUTATION_NAMES = {
    SILENT: "Silent", MISSENSE: "Missense", NONSENSE: "Nonsense",
    FRAMESHIFT: "Frameshift", INTERGENIC: "Intergenic",
    INTRONIC: "Intronic", SPLICE: "Splice", FAR_SPLICE: "FarSplice",
    DISRUPT_START: "DisruptStart", DISRUPT_STOP: "DisruptStop",
    IN_FRAME_INSERTION: "InFrameInsertion",
    IN_FRAME_DELETION: "InFrameDeletion",
}


class GeneError(ValueError):
    pass


@dataclass
class EffectPrediction:
    """gene.EffectPrediction (gene.go:82)."""

    consequence: int = SILENT
    cdna_pos: int = 0
    cdna_dist: int = 0
    aa_pos: int = 0
    aa_ref: list[int] = field(default_factory=list)
    aa_alt: list[int] = field(default_factory=list)
    stop_dist: int = -1


def _translate(seq: list[int]) -> list[int]:
    if not seq:
        return []
    return [int(a) for a in
            codonmod.translate_seq(np.asarray(seq, dtype=np.int8))]


def _translate_to_ter(seq: list[int]) -> list[int]:
    seq = seq[:len(seq) - len(seq) % 3]
    if not seq:
        return []
    return [int(a) for a in
            codonmod.translate_seq_to_ter(np.asarray(seq,
                                                     dtype=np.int8))]


class Gene:
    """gene.Gene (gene.go:36)."""

    def __init__(self):
        self.id = ""
        self.symbol = ""
        self.start_pos = 0
        self.pos_strand = True
        self.cds_starts: list[int] = []
        self.cds_ends: list[int] = []
        self.genome_seq: list[int] = []
        self.cdna_seq: list[int] = []
        # windows into cdna_seq
        self.coding_start = 0
        self.coding_end = 0
        self.utr5_start = 0
        self.utr5_end = 0
        self.utr3_start = 0
        self.utr3_end = 0
        self.prot_seq: list[int] = []
        self.feature_array: list[int] = []
        self.change_log: list[tuple[int, list[int], list[int]]] = []
        self._orig: dict | None = None

    # --- window views ---
    @property
    def coding_seq(self) -> list[int]:
        return self.cdna_seq[self.coding_start:self.coding_end]

    @property
    def utr_five_seq(self) -> list[int]:
        return self.cdna_seq[self.utr5_start:self.utr5_end]

    @property
    def utr_three_seq(self) -> list[int]:
        return self.cdna_seq[self.utr3_start:self.utr3_end]

    def _snapshot(self) -> dict:
        return dict(start_pos=self.start_pos,
                    cds_starts=list(self.cds_starts),
                    cds_ends=list(self.cds_ends),
                    genome_seq=list(self.genome_seq),
                    cdna_seq=list(self.cdna_seq),
                    coding_start=self.coding_start,
                    coding_end=self.coding_end,
                    utr5_start=self.utr5_start, utr5_end=self.utr5_end,
                    utr3_start=self.utr3_start, utr3_end=self.utr3_end,
                    feature_array=list(self.feature_array))


def gtf_to_gene(g: gtfio.Gene, ref_map: dict[str, np.ndarray]) -> Gene:
    """gene.GtfToGene (fromGtf.go:11): canonical isoform only."""
    answer = Gene()
    gtfio.move_canonical_to_zero(g)
    t = g.transcripts[0]
    answer.id = g.gene_id
    answer.symbol = g.gene_name
    answer.pos_strand = t.strand

    chrom_seq = np.asarray(ref_map[t.chrom])
    span = chrom_seq[t.start - 1:t.end]
    if t.strand:
        answer.start_pos = t.start - 1
        answer.genome_seq = [int(b) for b in span]
        _process_exons(answer, t, positive=True)
    else:
        answer.start_pos = t.end - 1
        answer.genome_seq = [int(b) for b in dna.reverse_complement(
            np.array(span, copy=True))]
        _process_exons(answer, t, positive=False)

    answer.utr5_start = 0
    answer.utr3_end = len(answer.cdna_seq)
    answer.coding_start = answer.utr5_end
    answer.coding_end = answer.utr3_start
    answer.prot_seq = _translate(answer.coding_seq)
    answer._orig = answer._snapshot()
    return answer


def _process_exons(answer: Gene, t: gtfio.Transcript,
                   positive: bool) -> None:
    """processExonsPos/Neg (fromGtf.go:59,127)."""
    n = len(answer.genome_seq)
    answer.feature_array = [0] * n
    curr_cds_pos = 0
    prev_exon_end = answer.start_pos
    exons = t.exons if positive else list(reversed(t.exons))
    for exon in exons:
        if positive:
            intron_range = range(prev_exon_end - answer.start_pos,
                                 exon.start - 1 - answer.start_pos)
            prev_exon_end = exon.end
        else:
            intron_range = range(answer.start_pos - prev_exon_end,
                                 answer.start_pos - (exon.end - 1))
            prev_exon_end = exon.start - 2
        for i in intron_range:
            answer.feature_array[i] = INTRON

        def span(start: int, end: int) -> tuple[int, int]:
            if positive:
                return (start - 1 - answer.start_pos,
                        end - answer.start_pos)
            return (answer.start_pos - (end - 1),
                    answer.start_pos - (start - 2))

        if exon.five_utr is not None:
            a, b = span(exon.five_utr.start, exon.five_utr.end)
            for i in range(a, b):
                answer.feature_array[i] = UTR_FIVE
            answer.cdna_seq.extend(answer.genome_seq[a:b])
            answer.utr5_end = b
        if exon.cds is not None:
            a, b = span(exon.cds.start, exon.cds.end)
            answer.cds_starts.append(a)
            answer.cds_ends.append(b - 1)
            answer.cdna_seq.extend(answer.genome_seq[a:b])
            for i in range(a, b):
                answer.feature_array[i] = curr_cds_pos
                curr_cds_pos += 1
        if exon.three_utr is not None:
            a, b = span(exon.three_utr.start, exon.three_utr.end)
            for i in range(a, b):
                answer.feature_array[i] = UTR_THREE
            if answer.utr3_start == 0:  # unset sentinel (fromGtf.go:118)
                answer.utr3_start = len(answer.cdna_seq)
            answer.cdna_seq.extend(answer.genome_seq[a:b])


# --- coordinate conversion (gene.go:104) ---

def genomic_pos_to_cdna(g: Gene, genome_pos: int) -> tuple[int, int]:
    """gene.GenomicPosToCdna: (nearest cDNA pos, signed distance)."""
    query = (genome_pos - g.start_pos if g.pos_strand
             else g.start_pos - genome_pos)
    fa = g.feature_array
    feature = fa[query]
    if feature == INTRON:
        fwd, rev = 1, -1
        while True:
            if query + rev >= 0 and fa[query + rev] > 0:
                return fa[query + rev], -rev
            if query + fwd < len(fa) and fa[query + fwd] > 0:
                return fa[query + fwd], -fwd
            fwd += 1
            rev -= 1
            if query + fwd > len(fa) or query + rev < 0:
                raise GeneError("no coding sequence could be found")
    if feature == UTR_THREE:
        rev = -1
        while fa[query + rev] < 0:
            rev -= 1
            if query + rev < 0:
                raise GeneError("no coding sequence found before 3'UTR")
        return fa[query + rev], -rev
    if feature == UTR_FIVE:
        fwd = 1
        while fa[query + fwd] < 0:
            fwd += 1
            if query + fwd > len(fa):
                raise GeneError("no coding sequence found after 5'UTR")
        return fa[query + fwd], -fwd
    return feature, 0


def coding_pos_to_genomic(g: Gene, cdna_pos: int) -> int:
    """gene.CodingPosToGenomic (gene.go:159)."""
    if cdna_pos < 0:
        raise GeneError("input CDS position must be positive")
    if cdna_pos > len(g.coding_seq) - 1:
        raise GeneError("input position is greater than the length of "
                        "the CDS")
    search = g.cds_starts[0]
    for val in g.cds_starts:
        if g.feature_array[val] > cdna_pos:
            break
        search = val
    if g.pos_strand:
        return search + (cdna_pos - g.feature_array[search]) + g.start_pos
    return g.start_pos - (search + (cdna_pos - g.feature_array[search]))


def cdna_pos_to_codon(g: Gene, cdna_pos: int) -> list[int]:
    """gene.CdnaPosToCodon (gene.go:182)."""
    cs = g.coding_seq
    if cdna_pos < 0:
        raise GeneError("input cDNA position must be positive")
    if cdna_pos > len(cs) - 1:
        raise GeneError("input position is greater than the length of "
                        "the cDNA")
    frame = cdna_pos % 3
    start = cdna_pos - frame
    return cs[start:start + 3]


def _check_splice(dist: int) -> int:
    """checkSplice (pointMutation.go:42)."""
    if abs(dist) <= 2:
        return SPLICE
    if abs(dist) <= 10:
        return FAR_SPLICE
    return INTRONIC


# --- Substitution (pointMutation.go:11) ---

def substitution(g: Gene, genome_pos: int, alt: int) -> EffectPrediction:
    answer = EffectPrediction()
    gi = abs(genome_pos - g.start_pos)
    removed = [g.genome_seq[gi]] if gi < len(g.genome_seq) else []
    if removed and not g.pos_strand:
        removed = [int(dna.complement(np.asarray(removed, np.int8))[0])]

    if alt > dna.T or alt < 0:
        raise GeneError("alt base must be A, C, T, or G")
    if genome_pos < 0:
        raise GeneError("genomePos must be positive")
    if g.pos_strand and genome_pos < g.start_pos:
        raise GeneError("input genomePos is not in the gene")
    if not g.pos_strand:
        if genome_pos > g.start_pos:
            raise GeneError("input genomePos is not in the gene")
        alt = int(dna.complement(np.asarray([alt], np.int8))[0])
    if gi > len(g.genome_seq) - 1:
        raise GeneError("input genomePos is not in the gene")

    g.change_log.append((genome_pos, removed, [alt]))
    g.genome_seq[gi] = alt
    cdna_idx = g.feature_array[gi]

    if cdna_idx >= 0:
        answer.cdna_pos = cdna_idx
        answer.aa_pos = cdna_idx // 3
        codon = cdna_pos_to_codon(g, cdna_idx)
        answer.aa_ref = _translate(codon)[:1]
        g.cdna_seq[g.coding_start + cdna_idx] = alt
        alt_codon = cdna_pos_to_codon(g, cdna_idx)
        answer.aa_alt = _translate(alt_codon)[:1]
        if answer.aa_ref[0] == answer.aa_alt[0]:
            answer.consequence = SILENT
        elif answer.aa_alt[0] == codonmod.STOP:
            answer.consequence = NONSENSE
            answer.stop_dist = 0
        elif answer.aa_ref[0] == codonmod.STOP:
            answer.consequence = DISRUPT_STOP
        elif answer.aa_pos == 0:
            answer.consequence = DISRUPT_START
        else:
            answer.consequence = MISSENSE
    else:
        answer.cdna_pos, answer.cdna_dist = genomic_pos_to_cdna(
            g, genome_pos)
        answer.consequence = _check_splice(answer.cdna_dist)

    g.prot_seq = _translate(g.coding_seq)
    return answer


# --- Insertion (insert.go:13) ---

def _insert_adjust(g: Gene, ins_pos: int, alt: list[int]) -> None:
    """insertAdjust (insert.go:241): insert into cDNA and shift
    windows strictly greater than insPos."""
    g.cdna_seq[ins_pos:ins_pos] = alt
    n = len(alt)
    if g.utr5_start > ins_pos:
        g.utr5_start += n
    if g.utr5_end > ins_pos:
        g.utr5_end += n
    if g.utr3_start > ins_pos:
        g.utr3_start += n
    if g.utr3_end > ins_pos:
        g.utr3_end += n
    if g.coding_start > ins_pos:
        g.coding_start += n
    if g.coding_end > ins_pos:
        g.coding_end += n


def _frameshift_translate(shifted_cds: list[int],
                          utr3: list[int]) -> list[int]:
    """frameshiftTranslate (insert.go:293)."""
    answer: list[int] = []
    frame_offset = len(shifted_cds) % 3
    for i in range(0, len(shifted_cds) - frame_offset, 3):
        if i + 3 > len(shifted_cds):
            break
        answer.append(_translate(shifted_cds[i:i + 3])[0])
        if answer[-1] == codonmod.STOP:
            return answer
    transition = (shifted_cds[len(shifted_cds) - frame_offset:]
                  + utr3[:3 - frame_offset])
    answer.append(_translate(transition)[0])
    if answer[-1] == codonmod.STOP:
        return answer
    remaining = utr3[3 - frame_offset:]
    for i in range(0, len(remaining) - 2, 3):
        answer.append(_translate(remaining[i:i + 3])[0])
        if answer[-1] == codonmod.STOP:
            return answer
    return answer


def insertion(g: Gene, genome_pos: int, alt: list[int]) \
        -> EffectPrediction:
    answer = EffectPrediction()
    alt = list(alt)
    if any(b > dna.T or b < 0 for b in alt):
        raise GeneError("nonstandard base")
    if genome_pos < 0:
        raise GeneError("genomePos must be positive")
    if g.pos_strand:
        if genome_pos < g.start_pos:
            raise GeneError("input genomePos is not in the gene")
        gi = genome_pos - g.start_pos
    else:
        if genome_pos > g.start_pos:
            raise GeneError("input genomePos is not in the gene")
        gi = (g.start_pos - genome_pos) - 1
        alt = [int(b) for b in dna.reverse_complement(
            np.asarray(alt, np.int8))]
    if gi > len(g.genome_seq) - 1:
        raise GeneError("input genomePos is not in the gene")
    g.change_log.append((genome_pos, [], list(alt)))

    g.genome_seq[gi + 1:gi + 1] = alt

    for idx in range(len(g.cds_starts)):
        if g.cds_starts[idx] > gi:
            g.cds_starts[idx] += len(alt)
            g.cds_ends[idx] += len(alt)
        elif g.cds_ends[idx] > gi:
            g.cds_ends[idx] += len(alt)

    fa = g.feature_array
    if fa[gi] >= 0 and fa[gi + 1] >= 0:  # coding
        coding_pos = fa[gi]
        fill = coding_pos + 1
        fa[gi + 1:gi + 1] = [0] * len(alt)
        i = 0
        for i in range(len(alt)):
            fa[gi + 1 + i] = fill
            fill += 1
        i += 1
        while gi + 1 + i < len(fa) and fa[gi + 1 + i] >= 0:
            fa[gi + 1 + i] = fill
            fill += 1
            i += 1
        for cds_start in g.cds_starts:
            if cds_start > gi:
                k = 0
                while cds_start + k < len(fa) and fa[cds_start + k] >= 0:
                    fa[cds_start + k] = fill
                    fill += 1
                    k += 1

        answer.cdna_pos, answer.cdna_dist = genomic_pos_to_cdna(
            g, genome_pos)
        frame = (coding_pos + 1) % 3
        if frame != 0:
            answer.aa_ref = _translate(
                cdna_pos_to_codon(g, coding_pos))[:1]
        _insert_adjust(g, coding_pos + 1 + len(g.utr_five_seq), alt)
        answer.aa_pos = coding_pos // 3
        if len(alt) % 3 != 0:  # frameshift
            answer.consequence = FRAMESHIFT
            cs = g.coding_seq
            new_prot = _frameshift_translate(cs[(coding_pos + 1) - frame:],
                                             g.utr_three_seq)
            if new_prot[-1] == codonmod.STOP:
                answer.stop_dist = len(new_prot) - 1
            else:
                answer.stop_dist = -2
            j = 0
            while (j < len(new_prot)
                   and new_prot[j] == g.prot_seq[answer.aa_pos]):
                answer.aa_pos += 1
                if answer.stop_dist != -2:
                    answer.stop_dist -= 1
                if answer.aa_pos >= len(g.prot_seq):
                    break  # Go's break skips the j++ post-statement
                j += 1
            answer.aa_ref = [g.prot_seq[answer.aa_pos]] \
                if answer.aa_pos < len(g.prot_seq) else []
            answer.aa_alt = [new_prot[j]]
            g.prot_seq = new_prot
        else:  # in-frame
            new_prot = _translate_to_ter(g.coding_seq)
            answer.consequence = IN_FRAME_INSERTION
            if frame != 0:
                cs = g.coding_seq
                answer.aa_alt = _translate(
                    cs[(coding_pos + 1) - frame:
                       (coding_pos + 1) + len(alt) + (3 - frame)])
                if answer.aa_ref and answer.aa_ref[0] == answer.aa_alt[0]:
                    answer.aa_ref = []
                    answer.aa_alt = answer.aa_alt[1:]
                    answer.aa_pos += 1
            else:
                answer.aa_alt = _translate(alt)
            g.prot_seq = new_prot
    else:  # noncoding
        fill = min(fa[gi], fa[gi + 1])
        if fill == UTR_FIVE:
            offset = sum(1 for i in range(gi + 1) if fa[i] == UTR_FIVE)
            _insert_adjust(g, g.utr5_start + offset, alt)
        elif fill == UTR_THREE:
            offset = 0
            i = gi
            while fa[i] < 0:
                if fa[i] == UTR_THREE:
                    offset += 1
                if i <= 0:
                    break
                i -= 1
            _insert_adjust(g, g.utr3_start + offset, alt)
        fa[gi + 1:gi + 1] = [fill] * len(alt)

        answer.cdna_pos, answer.cdna_dist = genomic_pos_to_cdna(
            g, genome_pos + 1)
        _, end_dist = genomic_pos_to_cdna(g,
                                          genome_pos + 1 + (len(alt) - 1))
        if abs(end_dist) < abs(answer.cdna_dist):
            answer.consequence = _check_splice(end_dist)
        else:
            answer.consequence = _check_splice(answer.cdna_dist)
    return answer


# --- Deletion (delete.go:17) ---

def _safe_delete(g: Gene, del_start: int, del_end: int,
                 offset: int) -> None:
    """safeDelete (delete.go:120): delete cDNA range and fix windows."""
    if del_start == del_end:
        return
    del_len = del_end - del_start
    del_start += offset
    del_end += offset
    del g.cdna_seq[del_start:del_end]

    # Fix 5' UTR
    if del_end <= g.utr5_end:
        g.utr5_end -= del_len
    elif del_start <= g.utr5_end:
        g.utr5_end = del_start
    if del_start <= g.utr5_end:
        g.utr5_end = del_start

    # Fix CDS window
    if del_end < g.coding_start:
        g.coding_start -= del_len
        g.coding_end -= del_len
    elif del_start > g.coding_end:
        pass
    elif del_start <= g.coding_start and del_end >= g.coding_end:
        g.coding_start = del_start
        g.coding_end = del_start
    elif g.coding_start <= del_start and g.coding_end >= del_end:
        g.coding_end -= del_len
    elif g.coding_start >= del_start and g.coding_start <= del_end:
        g.coding_start = del_start
        g.coding_end -= del_len
    elif g.coding_end >= del_start and g.coding_end <= del_end:
        g.coding_end = del_start

    # Fix 3' UTR
    if del_end < g.utr3_start:
        g.utr3_start -= del_len
        g.utr3_end -= del_len
    elif del_start <= g.utr3_start and del_end >= g.utr3_end:
        g.utr3_start = del_start
        g.utr3_end = del_start
    elif del_start >= g.utr3_start:
        g.utr3_end = del_end
    elif del_start <= g.utr3_start:
        g.utr3_start = del_start
        g.utr3_end -= del_len


def deletion(g: Gene, genome_start: int, genome_end: int) \
        -> EffectPrediction:
    answer = EffectPrediction()
    if genome_start < 0 or genome_end < 0:
        raise GeneError("genomePos must be positive")
    if genome_start >= genome_end:
        raise GeneError("genomeStartPos must be less than genomeEndPos")
    if g.pos_strand:
        if genome_start < g.start_pos:
            if genome_end > g.start_pos:
                genome_start = g.start_pos - 1
            else:
                raise GeneError("input genomePos is not in the gene")
    else:
        if genome_start > g.start_pos:
            if genome_end < g.start_pos:
                genome_start = g.start_pos
            else:
                raise GeneError("input genomePos is not in the gene")
    if g.pos_strand:
        gi_start = genome_start - g.start_pos
        gi_end = genome_end - g.start_pos
    else:
        gi_start = g.start_pos - (genome_end - 1)
        gi_end = g.start_pos - (genome_start - 1)
    gi_end = min(gi_end, len(g.genome_seq))
    if gi_start > len(g.genome_seq) - 1:
        raise GeneError("input genomePos is not in the gene")
    g.change_log.append((genome_start,
                         list(g.genome_seq[gi_start:gi_end]), []))

    # deleteGetCdnaDist (delete.go:428)
    _, dist_from_start = genomic_pos_to_cdna(g, genome_start)
    _, dist_from_end = genomic_pos_to_cdna(g, genome_end - 1)
    if g.feature_array[gi_start] >= 0:
        answer.cdna_pos = g.feature_array[gi_start]
    else:
        if abs(dist_from_end) == abs(dist_from_start):
            answer.cdna_dist = abs(dist_from_start)
        elif abs(dist_from_start) < abs(dist_from_end):
            answer.cdna_dist = dist_from_start
        else:
            answer.cdna_dist = dist_from_end

    orig_cds_start = g.cds_starts[0]
    orig_cds_end = g.cds_ends[-1]

    # deleteUpdateGenome (delete.go:213)
    del g.genome_seq[gi_start:gi_end]
    if gi_start == 0:
        g.start_pos += gi_end

    # deleteUpdateCds (delete.go:225)
    deleted_coding = 0
    to_delete: list[int] = []
    coding_del_start = coding_del_end = -1
    del_len = gi_end - gi_start
    fa = g.feature_array
    for i in range(len(g.cds_starts)):
        if gi_start > g.cds_ends[i]:
            coding_del_start = fa[g.cds_ends[i]] + 1
        elif gi_start <= g.cds_starts[i] and gi_end > g.cds_ends[i]:
            to_delete.append(i)
            deleted_coding += (g.cds_ends[i] + 1) - g.cds_starts[i]
            if coding_del_start == -1:
                coding_del_start = fa[g.cds_starts[i]]
            coding_del_end = fa[g.cds_ends[i]] + 1
        elif (gi_start > g.cds_starts[i] and gi_start < g.cds_ends[i]
              and gi_end > g.cds_starts[i] and gi_end <= g.cds_ends[i]):
            g.cds_ends[i] -= del_len
            deleted_coding += del_len
            coding_del_start = fa[gi_start]
            coding_del_end = fa[gi_end]
        elif gi_start > g.cds_starts[i] and gi_start <= g.cds_ends[i]:
            deleted_coding += 1 + g.cds_ends[i] - gi_start
            g.cds_ends[i] = gi_start - 1
            coding_del_start = fa[gi_start]
        elif gi_end > g.cds_starts[i] and gi_end <= g.cds_ends[i]:
            deleted_coding += gi_end - g.cds_starts[i]
            g.cds_starts[i] = gi_end - del_len
            g.cds_ends[i] -= del_len
            coding_del_end = fa[gi_end]
        elif gi_end <= g.cds_starts[i]:
            if coding_del_end == -1:
                coding_del_end = fa[g.cds_starts[i]]
            g.cds_starts[i] -= del_len
            g.cds_ends[i] -= del_len
    for i in reversed(to_delete):
        del g.cds_starts[i]
        del g.cds_ends[i]
    if deleted_coding > 0:
        _safe_delete(g, coding_del_start, coding_del_end,
                     len(g.utr_five_seq))

    # deleteUpdateUtr (delete.go:321): uses the ORIGINAL feature array
    if gi_start < orig_cds_start or gi_end > orig_cds_end:
        u5_start_off = u5_end_off = 0
        u3_start_off = u3_end_off = 0
        if gi_start < orig_cds_start:
            i = 0
            while fa[gi_start + i] < 0:
                if fa[gi_start + i] == UTR_FIVE:
                    u5_start_off += 1
                    if gi_start + i > gi_end - 1:
                        u5_end_off += 1
                i += 1
        if gi_end > orig_cds_end:
            i = 0
            while fa[(gi_end - i) - 1] < 0:
                if fa[(gi_end - i) - 1] == UTR_THREE:
                    u3_end_off += 1
                    if (gi_end - i) - 1 < gi_start:
                        u3_start_off += 1
                i += 1
        u5 = len(g.utr_five_seq)
        _safe_delete(g, u5 - u5_start_off, u5 - u5_end_off, 0)
        _safe_delete(g, u3_start_off, u3_end_off,
                     len(g.utr_five_seq) + len(g.coding_seq))

    # deleteUpdateFeatureArray (delete.go:291)
    del fa[gi_start:gi_end]
    j = gi_start
    if gi_start < len(fa):
        if fa[gi_start] >= 0:
            j = gi_start
            while j < len(fa) and fa[j] >= 0:
                fa[j] -= deleted_coding
                j += 1
        else:
            while j < len(fa) and fa[j] < 0:
                j += 1
        for val in g.cds_starts:
            if val >= j:
                j = val
                while j < len(fa) and fa[j] >= 0:
                    fa[j] -= deleted_coding
                    j += 1

    # deleteEffectPrediction (delete.go:380)
    if deleted_coding == 0:
        answer.consequence = _check_splice(answer.cdna_dist)
    else:
        answer.consequence = IN_FRAME_DELETION
        answer.aa_pos = answer.cdna_pos // 3
        start_frame = answer.cdna_pos % 3
        num_removed = (deleted_coding + start_frame + 2) // 3
        answer.aa_ref = list(
            g.prot_seq[answer.aa_pos:answer.aa_pos + num_removed])
        del_frame = deleted_coding % 3
        if del_frame != 0:  # frameshift
            fs_prot = _translate_to_ter(
                g.cdna_seq[answer.cdna_pos + len(g.utr_five_seq)
                           - start_frame:])
            answer.consequence = FRAMESHIFT
            if fs_prot and fs_prot[-1] == codonmod.STOP:
                answer.stop_dist = len(fs_prot) - 1
            else:
                answer.stop_dist = -2
            j = 0
            while (j < len(fs_prot)
                   and answer.aa_pos + j < len(g.prot_seq)
                   and fs_prot[j] == g.prot_seq[answer.aa_pos + j]):
                answer.aa_pos += 1
                if answer.stop_dist != -2:
                    answer.stop_dist -= 1
                if answer.aa_pos + j + 1 >= len(g.prot_seq):
                    j += 1
                    break
                j += 1
            if len(answer.aa_ref) > 1:
                answer.aa_ref = answer.aa_ref[j:]
            elif len(answer.aa_ref) == 1 and len(g.prot_seq) > 1:
                answer.aa_ref[0] = g.prot_seq[answer.aa_pos]
            answer.aa_alt = fs_prot[j:j + 1]
        elif start_frame != 0:
            new_codon_start = answer.cdna_pos - start_frame
            cs = g.coding_seq
            answer.aa_alt = _translate(
                cs[new_codon_start:new_codon_start + 3])

    g.prot_seq = _translate_to_ter(g.coding_seq)
    return answer


def reset(g: Gene) -> None:
    """gene.Reset (reset.go:6)."""
    has_indel = any(len(a) != 1 or len(r) != 1
                    for _, r, a in g.change_log)
    if not has_indel:
        for pos, removed, _ in reversed(list(g.change_log)):
            substitution(g, pos, removed[0])
    else:
        o = g._orig
        g.start_pos = o["start_pos"]
        g.cds_starts = list(o["cds_starts"])
        g.cds_ends = list(o["cds_ends"])
        g.genome_seq = list(o["genome_seq"])
        g.cdna_seq = list(o["cdna_seq"])
        g.feature_array = list(o["feature_array"])
        g.coding_start = o["coding_start"]
        g.coding_end = o["coding_end"]
        g.utr5_start = o["utr5_start"]
        g.utr5_end = o["utr5_end"]
        g.utr3_start = o["utr3_start"]
        g.utr3_end = o["utr3_end"]
    g.change_log = []
    g.prot_seq = _translate(g.coding_seq)
