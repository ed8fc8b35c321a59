"""Typed variants with Mutator/Effector behavior (reference:
/root/reference/variant/{variant,mutate,effect}.go).

Named variantmod to avoid clashing with the io.vcf record type."""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from . import codon as codonmod
from . import dna

# EffectType (effect.go:33)
SILENT = 6
FRAMESHIFT = 5
NONSENSE = 4
IN_FRAME_INSERTION = 3
IN_FRAME_DELETION = 2
MISSENSE = 1


class RefMatchError(ValueError):
    """variant.ErrRefMatch."""


class InvalidPositionError(ValueError):
    """variant.ErrInvalidPosition."""


class NegativePositionError(ValueError):
    """variant.ErrNegPos."""


@dataclass
class CodingChange:
    """variant.CodingChange (effect.go:22)."""

    coding_pos: int = 0
    protein_pos: int = 0
    removed_aa: list[int] = field(default_factory=list)
    added_aa: list[int] = field(default_factory=list)
    effect_type: int = 0


def _translate_to_ter(seq) -> list[int]:
    arr = np.asarray(list(seq), dtype=np.int8)
    arr = arr[:len(arr) - len(arr) % 3]
    if len(arr) == 0:
        return []
    return [int(a) for a in codonmod.translate_seq_to_ter(arr)]


def _aa_change(ref, alt) -> tuple[list[int], list[int], int]:
    """aaChange (effect.go:271): translate-to-ter both, trim matching
    leading amino acids."""
    removed = _translate_to_ter(ref)
    added = _translate_to_ter(alt)
    offset = 0
    while removed and added and removed[0] == added[0]:
        removed = removed[1:]
        added = added[1:]
        offset += 1
    return removed, added, offset


@dataclass
class Substitution:
    """variant.Substitution (variant.go:10)."""

    chrom: str
    pos: int
    ref: int
    alt: int

    def mutate(self, seq: list[int], offset_start: int = 0,
               offset_end: int = 0) -> list[int]:
        pos = self.pos + offset_start
        if pos < 0:
            raise NegativePositionError
        if seq[pos] != self.ref:
            raise RefMatchError
        seq[pos] = self.alt
        return seq

    def effect(self, coding_seq: list[int], offset_start: int = 0,
               offset_end: int = 0) -> CodingChange:
        pos = self.pos + offset_start
        ans = CodingChange(coding_pos=pos, protein_pos=pos // 3)
        if pos < 0:
            raise NegativePositionError
        if coding_seq[pos] != self.ref:
            raise RefMatchError
        frame = pos % 3
        start = pos - frame
        codon = list(coding_seq[start:start + 3])
        ref_aa = _translate_to_ter(codon)[0] if codon else None
        codon[frame] = self.alt
        alt_aa = _translate_to_ter(codon)[0]
        if ref_aa != alt_aa:
            ans.removed_aa = [ref_aa]
            ans.added_aa = [alt_aa]
        if alt_aa == ref_aa:
            ans.effect_type = SILENT
        elif alt_aa == codonmod.STOP:
            ans.effect_type = NONSENSE
        else:
            ans.effect_type = MISSENSE
        return ans


@dataclass
class Insertion:
    """variant.Insertion (variant.go:20)."""

    chrom: str
    pos: int
    seq: list[int]

    def mutate(self, seq: list[int], offset_start: int = 0,
               offset_end: int = 0) -> list[int]:
        pos = self.pos + offset_start
        if pos < 0:
            raise NegativePositionError
        if pos > len(seq):
            raise InvalidPositionError
        return seq[:pos] + list(self.seq) + seq[pos:]

    def effect(self, coding_seq: list[int], offset_start: int = 0,
               offset_end: int = 0) -> CodingChange:
        pos = self.pos + offset_start
        ans = CodingChange(coding_pos=pos, protein_pos=pos // 3)
        if pos < 0:
            raise NegativePositionError
        if pos > len(coding_seq):
            raise InvalidPositionError
        frame = pos % 3
        codon_start = pos - frame
        ins = list(self.seq)
        if len(ins) % 3 != 0:
            ans.effect_type = FRAMESHIFT
            shifted = (list(coding_seq[codon_start:pos]) + ins
                       + list(coding_seq[pos:]))
            ans.removed_aa, ans.added_aa, off = _aa_change(
                coding_seq[codon_start:], shifted)
        elif frame != 0:
            ans.effect_type = IN_FRAME_INSERTION
            new = (list(coding_seq[codon_start:pos]) + ins
                   + list(coding_seq[pos:codon_start + 3]))
            ans.removed_aa, ans.added_aa, off = _aa_change(
                coding_seq[codon_start:codon_start + 3], new)
        else:
            ans.effect_type = IN_FRAME_INSERTION
            ans.removed_aa, ans.added_aa, off = _aa_change([], ins)
        if not ans.removed_aa and not ans.added_aa:
            ans.effect_type = SILENT
        ans.protein_pos += off
        return ans


@dataclass
class Deletion:
    """variant.Deletion (variant.go:28)."""

    chrom: str
    start: int
    end: int

    def mutate(self, seq: list[int], offset_start: int = 0,
               offset_end: int = 0) -> list[int]:
        s, e = self.start + offset_start, self.end + offset_end
        if s < 0:
            raise NegativePositionError
        e = min(e, len(seq))
        return seq[:s] + seq[e:]

    def effect(self, coding_seq: list[int], offset_start: int = 0,
               offset_end: int = 0) -> CodingChange:
        s, e = self.start + offset_start, self.end + offset_end
        ans = CodingChange(coding_pos=s, protein_pos=s // 3)
        if s < 0:
            raise NegativePositionError
        if e > len(coding_seq):
            raise InvalidPositionError
        del_len = e - s
        start_frame = s % 3
        end_frame = (e - 1) % 3
        codon_start = s - start_frame
        codon_end = (e - 1) - end_frame + 3
        if del_len % 3 != 0:
            ans.effect_type = FRAMESHIFT
            shifted = (list(coding_seq[codon_start:s])
                       + list(coding_seq[e:]))
            ans.removed_aa, ans.added_aa, off = _aa_change(
                coding_seq[codon_start:], shifted)
        elif start_frame != 0:
            ans.effect_type = IN_FRAME_DELETION
            new = (list(coding_seq[codon_start:s])
                   + list(coding_seq[e:codon_end]))
            ans.removed_aa, ans.added_aa, off = _aa_change(
                coding_seq[codon_start:codon_end], new)
        else:
            ans.effect_type = IN_FRAME_DELETION
            ans.removed_aa, ans.added_aa, off = _aa_change(
                coding_seq[codon_start:codon_end], [])
        if not ans.removed_aa and not ans.added_aa:
            ans.effect_type = SILENT
        ans.protein_pos += off
        return ans


@dataclass
class Delins:
    """variant.Delins (variant.go:38)."""

    chrom: str
    start: int
    end: int
    ins_seq: list[int]

    def mutate(self, seq: list[int], offset_start: int = 0,
               offset_end: int = 0) -> list[int]:
        s, e = self.start + offset_start, self.end + offset_end
        if s < 0:
            raise NegativePositionError
        e = min(e, len(seq))
        return seq[:s] + list(self.ins_seq) + seq[e:]

    def effect(self, coding_seq: list[int], offset_start: int = 0,
               offset_end: int = 0) -> CodingChange:
        s, e = self.start + offset_start, self.end + offset_end
        ans = CodingChange(coding_pos=s, protein_pos=s // 3)
        if s < 0:
            raise NegativePositionError
        if e > len(coding_seq):
            raise InvalidPositionError
        ins = list(self.ins_seq)
        del_len = e - s
        len_diff = len(ins) - del_len
        start_frame = s % 3
        end_frame = (e - 1) % 3
        codon_start = s - start_frame
        codon_end = (e - 1) - end_frame + 3
        if len_diff % 3 != 0:
            ans.effect_type = FRAMESHIFT
            shifted = (list(coding_seq[codon_start:s]) + ins
                       + list(coding_seq[e:]))
            ans.removed_aa, ans.added_aa, off = _aa_change(
                coding_seq[codon_start:], shifted)
        elif start_frame != 0:
            ans.effect_type = (IN_FRAME_INSERTION if len_diff > 0
                               else IN_FRAME_DELETION)
            new = (list(coding_seq[codon_start:s]) + ins
                   + list(coding_seq[e:codon_end]))
            ans.removed_aa, ans.added_aa, off = _aa_change(
                coding_seq[codon_start:codon_end], new)
        else:
            if len_diff > 0:
                ans.effect_type = IN_FRAME_INSERTION
            elif len_diff < 0:
                ans.effect_type = IN_FRAME_DELETION
            else:
                ans.effect_type = MISSENSE
            ans.removed_aa, ans.added_aa, off = _aa_change(
                coding_seq[codon_start:codon_end], ins)
        if not ans.removed_aa and not ans.added_aa:
            ans.effect_type = SILENT
        ans.protein_pos += off
        return ans


@dataclass
class Structural:
    """variant.Structural (variant.go:47): catch-all placeholder."""

    chrom: str = ""


def base(ch: str) -> int:
    return int(dna.from_string(ch)[0])
