"""BED records, IO, and region algebra.

Counterpart of /root/reference/bed (bed.go, compare.go, modify.go,
methods.go). Field-count-aware formatting matches ToString exactly.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import IO

from .. import fileio

POSITIVE, NEGATIVE, NONE = "+", "-", "."


@dataclass
class Bed:
    chrom: str = ""
    chrom_start: int = 0
    chrom_end: int = 0
    name: str = ""
    score: int = 0
    strand: str = NONE
    fields_initialized: int = 3
    annotation: list[str] = field(default_factory=list)

    def to_string(self, fields: int | None = None) -> str:
        n = self.fields_initialized if fields is None else fields
        if n < 3:
            raise ValueError(f"expecting at least 3 bed fields, got {n}")
        out = f"{self.chrom}\t{self.chrom_start}\t{self.chrom_end}"
        if n >= 4:
            out += f"\t{self.name}"
        if n >= 5:
            out += f"\t{self.score}"
        if n >= 6:
            out += f"\t{self.strand}"
        if n >= 7:
            for a in self.annotation:
                out += f"\t{a}"
        return out


def process_bed_line(line: str) -> Bed:
    w = line.split("\t")
    b = Bed(chrom=w[0], chrom_start=int(w[1]), chrom_end=int(w[2]),
            fields_initialized=len(w))
    if len(w) >= 4:
        b.name = w[3]
    if len(w) >= 5:
        b.score = int(w[4])
    if len(w) >= 6:
        b.strand = w[5] if w[5] in "+-." else NONE
    if len(w) >= 7:
        b.annotation = w[6:]
    return b


def read(filename: str) -> list[Bed]:
    return [process_bed_line(ln) for ln in fileio.read(filename) if ln]


def write_to_handle(f: IO[str], b: Bed) -> None:
    f.write(b.to_string() + "\n")


def write(filename: str, records: list[Bed]) -> None:
    with fileio.easy_create(filename) as f:
        for b in records:
            write_to_handle(f, b)


def compare(a: Bed, b: Bed) -> int:
    """bed.Compare (compare.go:160): chrom, start, end."""
    if a.chrom != b.chrom:
        return -1 if a.chrom < b.chrom else 1
    if a.chrom_start != b.chrom_start:
        return -1 if a.chrom_start < b.chrom_start else 1
    if a.chrom_end != b.chrom_end:
        return -1 if a.chrom_end < b.chrom_end else 1
    return 0


def sort_by_coord(records: list[Bed]) -> None:
    records.sort(key=lambda b: (b.chrom, b.chrom_start, b.chrom_end))


def sort_by_size(records: list[Bed]) -> None:
    records.sort(key=lambda b: b.chrom_end - b.chrom_start)


def overlap(a: Bed, b: Bed) -> bool:
    return (a.chrom == b.chrom
            and max(a.chrom_start, b.chrom_start)
            < min(a.chrom_end, b.chrom_end))


def adjacent(a: Bed, b: Bed) -> bool:
    return a.chrom == b.chrom and (a.chrom_end == b.chrom_start
                                   or a.chrom_start == b.chrom_end)


def overlap_length(a: Bed, b: Bed) -> int:
    if a.chrom != b.chrom:
        return 0
    return max(0, min(a.chrom_end, b.chrom_end)
               - max(a.chrom_start, b.chrom_start))


def minimum_distance(a: Bed, b: Bed) -> int | None:
    """bed.MinimumDistance (compare.go:216); None for different chroms."""
    if a.chrom != b.chrom:
        return None
    if overlap(a, b):
        return 0
    if a.chrom_start - b.chrom_end >= 0:
        return a.chrom_start - b.chrom_end + 1
    return b.chrom_start - a.chrom_end + 1


def merge_high_mem(records: list[Bed], merge_adjacent: int = -1,
                   keep_all_names: bool = False) -> list[Bed]:
    """bed.MergeHighMem (modify.go:85): sort then greedy merge, keeping
    max score (and optionally comma-joined names)."""
    if not records:
        return records
    records = [Bed(**vars(b)) for b in records]
    sort_by_coord(records)
    out: list[Bed] = []
    cur = records[0]
    for b in records[1:]:
        dist = minimum_distance(cur, b)
        if overlap(cur, b) or (dist is not None and dist <= merge_adjacent):
            if b.score > cur.score:
                cur.score = b.score
            cur.chrom_end = max(b.chrom_end, cur.chrom_end)
            if keep_all_names and b.name:
                cur.name = f"{cur.name},{b.name}" if cur.name else b.name
        else:
            out.append(cur)
            cur = b
    out.append(cur)
    return out


def merge_beds_keep_names_and_annotations(records: list[Bed]) -> list[Bed]:
    """bed.MergeBedsKeepNamesAndAnnotations (compare.go:49): adjacent
    overlapping records merge with comma-joined names, summed scores, and
    the FIRST annotation duplicated per merge (reference quirk kept)."""
    sort_by_coord(records)
    i = 0
    while i < len(records) - 1:
        if not overlap(records[i], records[i + 1]):
            i += 1
        else:
            records[i].chrom_start = min(records[i].chrom_start,
                                         records[i + 1].chrom_start)
            records[i].chrom_end = max(records[i].chrom_end,
                                       records[i + 1].chrom_end)
            records[i].score += records[i + 1].score
            records[i].name += "," + records[i + 1].name
            records[i].annotation.append(records[i].annotation[0])
            del records[i + 1]
    return records


def trim(b: Bed, left: int, right: int) -> Bed:
    if left < 0 or right < 0:
        raise ValueError("trim values must be >= 0")
    out = Bed(**vars(b))
    out.chrom_start += left
    out.chrom_end -= right
    if out.chrom_start >= out.chrom_end:
        raise ValueError("attempted to remove too much from bed entry")
    return out


def to_midpoint(b: Bed) -> Bed:
    out = Bed(**vars(b))
    mid = (b.chrom_start + b.chrom_end) // 2
    out.chrom_start = mid
    out.chrom_end = mid + 1
    return out


def to_tss(b: Bed) -> Bed:
    out = Bed(**vars(b))
    if b.strand == POSITIVE:
        out.chrom_end = b.chrom_start + 1
    elif b.strand == NEGATIVE:
        out.chrom_start = b.chrom_end - 1
    else:
        raise ValueError("bed must have +/- strand for Tss")
    return out


def total_size(records: list[Bed]) -> int:
    return sum(b.chrom_end - b.chrom_start for b in records)


def ungapped_regions_from_fa(rec) -> list[Bed]:
    """bed.UngappedRegionsFromFa (/root/reference/bed/info.go:58-76):
    maximal runs of defined (A/C/G/T) bases as 4-field beds."""
    from .. import dna as dnamod

    mask = dnamod.define_base_mask(rec.seq)
    out: list[Bed] = []
    if len(mask) == 0:
        return out
    import numpy as np

    edges = np.flatnonzero(np.diff(mask.astype(np.int8)))
    starts = ([0] if mask[0] else []) + [int(e) + 1 for e in edges
                                         if not mask[e]]
    ends = [int(e) + 1 for e in edges if mask[e]] + \
        ([len(mask)] if mask[-1] else [])
    for s, e in zip(starts, ends):
        out.append(Bed(rec.name, s, e, f"{rec.name}_{s}_{e}",
                       fields_initialized=4))
    return out


def ungapped_regions_all_from_fa(records) -> list[Bed]:
    """bed.UngappedRegionsAllFromFa (info.go:78-86)."""
    out: list[Bed] = []
    for rec in records:
        out.extend(ungapped_regions_from_fa(rec))
    return out
