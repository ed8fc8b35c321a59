"""Interval queries over genomic records (reference: /root/reference/interval).

The reference builds static interval trees with fractional cascading
(interval.go:24-155) and maps each Allen relationship to a 2D dominance
query via transform() (relationship.go:40). Here each chromosome's
intervals become numpy (start, end-1) coordinate arrays and every
relationship is the same transform()-defined box test evaluated as a
vectorized mask — identical results, array-parallel execution.

Records: anything with get_chrom()/get_chrom_start()/get_chrom_end()
(bed.Bed, vcf.Vcf wrappers below).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from . import dna
from .io import bed as bedio
from .io import vcf as vcfio

X_MIN = 0.0
X_MAX = 10_000_000_000.0

RELATIONSHIPS = ["o", "oi", "d", "di", "m", "mi", "s", "si", "f", "fi",
                 "lt", "gt", "e", "any", "within", "start", "end", "equal"]

_ANY = ["o", "oi", "d", "di", "m", "mi", "s", "si", "f", "fi", "e"]
_COMPOUND = {
    "any": _ANY,
    "within": ["d", "s", "f", "e"],
    "start": ["s", "si", "e"],
    "end": ["f", "fi", "e"],
    "equal": ["e"],
}


def chrom_start(rec) -> int:
    if isinstance(rec, vcfio.Vcf):
        return rec.pos - 1 if len(rec.ref) == 1 else rec.pos
    return rec.chrom_start


def chrom_end(rec) -> int:
    if isinstance(rec, vcfio.Vcf):
        return rec.pos if len(rec.ref) == 1 else rec.pos + len(rec.ref) - 1
    return rec.chrom_end


def chrom_of(rec) -> str:
    return rec.chrom


def transform(q_start: int, q_end: int, op: str):
    """relationship.go:40 transform — box bounds (x1,x2,y1,y2)."""
    x = float(q_start)
    y = float(q_end - 1)
    T = {
        "o": (X_MIN, x - 0.5, x + 0.5, y - 0.5),
        "oi": (x + 0.5, y - 0.5, y + 0.5, X_MAX),
        "d": (x + 0.5, y - 0.5, x + 0.5, y - 0.5),
        "di": (X_MIN, x - 0.5, y + 0.5, X_MAX),
        "m": (X_MIN, x, x, x),
        "mi": (y, y, y, X_MAX),
        "s": (x, x, x, y - 0.5),
        "si": (x, x, y + 0.5, X_MAX),
        "f": (x + 0.5, y, y, y),
        "fi": (X_MIN, x - 0.5, y, y),
        "lt": (X_MIN, x - 0.5, X_MIN, x - 0.5),
        "gt": (y + 0.5, X_MAX, y + 0.5, X_MAX),
        "e": (x, x, y, y),
    }
    if op not in T:
        raise ValueError(f"Invalid relationship: {op}")
    x1, x2, y1, y2 = T[op]
    return x1, x2, y1, y2


class IntervalIndex:
    """Per-chromosome sorted coordinate arrays (BuildTree analog)."""

    def __init__(self, records):
        self.by_chrom: dict[str, tuple[np.ndarray, np.ndarray, list]] = {}
        groups: dict[str, list] = {}
        for r in records:
            groups.setdefault(chrom_of(r), []).append(r)
        for chrom, recs in groups.items():
            # the reference sorts by y (end) for its tree layout; keep
            # that order so multi-hit output order matches
            recs.sort(key=lambda r: (chrom_end(r) - 1, chrom_start(r)))
            xs = np.array([chrom_start(r) for r in recs], np.float64)
            ys = np.array([chrom_end(r) - 1 for r in recs], np.float64)
            self.by_chrom[chrom] = (xs, ys, recs)

    def query_one(self, q, op: str) -> list:
        if chrom_of(q) not in self.by_chrom:
            return []
        xs, ys, recs = self.by_chrom[chrom_of(q)]
        x1, x2, y1, y2 = transform(chrom_start(q), chrom_end(q), op)
        mask = (xs >= x1) & (xs <= x2) & (ys >= y1) & (ys <= y2)
        return [recs[i] for i in np.nonzero(mask)[0]]

    def query(self, q, relationship: str) -> list:
        """interval.Query (interval.go:157): compound relationships are
        unions in the reference's fixed order; single-base queries are
        deduplicated."""
        ops = _COMPOUND.get(relationship, [relationship])
        answer: list = []
        for op in ops:
            answer.extend(self.query_one(q, op))
        if len(answer) > 1 and chrom_end(q) - chrom_start(q) == 1:
            seen = set()
            dedup = []
            for a in answer:
                if id(a) not in seen:
                    seen.add(id(a))
                    dedup.append(a)
            answer = dedup
        return answer


def merge_intervals(records: list) -> list:
    """interval.MergeIntervals (aggregate.go:21): overlapping records
    collapse to plain bed spans."""
    out = []
    by_chrom: dict[str, list] = {}
    for r in records:
        by_chrom.setdefault(chrom_of(r), []).append(r)
    for chrom in by_chrom:
        recs = sorted(by_chrom[chrom],
                      key=lambda r: (chrom_start(r), chrom_end(r)))
        cur_s, cur_e = chrom_start(recs[0]), chrom_end(recs[0])
        for r in recs[1:]:
            if chrom_start(r) < cur_e:
                cur_e = max(cur_e, chrom_end(r))
            else:
                out.append(bedio.Bed(chrom, cur_s, cur_e))
                cur_s, cur_e = chrom_start(r), chrom_end(r)
        out.append(bedio.Bed(chrom, cur_s, cur_e))
    return out


def overlap_size(a, b) -> int:
    if chrom_of(a) != chrom_of(b):
        return 0
    return max(0, min(chrom_end(a), chrom_end(b))
               - max(chrom_start(a), chrom_start(b)))


def interval_size(a) -> int:
    return chrom_end(a) - chrom_start(a)


def read_intervals(filename: str) -> list:
    """interval.GoReadToChan: dispatch on extension (bed/vcf supported)."""
    base = filename[:-3] if filename.endswith(".gz") else filename
    if base.endswith(".bed"):
        return bedio.read(filename)
    if base.endswith(".vcf"):
        return vcfio.read(filename)[0]
    raise ValueError(f"unsupported interval file type: {filename}")


def record_to_string(rec) -> str:
    if isinstance(rec, vcfio.Vcf):
        return rec.to_string()
    return rec.to_string()
