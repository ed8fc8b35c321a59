"""bedpeOverlap — filter bedpe entries by overlap with a select file
(reference: cmd/bedpeOverlap/bedpeOverlap.go)."""

from __future__ import annotations

import argparse

from .. import fileio
from ..interval import IntervalIndex
from ..io import bed as bedio
from ..io import bedpe as bedpeio


def _overlap_percent(entry, half: bedio.Bed) -> float:
    size = max(0, min(entry.chrom_end, half.chrom_end)
               - max(entry.chrom_start, half.chrom_start))
    return size / (half.chrom_end - half.chrom_start)


def _names(overlaps) -> str:
    return ",".join(o.name for o in overlaps)


def select_is_bed(select_file: str, in_file: str, threshold: float,
                  out_file: str, keep_names: bool) -> None:
    """SelectIsBed (bedpeOverlap.go:49): keep a bedpe when either foot
    overlaps; the reference writes once per passing A-side overlap and
    does not mark found on the B side — preserved."""
    select = bedio.read(select_file)
    if keep_names and select[0].name == "":
        raise SystemExit("keepNames set but select bed has no name field")
    tree = IntervalIndex(select)
    out = fileio.easy_create(out_file)
    for cur in bedpeio.read(in_file):
        overlaps = tree.query(cur.a, "any")
        if overlaps:
            if threshold == 0:
                if keep_names:
                    cur.a.fields_initialized = 7
                    cur.b.fields_initialized = 7
                    cur.a.name = _names(overlaps)
                bedpeio.write_to_handle(out, cur)
            else:
                found = False
                for j in overlaps:
                    if not found and _overlap_percent(j, cur.a) >= threshold:
                        found = True
                        if keep_names:
                            cur.a.fields_initialized = 7
                            cur.b.fields_initialized = 7
                            cur.a.name = _names(overlaps)
                        bedpeio.write_to_handle(out, cur)
            continue
        overlaps = tree.query(cur.b, "any")
        if overlaps:
            if threshold == 0:
                if keep_names:
                    cur.a.fields_initialized = 7
                    cur.b.fields_initialized = 7
                    cur.a.name = _names(overlaps)
                bedpeio.write_to_handle(out, cur)
            else:
                found = False
                for j in overlaps:
                    if not found and _overlap_percent(j, cur.b) >= threshold:
                        if keep_names:
                            cur.a.fields_initialized = 7
                            cur.b.fields_initialized = 7
                            cur.a.name = _names(overlaps)
                        bedpeio.write_to_handle(out, cur)
    out.close()


def select_is_bed_both(select_file: str, in_file: str, threshold: float,
                       out_file: str) -> None:
    """SelectIsBedBoth (bedpeOverlap.go:147): both feet must overlap."""
    tree = IntervalIndex(bedio.read(select_file))
    out = fileio.easy_create(out_file)
    for cur in bedpeio.read(in_file):
        a_over = tree.query(cur.a, "any")
        if not a_over:
            continue
        if threshold == 0:
            if tree.query(cur.b, "any"):
                bedpeio.write_to_handle(out, cur)
        else:
            found = False
            for j in a_over:
                if not found and _overlap_percent(j, cur.a) >= threshold:
                    for k in tree.query(cur.b, "any"):
                        if not found and \
                                _overlap_percent(k, cur.b) >= threshold:
                            found = True
                            bedpeio.write_to_handle(out, cur)
    out.close()


def select_is_bedpe(select_file: str, in_file: str, out_file: str) -> None:
    """SelectIsBedPe (bedpeOverlap.go:196): both select feet must hit
    feet belonging to the same input record; writes the last-visited
    matching home (reference quirk preserved)."""
    halves: list = []
    for rec in bedpeio.read(in_file):
        halves.extend(bedpeio.split_bedpe(rec))
    tree = IntervalIndex(halves)
    out = fileio.easy_create(out_file)
    for sel in bedpeio.read(select_file):
        left_overlaps = tree.query(sel.a, "any")
        right_overlaps = tree.query(sel.b, "any")
        found = False
        left_half = None
        for lh in left_overlaps:
            for rh in right_overlaps:
                left_half, right_half = lh, rh
                if left_half.home is right_half.home:
                    found = True
        if found:
            bedpeio.write_to_handle(out, left_half.home)
    out.close()


def bedpe_overlap(select_file: str, in_file: str, out_file: str, *,
                  bed_select: bool = False, threshold: float = 0.0,
                  overlap_both: bool = False,
                  keep_names: bool = False) -> None:
    if bed_select and overlap_both:
        select_is_bed_both(select_file, in_file, threshold, out_file)
    elif bed_select:
        select_is_bed(select_file, in_file, threshold, out_file, keep_names)
    else:
        select_is_bedpe(select_file, in_file, out_file)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="bedpeOverlap")
    p.add_argument("select")
    p.add_argument("input")
    p.add_argument("output")
    p.add_argument("-bedSelect", action="store_true")
    p.add_argument("-overlapThreshold", type=float, default=0.0)
    p.add_argument("-overlapBoth", action="store_true")
    p.add_argument("-keepNames", action="store_true")
    a = p.parse_args(argv)
    if not 0 <= a.overlapThreshold <= 1:
        raise SystemExit("overlap threshold must be between 0 and 1")
    if a.overlapThreshold != 0 and not a.bedSelect:
        raise SystemExit("overlapThreshold must be used with bedSelect")
    if a.overlapBoth and not a.bedSelect:
        raise SystemExit("overlapBoth must be used with bedSelect")
    bedpe_overlap(a.select, a.input, a.output, bed_select=a.bedSelect,
                  threshold=a.overlapThreshold, overlap_both=a.overlapBoth,
                  keep_names=a.keepNames)


if __name__ == "__main__":
    main()
