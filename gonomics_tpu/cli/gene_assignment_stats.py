"""geneAssignmentStats — compare true contact bedpe gene assignments to
an assignGenomeSpace test bed
(reference: cmd/geneAssignmentStats/geneAssignmentStats.go)."""

from __future__ import annotations

import argparse

from .. import interval
from ..io import bed as bedio
from ..io import bedpe as bedpeio


def gene_assignment_check_guide_pers(truth, test):
    """GeneAssignmentCheckGuidePers (geneAssignmentStats.go:127): merge
    the truth A-feet, query each merged region against the test tree,
    and bucket into name-matched / non-matched beds. Loop-variable
    carry-over quirks of the reference are kept (non-match rows use the
    LAST truth name index)."""
    bedpeio.annotate_feet_dist(truth)
    truth_beds = [
        bedio.Bed(chrom=t.a.chrom, chrom_start=t.a.chrom_start,
                  chrom_end=t.a.chrom_end, name=t.a.name,
                  annotation=list(t.a.annotation), fields_initialized=7)
        for t in truth]
    merged = bedio.merge_beds_keep_names_and_annotations(truth_beds)

    tree = interval.IntervalIndex(test)
    match_count = 0
    matches: list[bedio.Bed] = []
    non_matches: list[bedio.Bed] = []
    for mt in merged:
        matched = False
        nearest = tree.query(mt, "any")
        if not nearest:
            raise SystemExit("No overlap found for guide")
        for nb in nearest:
            names = mt.name.split(",")
            for ni, nm in enumerate(names):
                if matched:
                    continue
                if nm == nb.name:
                    match_count += 1
                    matched = True
                    matches.append(bedio.Bed(
                        chrom=mt.chrom, chrom_start=mt.chrom_start,
                        chrom_end=mt.chrom_end, name=f"{nm},{nb.name}",
                        fields_initialized=7,
                        annotation=[mt.annotation[ni]]))
            if not matched:
                last = len(names) - 1
                non_matches.append(bedio.Bed(
                    chrom=mt.chrom, chrom_start=mt.chrom_start,
                    chrom_end=mt.chrom_end,
                    name=f"{names[last]},{nb.name}",
                    fields_initialized=7,
                    annotation=[mt.annotation[last]]))
    return match_count / len(merged), matches, non_matches


def gene_assignment_stats(in_contacts: str, in_test_bed: str,
                          out_matched: str, out_non_matched: str) -> None:
    truth = bedpeio.read(in_contacts)
    test = bedio.read(in_test_bed)
    freq, matched, non_matched = gene_assignment_check_guide_pers(truth,
                                                                  test)
    bedio.write(out_matched, matched)
    bedio.write(out_non_matched, non_matched)
    print(freq)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="geneAssignmentStats")
    p.add_argument("trueBedpe")
    p.add_argument("testBed")
    p.add_argument("matchedBed")
    p.add_argument("nonMatchedBed")
    a = p.parse_args(argv)
    gene_assignment_stats(a.trueBedpe, a.testBed, a.matchedBed,
                          a.nonMatchedBed)


if __name__ == "__main__":
    main()
