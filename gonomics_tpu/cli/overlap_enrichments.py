"""overlapEnrichments — enrichment/depletion p-values for overlaps
(reference: cmd/overlapEnrichments/overlapEnrichments.go)."""

from __future__ import annotations

import argparse

from .. import fileio, interval
from .. import lift_enrichment as lift
from ..io import bed as bedio


def _ref_genome_trim(untrimmed, no_gap, relationship: str):
    """refGenomeTrim (overlapEnrichments.go:146)."""
    tree = interval.IntervalIndex(untrimmed)
    trimmed = []
    for region in no_gap:
        for hit in tree.query(region, relationship):
            trimmed.append(bedio.Bed(
                chrom=hit.chrom,
                chrom_start=max(hit.chrom_start, region.chrom_start),
                chrom_end=min(hit.chrom_end, region.chrom_end),
                fields_initialized=3))
    return trimmed


def overlap_enrichments(method: str, in_file: str, second_file: str,
                        search_space_file: str, out_file: str, *,
                        trim_to_search_space: bool = False,
                        second_file_list: str = "",
                        relationship: str = "within") -> None:
    if method not in ("exact", "normalApproximate", "upperBound",
                      "lowerBound"):
        raise SystemExit(f"Error: unknown method. Found: {method}.")
    elements_one = lift.go_read(in_file)
    search_space = lift.go_read(search_space_file)
    if trim_to_search_space:
        elements_one = _ref_genome_trim(elements_one, search_space,
                                        relationship)
    else:
        tree = interval.IntervalIndex(search_space)
        for e in elements_one:
            if not tree.query(e, "any"):
                raise SystemExit(
                    "Error: foreground element from file 1 does not "
                    "overlap search space. Please use 'trimToSearchSpace' "
                    "to exclude this element.")
    lift.sort_by_coord(elements_one)
    lift.sort_by_coord(search_space)
    if lift.is_self_overlapping(search_space):
        raise SystemExit("Elements in bedEnrichments must not be "
                         f"self-overlapping. Self-overlap found in "
                         f"{search_space_file}.")
    if lift.is_self_overlapping(elements_one):
        raise SystemExit("Elements in bedEnrichments must not be "
                         f"self-overlapping. Self-overlap found in "
                         f"{in_file}.")

    second_files = ([second_file] if not second_file_list
                    else list(fileio.read(second_file_list)))
    with fileio.easy_create(out_file) as out:
        out.write("#Method\tFilename1\tFilename2\tLenElements1\t"
                  "LenElements2\tOverlapCount\tDebugCheck\t"
                  "ExpectedOverlap\tEnrichment\tEnrichPValue\t"
                  "DepletePValue\n")
        for curr in second_files:
            elements_two = lift.go_read(curr)
            if trim_to_search_space:
                elements_two = _ref_genome_trim(elements_two,
                                                search_space, relationship)
            else:
                tree = interval.IntervalIndex(search_space)
                for e in elements_two:
                    if not tree.query(e, "any"):
                        raise SystemExit(
                            "Error: foreground element from file 2 does "
                            "not overlap search space.")
            lift.sort_by_coord(elements_two)
            overlap = lift.overlap_count(elements_two, elements_one)
            if method == "exact":
                probs = lift.element_overlap_probabilities(
                    elements_one, elements_two, search_space)
                summary = lift.enrichment_p_value_exact(probs, overlap)
            elif method == "normalApproximate":
                probs = lift.element_overlap_probabilities(
                    elements_one, elements_two, search_space)
                summary = lift.enrichment_p_value_approximation(probs,
                                                                overlap)
            else:
                summary = lift.enrichment_p_value_bound(
                    elements_one, elements_two, search_space, overlap,
                    upper=method == "upperBound")
            out.write(f"{method}\t{in_file}\t{curr}\t"
                      f"{len(elements_one)}\t{len(elements_two)}\t"
                      f"{overlap}\t{summary[0]:f}\t{summary[1]:f}\t"
                      f"{overlap / summary[1]:f}\t{summary[2]:e}\t"
                      f"{summary[3]:e}\n")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="overlapEnrichments")
    p.add_argument("method")
    p.add_argument("elements1")
    p.add_argument("elements2")
    p.add_argument("searchSpace")
    p.add_argument("output")
    p.add_argument("-trimToSearchSpace", action="store_true")
    p.add_argument("-secondFileList", default="")
    p.add_argument("-relationship", default="within")
    a = p.parse_args(argv)
    overlap_enrichments(a.method, a.elements1, a.elements2, a.searchSpace,
                        a.output, trim_to_search_space=a.trimToSearchSpace,
                        second_file_list=a.secondFileList,
                        relationship=a.relationship)


if __name__ == "__main__":
    main()
