"""tfMatchComp — compare motif profiles between two aligned sequences
(reference: cmd/tfMatchComp/tfMatchComp.go)."""

from __future__ import annotations

import argparse

from .. import dna, motif
from ..io import fasta as fastaio


def tf_match_comp(in_file: str, matrix_file: str, chrom_name: str,
                  out_file: str, *, matrix_file_type: str = "Frequency",
                  prop_match: float = 0.8, pseudocounts: float = 0.1,
                  ref_start: int = 0, output_as_proportion: bool = False,
                  residual_window_size: int = 5,
                  enforce_strand: bool = False,
                  residual_filter: float = 0.0, gc_content: float = 0.5,
                  matrix_filter: bool = False) -> None:
    records = fastaio.read(in_file)
    for r in records:
        r.seq = dna.to_upper(r.seq)
    if not 0 <= prop_match <= 1:
        raise SystemExit("Error. PropMatch option should be a proportion, "
                         "a value between 0 and 1.")
    if len(records) != 2:
        raise SystemExit(f"Error. tfMatchComp expects a pairwise multiFa "
                         f"alignment with two sequences. Found "
                         f"{len(records)}.")
    if len(records[0].seq) != len(records[1].seq):
        raise SystemExit("Error. tfMatchComp expects a well-formed pairwise "
                         "multiFa alignment.")
    motif.match_comp(matrix_file, matrix_file_type, records, prop_match,
                     chrom_name, out_file, pseudocounts=pseudocounts,
                     residual_window_size=residual_window_size,
                     ref_start=ref_start,
                     output_as_proportion=output_as_proportion,
                     enforce_strand_match=enforce_strand,
                     residual_filter=residual_filter, gc_content=gc_content,
                     matrix_filter=matrix_filter)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="tfMatchComp")
    p.add_argument("--propMatch", type=float, default=0.8)
    p.add_argument("--matrixFileType", default="Frequency")
    p.add_argument("--pfmPseudocounts", type=float, default=0.1)
    p.add_argument("--refStart", type=int, default=0)
    p.add_argument("--outputAsProportion", action="store_true")
    p.add_argument("--residualWindowSize", type=int, default=5)
    p.add_argument("--enforceStrand", action="store_true")
    p.add_argument("--residualFilter", type=float, default=0.0)
    p.add_argument("--gcContent", type=float, default=0.5)
    p.add_argument("--matrixFilter", action="store_true")
    p.add_argument("input")
    p.add_argument("matrices")
    p.add_argument("chromName")
    p.add_argument("output")
    a = p.parse_args(argv)
    tf_match_comp(a.input, a.matrices, a.chromName, a.output,
                  matrix_file_type=a.matrixFileType, prop_match=a.propMatch,
                  pseudocounts=a.pfmPseudocounts, ref_start=a.refStart,
                  output_as_proportion=a.outputAsProportion,
                  residual_window_size=a.residualWindowSize,
                  enforce_strand=a.enforceStrand,
                  residual_filter=a.residualFilter, gc_content=a.gcContent,
                  matrix_filter=a.matrixFilter)


if __name__ == "__main__":
    main()
