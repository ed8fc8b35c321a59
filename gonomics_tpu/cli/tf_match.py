"""tfMatch — genome-wide TFBS occurrence scan
(reference: cmd/tfMatch/tfMatch.go)."""

from __future__ import annotations

import argparse

from .. import dna, motif
from ..io import fasta as fastaio


def tf_match(in_file: str, matrix_file: str, out_file: str, *,
             matrix_file_type: str = "Frequency", prop_match: float = 0.8,
             pseudocounts: float = 0.1, output_as_proportion: bool = False,
             gc_content: float = 0.5) -> None:
    records = fastaio.read(in_file)
    for r in records:
        r.seq = dna.to_upper(r.seq)
    motifs = motif._read_as_pwm(matrix_file, matrix_file_type, pseudocounts,
                                gc_content)
    if not 0 <= prop_match <= 1:
        raise SystemExit("Error. PropMatch option should be a proportion, "
                         "a value between 0 and 1.")
    motif.rapid_match(motifs, records, prop_match, out_file,
                      output_as_proportion)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="tfMatch")
    p.add_argument("--propMatch", type=float, default=0.8)
    p.add_argument("--matrixFileType", default="Frequency")
    p.add_argument("--pfmPseudocounts", type=float, default=0.1)
    p.add_argument("--outputAsProportion", action="store_true")
    p.add_argument("--gcContent", type=float, default=0.5)
    p.add_argument("input")
    p.add_argument("matrices")
    p.add_argument("output")
    a = p.parse_args(argv)
    tf_match(a.input, a.matrices, a.output,
             matrix_file_type=a.matrixFileType, prop_match=a.propMatch,
             pseudocounts=a.pfmPseudocounts,
             output_as_proportion=a.outputAsProportion,
             gc_content=a.gcContent)


if __name__ == "__main__":
    main()
