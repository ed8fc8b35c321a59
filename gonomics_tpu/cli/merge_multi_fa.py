"""mergeMultiFa — merge two multiFa files on a shared reference
(reference: cmd/mergeMultiFa/mergeMultiFa.go)."""

from __future__ import annotations

import argparse

import numpy as np

from .. import dna
from ..io import fasta as fastaio


def merge_multi_fa(in_a_file: str, in_b_file: str, out_file: str) -> None:
    in_a = fastaio.read(in_a_file)
    in_b = fastaio.read(in_b_file)
    if in_a[0].name != in_b[0].name:
        raise SystemExit(
            f"The first file reference name ({in_a[0].name}) does not "
            f"match the second file reference name ({in_b[0].name}).")
    for recs, which in ((in_a, "first"), (in_b, "second")):
        if len(recs) < 2:
            raise SystemExit(f"The {which} multiFa file has less than two "
                             "entries, and is therefore not a valid "
                             "multiFa.")
        for i in range(1, len(recs)):
            if len(recs[0].seq) != len(recs[i].seq):
                raise SystemExit(
                    f"In the {which} multiFa file, entry at index {i} is "
                    "not the same length as the reference sequence.")

    names = [r.name for r in in_a] + [r.name for r in in_b[1:]]
    cols: list[list[int]] = [[] for _ in names]
    ref_a, ref_b = np.asarray(in_a[0].seq), np.asarray(in_b[0].seq)
    pa = pb = 0
    while pa < len(ref_a) and pb < len(ref_b):
        a_gap, b_gap = ref_a[pa] == dna.GAP, ref_b[pb] == dna.GAP
        if a_gap == b_gap:
            if ref_a[pa] != ref_b[pb]:
                raise SystemExit(
                    f"Error in mergeMultiFa. Reference sequences at "
                    f"alignment position {pa} of the first file showed "
                    "different bases between the two files.")
            for i, r in enumerate(in_a):
                cols[i].append(int(np.asarray(r.seq)[pa]))
            for i, r in enumerate(in_b[1:], start=len(in_a)):
                cols[i].append(int(np.asarray(r.seq)[pb]))
            pa += 1
            pb += 1
        elif b_gap:
            for i in range(len(in_a)):
                cols[i].append(dna.GAP)
            for i, r in enumerate(in_b[1:], start=len(in_a)):
                cols[i].append(int(np.asarray(r.seq)[pb]))
            pb += 1
        else:
            for i, r in enumerate(in_a):
                cols[i].append(int(np.asarray(r.seq)[pa]))
            for i in range(len(in_a), len(names)):
                cols[i].append(dna.GAP)
            pa += 1
    out = [fastaio.Fasta(n, np.array(c, dtype=np.int8))
           for n, c in zip(names, cols)]
    fastaio.write(out_file, out)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="mergeMultiFa")
    p.add_argument("input1")
    p.add_argument("input2")
    p.add_argument("output")
    a = p.parse_args(argv)
    merge_multi_fa(a.input1, a.input2, a.output)


if __name__ == "__main__":
    main()
