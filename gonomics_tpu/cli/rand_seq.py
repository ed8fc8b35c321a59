"""randSeq — pseudorandom DNA fasta (reference: cmd/randSeq/randSeq.go,
simulate.RandIntergenicSeq withIndels.go:19).

Byte-parity note: the reference samples from Go's seeded math/rand
stream; outputs here use numpy's PCG64 with the same seed flag, so
sequences are reproducible but not byte-identical to Go goldens
(COVERAGE.md "Known parity limitations")."""

from __future__ import annotations

import argparse

import numpy as np

from .. import fileio
from ..io import fasta as fastaio


def rand_intergenic_seq(rng: np.random.Generator, gc: float,
                        length: int) -> np.ndarray:
    """simulate.RandIntergenicSeq: iid bases with P(G)=P(C)=gc/2."""
    r = rng.random(length)
    out = np.empty(length, dtype=np.int8)
    out[r < gc / 2] = 1  # C
    out[(r >= gc / 2) & (r < gc)] = 2  # G
    out[(r >= gc) & (r < gc + (1 - gc) / 2)] = 0  # A
    out[r >= gc + (1 - gc) / 2] = 3  # T
    return out


def rand_seq(out_file: str, gc: float = 0.41, num_seq: int = 10,
             len_seq: int = 500, set_seed: int = -1) -> None:
    rng = np.random.default_rng(None if set_seed < 0 else set_seed)
    with fileio.easy_create(out_file) as f:
        for i in range(num_seq):
            fastaio.write_fasta(
                f, fastaio.Fasta(f"Sequence_{i}",
                                 rand_intergenic_seq(rng, gc, len_seq)), 50)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="randSeq")
    p.add_argument("output")
    p.add_argument("-GC", type=float, default=0.41)
    p.add_argument("-numSeq", type=int, default=10)
    p.add_argument("-lenSeq", type=int, default=500)
    p.add_argument("-setSeed", type=int, default=-1)
    a = p.parse_args(argv)
    rand_seq(a.output, a.GC, a.numSeq, a.lenSeq, a.setSeed)


if __name__ == "__main__":
    main()
