"""bedOverlapByWindow — bp in bed regions per sliding window (reference:
cmd/bedOverlapByWindow/bedOverlapByWindow.go)."""

from __future__ import annotations

import argparse

import numpy as np

from .. import fileio
from ..io import bed as bedio
from ..io import chrom_info


def bed_overlap_by_window(in_file: str, chrom_sizes: str, out_file: str,
                          window_size: int = 5000) -> None:
    c_info = chrom_info.read_to_slice(chrom_sizes)
    counts = {c.name: np.zeros(c.size, dtype=np.uint32) for c in c_info}
    for b in bedio.read(in_file):
        arr = counts[b.chrom]
        # each covered position p increments windows starting in
        # [max(0, p-window+1), min(chromEnd, p+1)) — a running prefix sum
        for p in range(b.chrom_start, b.chrom_end):
            lo = max(0, p - (window_size - 1))
            hi = min(b.chrom_end, p + 1)
            arr[lo:hi] += 1
    with fileio.easy_create(out_file) as out:
        for c in c_info:
            arr = counts[c.name]
            for j in range(len(arr)):
                out.write(f"{c.name}\t{j}\t{j + window_size}\t.\t"
                          f"{arr[j]}\n")


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="bedOverlapByWindow")
    p.add_argument("input")
    p.add_argument("chromSizes")
    p.add_argument("output")
    p.add_argument("-windowSize", type=int, default=5000)
    a = p.parse_args(argv)
    bed_overlap_by_window(a.input, a.chromSizes, a.output, a.windowSize)


if __name__ == "__main__":
    main()
