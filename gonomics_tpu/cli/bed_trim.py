"""bedTrim — trim bed records by a total of N percent, split across both
sides (reference: cmdx/bedTrim/bedTrim.go)."""

from __future__ import annotations

import argparse
import sys

from .. import fileio
from ..io import bed as bedio


def bed_trim(trim_percent: int, in_bed: str, out_bed: str) -> None:
    with fileio.easy_create(out_bed) as out:
        for b in bedio.read(in_bed):
            size = b.chrom_end - b.chrom_start
            # Go math.Round = half away from zero (Python round is
            # banker's)
            exact = size * (trim_percent / 100)
            to_remove = int(exact + 0.5)
            if to_remove % 2 == 0:
                b.chrom_start += to_remove // 2
                b.chrom_end -= to_remove // 2
            else:
                b.chrom_start += to_remove // 2 + 1
                b.chrom_end -= to_remove // 2
            if b.chrom_end - b.chrom_start > 0:
                bedio.write_to_handle(out, b)


def main(argv=None) -> None:
    p = argparse.ArgumentParser(prog="bedTrim")
    p.add_argument("-trimPercent", type=int, default=0)
    p.add_argument("inBed")
    p.add_argument("outBed")
    a = p.parse_args(argv if argv is not None else sys.argv[1:])
    if a.trimPercent < 0 or a.trimPercent > 100:
        raise SystemExit("Error: trimPercent must be an integer between 0 "
                         "and 100")
    bed_trim(a.trimPercent, a.inBed, a.outBed)


if __name__ == "__main__":
    main()
